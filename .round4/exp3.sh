#!/bin/bash
# Round-4 VERDICT #2: bias-rate budget loop at NEW defaults
# (bias_rate=0.4 auto, blanket corr target relaxed to 0.15 ladder-grade).
# Gates: gauss50 <=12M calls (was 36.9M), cosmo30 <=8M (17.8M),
# quickstart <=1.05x 51,456 on bench.py; accuracy within round-3 table.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 1500 python benchmarks/ladder_estimators.py quickstart
timeout 1800 python benchmarks/ladder_estimators.py cosmo30
timeout 2400 python benchmarks/ladder_estimators.py gauss50
