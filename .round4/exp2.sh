#!/bin/bash
# Round-4 #2 (budget loop): measure the never-run corrlaw/comb ladder
# estimators against the exact oracles, at the relaxed budget where the
# raw ladder degrades (gauss50 ct=0.15: raw +0.30) and at defaults on
# the curved configs (must not hurt).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 1200 python benchmarks/ladder_estimators.py quickstart
timeout 1800 python benchmarks/ladder_estimators.py gauss50 corr_threshold=0.15
timeout 1800 python benchmarks/ladder_estimators.py rosenbrock10
timeout 1800 python benchmarks/ladder_estimators.py funnel25
timeout 1800 python benchmarks/ladder_estimators.py cosmo30 corr_threshold=0.15
