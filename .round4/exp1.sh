#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
POCOMC_ITER_TABLE=1 timeout 1200 python benchmarks/baseline_configs.py quickstart
timeout 1800 python benchmarks/baseline_configs.py gauss50 corr_threshold=0.15
timeout 1800 python benchmarks/baseline_configs.py gauss50 corr_threshold=0.05
timeout 1800 python benchmarks/baseline_configs.py cosmo30 corr_threshold=0.15
