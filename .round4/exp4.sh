#!/bin/bash
# Round-4 VERDICT #2: bias-rate budget loop WITH the bias_floor spending
# bound (rate rule never demands corr below the unrelaxed blanket target).
# Expect: quickstart back at its ~84k-call baseline (exp3 unfloored rule
# spent 491k), cosmo30 <=8M, gauss50 <=12M with smcZ |err| <= 0.3.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 900 python benchmarks/ladder_estimators.py quickstart
timeout 1800 python benchmarks/ladder_estimators.py cosmo30
timeout 3000 python benchmarks/ladder_estimators.py gauss50
