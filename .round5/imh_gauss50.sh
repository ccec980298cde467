#!/bin/bash
# VERDICT r4 #2: gauss50 raw-ladder gate (<= 0.15 at <= 1.2x calls).
# Cadence grid at the shipped floor, 3 seeds, fused likelihood.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
for ie in 2 4; do
  echo "=== imh_every=$ie ==="
  timeout 7000 python benchmarks/baseline_configs.py gauss50 \
    seeds=0,1,2 imh_every=$ie 2>&1 | grep -v "WARNING\|^E0\|experimental"
done
