#!/bin/bash
# Sweep packet geometry on the real chip: PALLAS_BLOCK_SUB x SUB_CULL.
# One TPU client at a time; timeouts inside (axon tunnel fragility).
cd /root/repo
for SUB in 8 16 32 64; do
  for CULL in 4 8; do
    echo "=== BLOCK_SUB=$SUB SUB_CULL=$CULL ==="
    PALLAS_BLOCK_SUB=$SUB PALLAS_SUB_CULL=$CULL timeout 900 \
      python -u results/trav_bench.py 2>&1 | grep -E "Mrays|tris|FAILED"
  done
done
