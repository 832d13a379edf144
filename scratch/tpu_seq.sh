#!/bin/bash
# Measurement sequence for TPU return: kernel microbenches then phase profile.
cd /root/repo
echo "=== apply_v2 (production) ===" 
timeout 1200 python -u scratch/apply_v2.py 15000 8 10
echo "=== acc_blk tile=256 ==="
timeout 1200 python -u scratch/acc_blk.py 15000 8 10 256
echo "=== acc_blk tile=512 ==="
timeout 1200 python -u scratch/acc_blk.py 15000 8 10 512
echo "=== acc_blk tile=128 ==="
timeout 1200 python -u scratch/acc_blk.py 15000 8 10 128
echo "=== prof_sweep (phases post lazy+xfer) ==="
timeout 2400 python -u scratch/prof_sweep.py
echo "=== ALL DONE ==="
echo "=== sweep A/B: default vs flat vs blk vs both (steady, B=8, prod) ==="
for combo in "::" "flat::" ":blk:" "flat:blk:"; do
  IFS=: read lay acc _ <<< "$combo"
  echo "--- layout='$lay' acc='$acc'"
  PL_FEM_APPLY_LAYOUT=${lay:-packed} PL_FEM_ACC=$acc timeout 2400 python -u scratch/prof_sweep.py 2>&1 | sed -n 1,6p
done
echo "=== SEQ2 DONE ==="
