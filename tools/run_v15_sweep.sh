#!/bin/bash
# Device validation of the v15-layout forward at every model DCN shape.
# Detached (never timeout-kill a python mid-TPU-op: wedges the chip lease).
cd "$(dirname "$0")/.."
OUT=/tmp/v15_sweep.log
: > $OUT
for s in 96,320,64,64 48,160,64,64 48,160,128,128 48,160,128,64 \
         24,80,256,128 24,80,256,256 24,80,64,64 12,40,512,256; do
  echo "=== shape $s ===" >> $OUT
  python tools/fwd_ablate.py --variants v15 --parity --shape "$s" \
      --iters 10 >> $OUT 2>&1
done
echo "=== bf16 at hot shape ===" >> $OUT
python tools/fwd_ablate.py --variants v15bf16 --shape 96,320,64,64 \
    --iters 10 >> $OUT 2>&1
echo "SWEEP DONE" >> $OUT
