#!/bin/bash
# Waymo StreetGS validation scenes (reference scripts/waymo/run-waymo.sh parity).
set -e
DATA=${1:-./data/waymo}
OUT=${2:-./output/waymo}
for scene in "$DATA"/*/; do
  name=$(basename "$scene")
  python -m adgs_tpu.cli.train -s "$scene" -m "$OUT/$name" -c configs/waymo.py
  python -m adgs_tpu.cli.render -m "$OUT/$name" --skip_train
done
