#!/bin/bash
# Full user path on the real TPU: scene fixture -> cli.train -> cli.render
set -e
cd /root/repo
TD=$(mktemp -d)
python - <<PY
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from tests.test_data_cli import make_kitti_scene
make_kitti_scene("$TD/scene", width=256, height=160, n_frames=8, n_pts=3000)
print("scene ready:", "$TD/scene")
PY
python -m adgs_tpu.cli.train -s "$TD/scene" -m "$TD/out" \
    --iterations 40 --save_iterations 40 --test_iterations 40 \
    --capacity 32768 --env_resolution 512
python -m adgs_tpu.cli.render -m "$TD/out"
echo "== results.json =="
cat "$TD/out/results.json"
echo
echo "CLI-ON-CHIP OK"
rm -rf "$TD"
