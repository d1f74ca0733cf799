#!/bin/bash
# Round-4 chip session, pass 5: (1) the stacked vmem+mom A/B at 1M on
# the fixed layouts (each component individually edged out the default
# there; the stack was never validly measured), (2) the KITTI-scale
# 131072-pt odometry ladder row, (3) an end-to-end CLI drive on chip.
set -u
LOG="${1:-/tmp/r4_session5.log}"
MARK=/tmp/r4_marks5
mkdir -p "$MARK"
cd /root/repo

step() {
  local name="$1" to="$2" tries="$3"
  shift 3
  if [ -f "$MARK/$name" ]; then
    echo "== $name: already done, skipping" >>"$LOG"
    return 0
  fi
  for i in $(seq 1 "$tries"); do
    echo "== $name (attempt $i) $(date -u +%H:%M:%S)" >>"$LOG"
    if timeout "$to" "$@" >>"$LOG" 2>&1; then
      touch "$MARK/$name"
      echo "== $name: OK $(date -u +%H:%M:%S)" >>"$LOG"
      return 0
    fi
    echo "== $name: attempt $i failed/timed out; pausing 120s" >>"$LOG"
    sleep 120
  done
  echo "== $name: GAVE UP after $tries attempts" >>"$LOG"
  return 1
}

step tiles1m_final 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'gather+xla': dict(), 'vmem+mom': dict(payload_mode='vmem', moments_mode='vmem'), 'gather+xla 2': dict(), 'vmem+mom 2': dict(payload_mode='vmem', moments_mode='vmem')}"

step odo128k 3600 3 python bench.py --odometry --scan-points 131072 --frames 10 --reps 3

step cli_drive 2400 3 bash -c '
set -e
cd /tmp
python -c "
from icpx.io.loaders import synthetic_surface
from icpx.cloud import PointCloud
from icpx.io import save_cloud
from icpx.geometry.transforms import make_rigid_perturbation
import numpy as np, jax.numpy as jnp
xyz = synthetic_surface(65536, seed=7)
src = PointCloud.create(xyz)
gt = make_rigid_perturbation(angle=0.2, translation=(0.1, -0.05, 0.02))
tgt = PointCloud.create(np.asarray(gt.apply(src.xyz)))
save_cloud(\"/tmp/_d_src.pcd\", src, binary=True)
save_cloud(\"/tmp/_d_tgt.pcd\", tgt, binary=True)
"
icpx register /tmp/_d_src.pcd /tmp/_d_tgt.pcd --out /tmp/_d_aligned.pcd --robust huber
icpx info /tmp/_d_aligned.pcd
'
echo "== drive5 pass complete $(date -u +%H:%M:%S)" >>"$LOG"
