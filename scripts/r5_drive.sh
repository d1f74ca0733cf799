#!/bin/bash
# Round-5 chip session driver (pattern from r4_drive.sh): one
# measurement step per process under `timeout`, retries for tunnel
# stalls, marker files for resume. ONE TPU process at a time.
#
# Usage: bash scripts/r5_drive.sh [logfile]
set -u
LOG="${1:-/tmp/r5_session.log}"
MARK=/tmp/r5_marks
mkdir -p "$MARK"
cd /root/repo

step() { # step <name> <timeout_s> <retries> <cmd...>
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

# --- 1. roofline stage decomposition at take-6 defaults (VERDICT #1)
step stage5_8m  2400 3 python scripts/exp_stage5.py 8388608 4
step stage5_10m 2400 3 python scripts/exp_stage5.py 10485760 3

# --- 2. KITTI-scale odometry: round-5 defaults (cached KF index +
#        frozen candidates) vs round-4 behavior, q-tile A/B (VERDICT #2)
step odo131_new   1200 3 python bench.py --odometry --frames 10 --scan-points 131072 --reps 3
step odo131_nofrz 1200 2 python bench.py --odometry --frames 10 --scan-points 131072 --reps 3 --odo-freeze off
step odo131_q128  1200 2 python bench.py --odometry --frames 10 --scan-points 131072 --reps 3 --odo-q-tile 128
step odo65_new    1200 2 python bench.py --odometry --frames 10 --scan-points 65536 --reps 3
step odo32_new    1200 2 python bench.py --odometry --frames 20 --scan-points 32768 --reps 3
step odo16_new    1200 2 python bench.py --odometry --frames 20 --scan-points 16384 --reps 3
step odo8_new     1200 2 python bench.py --odometry --frames 20 --scan-points 8192 --reps 3

# --- 3. batched odometry seed A/B at the weak ladder points (VERDICT #6)
step odob8_id     1200 2 python bench.py --odometry --odo-batch --frames 20 --scan-points 8192 --reps 3 --odo-seed identity
step odob8_gl2    1200 2 python bench.py --odometry --odo-batch --frames 20 --scan-points 8192 --reps 3 --odo-seed global
step odob8_gl6    1200 2 python bench.py --odometry --odo-batch --frames 20 --scan-points 8192 --reps 3 --odo-seed global --odo-anneal-iters 6
step odob16_id    1200 2 python bench.py --odometry --odo-batch --frames 20 --scan-points 16384 --reps 3 --odo-seed identity
step odob16_gl6   1200 2 python bench.py --odometry --odo-batch --frames 20 --scan-points 16384 --reps 3 --odo-seed global --odo-anneal-iters 6
step odob32_id    1200 2 python bench.py --odometry --odo-batch --frames 20 --scan-points 32768 --reps 3 --odo-seed identity

echo "== r5_drive phase 1 complete $(date -u +%H:%M:%S)" >>"$LOG"
