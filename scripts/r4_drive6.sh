#!/bin/bash
# Round-4 chip session, pass 6: regenerate the odometry ladder rows
# after the simulator FOV floor-binning fix (review r4) so BASELINE.md
# rows stay literally reproducible, and confirm 8M/10M post review
# fixes (the feat_nn fallback touched the payload resolve path).
set -u
LOG="${1:-/tmp/r4_session6.log}"
MARK=/tmp/r4_marks6
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

step odo8k_f 2400 3 python bench.py --odometry --reps 3
step odo16k_f 2400 3 python bench.py --odometry --scan-points 16384 --reps 3
step odo32k_f 2400 3 python bench.py --odometry --scan-points 32768 --reps 3
step odo64k_f 3000 3 python bench.py --odometry --scan-points 65536 --frames 10 --reps 3
step odo128k_f 3600 3 python bench.py --odometry --scan-points 131072 --frames 10 --reps 3
step odob32k_f 3000 3 python bench.py --odometry --odo-batch --scan-points 32768 --reps 3
step odob8k_f 2400 3 python bench.py --odometry --odo-batch --reps 3
step conf_8m 3600 3 python bench.py --n 8388608 --reps 3
echo "== drive6 pass complete $(date -u +%H:%M:%S)" >>"$LOG"
