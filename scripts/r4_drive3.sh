#!/bin/bash
# Round-4 chip session, pass 3: 8M build decomposition (is the 2-op
# global sort + row gather a WIN at 8M where operand traffic is 8x?),
# then the full post-defaults re-baseline for BASELINE.md. Same
# resumable protocol as r4_drive.sh.
#
# Usage: bash scripts/r4_drive3.sh [logfile]
set -u
LOG="${1:-/tmp/r4_session3.log}"
MARK=/tmp/r4_marks3
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

# 1. 8M build decomposition (2-op + gather at 8x operand traffic)
step build8m 3600 3 python scripts/exp_build4.py 8388608 4

# 2. full re-baseline with the round-4 defaults (vmem+mom >= 2M,
#    stride-1). Every BASELINE.md round-4 row comes from these.
step rb_1m 2400 3 python bench.py --reps 5
step rb_8m 3600 3 python bench.py --n 8388608 --reps 3
step rb_10m 3600 3 python bench.py --n 10485760 --reps 3
step rb_65k 2400 3 python bench.py --n 65536 --reps 5
step rb_cat 2400 3 python bench.py --cat --reps 3
step rb_batch16 2400 3 python bench.py --batch 16 --reps 3
step rb_odo8k 2400 3 python bench.py --odometry --reps 3

# 3. block-vs-brute at LiDAR scan sizes (16k block = 228 fps vs 54
#    brute; does 8k flip too? decides block_auto_threshold)
step odo8k_block 2400 3 python bench.py --odometry --nn-method block --reps 3

# 4. odo-batch with the annealed two-phase schedule (identity-init
#    divergence fix; drive2 rows gated out at ATE 0.76-1.32)
step odob8k_v2 2400 3 python bench.py --odometry --odo-batch --reps 3
step odob32k_v2 3000 3 python bench.py --odometry --odo-batch --scan-points 32768 --reps 3
echo "== drive3 pass complete $(date -u +%H:%M:%S)" >>"$LOG"
