#!/bin/bash
# Round-4 chip session, pass 4: salted re-measures of the configs whose
# executables did NOT change this round (1M flagship, 65k, cat) — their
# drive3 rows may be relay memoization replays (NOTES r4) — plus the
# odometry default row now that auto resolves to block at 8192.
set -u
LOG="${1:-/tmp/r4_session4.log}"
MARK=/tmp/r4_marks4
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

step rb2_1m 2400 3 python bench.py --reps 5
step rb2_65k 2400 3 python bench.py --n 65536 --reps 5
step rb2_cat 2400 3 python bench.py --cat --reps 3
step rb2_odo8k 2400 3 python bench.py --odometry --reps 3
step rb2_8m 3600 3 python bench.py --n 8388608 --reps 3
echo "== drive4 pass complete $(date -u +%H:%M:%S)" >>"$LOG"
