#!/bin/bash
# Round-4 chip session driver: runs each measurement step as its own
# process under `timeout`, retrying on tunnel stalls (documented
# tens-of-minutes outages), appending everything to one log. Steps are
# ordered by decision value; a completed step writes a marker file so
# re-running the driver resumes where it left off.
#
# Usage: bash scripts/r4_drive.sh [logfile]
set -u
LOG="${1:-/tmp/r4_session.log}"
MARK=/tmp/r4_marks
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

# 1. stage breakdown (localizes the 8M super-linear cost)
step stage1m 2400 3 python scripts/exp_stage4.py 1048576 8
step stage8m 2400 3 python scripts/exp_stage4.py 8388608 4

# 2. full-pipeline payload-mode A/B (the take-5/take-6 decision)
step tiles1m 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'auto(gather)': dict(), 'select': dict(payload_mode='select'), 'vmem': dict(payload_mode='vmem')}"
step tiles8m 3600 3 python scripts/exp_tiles.py 8388608 \
  "{'auto(infold)': dict(), 'vmem': dict(payload_mode='vmem')}"

# 2a-bis: infold at 1M (stage breakdown r4: infold 21.7 vs gather-path
# 36 ms/iter — the round-3 "gather wins at <=1M" call may have flipped)
step tiles1m_if 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'infold': dict(payload_mode='infold')}"

# 2a-ter: fold6 v2 kernel A/B (two-pass min fold, hoisted pre-gathers)
step tiles1m_v2 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'vmem v2': dict(payload_mode='vmem'), 'vmem+mom': dict(payload_mode='vmem', moments_mode='vmem')}"

# 2b. moments-mode A/B (take-6 moments kernel vs XLA fold)
step mom1m 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'mom xla': dict(), 'mom vmem': dict(moments_mode='vmem'), 'vmem+mom': dict(payload_mode='vmem', moments_mode='vmem')}"
step mom8m 3600 3 python scripts/exp_tiles.py 8388608 \
  "{'mom xla': dict(), 'mom vmem': dict(moments_mode='vmem'), 'vmem+mom': dict(payload_mode='vmem', moments_mode='vmem')}"

# 3. refine_stride A/B at 8M (advisor r3 medium #2: validate auto-on)
step stride8m 3000 3 python scripts/exp_tiles.py 8388608 \
  "{'stride auto(2)': dict(), 'stride 1': dict(refine_stride=1)}"

# 3b. build decomposition (NOTES lever #2 groundwork)
step build1m 2400 3 python scripts/exp_build4.py 1048576 8

# 4. batched small pairs (VERDICT #3)
step batch16 2400 3 python bench.py --batch 16 --reps 3
step batch8 2400 3 python bench.py --batch 8 --reps 3

# 5. odometry at block-path scan sizes (VERDICT #5)
step odo16k 2400 3 python bench.py --odometry --scan-points 16384 --reps 3
step odo32k 2400 3 python bench.py --odometry --scan-points 32768 --reps 3
step odo64k 3000 3 python bench.py --odometry --scan-points 65536 --frames 10 --reps 3

echo "== driver pass complete $(date -u +%H:%M:%S)" >>"$LOG"
