#!/bin/bash
# Round-4 chip session, pass 2: steps invalidated by the fold6/select
# S-minor layout fix (editable install races: tiles1m_v2 measured a
# mid-edit source state and diverged — see NOTES), plus the new
# odo-batch configs. Same resumable step protocol as r4_drive.sh.
#
# Usage: bash scripts/r4_drive2.sh [logfile]
set -u
LOG="${1:-/tmp/r4_session2.log}"
MARK=/tmp/r4_marks2
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

# 1. fold6 vmem at 8M with the fixed S-minor prep layout (the take-6
#    decision point — the old layout OOM'd at compile)
step tiles8m_v3 3600 3 python scripts/exp_tiles.py 8388608 \
  "{'auto(infold)': dict(), 'vmem': dict(payload_mode='vmem'), 'select': dict(payload_mode='select')}"

# 2. re-validate vmem/select at 1M on the fixed layout (tiles1m_v2 raced
#    a mid-edit source state; also the 16x VMEM waste fix may shift 1M)
step tiles1m_v3 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'gather': dict(), 'vmem': dict(payload_mode='vmem'), 'select': dict(payload_mode='select')}"

# 2a. moments6 at 8M with the S-minor/pre-centered layout (the r4_drive
#     mom8m OOM'd on the old query/centroid operand padding)
step mom8m_v2 3600 3 python scripts/exp_tiles.py 8388608 \
  "{'mom xla': dict(), 'mom vmem': dict(moments_mode='vmem'), 'vmem+mom': dict(payload_mode='vmem', moments_mode='vmem')}"

# 2a-bis. moments6 at 1M on the fixed layout (the padded-query operand
#         cost ~0.5 GB of HBM traffic at 1M too — the 178-vs-170 loss
#         may flip)
step mom1m_v2 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'mom xla': dict(), 'mom vmem': dict(moments_mode='vmem')}"

# 2b. Pallas segmented sort vs lax.sort at the KD level-sort shapes
step psort1m 2400 3 python scripts/exp_psort.py 8 1m
step psort8m 3000 3 python scripts/exp_psort.py 4 8m

# 2c. scatter-speed probe: is a radix sort viable for the Morton phase?
step scatter1m 2400 3 python scripts/exp_scatter.py 1048576 8

# 2d. stride-1 top end: fresh 8M/10M walls with the new default
step bench8m_s1 3600 3 python bench.py --n 8388608 --reps 3
step bench10m_s1 3600 3 python bench.py --n 10485760 --reps 3

# 2d-bis. 16k scans sit in a brute/block gap (54 fps vs 137 fps at
#         32k, which crosses block_auto_threshold): does forcing the
#         block path fix the 16k row?
step odo16k_block 2400 3 python bench.py --odometry --scan-points 16384 --reps 3 --nn-method block

# 2e. does the batch aggregate keep climbing past 16?
step batch32 3000 3 python bench.py --batch 32 --reps 3

# 3. odo-batch: the odometry THROUGHPUT operating point (brute at 8192,
#    block at 32768/65536)
step odob8k 2400 3 python bench.py --odometry --odo-batch --reps 3
step odob32k 3000 3 python bench.py --odometry --odo-batch --scan-points 32768 --reps 3
step odob64k 3600 3 python bench.py --odometry --odo-batch --scan-points 65536 --frames 10 --reps 3

echo "== drive2 pass complete $(date -u +%H:%M:%S)" >>"$LOG"
