#!/bin/bash
# Round-4 pass 7: vmem_group 8-vs-16 A/B (the S-minor layouts removed
# the 16x VMEM waste that made group=16 OOM the Mosaic stack pre-fix).
set -u
LOG="${1:-/tmp/r4_session7.log}"
MARK=/tmp/r4_marks7
mkdir -p "$MARK"
cd /root/repo
step() {
  local name="$1" to="$2" tries="$3"; shift 3
  [ -f "$MARK/$name" ] && { echo "== $name: done" >>"$LOG"; return 0; }
  for i in 1 2 3; do
    echo "== $name (attempt $i) $(date -u +%H:%M:%S)" >>"$LOG"
    if timeout "$to" "$@" >>"$LOG" 2>&1; then
      touch "$MARK/$name"; echo "== $name: OK" >>"$LOG"; return 0
    fi
    echo "== $name: attempt $i failed" >>"$LOG"; sleep 120
  done
  echo "== $name: GAVE UP" >>"$LOG"; return 1
}
step vg1m 2400 3 python scripts/exp_tiles.py 1048576 \
  "{'vg8': dict(), 'vg16': dict(vmem_group=16), 'vg8 2': dict(), 'vg16 2': dict(vmem_group=16)}"
step vg8m 3600 3 python scripts/exp_tiles.py 8388608 \
  "{'vg8': dict(), 'vg16': dict(vmem_group=16)}"
echo "== drive7 complete" >>"$LOG"
