#!/bin/bash
# Measure the opt-in perf knobs on the real TPU, one bench.py run each.
# Order matters: the scatter-kernel config is run FIRST so its very long
# Mosaic compile (data-dependent scalar while loop; >30 min observed on a
# sibling kernel) lands in the persistent TPU compile cache early, and a
# second run of the same config is cheap if needed.
#
# Usage: bash tools_dev/measure_knobs.sh  (writes /tmp/knobs_summary.txt)
set -u
cd "$(dirname "$0")/.."
out=/tmp/knobs_summary.txt
: > "$out"

run() {
  local name="$1"; shift
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$out"
  # env pairs are the remaining args
  if timeout 5400 env "$@" python bench.py > /tmp/knobs_"$name".log 2>&1; then
    tail -1 /tmp/knobs_"$name".log | tee -a "$out"
  else
    echo "FAILED rc=$? (see /tmp/knobs_$name.log)" | tee -a "$out"
    tail -3 /tmp/knobs_"$name".log >> "$out"
  fi
}

run scatter      MULACTSEG_NCHW_SCATTER=1
run baseline     MULACTSEG_DUMMY=0
run autolayout   MULACTSEG_AUTO_LAYOUT=1
run scatter_auto MULACTSEG_NCHW_SCATTER=1 MULACTSEG_AUTO_LAYOUT=1

for extra in voc stage2; do
  echo "=== $extra ($(date +%H:%M:%S)) ===" | tee -a "$out"
  if timeout 5400 python tools_dev/bench_"$extra".py > /tmp/knobs_"$extra".log 2>&1; then
    tail -1 /tmp/knobs_"$extra".log | tee -a "$out"
  else
    echo "$extra FAILED rc=$? (see /tmp/knobs_$extra.log)" | tee -a "$out"
  fi
done

# end-to-end input pipeline with and without ship_uint8 (the uint8-crop
# + on-device-normalize knob has never been measured on the TPU)
for e2e in "e2e_f32:" "e2e_u8:--ship-u8"; do
  name="${e2e%%:*}"; flag="${e2e#*:}"
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$out"
  if timeout 5400 python tools_dev/bench_e2e.py $flag > /tmp/knobs_"$name".log 2>&1; then
    tail -2 /tmp/knobs_"$name".log | tee -a "$out"
  else
    echo "$name FAILED rc=$? (see /tmp/knobs_$name.log)" | tee -a "$out"
  fi
done
echo "=== done $(date +%H:%M:%S) ===" | tee -a "$out"
