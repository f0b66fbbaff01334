#!/bin/bash
# One-shot capture of the TPU measurements that were blocked on the tunnel
# outage (round-3 tail). Run when `timeout 90 python -c "import jax;
# print(jax.devices())"` shows the axon TPU again:
#
#   bash tools/tpu_pending.sh [out_dir]
#
# Captures, in order of value per minute:
#   1. bench.py full sweep   — includes the lane_align / flash_attn / int8
#                              variant points (BASELINE.md rows point here)
#   2. scan_steps sweep      — tools/bench_dispatch.py dispatch-fusion curve
#   3. kernel table + memcap — Pallas-vs-lax incl. the memory-capped pair
#                              kernel shape (docs/kernel_bench.md rows)
# Each step is independently time-limited so a dying tunnel still leaves the
# earlier artifacts on disk.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-output/tpu_pending_$(date +%Y%m%d_%H%M%S)}
mkdir -p "$OUT"
export PYTHONPATH="/root/repo:/root/.axon_site"   # APPEND axon site — never drop it

echo "== probe ==" | tee "$OUT/probe.txt"
# the probe must EXIT 0 *and* print a device list — error tracebacks also
# mention "axon", so matching text alone false-positives on a dead tunnel
if ! timeout 120 python -c "import jax; d=jax.devices(); print(d); assert d" \
        > "$OUT/probe_out.txt" 2>&1; then
  tail -3 "$OUT/probe_out.txt" | tee -a "$OUT/probe.txt"
  echo "tunnel still down; aborting"; exit 1
fi
tail -2 "$OUT/probe_out.txt" | tee -a "$OUT/probe.txt"
grep -qi "axon\|tpu" "$OUT/probe_out.txt" || { echo "no TPU device; aborting"; exit 1; }

echo "== bench.py sweep (budgeted) =="
BENCH_BUDGET_S=1200 timeout 1500 python bench.py > "$OUT/bench_sweep.json" 2> "$OUT/bench_sweep.log"
tail -1 "$OUT/bench_sweep.json"

echo "== scan_steps dispatch sweep =="
timeout 900 python -m tools.bench_dispatch > "$OUT/bench_dispatch.txt" 2>&1
tail -15 "$OUT/bench_dispatch.txt"

echo "== kernel table =="
timeout 900 python -m tools.bench_kernels --json > "$OUT/bench_kernels.json" 2> "$OUT/bench_kernels.log"
echo "== kernel memcap =="
timeout 900 python -m tools.bench_kernels --memcap --json > "$OUT/bench_kernels_memcap.json" 2> "$OUT/bench_kernels_memcap.log"

echo "done -> $OUT"
