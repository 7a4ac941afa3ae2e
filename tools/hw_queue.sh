#!/bin/bash
# Hardware work queue: probe the (tunneled) TPU backend until DEADLINE and
# run the standard hardware-window job list off fresh successful probes —
# a job never starts into a known-dead tunnel (see BENCHMARKS.md "Ops
# note": killed TPU jobs can wedge the relay for hours; timeout -k guards
# every job). Usage:
#   nohup tools/hw_queue.sh > /tmp/hw_queue.log 2>&1 & echo $! > /tmp/hwq.pid
# HW_QUEUE_HOURS overrides the 11h probe deadline.
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + ${HW_QUEUE_HOURS:-11} * 3600 ))

probe() {
  timeout -k 20 90 python -u -c "
import jax, jax.numpy as jnp
print(float(jnp.sum(jnp.ones((128,128)))))" >/dev/null 2>&1
}
wait_up() {
  local i=0
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    i=$((i+1))
    if probe; then echo "TUNNEL UP at $(date +%H:%M:%S) (attempt $i)"; return 0; fi
    echo "probe $i failed $(date +%H:%M:%S)"
    sleep 290
  done
  echo "DEADLINE REACHED, tunnel never answered $(date +%H:%M:%S)"
  return 1
}
run_job() {
  local t="$1"; shift; local desc="$1"; shift
  wait_up || return 1
  echo "=== JOB START: $desc $(date +%H:%M:%S)"
  timeout -k 30 "$t" "$@" 2>&1 | tail -15
  echo "=== JOB END: $desc $(date +%H:%M:%S)"
  return 0
}

run_job 1800 "tests_tpu FTCS kernel" python -u -m pytest tests_tpu/test_tpu_hw.py::test_compiled_ftcs_kernel_matches_xla -x -q || exit 1
run_job 1800 "ab_ftcs" python -u tools/ab_ftcs.py || exit 1
run_job 3600 "500k+100k bench re-measure" python -u -c "
import bench
sps = bench.bench_tpu(500_000, steps_timed=6)
print('500k bench config:', round(sps, 3), 'steps/sec')
sps1 = bench.bench_tpu(100_000, steps_timed=8)
print('100k bench config:', round(sps1, 3), 'steps/sec')" || exit 1
run_job 3600 "full hardware suite" python -u -m pytest tests_tpu/ -q || exit 1
run_job 3600 "bench_ensemble TPU" python -u tools/bench_ensemble.py 16 6 || exit 1
run_job 3600 "prod_500k temp-ckpt cost" python -u tools/prod_500k.py 6 || exit 1
run_job 7200 "bench_1m" python -u tools/bench_1m.py || exit 1
echo "HW QUEUE7 DONE $(date +%H:%M:%S)"
