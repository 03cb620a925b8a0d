#!/bin/bash
# TPU workload runner for the axon tunnel: a fresh process sometimes hangs
# forever in device acquisition right after a previous one exits (see repo
# memory). The hang signature is ~zero CPU accumulation with no non-warning
# output; a healthy-but-slow cold compile burns CPU the whole time. So:
# kill fast (150 s) when the process is idle AND silent, give working
# processes up to 900 s to produce output, retry up to 6 times.
#
#   benchmarks/run_tpu.sh LOGFILE CMD [ARGS...]
LOG=$1; shift

cpu_ticks() {  # utime+stime of $1, in clock ticks (0 if gone)
  awk '{print $14 + $15}' /proc/$1/stat 2>/dev/null || echo 0
}

for attempt in 1 2 3 4 5 6; do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  elapsed=0
  while [ $elapsed -lt 900 ]; do
    sleep 10
    elapsed=$((elapsed + 10))
    if ! kill -0 $PID 2>/dev/null; then wait $PID; exit $?; fi
    if [ "$(grep -cv WARNING "$LOG")" -gt 0 ]; then
      wait $PID; exit $?
    fi
    if [ $elapsed -ge 150 ]; then
      # Silent so far: hang iff it has also done (almost) no work.
      ticks=$(cpu_ticks $PID)
      if [ "${ticks:-0}" -lt 500 ]; then   # < ~5 s CPU @ 100 Hz
        break
      fi
    fi
  done
  echo "run_tpu: attempt $attempt stalled (no output, ${ticks:-?} ticks CPU); retrying" >&2
  kill $PID 2>/dev/null
  # Escalating backoff: outages last minutes-to-hours but recover.
  back=$((30 * attempt)); [ $back -gt 300 ] && back=300
  sleep $back
done
echo "run_tpu: giving up after 6 attempts" >&2
exit 1
