#!/bin/bash
# TPU workload runner for the axon tunnel: a fresh process sometimes hangs
# forever in device acquisition right after a previous one exits (see repo
# memory). Runs CMD redirected into LOG and retries whenever no non-warning
# output appears within 240 s.
#
#   benchmarks/run_tpu.sh LOGFILE CMD [ARGS...]
LOG=$1; shift
for attempt in 1 2 3 4; do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  for i in $(seq 1 24); do
    sleep 10
    if ! kill -0 $PID 2>/dev/null; then wait $PID; exit $?; fi
    if [ "$(grep -cv WARNING "$LOG")" -gt 0 ]; then
      wait $PID; exit $?
    fi
  done
  echo "run_tpu: attempt $attempt stalled in device acquisition; retrying" >&2
  kill $PID 2>/dev/null
  sleep 20
done
echo "run_tpu: giving up after 4 attempts" >&2
exit 1
