#!/bin/bash
# Serialize a TPU-using python run with the claim-hang workaround: the
# axon chip claim from a PREVIOUS process can linger, leaving the next
# backend init hung before it even prints jax's platform warning. Launch,
# require log progress (>200 bytes: past the warning line) within
# PROBE_S seconds, else kill, wait out the claim, retry.
#
# usage: tpu_run.sh LOGFILE TIMEOUT_S -- python args...
set -u
LOG="$1"; TMO="$2"; shift 3   # LOGFILE TIMEOUT_S --
for attempt in 1 2 3; do
    : > "$LOG"
    timeout "$TMO" "$@" >> "$LOG" 2>&1 &
    PID=$!
    for i in $(seq 1 24); do
        sleep 10
        if ! kill -0 "$PID" 2>/dev/null; then break; fi
        # anything past jax's ~140-byte platform warning means backend
        # init succeeded (the hang happens BEFORE the warning prints);
        # 200 was too high — a data-gen print landed at ~190 bytes and a
        # healthy run got killed mid-compile
        if [ "$(stat -c %s "$LOG")" -gt 160 ]; then
            wait "$PID"
            exit $?
        fi
    done
    if ! kill -0 "$PID" 2>/dev/null; then
        # process exited early on its own: report its status
        wait "$PID"
        st=$?
        [ "$(stat -c %s "$LOG")" -gt 200 ] && exit $st
    else
        echo "[tpu_run] attempt $attempt: backend init hung, retrying" >&2
        kill "$PID" 2>/dev/null; sleep 5
        kill -9 "$PID" 2>/dev/null
    fi
    sleep 125   # let the chip claim expire
done
echo "[tpu_run] giving up after 3 attempts" >&2
exit 1
