#!/bin/bash
# Supervisor for long TPU runs over the tunnel.
#
# The tunnel fails two ways: (a) the process dies (remote_compile HTTP
# errors), (b) the device connection silently wedges — the host blocks
# forever in a futex waiting on a device fetch while the log goes quiet.
# Training auto-resumes from the latest orbax checkpoint (checkpoint_every
# 1k), so both failures are converted into "lose <=1k steps": (a) by a
# restart loop, (b) by a staleness watchdog that SIGKILLs the child when
# the heartbeat file (metrics.jsonl, appended+closed per print/eval record,
# so its mtime is fresh within seconds of healthy stepping) stops moving.
# SIGKILL, not SIGTERM: train.py's preemption handler traps TERM to
# checkpoint-before-exit, which itself blocks on the wedged device.
#
# usage: run_supervised.sh LOG HEARTBEAT STALE_SECS CMD...
set -u
LOG="$1"; HB="$2"; STALE="$3"; shift 3
MAX_RETRIES=40
fails=0
while true; do
  start=$(date +%s)
  "$@" >> "$LOG" 2>&1 &
  child=$!
  while kill -0 "$child" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    newest=$start
    for f in "$LOG" "$HB"; do
      m=$(stat -c %Y "$f" 2>/dev/null || echo 0)
      [ "$m" -gt "$newest" ] && newest=$m
    done
    age=$(( now - newest ))
    since_start=$(( now - start ))
    # startup grace: resume + (cached) compile is log-quiet for minutes
    if [ "$age" -gt "$STALE" ] && [ "$since_start" -gt $(( STALE * 2 )) ]; then
      echo "[supervisor] heartbeat stale ${age}s — killing wedged child $child" >> "$LOG"
      kill -9 "$child" 2>/dev/null
      break
    fi
  done
  wait "$child"; rc=$?
  dur=$(( $(date +%s) - start ))
  echo "[supervisor] exit rc=$rc after ${dur}s" >> "$LOG"
  [ "$rc" -eq 0 ] && break
  if [ "$dur" -lt 60 ]; then
    fails=$((fails+1))
    [ "$fails" -ge "$MAX_RETRIES" ] && { echo "[supervisor] giving up after $fails fast failures" >> "$LOG"; break; }
  else
    fails=0
  fi
  sleep 10
done
