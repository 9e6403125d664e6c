#!/bin/bash
# Training watchdog for flaky remote-device links (failure detection on
# top of the trainer's auto-resume, SURVEY.md §5.3).
#
# When the accelerator is reached through a network tunnel (dev pods,
# remote PJRT), the connection can drop mid-run and the client then blocks
# forever on a device value — no exception, no progress. The trainer
# already checkpoints per epoch and auto-resumes from last_model
# (ppasr_tpu/trainer.py), so the cheap, robust recovery is process-level:
# start train.py, watch its log for progress, kill -9 on stall and
# restart. Exits when train.py completes (rc=0) or MAX_RESTARTS is hit.
#
# Usage:
#   tools/train_watchdog.sh <workdir> <config.yml> <logfile> [max_epoch] \
#       [stall_seconds] [max_restarts] [extra train.py args...]
#   tools/train_watchdog.sh stop <workdir>
#
# A pidfile (<workdir>/watchdog.pid: "<watchdog_pid> <trainer_pid>") is
# kept current so `stop` can quiesce the chip by EXACT pid — watchdog
# first (so it cannot restart the trainer), then the trainer. Used by the
# round-end quiesce protocol: no training job may own the device while
# the driver bench runs.
set -u
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
if [ "${1:-}" = "stop" ]; then
  WORKDIR=${2:?workdir}
  PIDFILE="$WORKDIR/watchdog.pid"
  if [ ! -f "$PIDFILE" ]; then
    echo "[watchdog] no pidfile at $PIDFILE — nothing to stop"
    exit 0
  fi
  read -r wd_pid tr_pid < "$PIDFILE" || true
  for p in ${wd_pid:-} ${tr_pid:-}; do
    if kill -0 "$p" 2>/dev/null; then
      kill "$p" 2>/dev/null
      for _ in $(seq 1 12); do
        kill -0 "$p" 2>/dev/null || break
        sleep 5
      done
      kill -0 "$p" 2>/dev/null && kill -9 "$p" 2>/dev/null
      echo "[watchdog] stopped pid $p"
    fi
  done
  rm -f "$PIDFILE"
  exit 0
fi
WORKDIR=${1:?workdir}
CONFIG=${2:?config yml}
LOG=${3:?log file}
MAX_EPOCH=${4:-50}
# post-progress stall window; the per-attempt startup grace below is never
# tighter than this (first program load can take minutes with no output)
STALL_S=${5:-900}
MAX_RESTARTS=${6:-40}
shift $(( $# > 6 ? 6 : $# ))
cd "$WORKDIR"
PIDFILE="$WORKDIR/watchdog.pid"
trap 'rm -f "$PIDFILE"' EXIT
STARTUP_GRACE=$(( STALL_S > 1500 ? STALL_S : 1500 ))
for attempt in $(seq 1 "$MAX_RESTARTS"); do
  echo "[watchdog] attempt $attempt: starting train.py" >> "$LOG.sup"
  # progress detection must only see output from THIS attempt: the log is
  # shared across attempts, so remember its size now and grep only the
  # appended region (a previous attempt's step lines must not shrink the
  # startup grace while the new process is still compiling/loading)
  start_bytes=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  # OVERWRITES env var appends extra config overrides
  python "$REPO_DIR/train.py" --configs="$CONFIG" \
    --overwrites="train_conf.max_epoch=$MAX_EPOCH${OVERWRITES:+,$OVERWRITES}" \
    "$@" >> "$LOG" 2>&1 &
  pid=$!
  echo "$$ $pid" > "$PIDFILE"
  grace=$STARTUP_GRACE
  while true; do
    sleep 30
    if ! kill -0 "$pid" 2>/dev/null; then
      wait "$pid"; rc=$?
      echo "[watchdog] train.py exited rc=$rc" >> "$LOG.sup"
      if [ "$rc" -eq 0 ]; then exit 0; fi
      break  # crashed -> restart
    fi
    now=$(date +%s)
    mtime=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    age=$((now - mtime))
    # tighten the stall window once THIS attempt shows step progress
    if tail -c "+$((start_bytes + 1))" "$LOG" 2>/dev/null \
        | grep -q "batch .*/"; then
      grace=$STALL_S
    fi
    if [ "$age" -gt "$grace" ]; then
      echo "[watchdog] stall: no log output for ${age}s; killing $pid" \
        >> "$LOG.sup"
      kill -9 "$pid" 2>/dev/null
      # wait for the pid to actually die before launching the next attempt
      # (a client wedged in device I/O can linger and hold the device; a
      # restart racing it just burns an attempt on a device-acquire crash)
      for _ in $(seq 1 24); do
        kill -0 "$pid" 2>/dev/null || break
        sleep 5
      done
      if kill -0 "$pid" 2>/dev/null; then
        echo "[watchdog] pid $pid refused to die after 120s; retrying" \
          >> "$LOG.sup"
      fi
      break
    fi
  done
done
echo "[watchdog] giving up after $MAX_RESTARTS attempts" >> "$LOG.sup"
exit 1
