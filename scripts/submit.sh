#!/bin/bash
# Job submission with dependency chaining — the reference's SGE ops layer
# (ref: scripts/submit_train_job.sh, scripts/submit_inference_job.sh:88-93,
# qsub + -hold_jid) rebuilt scheduler-agnostic:
#
#   scripts/submit.sh train                      # submit a training job
#   scripts/submit.sh inference                  # submit an inference job
#   scripts/submit.sh symbol_training            # symbol-adapter orchestrated run
#   HOLD_JID=<id> scripts/submit.sh inference    # wait for job <id> first
#
# Backend is auto-detected, overridable with SUBMIT_BACKEND:
#   qsub   — SGE (the reference's cluster; -hold_jid chaining preserved)
#   sbatch — Slurm (chaining via --dependency=afterok)
#   local  — nohup + PID files (chaining = wait for the held PID to exit 0);
#            the default on TPU VMs, where jobs run in-place per host.
#
# Every inner runner (train.sh / inference.sh / symbol_training.sh) is
# env-var parameterized exactly like the reference job scripts — set
# DATASET_TYPE / MODEL_TYPE / BATCH_SIZE / ... before submitting.
set -e
cd "$(dirname "$0")"

JOB="${1:?usage: submit.sh train|inference|symbol_training [args...]}"
shift || true
RUNNER="./${JOB}.sh"
[ -x "$RUNNER" ] || { echo "ERROR: no runner $RUNNER"; exit 1; }

RUN_NAME="${RUN_NAME:-$(date +%d%m_%H%M)_${JOB}_${MODEL_TYPE:-salmonn-tiny}_${DATASET_TYPE:-voxceleb}}"
LOG_DIR="${LOG_DIR:-../logs}"
mkdir -p "$LOG_DIR"
LOG="$LOG_DIR/${RUN_NAME}.log"

BACKEND="${SUBMIT_BACKEND:-}"
if [ -z "$BACKEND" ]; then
    if command -v qsub >/dev/null 2>&1; then BACKEND=qsub
    elif command -v sbatch >/dev/null 2>&1; then BACKEND=sbatch
    else BACKEND=local; fi
fi

case "$BACKEND" in
qsub)
    HOLD_ARGS=""
    [ -n "$HOLD_JID" ] && HOLD_ARGS="-hold_jid $HOLD_JID"
    # shellcheck disable=SC2086
    JID=$(qsub -terse -N "$RUN_NAME" -q "${QUEUE_NAME:-longgpu.q}" \
          -o "$LOG" -j y -V $HOLD_ARGS "$RUNNER" "$@")
    echo "submitted qsub job $JID ($RUN_NAME); chain with HOLD_JID=$JID"
    ;;
sbatch)
    DEP_ARGS=""
    [ -n "$HOLD_JID" ] && DEP_ARGS="--dependency=afterok:$HOLD_JID"
    # shellcheck disable=SC2086
    JID=$(sbatch --parsable -J "$RUN_NAME" -o "$LOG" $DEP_ARGS "$RUNNER" "$@")
    echo "submitted slurm job $JID ($RUN_NAME); chain with HOLD_JID=$JID"
    ;;
local)
    PID_DIR="${PID_DIR:-/tmp/icl_tpu_jobs}"
    mkdir -p "$PID_DIR"
    (
        if [ -n "$HOLD_JID" ]; then
            HELD="$PID_DIR/$HOLD_JID"
            echo "[submit] waiting on job $HOLD_JID" >> "$LOG"
            while [ -e "/proc/$HOLD_JID" ]; do sleep 5; done
            # afterok semantics: a MISSING .rc (job killed / died before
            # writing it) must count as failure, not success
            if [ ! -f "$HELD.rc" ] || [ "$(cat "$HELD.rc")" != "0" ]; then
                echo "[submit] held job $HOLD_JID failed; aborting" >> "$LOG"
                exit 1
            fi
        fi
        # `|| rc=$?` keeps the subshell alive under set -e so the .rc file
        # is ALWAYS written (a bare failing command would abort before it)
        rc=0
        "$RUNNER" "$@" || rc=$?
        echo "$rc" > "$PID_DIR/$BASHPID.rc"
        exit "$rc"
    ) >> "$LOG" 2>&1 &
    JID=$!
    echo "$JID" > "$PID_DIR/$JID.pid"
    echo "submitted local job $JID ($RUN_NAME, log $LOG); chain with HOLD_JID=$JID"
    ;;
*)
    echo "ERROR: unknown SUBMIT_BACKEND '$BACKEND'"; exit 1 ;;
esac
