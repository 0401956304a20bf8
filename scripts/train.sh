#!/bin/sh
# Training launcher — env-var parameterized like the reference ops layer
# (ref: scripts/train.sh, scripts/submit_train_job.sh). Works standalone or
# under any scheduler (the reference used SGE qsub; on TPU pods prefer
# `gcloud compute tpus tpu-vm ssh --command` or xmanager-style wrappers).
set -e
cd "$(dirname "$0")/.."

exec python -m icl_speech_text_llm_tpu.cli.train \
    --dataset_type "${DATASET_TYPE:-voxceleb}" \
    --model_type "${MODEL_TYPE:-salmonn-tiny}" \
    --input_mode "${INPUT_MODE:-speech_only}" \
    --fewshot_mode "${FEWSHOT_MODE:-text}" \
    --num_examples "${NUM_EXAMPLES:-5}" \
    --batch_size "${BATCH_SIZE:-2}" \
    --num_epochs "${NUM_EPOCHS:-3}" \
    --learning_rate "${LEARNING_RATE:-1e-5}" \
    --gradient_accumulation_steps "${GRAD_ACCUM:-1}" \
    --scheduler "${SCHEDULER:-linear}" \
    --output_dir "${OUTPUT_DIR:-checkpoints}" \
    ${MAX_SAMPLES:+--max_samples "$MAX_SAMPLES"} \
    ${RESUME_FROM:+--resume_from_checkpoint "$RESUME_FROM"} \
    ${SYNTHETIC:+--synthetic} \
    ${PLATFORM:+--platform "$PLATFORM"} \
    "$@"
