#!/bin/sh
# Symbol-adapter orchestrated training launcher
# (ref: models/symbolAdapter/submit_orchestrator_training_job.sh)
set -e
cd "$(dirname "$0")/.."

exec python -m icl_speech_text_llm_tpu.cli.symbol_train \
    --training_mode "${TRAINING_MODE:-lora_first}" \
    --symbol_mode "${SYMBOL_MODE:-fixed}" \
    --dataset_type "${DATASET_TYPE:-voxceleb}" \
    --val_dataset_type "${VAL_DATASET_TYPE:-voxceleb}" \
    --model_type "${MODEL_TYPE:-salmonn-tiny}" \
    --total_cycles "${TOTAL_CYCLES:-2}" \
    --lora_epochs "${LORA_EPOCHS:-1}" \
    --mlp_epochs "${MLP_EPOCHS:-3}" \
    --batch_size "${BATCH_SIZE:-1}" \
    --output_dir "${OUTPUT_DIR:-results/symbol_training}" \
    --run_name "${RUN_NAME:-symbol_training_run}" \
    ${MAX_SAMPLES:+--max_samples "$MAX_SAMPLES"} \
    ${SYNTHETIC:+--synthetic} \
    ${PLATFORM:+--platform "$PLATFORM"} \
    "$@"
