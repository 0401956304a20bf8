#!/bin/sh
# Inference launcher (ref: scripts/inference.sh, scripts/submit_inference_job.sh)
set -e
cd "$(dirname "$0")/.."

exec python -m icl_speech_text_llm_tpu.cli.inference \
    --dataset_type "${DATASET_TYPE:-voxceleb}" \
    --model_type "${MODEL_TYPE:-salmonn-tiny}" \
    --input_mode "${INPUT_MODE:-speech_only}" \
    --fewshot_mode "${FEWSHOT_MODE:-text}" \
    --num_examples "${NUM_EXAMPLES:-5}" \
    --batch_size "${BATCH_SIZE:-4}" \
    --run_name "${RUN_NAME:-run}" \
    --results_dir "${RESULTS_DIR:-results}" \
    ${MAX_SAMPLES:+--max_samples "$MAX_SAMPLES"} \
    ${PEFT_MODEL_PATH:+--peft_model_path "$PEFT_MODEL_PATH"} \
    ${SYNTHETIC:+--synthetic} \
    ${PLATFORM:+--platform "$PLATFORM"} \
    "$@"
