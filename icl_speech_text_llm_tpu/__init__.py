"""TPU-native speech-text in-context-learning LLM framework.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of the
reference PyTorch research stack (iiscleap/ICL-speech-text-LLM): audio-conditioned
LLM in-context learning on SLUE-family spoken-language-understanding tasks.

Layer map (bottom → top), mirroring SURVEY.md §1 but TPU-first:

- ``registry``      — declarative task catalog (datasets, prompt templates, labels,
                      greek/swap variants).              [ref: data/*_config.py]
- ``evaluation``    — per-task metric engine + prediction cleaning.
                                                          [ref: utils/evaluation_utils.py]
- ``data``          — prompt assembly, few-shot selection, fixed-shape ICL packing,
                      host-side prefetch pipeline.        [ref: data/model_processors.py,
                                                          data/multi_task_dataset.py]
- ``ops``           — Pallas/XLA kernels: log-mel frontend, flash attention, sampling.
- ``models``        — pure-JAX model zoo: Whisper encoder, BEATs, window-level
                      Q-Former, LLaMA/Vicuna + Qwen2 decoders, LoRA, SALMONN and
                      Qwen2-Audio compositions.           [ref: models/custom_salmon.py,
                                                          models/custom_qwen.py]
- ``parallel``      — mesh construction + GSPMD sharding rules (dp/fsdp/tp axes).
                                                          [ref: train/train.py DDP/NCCL]
- ``training``      — jit train step (LoRA, bf16, grad-accum), LR schedules,
                      Orbax trainable-only checkpoints.   [ref: train/train.py]
- ``inference``     — packed prefill + KV-cached decode generation engine.
                                                          [ref: inference/inference.py]
- ``symbol_adapter``— symbol-replacement research subsystem (SymbolManager, phase
                      schedules, MLP symbol discovery).   [ref: models/symbolAdapter/**]
- ``cli``           — entry points preserving the reference flag surface.
"""

__version__ = "0.1.0"
