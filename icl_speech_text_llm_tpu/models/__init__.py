"""Model zoo (ref layer L2): pure-JAX encoders, decoders, compositions.

- llama.py      — LLaMA/Vicuna + Qwen2 decoder family (+LoRA, KV cache)
- whisper.py    — Whisper audio encoder
- beats.py      — BEATs audio encoder (+kaldi fbank)
- qformer.py    — window-level Q-Former audio→LLM bridge
- salmonn.py    — SALMONN composition       (ref: models/custom_salmon.py)
- qwen_audio.py — Qwen2-Audio composition   (ref: models/custom_qwen.py)
- convert.py    — torch/HF checkpoint → param-tree converters
- factory.py    — ModelFactory parity surface
"""

from .factory import SalmonnModel, create_model, from_config, get_model_from_checkpoint
from .llama import DECODER_CONFIGS, DecoderConfig, LoraConfig
from .qwen_audio import (
    QwenAudioConfig,
    init_qwen_audio,
    qwen2_audio_7b,
    qwen2_audio_smoke,
    qwen2_audio_tiny,
    qwen_audio_generate,
    qwen_audio_train_loss,
)
from .salmonn import (
    SalmonnConfig,
    encode_speech,
    init_salmonn,
    salmonn_13b,
    salmonn_7b,
    salmonn_tiny,
    salmonn_train_loss,
)

__all__ = [
    "SalmonnModel", "create_model", "from_config", "get_model_from_checkpoint",
    "DECODER_CONFIGS", "DecoderConfig", "LoraConfig",
    "QwenAudioConfig", "init_qwen_audio", "qwen2_audio_7b", "qwen2_audio_smoke",
    "qwen2_audio_tiny", "qwen_audio_generate", "qwen_audio_train_loss",
    "SalmonnConfig", "encode_speech", "init_salmonn", "salmonn_13b",
    "salmonn_7b", "salmonn_tiny", "salmonn_train_loss",
]
