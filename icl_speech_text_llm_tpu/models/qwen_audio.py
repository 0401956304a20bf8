"""Qwen2-Audio, TPU-native: Whisper-style audio tower → avg-pool → projector →
Qwen2 LLM (+LoRA).

Rebuild of the reference's CustomQwen wrapper around HF
Qwen2AudioForConditionalGeneration (ref: models/custom_qwen.py:29-247):
- audio tower is a Whisper-large-v2-shape encoder (1280 dim, 32 layers);
- its 1500 output frames average-pool with stride 2 → 750 audio positions per
  30 s clip, projected to the LLM dim (HF multi_modal_projector);
- the LLM is the Qwen2 decoder from models/llama.py (qkv biases, GQA, high
  rope theta);
- LoRA on q/k projections, r=8 α=32, mirrors the reference PEFT setup
  (ref :69-81);
- prompt packing reuses the SAME one-gather assembly: each audio slot
  occupies a 750-position block (vs SALMONN's 88) but splices only
  ``audio_output_length(n_samples)`` positions per clip — the reference's
  feature_attention_mask semantics (ref: models/custom_qwen.py:174-185 +
  data/model_processors.py:149,221,412): short clips contribute fewer
  positions, and the encoder's self-attention is masked past the clip's
  valid frames.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import make_prefill_mask
from ..ops.mel import log_mel_spectrogram, pad_or_trim, wavs_to_float
from .common import dense_init
from .llama import (
    DECODER_CONFIGS,
    DecoderConfig,
    LoraConfig,
    cross_entropy_loss,
    decoder_forward,
    embed_tokens,
    init_decoder,
    init_lora,
    lm_logits,
)
from .whisper import WHISPER_CONFIGS, WhisperEncoderConfig, init_whisper_encoder, whisper_encode


@dataclass(frozen=True)
class QwenAudioConfig:
    encoder: WhisperEncoderConfig
    llm: DecoderConfig
    lora: Optional[LoraConfig] = LoraConfig(rank=8, alpha=32.0, targets=("wq", "wk"))
    pool_stride: int = 2
    compute_dtype: Any = jnp.float32

    @property
    def audio_tokens_per_slot(self) -> int:
        return self.encoder.n_ctx // self.pool_stride  # 750 for 30 s

    @property
    def audio_len_fn(self):
        """Per-clip splice-count policy for PackConfig (variable audio
        positions — HF feature_attention_mask semantics)."""
        return audio_output_length


def qwen2_audio_7b() -> QwenAudioConfig:
    """Qwen2-Audio-7B-Instruct shape (ref: models/custom_qwen.py:51).

    The audio tower uses 128 mel bins (HF Qwen2AudioEncoderConfig default:
    num_mel_bins=128, feature_size=128 in its WhisperFeatureExtractor) —
    unlike SALMONN's Whisper-large-v2 at 80."""
    return QwenAudioConfig(
        # flash on the audio tower (head_dim 64) — same kernel + block
        # heuristic validated for the SALMONN whisper path; gated off
        # automatically on non-TPU backends
        encoder=dataclasses.replace(
            WHISPER_CONFIGS["large-v2"], use_flash=True, n_mels=128),
        llm=DECODER_CONFIGS["qwen2-7b"],
        compute_dtype=jnp.bfloat16,
    )


def qwen2_audio_tiny() -> QwenAudioConfig:
    """CPU-testable config; LLM uses the TinyTokenizer vocab."""
    return QwenAudioConfig(
        encoder=WHISPER_CONFIGS["tiny-test"],
        llm=DECODER_CONFIGS["tiny"],
        lora=LoraConfig(rank=4, alpha=8.0, targets=("wq", "wk")),
    )


def qwen2_audio_smoke() -> QwenAudioConfig:
    """Qwen2-0.5B-backbone smoke config (BASELINE.md benchmark config #1),
    shrunk encoder for CPU."""
    return QwenAudioConfig(
        encoder=WhisperEncoderConfig(dim=128, n_heads=4, n_layers=2),
        llm=DECODER_CONFIGS["qwen2-0.5b"],
    )


def init_qwen_audio(key, cfg: QwenAudioConfig, skip_llm: bool = False) -> Dict[str, Any]:
    """``skip_llm`` leaves the decoder subtree out so callers loading
    converted (quantized) weights never materialize a throwaway random-init
    7B decoder on device (~28 GB f32)."""
    ke, kp, kl, klo = jax.random.split(key, 4)
    params = {
        "encoder": init_whisper_encoder(ke, cfg.encoder),
        "projector": {
            "w": dense_init(kp, cfg.encoder.dim, cfg.llm.dim),
            "b": jnp.zeros((cfg.llm.dim,)),
        },
    }
    if not skip_llm:
        params["llm"] = init_decoder(kl, cfg.llm)
    if cfg.lora is not None:
        params["lora"] = init_lora(klo, cfg.llm, cfg.lora)
    return params


def audio_feat_lengths(n_samples, hop: int = 160):
    """Raw 16 kHz sample count → valid post-conv encoder frames.

    HF chain (verified against WhisperFeatureExtractor + Qwen2AudioEncoder.
    _get_feat_extract_output_lengths): valid mel frames = n_samples // hop,
    then conv2 stride 2 gives (mel - 1)//2 + 1 frames."""
    mel = n_samples // hop
    return (mel - 1) // 2 + 1


def audio_output_length(n_samples, hop: int = 160) -> int:
    """Raw 16 kHz sample count → spliced audio positions after avg_pool(2).

    The HF formula ``(feat_len - 2)//2 + 1`` (Qwen2AudioEncoder.
    _get_feat_extract_output_lengths); 480000 samples → 750 positions.
    Host (packing) and device (masking) both use this so the gather and the
    encoder mask always agree."""
    return (audio_feat_lengths(n_samples, hop) - 2) // 2 + 1


def encode_audio(
    cfg: QwenAudioConfig,
    params: Dict[str, Any],
    mels: jnp.ndarray,
    sample_lengths: jnp.ndarray = None,  # (N,) valid raw samples per clip
) -> jnp.ndarray:
    """(N, n_mels, 3000) mel → (N, 750, llm_dim) audio positions.

    HF order (Qwen2AudioEncoder.forward): layers → avg_pool(2) → final
    layer_norm → projector. Pooling happens BEFORE the final LN.

    ``sample_lengths`` enables the reference's per-clip audio-length
    semantics (feature_attention_mask, ref models/custom_qwen.py:174-185):
    encoder self-attention is masked past each clip's valid frames and only
    positions < audio_output_length(n) carry meaning — callers splice that
    many (the packed gather_idx does this per slot)."""
    from .common import layer_norm

    dt = cfg.compute_dtype
    frame_lengths = None
    if sample_lengths is not None:
        frame_lengths = audio_feat_lengths(sample_lengths.astype(jnp.int32))
    feats = whisper_encode(cfg.encoder, params["encoder"], mels, dtype=dt,
                           apply_ln_post=False,
                           frame_lengths=frame_lengths)  # (N,1500,D), pre-LN
    N, T, D = feats.shape
    s = cfg.pool_stride
    pooled = feats[:, : (T // s) * s].reshape(N, T // s, s, D).mean(axis=2)
    ln = params["encoder"]["ln_post"]
    pooled = layer_norm(pooled, ln["w"], ln["b"])
    return pooled @ params["projector"]["w"].astype(dt) + params["projector"]["b"].astype(dt)


def _assemble(cfg, params, text_tokens, audio, gather_idx):
    dt = cfg.compute_dtype
    B = text_tokens.shape[0]
    text_embeds = embed_tokens(params["llm"], text_tokens, dtype=dt)
    D = text_embeds.shape[-1]
    audio_flat = audio.reshape(B, -1, D).astype(dt)
    table = jnp.concatenate([jnp.zeros((B, 1, D), dt), text_embeds, audio_flat], axis=1)
    return jnp.take_along_axis(table, gather_idx[..., None], axis=1)


def _encode_batch_audio(cfg, params, batch):
    B = batch["text_tokens"].shape[0]
    wavs = wavs_to_float(batch["wavs"])
    n_slots = wavs.shape[1]
    flat = pad_or_trim(wavs.reshape(B * n_slots, wavs.shape[-1]))
    mels = log_mel_spectrogram(flat, cfg.encoder.n_mels)
    lengths = batch.get("audio_lengths")
    if lengths is not None:
        lengths = lengths.reshape(B * n_slots)
    audio = encode_audio(cfg, params, mels, sample_lengths=lengths)
    return audio.reshape(B, n_slots, -1, cfg.llm.dim)


def qwen_audio_train_loss(
    cfg: QwenAudioConfig,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    lora_params: Optional[Dict[str, Any]] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Training forward: labels mask the prompt via the packed layout — the
    packed equivalent of the reference's prompt_length masking
    (ref: models/custom_qwen.py:141-145)."""
    B = batch["text_tokens"].shape[0]
    audio = _encode_batch_audio(cfg, params, batch)
    seq = _assemble(cfg, params, batch["text_tokens"], audio, batch["gather_idx"])
    L = seq.shape[1]
    lengths = jnp.sum(batch["seq_mask"], axis=1)
    mask = make_prefill_mask(lengths, L)
    from ..ops.flash_attention import flash_attention_usable
    flash_lengths = lengths if flash_attention_usable(L, cfg.llm.hd) else None
    positions = jnp.broadcast_to(jnp.arange(L), (B, L))
    lora = lora_params if lora_params is not None else params.get("lora")
    scaling = cfg.lora.scaling if cfg.lora is not None else 1.0
    hidden, _ = decoder_forward(
        cfg.llm, params["llm"], seq, mask, positions,
        lora=lora, lora_scaling=scaling, remat=remat,
        flash_lengths=flash_lengths,
    )
    logits = lm_logits(cfg.llm, params["llm"], hidden)
    return cross_entropy_loss(logits, batch["shifted_labels"])


def qwen_audio_generate(cfg: QwenAudioConfig, gen, params, batch, rng=None):
    """Greedy/sampled/beam generation (ref: models/custom_qwen.py:199-247
    slices continuation tokens — here decode starts at each sample's
    length; num_beams routes to the same beam decoder as SALMONN)."""
    from ..inference.engine import decode_from_sequence

    audio = _encode_batch_audio(cfg, params, batch)
    seq = _assemble(cfg, params, batch["text_tokens"], audio, batch["gather_idx"])
    lora = params.get("lora")
    scaling = cfg.lora.scaling if cfg.lora is not None else 1.0
    decode = decode_from_sequence
    if gen.num_beams > 1:
        from ..inference.beam import beam_decode_from_sequence

        decode = beam_decode_from_sequence
    return decode(
        cfg.llm, params["llm"], seq, batch["seq_lengths"], gen,
        lora=lora, lora_scaling=scaling, dt=cfg.compute_dtype, rng=rng,
    )
