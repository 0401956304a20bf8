"""SALMONN, TPU-native: Whisper + BEATs → window-level Q-Former → LLM (+LoRA).

Re-design of the reference's CustomSALMONN (ref: models/custom_salmon.py) with
the external SALMONN package vendored as pure-JAX components:

- ``encode_speech``     (ref :546-554): ALL audio clips in the batch — main
  input and every few-shot exemplar — are encoded in ONE batched call instead
  of the reference's per-exemplar Python loop (ref :460-537).
- prompt wrapping        (ref :115-299): replaced by a single table-gather over
  [pad | text embeddings | speech embeddings] using PackedBatch indices.
- ``forward``            (ref :556-640): returns mean CE loss with -100 prompt
  masking, identical label semantics.
- generation is in inference/engine.py (prefill + KV decode, replacing
  HF .generate at ref :704-720).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..data.packing import PackedBatch
from ..ops.attention import make_prefill_mask
from ..ops.mel import log_mel_spectrogram, pad_or_trim, wavs_to_float
from .beats import BEATS_CONFIGS, BeatsConfig, beats_encode, init_beats
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
from .qformer import QFORMER_CONFIGS, QFormerConfig, init_qformer, qformer_windows
from .whisper import WHISPER_CONFIGS, WhisperEncoderConfig, init_whisper_encoder, whisper_encode


@dataclass(frozen=True)
class SalmonnConfig:
    whisper: WhisperEncoderConfig
    qformer: QFormerConfig
    llm: DecoderConfig
    beats: Optional[BeatsConfig] = None  # None → whisper-only encoder stack
    lora: Optional[LoraConfig] = LoraConfig()
    compute_dtype: Any = jnp.float32
    # >0: encode clips in chunks of this size (lax.map) — bounds the encoder's
    # peak activation memory (BEATs T²-bias attention) at real model scale
    encode_chunk: int = 0

    @property
    def audio_tokens_per_slot(self) -> int:
        return self.qformer.n_windows * self.qformer.n_query


def salmonn_13b() -> SalmonnConfig:
    """The reference's shipped config: Whisper-large-v2 + BEATs + Vicuna-13B
    (ref: models/custom_salmon.py:29-51)."""
    return SalmonnConfig(
        whisper=dataclasses.replace(WHISPER_CONFIGS["large-v2"], use_flash=True),
        beats=dataclasses.replace(BEATS_CONFIGS["iter3-as2m"], use_flash=True),
        qformer=QFORMER_CONFIGS["salmonn"],
        llm=DECODER_CONFIGS["vicuna-13b"],
        lora=LoraConfig(rank=8, alpha=32.0, targets=("wq", "wv")),
        compute_dtype=jnp.bfloat16,
    )


def salmonn_7b() -> SalmonnConfig:
    return SalmonnConfig(
        whisper=dataclasses.replace(WHISPER_CONFIGS["large-v2"], use_flash=True),
        beats=dataclasses.replace(BEATS_CONFIGS["iter3-as2m"], use_flash=True),
        qformer=QFORMER_CONFIGS["salmonn-7b"],
        llm=DECODER_CONFIGS["vicuna-7b"],
        lora=LoraConfig(rank=8, alpha=32.0, targets=("wq", "wv")),
        compute_dtype=jnp.bfloat16,
    )


def salmonn_bench() -> SalmonnConfig:
    """Fixed benchmark config: full topology, head_dim-128 LLM (flash path),
    bf16 — comparable across rounds on one v5e chip."""
    return SalmonnConfig(
        whisper=WhisperEncoderConfig(dim=512, n_heads=8, n_layers=8,
                                     use_flash=True),
        beats=BeatsConfig(dim=256, embed_dim=128, n_heads=4, n_layers=4,
                          conv_pos=64, conv_pos_groups=8, use_flash=True),
        qformer=QFormerConfig(encoder_width=512 + 256, dim=256, n_heads=4,
                              n_layers=2, llm_dim=1024),
        llm=DECODER_CONFIGS["bench"],
        lora=LoraConfig(rank=8, alpha=32.0, targets=("wq", "wv")),
        compute_dtype=jnp.bfloat16,
    )


def salmonn_tiny() -> SalmonnConfig:
    """CPU-testable config with the full component topology."""
    qf = QFORMER_CONFIGS["tiny-test"]
    return SalmonnConfig(
        whisper=WHISPER_CONFIGS["tiny-test"],
        beats=BEATS_CONFIGS["tiny-test"],
        qformer=QFormerConfig(
            encoder_width=64 + 64, dim=qf.dim, n_heads=qf.n_heads,
            n_layers=qf.n_layers, llm_dim=DECODER_CONFIGS["tiny"].dim,
        ),
        llm=DECODER_CONFIGS["tiny"],
        lora=LoraConfig(rank=4, alpha=8.0, targets=("wq", "wv")),
    )


def init_salmonn(key, cfg: SalmonnConfig, skip_llm: bool = False) -> Dict[str, Any]:
    """``skip_llm`` leaves the decoder subtree out: at 13B a throwaway f32
    random init is ~52 GB of device memory, so callers that immediately
    replace it with converted (int8/int4) weights must never materialize it."""
    kw, kb, kq, kl, klo = jax.random.split(key, 5)
    params = {
        "whisper": init_whisper_encoder(kw, cfg.whisper),
        "qformer": init_qformer(kq, cfg.qformer),
    }
    if not skip_llm:
        params["llm"] = init_decoder(kl, cfg.llm)
    if cfg.beats is not None:
        params["beats"] = init_beats(kb, cfg.beats)
    if cfg.lora is not None:
        params["lora"] = init_lora(klo, cfg.llm, cfg.lora)
    return params


def _encode_speech_chunk(
    cfg: SalmonnConfig,
    params: Dict[str, Any],
    mels: jnp.ndarray,
    wavs: Optional[jnp.ndarray],
    beats_bias: Optional[jnp.ndarray] = None,  # hoisted beats_bias_table
) -> jnp.ndarray:
    dt = cfg.compute_dtype
    feats = whisper_encode(cfg.whisper, params["whisper"], mels, dtype=dt)  # (N,1500,Dw)
    if cfg.beats is not None and wavs is not None:
        audio = beats_encode(cfg.beats, params["beats"], wavs, dtype=dt,
                             bias_table=beats_bias)  # (N,~1496,Db)
        pad = feats.shape[1] - audio.shape[1]
        audio = jnp.pad(audio, ((0, 0), (0, pad), (0, 0)))
        feats = jnp.concatenate([feats, audio], axis=-1)
    return qformer_windows(cfg.qformer, params["qformer"], feats)  # (N, T_a, llm_dim)


def encode_speech(
    cfg: SalmonnConfig,
    params: Dict[str, Any],
    mels: jnp.ndarray,  # (N, 80, 3000) — N = B * n_slots, all clips batched
    wavs: Optional[jnp.ndarray] = None,  # (N, n_samples) for BEATs
) -> jnp.ndarray:
    """All-clips-at-once speech encoding → (N, T_a, llm_dim).

    With ``cfg.encode_chunk`` set and N divisible by it, clips run through the
    encoders in sequential chunks (lax.map) so peak activation memory stays
    bounded at 13B/7B scale; numerics are identical either way.
    """
    N = mels.shape[0]
    c = cfg.encode_chunk
    beats_bias = None
    if cfg.beats is not None and wavs is not None and cfg.beats.gated_rel_pos:
        # hoist the (H, T, T) rel-pos bias table OUT of the chunk loop: it is
        # a pure function of the frozen rel_bias weights and the clip length,
        # and rebuilding it inside the lax.map body re-materializes the
        # 113 MB gather+pad once per chunk (~2 ms each at salmonn-7b shapes)
        from .beats import beats_bias_table, beats_num_tokens

        nt = beats_num_tokens(cfg.beats, wavs.shape[-1])
        pad_to = -(-nt // 128) * 128 if cfg.beats.use_flash else 0
        beats_bias = beats_bias_table(cfg.beats, params["beats"], nt, pad_to)
    if c and N > c and N % c == 0:
        mels_c = mels.reshape(N // c, c, *mels.shape[1:])
        if wavs is not None:
            wavs_c = wavs.reshape(N // c, c, *wavs.shape[1:])
            out = jax.lax.map(
                lambda xs: _encode_speech_chunk(cfg, params, xs[0], xs[1],
                                                beats_bias),
                (mels_c, wavs_c),
            )
        else:
            out = jax.lax.map(
                lambda m: _encode_speech_chunk(cfg, params, m, None), mels_c
            )
        return out.reshape(N, *out.shape[2:])
    return _encode_speech_chunk(cfg, params, mels, wavs, beats_bias)


def assemble_sequence(
    cfg: SalmonnConfig,
    params: Dict[str, Any],
    text_tokens: jnp.ndarray,  # (B, L_text)
    speech_embeds: jnp.ndarray,  # (B, n_slots, T_a, llm_dim)
    gather_idx: jnp.ndarray,  # (B, L_seq)
) -> jnp.ndarray:
    """One gather builds the interleaved text/speech embedding sequence."""
    dt = cfg.compute_dtype
    B = text_tokens.shape[0]
    text_embeds = embed_tokens(params["llm"], text_tokens, dtype=dt)  # (B,L_text,D)
    D = text_embeds.shape[-1]
    audio_flat = speech_embeds.reshape(B, -1, D).astype(dt)
    table = jnp.concatenate(
        [jnp.zeros((B, 1, D), dt), text_embeds, audio_flat], axis=1
    )
    return jnp.take_along_axis(table, gather_idx[..., None], axis=1)


def salmonn_train_loss(
    cfg: SalmonnConfig,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    lora_params: Optional[Dict[str, Any]] = None,
    remat: bool = False,
    pipeline=None,  # (Mesh with a "pp" axis, n_micro) → GPipe the decoder
    sp=None,  # (Mesh, axis) → sequence-parallel decoder (activations sharded on T)
) -> jnp.ndarray:
    """Training forward: packed batch → mean CE over completion tokens.

    ``batch`` keys (device arrays): text_tokens, gather_idx, seq_mask,
    shifted_labels, wavs (B, n_slots, n_samples) — the mel frontend runs
    on-device (ops/mel.py), unlike the reference's per-item host extraction.
    ``lora_params`` overrides params["lora"] so gradients flow only through it.
    ``pipeline=(mesh, n_micro)`` runs the decoder stack as a GPipe pipeline
    over the mesh's "pp" axis (parallel/pipeline.py) — encoders/Q-Former stay
    data-parallel (they are a small fraction of 13B-class parameters).
    ``sp=(mesh, axis)`` instead shards the decoder ACTIVATIONS along the
    sequence axis (parallel/sequence_parallel.py) — the long-context path
    when one chip cannot hold the packed ICL prompt's activations.
    """
    B = batch["text_tokens"].shape[0]
    wavs = wavs_to_float(batch["wavs"])
    n_slots = wavs.shape[1]
    flat_wavs = wavs.reshape(B * n_slots, wavs.shape[-1])
    flat_wavs = pad_or_trim(flat_wavs)  # restore 30 s before encoders
    mels = log_mel_spectrogram(flat_wavs)
    speech = encode_speech(
        cfg, params, mels, flat_wavs if cfg.beats is not None else None
    )
    speech = speech.reshape(B, n_slots, *speech.shape[1:])

    seq = assemble_sequence(cfg, params, batch["text_tokens"], speech, batch["gather_idx"])
    L = seq.shape[1]
    lengths = jnp.sum(batch["seq_mask"], axis=1)
    mask = make_prefill_mask(lengths, L)
    from ..ops.flash_attention import flash_attention_usable
    flash_lengths = lengths if flash_attention_usable(L, cfg.llm.hd) else None
    positions = jnp.broadcast_to(jnp.arange(L), (B, L))

    lora = lora_params if lora_params is not None else params.get("lora")
    scaling = cfg.lora.scaling if cfg.lora is not None else 1.0
    if pipeline is not None:
        from ..parallel.pipeline import pipeline_decoder_forward

        pp_mesh, n_micro = pipeline
        hidden = pipeline_decoder_forward(
            pp_mesh, cfg.llm, params["llm"], seq, mask, positions, n_micro,
            lora=lora, lora_scaling=scaling, remat=remat,
        )
    elif sp is not None:
        from ..parallel.sequence_parallel import sp_decoder_forward

        sp_mesh, sp_axis = sp
        hidden = sp_decoder_forward(
            sp_mesh, sp_axis, cfg.llm, params["llm"], seq, positions, lengths,
            lora=lora, lora_scaling=scaling, remat=remat,
        )
    else:
        hidden, _ = decoder_forward(
            cfg.llm, params["llm"], seq, mask, positions,
            lora=lora, lora_scaling=scaling, remat=remat,
            flash_lengths=flash_lengths,
        )
    logits = lm_logits(cfg.llm, params["llm"], hidden)
    return cross_entropy_loss(logits, batch["shifted_labels"])
