"""Symbol-adapter loss: SALMONN forward with the MLP label transform injected.

The reference computes this inside MLPSalmonn.forward (ref: models/
mlp_salmonn_old.py:338-430: compute_mlp_loss / compute_standard_loss). Here it
is the standard packed SALMONN loss with ``transform_label_embeddings``
applied to the text-token embeddings before sequence assembly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..models.llama import cross_entropy_loss, decoder_forward, embed_tokens, lm_logits
from ..models.salmonn import SalmonnConfig, encode_speech
from ..ops.attention import make_prefill_mask
from ..ops.mel import log_mel_spectrogram, pad_or_trim, wavs_to_float
from .mlp_adapter import transform_label_embeddings


def mlp_salmonn_train_loss(
    cfg: SalmonnConfig,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    mlp_params: Optional[Dict[str, Any]] = None,
    temperature: float = 0.1,
    hard_quantization: bool = False,
    bypass_mlp: bool = False,
    lora_params: Optional[Dict[str, Any]] = None,
    remat: bool = False,
):
    """Packed batch (+ label_mask) → (loss, discovered_ids, similarities).

    ``batch`` adds ``label_mask`` (B, L_text) over the symbol-token positions
    of ``text_tokens``.
    """
    B = batch["text_tokens"].shape[0]
    wavs = wavs_to_float(batch["wavs"])
    n_slots = wavs.shape[1]
    dt = cfg.compute_dtype
    flat_wavs = wavs.reshape(B * n_slots, wavs.shape[-1])
    flat_wavs = pad_or_trim(flat_wavs)  # restore 30 s before encoders
    mels = log_mel_spectrogram(flat_wavs)
    speech = encode_speech(cfg, params, mels, flat_wavs if cfg.beats is not None else None)
    speech = speech.reshape(B, n_slots, -1, cfg.llm.dim)

    text_embeds = embed_tokens(params["llm"], batch["text_tokens"], dtype=dt)
    vocab = params["llm"]["tok_embed"]
    if mlp_params is not None:
        text_embeds, disc_ids, sims = transform_label_embeddings(
            mlp_params, text_embeds, batch["label_mask"], vocab,
            temperature=temperature, hard=hard_quantization, bypass=bypass_mlp,
        )
    else:
        disc_ids = jnp.full(batch["text_tokens"].shape, -1, jnp.int32)
        sims = jnp.zeros(batch["text_tokens"].shape, dt)

    D = text_embeds.shape[-1]
    audio_flat = speech.reshape(B, -1, D).astype(dt)
    table = jnp.concatenate([jnp.zeros((B, 1, D), dt), text_embeds, audio_flat], axis=1)
    seq = jnp.take_along_axis(table, batch["gather_idx"][..., None], axis=1)

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
    loss = cross_entropy_loss(logits, batch["shifted_labels"])
    return loss, disc_ids, sims
