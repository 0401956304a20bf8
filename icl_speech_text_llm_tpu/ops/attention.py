"""Attention ops.

XLA reference implementations used by every model in the zoo. The Pallas
flash-attention kernel (ops/flash_attention.py) overrides the prefill path on
TPU; these einsum forms are the fallback and the numerics oracle for kernel
tests.

Replaces the reference stack's torch/cuda attention (inside HF Whisper/LLaMA;
ref: models/custom_salmon.py:630-636 forward path).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, Hkv, T, D) → (B, Hkv*n_rep, T, D) for grouped-query attention."""
    if n_rep == 1:
        return x
    b, h, t, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, n_rep, t, d)).reshape(b, h * n_rep, t, d)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Masked scaled dot-product attention.

    Args:
        q: (B, H, Tq, D); k/v: (B, H, Tk, D)
        mask: broadcastable to (B, H, Tq, Tk); True = attend.
    Returns:
        (B, H, Tq, D), same dtype as q. Softmax runs in f32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)


def causal_mask(tq: int, tk: int, offset: int = 0) -> jnp.ndarray:
    """(1, 1, tq, tk) lower-triangular mask; query i attends keys ≤ i+offset."""
    qi = jnp.arange(tq)[:, None] + offset
    kj = jnp.arange(tk)[None, :]
    return (kj <= qi)[None, None]


def make_prefill_mask(lengths: jnp.ndarray, seq_len: int) -> jnp.ndarray:
    """Causal + right-padding mask for a packed prefill.

    Args:
        lengths: (B,) valid prompt length per sample.
    Returns:
        (B, 1, seq_len, seq_len) boolean.
    """
    causal = causal_mask(seq_len, seq_len)  # (1,1,S,S)
    valid_k = (jnp.arange(seq_len)[None, :] < lengths[:, None])[:, None, None]  # (B,1,1,S)
    return causal & valid_k


def make_decode_mask(lengths: jnp.ndarray, cache_len: int) -> jnp.ndarray:
    """(B, 1, 1, cache_len) mask for single-token decode: attend positions < length."""
    return (jnp.arange(cache_len)[None, :] < lengths[:, None])[:, None, None]


def make_chunk_mask(starts: jnp.ndarray, tq: int, cache_len: int) -> jnp.ndarray:
    """(B, 1, tq, cache_len) mask for a suffix/chunked prefill over an
    existing cache: query ``i`` sits at absolute position ``starts[b] + i``
    and attends every cache position ≤ it (its own chunk's earlier queries
    plus everything already cached — prefix-cached serving, chunked prefill).
    """
    qi = starts[:, None] + jnp.arange(tq)[None, :]  # (B, tq) absolute positions
    kj = jnp.arange(cache_len)[None, None, :]
    return (kj <= qi[:, :, None])[:, None]
