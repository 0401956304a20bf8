"""Shared model building blocks: init helpers, norms, RoPE, MLPs.

All models in the zoo are pure functions over parameter pytrees (nested dicts
of jnp arrays). No module framework: this keeps LoRA deltas, GSPMD sharding
rules, and checkpoint conversion simple path-pattern matches.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Truncated-normal fan-in init, stored (in_dim, out_dim) so forward is x @ W."""
    std = in_dim**-0.5
    return (jax.random.truncated_normal(key, -2, 2, (in_dim, out_dim)) * std).astype(dtype)


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    return (jax.random.normal(key, (vocab, dim)) * 0.02).astype(dtype)


def split_keys(key, n: int):
    return list(jax.random.split(key, n))


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm in f32, cast back to input dtype (LLaMA/Qwen convention)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def gelu(x: jnp.ndarray, exact: bool | None = None) -> jnp.ndarray:
    """GELU: exact erf in f32 (HF-bit-accurate — the fidelity tests run
    here), tanh approximation under bf16/f16 COMPUTE.

    The tanh approximation's math error peaks at ~3e-4 near |x|≈2 — below
    one bf16 ulp at that magnitude (0.0156). Measured against
    exact-erf-in-f32-then-round over [-8, 8]: every output within 1 ulp
    (max abs diff 0.0156) — the same bound bf16 exact-erf evaluation
    itself carries — while the exact-erf lowering is pure VPU drag: the
    whisper-large MLP block measured 2.12 ms/layer exact vs 1.35 ms tanh
    (scripts/probe_whisper_inside.py), 24.7 ms per 6-clip encode chunk for
    numerically invisible precision.

    ``exact`` overrides the dtype heuristic: ``exact=True`` forces the erf
    form even under bf16/f16 (for fidelity comparisons against the
    reference's exact GELU), ``exact=False`` forces the tanh approximation;
    ``None`` (default) keeps the dtype-keyed behavior above."""
    if exact is None:
        approx = x.dtype in (jnp.bfloat16, jnp.float16)
    else:
        approx = not exact
    return jax.nn.gelu(x, approximate=bool(approx))


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> np.ndarray:
    """Inverse frequencies for rotary embeddings, (head_dim // 2,)."""
    return 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)).astype(
        np.float32
    )


def apply_rope(
    x: jnp.ndarray, positions: jnp.ndarray, inv_freq: jnp.ndarray
) -> jnp.ndarray:
    """Rotate (B, H, T, D) by per-position angles. positions: (B, T) or (T,).

    Uses the HF/LLaMA "half-split" convention: rotate pairs (x[..., :D/2],
    x[..., D/2:]) — matches converted HF checkpoints without permutation.
    """
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[:, :, None].astype(jnp.float32) * inv_freq[None, None, :]  # (B,T,D/2)
    cos = jnp.cos(angles)[:, None, :, :]  # (B,1,T,D/2)
    sin = jnp.sin(angles)[:, None, :, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Whisper-style sinusoidal position table, (length, dim)."""
    log_timescale = np.log(10000.0) / (dim // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(dim // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )
