"""Weight-only int8 quantization for the decode path.

KV-cached decode reads every LLM weight once per generated token — it is
HBM-bandwidth-bound, so storing matmul weights as int8 (+ per-output-channel
f32 scales) halves the bytes read vs bf16. The dequant is a cast fused by XLA
into the matmul operand load (measured on v5e: int8+convert beats the bf16
matmul; a *native* int8 ``dot_general`` is ~10× slower on this chip — the MXU
path XLA picks for int8×int8 is not worth it, so we deliberately cast).

Symmetric per-output-channel scheme: ``s = max|w| / 127`` per column,
``q = round(w / s)``. Layer-stacked weights (L, in, out) quantize with
per-(layer, column) scales, so a ``lax.scan`` over the stacked tree slices
``{"q", "s"}`` consistently.

The reference has no quantization (fp16 autocast only — SURVEY §2.4
performance_utils); this is a TPU-serving addition.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def quantize_tensor(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(…, in, out) f32/bf16 → {"q": int8, "s": f32 (…, out)} per-column."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=-2) / 127.0  # (..., out)
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(w / s[..., None, :]), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def dequant_matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for a plain array or a quantized {"q", "s"} dict.

    The int8→x.dtype convert fuses into the matmul operand load; scales apply
    to the (much smaller) output.
    """
    if isinstance(w, dict) and "q" in w:
        return (x @ w["q"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w.astype(x.dtype)


_DECODER_MATMULS = (
    ("layers", "attn", "wq"),
    ("layers", "attn", "wk"),
    ("layers", "attn", "wv"),
    ("layers", "attn", "wo"),
    ("layers", "mlp", "w_gate"),
    ("layers", "mlp", "w_up"),
    ("layers", "mlp", "w_down"),
)


def quantize_decoder(params: Dict[str, Any], include_lm_head: bool = True) -> Dict[str, Any]:
    """Quantize a decoder tree's matmul weights in place of the originals.

    Embeddings stay full precision (decode gathers only B rows per step);
    norms/biases are tiny. Returns a new tree; the input is not mutated.
    """
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for path in _DECODER_MATMULS:
        node = out
        for key in path[:-1]:
            node = node[key]
        node[path[-1]] = quantize_tensor(node[path[-1]])
    if include_lm_head and "lm_head" in out:
        out["lm_head"] = quantize_tensor(out["lm_head"])
    return out
