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


def quantize_kv(kv: jnp.ndarray):
    """int8 KV-cache quantization: (…, D) → (int8 (…, D), f32 scale (…)).

    Symmetric per-vector (one scale per cached position per KV head, amax
    over the head dim): the decode-attention stream is HBM-bound, so int8
    halves the dominant KV read AND doubles serving slot capacity. Scales
    fold into the flash-decode kernel as column scalings of the scores (k)
    and of the softmax probs (v) — dequant linearity, no (S, D) multiply.
    All-zero rows (cache padding) get scale 0 so they dequantize to 0.
    """
    kv = kv.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kv), axis=-1)
    scale = amax / 127.0
    q = jnp.round(kv / jnp.where(scale == 0.0, 1.0, scale)[..., None])
    return q.astype(jnp.int8), scale


def quantize_tensor_int4(w: jnp.ndarray, group: int = 128) -> Dict[str, jnp.ndarray]:
    """(…, in, out) → {"q4": uint8 (…, in/2, out), "s": f32 (…, in/group, out)}.

    Symmetric 4-bit with GROUP-WISE scales (per group of ``group`` input rows
    per output column — per-column alone is too coarse at 4 bits).
    SPLIT-HALF packing: byte[i] = row i (low nibble) | row i + in/2 (high
    nibble), encoded as value+8 ∈ [1,15] — unpacking is two nibble extracts
    and a concat, no row interleave, so the Pallas decode kernel
    (ops/int4_matmul.py) streams packed tiles and never materializes the
    bf16 weight. Quarters the decode HBM traffic vs bf16 — the difference
    between Vicuna-13B fitting one 16 GB v5e (with bf16 encoders + MHA KV
    cache) and not.
    """
    w = w.astype(jnp.float32)
    d_in = w.shape[-2]
    if d_in % group or d_in % 2 or (d_in // 2) % group:
        raise ValueError(
            f"d_in {d_in}: need d_in even and group {group} | d_in/2")
    lead = w.shape[:-2]
    wg = w.reshape(*lead, d_in // group, group, w.shape[-1])
    s = jnp.max(jnp.abs(wg), axis=-2) / 7.0  # (..., n_groups, out)
    s = jnp.where(s == 0.0, 1.0, s)
    q = jnp.clip(jnp.round(wg / s[..., None, :]), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, d_in, w.shape[-1])
    n = (q + 8).astype(jnp.uint8)  # [1, 15]
    half = d_in // 2
    packed = n[..., :half, :] | (n[..., half:, :] << 4)
    return {"q4": packed, "s": s}


def _dequant_int4(w: Dict[str, jnp.ndarray], dtype) -> jnp.ndarray:
    """Unpack {"q4","s"} → (…, in, out) ``dtype`` weights (the XLA fallback
    path — materializes the unpacked operand; the Pallas kernel avoids it)."""
    packed = w["q4"]
    lo = (packed & jnp.uint8(0xF)).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    lead, half, out = packed.shape[:-2], packed.shape[-2], packed.shape[-1]
    q = jnp.concatenate([lo, hi], axis=-2)  # split-half: rows [0,half)+[half,2half)
    n_groups = w["s"].shape[-2]
    group = (half * 2) // n_groups
    deq = q.reshape(*lead, n_groups, group, out).astype(dtype)
    deq = deq * w["s"][..., None, :].astype(dtype)
    return deq.reshape(*lead, half * 2, out)


def dequant_matmul(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w for a plain array or a quantized {"q","s"} / {"q4","s"} dict.

    int8: the int8→x.dtype convert fuses into the matmul operand load (near
    the HBM roofline when timed floor-corrected — see the comment below).
    int4: decode-sized x routes to the Pallas kernel (ops/int4_matmul.py)
    that streams PACKED tiles — XLA's unpack path materializes the bf16
    operand and is the fallback for prefill-sized x (where it amortizes).
    """
    if isinstance(w, dict) and "q4" in w:
        import math

        from .int4_matmul import int4_matmul, int4_matmul_usable

        lead = x.shape[:-1]
        m = math.prod(lead)
        if "layer" in w:
            # STACKED decode form ({"q4": (L, K/2, N), "s": (K/group, N) this
            # layer's, "layer": (1,) int32}, built by the zero-copy decode
            # step): the kernel streams layer w["layer"][0] straight from the
            # stacked HBM buffer — the caller never slices the packed
            # weights (a scan-xs slice copies them, tripling weight traffic).
            if int4_matmul_usable((m, x.shape[-1]), w["q4"].shape[1:],
                                  w["s"].shape):
                y = int4_matmul(x.reshape(m, x.shape[-1]), w["q4"], w["s"],
                                layer=w["layer"])
                return y.reshape(*lead, y.shape[-1])
            p = jax.lax.dynamic_index_in_dim(w["q4"], w["layer"][0], 0,
                                             keepdims=False)
            return x @ _dequant_int4({"q4": p, "s": w["s"]}, x.dtype)
        if w["q4"].ndim == 2 and int4_matmul_usable(
            (m, x.shape[-1]), w["q4"].shape, w["s"].shape
        ):
            y = int4_matmul(x.reshape(m, x.shape[-1]), w["q4"], w["s"])
            return y.reshape(*lead, y.shape[-1])
        return x @ _dequant_int4(w, x.dtype)
    if isinstance(w, dict) and "q" in w:
        # int8 stays on the XLA path deliberately: floor-corrected in-jit
        # timing (r3) measured it at ~730 GB/s on decode shapes — ~89% of
        # the v5e HBM roofline — and a Pallas streaming kernel (int4-style)
        # only matched it (711 GB/s). Round-2's "convert-bound" diagnosis
        # was a per-dispatch-floor artifact. int4 is different: XLA
        # materializes the unpacked operand there, hence the kernel.
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


def quantize_decoder(
    params: Dict[str, Any],
    include_lm_head: bool = True,
    bits: int = 8,
    group: int = 128,
) -> Dict[str, Any]:
    """Quantize a decoder tree's matmul weights in place of the originals.

    ``bits=8``: per-output-channel int8. ``bits=4``: group-wise int4 (the
    13B-on-one-chip layout). Embeddings stay full precision (decode gathers
    only B rows per step); norms/biases are tiny; the lm_head stays int8
    even at bits=4 (read once per token, logit-accuracy-critical).
    Returns a new tree; the input is not mutated.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def qt4(w):
        # largest group ≤ ``group`` dividing this tensor's HALF input dim
        # (split-half packing needs whole groups per nibble half; real LLM
        # dims divide 128; odd/tiny test dims fall back to int8)
        d_in = w.shape[-2]
        g = None
        if d_in % 2 == 0:
            g = next((g for g in range(min(group, d_in // 2), 1, -1)
                      if (d_in // 2) % g == 0), None)
        return quantize_tensor_int4(w, group=g) if g else quantize_tensor(w)

    qt = quantize_tensor if bits == 8 else qt4
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for path in _DECODER_MATMULS:
        node = out
        for key in path[:-1]:
            node = node[key]
        node[path[-1]] = qt(node[path[-1]])
    if include_lm_head and "lm_head" in out:
        out["lm_head"] = quantize_tensor(out["lm_head"])
    return out
