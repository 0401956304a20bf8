"""Quick device check of the r4 gated-bias VPU diet (precomputed mask row +
power-of-two sm_scale fold): correctness vs the XLA oracle + timing at the
BEATs-large bench shape. Usage: python scripts/probe_gated_bias_r4.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention_gated_bias

ITERS = int(os.environ.get("ITERS", "10"))
C, H, T, D = 6, 12, 1536, 64
PEAK = 197e12
FLOPS = 2 * 2 * C * H * T * T * D

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
q = (jax.random.normal(ks[0], (C, H, T, D)) * 0.3).astype(jnp.bfloat16)
xh = (jax.random.normal(ks[1], (C, H, T, D)) * 0.3).astype(jnp.bfloat16)
bias = jax.random.normal(ks[2], (H, T, T)) * 0.5
gw = jax.random.normal(ks[3], (D, 8)) * 0.2
gb = jnp.zeros((8,))
ga = 1.0 + 0.1 * jax.random.normal(ks[4], (H,))
lengths = jnp.asarray([1496, 1100, 1496, 1496, 1496, 800], jnp.int32)


def oracle(q, k, v, xh, bias, gw, gb, ga, lengths):
    """f32 XLA reference (materializes logits)."""
    qf, kf, vf, xf = (t.astype(jnp.float32) for t in (q, k, v, xh))
    s = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * (q.shape[-1] ** -0.5)
    proj = jnp.einsum("bhqd,de->bhqe", xf, gw.astype(jnp.float32)) + gb
    gate_a = jax.nn.sigmoid(proj[..., :4].sum(-1))
    gate_b = jax.nn.sigmoid(proj[..., 4:].sum(-1))
    scale = gate_a * (gate_b * ga[None, :, None] - 1.0) + 2.0
    s = s + scale[..., None] * bias[None].astype(jnp.float32)
    mask = jnp.arange(s.shape[-1])[None, :] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf)


out = jax.jit(flash_attention_gated_bias)(q, q, q, xh, bias, gw, gb, ga, lengths)
ref = jax.jit(oracle)(q, q, q, xh, bias, gw, gb, ga, lengths)
d = float(jnp.abs(out.astype(jnp.float32) - ref[..., :]).max())
# only compare valid rows (invalid kv cols excluded by both; rows past length
# are attention over masked keys — compare within min length for sample 5)
dv = float(jnp.abs((out.astype(jnp.float32) - ref)[:, :, :800, :]).max())
print(f"max abs diff (all rows): {d:.4e}  (valid rows): {dv:.4e}", flush=True)


def timed(iters):
    def fn(q, xh, bias, gw, gb, ga):
        def rep(qq, _):
            o = flash_attention_gated_bias(qq, qq, qq, xh, bias, gw, gb, ga,
                                           lengths)
            return qq + (o.astype(jnp.float32).sum() * 1e-30).astype(qq.dtype), None
        qq, _ = jax.lax.scan(rep, q, None, length=iters)
        return qq.astype(jnp.float32).sum()

    jf = jax.jit(fn)
    np.asarray(jf(q, xh, bias, gw, gb, ga))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(jf(q, xh, bias, gw, gb, ga))
        best = min(best, time.perf_counter() - t0)
    return best


t1, t2 = timed(ITERS), timed(2 * ITERS)
per = (t2 - t1) / ITERS
print(f"gated-bias flash: {per*1e3:7.3f} ms  MFU={FLOPS/per/PEAK*100:5.1f}%",
      flush=True)
