"""A/B the r5 LEAN gated-bias kernel (flash_attention_gated_bias_rows:
host-precomputed gate + batch-innermost grid, single KV pass) against the
general in-kernel-gate kernel at the BEATs-large bench shape.

The lean timing INCLUDES the host-side gate precompute (grep_linear matmul +
sigmoids over (B,H,T)) so the comparison is end-to-end per layer.

Usage: python scripts/probe_gated_bias_rows.py [ITERS=10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.ops.flash_attention import (
    flash_attention_gated_bias,
    flash_attention_gated_bias_rows,
)

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


def gate_rows(xh, gw, gb, ga):
    proj = jnp.einsum("bhqd,de->bhqe", xh.astype(jnp.float32),
                      gw.astype(jnp.float32)) + gb
    gate_a = jax.nn.sigmoid(proj[..., :4].sum(-1))
    gate_b = jax.nn.sigmoid(proj[..., 4:].sum(-1))
    return gate_a * (gate_b * ga[None, :, None] - 1.0) + 2.0  # (B,H,T)


BQ = int(os.environ.get("BQ", "768"))


def lean(q, xh, bias, gw, gb, ga):
    return flash_attention_gated_bias_rows(
        q, q, q, gate_rows(xh, gw, gb, ga), bias, lengths, block_q=BQ)


def general(q, xh, bias, gw, gb, ga):
    return flash_attention_gated_bias(q, q, q, xh, bias, gw, gb, ga, lengths)


# correctness: lean vs general on the same inputs
o_lean = jax.jit(lean)(q, xh, bias, gw, gb, ga)
o_gen = jax.jit(general)(q, xh, bias, gw, gb, ga)
d = float(jnp.abs(o_lean.astype(jnp.float32)
                  - o_gen.astype(jnp.float32))[:, :, :800, :].max())
print(f"lean vs general max abs diff (valid rows): {d:.4e}", flush=True)


def timed(fn, iters):
    def rep_fn(q, xh, bias, gw, gb, ga):
        def rep(qq, _):
            o = fn(qq, xh, bias, gw, gb, ga)
            return qq + (o.astype(jnp.float32).sum() * 1e-30).astype(qq.dtype), None
        qq, _ = jax.lax.scan(rep, q, None, length=iters)
        return qq.astype(jnp.float32).sum()

    jf = jax.jit(rep_fn)
    np.asarray(jf(q, xh, bias, gw, gb, ga))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(jf(q, xh, bias, gw, gb, ga))
        best = min(best, time.perf_counter() - t0)
    return best


for name, fn in (("general", general), ("lean-rows", lean)):
    t1, t2 = timed(fn, ITERS), timed(fn, 2 * ITERS)
    per = (t2 - t1) / ITERS
    print(f"{name:10s}: {per*1e3:7.3f} ms  MFU={FLOPS/per/PEAK*100:5.1f}%",
          flush=True)
