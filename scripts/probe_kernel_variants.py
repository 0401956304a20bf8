"""Pin down why flash_decode_attention reads the cache at ~62 GB/s isolated
(probe_decode_kernel_bw.py) instead of ~819 GB/s HBM rate.

Variants, identical block structure (grid (B, Hkv, S/bk), tiles (bk, D)):
  stream-only   — kernel body just touches the k/v tiles (one (8,D) row add):
                  the bandwidth FLOOR of this block structure
  scores-only   — q@kT dot per tile, no softmax/accum: isolates the k-tile
                  transpose Mosaic inserts for the dim1-dim1 contraction
  scores-kT     — same dot with k stored TRANSPOSED (D, S): native MXU form,
                  no in-kernel transpose
  full (base)   — the production kernel
  full-kT       — production online softmax with the kT layout for scores

Usage: python scripts/probe_kernel_variants.py [B=4 HKV=32 S=1152 D=128]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", "4"))
HKV = int(os.environ.get("HKV", "32"))
S = int(os.environ.get("S", "1152"))
D = int(os.environ.get("D", "128"))
BK = int(os.environ.get("BK", "384"))
ITERS = int(os.environ.get("ITERS", "30"))

MIN_LANES = 128
kv_bytes = 2 * B * HKV * S * D * 2


def launch(kernel, kt_layout, out_dtype=jnp.bfloat16, n_scratch=3):
    grid = (B, HKV, S // BK)
    if kt_layout:
        kspec = pl.BlockSpec((1, 1, D, BK), lambda b, h, ki: (b, h, 0, ki))
    else:
        kspec = pl.BlockSpec((1, 1, BK, D), lambda b, h, ki: (b, h, ki, 0))
    vspec = pl.BlockSpec((1, 1, BK, D), lambda b, h, ki: (b, h, ki, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 8, D), lambda b, h, ki: (b, h, 0, 0)),
                kspec,
                vspec,
            ],
            out_specs=pl.BlockSpec((1, 1, 8, D), lambda b, h, ki: (b, h, 0, 0)),
            scratch_shapes=[pltpu.VMEM((8, MIN_LANES), jnp.float32)
                            for _ in range(2)] + [pltpu.VMEM((8, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, HKV, 8, D), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )


def k_stream(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

    # touch both tiles with cheap row ops (no transpose, no softmax)
    acc[...] += (k_ref[0, 0, :8, :] + v_ref[0, 0, :8, :]).astype(jnp.float32)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = acc[...].astype(o_ref.dtype)


def k_scores(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc, kt: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

    q = q_ref[0, 0]
    if kt:
        s = jax.lax.dot_general(q, k_ref[0, 0].astype(q.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        s = jax.lax.dot_general(q, k_ref[0, 0].astype(q.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    pv = jax.lax.dot(s[:, :BK].astype(q.dtype) * 0 + 1, v_ref[0, 0].astype(q.dtype),
                     preferred_element_type=jnp.float32)
    acc[...] += pv + s[:, :D]

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[0, 0] = acc[...].astype(o_ref.dtype)


def k_full(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc, kt: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

    q = q_ref[0, 0]
    if kt:
        s = jax.lax.dot_general(q, k_ref[0, 0].astype(q.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        s = jax.lax.dot_general(q, k_ref[0, 0].astype(q.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    s = s * (D ** -0.5)
    m_prev, l_prev = m_s[...], l_s[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    m_s[...] = m_next
    l_s[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot(p.astype(q.dtype), v_ref[0, 0].astype(q.dtype),
                     preferred_element_type=jnp.float32)
    acc[...] = acc[...] * alpha[:, :1] + pv

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        l = l_s[...][:, :1]
        o_ref[0, 0] = (acc[...] / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


key = jax.random.PRNGKey(0)
kq, kk, kv2 = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, HKV, 8, D), jnp.bfloat16)
k = jax.random.normal(kk, (B, HKV, S, D), jnp.bfloat16)
v = jax.random.normal(kv2, (B, HKV, S, D), jnp.bfloat16)
kT = jnp.swapaxes(k, 2, 3)  # (B, HKV, D, S)


def bench(name, kernel, kt_layout):
    call = launch(kernel, kt_layout)
    kk_in = kT if kt_layout else k

    def many(q, kx, vx):
        def body(qq, _):
            o = call(qq, kx, vx)
            return (qq + o * 1e-30).astype(qq.dtype), None

        qq, _ = jax.lax.scan(body, q, None, length=ITERS)
        return qq.astype(jnp.float32).sum()

    fn = jax.jit(many)
    np.asarray(fn(q, kk_in, v))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(q, kk_in, v))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:24s} {best*1e6:9.1f} us  {kv_bytes/best/1e9:7.1f} GB/s")


print(f"B={B} Hkv={HKV} S={S} D={D} bk={BK}; {kv_bytes/1e6:.1f} MB/call")
bench("stream-only", k_stream, False)
bench("scores-only", functools.partial(k_scores, kt=False), False)
bench("scores-only kT", functools.partial(k_scores, kt=True), True)
bench("full (base)", functools.partial(k_full, kt=False), False)
bench("full kT", functools.partial(k_full, kt=True), True)
