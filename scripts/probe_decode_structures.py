"""Probe: per-decode-step KV-cache traffic under three layer-loop structures,
measured in the REAL nesting — an outer ``lax.scan`` over decode steps inside
ONE jit (exactly how inference/engine.py:decode_from_sequence runs).

Production threads the stacked (L,B,Hkv,S,hd) cache through the inner layer
scan as xs/ys; each step therefore streams the cache in (xs slice reads) and
materializes a fresh stacked output (ys writes) ON TOP of the attention
kernel's own read. At 7B/MHA the cache (≈4.8 GB at B=4, S=1152) rivals the
int8 weights (7.1 GB), so extra passes over it are the leading explanation
for decode running at 314 GB/s vs the 730 GB/s the weight matmuls alone
achieve (scripts/profile_decode.py).

Variants (all include one full attention-style read of the layer's cache and
one (B,1) position write per layer, so the minimum traffic is identical):
  xs/ys        — inner scan, cache as xs in / ys out (current production)
  carry DUS    — inner scan, cache stacked in the scan carry, per-layer
                 dynamic_update_slice write + dynamic_slice read
  unrolled     — Python loop over layers, static .at[l] writes on the stacked
                 carry buffer (XLA sees chained static-index DUS)

A scalar chains step->step so the outer scan cannot be parallelized away.

Result (v5e via tunnel, L=32 B=4 Hkv=32 S=1152 hd=128 -> 4.8 GB cache):
  see OPTIMIZATIONS.md "decode-phase" notes; this probe decides whether
  decoder_forward grows an unrolled decode path.

Usage: JAX_PLATFORMS=... python scripts/probe_decode_structures.py
       [L=32 B=4 HKV=32 S=1152 D=128 STEPS=8]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

L = int(os.environ.get("L", "32"))
B = int(os.environ.get("B", "4"))
HKV = int(os.environ.get("HKV", "32"))
S = int(os.environ.get("S", "1152"))
D = int(os.environ.get("D", "128"))
STEPS = int(os.environ.get("STEPS", "8"))

kv_bytes = 2 * L * B * HKV * S * D * 2  # k+v, bf16
print(f"cache {kv_bytes/1e9:.2f} GB (k+v, {L}x{B}x{HKV}x{S}x{D} bf16), "
      f"{STEPS} steps in one jit")

pos0 = jnp.asarray(np.arange(B, dtype=np.int32) * 13 % (S - STEPS - 1))
newkv = jnp.ones((B, HKV, 1, D), jnp.bfloat16)
q0 = jnp.ones((B, HKV, 1, D), jnp.bfloat16)  # MHA: H == HKV
lengths_full = jnp.full((B,), S, jnp.int32)


def attention_read(k_l, v_l, x):
    # the PRODUCTION reader: the Pallas flash-decode kernel streams the
    # layer's full cache at HBM rate (a jnp .sum() reader is convert-bound
    # at ~1.2e11 bf16->f32 elem/s and masks everything — measured)
    from icl_speech_text_llm_tpu.ops.flash_attention import (
        flash_decode_attention,
    )

    o = flash_decode_attention(q0 * (1 + x * 0).astype(q0.dtype), k_l, v_l,
                               lengths_full)
    return x + o.astype(jnp.float32).ravel()[0] * 1e-30


def write_one(c, kv, p):
    return jax.vmap(
        lambda cl, kvl, pl: jax.lax.dynamic_update_slice(
            cl, kvl.astype(cl.dtype), (0, pl, 0)))(c, kv, p)


def step_xs_ys(carry, _):
    (ck, cv), x, pos = carry

    def body(acc, xs):
        k_l, v_l = xs
        x_, p_ = acc
        k_l = write_one(k_l, newkv * (1 + x_ * 0).astype(jnp.bfloat16), p_)
        v_l = write_one(v_l, newkv, p_)
        return (attention_read(k_l, v_l, x_), p_), (k_l, v_l)

    (x, _), (ck, cv) = jax.lax.scan(body, (x, pos), (ck, cv))
    return ((ck, cv), x, pos + 1), x


def step_carry_dus(carry, _):
    (ck, cv), x, pos = carry

    def body(acc, i):
        ck_, cv_, x_, p_ = acc
        k_l = jax.lax.dynamic_index_in_dim(ck_, i, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(cv_, i, 0, keepdims=False)
        k_l = write_one(k_l, newkv * (1 + x_ * 0).astype(jnp.bfloat16), p_)
        v_l = write_one(v_l, newkv, p_)
        ck_ = jax.lax.dynamic_update_index_in_dim(ck_, k_l, i, 0)
        cv_ = jax.lax.dynamic_update_index_in_dim(cv_, v_l, i, 0)
        return (ck_, cv_, attention_read(k_l, v_l, x_), p_), None

    (ck, cv, x, _), _ = jax.lax.scan(body, (ck, cv, x, pos), jnp.arange(L))
    return ((ck, cv), x, pos + 1), x


def step_unrolled(carry, _):
    (ck, cv), x, pos = carry
    for i in range(L):
        k_l = write_one(ck[i], newkv * (1 + x * 0).astype(jnp.bfloat16), pos)
        v_l = write_one(cv[i], newkv, pos)
        ck = ck.at[i].set(k_l)
        cv = cv.at[i].set(v_l)
        x = attention_read(k_l, v_l, x)
    return ((ck, cv), x, pos + 1), x


def run(name, step, tuple_cache=False):
    def many(cache, x, pos):
        (cache, x, _), xs = jax.lax.scan(step, (cache, x, pos), None,
                                         length=STEPS)
        return x + xs.sum() * 0

    fn = jax.jit(many)
    shape = (L, B, HKV, S, D)
    if tuple_cache:
        lshape = (B, HKV, S, D)
        cache = tuple((jnp.zeros(lshape, jnp.bfloat16),
                       jnp.zeros(lshape, jnp.bfloat16)) for _ in range(L))
    else:
        cache = (jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))
    t0 = time.perf_counter()
    np.asarray(fn(cache, jnp.float32(0), pos0))
    print(f"{name:12s} compile+first {time.perf_counter()-t0:6.1f} s")
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(cache, jnp.float32(0), pos0))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f"{name:12s} {best*1e3:8.2f} ms/step   "
          f"{kv_bytes/best/1e9:7.1f} GB/s per cache pass")
    return best


def step_tuple_unrolled(carry, _):
    # cache as L separate per-layer buffers in the outer carry (no stacked
    # array anywhere): XLA sees one DUS + one kernel read per buffer
    caches, x, pos = carry
    out = []
    for (k_l, v_l) in caches:
        k_l = write_one(k_l, newkv * (1 + x * 0).astype(jnp.bfloat16), pos)
        v_l = write_one(v_l, newkv, pos)
        x = attention_read(k_l, v_l, x)
        out.append((k_l, v_l))
    return (tuple(out), x, pos + 1), x


def step_read_only(carry, _):
    # floor: kernel reads only, no cache update anywhere
    (ck, cv), x, pos = carry

    def body(acc, xs):
        k_l, v_l = xs
        return attention_read(k_l, v_l, acc), None

    x, _ = jax.lax.scan(body, x, (ck, cv))
    return ((ck, cv), x, pos + 1), x


run("read only", step_read_only)
run("xs/ys", step_xs_ys)
run("carry DUS", step_carry_dus)
run("unrolled", step_unrolled)
run("tuple", step_tuple_unrolled, tuple_cache=True)
