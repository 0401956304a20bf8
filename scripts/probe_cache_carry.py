"""Probe: is a layer-scanned KV cache cheaper as scan CARRY (in-place scatter)
than as scan xs/ys (full slice read + stacked write per layer)?

Decode-step background: decoder_forward threads the cache through the layer
scan as xs/ys, so every decode step moves ~2-3x the cache bytes (xs slice
read, ys stacked write, kernel read) where the ideal is ONE kernel read plus
a (B, Hkv, hd) scatter. This probe times the two structures in isolation —
no weights, no attention math — to see whether XLA keeps the carried buffer
in place.

Usage: python scripts/probe_cache_carry.py  [L=32 B=4 H=8 S=1024 D=128 STEPS=20]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

L = int(os.environ.get("L", "32"))
B = int(os.environ.get("B", "4"))
H = int(os.environ.get("H", "8"))
S = int(os.environ.get("S", "1024"))
D = int(os.environ.get("D", "128"))
STEPS = int(os.environ.get("STEPS", "20"))

cache_bytes = L * B * H * S * D * 2  # bf16
print(f"cache {cache_bytes/1e9:.2f} GB  ({L}x{B}x{H}x{S}x{D} bf16)")


def run(name, step_fn, cache):
    fn = jax.jit(step_fn)
    out = fn(cache, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = cache
    for i in range(STEPS):
        c = fn(c, jnp.int32(i % S))
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:28s} {dt*1e3:8.2f} ms/step  "
          f"({cache_bytes/dt/1e9:7.1f} GB/s if 1x cache moved)")
    return dt


kv = jnp.ones((B, H, 1, D), jnp.bfloat16)
pos = jnp.arange(B, dtype=jnp.int32) * 7 % S


def step_xs_ys(cache, t):
    # current structure: cache slices in via xs, updated slices out via ys
    def body(x, c):
        def write(cl, kvl, p):
            return jax.lax.dynamic_update_slice(cl, kvl, (0, p, 0))

        c = jax.vmap(write)(c, kv.astype(c.dtype)[:, :, 0][:, :, None],
                            pos + t * 0)
        return x + c[0, 0, 0, 0].astype(jnp.float32), c

    x, new_cache = jax.lax.scan(body, jnp.float32(0), cache)
    return new_cache + x.astype(new_cache.dtype) * 0


def step_carry_scatter(cache, t):
    # proposed: full stacked cache carried; per layer a (B,) scatter write
    def body(carry, i):
        x, c = carry
        c = c.at[i, jnp.arange(B), :, pos + t * 0, :].set(
            kv[:, :, 0].astype(c.dtype))
        return (x + c[0, 0, 0, 0, 0].astype(jnp.float32), c), None

    (x, new_cache), _ = jax.lax.scan(
        body, (jnp.float32(0), cache), jnp.arange(L))
    return new_cache + x.astype(new_cache.dtype) * 0


def step_carry_dus(cache, t):
    # variant: per-sample DUS chain (B unrolled) instead of one scatter
    def body(carry, i):
        x, c = carry
        for b in range(B):
            upd = kv[b, :, 0][None, None, :, None, :].astype(c.dtype)
            c = jax.lax.dynamic_update_slice(
                c, upd, (i, b, 0, pos[b] + t * 0, 0))
        return (x + c[0, 0, 0, 0, 0].astype(jnp.float32), c), None

    (x, new_cache), _ = jax.lax.scan(
        body, (jnp.float32(0), cache), jnp.arange(L))
    return new_cache + x.astype(new_cache.dtype) * 0


cache4 = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
run("xs/ys (current)", step_xs_ys, cache4)
run("carry + scatter", step_carry_scatter, cache4)
run("carry + per-sample DUS", step_carry_dus, cache4)


def step_unrolled(cache_list, t):
    # unrolled python loop over layers; each layer owns its buffer (tuple
    # carry through the outer jit) — XLA can update in place per buffer
    out = []
    x = jnp.float32(0)
    for c in cache_list:
        def write(cl, kvl, p):
            return jax.lax.dynamic_update_slice(cl, kvl, (0, p, 0))
        c = jax.vmap(write)(c, kv.astype(c.dtype)[:, :, 0][:, :, None],
                            pos + t * 0)
        x = x + c[0, 0, 0, 0].astype(jnp.float32)
        out.append(c)
    return tuple(o + x.astype(o.dtype) * 0 for o in out)


def run_tuple(name, step_fn, caches):
    fn = jax.jit(step_fn, donate_argnums=(0,))
    out = fn(caches, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = out
    for i in range(STEPS):
        c = fn(c, jnp.int32(i % S))
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:28s} {dt*1e3:8.2f} ms/step  "
          f"({cache_bytes/dt/1e9:7.1f} GB/s if 1x cache moved)")
    return dt


caches = tuple(jnp.zeros((B, H, S, D), jnp.bfloat16) for _ in range(L))
run_tuple("unrolled tuple buffers", step_unrolled, caches)


def step_xs_ys_noadd(cache, t):
    def body(x, c):
        def write(cl, kvl, p):
            return jax.lax.dynamic_update_slice(cl, kvl, (0, p, 0))
        c = jax.vmap(write)(c, kv.astype(c.dtype)[:, :, 0][:, :, None],
                            pos + t * 0)
        return x + c[0, 0, 0, 0].astype(jnp.float32), c
    x, new_cache = jax.lax.scan(body, jnp.float32(0), cache)
    return new_cache


def run_donate(name, step_fn, cache):
    fn = jax.jit(step_fn, donate_argnums=(0,))
    out = fn(cache, jnp.int32(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    c = out
    for i in range(STEPS):
        c = fn(c, jnp.int32(i % S))
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:28s} {dt*1e3:8.2f} ms/step  "
          f"({cache_bytes/dt/1e9:7.1f} GB/s if 1x cache moved)")
    return dt


cache5 = jnp.zeros((L, B, H, S, D), jnp.bfloat16)
run_donate("xs/ys donated, no add", step_xs_ys_noadd, cache5)


def step_unrolled_noadd(cache_list, t):
    out = []
    for c in cache_list:
        def write(cl, kvl, p):
            return jax.lax.dynamic_update_slice(cl, kvl, (0, p, 0))
        c = jax.vmap(write)(c, kv.astype(c.dtype)[:, :, 0][:, :, None],
                            pos + t * 0)
        out.append(c)
    return tuple(out)


caches2 = tuple(jnp.zeros((B, H, S, D), jnp.bfloat16) for _ in range(L))
run_tuple("unrolled donated, no add", step_unrolled_noadd, caches2)
