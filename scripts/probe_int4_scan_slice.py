"""Does lax.scan's per-layer xs slice COPY packed int4 weights before the
Pallas kernel reads them?

The zero-copy decode step scans over stacked (L, K/2, N) packed weights; scan
xs slicing materializes each layer's packed tile as a fresh buffer (Pallas
cannot consume a fused dynamic-slice), which would make the physical weight
traffic 3x the packed bytes (slice read + slice write + kernel read). At 13B
that exactly accounts for the measured 29.4 ms decode step (the roofline for
3x 6.4 GB + KV). This probe times, per layer:

  A) scan over stacked (L, half, N) xs -> int4_matmul per slice   (production)
  B) L sequential int4_matmul calls on ONE 2D weight (no slicing) (kernel-only)

Usage: python scripts/probe_int4_scan_slice.py [L=12 K=5120 N=13824 REPS=10]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.ops.quant import quantize_tensor_int4
from icl_speech_text_llm_tpu.ops.int4_matmul import int4_matmul

L = int(os.environ.get("L", "12"))
K = int(os.environ.get("K", "5120"))
N = int(os.environ.get("N", "13824"))
M = int(os.environ.get("M", "4"))
REPS = int(os.environ.get("REPS", "10"))

key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (L, K, N), jnp.float32) * 0.02
qw = quantize_tensor_int4(w)
packed, scales = qw["q4"], qw["s"]  # (L, K/2, N), (L, K/group, N)
x = jax.random.normal(key, (M, K), jnp.bfloat16)
layer_bytes = packed.nbytes // L + scales.nbytes // L


def timed(make, name):
    # weights enter as jit ARGUMENTS — closure capture turns them into HLO
    # constants and overflows the remote-compile payload (HTTP 413)
    t = {}
    for reps in (REPS, 2 * REPS):
        fn = jax.jit(make(reps))
        np.asarray(fn(x, packed, scales))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(x, packed, scales)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[reps] = best
    per_layer = max((t[2 * REPS] - t[REPS]) / REPS / L, 1e-9)
    print(f"{name:44s} {per_layer*1e3:8.3f} ms/layer  "
          f"{layer_bytes/per_layer/1e9:7.1f} GB/s packed")
    return per_layer


def chain(xx, o):
    return (xx + o[:, :K].astype(jnp.bfloat16) * 1e-30
            if N >= K else xx.at[:, :N].add(o.astype(jnp.bfloat16) * 1e-30))


def make_scan(reps):
    def fn(x, packed, scales):
        def rep(xx, _):
            def body(xc, sl):
                p, s = sl
                return chain(xc, int4_matmul(xc, p, s)), None
            xc, _ = jax.lax.scan(body, xx, (packed, scales))
            return xc, None
        xx, _ = jax.lax.scan(rep, x, None, length=reps)
        return xx.astype(jnp.float32).sum()
    return fn


def make_flat(reps):
    def fn(x, packed, scales):
        p0, s0 = packed[0], scales[0]
        def rep(xx, _):
            def body(xc, _):
                return chain(xc, int4_matmul(xc, p0, s0)), None
            xc, _ = jax.lax.scan(body, xx, None, length=L)
            return xc, None
        xx, _ = jax.lax.scan(rep, x, None, length=reps)
        return xx.astype(jnp.float32).sum()
    return fn


def make_stacked(reps):
    def fn(x, packed, scales):
        def rep(xx, _):
            def body(xc, sl):
                s, li = sl
                return chain(xc, int4_matmul(xc, packed, s, layer=li)), None
            lis = jnp.arange(L, dtype=jnp.int32)[:, None]
            xc, _ = jax.lax.scan(body, xx, (scales, lis))
            return xc, None
        xx, _ = jax.lax.scan(rep, x, None, length=reps)
        return xx.astype(jnp.float32).sum()
    return fn


def main():
    print(f"device: {jax.devices()[0]}  L={L} K={K} N={N} M={M} "
          f"({layer_bytes/1e6:.1f} MB packed+scales per layer)")
    # correctness: stacked read == 2D slice
    li = jnp.array([3], jnp.int32)
    a = jax.jit(lambda x, p, s: int4_matmul(x, p[3], s[3]))(x, packed, scales)
    b = jax.jit(lambda x, p, s: int4_matmul(x, p, s[3], layer=li))(
        x, packed, scales)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"stacked-vs-2D max abs err: {err:.2e}")
    timed(make_scan, "A scan over stacked xs (production)")
    timed(make_flat, "B same kernel, one 2D weight (no slice)")
    timed(make_stacked, "C stacked kernel read (scalar-prefetch layer)")


if __name__ == "__main__":
    main()
