"""What does Pallas HBM streaming really run at on this chip?

Measurement notes (the first version of this probe was wrong two ways):
- one blocking np.asarray per timed call pays the tunnel's per-call floor
  (tens of ms); dividing by the in-jit iteration count spreads it into a
  fake ~1 ms/iter plateau. Fix: difference two chain lengths —
  step = (t(2N) - t(N)) / N — the floor cancels.
- an XLA reduce over a loop-INVARIANT operand gets hoisted out of the scan
  (one reduce + N trivial adds); chain the reduce input through the carry.

Usage: python scripts/probe_stream_matrix.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N1 = int(os.environ.get("N1", "20"))
NB = 75_497_472  # 75.5 MB
M2, N2 = NB // 2 // 512, 512  # 2D bf16 shape (73728, 512)


def measure(make_fn, *args, nbytes):
    """step time via chain-length differencing (per-call floor cancels)."""
    t = {}
    for iters in (N1, 2 * N1):
        fn = jax.jit(make_fn(iters))
        np.asarray(fn(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    step = (t[2 * N1] - t[N1]) / N1
    step = max(step, 1e-9)
    return step, nbytes / step / 1e9


def stream2d_kernel(x_ref, big_ref, o_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

    acc[...] += (x_ref[...] + big_ref[:8, :128]).astype(jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def run_2d(name, bm, dtype):
    big = jnp.ones((M2, N2), dtype)
    x = jnp.ones((8, 128), jnp.bfloat16)
    call = pl.pallas_call(
        stream2d_kernel,
        grid=(M2 // bm,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((bm, N2), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )

    def make(iters):
        def many(x, big):
            def body(xx, _):
                o = call(xx, big)
                return (xx + o * 1e-30).astype(xx.dtype), None

            xx, _ = jax.lax.scan(body, x, None, length=iters)
            return xx.astype(jnp.float32).sum()

        return many

    step, bw = measure(make, x, big, nbytes=big.nbytes)
    print(f"{name:46s} {step*1e6:9.1f} us  {bw:7.1f} GB/s", flush=True)


def run_xla_reduce(name, dtype):
    big = jnp.ones((M2, N2), dtype)
    x = jnp.ones((1, N2), dtype)

    def make(iters):
        def many(x, big):
            def body(xx, _):
                # fold xx into big's first row so the reduce is loop-variant
                bb = jax.lax.dynamic_update_slice(big, xx, (0, 0))
                r = jnp.max(bb, axis=0, keepdims=True)
                return (xx + r * 1e-30).astype(xx.dtype), None

            xx, _ = jax.lax.scan(body, x, None, length=iters)
            return xx.astype(jnp.float32).sum()

        return many

    step, bw = measure(make, x, big, nbytes=big.nbytes)
    print(f"{name:46s} {step*1e6:9.1f} us  {bw:7.1f} GB/s", flush=True)


def run_decode_kernel(name, B, H, S, D, bk):
    from icl_speech_text_llm_tpu.ops.flash_attention import (
        flash_decode_attention,
    )

    q = jnp.ones((B, H, 1, D), jnp.bfloat16)
    k = jnp.ones((B, H, S, D), jnp.bfloat16)
    v = jnp.ones((B, H, S, D), jnp.bfloat16)
    lengths = jnp.full((B,), S, jnp.int32)

    def make(iters):
        def many(q, k, v):
            def body(qq, _):
                o = flash_decode_attention(qq, k, v, lengths, block_k=bk)
                return (qq + o * 1e-30).astype(qq.dtype), None

            qq, _ = jax.lax.scan(body, q, None, length=iters)
            return qq.astype(jnp.float32).sum()

        return many

    step, bw = measure(make, q, k, v, nbytes=k.nbytes + v.nbytes)
    print(f"{name:46s} {step*1e6:9.1f} us  {bw:7.1f} GB/s", flush=True)


print(f"buffer {NB/1e6:.1f} MB; step = (t(2N)-t(N))/N, N={N1}")
run_xla_reduce("XLA bf16 max-reduce (loop-variant)", jnp.bfloat16)
run_2d("2d plain grid, bm=512 (512KB tile)", 512, jnp.bfloat16)
run_2d("2d plain grid, bm=2048 (2MB tile)", 2048, jnp.bfloat16)
run_2d("2d plain grid, bm=128 (128KB tile)", 128, jnp.bfloat16)
run_decode_kernel("decode kernel bk=384 (hb auto)", 4, 32, 1152, 128, 384)
run_decode_kernel("decode kernel bk=512 (hb auto)", 4, 32, 1024, 128, 512)
