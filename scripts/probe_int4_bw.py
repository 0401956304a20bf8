"""Isolated bandwidth probe of ops/int4_matmul at 13B decode shapes.

bench.py reports 13B int4 decode at 350 GB/s achieved = 43% of the v5e HBM
roofline, while 7B int8 decode reaches 68%. This probe times the int4 Pallas
kernel alone (scan-in-jit, fake dependency chain) on each 13B weight shape to
see whether the gap is the kernel (in-register nibble unpack is 2 VPU ops per
byte vs int8's 1) or lives elsewhere in the step.

Usage: python scripts/probe_int4_bw.py [M=4 ITERS=50]
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

M = int(os.environ.get("M", "4"))
ZF = bool(int(os.environ.get("ZF", "1")))  # zero_fold A/B
U8 = bool(int(os.environ.get("U8", "0")))  # uint8-native unpack A/B
ITERS = int(os.environ.get("ITERS", "250"))

# 13B decoder shapes (hidden 5120, mlp 13824, vocab 32000)
SHAPES = [
    ("qkvo 5120x5120", 5120, 5120),
    ("gate/up 5120x13824", 5120, 13824),
    ("down 13824x5120", 13824, 5120),
    ("lm_head 5120x32000", 5120, 32000),
]


def bench(name, K, N, zf=None):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    qw = quantize_tensor_int4(w)
    packed, scales = qw["q4"], qw["s"]
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    nbytes = packed.nbytes + scales.nbytes

    def many(x):
        def body(xx, _):
            o = int4_matmul(xx, packed, scales, zero_fold=ZF, unpack_u8=U8)
            return (xx + o[:, :K].astype(jnp.bfloat16) * 1e-30
                    if N >= K else
                    xx.at[:, :N].add(o.astype(jnp.bfloat16) * 1e-30)), None

        xx, _ = jax.lax.scan(body, x, None, length=ITERS)
        return xx.astype(jnp.float32).sum()

    # chain-length differencing: step = (t(2N) - t(N)) / N — the per-call
    # tunnel floor cancels (see probe_stream_matrix.py)
    def make(iters):
        def many_n(x):
            def body(xx, _):
                o = int4_matmul(xx, packed, scales,
                                zero_fold=ZF if zf is None else zf,
                                unpack_u8=U8)
                return (xx + o[:, :K].astype(jnp.bfloat16) * 1e-30
                        if N >= K else
                        xx.at[:, :N].add(o.astype(jnp.bfloat16) * 1e-30)), None
            xx, _ = jax.lax.scan(body, x, None, length=iters)
            return xx.astype(jnp.float32).sum()
        return many_n

    t = {}
    for iters in (ITERS, 2 * ITERS):
        jfn = jax.jit(make(iters))
        np.asarray(jfn(x))  # compile + warm
        best = 1e9
        for _ in range(6):
            t0 = time.perf_counter()
            out = jfn(x)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    dt = max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)
    tag = "" if zf is None else f" zf={int(zf)}"
    print(f"{name:24s}{tag} {dt*1e3:8.3f} ms  {nbytes/dt/1e9:7.1f} GB/s "
          f"({nbytes/1e6:.1f} MB packed+scales)", flush=True)
    return dt, nbytes


def main():
    print(f"device: {jax.devices()[0]}, M={M}, iters={ITERS}, zero_fold={ZF}")
    tot_t, tot_b = 0.0, 0
    ab = bool(int(os.environ.get("AB", "0")))
    for name, K, N in SHAPES:
        if ab:
            for zf in (False, True, False, True):
                bench(name, K, N, zf=zf)
            continue
        dt, nb = bench(name, K, N)
        tot_t += dt
        tot_b += nb
    print(f"{'TOTAL (one of each)':24s} {tot_t*1e3:8.3f} ms  "
          f"{tot_b/tot_t/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
