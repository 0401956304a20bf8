"""(block_k, block_n) sweep for ops/int4_matmul at the weakest 13B shape
(gate/up: K=5120, N=13824 — 564 GB/s vs 758 on qkvo, probe_int4_bw.py).

Chain-differenced in-jit timing; weights as jit args.

Usage: python scripts/sweep_int4_blocks.py [ITERS=250]
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
K = int(os.environ.get("K", "5120"))
N = int(os.environ.get("N", "13824"))
ITERS = int(os.environ.get("ITERS", "250"))

key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
qt = quantize_tensor_int4(w)
packed, scales = qt["q4"], qt["s"]
x = jax.random.normal(key, (M, K), jnp.bfloat16)
nbytes = packed.nbytes + scales.nbytes


def timed(bk, bn):
    def make(iters):
        def fn(x, packed, scales):
            def body(xc, _):
                o = int4_matmul(xc, packed, scales, block_n=bn, block_k=bk)
                return xc.at[:, :].add(
                    (o.astype(jnp.float32).sum() * 1e-30).astype(xc.dtype)), None
            xc, _ = jax.lax.scan(body, x, None, length=iters)
            return xc.astype(jnp.float32).sum()
        return fn

    t = {}
    for iters in (ITERS, 2 * ITERS):
        fn = jax.jit(make(iters))
        np.asarray(fn(x, packed, scales))
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(x, packed, scales)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    dt = max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)
    print(f"bk={bk:5d} bn={bn or 0:6d}  {dt*1e3:7.3f} ms  "
          f"{nbytes/dt/1e9:7.1f} GB/s")
    return dt


def main():
    print(f"device {jax.devices()[0]}  {M}x{K}x{N} int4 "
          f"({nbytes/1e6:.1f} MB packed+scales)")
    if (K, N) == (5120, 13824) and "BKBN" not in os.environ:
        cands = ((512, None), (512, 3456), (512, 6912), (640, 3456),
                 (384, 4608), (256, 6912), (1280, 2304), (2560, 1152))
    elif "BKBN" in os.environ:  # e.g. BKBN="512:None,256:5120"
        cands = tuple(
            (int(bk), None if bn in ("None", "0") else int(bn))
            for bk, bn in (p.split(":") for p in os.environ["BKBN"].split(",")))
    else:  # generic grid: 128-multiple divisors of N × a bk ladder
        bns = [None] + [b for b in range(128, min(N, 8192) + 1, 128)
                        if N % b == 0][-4:]
        cands = tuple((bk, bn) for bk in (256, 512, 1024)
                      for bn in bns)
    for bk, bn in cands:
        try:
            timed(bk, bn)
        except Exception as e:  # noqa: BLE001
            print(f"bk={bk} bn={bn}  FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
