"""Causal flash forward block sweep at the 7B decoder prefill shape
(4 x 32 x 1024 x 128). The (256, 512) default came from the r2 sweep at
4x8x1536x128; the r3 encoder sweeps showed fatter tiles win, so re-check
at the production prefill shape.

Usage: python scripts/sweep_flash_causal.py [ITERS=20]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention

ITERS = int(os.environ.get("ITERS", "20"))
B, H, S, D = 4, 32, 1024, 128
PEAK = 197e12
FLOPS = 2 * 2 * B * H * S * S * D / 2  # causal half

key = jax.random.PRNGKey(0)
q = (jax.random.normal(key, (B, H, S, D)) * 0.3).astype(jnp.bfloat16)
lengths = jnp.array([1024, 900, 780, 1024], jnp.int32)


def timed(bq, bk):
    def make(iters):
        def fn(q):
            def rep(qq, _):
                o = flash_attention(qq, qq, qq, lengths=lengths, causal=True,
                                    block_q=bq, block_k=bk)
                return qq + (o.astype(jnp.float32).sum() * 1e-30).astype(qq.dtype), None
            qq, _ = jax.lax.scan(rep, q, None, length=iters)
            return qq.astype(jnp.float32).sum()
        return fn

    t = {}
    for iters in (ITERS, 2 * ITERS):
        fn = jax.jit(make(iters))
        np.asarray(fn(q))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(q)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    dt = max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)
    print(f"bq={bq:5d} bk={bk:5d}  {dt*1e3:7.3f} ms  MFU {FLOPS/dt/PEAK*100:5.1f}%")
    return dt


def main():
    print(f"device {jax.devices()[0]}  {B}x{H}x{S}x{D} causal")
    for bq, bk in ((256, 512), (512, 512), (512, 1024), (256, 1024),
                   (1024, 1024), (512, 256), (128, 512)):
        try:
            timed(bq, bk)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}  FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
