"""Forward flash-attention block sweep at the whisper-large encoder shape
(6 x 20 x 1536 x 64, non-causal) — the kernel runs at 26% MFU there
(scripts/probe_whisper_inside.py), i.e. ~52% of the hd-64 MXU ceiling
(K/N pad 64→128 halves the peak). Chain-differenced in-jit timing.

Usage: python scripts/sweep_flash_encoder.py [ITERS=20]
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
C, H, T, D = 6, 20, 1536, 64
PEAK = 197e12
FLOPS = 2 * 2 * C * H * T * T * D

key = jax.random.PRNGKey(0)
q = (jax.random.normal(key, (C, H, T, D)) * 0.3).astype(jnp.bfloat16)
lengths = jnp.full((C,), 1500, jnp.int32)


def timed(bq, bk):
    def make(iters):
        def fn(q):
            def rep(qq, _):
                o = flash_attention(qq, qq, qq, lengths=lengths, causal=False,
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
    print(f"device {jax.devices()[0]}  {C}x{H}x{T}x{D} non-causal")
    for bq, bk in ((512, 1536), (256, 1536), (768, 1536), (1536, 1536),
                   (512, 768), (512, 512), (256, 512), (1536, 512)):
        try:
            timed(bq, bk)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}  FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
