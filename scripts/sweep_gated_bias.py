"""Block sweep for flash_attention_gated_bias at the BEATs-large shape
(6 x 12 x 1536 x 64 + shared (12,1536,1536) bias).

The plain-flash sweep (scripts/sweep_flash_encoder.py) showed fat tiles
win ~3x over (256,512); the gated kernel still defaulted to (256,512).

Usage: python scripts/sweep_gated_bias.py [ITERS=20]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention_gated_bias

ITERS = int(os.environ.get("ITERS", "20"))
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
lengths = jnp.full((C,), 1496, jnp.int32)


def timed(bq, bk):
    def make(iters):
        def fn(q, xh, bias):
            def rep(qq, _):
                o = flash_attention_gated_bias(
                    qq, qq, qq, xh, bias, gw, gb, ga, lengths,
                    block_q=bq, block_k=bk)
                return qq + (o.astype(jnp.float32).sum() * 1e-30).astype(qq.dtype), None
            qq, _ = jax.lax.scan(rep, q, None, length=iters)
            return qq.astype(jnp.float32).sum()
        return fn

    t = {}
    for iters in (ITERS, 2 * ITERS):
        fn = jax.jit(make(iters))
        np.asarray(fn(q, xh, bias))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(q, xh, bias)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    dt = max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)
    print(f"bq={bq:5d} bk={bk:5d}  {dt*1e3:7.3f} ms  MFU {FLOPS/dt/PEAK*100:5.1f}%")
    return dt


def main():
    print(f"device {jax.devices()[0]}  {C}x{H}x{T}x{D} gated-bias")
    for bq, bk in ((256, 512), (512, 512), (512, 1536), (768, 1536),
                   (1536, 1536), (768, 768), (256, 1536)):
        try:
            timed(bq, bk)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}  FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
