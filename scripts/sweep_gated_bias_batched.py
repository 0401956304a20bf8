"""Tile sweep for the BATCH-BLOCKED gated-bias flash kernel at the
BEATs-large shape (6 x 12 x 1536 x 64 + shared (12,1536,1536) bias).

The per-batch kernel re-reads the shared bias per batch element (340 MB of
~410 MB traffic -> 39.3% MFU, r3). The batched kernel reads each bias tile
once; KV traffic then scales with S/tq, so fat q tiles should win — but the
unrolled in-kernel batch loop puts B (tq,tk) f32 intermediates on the Mosaic
stack, which rules out fat tk at fat tq ((256,1536) measured 16.57M scoped
vs the 16M limit). This sweep finds the compilable frontier and the winner.

Usage: python scripts/sweep_gated_bias_batched.py [ITERS=10]
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

ITERS = int(os.environ.get("ITERS", "10"))
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


def timed(make_call):
    def make(iters):
        def fn(q, xh, bias, gw, gb, ga):
            def rep(qq, _):
                o = make_call(qq, xh, bias, gw, gb, ga)
                return qq + (o.astype(jnp.float32).sum() * 1e-30).astype(qq.dtype), None
            qq, _ = jax.lax.scan(rep, q, None, length=iters)
            return qq.astype(jnp.float32).sum()
        return fn

    t = {}
    for iters in (ITERS, 2 * ITERS):
        fn = jax.jit(make(iters))
        np.asarray(fn(q, xh, bias, gw, gb, ga))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(q, xh, bias, gw, gb, ga)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    return (t[2 * ITERS] - t[ITERS]) / ITERS


def run(name, **kw):
    def call(qq, xh, bias, gw, gb, ga):
        return flash_attention_gated_bias(
            qq, qq, qq, xh, bias, gw, gb, ga, lengths, **kw)

    try:
        per = timed(call)
        print(f"{name:>16}: {per*1e3:7.3f} ms  MFU={FLOPS/per/PEAK*100:5.1f}%",
              flush=True)
        return per
    except Exception as e:
        print(f"{name:>16}: FAIL {str(e)[:140]}", flush=True)
        return None


print(f"shape {C}x{H}x{T}x{D}, iters {ITERS}", flush=True)
run("per-batch r3", batch_block=False)
best = (None, 1e9)
for tq, tk in [(768, 128), (768, 256), (512, 256), (512, 384), (512, 512),
               (384, 768), (256, 768), (384, 1536), (1536, 128)]:
    per = run(f"batched {tq}x{tk}", batch_block=True,
              batch_block_q=tq, batch_block_k=tk)
    if per is not None and per < best[1]:
        best = ((tq, tk), per)
print(f"best batched: {best[0]} at {best[1]*1e3:.3f} ms "
      f"(MFU {FLOPS/best[1]/PEAK*100:.1f}%)", flush=True)
