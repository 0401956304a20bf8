"""Measured sweep of flash-attention BACKWARD block sizes on the real chip.

Round-1 VERDICT weak #5/item 10: the backward kernels inherited the forward's
block heuristic untuned. This sweeps (bwd_block_q, bwd_block_k) on the two
shapes that matter (LLM prefill: causal 4x8x1536x128; encoder: non-causal
24x8x1536x64), against XLA autodiff of plain attention as the baseline.

Usage (on TPU):  python scripts/sweep_flash_bwd.py
Timing per repo verify notes: pipeline x10 per measurement, sync once.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.ops.attention import dot_product_attention, make_prefill_mask
from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention

SHAPES = [
    # REAL 7B train shape (bench_train_7b: batch 4, 32 q-heads, seq 1024,
    # hd 128) — the r2 sweep ran 4x8x1536x128 instead (VERDICT r3 weak #5)
    ("7b-train-causal", (4, 32, 1024, 128), True),
    # Whisper-large encoder shape (6-clip chunk, 20 heads, hd 64) — only
    # traversed when the encoders are unfrozen, swept for completeness
    ("whisper-large-noncausal", (6, 20, 1536, 64), False),
]
BLOCKS = [128, 256, 512]
PIPE = 10


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(PIPE):
        out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / PIPE


def main():
    for name, (B, H, S, D), causal in SHAPES:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)
        lengths = jnp.full((B,), S, jnp.int32)

        def xla_loss(q, k, v):
            mask = make_prefill_mask(lengths, S) if causal else None
            return jnp.sum(dot_product_attention(q, k, v, mask=mask).astype(jnp.float32))

        g_xla = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))
        t_xla = timed(g_xla, q, k, v)
        print(f"\n== {name} {B}x{H}x{S}x{D} causal={causal} ==")
        print(f"XLA autodiff grad: {t_xla*1e3:8.2f} ms")

        results = []
        for bq in BLOCKS:
            for bk in BLOCKS:
                def fl_loss(q, k, v, bq=bq, bk=bk):
                    return jnp.sum(flash_attention(
                        q, k, v, lengths=lengths, causal=causal,
                        bwd_block_q=bq, bwd_block_k=bk).astype(jnp.float32))

                g = jax.jit(jax.grad(fl_loss, argnums=(0, 1, 2)))
                try:
                    t = timed(g, q, k, v)
                except Exception as e:  # noqa: BLE001
                    print(f"bwd blocks ({bq:4d},{bk:4d}): FAILED {type(e).__name__}")
                    continue
                results.append((t, bq, bk))
                print(f"bwd blocks ({bq:4d},{bk:4d}): {t*1e3:8.2f} ms "
                      f"({t_xla/t:5.2f}x vs XLA)")
        if results:
            t, bq, bk = min(results)
            print(f"BEST: ({bq},{bk}) {t*1e3:.2f} ms = {t_xla/t:.2f}x vs XLA")


if __name__ == "__main__":
    main()
