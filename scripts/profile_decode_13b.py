"""Component decomposition of the 13B int4 decode step.

bench.py measures the full step at ~21.2 ms (188 tok/s, batch 4): stacked
int4 weight matmuls ~10 ms (6.4 GB at the kernel's ~640 GB/s) + flash-decode
KV read ~6 ms (3.37 GB at ~560). This probe times the residual pieces —
lm_head (int8), the aliased append, rms norms + rope, and one full
zero-copy step — all chain-differenced in one jit.

Usage: python scripts/profile_decode_13b.py [ITERS=30]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.models.llama import (
    DECODER_CONFIGS, init_decoder_quantized, init_lora, lm_logits,
    decoder_forward, init_kv_cache, rope_frequencies)
from icl_speech_text_llm_tpu.models.salmonn import salmonn_13b
from icl_speech_text_llm_tpu.ops.attention import make_decode_mask

ITERS = int(os.environ.get("ITERS", "30"))
B, KV = 2, 512  # small cache: the probe cannot alias the append output
# (the input cache is reused across scan iterations), so two full caches
# coexist — 13B-bench shapes OOM the 16 GB chip here

cfg = salmonn_13b().llm
key = jax.random.PRNGKey(0)
params = init_decoder_quantized(key, cfg, bits=4)
lora = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16),
    init_lora(key, cfg, salmonn_13b().lora))
cache = init_kv_cache(cfg, B, KV)
cache = {k: (jax.random.normal(key, v.shape) * 0.1).astype(v.dtype)
         for k, v in cache.items()}
x = (jax.random.normal(key, (B, 1, cfg.dim)) * 0.1).astype(jnp.bfloat16)
cpos = jnp.array([400, 300], jnp.int32)
mask = make_decode_mask(cpos + 1, KV)


def timed(body, name, args):
    def make(iters):
        def fn(x, *a):
            def rep(xx, _):
                y = body(xx, *a)
                return xx + (y.astype(jnp.float32).sum() * 1e-30).astype(xx.dtype), None
            xx, _ = jax.lax.scan(rep, x, None, length=iters)
            return xx.astype(jnp.float32).sum()
        return fn

    t = {}
    for iters in (ITERS, 2 * ITERS):
        fn = jax.jit(make(iters))
        np.asarray(fn(x, *args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(x, *args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    dt = max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return dt


def full_step(xx, params, lora, cache):
    h, _ = decoder_forward(cfg, params, xx, mask, cpos[:, None], cache=cache,
                           cache_positions=cpos, lora=lora, lora_scaling=2.0)
    return lm_logits(cfg, params, h)


def no_logits(xx, params, lora, cache):
    h, _ = decoder_forward(cfg, params, xx, mask, cpos[:, None], cache=cache,
                           cache_positions=cpos, lora=lora, lora_scaling=2.0)
    return h


def no_lora(xx, params, cache):
    h, _ = decoder_forward(cfg, params, xx, mask, cpos[:, None], cache=cache,
                           cache_positions=cpos)
    return h


def logits_only(xx, params):
    return lm_logits(cfg, params, xx)


def main():
    print(f"device {jax.devices()[0]}  13B int4, B={B}, KV={KV}")
    t_full = timed(full_step, "full zero-copy step + lm_head", (params, lora, cache))
    t_nolog = timed(no_logits, "step without lm_head", (params, lora, cache))
    t_nolora = timed(no_lora, "step without lm_head, without lora", (params, cache))
    timed(logits_only, "lm_head alone (int8)", (params,))
    print(f"lm_head delta {1e3*(t_full-t_nolog):.2f} ms, "
          f"lora delta {1e3*(t_nolog-t_nolora):.2f} ms")


if __name__ == "__main__":
    main()
