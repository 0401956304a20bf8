"""Component attribution for the BEATs forward at the salmonn-7b chunk shape.

OPTIMIZATIONS.md r4: BEATs runs 26.1 ms per 6-clip chunk = 41.2% MFU. The
gated-bias flash kernel is ~9.5 ms of it (12 x 0.79); QKVO+MLP MXU floor is
~8 ms — so ~8-9 ms is unattributed (layernorms, gelu, head transposes,
conv_pos, patch embed, deep-norm scales). This probe times the full encode,
then re-times with pieces stubbed out (attention kernel -> identity, gelu ->
identity, layer_norm -> identity) to name the spend.

Stubbing keeps shapes/dtypes identical so XLA can't DCE surrounding code.
Numbers are differences of pipelined in-process timings, same method as
bench.py.

Usage: python scripts/probe_beats_parts.py [ITERS=8]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.models import beats as beats_mod
from icl_speech_text_llm_tpu.models import common as common_mod
from icl_speech_text_llm_tpu.models.beats import (
    BeatsConfig,
    beats_encode_fbank,
    init_beats,
)

ITERS = int(os.environ.get("ITERS", "8"))
C = 6  # clips per chunk (salmonn-7b encode_chunk)
T_FRAMES, N_FBANK = 2992, 128  # 30 s kaldi fbank


def timed(run, params, fb):
    """Chain-differenced in-jit timing: the encode body repeats inside ONE
    lax.scan with a fake data dependency (fb perturbed by the scalar output),
    and per-iteration time is (t(2N) − t(N)) / N — the tunnel's dispatch/sync
    floor cancels exactly.

    jax.clear_caches() first: the stub variants rebuild `run` with identical
    code + closure, and JAX's trace cache then REUSES the unstubbed
    executable (measured: every stub 'saved' ~0 ms until the cache was
    cleared — a monkeypatched module attr is invisible to the cache key)."""
    jax.clear_caches()

    def chain(iters):
        def fn(p, fb):
            def body(carry, _):
                s = run(p, carry)
                return carry + (s * 1e-30).astype(carry.dtype), None
            carry, _ = jax.lax.scan(body, fb, None, length=iters)
            return carry.astype(jnp.float32).sum()
        return fn

    t = {}
    for iters in (ITERS, 2 * ITERS):
        jf = jax.jit(chain(iters))
        np.asarray(jf(params, fb))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jf(params, fb))
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    return max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)


def main():
    cfg = BeatsConfig(use_flash=True,
                      lean_bias_flash=bool(int(os.environ.get("LEAN", "1"))))
    params = init_beats(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
    fb = jax.random.normal(jax.random.PRNGKey(1), (C, T_FRAMES, N_FBANK), jnp.float32)

    def run(p, fb):
        # scalar output: a full-tensor fetch pays ~tunnel transfer time and
        # would swamp the 26 ms compute being measured
        return beats_encode_fbank(cfg, p, fb, dtype=jnp.bfloat16).astype(
            jnp.float32).sum()

    full = timed(run, params, fb)
    tp = (T_FRAMES // cfg.patch) * (N_FBANK // cfg.patch)
    flops = 12 * (4 * 2 * C * 1536 * 768**2        # qkvo (padded T)
                  + 2 * 2 * C * 12 * 1536**2 * 64  # attn dots
                  + 2 * 2 * C * 1536 * 768 * 3072)  # mlp
    print(f"device {jax.devices()[0]}  chunk {C}x30s  tokens/clip {tp}")
    print(f"full encode          {full*1e3:7.2f} ms   {flops/full/197e12*100:5.1f}% MFU")

    # --- attention kernel -> identity (v passthrough) ---
    import icl_speech_text_llm_tpu.ops.flash_attention as fa

    orig = fa.flash_attention_gated_bias

    def stub(q, k, v, xh, bias, gw, gb, ga, lengths, **kw):
        return v + q * jnp.asarray(1e-30, q.dtype)  # keep q alive, same shape

    fa.flash_attention_gated_bias = stub
    try:
        no_attn = timed(run, params, fb)
    finally:
        fa.flash_attention_gated_bias = orig
    print(f"  attention kernel   {(full-no_attn)*1e3:7.2f} ms   (stubbed remainder {no_attn*1e3:.2f})")

    # --- gelu -> identity ---
    orig_g = common_mod.gelu
    beats_orig_g = beats_mod.gelu
    common_mod.gelu = lambda x, exact=None: x
    beats_mod.gelu = common_mod.gelu
    try:
        no_gelu = timed(run, params, fb)
    finally:
        common_mod.gelu = orig_g
        beats_mod.gelu = beats_orig_g
    print(f"  gelu               {(full-no_gelu)*1e3:7.2f} ms")

    # --- layer_norm -> identity (keeps params alive via tiny add) ---
    orig_ln = common_mod.layer_norm
    beats_orig_ln = beats_mod.layer_norm

    def ln_stub(x, w, b, eps=1e-5):
        return x + (w.astype(x.dtype) * jnp.asarray(1e-30, x.dtype)
                    + b.astype(x.dtype) * jnp.asarray(1e-30, x.dtype))

    common_mod.layer_norm = ln_stub
    beats_mod.layer_norm = ln_stub
    try:
        no_ln = timed(run, params, fb)
    finally:
        common_mod.layer_norm = orig_ln
        beats_mod.layer_norm = beats_orig_ln
    print(f"  layer_norms        {(full-no_ln)*1e3:7.2f} ms")

    # --- conv_pos -> zero ---
    orig_cp = beats_mod._conv_pos_embed
    beats_mod._conv_pos_embed = lambda cfg, p, x: x * jnp.asarray(0, x.dtype)
    try:
        no_cp = timed(run, params, fb)
    finally:
        beats_mod._conv_pos_embed = orig_cp
    print(f"  conv_pos           {(full-no_cp)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
