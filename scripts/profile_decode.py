"""Component-level profile of the 7B DECODE step on the real chip.

bench.py r3 measured 7B int8 decode at ~314 GB/s achieved — 38% of the HBM
roofline — while the isolated int8 weight matmuls run at ~730 GB/s. This
script decomposes one decode step (B=4, kv≈1030) into separately jitted,
pipelined components (dispatch floor subtracted) to find where the other
~60% goes:
per-layer weight matmuls, attention-over-cache, the vmapped per-sample KV
cache write, LoRA adapters, lm_head.

Usage: python scripts/profile_decode.py  [ITERS=50]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("ITERS", "50"))
B, KV = 4, 1030


def timed(fn, *args, name="", nbytes=0, floor=0.0):
    """Pipelined dispatch timing; the per-dispatch floor is measured and
    subtracted. Components below ~2 ms are floor-dominated here — fine,
    because the eaters this hunts are multi-ms. (A lax.scan wrapper would
    remove the floor entirely but its compile cost through the
    remote-compile tunnel exceeded 20 min for nested-scan components.)"""
    jfn = jax.jit(lambda c, *a: fn(*a, c).astype(jnp.float32).ravel()[:4].sum())
    np.asarray(jfn(jnp.float32(0), *args))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jfn(jnp.float32(0), *args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    dt = max(best / ITERS - floor, 1e-9)
    bw = f"{nbytes/dt/1e9:7.1f} GB/s" if nbytes else ""
    print(f"{name:46s} {dt*1e3:9.3f} ms  {bw}")
    return dt


def measure_floor():
    a = jnp.float32(1.0)
    jfn = jax.jit(lambda c: a * 1e-30 + c)
    np.asarray(jfn(jnp.float32(0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jfn(jnp.float32(0))
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        embed_tokens,
        init_decoder_quantized,
        init_kv_cache,
        init_lora,
        lm_logits,
    )
    from icl_speech_text_llm_tpu.models.salmonn import salmonn_7b
    from icl_speech_text_llm_tpu.ops.attention import make_decode_mask

    cfg = salmonn_7b()
    llm = cfg.llm
    k = jax.random.PRNGKey(0)
    kl, klo = jax.random.split(k)
    params = init_decoder_quantized(kl, llm, bits=8)
    lora = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), init_lora(klo, llm, cfg.lora))

    floor = measure_floor()
    print(f"device {jax.devices()[0]}, dispatch floor {floor*1e3:.2f} ms/call")

    # 128-aligned cache like production (inference/engine.py): the Pallas
    # flash-decode kernel engages inside the full step
    S_al = -(-(KV + 8) // 128) * 128
    cache = init_kv_cache(llm, B, S_al)
    cache_positions = jnp.full((B,), KV, jnp.int32)
    tok = jnp.ones((B,), jnp.int32)
    mask = make_decode_mask(cache_positions + 1, S_al)
    positions = cache_positions[:, None]

    # params/cache/lora are ARGUMENTS everywhere below: closure-captured
    # weights become HLO constants and the remote-compile payload (weights
    # included) stalls compiles for tens of minutes
    def step(p, cch, lora_tree, t, c):
        emb = embed_tokens(p, t[:, None] + c.astype(jnp.int32) * 0,
                           dtype=jnp.bfloat16)
        hidden, _ = decoder_forward(
            llm, p, emb, mask, positions, cache=cch,
            cache_positions=cache_positions, lora=lora_tree,
            lora_scaling=cfg.lora.scaling)
        return lm_logits(llm, p, hidden)[:, 0]

    w_bytes = sum(
        x.nbytes for key, sub in params.items() if key != "tok_embed"
        for x in jax.tree_util.tree_leaves(sub))
    lora_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(lora))
    # the XLA path reads ALL S_al cache positions; the flash kernel streams
    # every tile whose start < length, which at KV=1030 is also all of S_al
    kv_bytes = llm.n_layers * B * S_al * llm.n_kv_heads * llm.hd * 2 * 2
    step_bytes = w_bytes + lora_bytes + kv_bytes
    print(f"weights {w_bytes/1e9:.2f} GB, lora {lora_bytes/1e9:.3f} GB, "
          f"kv {kv_bytes/1e9:.2f} GB -> step {step_bytes/1e9:.2f} GB; "
          f"roofline {step_bytes/819e9*1e3:.1f} ms/step")

    timed(lambda p, cch, lo, t, c: step(p, cch, lo, t, c), params, cache, lora,
          tok, name="full decode step (+lora)", nbytes=step_bytes, floor=floor)
    timed(lambda p, cch, t, c: step(p, cch, None, t, c), params, cache,
          tok, name="full decode step (no lora)", nbytes=w_bytes + kv_bytes,
          floor=floor)
    cache_q8_full = init_kv_cache(llm, B, S_al, quant=True)
    timed(lambda p, cch, lo, t, c: step(p, cch, lo, t, c), params,
          cache_q8_full, lora, tok, name="full decode step (+lora, int8 KV)",
          nbytes=w_bytes + lora_bytes + kv_bytes // 2, floor=floor)

    # --- attention over the cache, all layers (no matmuls) ---
    kq = jax.random.PRNGKey(1)
    q = jax.random.normal(kq, (llm.n_layers, B, llm.n_heads, 1, llm.hd),
                          jnp.bfloat16)

    def attn_all_layers(qq, cch, c):
        from icl_speech_text_llm_tpu.ops.attention import dot_product_attention

        def body(acc, xs):
            ql, ck, cv = xs
            o = dot_product_attention(ql + acc * 0, ck.astype(jnp.bfloat16),
                                      cv.astype(jnp.bfloat16), mask)
            return acc + o.astype(jnp.float32).ravel()[0] * 1e-20, None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              (qq, cch["k"], cch["v"]))
        return acc + c * 0

    timed(attn_all_layers, q, cache, name="attention x32 (XLA path)",
          nbytes=kv_bytes, floor=floor)

    # --- the Pallas flash-decode kernel at the same shapes ---
    lengths = cache_positions + 1

    def flash_all_layers(qq, cch, c):
        from icl_speech_text_llm_tpu.ops.flash_attention import (
            flash_decode_attention,
        )

        def body(acc, xs):
            ql, ck, cv = xs
            o = flash_decode_attention(ql + acc.astype(ql.dtype) * 0, ck, cv,
                                       lengths)
            return acc + o.astype(jnp.float32).ravel()[0] * 1e-20, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (qq, cch["k"], cch["v"]))
        return acc + c * 0

    timed(flash_all_layers, q, cache, name="flash-decode kernel x32",
          nbytes=kv_bytes, floor=floor)

    # --- the int8-KV variant (halved KV bytes) ---
    cache_q8 = init_kv_cache(llm, B, S_al, quant=True)

    def flash_q8_all_layers(qq, cch, c):
        from icl_speech_text_llm_tpu.ops.flash_attention import (
            flash_decode_attention_q8,
        )

        def body(acc, xs):
            ql, ck, cv, cks, cvs = xs
            o = flash_decode_attention_q8(ql + acc.astype(ql.dtype) * 0,
                                          ck, cv, cks, cvs, lengths)
            return acc + o.astype(jnp.float32).ravel()[0] * 1e-20, None

        acc, _ = jax.lax.scan(
            body, jnp.float32(0),
            (qq, cch["k"], cch["v"], cch["k_s"], cch["v_s"]))
        return acc + c * 0

    timed(flash_q8_all_layers, q, cache_q8, name="flash-decode int8-KV x32",
          nbytes=kv_bytes // 2, floor=floor)

    # --- the vmapped per-sample KV cache write, all layers ---
    knew = jax.random.normal(kq, (llm.n_layers, B, llm.n_kv_heads, 1, llm.hd),
                             jnp.bfloat16)

    def write_all_layers(cch, kn, c):
        def wr(ck, kl, pos):
            return jax.lax.dynamic_update_slice(ck, kl.astype(ck.dtype),
                                                (0, pos, 0))

        def body(carry, xs):
            ck, kl = xs
            ck2 = jax.vmap(wr)(ck, kl + carry * 0, cache_positions)
            return carry + ck2.astype(jnp.float32).ravel()[0] * 1e-20, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (cch["k"], kn))
        return acc + c * 0

    timed(write_all_layers, cache, knew, name="vmap KV write x32", floor=floor)

    # --- weight matmuls only (the 7 per-layer projections, M=B) ---
    x4 = jax.random.normal(kq, (B, llm.dim), jnp.bfloat16)

    def matmuls_all_layers(stack, c):
        from icl_speech_text_llm_tpu.ops.quant import dequant_matmul

        def body(acc, layer):
            h = x4 + acc * 0
            a, m = layer["attn"], layer["mlp"]
            y = dequant_matmul(h, a["wq"]) + dequant_matmul(h, a["wk"]) \
                + dequant_matmul(h, a["wv"])
            y = y + dequant_matmul(h, a["wo"])
            g = dequant_matmul(h, m["w_gate"])
            u = dequant_matmul(h, m["w_up"])
            d = dequant_matmul(jax.nn.silu(g) * u, m["w_down"])
            return acc + (y.ravel()[0] + d.ravel()[0]).astype(jnp.float32) * 1e-20, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return acc + c * 0

    layer_bytes = sum(x.nbytes for p in ("attn", "mlp")
                      for x in jax.tree_util.tree_leaves(params["layers"][p]))
    timed(matmuls_all_layers, params["layers"], name="7 weight matmuls x32",
          nbytes=layer_bytes, floor=floor)

    # --- lm_head ---
    hid = jax.random.normal(kq, (B, 1, llm.dim), jnp.bfloat16)
    timed(lambda head, h, c: (h + c.astype(jnp.bfloat16) * 0).reshape(B, llm.dim)
          @ head["q"].astype(jnp.bfloat16) * head["s"].astype(jnp.bfloat16),
          params["lm_head"], hid,
          name="lm_head", nbytes=params["lm_head"]["q"].nbytes, floor=floor)


if __name__ == "__main__":
    main()
