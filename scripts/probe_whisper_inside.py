"""Inside-whisper profile: where do the encoder's 137 ms (6 clips) go?

profile_prefill.py puts the whisper encoder at 50.6% MFU — the largest
prefill block (548 ms of the 1.17 s 7B step at 24 clips). Its FLOPs are
85% plain GEMMs at M=9216, which should run ~80% MFU, so something else
drags. Candidates: flash attention at hd=64 (K/N pad to 128 → ≤50% MXU),
exact-erf GELU on (9216, 5120) activations, the conv frontend, layernorms.

Times per component via chain differencing (ITERS vs 2*ITERS in one jit).

Usage: python scripts/probe_whisper_inside.py [ITERS=20]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.models.whisper import (
    WHISPER_CONFIGS, init_whisper_encoder, _conv1d)
from icl_speech_text_llm_tpu.models.common import layer_norm
from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention

ITERS = int(os.environ.get("ITERS", "20"))
C = 6                 # clips per encode chunk (production encode_chunk)
T = 1536              # padded flash length
PEAK = 197e12

cfg = WHISPER_CONFIGS["large-v2"]
d, H = cfg.dim, cfg.n_heads
hd = d // H
L = cfg.n_layers

key = jax.random.PRNGKey(0)
params = jax.tree_util.tree_map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    init_whisper_encoder(key, cfg))
blk = jax.tree_util.tree_map(lambda x: x[0], params["blocks"])

x0 = (jax.random.normal(key, (C, T, d)) * 0.1).astype(jnp.bfloat16)
mel = (jax.random.normal(key, (C, cfg.n_mels, 3000)) * 0.3).astype(jnp.bfloat16)
lengths = jnp.full((C,), 1500, jnp.int32)


def timed(make, name, flops=0.0, per_layer=False):
    t = {}
    for iters in (ITERS, 2 * ITERS):
        fn = jax.jit(make(iters))
        np.asarray(fn(x0, blk))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(x0, blk)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    dt = max((t[2 * ITERS] - t[ITERS]) / ITERS, 1e-9)
    tot = dt * (L if per_layer else 1)
    mfu = flops / dt / PEAK if flops else 0.0  # flops are per single call
    lbl = f"(x{L} layers = {tot*1e3:7.2f} ms)" if per_layer else ""
    print(f"{name:34s} {dt*1e3:8.3f} ms {lbl}  MFU {mfu*100:5.1f}%")
    return tot


def chain(xx, y):
    # FULL reduction: a [:1] slice lets XLA dead-code-eliminate every output
    # element but one — and then narrow the producing matmuls to one row
    # (first version of this probe "measured" a 171%-MFU MLP that way).
    # Pallas calls are opaque to DCE; plain XLA matmuls are not.
    return xx + (y.astype(jnp.float32).sum() * 1e-30).astype(xx.dtype)


def mk(body):
    def make(iters):
        def fn(x, b):
            def rep(xx, _):
                return chain(xx, body(xx, b)), None
            xx, _ = jax.lax.scan(rep, x, None, length=iters)
            return xx.astype(jnp.float32).sum()
        return fn
    return make


def attn_body(x, b):
    a = b["attn"]
    h = layer_norm(x, b["ln1"]["w"], b["ln1"]["b"])
    q = (h @ a["wq"].astype(x.dtype) + a["bq"].astype(x.dtype))
    k = h @ a["wk"].astype(x.dtype)
    v = (h @ a["wv"].astype(x.dtype) + a["bv"].astype(x.dtype))
    q = q.reshape(C, T, H, hd).transpose(0, 2, 1, 3)
    k = k.reshape(C, T, H, hd).transpose(0, 2, 1, 3)
    v = v.reshape(C, T, H, hd).transpose(0, 2, 1, 3)
    out = flash_attention(q, k, v, lengths=lengths, causal=False)
    out = out.transpose(0, 2, 1, 3).reshape(C, T, d)
    return out @ a["wo"].astype(x.dtype)


def flash_only_body(x, b):
    q = x[:, :, :H * hd].reshape(C, T, H, hd).transpose(0, 2, 1, 3)
    out = flash_attention(q, q, q, lengths=lengths, causal=False)
    return out


def mlp_body(x, b):
    m = b["mlp"]
    h = layer_norm(x, b["ln2"]["w"], b["ln2"]["b"])
    h = jax.nn.gelu(h @ m["w1"].astype(x.dtype) + m["b1"].astype(x.dtype),
                    approximate=False)
    return h @ m["w2"].astype(x.dtype)


def mlp_tanh_body(x, b):
    m = b["mlp"]
    h = layer_norm(x, b["ln2"]["w"], b["ln2"]["b"])
    h = jax.nn.gelu(h @ m["w1"].astype(x.dtype) + m["b1"].astype(x.dtype),
                    approximate=True)
    return h @ m["w2"].astype(x.dtype)


def mlp_nogelu_body(x, b):
    m = b["mlp"]
    h = layer_norm(x, b["ln2"]["w"], b["ln2"]["b"])
    h = h @ m["w1"].astype(x.dtype) + m["b1"].astype(x.dtype)
    return h @ m["w2"].astype(x.dtype)


def conv_body(x, b):
    xm = mel.astype(x.dtype).transpose(0, 2, 1)
    h = jax.nn.gelu(_conv1d(xm, params["conv1"]["w"], params["conv1"]["b"], 1),
                    approximate=False)
    h = jax.nn.gelu(_conv1d(h, params["conv2"]["w"], params["conv2"]["b"], 2),
                    approximate=False)
    return h


def main():
    M = C * T
    qkvo_f = 4 * 2 * M * d * d
    attn_f = qkvo_f + 2 * 2 * C * H * T * T * hd
    mlp_f = 2 * 2 * M * d * 4 * d
    conv_f = 2 * C * (3000 * 3 * cfg.n_mels * d + 1500 * 3 * d * d)
    print(f"device {jax.devices()[0]}  C={C} T={T} d={d} H={H} hd={hd}")
    t_attn = timed(mk(attn_body), "attn block (ln+qkv+flash+wo)", attn_f,
                   per_layer=True)
    timed(mk(flash_only_body), "flash kernel only",
          2 * 2 * C * H * T * T * hd, per_layer=True)
    t_mlp = timed(mk(mlp_body), "mlp block (ln+gelu exact)", mlp_f,
                  per_layer=True)
    timed(mk(mlp_tanh_body), "mlp block (gelu tanh)", mlp_f, per_layer=True)
    timed(mk(mlp_nogelu_body), "mlp block (no gelu)", mlp_f, per_layer=True)
    timed(mk(conv_body), "conv frontend (x1)", conv_f)
    print(f"attn+mlp x{L}: {(t_attn + t_mlp)*1e3:.1f} ms "
          f"(whole encoder measured ~137 ms)")


if __name__ == "__main__":
    main()
