"""Is the whisper flash D=64 gap structural MXU lane padding, or fixable?

VERDICT r3 weak-item #2: the whisper-large flash forward (H=20, S=1536,
D=64) runs ~1.1 ms/layer vs 0.74 ms theoretical, and the hypothesis on
record is "K/N pad 64->128 leaves half the MXU lanes idle". Before writing
a head-packed kernel it's worth noting that EVERY 2-head packing scheme
(block-diagonal K, stacked Q, concatenated V) performs exactly 2x the
useful MACs — identical to a padded K=64 contraction running at 50%
utilization. A packed kernel can therefore only win if the raw MXU does NOT
charge 2x for a 64-deep contraction (i.e. Mosaic already packs two 64-deep
passes per 128-lane tile), in which case the 1.1 vs 0.74 gap is NOT lane
padding and the fix lives elsewhere (softmax VPU overlap, grid pipelining).

This probe times raw dots at the whisper tile shapes:
  QK-shaped:  (768, K) @ (K, 1536)   for K in {64, 128}
  PV-shaped:  (768, 1536) @ (1536, N) for N in {64, 128}
If t(K=64) == t(K=128): padding is real -> packing cannot help (2x MACs
== 2x padded time) -> structural, record the negative and stop.
If t(K=64) ~= 0.5 * t(K=128): lanes are packed by Mosaic/XLA already ->
the flash gap is overhead, go hunt it in the kernel instead.

Also times the full flash_attention vs the XLA SDPA oracle at the whisper
shape (6, 20, 1536, 64) for an end-to-end cross-check.

Usage: python scripts/probe_hd64_mxu.py
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

N1 = int(os.environ.get("N1", "50"))
PEAK = 197e12


def measure(make_fn, *args):
    t = {}
    for iters in (N1, 2 * N1):
        fn = jax.jit(make_fn(iters))
        np.asarray(fn(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    return max((t[2 * N1] - t[N1]) / N1, 1e-9)


def dot_chain(K_dim, M_dim, N_dim, transpose_b=False):
    """Chain M x K @ K x N dots; carry flows through the (M, K) operand so
    the dot cannot be hoisted; ALL output elements are consumed (sum) to
    defeat DCE."""
    key = jax.random.PRNGKey(0)
    a = (jax.random.normal(key, (M_dim, K_dim)) * 0.1).astype(jnp.bfloat16)
    b_shape = (N_dim, K_dim) if transpose_b else (K_dim, N_dim)
    b = (jax.random.normal(key, b_shape) * 0.1).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ())) if transpose_b else (((1,), (0,)), ((), ()))

    def make(iters):
        def fn(a, b):
            def body(aa, _):
                o = jax.lax.dot_general(aa, b, dn,
                                        preferred_element_type=jnp.float32)
                upd = o[:, : K_dim].astype(jnp.bfloat16) * 1e-30 if N_dim >= K_dim \
                    else jnp.pad(o, ((0, 0), (0, K_dim - N_dim))).astype(jnp.bfloat16) * 1e-30
                return aa + upd + o.sum().astype(jnp.bfloat16) * 1e-30, None

            aa, _ = jax.lax.scan(body, a, None, length=iters)
            return aa.astype(jnp.float32).sum()

        return fn

    step = measure(make, a, b)
    flops = 2 * M_dim * K_dim * N_dim
    return step, flops / step / PEAK


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    for name, M_dim, K_dim, N_dim, tb in [
        ("QK  K=64  (768,64)@(64,1536)", 768, 64, 1536, True),
        ("QK  K=128 (768,128)@(128,1536)", 768, 128, 1536, True),
        ("QK  K=256 (768,256)@(256,1536)", 768, 256, 1536, True),
        ("PV  N=64  (768,1536)@(1536,64)", 768, 1536, 64, False),
        ("PV  N=128 (768,1536)@(1536,128)", 768, 1536, 128, False),
    ]:
        step, mfu = dot_chain(K_dim, M_dim, N_dim, transpose_b=tb)
        print(f"{name:36s} {step*1e6:8.1f} us  {mfu*100:5.1f}% MFU")

    # end-to-end: whisper-large self-attention shape, one layer
    C, H, T, D = 6, 20, 1536, 64
    key = jax.random.PRNGKey(1)
    q, k, v = (
        (jax.random.normal(kk, (C, H, T, D)) * 0.3).astype(jnp.bfloat16)
        for kk in jax.random.split(key, 3)
    )
    lengths = jnp.full((C,), 1500, jnp.int32)
    flops = 2 * 2 * C * H * T * T * D

    def make_flash(iters):
        def fn(q, k, v):
            def body(qq, _):
                o = flash_attention(qq, k, v, lengths=lengths, causal=False)
                return qq + o * 1e-30 + o.sum() * 1e-30, None
            qq, _ = jax.lax.scan(body, q, None, length=iters)
            return qq.astype(jnp.float32).sum()
        return fn

    def make_xla(iters):
        def fn(q, k, v):
            def body(qq, _):
                s = jnp.einsum("bhqd,bhkd->bhqk", qq, k,
                               preferred_element_type=jnp.float32) * D ** -0.5
                mask = jnp.arange(T)[None, :] < lengths[:, None]
                s = jnp.where(mask[:, None, None, :], s, -1e30)
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
                return qq + o * 1e-30 + o.sum() * 1e-30, None
            qq, _ = jax.lax.scan(body, q, None, length=iters)
            return qq.astype(jnp.float32).sum()
        return fn

    global N1
    N1 = max(N1 // 5, 8)
    for name, mk in [("flash D=64 whisper layer", make_flash),
                     ("XLA SDPA  whisper layer", make_xla)]:
        step = measure(mk, q, k, v)
        print(f"{name:36s} {step*1e3:8.3f} ms  {flops/step/PEAK*100:5.1f}% MFU")


if __name__ == "__main__":
    main()
