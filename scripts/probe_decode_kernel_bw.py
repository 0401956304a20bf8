"""Isolated bandwidth probe of ops/flash_attention.flash_decode_attention.

probe_decode_structures.py measured the production decode reader at only
~189 GB/s on 7B/MHA shapes (B=4, Hkv=32, S=1152, D=128) — far off the
~730 GB/s the int8 weight matmuls reach. This probe times ONE kernel launch
(scan-in-jit, fake dependency chains iterations; see .claude/skills/verify
timing rules) across block_k choices and an (L·B, Hkv) folded layout to find
where the per-invocation time goes.

Usage: python scripts/probe_decode_kernel_bw.py [B=4 HKV=32 S=1152 D=128]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("B", "4"))
HKV = int(os.environ.get("HKV", "32"))
S = int(os.environ.get("S", "1152"))
D = int(os.environ.get("D", "128"))
ITERS = int(os.environ.get("ITERS", "30"))

from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention

key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)


def bench(name, Bx, Hx, Sx, block_k):
    q = jax.random.normal(kq, (Bx, Hx, 1, D), jnp.bfloat16)
    k = jax.random.normal(kk, (Bx, Hx, Sx, D), jnp.bfloat16)
    v = jax.random.normal(kv, (Bx, Hx, Sx, D), jnp.bfloat16)
    lengths = jnp.full((Bx,), Sx, jnp.int32)
    nbytes = k.nbytes + v.nbytes

    def many(q, k, v):
        def body(qq, _):
            o = flash_decode_attention(qq, k, v, lengths, block_k=block_k)
            return (qq + o.reshape(qq.shape) * 1e-30).astype(qq.dtype), None

        qq, _ = jax.lax.scan(body, q, None, length=ITERS)
        return qq.astype(jnp.float32).sum()

    fn = jax.jit(many)
    np.asarray(fn(q, k, v))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(q, k, v))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{name:40s} {best*1e6:9.1f} us  {nbytes/best/1e9:7.1f} GB/s")
    return best


print(f"shapes B={B} Hkv={HKV} S={S} D={D}; bytes/call "
      f"{2*B*HKV*S*D*2/1e6:.1f} MB")
for bk in (128, 256, 384, 1152):
    if S % bk == 0 or bk <= S:
        bench(f"block_k={bk}", B, HKV, S, bk)
# folded layouts: fewer (b,h) pairs x longer S streams at the same bytes
bench("folded (1, B*Hkv) S", 1, B * HKV, S, 512)
bench("folded (B*Hkv, 1) S", B * HKV, 1, S, 512)
bench("one long row (1,1,B*Hkv*S)", 1, 1, B * HKV * S, 512)
bench("one long row, block 4096", 1, 1, B * HKV * S, 4096)
