"""Opt-in REAL-DEVICE tests (``pytest -m device``).

The default suite pins JAX to a virtual 8-device CPU mesh (conftest.py), so
Pallas kernels are only exercised in interpret mode there. These tests re-exec
in ONE child process WITHOUT the cpu pin so the tunneled TPU backend ("axon")
loads, run every kernel check in that single process (backend init through the
tunnel can cost minutes — paying it once is the difference between a usable
and an un-runnable suite), and compare the real Mosaic-lowered kernels against
their XLA oracles.

Run with ``python -m pytest tests/ -m device`` on a device-attached box.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.device

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np

if jax.devices()[0].platform == "cpu":
    print("NO_DEVICE")
    raise SystemExit(0)

# --- 1) gated-bias flash kernel vs the f32 XLA fallback path (ADVICE r2:
# the kernel stores the shared rel-pos bias bf16 while models/beats.py keeps
# it f32 — bound the divergence of the REAL Mosaic lowering explicitly) ---
from icl_speech_text_llm_tpu.ops.flash_attention import (
    flash_attention, flash_attention_gated_bias)
from icl_speech_text_llm_tpu.ops.attention import (
    dot_product_attention, make_prefill_mask)

# S=1536 exercises the production fat-tile config (bq=768, bk=1536 —
# the r3 sweep winner); shorter S collapses to square tiles
B, H, S, D = 2, 4, 1536, 128
ks = jax.random.split(jax.random.PRNGKey(0), 8)
q = jax.random.normal(ks[0], (B, H, S, D)) * 0.3
k = jax.random.normal(ks[1], (B, H, S, D)) * 0.3
v = jax.random.normal(ks[2], (B, H, S, D)) * 0.3
xh = jax.random.normal(ks[3], (B, H, S, D)) * 0.3
bias = jax.random.normal(ks[4], (H, S, S)) * 0.5
grep_w = jax.random.normal(ks[5], (D, 8)) * 0.2
grep_b = jax.random.normal(ks[6], (8,)) * 0.1
grep_a = 1.0 + 0.1 * jax.random.normal(ks[7], (H,))
lengths = jnp.array([1536, 1100])

out = flash_attention_gated_bias(q, k, v, xh, bias, grep_w, grep_b,
                                 grep_a, lengths)
proj = xh @ grep_w + grep_b
ga = jax.nn.sigmoid(proj[..., :4].sum(-1))
gb = jax.nn.sigmoid(proj[..., 4:].sum(-1))
scale = ga * (gb * grep_a[None, :, None] - 1.0) + 2.0
logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D ** -0.5)
logits = logits + scale[..., None] * bias[None]
valid = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, None]
logits = jnp.where(valid, logits, -1e30)
ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
d0 = float(np.abs(np.asarray(out[0]) - np.asarray(ref[0])).max())
d1 = float(np.abs(np.asarray(out[1, :, :1100]) - np.asarray(ref[1, :, :1100])).max())
print("GATED_BIAS", d0, d1)

# batch-blocked opt-in variant (measured-negative perf-wise at the BEATs
# shape, kept for large-B/small-tile regimes — must stay numerically exact)
out_b = flash_attention_gated_bias(q, k, v, xh, bias, grep_w, grep_b,
                                   grep_a, lengths, batch_block=True)
db0 = float(np.abs(np.asarray(out_b[0]) - np.asarray(ref[0])).max())
db1 = float(np.abs(np.asarray(out_b[1, :, :1100]) - np.asarray(ref[1, :, :1100])).max())
print("GATED_BIAS_BATCHED", db0, db1)

# --- 2) plain flash kernel (decoder path) vs XLA attention ---
out = flash_attention(q, k, v, lengths=lengths, causal=True)
ref = dot_product_attention(q, k, v, make_prefill_mask(lengths, S))
d0 = float(np.abs(np.asarray(out[0]) - np.asarray(ref[0])).max())
d1 = float(np.abs(np.asarray(out[1, :, :1100]) - np.asarray(ref[1, :, :1100])).max())
print("FLASH", d0, d1)

# --- 3) packed-tile int4 kernel vs explicit dequant matmul ---
from icl_speech_text_llm_tpu.ops.int4_matmul import int4_matmul
from icl_speech_text_llm_tpu.ops.quant import quantize_tensor_int4, _dequant_int4

K, N = 1024, 1024
w = jax.random.normal(jax.random.PRNGKey(2), (K, N)) * 0.05
qt = quantize_tensor_int4(w, group=128)
x = jax.random.normal(jax.random.PRNGKey(3), (8, K)).astype(jnp.bfloat16)
o = int4_matmul(x, qt["q4"], qt["s"])
r = x @ _dequant_int4(qt, jnp.bfloat16)
d = float(np.abs(np.asarray(o, np.float32) - np.asarray(r, np.float32)).max())
rel = d / (float(np.abs(np.asarray(r, np.float32)).max()) + 1e-9)
print("INT4", rel)

# --- 4) flash-decode kernel (single-position, GQA sublane packing) vs XLA ---
from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention
from icl_speech_text_llm_tpu.ops.attention import make_decode_mask
from icl_speech_text_llm_tpu.models.llama import repeat_kv

for tag, (H2, Hkv2) in (("MHA", (8, 8)), ("GQA7", (14, 2))):
    kd = jax.random.split(jax.random.PRNGKey(4), 3)
    S2, D2 = 1024, 128
    qd = jax.random.normal(kd[0], (2, H2, 1, D2), jnp.bfloat16) * 0.3
    kc = jax.random.normal(kd[1], (2, Hkv2, S2, D2), jnp.bfloat16) * 0.3
    vc = jax.random.normal(kd[2], (2, Hkv2, S2, D2), jnp.bfloat16) * 0.3
    lens = jnp.array([1000, 437], jnp.int32)
    o = flash_decode_attention(qd, kc, vc, lens)
    ref = dot_product_attention(
        qd, repeat_kv(kc, H2 // Hkv2), repeat_kv(vc, H2 // Hkv2),
        make_decode_mask(lens, S2))
    d = float(np.abs(np.asarray(o, np.float32) - np.asarray(ref, np.float32)).max())
    print("DECODE_" + tag, d)

# --- 5) int8-KV decode kernel vs XLA over the explicitly dequantized cache ---
from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention_q8
from icl_speech_text_llm_tpu.ops.quant import quantize_kv

kd = jax.random.split(jax.random.PRNGKey(5), 3)
S2, D2, H2, Hkv2 = 1024, 128, 14, 2
qd = jax.random.normal(kd[0], (2, H2, 1, D2), jnp.bfloat16) * 0.3
kc = jax.random.normal(kd[1], (2, Hkv2, S2, D2), jnp.float32) * 0.3
vc = jax.random.normal(kd[2], (2, Hkv2, S2, D2), jnp.float32) * 0.3
k8, ks = quantize_kv(kc)
v8, vs = quantize_kv(vc)
lens = jnp.array([1000, 437], jnp.int32)
o = flash_decode_attention_q8(qd, k8, v8, ks, vs, lens)
kdq = (k8.astype(jnp.float32) * ks[..., None]).astype(jnp.bfloat16)
vdq = (v8.astype(jnp.float32) * vs[..., None]).astype(jnp.bfloat16)
ref = dot_product_attention(
    qd, repeat_kv(kdq, H2 // Hkv2), repeat_kv(vdq, H2 // Hkv2),
    make_decode_mask(lens, S2))
d = float(np.abs(np.asarray(o, np.float32) - np.asarray(ref, np.float32)).max())
print("DECODE_Q8", d)

# --- 6) serving engine on the real chip: the prefix-cached and chunked
# admission paths must be token-exact vs the plain engine with the Pallas
# decode kernel LIVE in the decode path (CPU tests cover interpret/XLA) ---
from icl_speech_text_llm_tpu.inference.serving import (
    ContinuousBatchingEngine, ServingConfig)
from icl_speech_text_llm_tpu.models.llama import DECODER_CONFIGS, init_decoder

dcfg = DECODER_CONFIGS["tiny"]
dparams = init_decoder(jax.random.PRNGKey(0), dcfg)
srng = np.random.RandomState(7)
pfx = srng.randn(20, dcfg.dim).astype(np.float32) * 0.3
sufs = [(srng.randn(int(l), dcfg.dim).astype(np.float32) * 0.3, int(l))
        for l in srng.randint(5, 15, size=4)]

def serve(scfg, reqs, pid_fn=lambda eng: None):
    eng = ContinuousBatchingEngine(dcfg, dparams, scfg)
    pid = pid_fn(eng)
    rids = [eng.submit(e, l, prefix_id=pid) for e, l in reqs]
    res = eng.run()
    return [res[r] for r in rids]

full = [(np.concatenate([pfx, s]), len(pfx) + l) for s, l in sufs]
plain = serve(ServingConfig(num_slots=2, max_new_tokens=5,
                            prompt_buckets=(64,), eos_token_id=2,
                            admit_batch=2), full)
prefixed = serve(
    ServingConfig(num_slots=2, max_new_tokens=5, prompt_buckets=(16,),
                  prefix_buckets=(32,), eos_token_id=2, admit_batch=2),
    sufs, pid_fn=lambda eng: eng.register_prefix(pfx, len(pfx)))
chunked = serve(ServingConfig(num_slots=2, max_new_tokens=5,
                              prompt_buckets=(64,), eos_token_id=2,
                              admit_batch=2, chunk_len=16), full)
print("SERVING_PREFIX", int(prefixed == plain))
print("SERVING_CHUNKED", int(chunked == plain))

# --- 7) int4 zero-copy decode step (stacked packed weights streamed by the
# scalar-prefetched kernel — never sliced by the scan) vs the XLA decode
# path over the same quantized values ---
from icl_speech_text_llm_tpu.models.llama import (
    DecoderConfig, init_decoder, decoder_forward, init_kv_cache)
from icl_speech_text_llm_tpu.ops.quant import quantize_decoder

zcfg = DecoderConfig(vocab_size=512, dim=256, n_layers=2, n_heads=2,
                     n_kv_heads=2, hidden_dim=512, max_seq_len=256)
zp = quantize_decoder(init_decoder(jax.random.PRNGKey(6), zcfg), bits=4)
kz = jax.random.split(jax.random.PRNGKey(7), 2)
S3 = 128
zcache = {
    "k": (jax.random.normal(kz[0], (2, 2, 2, S3, 128)) * 0.3).astype(jnp.bfloat16),
    "v": (jax.random.normal(kz[1], (2, 2, 2, S3, 128)) * 0.3).astype(jnp.bfloat16),
}
zx = (jax.random.normal(jax.random.PRNGKey(8), (2, 1, 256)) * 0.3).astype(jnp.bfloat16)
zpos_c = jnp.array([100, 37], jnp.int32)
zpos = zpos_c[:, None]
zmask = make_decode_mask(zpos_c + 1, S3)  # self position included (engine.py:149)
outs = {}
for tag, ufd in (("zc", True), ("xla", False)):
    o, nc = jax.jit(lambda p, c: decoder_forward(
        zcfg, p, zx, zmask, zpos, cache=c, cache_positions=zpos_c,
        use_flash_decode=ufd))(zp, {k: v.copy() for k, v in zcache.items()})
    outs[tag] = (np.asarray(o, np.float32), np.asarray(nc["k"], np.float32),
                 np.asarray(nc["v"], np.float32))
dh = np.abs(outs["zc"][0] - outs["xla"][0]).max()
rel = dh / (np.abs(outs["xla"][0]).max() + 1e-9)
# appended cache rows must match where written
rows_zc = np.stack([outs["zc"][1][:, b, :, p] for b, p in enumerate([100, 37])])
rows_xla = np.stack([outs["xla"][1][:, b, :, p] for b, p in enumerate([100, 37])])
# relative: k magnitudes are ~2-4 here (unit-RMS h times dense_init wk), so
# one bf16 ulp is ~0.016-0.03 absolute — normalize before bounding
dk = np.abs(rows_zc - rows_xla).max() / (np.abs(rows_xla).max() + 1e-9)
print("ZEROCOPY_INT4", rel, dk)
"""


@pytest.fixture(scope="module")
def device_results():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], capture_output=True,
                          text=True, timeout=1800, env=env, cwd=_REPO)
    if "NO_DEVICE" in proc.stdout:
        pytest.skip("no real TPU backend reachable")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    out = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if parts and parts[0] in ("GATED_BIAS", "GATED_BIAS_BATCHED",
                                  "FLASH", "INT4",
                                  "DECODE_MHA", "DECODE_GQA7", "DECODE_Q8",
                                  "SERVING_PREFIX", "SERVING_CHUNKED",
                                  "ZEROCOPY_INT4"):
            out[parts[0]] = [float(p) for p in parts[1:]]
    return out


def test_gated_bias_flash_on_device_matches_f32_xla_path(device_results):
    """Tolerance: bf16 quantization of a |bias|<=0.5 table amplified through
    a ~2.5x gate and softmax — the mantissa step at 0.5 is 2^-9 ~ 2e-3."""
    d0, d1 = device_results["GATED_BIAS"]
    assert d0 < 2e-3 and d1 < 2e-3, (d0, d1)


def test_gated_bias_batched_on_device_matches_f32_xla_path(device_results):
    """The opt-in batch-blocked kernel must match the same oracle."""
    d0, d1 = device_results["GATED_BIAS_BATCHED"]
    assert d0 < 2e-3 and d1 < 2e-3, (d0, d1)


def test_flash_attention_on_device_matches_xla(device_results):
    d0, d1 = device_results["FLASH"]
    assert d0 < 3e-3 and d1 < 3e-3, (d0, d1)


def test_int4_matmul_on_device_matches_dequant(device_results):
    (rel,) = device_results["INT4"]
    assert rel < 0.05, rel


def test_flash_decode_on_device_matches_xla(device_results):
    """bf16 inputs through the real Mosaic lowering; bf16 resolution ~4e-3
    on |out|<=0.3-scale values, padded rows/tiles must not leak."""
    (d_mha,) = device_results["DECODE_MHA"]
    (d_gqa,) = device_results["DECODE_GQA7"]
    assert d_mha < 8e-3 and d_gqa < 8e-3, (d_mha, d_gqa)


def test_flash_decode_q8_on_device_matches_dequant_oracle(device_results):
    """int8-KV kernel vs XLA over the same dequantized values: the only
    delta is kernel arithmetic (bf16 MXU) — bound at bf16 resolution."""
    (d_q8,) = device_results["DECODE_Q8"]
    assert d_q8 < 8e-3, d_q8


def test_serving_prefix_cache_token_exact_on_device(device_results):
    """Prefix-cached admission vs full prefill with the REAL Mosaic decode
    kernel live in the slot pool (CPU tests only cover the XLA stand-in)."""
    (ok,) = device_results["SERVING_PREFIX"]
    assert ok == 1.0


def test_serving_chunked_prefill_token_exact_on_device(device_results):
    (ok,) = device_results["SERVING_CHUNKED"]
    assert ok == 1.0


def test_zero_copy_int4_stacked_weights_match_xla(device_results):
    """The int4 zero-copy decode step (packed weights hoisted out of the
    layer scan, streamed by the scalar-prefetched kernel) must match the XLA
    decode path over the same quantized values at bf16 resolution, and the
    appended KV rows must agree (relative, bf16 resolution: the two paths
    compute k/v with different matmul arithmetic — f32-accum kernel vs bf16
    XLA dequant — so appended values differ by ~1 ulp)."""
    rel, dk = device_results["ZEROCOPY_INT4"]
    assert rel < 0.05, rel
    assert dk < 0.02, dk
