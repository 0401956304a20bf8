"""Pallas int4 decode matmul vs the XLA unpack oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


from icl_speech_text_llm_tpu.ops.int4_matmul import int4_matmul, int4_matmul_usable
from icl_speech_text_llm_tpu.ops.quant import _dequant_int4, quantize_tensor_int4


def _case(M=4, K=512, N=256, group=128, seed=0):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    qt = quantize_tensor_int4(w, group=group)
    return x, qt


def test_kernel_matches_unpack_oracle():
    x, qt = _case()
    ref = x @ _dequant_int4(qt, jnp.float32)
    out = int4_matmul(x, qt["q4"], qt["s"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_prefill_sized_m():
    """M=256 (serving-bucket prefill, r5): the default block_n shrinks to
    bound the (M, bn) f32 accumulator; numerics unchanged."""
    x, qt = _case(M=256, K=512, N=512, seed=2)
    ref = x @ _dequant_int4(qt, jnp.float32)
    out = int4_matmul(x, qt["q4"], qt["s"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_kernel_multiple_n_and_k_tiles():
    x, qt = _case(M=2, K=1024, N=1024, group=128, seed=1)
    ref = x @ _dequant_int4(qt, jnp.float32)
    out = int4_matmul(x, qt["q4"], qt["s"], block_n=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_kernel_bf16_inputs():
    x, qt = _case(M=8, K=512, N=512)
    xb = x.astype(jnp.bfloat16)
    ref = (xb @ _dequant_int4(qt, jnp.bfloat16)).astype(jnp.float32)
    out = np.asarray(int4_matmul(xb, qt["q4"], qt["s"])).astype(np.float32)
    # bf16 resolution on accumulated dots
    assert np.abs(out - np.asarray(ref)).max() < 0.05


def test_usability_gate(monkeypatch):
    assert not int4_matmul_usable((4, 512), (256, 256), (4, 256))  # cpu
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert int4_matmul_usable((4, 512), (256, 256), (4, 256))
    assert int4_matmul_usable((128, 512), (256, 256), (4, 256))  # serving prefill M
    assert int4_matmul_usable((1024, 512), (256, 256), (4, 256))  # bucket cap
    assert not int4_matmul_usable((4096, 512), (256, 256), (4, 256))  # static prefill M
    assert not int4_matmul_usable((4, 512), (256, 250), (4, 250))  # ragged N
    assert not int4_matmul_usable((4, 512), (256, 256), (8, 256))  # group 64 < 128


def test_dequant_matmul_routes_and_matches():
    """dequant_matmul must agree between the kernel route (forced usable) and
    the XLA unpack fallback."""
    from icl_speech_text_llm_tpu.ops import quant

    x, qt = _case(M=4, K=512, N=256)
    fallback = np.asarray(quant.dequant_matmul(x, qt))  # cpu → unpack path
    ref = np.asarray(x @ _dequant_int4(qt, jnp.float32))
    np.testing.assert_allclose(fallback, ref, rtol=1e-6, atol=1e-6)


def test_stacked_layer_read_matches_slice():
    """layer= (stacked packed weights, scalar-prefetched layer index) must
    equal the 2D slice for every layer."""
    L, M, K, N = 3, 4, 512, 256
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.05
    qt = quantize_tensor_int4(w)
    for l in range(L):
        ref = int4_matmul(x, qt["q4"][l], qt["s"][l])
        out = int4_matmul(x, qt["q4"], qt["s"][l],
                          layer=jnp.array([l], jnp.int32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


def test_dequant_matmul_stacked_form():
    """The {"q4": stacked, "s": per-layer, "layer": idx} dict form must match
    the plain per-layer dict through dequant_matmul (CPU falls back to an
    indexed dequant)."""
    from icl_speech_text_llm_tpu.ops import quant

    L, M, K, N = 3, 4, 512, 256
    kx, kw = jax.random.split(jax.random.PRNGKey(8))
    x = jax.random.normal(kx, (M, K), jnp.float32) * 0.5
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.05
    qt = quantize_tensor_int4(w)
    for l in range(L):
        ref = np.asarray(quant.dequant_matmul(
            x, {"q4": qt["q4"][l], "s": qt["s"][l]}))
        out = np.asarray(quant.dequant_matmul(
            x, {"q4": qt["q4"], "s": qt["s"][l],
                "layer": jnp.array([l], jnp.int32)}))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
