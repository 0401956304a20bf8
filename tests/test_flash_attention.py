"""Flash-attention kernel numerics vs the XLA oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


from icl_speech_text_llm_tpu.ops.attention import dot_product_attention, make_prefill_mask
from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention, flash_attention_usable


def _qkv(B=2, H=2, S=256, D=128, scale=0.5):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D)) * scale
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D)) * scale
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D)) * scale
    return q, k, v


def test_causal_with_lengths_matches_xla():
    q, k, v = _qkv()
    lengths = jnp.array([256, 130])
    ref = dot_product_attention(q, k, v, make_prefill_mask(lengths, 256))
    out = flash_attention(q, k, v, lengths=lengths)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d[0, :, :256].max() < 3e-5
    assert d[1, :, :130].max() < 3e-5


def test_non_causal():
    q, k, v = _qkv(S=128)
    lengths = jnp.array([128, 70])
    key_mask = (jnp.arange(128)[None, None, None, :] < lengths[:, None, None, None])
    ref = dot_product_attention(q, k, v, key_mask)
    out = flash_attention(q, k, v, lengths=lengths, causal=False)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d[0].max() < 3e-5
    assert d[1, :, :70].max() < 3e-5


def test_full_length_default():
    q, k, v = _qkv(B=1, H=1, S=128)
    ref = dot_product_attention(q, k, v, make_prefill_mask(jnp.array([128]), 128))
    out = flash_attention(q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 3e-5


def test_usability_gate():
    assert flash_attention_usable(2048, 128)
    assert not flash_attention_usable(2048, 64)  # encoder heads → XLA path
    assert not flash_attention_usable(1000, 128)  # not block-aligned
