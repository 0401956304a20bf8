"""Ring attention vs single-device oracle on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.ops.attention import dot_product_attention, make_prefill_mask
from icl_speech_text_llm_tpu.parallel.mesh import make_mesh
from icl_speech_text_llm_tpu.parallel.ring_attention import ring_attention


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    return make_mesh(dp=1, fsdp=1, tp=8)


def _qkv(B=2, H=2, S=64, D=16):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D)) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D)) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D)) * 0.5
    return q, k, v


def test_ring_matches_oracle_causal(mesh):
    q, k, v = _qkv()
    lengths = jnp.array([64, 40])
    ref = dot_product_attention(q, k, v, make_prefill_mask(lengths, 64))
    out = ring_attention(q, k, v, mesh, axis_name="tp", lengths=lengths, causal=True)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d[0].max() < 1e-5
    assert d[1, :, :40].max() < 1e-5


def test_ring_matches_oracle_full(mesh):
    q, k, v = _qkv(S=32)
    key_mask = jnp.ones((2, 1, 1, 32), bool)
    ref = dot_product_attention(q, k, v, key_mask)
    out = ring_attention(q, k, v, mesh, axis_name="tp", causal=False)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_decoder_forward_with_ring_matches_plain():
    """decoder_forward(ring=(mesh, axis)) — the sp wiring — must equal the
    plain forward on ragged-length causal prompts."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        init_decoder,
    )
    from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask

    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_layers=2)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    B, T = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.dim)) * 0.1
    lengths = jnp.array([T, T - 5])
    mask = make_prefill_mask(lengths, T)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    ref, _ = decoder_forward(cfg, params, x, mask, pos)
    out, _ = decoder_forward(cfg, params, x, mask, pos,
                             flash_lengths=lengths, ring=(mesh, "tp"))
    d = np.abs(np.asarray(out) - np.asarray(ref))
    # positions beyond a sample's length see different masking tails; compare
    # the valid region
    assert d[0].max() < 1e-5
    assert d[1, : T - 5].max() < 1e-5


def test_decoder_ring_with_remat():
    """remat=True + ring must work (Mesh is closure-bound, not traced through
    jax.checkpoint — round-2 review finding: it crashed at trace time)."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        init_decoder,
    )
    from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask

    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_layers=2)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    B, T = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.dim)) * 0.1
    lengths = jnp.full((B,), T, jnp.int32)
    mask = make_prefill_mask(lengths, T)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))

    ref, _ = decoder_forward(cfg, params, x, mask, pos)
    out, _ = decoder_forward(cfg, params, x, mask, pos, remat=True,
                             flash_lengths=lengths, ring=(mesh, "tp"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
