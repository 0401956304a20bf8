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


def test_usability_gate(monkeypatch):
    # on a non-TPU backend the gate is unconditionally off (Pallas-Mosaic
    # only lowers on TPU) — the CLI --platform cpu smoke relies on this
    assert not flash_attention_usable(2048, 128)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert flash_attention_usable(2048, 128)
    assert flash_attention_usable(1536, 64)  # encoder heads (verified on-device)
    assert not flash_attention_usable(2048, 32)  # tiny test models → XLA path
    assert not flash_attention_usable(1000, 128)  # not block-aligned


def test_gradients_match_xla():
    """custom-vjp backward vs autodiff through the XLA oracle."""
    q, k, v = _qkv(B=1, H=2, S=128, D=128, scale=0.3)
    lengths = jnp.array([100])

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, lengths=lengths)
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape) * 1e-3
        mask = (jnp.arange(128) < 100)[None, None, :, None]
        return jnp.sum(out * w * mask)

    def loss_xla(q, k, v):
        out = dot_product_attention(q, k, v, make_prefill_mask(lengths, 128))
        w = jnp.arange(out.size, dtype=out.dtype).reshape(out.shape) * 1e-3
        mask = (jnp.arange(128) < 100)[None, None, :, None]
        return jnp.sum(out * w * mask)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        d = np.abs(np.asarray(a) - np.asarray(b))
        scale = np.abs(np.asarray(b)).max() + 1e-9
        assert d.max() / scale < 2e-4, (name, d.max(), scale)


def test_whisper_encoder_flash_option_matches_xla():
    """use_flash=True pads 1500→1536 + length-masks; output must match XLA."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.whisper import (
        WhisperEncoderConfig,
        init_whisper_encoder,
        whisper_encode,
    )

    cfg = WhisperEncoderConfig(dim=64, n_heads=1, n_layers=1)
    params = init_whisper_encoder(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 80, 3000)) * 0.3
    ref = np.asarray(whisper_encode(cfg, params, mel))
    out = np.asarray(
        whisper_encode(dataclasses.replace(cfg, use_flash=True), params, mel)
    )
    assert out.shape == ref.shape == (1, 1500, 64)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_beats_encoder_flash_option_matches_xla():
    import dataclasses

    from icl_speech_text_llm_tpu.models.beats import (
        BeatsConfig,
        beats_encode,
        init_beats,
    )

    cfg = BeatsConfig(dim=64, embed_dim=32, n_heads=1, n_layers=1, conv_pos=16,
                      conv_pos_groups=4, gated_rel_pos=False)
    params = init_beats(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 16000 * 2)) * 0.05
    ref = np.asarray(beats_encode(cfg, params, wav))
    out = np.asarray(beats_encode(dataclasses.replace(cfg, use_flash=True), params, wav))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_pallas_backward_multiblock_vs_scan_oracle():
    """Dedicated Pallas bwd kernels vs the retained scan-rule oracle, on a
    grid with multiple q AND kv blocks, ragged lengths, causal + non-causal."""
    from icl_speech_text_llm_tpu.ops import flash_attention as fa

    q, k, v = _qkv(B=2, H=2, S=256, D=128, scale=0.3)
    lengths = jnp.array([256, 147])
    do = jax.random.normal(jax.random.PRNGKey(3), q.shape) * 0.1
    # zero upstream grads beyond each sample's length (as a masked loss would)
    do = do * (jnp.arange(256)[None, None, :, None] < lengths[:, None, None, None])

    for causal in (True, False):
        o, m, l = fa._flash_forward(q, k, v, lengths, causal, 0.5, 128, 128)
        res = (q, k, v, lengths, o, m[:, :, 0], l[:, :, 0])
        dq_p, dk_p, dv_p, _ = fa._flash_bwd_rule(causal, 0.5, 128, 128, 128, 128, res, do)
        dq_s, dk_s, dv_s, _ = fa._flash_bwd_scan_rule(causal, 0.5, 128, 128, res, do)
        for a, b, name in ((dq_p, dq_s, "dq"), (dk_p, dk_s, "dk"), (dv_p, dv_s, "dv")):
            d = np.abs(np.asarray(a) - np.asarray(b)).max()
            assert d < 1e-4, (causal, name, d)


def test_pallas_backward_grad_matches_xla_multiblock():
    """End-to-end jax.grad through flash (Pallas fwd+bwd) vs XLA autodiff."""
    q, k, v = _qkv(B=2, H=1, S=256, D=128, scale=0.3)
    lengths = jnp.array([200, 256])
    valid = (jnp.arange(256)[None, None, :, None] < lengths[:, None, None, None])

    def loss(f, *args):
        out = f(*args)
        w = jnp.cos(jnp.arange(out.size, dtype=out.dtype)).reshape(out.shape)
        return jnp.sum(out * w * valid)

    gf = jax.grad(lambda *a: loss(lambda q, k, v: flash_attention(q, k, v, lengths=lengths), *a),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda *a: loss(lambda q, k, v: dot_product_attention(
        q, k, v, make_prefill_mask(lengths, 256)), *a), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        d = np.abs(np.asarray(a) - np.asarray(b))
        scale = np.abs(np.asarray(b)).max() + 1e-9
        assert d.max() / scale < 2e-4, (name, d.max(), scale)
