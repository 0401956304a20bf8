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


def test_gated_bias_flash_matches_materialized_oracle():
    """flash_attention_gated_bias (BEATs attention) vs the explicit
    (B,H,T,T) computation — gate math, bias add, length mask, softmax."""
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_attention_gated_bias

    B, H, S, D = 2, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (B, H, S, D)) * 0.3
    k = jax.random.normal(ks[1], (B, H, S, D)) * 0.3
    v = jax.random.normal(ks[2], (B, H, S, D)) * 0.3
    xh = jax.random.normal(ks[3], (B, H, S, D)) * 0.3
    bias = jax.random.normal(ks[4], (H, S, S)) * 0.5
    grep_w = jax.random.normal(ks[5], (D, 8)) * 0.2
    grep_b = jax.random.normal(ks[6], (8,)) * 0.1
    grep_a = 1.0 + 0.1 * jax.random.normal(ks[7], (H,))
    lengths = jnp.array([256, 131])

    out = flash_attention_gated_bias(q, k, v, xh, bias, grep_w, grep_b,
                                     grep_a, lengths, block_q=128, block_k=128)

    # oracle: materialized gated-bias attention (models/beats.py fallback
    # math); the kernel stores the bias table bf16, so the oracle quantizes
    # it the same way to isolate kernel correctness at exact parity
    bias = bias.astype(jnp.bfloat16).astype(jnp.float32)
    proj = xh @ grep_w + grep_b  # (B,H,S,8)
    ga = jax.nn.sigmoid(proj[..., :4].sum(-1))
    gb = jax.nn.sigmoid(proj[..., 4:].sum(-1))
    scale = ga * (gb * grep_a[None, :, None] - 1.0) + 2.0  # (B,H,S)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D**-0.5)
    logits = logits + scale[..., None] * bias[None]
    valid = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, None]
    logits = jnp.where(valid, logits, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)

    d0 = np.abs(np.asarray(out[0]) - np.asarray(ref[0])).max()
    d1 = np.abs(np.asarray(out[1, :, :131]) - np.asarray(ref[1, :, :131])).max()
    assert d0 < 3e-5 and d1 < 3e-5, (d0, d1)


def test_gated_bias_rows_flash_matches_materialized_oracle():
    """flash_attention_gated_bias_rows (r5 lean single-KV-pass kernel with a
    host-precomputed gate) vs the explicit (B,H,T,T) computation."""
    from icl_speech_text_llm_tpu.ops.flash_attention import (
        flash_attention_gated_bias_rows,
        flash_bias_rows_usable,
    )

    B, H, S, D = 2, 2, 256, 64
    assert flash_bias_rows_usable(B, H, S, D, 4)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (B, H, S, D)) * 0.3
    k = jax.random.normal(ks[1], (B, H, S, D)) * 0.3
    v = jax.random.normal(ks[2], (B, H, S, D)) * 0.3
    xh = jax.random.normal(ks[3], (B, H, S, D)) * 0.3
    bias = jax.random.normal(ks[4], (H, S, S)) * 0.5
    grep_w = jax.random.normal(ks[5], (D, 8)) * 0.2
    grep_b = jax.random.normal(ks[6], (8,)) * 0.1
    grep_a = 1.0 + 0.1 * jax.random.normal(ks[7], (H,))
    lengths = jnp.array([256, 131])

    # host-side gate (the caller computes this; see beats._gate_scale_rows)
    proj = xh @ grep_w + grep_b
    ga = jax.nn.sigmoid(proj[..., :4].sum(-1))
    gb = jax.nn.sigmoid(proj[..., 4:].sum(-1))
    scale = ga * (gb * grep_a[None, :, None] - 1.0) + 2.0  # (B,H,S)

    out = flash_attention_gated_bias_rows(q, k, v, scale, bias, lengths,
                                          block_q=128)

    bias_q = bias.astype(jnp.bfloat16).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D**-0.5)
    logits = logits + scale[..., None] * bias_q[None]
    valid = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, None]
    logits = jnp.where(valid, logits, -1e30)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)

    d0 = np.abs(np.asarray(out[0]) - np.asarray(ref[0])).max()
    d1 = np.abs(np.asarray(out[1, :, :131]) - np.asarray(ref[1, :, :131])).max()
    assert d0 < 3e-5 and d1 < 3e-5, (d0, d1)


def test_beats_gated_rel_pos_flash_matches_fallback(monkeypatch):
    """beats_encode with use_flash=True AND gated_rel_pos=True (the real
    BEATs config) must match the materialized fallback end-to-end. The
    usability gate is forced on (interpret mode runs the kernel on CPU)."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.beats import (
        BeatsConfig,
        beats_encode,
        init_beats,
    )

    cfg = BeatsConfig(dim=128, embed_dim=32, n_heads=2, n_layers=2, conv_pos=16,
                      conv_pos_groups=4, gated_rel_pos=True,
                      rel_pos_buckets=32, rel_pos_max_distance=16)
    params = init_beats(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 16000 * 2)) * 0.05
    ref = np.asarray(beats_encode(cfg, params, wav))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out = np.asarray(beats_encode(dataclasses.replace(cfg, use_flash=True), params, wav))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# flash_decode_attention (single-position decode over the KV cache)
# ---------------------------------------------------------------------------


def _decode_case(B=2, H=4, Hkv=None, S=256, D=128, seed=0):
    from icl_speech_text_llm_tpu.models.llama import repeat_kv
    from icl_speech_text_llm_tpu.ops.attention import (
        dot_product_attention,
        make_decode_mask,
    )

    Hkv = H if Hkv is None else Hkv
    kq, kk, kv, _ = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(kq, (B, H, 1, D), jnp.float32)
    k = jax.random.normal(kk, (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, Hkv, S, D), jnp.float32)
    lengths = jnp.asarray([S - 3, S // 2][:B] + [S // 3] * max(0, B - 2), jnp.int32)
    mask = make_decode_mask(lengths, S)
    oracle = dot_product_attention(
        q, repeat_kv(k, H // Hkv), repeat_kv(v, H // Hkv), mask)
    return q, k, v, lengths, oracle


def test_decode_kernel_matches_oracle():
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention

    q, k, v, lengths, oracle = _decode_case()
    out = flash_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_gqa_heads():
    """GQA: query head h reads cache head h // n_rep (no repeat_kv)."""
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention

    q, k, v, lengths, oracle = _decode_case(B=2, H=8, Hkv=2, S=384, seed=1)
    out = flash_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_gqa_qwen_group_size():
    """r=7 (Qwen2-7B's H/Hkv) exercises odd-r sublane packing + padding."""
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention

    q, k, v, lengths, oracle = _decode_case(B=2, H=14, Hkv=2, S=256, seed=3)
    out = flash_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_multiple_kv_tiles_and_short_lengths():
    """Tiles fully past a sample's length are skipped; result still exact."""
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention

    q, k, v, lengths, oracle = _decode_case(B=3, H=2, S=1024, seed=2)
    out = flash_decode_attention(q, k, v, lengths, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_decode_kernel_q8_matches_dequant_oracle():
    """int8-KV kernel == XLA attention over the explicitly dequantized cache
    (same values, so the only delta is the kernel's own arithmetic)."""
    from icl_speech_text_llm_tpu.models.llama import repeat_kv
    from icl_speech_text_llm_tpu.ops.attention import (
        dot_product_attention,
        make_decode_mask,
    )
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_attention_q8
    from icl_speech_text_llm_tpu.ops.quant import quantize_kv

    B, H, Hkv, S, D = 2, 6, 2, 512, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (B, H, 1, D), jnp.float32)
    k = jax.random.normal(kk, (B, Hkv, S, D), jnp.float32)
    v = jax.random.normal(kv, (B, Hkv, S, D), jnp.float32)
    lengths = jnp.asarray([S - 5, S // 3], jnp.int32)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    out = flash_decode_attention_q8(q, k8, v8, ks, vs, lengths, block_k=256)
    kd = k8.astype(jnp.float32) * ks[..., None]
    vd = v8.astype(jnp.float32) * vs[..., None]
    oracle = dot_product_attention(
        q, repeat_kv(kd, H // Hkv), repeat_kv(vd, H // Hkv),
        make_decode_mask(lengths, S))
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_decode_usability_gate(monkeypatch):
    from icl_speech_text_llm_tpu.ops.flash_attention import flash_decode_usable

    assert not flash_decode_usable((2, 4, 1, 128), (2, 4, 256, 128))  # cpu
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert flash_decode_usable((2, 4, 1, 128), (2, 4, 256, 128))
    assert flash_decode_usable((2, 8, 1, 128), (2, 2, 256, 128))  # gqa
    assert not flash_decode_usable((2, 4, 2, 128), (2, 4, 256, 128))  # Tq=2
    assert not flash_decode_usable((2, 4, 1, 64), (2, 4, 256, 64))  # D=64
    assert not flash_decode_usable((2, 4, 1, 128), (2, 4, 250, 128))  # ragged S
    assert not flash_decode_usable((2, 3, 1, 128), (2, 2, 256, 128))  # H % Hkv
    assert not flash_decode_usable((2, 16, 1, 128), (2, 1, 256, 128))  # r > 8


def test_decode_kernel_in_layer_forward(monkeypatch):
    """decoder_forward's decode step routes through the kernel when usable
    and produces the same hidden states as the XLA mask path."""
    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        init_decoder,
        init_kv_cache,
    )
    from icl_speech_text_llm_tpu.ops.attention import make_decode_mask

    cfg = DECODER_CONFIGS["tiny"]
    # the tiny preset's hd is small; build a config whose hd qualifies
    import dataclasses

    cfg = dataclasses.replace(cfg, n_heads=2, n_kv_heads=2, head_dim=128)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    B, S = 2, 256
    cache = init_kv_cache(cfg, B, S, dtype=jnp.float32)
    cur_len = jnp.asarray([100, 40], jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, cfg.dim), jnp.float32)
    mask = make_decode_mask(cur_len + 1, S)

    out_xla, _ = decoder_forward(cfg, params, x, mask, cur_len[:, None],
                                 cache=cache, cache_positions=cur_len)

    import icl_speech_text_llm_tpu.ops.flash_attention as fa

    calls = {}
    real = fa.flash_decode_attention

    def spy(*a, **kw):
        calls["hit"] = True
        return real(*a, **kw)

    monkeypatch.setattr(fa, "flash_decode_attention", spy)
    monkeypatch.setattr(fa, "flash_decode_usable", lambda *a: True)
    out_kernel, _ = decoder_forward(cfg, params, x, mask, cur_len[:, None],
                                    cache=cache, cache_positions=cur_len)
    assert calls.get("hit")
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)


def test_zero_copy_decode_updates_cache_like_general_path(monkeypatch):
    """The zero-copy decode step (stacked-cache kernel read + self column +
    aliased append) must return BOTH the same hidden states and the same
    updated cache as the general xs/ys path, across several chained steps."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        init_decoder,
        init_kv_cache,
    )
    from icl_speech_text_llm_tpu.ops.attention import make_decode_mask

    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_heads=4, n_kv_heads=2,
                              head_dim=128)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    B, S = 2, 256
    cur0 = jnp.asarray([100, 40], jnp.int32)

    def roll(use_kernel, steps=3):
        if use_kernel:
            monkeypatch.setattr(
                "icl_speech_text_llm_tpu.ops.flash_attention.flash_decode_usable",
                lambda *a: True)
        else:
            monkeypatch.setattr(
                "icl_speech_text_llm_tpu.ops.flash_attention.flash_decode_usable",
                lambda *a: False)
        cache = init_kv_cache(cfg, B, S, dtype=jnp.float32)
        cur = cur0
        outs = []
        for t in range(steps):
            x = jax.random.normal(jax.random.PRNGKey(10 + t), (B, 1, cfg.dim),
                                  jnp.float32)
            mask = make_decode_mask(cur + 1, S)
            out, cache = decoder_forward(cfg, params, x, mask, cur[:, None],
                                         cache=cache, cache_positions=cur)
            outs.append(out)
            cur = cur + 1
        return outs, cache

    outs_x, cache_x = roll(False)
    outs_k, cache_k = roll(True)
    for ox, ok in zip(outs_x, outs_k):
        np.testing.assert_allclose(np.asarray(ok), np.asarray(ox),
                                   rtol=2e-4, atol=2e-4)
    for key in ("k", "v"):
        np.testing.assert_allclose(np.asarray(cache_k[key]),
                                   np.asarray(cache_x[key]),
                                   rtol=2e-4, atol=2e-4)


def test_zero_copy_decode_int8_kv(monkeypatch):
    """Zero-copy decode over an int8-quantized cache: hidden states track the
    general int8-KV path; appended int8 rows + scales match exactly."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        init_decoder,
        init_kv_cache,
    )
    from icl_speech_text_llm_tpu.ops.attention import make_decode_mask

    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_heads=2, n_kv_heads=2,
                              head_dim=128)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    B, S = 2, 256
    cur = jnp.asarray([64, 30], jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, 1, cfg.dim), jnp.float32)
    mask = make_decode_mask(cur + 1, S)

    monkeypatch.setattr(
        "icl_speech_text_llm_tpu.ops.flash_attention.flash_decode_usable",
        lambda *a: False)
    cache = init_kv_cache(cfg, B, S, quant=True)
    out_x, cache_x = decoder_forward(cfg, params, x, mask, cur[:, None],
                                     cache=cache, cache_positions=cur)

    monkeypatch.setattr(
        "icl_speech_text_llm_tpu.ops.flash_attention.flash_decode_usable",
        lambda *a: True)
    cache = init_kv_cache(cfg, B, S, quant=True)
    out_k, cache_k = decoder_forward(cfg, params, x, mask, cur[:, None],
                                     cache=cache, cache_positions=cur)
    # the zero-copy path attends the current token UNQUANTIZED (the general
    # path quantizes it before attending) — small numeric gap on top of bf16
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=2e-2, atol=2e-2)
    for key in ("k_s", "v_s"):
        # same fma-association noise as the int8 rows below
        np.testing.assert_allclose(np.asarray(cache_k[key]),
                                   np.asarray(cache_x[key]),
                                   rtol=1e-4, atol=1e-6)
    for key in ("k", "v"):
        # int8 rows may differ by 1 LSB on round-to-nearest ties (compiler
        # fusion changes fma association between the two paths)
        np.testing.assert_allclose(np.asarray(cache_k[key], np.int32),
                                   np.asarray(cache_x[key], np.int32),
                                   atol=1)
