"""Decoder core invariants: KV-cache equivalence, LoRA identity, loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.models.llama import (
    DECODER_CONFIGS,
    LoraConfig,
    cross_entropy_loss,
    decoder_forward,
    init_decoder,
    init_kv_cache,
    init_lora,
    lm_logits,
)
from icl_speech_text_llm_tpu.ops.attention import make_decode_mask, make_prefill_mask

CFG = DECODER_CONFIGS["tiny"]


@pytest.fixture(scope="module")
def setup():
    params = init_decoder(jax.random.PRNGKey(0), CFG)
    B, S = 2, 16
    lengths = jnp.array([16, 11])
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, S, CFG.dim)) * 0.02
    mask = make_prefill_mask(lengths, S)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))
    hidden, _ = decoder_forward(CFG, params, embeds, mask, positions)
    return dict(params=params, B=B, S=S, lengths=lengths, embeds=embeds,
                mask=mask, positions=positions, hidden=hidden)


def test_forward_finite_and_shaped(setup):
    logits = lm_logits(CFG, setup["params"], setup["hidden"])
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_prefill_cache_matches_uncached(setup):
    s = setup
    T_max = 32
    cache = init_kv_cache(CFG, s["B"], T_max, dtype=jnp.float32)
    mask = jnp.concatenate(
        [s["mask"], jnp.zeros((s["B"], 1, s["S"], T_max - s["S"]), bool)], axis=-1
    )
    h2, cache = decoder_forward(
        CFG, s["params"], s["embeds"], mask, s["positions"], cache=cache
    )
    np.testing.assert_allclose(np.asarray(s["hidden"]), np.asarray(h2), rtol=2e-4, atol=2e-5)


def test_kv_decode_matches_full_recompute(setup):
    """The core correctness property of the generation engine: a cached decode
    step at each sample's own length equals recomputing the full sequence."""
    s = setup
    T_max = 32
    cache = init_kv_cache(CFG, s["B"], T_max, dtype=jnp.float32)
    mask = jnp.concatenate(
        [s["mask"], jnp.zeros((s["B"], 1, s["S"], T_max - s["S"]), bool)], axis=-1
    )
    _, cache = decoder_forward(CFG, s["params"], s["embeds"], mask, s["positions"], cache=cache)

    next_tok = jax.random.normal(jax.random.PRNGKey(2), (s["B"], 1, CFG.dim)) * 0.02
    h3, _ = decoder_forward(
        CFG, s["params"], next_tok, make_decode_mask(s["lengths"] + 1, T_max),
        s["lengths"][:, None], cache=cache, cache_positions=s["lengths"],
    )
    # sample 1 has length 11 (right-padded): recompute 12 positions from scratch
    emb_full = jnp.concatenate([s["embeds"][1:2, :11], next_tok[1:2]], axis=1)
    h_ref, _ = decoder_forward(
        CFG, s["params"], emb_full, make_prefill_mask(jnp.array([12]), 12),
        jnp.arange(12)[None],
    )
    assert float(jnp.abs(h3[1, 0] - h_ref[0, -1]).max()) < 1e-4
    # sample 0 is full-length
    emb_full0 = jnp.concatenate([s["embeds"][0:1], next_tok[0:1]], axis=1)
    h_ref0, _ = decoder_forward(
        CFG, s["params"], emb_full0, make_prefill_mask(jnp.array([17]), 17),
        jnp.arange(17)[None],
    )
    assert float(jnp.abs(h3[0, 0] - h_ref0[0, -1]).max()) < 1e-4


@pytest.mark.parametrize("quant", [False, True])
def test_xla_zero_copy_decode_matches_general(setup, quant):
    """use_flash_decode="xla" (zero-copy layout, fused-slice XLA attention —
    the r5 decode path that reads the cache at ~844 GB/s vs the Pallas
    kernel's ~348) must match the general scanned-cache path: same hidden
    state AND same cache contents after a decode step."""
    s = setup
    T_max = 32
    cache_g = init_kv_cache(CFG, s["B"], T_max,
                            dtype=jnp.float32 if not quant else jnp.bfloat16,
                            quant=quant)
    mask = jnp.concatenate(
        [s["mask"], jnp.zeros((s["B"], 1, s["S"], T_max - s["S"]), bool)],
        axis=-1)
    _, cache_g = decoder_forward(CFG, s["params"], s["embeds"], mask,
                                 s["positions"], cache=cache_g)
    cache_x = jax.tree_util.tree_map(jnp.array, cache_g)

    next_tok = jax.random.normal(jax.random.PRNGKey(2), (s["B"], 1, CFG.dim)) * 0.02
    dmask = make_decode_mask(s["lengths"] + 1, T_max)
    h_gen, cache_g = decoder_forward(
        CFG, s["params"], next_tok, dmask, s["lengths"][:, None],
        cache=cache_g, cache_positions=s["lengths"], use_flash_decode=False)
    h_xla, cache_x = decoder_forward(
        CFG, s["params"], next_tok, dmask, s["lengths"][:, None],
        cache=cache_x, cache_positions=s["lengths"], use_flash_decode="xla")
    tol = 5e-3 if quant else 2e-4
    np.testing.assert_allclose(np.asarray(h_xla), np.asarray(h_gen),
                               rtol=tol, atol=tol)
    # the written cache rows must agree at each sample's write position
    # (int8 rows may differ by 1 LSB: the two paths quantize the same values
    # through different op orders)
    for b, pos in enumerate(np.asarray(s["lengths"])):
        for key in ("k", "v"):
            got = np.asarray(cache_x[key][:, b, :, pos]).astype(np.float32)
            want = np.asarray(cache_g[key][:, b, :, pos]).astype(np.float32)
            if quant:
                assert np.abs(got - want).max() <= 1, key
            else:
                np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_lora_zero_init_is_identity(setup):
    s = setup
    lcfg = LoraConfig(rank=4, targets=("wq", "wv", "w_down"))
    lora = init_lora(jax.random.PRNGKey(3), CFG, lcfg)
    h, _ = decoder_forward(
        CFG, s["params"], s["embeds"], s["mask"], s["positions"],
        lora=lora, lora_scaling=lcfg.scaling,
    )
    np.testing.assert_allclose(np.asarray(s["hidden"]), np.asarray(h), atol=1e-6)


def test_lora_nonzero_changes_output(setup):
    s = setup
    lcfg = LoraConfig(rank=4, targets=("wq", "wv"))
    lora = init_lora(jax.random.PRNGKey(3), CFG, lcfg)
    lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)
    h, _ = decoder_forward(
        CFG, s["params"], s["embeds"], s["mask"], s["positions"],
        lora=lora, lora_scaling=lcfg.scaling,
    )
    assert float(jnp.abs(h - s["hidden"]).max()) > 1e-3


def test_cross_entropy_masking(setup):
    logits = lm_logits(CFG, setup["params"], setup["hidden"])
    labels = jnp.full((2, 16), -100)
    labels = labels.at[:, 8:12].set(5)
    loss = cross_entropy_loss(logits, labels)
    assert float(loss) > 0
    # all-masked → zero loss, no NaN
    assert float(cross_entropy_loss(logits, jnp.full((2, 16), -100))) == 0.0


def test_padding_invariance(setup):
    """Extending right padding must not change valid-position outputs."""
    s = setup
    S2 = 24
    emb_pad = jnp.zeros((1, S2, CFG.dim)).at[:, :11].set(s["embeds"][1:2, :11])
    h_pad, _ = decoder_forward(
        CFG, s["params"], emb_pad, make_prefill_mask(jnp.array([11]), S2),
        jnp.broadcast_to(jnp.arange(S2), (1, S2)),
    )
    np.testing.assert_allclose(
        np.asarray(h_pad[0, :11]), np.asarray(s["hidden"][1, :11]), rtol=2e-4, atol=2e-5
    )


def test_kv_int8_decode_close_to_bf16_and_plumbing(setup):
    """int8-KV decode step tracks the exact-cache step (per-position scales,
    ~0.4% quantization error) and the quantized cache tree round-trips
    through prefill + decode with scale leaves updated in place."""
    s = setup
    T_max = 32
    mask = jnp.concatenate(
        [s["mask"], jnp.zeros((s["B"], 1, s["S"], T_max - s["S"]), bool)], axis=-1
    )
    next_tok = jax.random.normal(jax.random.PRNGKey(2), (s["B"], 1, CFG.dim)) * 0.02

    outs = {}
    for quant in (False, True):
        cache = init_kv_cache(CFG, s["B"], T_max, dtype=jnp.float32, quant=quant)
        _, cache = decoder_forward(CFG, s["params"], s["embeds"], mask,
                                   s["positions"], cache=cache)
        if quant:
            assert cache["k"].dtype == jnp.int8
            # prefill wrote scales for every valid position of sample 0
            assert float(cache["k_s"][0, 0, :, : s["S"]].min()) > 0.0
            assert float(cache["k_s"][0, 0, :, s["S"]:].max()) == 0.0
        h, cache2 = decoder_forward(
            CFG, s["params"], next_tok, make_decode_mask(s["lengths"] + 1, T_max),
            s["lengths"][:, None], cache=cache, cache_positions=s["lengths"],
        )
        if quant:
            # the decode step appended a scale at each sample's own length
            assert float(cache2["k_s"][0, 1, :, 11].min()) > 0.0
        outs[quant] = np.asarray(h[:, 0])
    scale = np.abs(outs[False]).max()
    assert np.abs(outs[True] - outs[False]).max() < 0.02 * scale


def test_lora_bank_per_sample_matches_single_adapter(setup):
    """decoder_forward(lora=stack_lora_bank(...), lora_ids=...) applies each
    sample's own adapter — rows must match single-adapter forwards exactly
    (multi-LoRA serving building block)."""
    from icl_speech_text_llm_tpu.models.llama import stack_lora_bank

    s = setup
    lcfg = LoraConfig(rank=4, targets=("wq", "wv", "w_down"))
    adapters = []
    for seed in (3, 4):
        a = init_lora(jax.random.PRNGKey(seed), CFG, lcfg)
        # B-init is zero (identity adapter) — perturb so adapters differ
        adapters.append(jax.tree_util.tree_map(
            lambda x, _s=seed: x + 0.03 * (_s + 1), a))
    bank = stack_lora_bank(adapters)

    ids = jnp.array([1, 0], jnp.int32)
    h_bank, _ = decoder_forward(
        CFG, s["params"], s["embeds"], s["mask"], s["positions"],
        lora=bank, lora_scaling=lcfg.scaling, lora_ids=ids,
    )
    for row, aid in enumerate([1, 0]):
        h_one, _ = decoder_forward(
            CFG, s["params"], s["embeds"][row:row + 1],
            s["mask"][row:row + 1], s["positions"][row:row + 1],
            lora=adapters[aid], lora_scaling=lcfg.scaling,
        )
        np.testing.assert_allclose(np.asarray(h_bank[row]), np.asarray(h_one[0]),
                                   atol=2e-5, rtol=2e-5)


def test_hoist_q4_roundtrip(monkeypatch):
    """_hoist_q4 pulls stacked int4 packed arrays out of the scan xs tree and
    _reinject_q4 rebuilds per-layer dicts with the scalar layer index — the
    TPU-only fast path; on CPU the hoist is a no-op (backend gate)."""
    from icl_speech_text_llm_tpu.models.llama import _hoist_q4, _reinject_q4
    from icl_speech_text_llm_tpu.ops.quant import quantize_decoder

    cfg = DECODER_CONFIGS["tiny"]
    params = quantize_decoder(init_decoder(jax.random.PRNGKey(0), cfg), bits=4)
    layers = params["layers"]

    # CPU: untouched tree, empty hoist
    xs, hoisted = _hoist_q4(layers)
    assert hoisted == {} and xs is layers

    # forced TPU: every q4 leaf hoisted; scales stay in xs
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    xs, hoisted = _hoist_q4(layers)
    assert len(hoisted) == 7  # wq wk wv wo w_gate w_up w_down
    for path, packed in hoisted.items():
        node = layers
        for k in path:
            node = node[k]
        assert packed is node["q4"]
        xnode = xs
        for k in path:
            xnode = xnode[k]
        assert set(xnode) == {"s"}

    # reinject: per-layer slice gets {"q4": stacked, "s": sliced, "layer": li}
    sliced = jax.tree_util.tree_map(lambda x: x[1], xs)
    li = jnp.array([1], jnp.int32)
    layer = _reinject_q4(sliced, hoisted, li)
    wq = layer["attn"]["wq"]
    assert wq["q4"].ndim == 3 and wq["layer"] is li
    np.testing.assert_array_equal(
        np.asarray(wq["s"]), np.asarray(layers["attn"]["wq"]["s"][1]))


def test_mixed_remat_matches_plain(setup):
    """remat="1in2" (mixed-depth: checkpoint K-1 of every K layers) must be
    a pure memory/recompute trade — forward AND gradients identical to the
    un-remattted forward. Also covers the degrade path (K not dividing
    n_layers falls back to full per-layer remat)."""
    lora_cfg = LoraConfig(rank=4)
    lora = init_lora(jax.random.PRNGKey(3), CFG, lora_cfg)
    # non-zero B so LoRA grads flow
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
    s = setup

    def loss(embeds, lora, remat):
        h, _ = decoder_forward(CFG, s["params"], embeds, s["mask"],
                               s["positions"], lora=lora,
                               lora_scaling=lora_cfg.scaling, remat=remat)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-3

    for remat in ("1in2", "1in3", True):  # 1in3 degrades (2 % 3 != 0)
        v0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(
            s["embeds"], lora, False)
        v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(
            s["embeds"], lora, remat)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), g0, g1)


def test_mixed_remat_k4_run_layer_stack():
    """remat="1in4" exercised through run_layer_stack on a 4-layer stack —
    the K>2 unrolled-group path (3 checkpointed layers + 1 plain per scan
    step) with no degradation. Forward and grads must match plain."""
    import dataclasses

    from icl_speech_text_llm_tpu.models.llama import run_layer_stack

    cfg = dataclasses.replace(CFG, n_layers=4)
    params = init_decoder(jax.random.PRNGKey(7), cfg)
    B, S = 2, 16
    embeds = jax.random.normal(jax.random.PRNGKey(8), (B, S, cfg.dim)) * 0.02
    mask = make_prefill_mask(jnp.array([S, S - 3]), S)
    positions = jnp.broadcast_to(jnp.arange(S), (B, S))

    def loss(embeds, remat):
        h = run_layer_stack(cfg, params["layers"], embeds, mask, positions,
                            remat=remat)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-3

    v0, g0 = jax.value_and_grad(loss)(embeds, False)
    v1, g1 = jax.value_and_grad(loss)(embeds, "1in4")
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-7)


def test_mixed_remat_degrade_warns(caplog):
    """A '1inK' spec that cannot apply (K does not divide the stack) must
    emit a traceable warning, not silently run full per-layer remat."""
    import logging as _logging

    s_params = init_decoder(jax.random.PRNGKey(0), CFG)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 8, CFG.dim)) * 0.02
    mask = make_prefill_mask(jnp.array([8]), 8)
    positions = jnp.broadcast_to(jnp.arange(8), (1, 8))
    with caplog.at_level(_logging.WARNING,
                         logger="icl_speech_text_llm_tpu.models.llama"):
        decoder_forward(CFG, s_params, embeds, mask, positions, remat="1in3")
    assert any("degraded to full per-layer remat" in r.message
               for r in caplog.records)
