"""Pipeline-parallel decoder (GPipe over the pp mesh axis) vs the plain scan.

Forward and gradients must match ``decoder_forward`` exactly (same layers,
same math — only the schedule differs), on a dp2×pp4 virtual mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.models.llama import (
    DECODER_CONFIGS,
    decoder_forward,
    init_decoder,
    init_lora,
    LoraConfig,
)
from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask
from icl_speech_text_llm_tpu.parallel.mesh import make_mesh
from icl_speech_text_llm_tpu.parallel.pipeline import pipeline_decoder_forward

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)

B, T, N_MICRO = 4, 16, 2


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_layers=4)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.dim)) * 0.1
    lengths = jnp.array([T, T - 3, T - 5, T])
    mask = make_prefill_mask(lengths, T)
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    return cfg, params, x, mask, positions


def test_forward_matches_plain_scan(setup):
    cfg, params, x, mask, positions = setup
    mesh = make_mesh(dp=2, pp=4)
    ref, _ = decoder_forward(cfg, params, x, mask, positions)
    out = pipeline_decoder_forward(mesh, cfg, params, x, mask, positions, N_MICRO)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_with_lora_matches(setup):
    cfg, params, x, mask, positions = setup
    lora_cfg = LoraConfig(rank=4, alpha=8.0)
    lora = init_lora(jax.random.PRNGKey(2), cfg, lora_cfg)
    mesh = make_mesh(dp=2, pp=4)
    ref, _ = decoder_forward(
        cfg, params, x, mask, positions, lora=lora, lora_scaling=lora_cfg.scaling
    )
    out = pipeline_decoder_forward(
        mesh, cfg, params, x, mask, positions, N_MICRO,
        lora=lora, lora_scaling=lora_cfg.scaling,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_plain_scan(setup):
    """The reverse pipeline (autodiff through shard_map/ppermute) must produce
    the same parameter gradients as autodiff of the plain scan."""
    cfg, params, x, mask, positions = setup
    mesh = make_mesh(dp=2, pp=4)
    w = jnp.cos(jnp.arange(B * T * cfg.dim, dtype=jnp.float32)).reshape(B, T, cfg.dim)

    def loss_plain(p):
        h, _ = decoder_forward(cfg, p, x, mask, positions)
        return jnp.sum(h * w)

    def loss_pipe(p):
        h = pipeline_decoder_forward(mesh, cfg, p, x, mask, positions, N_MICRO)
        return jnp.sum(h * w)

    g_plain = jax.grad(loss_plain)(params)
    g_pipe = jax.grad(loss_pipe)(params)
    flat_a, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    flat_b, _ = jax.tree_util.tree_flatten(g_pipe)
    for (path, a), b in zip(flat_a, flat_b):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        assert d / scale < 1e-4, (jax.tree_util.keystr(path), d, scale)


def test_pp_layer_divisibility_guard(setup):
    cfg, params, x, mask, positions = setup
    mesh = make_mesh(dp=1, pp=8)  # 4 layers, pp=8 → error
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_decoder_forward(mesh, cfg, params, x, mask, positions, N_MICRO)


def test_train_step_with_pipeline_matches_plain():
    """The FULL SALMONN train step with the decoder GPipe'd over pp=2 must
    produce the same loss and the same updated trainable params as the plain
    single-program step."""
    from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
    from icl_speech_text_llm_tpu.data.packing import PackConfig
    from icl_speech_text_llm_tpu.data.prompts import build_default_prompt
    from icl_speech_text_llm_tpu.models.salmonn import init_salmonn, salmonn_tiny
    from icl_speech_text_llm_tpu.training.step import (
        OptimizerSettings,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

    cfg = salmonn_tiny()
    assert cfg.llm.n_layers % 2 == 0
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    pack_cfg = PackConfig(seq_len=256, text_len=160, max_slots=1,
                          audio_tokens_per_slot=cfg.audio_tokens_per_slot)
    rng = np.random.RandomState(0)
    samples = []
    for i in range(4):
        plan = build_default_prompt("Say positive.", f"utt {i}", [],
                                    input_mode="speech_only", fewshot_mode="text")
        samples.append(ICLSample(
            plan=plan, completion=["positive", "negative"][i % 2],
            slot_audio={("main", 0): rng.randn(16000).astype(np.float32) * 0.05},
        ))
    b = collate_icl_batch(samples, tok, pack_cfg)
    batch = {
        "text_tokens": jnp.asarray(b.text_tokens),
        "gather_idx": jnp.asarray(b.gather_idx),
        "seq_mask": jnp.asarray(b.seq_mask),
        "shifted_labels": jnp.asarray(b.labels_shifted),
        "wavs": jnp.asarray(b.audio["wavs"]),
    }

    mesh = make_mesh(dp=2, pp=2, fsdp=2)
    optimizer = make_optimizer(OptimizerSettings(learning_rate=1e-3))

    def one_step(pipeline):
        state, frozen = init_train_state(params, optimizer)
        step_fn = make_train_step(cfg, optimizer, pipeline=pipeline)
        state, metrics = step_fn(state, frozen, batch)
        return float(metrics["loss"]), state.trainable

    loss_plain, tr_plain = one_step(None)
    loss_pp, tr_pp = one_step((mesh, 2))
    assert abs(loss_plain - loss_pp) / abs(loss_plain) < 1e-5, (loss_plain, loss_pp)
    for a, b_ in zip(jax.tree_util.tree_leaves(tr_plain),
                     jax.tree_util.tree_leaves(tr_pp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-6)


def test_single_stage_degenerates_to_plain(setup):
    """pp=1 is just the scan with microbatching — a schedule sanity anchor."""
    cfg, params, x, mask, positions = setup
    mesh = make_mesh(dp=4, fsdp=2, pp=1)
    ref, _ = decoder_forward(cfg, params, x, mask, positions)
    out = pipeline_decoder_forward(mesh, cfg, params, x, mask, positions, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
