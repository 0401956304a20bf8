"""Training layer: schedulers, train step decreases loss, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
from icl_speech_text_llm_tpu.data.packing import PackConfig
from icl_speech_text_llm_tpu.data.prompts import build_default_prompt
from icl_speech_text_llm_tpu.models.salmonn import init_salmonn, salmonn_tiny
from icl_speech_text_llm_tpu.training.checkpoint import (
    apply_trainable,
    load_checkpoint,
    save_checkpoint,
)
from icl_speech_text_llm_tpu.training.schedulers import get_schedule
from icl_speech_text_llm_tpu.training.step import (
    OptimizerSettings,
    init_train_state,
    make_optimizer,
    make_train_step,
    merge_params,
    split_params,
)
from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer


def test_schedules():
    lin = get_schedule("linear", 1e-3, 10, 100)
    assert float(lin(0)) == 0.0
    assert float(lin(10)) == pytest.approx(1e-3)
    assert float(lin(100)) == pytest.approx(0.0)
    cos = get_schedule("cosine", 1e-3, 10, 100)
    assert float(cos(10)) == pytest.approx(1e-3)
    assert float(cos(100)) == pytest.approx(0.0, abs=1e-9)
    const = get_schedule("constant", 5e-4, 0, 0)
    assert float(const(50)) == 5e-4
    rst = get_schedule("per_epoch_warmup_restart", 1e-3, 0, 0, steps_per_epoch=20)
    # restarts: lr at start of each epoch is low again
    assert float(rst(0)) < float(rst(2))
    assert float(rst(20)) < float(rst(22))


def test_schedules_match_hf():
    """The reference forwards --scheduler into HF get_scheduler
    (ref: train/train.py:377-385); every HF name must match HF's lr curve."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    base_lr, warmup, total = 1e-3, 10, 100
    names = [
        "linear",
        "cosine",
        "cosine_with_restarts",
        "polynomial",
        "constant",
        "constant_with_warmup",
        "inverse_sqrt",
    ]
    for name in names:
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
        kwargs = {}
        if name != "constant":
            kwargs["num_warmup_steps"] = warmup
        if name in ("linear", "cosine", "cosine_with_restarts", "polynomial"):
            kwargs["num_training_steps"] = total
        hf = transformers.get_scheduler(name, opt, **kwargs)
        ours = get_schedule(name, base_lr, warmup, total)
        for step in range(120):
            want = hf.get_last_lr()[0]
            got = float(ours(step))
            assert got == pytest.approx(want, rel=1e-5, abs=1e-10), (name, step, got, want)
            opt.step()
            hf.step()


def _tiny_batch(cfg, tok, batch_size=2):
    pack_cfg = PackConfig(seq_len=512, text_len=320, max_slots=1,
                          audio_tokens_per_slot=cfg.audio_tokens_per_slot)
    plan = build_default_prompt("Say positive.", "utt", [], input_mode="speech_only",
                                fewshot_mode="text")
    rng = np.random.RandomState(0)
    samples = [
        ICLSample(plan=plan, completion="positive",
                  slot_audio={("main", 0): rng.randn(16000).astype(np.float32) * 0.05})
        for _ in range(batch_size)
    ]
    batch = collate_icl_batch(samples, tok, pack_cfg)
    return {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_mask": jnp.asarray(batch.seq_mask),
        "shifted_labels": jnp.asarray(batch.labels_shifted),
        "wavs": jnp.asarray(batch.audio["wavs"]),
    }


def test_train_step_reduces_loss():
    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    batch = _tiny_batch(cfg, tok)

    opt = OptimizerSettings(learning_rate=5e-3, max_grad_norm=1.0)
    optimizer = make_optimizer(opt)
    state, frozen = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)

    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, frozen, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
    assert int(state.step) == 5


def test_split_merge_roundtrip():
    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    trainable, frozen = split_params(params)
    assert set(trainable) == {"lora", "qformer"}
    merged = merge_params(frozen, trainable)
    assert set(merged) == set(params)


def test_checkpoint_roundtrip(tmp_path):
    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    trainable, _ = split_params(params)
    path = save_checkpoint(str(tmp_path / "ckpt"), trainable, step=7, epoch=2,
                           loss=1.5, metadata={"note": "test"})
    state = load_checkpoint(path)
    assert state["step"] == 7
    assert state["meta"]["epoch"] == 2
    assert state["meta"]["metadata"]["note"] == "test"
    restored = apply_trainable(params, state["trainable"])
    a = jax.tree_util.tree_leaves(restored["lora"])[0]
    b = jax.tree_util.tree_leaves(trainable["lora"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # unknown keys skipped silently (strict=False parity)
    out = apply_trainable(params, {"bogus": {}})
    assert "bogus" not in out


def test_nonfinite_loss_is_noop_update():
    """A NaN loss must zero the update (reference zeroes the loss on NaN)."""
    from icl_speech_text_llm_tpu.models.salmonn import salmonn_tiny, init_salmonn
    from icl_speech_text_llm_tpu.training.step import (
        OptimizerSettings, init_train_state, make_optimizer, make_train_step,
    )

    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)

    def nan_loss(cfg, params, batch, remat=False):
        leaf = jax.tree_util.tree_leaves(params["lora"])[0]
        return jnp.sum(leaf) * jnp.nan

    optimizer = make_optimizer(OptimizerSettings(learning_rate=1e-2))
    state, frozen = init_train_state(params, optimizer)
    before = jax.tree_util.tree_map(np.asarray, state.trainable)
    step_fn = make_train_step(cfg, optimizer, loss_fn=nan_loss)
    state, metrics = step_fn(state, frozen, {})
    assert float(metrics["skipped_nonfinite"]) == 1.0
    after = jax.tree_util.tree_map(np.asarray, state.trainable)
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
