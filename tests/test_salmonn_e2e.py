"""End-to-end tiny SALMONN: pack → train loss → batched generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
from icl_speech_text_llm_tpu.data.packing import PackConfig
from icl_speech_text_llm_tpu.data.prompts import build_default_prompt
from icl_speech_text_llm_tpu.inference.engine import GenerationConfig, SalmonnEngine, salmonn_generate
from icl_speech_text_llm_tpu.models.salmonn import (
    init_salmonn,
    salmonn_tiny,
    salmonn_train_loss,
)
from icl_speech_text_llm_tpu.registry import DatasetType, get_dataset_config
from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

K = 2  # few-shot exemplars


@pytest.fixture(scope="module")
def world():
    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    pack_cfg = PackConfig(
        seq_len=768, text_len=384, max_slots=K + 1,
        audio_tokens_per_slot=cfg.audio_tokens_per_slot, completion_len=16,
    )
    return cfg, params, tok, pack_cfg


def _make_samples(n):
    rng = np.random.RandomState(0)
    task = get_dataset_config(DatasetType.VOXCELEB)
    samples = []
    for i in range(n):
        examples = [
            {"text": f"example text {j}", "label": ["positive", "negative", "neutral"][j % 3]}
            for j in range(K)
        ]
        plan = build_default_prompt(
            task.prompt_template, f"utterance {i}", examples,
            input_mode="speech_only", fewshot_mode="speech",
        )
        slot_audio = {
            slot: rng.randn(16000 * (1 + (i + j) % 2)).astype(np.float32) * 0.05
            for j, slot in enumerate(plan.slots)
        }
        samples.append(ICLSample(plan=plan, completion=["positive", "negative"][i % 2],
                                 slot_audio=slot_audio))
    return samples


def test_collate_shapes(world):
    cfg, params, tok, pack_cfg = world
    batch = collate_icl_batch(_make_samples(2), tok, pack_cfg)
    assert batch.text_tokens.shape == (2, 384)
    assert batch.gather_idx.shape == (2, 768)
    # wav transport is bucketed to the longest clip (2 s here → 5 s bucket)
    assert batch.audio["wavs"].shape == (2, K + 1, 5 * 16000)
    assert batch.labels_shifted.shape == (2, 768)
    # prompt region has no labels; completion labelled
    assert (batch.labels[0, : batch.seq_lengths[0]] == -100).all()
    assert (batch.labels[0] != -100).sum() > 0
    # gather indices stay within the table
    table_len = 1 + 384 + (K + 1) * pack_cfg.audio_tokens_per_slot
    assert batch.gather_idx.max() < table_len


def test_train_loss_and_generate(world):
    cfg, params, tok, pack_cfg = world
    batch = collate_icl_batch(_make_samples(2), tok, pack_cfg)
    dev_batch = {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_mask": jnp.asarray(batch.seq_mask),
        "shifted_labels": jnp.asarray(batch.labels_shifted),
        "wavs": jnp.asarray(batch.audio["wavs"]),
    }
    loss = salmonn_train_loss(cfg, params, dev_batch)
    assert bool(jnp.isfinite(loss)), float(loss)
    # random init ⇒ loss near ln(V)
    assert 0.5 * np.log(cfg.llm.vocab_size) < float(loss) < 2.0 * np.log(cfg.llm.vocab_size)

    engine = SalmonnEngine(cfg, params, tok)
    preds = engine.generate(batch, batch.audio)
    assert len(preds) == 2
    assert all(isinstance(p, str) for p in preds)


def test_generation_batch_order_independence(world):
    """Swapping samples in the batch must swap outputs (no cross-sample leak)."""
    cfg, params, tok, pack_cfg = world
    samples = _make_samples(2)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)

    def run(order):
        batch = collate_icl_batch([samples[i] for i in order], tok, pack_cfg)
        dev = {
            "text_tokens": jnp.asarray(batch.text_tokens),
            "gather_idx": jnp.asarray(batch.gather_idx),
            "seq_lengths": jnp.asarray(batch.seq_lengths),
            "wavs": jnp.asarray(batch.audio["wavs"]),
        }
        return np.asarray(salmonn_generate(cfg, gen, params, dev))

    fwd = run([0, 1])
    rev = run([1, 0])
    np.testing.assert_array_equal(fwd[0], rev[1])
    np.testing.assert_array_equal(fwd[1], rev[0])


def test_sampled_generation_valid_and_varies(world):
    """do_sample + top-p path: tokens in range; different seeds may differ."""
    import jax

    from icl_speech_text_llm_tpu.inference.engine import salmonn_generate

    cfg, params, tok, pack_cfg = world
    samples = _make_samples(2)
    batch = collate_icl_batch(samples, tok, pack_cfg)
    dev = {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_lengths": jnp.asarray(batch.seq_lengths),
        "wavs": jnp.asarray(batch.audio["wavs"]),
    }
    gen = GenerationConfig(max_new_tokens=4, do_sample=True, temperature=1.0,
                           top_p=0.9, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    t1 = np.asarray(salmonn_generate(cfg, gen, params, dev, rng=jax.random.PRNGKey(1)))
    t2 = np.asarray(salmonn_generate(cfg, gen, params, dev, rng=jax.random.PRNGKey(2)))
    assert t1.shape == (2, 4)
    assert (t1 >= 0).all() and (t1 < cfg.llm.vocab_size).all()
    # same seed reproduces exactly
    t1b = np.asarray(salmonn_generate(cfg, gen, params, dev, rng=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(t1, t1b)
