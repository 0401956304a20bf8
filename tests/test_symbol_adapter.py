"""Symbol-adapter subsystem tests: manager parity, schedules, MLP math,
end-to-end tiny orchestrated training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.symbol_adapter import (
    SymbolManager,
    SymbolMode,
    TrainingConfig,
    TrainingMode,
    TrainingScheduler,
    create_composite_metric,
    init_mlp_adapter,
    label_token_mask,
    parse_composite_metric,
    quantize_to_vocab,
    transform_label_embeddings,
)
from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer


@pytest.fixture(scope="module")
def tok():
    return get_tokenizer()


# ---------------------------------------------------------------- manager
def test_symbol_manager_fixed(tok):
    sm = SymbolManager(["positive", "negative", "neutral"], tok, seed=0)
    m = sm.get_current_symbols()
    assert len(m) == 3
    for sym in m.values():
        ids = tok.encode(sym, add_special_tokens=False)
        assert len(ids) == 2
        assert tok.decode(ids) == sym
    # fixed: same mappings at any epoch
    assert sm.get_symbols_for_epoch(5) == m


def test_symbol_manager_dynamic(tok):
    sm = SymbolManager(["positive", "negative"], tok, dynamic_per_epoch=True, seed=0)
    m0 = dict(sm.get_symbols_for_epoch(0))
    m1 = dict(sm.get_symbols_for_epoch(1))
    assert m0 != m1
    # revisiting an epoch returns the cached mapping
    assert sm.get_symbols_for_epoch(0) == m0
    # force_new regenerates
    m0b = sm.get_symbols_for_epoch(0, force_new_symbols=True)
    assert m0b != m0


def test_replace_and_convert_back(tok):
    sm = SymbolManager(["positive", "negative"], tok, seed=1)
    m = sm.get_current_symbols()
    batch = {"prompt": ["choose positive or negative"], "completion": ["positive"]}
    out = sm.replace_symbols_in_batch(batch)
    assert m["positive"] in out["prompt"][0]
    assert "positive" not in out["completion"][0]
    restored = sm.convert_symbols_back(out["completion"][0])
    assert restored == "positive"
    # case-insensitive conversion
    upper = out["completion"][0].upper()
    assert sm.convert_symbols_back(upper) == "positive"


def test_random_mask_replaces_subset(tok):
    labels = [f"labelword{i}" for i in range(16)]
    sm = SymbolManager(labels, tok, seed=2)
    batch = {"prompt": [" ".join(labels)]}
    out = sm.replace_symbols_in_batch(batch, random_mask=True)
    remaining = sum(1 for l in labels if l in out["prompt"][0])
    assert remaining == len(labels) - max(1, len(labels) // 8)


def test_save_load_mappings(tok, tmp_path):
    sm = SymbolManager(["a_label", "b_label"], tok, seed=3)
    path = str(tmp_path / "sym.json")
    sm.save_mappings(path)
    sm2 = SymbolManager(["x"], tok, seed=9)
    sm2.load_mappings(path)
    assert sm2.fixed_mappings == sm.fixed_mappings


# ---------------------------------------------------------------- schedules
def test_schedule_lora_first():
    cfg = TrainingConfig(mode=TrainingMode.LORA_FIRST, total_cycles=2)
    steps = TrainingScheduler(cfg).generate_schedule()
    assert [s.phase for s in steps] == ["lora", "mlp", "lora", "mlp", "lora", "lora"]
    assert steps[0].freeze_mlp and not steps[0].freeze_lora
    assert not steps[1].freeze_mlp and steps[1].freeze_lora
    assert cfg.get_schedule_info()["total_steps"] == 6


def test_schedule_mlp_first():
    cfg = TrainingConfig(mode=TrainingMode.MLP_FIRST, total_cycles=1)
    steps = TrainingScheduler(cfg).generate_schedule()
    assert [s.phase for s in steps] == ["mlp", "lora", "mlp", "lora"]


def test_schedule_bypass_modes():
    sym = TrainingConfig(mode=TrainingMode.BYPASS_MLP_SYM, total_cycles=3)
    steps = TrainingScheduler(sym).generate_schedule()
    assert all(s.bypass_mlp and s.use_symbols and s.dynamic_symbols for s in steps)
    assert len(steps) == 3
    # derived value: FIXED upgraded to DYNAMIC_PER_EPOCH for bypass_mlp_sym
    assert sym.symbol_config.mode == SymbolMode.DYNAMIC_PER_EPOCH

    from icl_speech_text_llm_tpu.symbol_adapter.configs import SymbolConfig

    org = TrainingConfig(mode=TrainingMode.BYPASS_MLP_ORG, total_cycles=2,
                         symbol_config=SymbolConfig(mode=SymbolMode.NO_SYMBOLS))
    steps = TrainingScheduler(org).generate_schedule()
    assert all(s.bypass_mlp and not s.use_symbols for s in steps)


def test_schedule_lora_mlp_joint_and_roundtrip(tmp_path):
    cfg = TrainingConfig(mode=TrainingMode.LORA_MLP_JOINT)
    sched = TrainingScheduler(cfg)
    steps = sched.generate_schedule()
    assert [s.phase for s in steps] == ["lora", "mlp", "joint"]
    assert steps[0].bypass_mlp and not steps[1].bypass_mlp
    assert not steps[2].freeze_mlp and not steps[2].freeze_lora
    path = str(tmp_path / "schedule.json")
    sched.save_schedule(path)
    loaded = TrainingScheduler.load_schedule(path)
    assert [s.to_dict() for s in loaded] == [s.to_dict() for s in steps]


def test_bypass_sym_requires_symbols():
    from icl_speech_text_llm_tpu.symbol_adapter.configs import SymbolConfig

    with pytest.raises(ValueError):
        TrainingConfig(mode=TrainingMode.BYPASS_MLP_SYM,
                       symbol_config=SymbolConfig(mode=SymbolMode.NO_SYMBOLS))


# ---------------------------------------------------------------- MLP math
def test_quantize_hard_snaps_to_vocab():
    vocab = jax.random.normal(jax.random.PRNGKey(0), (50, 16))
    x = vocab[7] + 0.01 * jax.random.normal(jax.random.PRNGKey(1), (16,))
    q, ids, sims = quantize_to_vocab(x[None], vocab, hard=True)
    assert int(ids[0]) == 7
    np.testing.assert_array_equal(np.asarray(q[0]), np.asarray(vocab[7]))
    assert float(sims[0]) > 0.99


def test_quantize_soft_low_temp_approaches_hard():
    vocab = jax.random.normal(jax.random.PRNGKey(0), (50, 16))
    x = vocab[3][None] * 1.1
    soft, _, _ = quantize_to_vocab(x, vocab, temperature=0.01, hard=False)
    np.testing.assert_allclose(np.asarray(soft[0]), np.asarray(vocab[3]), atol=1e-2)


def test_transform_label_embeddings_masking():
    key = jax.random.PRNGKey(0)
    mlp = init_mlp_adapter(key, 16, 8)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    vocab = jax.random.normal(jax.random.PRNGKey(2), (40, 16))
    mask = jnp.zeros((2, 6), bool).at[0, 2].set(True).at[1, 4].set(True)
    out, ids, sims = transform_label_embeddings(mlp, embeds, mask, vocab)
    # unmasked positions pass through untouched
    np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(embeds[0, 0]))
    assert not np.array_equal(np.asarray(out[0, 2]), np.asarray(embeds[0, 2]))
    assert int(ids[0, 0]) == -1 and int(ids[0, 2]) >= 0
    # bypass returns identity
    out2, ids2, _ = transform_label_embeddings(mlp, embeds, mask, vocab, bypass=True)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(embeds))
    assert (np.asarray(ids2) == -1).all()


def test_label_token_mask(tok):
    sm = SymbolManager(["positive"], tok, seed=0)
    sym = sm.get_current_symbols()["positive"]
    # in-context symbols tokenize with space-merged pieces — collect both forms
    sym_ids = tok.encode(sym, add_special_tokens=False) + tok.encode(
        " " + sym, add_special_tokens=False
    )
    tokens = np.array([tok.encode(f"answer is {sym} now", add_special_tokens=False)])
    mask = label_token_mask(tokens, sym_ids)
    assert mask.sum() >= 2  # symbol tokens marked


# ---------------------------------------------------------------- composite
def test_composite_metric_roundtrip():
    s = create_composite_metric({"voxceleb": 0.5, "hvb": 0.25})
    assert s == "voxceleb:0.5000|hvb:0.2500"
    assert parse_composite_metric(s) == {"voxceleb": 0.5, "hvb": 0.25}
