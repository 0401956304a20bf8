"""load_lora_bank: per-task adapter checkpoints → one multi-LoRA serving bank."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl_speech_text_llm_tpu.models.llama import (
    DECODER_CONFIGS,
    LoraConfig,
    init_decoder,
    init_lora,
)
from icl_speech_text_llm_tpu.training.checkpoint import (
    load_lora_bank,
    save_checkpoint,
)


def _adapter(cfg, lcfg, seed):
    a = init_lora(jax.random.PRNGKey(seed), cfg, lcfg)
    return jax.tree_util.tree_map(lambda x, _s=seed: x + 0.02 * (_s + 1), a)


def test_load_lora_bank_roundtrip(tmp_path):
    cfg = DECODER_CONFIGS["tiny"]
    lcfg = LoraConfig(rank=4, targets=("wq", "wv"))
    adapters = [_adapter(cfg, lcfg, s) for s in (1, 2, 3)]
    dirs = []
    for i, a in enumerate(adapters):
        d = str(tmp_path / f"task{i}")
        save_checkpoint(d, {"lora": a}, step=i)
        dirs.append(d)

    bank = load_lora_bank(dirs)
    for path_leaf, orig in zip(
        jax.tree_util.tree_leaves(bank),
        jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=1), *adapters)
        ),
    ):
        np.testing.assert_array_equal(np.asarray(path_leaf), np.asarray(orig))


def test_load_lora_bank_serves(tmp_path):
    """A bank loaded from disk decodes token-exactly like the in-memory bank."""
    from icl_speech_text_llm_tpu.inference.serving import (
        ContinuousBatchingEngine,
        ServingConfig,
    )

    cfg = DECODER_CONFIGS["tiny"]
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(rank=4, targets=("wq", "wv"))
    adapters = [_adapter(cfg, lcfg, s) for s in (5, 6)]
    dirs = []
    for i, a in enumerate(adapters):
        d = str(tmp_path / f"task{i}")
        save_checkpoint(d, {"lora": a})
        dirs.append(d)
    bank = load_lora_bank(dirs)

    scfg = ServingConfig(num_slots=2, max_new_tokens=5, prompt_buckets=(32,),
                         eos_token_id=2, admit_batch=2)
    rng = np.random.RandomState(3)
    reqs = [(rng.randn(10, cfg.dim).astype(np.float32) * 0.3, 10)
            for _ in range(3)]

    def run(lora):
        eng = ContinuousBatchingEngine(cfg, params, scfg, lora=lora,
                                       lora_scaling=lcfg.scaling)
        rids = [eng.submit(emb, length, adapter_id=i % 2)
                for i, (emb, length) in enumerate(reqs)]
        res = eng.run()
        return [res[r] for r in rids]

    from icl_speech_text_llm_tpu.models.llama import stack_lora_bank

    assert run(bank) == run(stack_lora_bank(adapters))


def test_load_lora_bank_errors(tmp_path):
    with pytest.raises(ValueError):
        load_lora_bank([])
    d = str(tmp_path / "nolora")
    save_checkpoint(d, {"qformer": {"w": np.zeros((2, 2))}})
    with pytest.raises(KeyError):
        load_lora_bank([d])
