"""Symbol-adapter trainer/orchestrator end-to-end on the tiny model."""

import jax
import numpy as np
import pytest

from icl_speech_text_llm_tpu.symbol_adapter import (
    SymbolMode,
    TrainingConfig,
    TrainingMode,
    build_training_world,
)
from icl_speech_text_llm_tpu.symbol_adapter.configs import SymbolConfig
from icl_speech_text_llm_tpu.symbol_adapter.schedulers import TrainingStep
from icl_speech_text_llm_tpu.symbol_adapter.trainer import replace_symbols_in_sample


def _config(mode, cycles=1):
    cfg = TrainingConfig(
        mode=mode,
        total_cycles=cycles,
        model_type="salmonn-tiny",
    )
    cfg.data_config.dataset_type = "voxceleb"
    cfg.data_config.val_dataset_type = "voxceleb"
    cfg.data_config.batch_size = 2
    cfg.data_config.max_samples = 4
    cfg.data_config.val_max_samples = 2
    cfg.data_config.val_batch_size = 2
    cfg.data_config.num_examples = 1
    cfg.data_config.fewshot_mode = "text"
    cfg.data_config.synthetic = True
    cfg.lora_config.epochs = 1
    cfg.mlp_config.epochs = 1
    cfg.lora_config.final_epochs = 1
    return cfg


def test_mlp_phase_trains_mlp_only():
    """An MLP phase must update the MLP adapter and leave LoRA untouched."""
    cfg = _config(TrainingMode.LORA_MLP_JOINT)
    world = build_training_world(cfg, seed=0)
    trainer = world.trainer
    lora_before = np.asarray(
        jax.tree_util.tree_leaves(trainer.model.params["lora"])[0]
    ).copy()
    mlp_before = np.asarray(
        jax.tree_util.tree_leaves(trainer.mlp_params)[0]
    ).copy()

    mlp_step = TrainingStep(phase="mlp", epochs=1, cycle=0, step_id=0,
                            description="test mlp", learning_rate=1e-3,
                            gradient_accumulation_steps=1, max_grad_norm=1.0)
    # disable per-epoch validation for speed
    trainer.validator = None
    summary = trainer.train_step(mlp_step, world.train_dataset)
    assert np.isfinite(summary["final_loss"])

    lora_after = np.asarray(jax.tree_util.tree_leaves(trainer.model.params["lora"])[0])
    mlp_after = np.asarray(jax.tree_util.tree_leaves(trainer.mlp_params)[0])
    np.testing.assert_array_equal(lora_before, lora_after)  # frozen
    assert np.abs(mlp_after - mlp_before).max() > 0  # trained


def test_joint_phase_trains_both():
    cfg = _config(TrainingMode.JOINT_TRAINING)
    world = build_training_world(cfg, seed=1)
    trainer = world.trainer
    trainer.validator = None
    lora_before = np.asarray(jax.tree_util.tree_leaves(trainer.model.params["lora"])[1]).copy()
    mlp_before = np.asarray(jax.tree_util.tree_leaves(trainer.mlp_params)[0]).copy()
    joint = TrainingStep(phase="joint", epochs=1, cycle=0, step_id=0,
                         description="test joint", learning_rate=1e-3,
                         gradient_accumulation_steps=1, max_grad_norm=1.0)
    summary = trainer.train_step(joint, world.train_dataset)
    assert np.isfinite(summary["final_loss"])
    lora_after = np.asarray(jax.tree_util.tree_leaves(trainer.model.params["lora"])[1])
    mlp_after = np.asarray(jax.tree_util.tree_leaves(trainer.mlp_params)[0])
    assert np.abs(mlp_after - mlp_before).max() > 0  # MLP trained
    assert np.abs(lora_after - lora_before).max() > 0  # LoRA trained too


def test_symbol_replacement_in_sample_and_checkpoint(tmp_path):
    cfg = _config(TrainingMode.BYPASS_MLP_SYM)
    world = build_training_world(cfg, seed=2)
    trainer = world.trainer
    sample = world.train_dataset[0]
    mappings = trainer.symbol_manager.get_symbols_for_epoch(0)
    replaced = replace_symbols_in_sample(sample, mappings)
    for original, symbol in mappings.items():
        assert original not in replaced.completion or original == replaced.completion
    # at least the completion's label got replaced if it was an original label
    if sample.completion in mappings:
        assert replaced.completion == mappings[sample.completion]

    step = TrainingStep(phase="lora", epochs=1, cycle=0, step_id=0,
                        description="ckpt test", learning_rate=1e-3,
                        gradient_accumulation_steps=1, max_grad_norm=1.0,
                        bypass_mlp=True)
    trainer.validator = None
    trainer.train_step(step, world.train_dataset)
    path = trainer.save_checkpoint_with_config(str(tmp_path), step, 1.0)
    from icl_speech_text_llm_tpu.training.checkpoint import load_checkpoint

    state = load_checkpoint(path)
    meta = state["meta"]["metadata"]
    assert meta["symbol_mappings"] == trainer.symbol_manager.get_current_symbols()
    assert meta["training_config"]["mode"] == "bypass_mlp_sym"
    assert set(state["trainable"]) == {"lora", "mlp_adapter"}
