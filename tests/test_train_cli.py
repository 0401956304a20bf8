"""train CLI wiring end-to-end on synthetic data (covers loop.validate,
which a removed import silently broke once — keep this surface tested)."""

import os

from icl_speech_text_llm_tpu.cli.train import main


def test_train_cli_synthetic(tmp_path):
    state = main([
        "--dataset_type", "voxceleb", "--model_type", "salmonn-tiny",
        "--synthetic", "--num_epochs", "1", "--batch_size", "2",
        "--max_samples", "4", "--output_dir", str(tmp_path),
    ])
    assert state is not None
    # a checkpoint landed
    assert any(p.name.startswith("epoch_") for p in tmp_path.iterdir()), list(
        tmp_path.iterdir()
    )


def test_train_cli_resume(tmp_path):
    main([
        "--dataset_type", "voxceleb", "--model_type", "salmonn-tiny",
        "--synthetic", "--num_epochs", "1", "--batch_size", "2",
        "--max_samples", "4", "--output_dir", str(tmp_path / "first"),
    ])
    ckpts = sorted((tmp_path / "first").iterdir())
    assert ckpts
    state = main([
        "--dataset_type", "voxceleb", "--model_type", "salmonn-tiny",
        "--synthetic", "--num_epochs", "2", "--batch_size", "2",
        "--max_samples", "4", "--output_dir", str(tmp_path / "second"),
        "--resume_from_checkpoint", str(ckpts[-1]),
    ])
    assert state is not None


def test_train_cli_mesh_pipeline(tmp_path):
    """--mesh dp,fsdp,tp,pp end-to-end: sharded params + GPipe'd decoder.

    Needs the 8-device virtual mesh (conftest forces it for the CPU suite)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    state = main([
        "--dataset_type", "voxceleb", "--model_type", "salmonn-tiny",
        "--synthetic", "--num_epochs", "1", "--batch_size", "4",
        "--max_samples", "4", "--output_dir", str(tmp_path),
        "--mesh", "2,2,1,2", "--pp_microbatches", "2",
        "--seq_len", "512", "--text_len", "320",
    ])
    assert state is not None and int(state.step) >= 1
