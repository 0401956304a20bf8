"""--auto_batch wiring: compiler-memory batch-size search in the CLIs.

The reference's --optimize_batch_size is a stub that logs and does nothing
(ref: inference/inference.py:252-256). Here the flag is real: the TPU build
asks the compiler (jit().lower().compile().memory_analysis()) how much HBM
each candidate batch size needs — no OOM probing, no execution.
"""

import numpy as np

from icl_speech_text_llm_tpu.utils.memory import (
    BatchSizeOptimizer,
    compiled_memory_bytes,
    tile_batch,
)


def test_tile_batch_tiles_leading_axis():
    batch = {
        "a": np.zeros((1, 7), np.int32),
        "b": np.zeros((1, 3, 5), np.float32),
        "s": 4,  # non-array leaves pass through
    }
    out = tile_batch(batch, 6)
    assert out["a"].shape == (6, 7)
    assert out["b"].shape == (6, 3, 5)
    assert out["s"] == 4


def test_optimizer_monotone_search():
    """Picked size is the largest whose compiled program fits the budget."""

    def f(x, w):
        return (x @ w).sum()

    w = np.ones((256, 256), np.float32)
    make = lambda bs: (np.ones((bs, 256), np.float32), w)
    need_8 = compiled_memory_bytes(f, *make(8))
    if need_8 is None:
        import pytest

        pytest.skip("backend exposes no memory analysis")
    need_64 = compiled_memory_bytes(f, *make(64))
    assert need_64 > need_8
    # budget exactly fits 64: the search must land in [64, 2*64)
    sizer = BatchSizeOptimizer(f, make, memory_budget_bytes=need_64,
                               max_batch=4096)
    picked = sizer.find_optimal_batch_size(1)
    assert 64 <= picked < 128
    # and the pick itself fits
    assert compiled_memory_bytes(f, *make(picked)) <= need_64


def test_train_cli_auto_batch(tmp_path):
    """--auto_batch end-to-end: probes the real train step and proceeds."""
    from icl_speech_text_llm_tpu.cli.train import main

    state = main([
        "--dataset_type", "voxceleb", "--model_type", "salmonn-tiny",
        "--synthetic", "--num_epochs", "1", "--batch_size", "2",
        "--max_samples", "4", "--output_dir", str(tmp_path),
        "--auto_batch", "--auto_batch_max", "4",
    ])
    assert state is not None


def test_inference_cli_auto_batch(tmp_path):
    """--auto_batch (alias --optimize_batch_size) on the generate path."""
    from icl_speech_text_llm_tpu.cli.inference import main

    paths = main([
        "--dataset_type", "voxceleb", "--model_type", "salmonn-tiny",
        "--synthetic", "--synthetic_size", "4", "--max_samples", "4",
        "--batch_size", "2", "--results_dir", str(tmp_path),
        "--optimize_batch_size", "--auto_batch_max", "4",
    ])
    assert paths["metrics"]
