

def test_async_checkpoint_roundtrip(tmp_path):
    """save_checkpoint(block=False) + wait_for_checkpoints() lands the same
    state as a blocking save (the training loop's epoch-boundary path)."""
    import numpy as np

    from icl_speech_text_llm_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    tree = {"lora": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)}}
    d = str(tmp_path / "async_ck")
    save_checkpoint(d, tree, step=7, block=False)
    wait_for_checkpoints()
    state = load_checkpoint(d)
    np.testing.assert_array_equal(state["trainable"]["lora"]["w"],
                                  tree["lora"]["w"])
    assert state["step"] == 7
