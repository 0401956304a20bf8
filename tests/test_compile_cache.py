"""Persistent XLA compilation cache wiring (utils/perf.enable_compilation_cache)."""

import os


def test_compilation_cache_populates(tmp_path):
    import jax
    import jax.numpy as jnp

    from icl_speech_text_llm_tpu.utils.perf import enable_compilation_cache

    d = str(tmp_path / "xla_cache")
    assert enable_compilation_cache(d) == d
    try:
        jax.jit(lambda x: (x * 2.0).sum())(jnp.ones((64, 64))).block_until_ready()
        assert os.path.isdir(d) and len(os.listdir(d)) >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_compilation_cache_disabled_without_path(monkeypatch):
    from icl_speech_text_llm_tpu.utils.perf import enable_compilation_cache

    monkeypatch.delenv("ICL_TPU_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache(None) is None
