"""Persistent XLA compilation cache wiring (utils/perf.enable_compilation_cache)."""

import os
import subprocess
import sys


def test_compilation_cache_populates(tmp_path):
    # run in a fresh process: jax initializes the persistent-cache backend
    # once per process, so flipping jax_compilation_cache_dir mid-session
    # (the conftest already pointed it at the shared suite cache) does not
    # reliably re-home it — and a subprocess is the actual use case anyway
    # (re-runs / eval sweeps / serving restarts starting warm)
    d = str(tmp_path / "xla_cache")
    prog = (
        "import jax, jax.numpy as jnp;"
        "from icl_speech_text_llm_tpu.utils.perf import enable_compilation_cache;"
        f"assert enable_compilation_cache({d!r}) == {d!r};"
        "jax.jit(lambda x: (x * 2.0).sum())(jnp.ones((64, 64))).block_until_ready()"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("ICL_TPU_COMPILE_CACHE", None)
    subprocess.run([sys.executable, "-c", prog], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert os.path.isdir(d) and len(os.listdir(d)) >= 1


def test_compilation_cache_disabled_without_path(monkeypatch):
    from icl_speech_text_llm_tpu.utils.perf import enable_compilation_cache

    monkeypatch.delenv("ICL_TPU_COMPILE_CACHE", raising=False)
    assert enable_compilation_cache(None) is None
