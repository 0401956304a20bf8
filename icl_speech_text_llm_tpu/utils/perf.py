"""Performance tracking + timers (ref: utils/performance_utils.py:15-177).

Same counters as the reference's PerformanceTracker (step time, examples/s,
tokens/s, rolling loss) plus JAX profiler hooks in place of cuDNN knobs.
"""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import time
from collections import deque
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class PerformanceTracker:
    """Rolling throughput/latency/loss tracker
    (ref: utils/performance_utils.py:15-127)."""

    def __init__(self, log_interval: int = 10, window: int = 100):
        self.log_interval = log_interval
        self.step_times = deque(maxlen=window)
        self.losses = deque(maxlen=window)
        self.examples = deque(maxlen=window)
        self.tokens = deque(maxlen=window)
        self.total_examples = 0
        self.total_steps = 0
        self._last = None
        self.start_time = time.time()

    def update(self, loss: Optional[float] = None, examples: int = 0, tokens: int = 0):
        now = time.time()
        if self._last is not None:
            self.step_times.append(now - self._last)
        self._last = now
        if loss is not None:
            self.losses.append(float(loss))
        self.examples.append(examples)
        self.tokens.append(tokens)
        self.total_examples += examples
        self.total_steps += 1
        if self.log_interval and self.total_steps % self.log_interval == 0:
            self.log_metrics()

    def get_summary(self) -> Dict[str, float]:
        elapsed = max(time.time() - self.start_time, 1e-9)
        window_time = sum(self.step_times) or 1e-9
        return {
            "steps": self.total_steps,
            "avg_step_time": window_time / max(len(self.step_times), 1),
            "examples_per_sec": sum(self.examples) / window_time if self.step_times else 0.0,
            "tokens_per_sec": sum(self.tokens) / window_time if self.step_times else 0.0,
            "avg_loss": sum(self.losses) / max(len(self.losses), 1),
            "total_examples": self.total_examples,
            "elapsed": elapsed,
        }

    def log_metrics(self):
        s = self.get_summary()
        logger.info(
            f"step {s['steps']}: {s['examples_per_sec']:.2f} ex/s, "
            f"{s['tokens_per_sec']:.0f} tok/s, avg step {s['avg_step_time']*1000:.1f} ms, "
            f"avg loss {s['avg_loss']:.4f}"
        )


@contextlib.contextmanager
def timer(name: str, log=True):
    """(ref: utils/performance_utils.py:130-150)"""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if log:
        logger.info(f"{name} took {dt:.3f}s")


def time_function(fn):
    """(ref: utils/performance_utils.py:153-177)"""

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with timer(fn.__name__):
            return fn(*a, **kw)

    return wrapped


@contextlib.contextmanager
def jax_profile(outdir: Optional[str] = None):
    """jax.profiler trace — the TPU-native answer to torch.profiler's absence
    in the reference (SURVEY.md §5.1)."""
    import jax

    if not outdir:
        yield
        return
    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_system_info():
    """(ref: utils/performance_utils.py:336-375)"""
    import jax

    try:
        import psutil

        vm = psutil.virtual_memory()
        logger.info(f"Host memory: {vm.total/2**30:.1f} GiB total, {vm.percent}% used")
    except ImportError:
        pass
    logger.info(f"JAX backend: {jax.default_backend()}; devices: {jax.devices()}")


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Persist XLA compilations on disk across processes.

    First compiles cost 20-40 s per program shape on TPU; the persistent
    cache makes every later process (re-runs, eval sweeps, serving restarts)
    start warm. Wired into every CLI as ``--compile_cache`` with the
    ``ICL_TPU_COMPILE_CACHE`` env var as default; returns the directory in
    effect (None = disabled). Safe to share between concurrent processes
    (entries are content-addressed by HLO + compile options + backend).
    """
    import jax

    path = path or os.environ.get("ICL_TPU_COMPILE_CACHE")
    if not path:
        return None
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the dispatch-latency-bound tunnel makes
    # every recompile user-visible, and entries are cheap
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
