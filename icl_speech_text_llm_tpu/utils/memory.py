"""Memory utilities: device stats + compile-time batch-size search.

TPU-native rebuild of the reference's CUDA memory tooling:
- memory stats/logging (ref: utils/performance_utils.py:180-306,
  utils/training_utils.py:103-137) via JAX device memory stats;
- BatchSizeOptimizer (ref: utils/performance_utils.py:452-584) — instead of
  the reference's run-and-catch-OOM probing, the TPU version asks the COMPILER:
  ``jit(fn).lower(shapes).compile().memory_analysis()`` yields exact HBM
  requirements without executing, so the search is fast and side-effect free.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

logger = logging.getLogger(__name__)


def get_device_memory_stats(device=None) -> Dict[str, float]:
    """Per-device HBM usage in GiB (0s when the backend lacks stats)."""
    import jax

    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        stats = {}
    gib = 1024**3
    return {
        "bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
        "peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
        "bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
    }


def log_device_memory_usage(prefix: str = "") -> None:
    """(ref: utils/training_utils.py:120-137)"""
    import jax

    for d in jax.local_devices():
        s = get_device_memory_stats(d)
        logger.info(
            f"{prefix}{d}: {s['bytes_in_use_gib']:.2f} GiB in use "
            f"(peak {s['peak_bytes_in_use_gib']:.2f}, limit {s['bytes_limit_gib']:.2f})"
        )


def compiled_memory_bytes(fn: Callable, *example_args) -> Optional[int]:
    """Total HBM a jitted fn needs for the given arg shapes (None if the
    backend doesn't expose memory analysis)."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        mem = compiled.memory_analysis()
        if mem is None:
            return None
        return int(
            getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0)
        )
    except Exception as e:
        logger.info(f"memory analysis unavailable: {e}")
        return None


def tile_batch(batch, batch_size: int):
    """Tile a batch-of-1 pytree to ``batch_size`` along axis 0.

    Shape probe only — values repeat; used by the CLIs' ``--auto_batch`` to
    lower the real step/generate program at candidate batch sizes without
    collating more data."""
    import jax
    import numpy as np

    def _tile(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return np.repeat(np.asarray(x), batch_size, axis=0)
        return x

    return jax.tree_util.tree_map(_tile, batch)


class BatchSizeOptimizer:
    """Find the largest batch size whose compiled program fits in HBM.

    ``make_args(batch_size) -> tuple`` builds example args;
    the search is a doubling probe + binary refinement
    (the reference's OOM-probe structure, ref: performance_utils.py:534-584,
    minus the CUDA crash-recovery).
    """

    def __init__(
        self,
        fn: Callable,
        make_args: Callable[[int], tuple],
        memory_budget_bytes: Optional[int] = None,
        max_batch: int = 512,
    ):
        self.fn = fn
        self.make_args = make_args
        self.max_batch = max_batch
        if memory_budget_bytes is None:
            import jax

            stats = get_device_memory_stats()
            limit = stats["bytes_limit_gib"] * 1024**3
            memory_budget_bytes = int(limit * 0.9) if limit else 8 * 1024**3
        self.budget = memory_budget_bytes

    def _fits(self, batch_size: int) -> bool:
        need = compiled_memory_bytes(self.fn, *self.make_args(batch_size))
        if need is None:
            return False
        fits = need <= self.budget
        logger.info(
            f"batch {batch_size}: {need/2**30:.2f} GiB needed, "
            f"budget {self.budget/2**30:.2f} → {'fits' if fits else 'OOM'}"
        )
        return fits

    def find_optimal_batch_size(self, start: int = 1) -> int:
        """(ref: performance_utils.py:534-584)"""
        if not self._fits(start):
            return 0
        lo = start
        hi = start
        while hi < self.max_batch:
            nxt = hi * 2
            if nxt > self.max_batch or not self._fits(nxt):
                break
            lo = hi = nxt
        # binary refine between hi and 2*hi
        left, right = hi, min(hi * 2, self.max_batch)
        while left + 1 < right:
            mid = (left + right) // 2
            if self._fits(mid):
                left = mid
            else:
                right = mid
        return left
