"""Utilities: tokenization, perf tracking, memory, native runtime, logging."""

from .logging_utils import setup_logging
from .memory import (
    BatchSizeOptimizer,
    compiled_memory_bytes,
    get_device_memory_stats,
    log_device_memory_usage,
)
from .perf import PerformanceTracker, jax_profile, log_system_info, time_function, timer
from .tokenization import HFTokenizerAdapter, TinyTokenizer, Tokenizer, get_tokenizer

__all__ = [
    "setup_logging",
    "BatchSizeOptimizer",
    "compiled_memory_bytes",
    "get_device_memory_stats",
    "log_device_memory_usage",
    "PerformanceTracker",
    "jax_profile",
    "log_system_info",
    "time_function",
    "timer",
    "HFTokenizerAdapter",
    "TinyTokenizer",
    "Tokenizer",
    "get_tokenizer",
]
