"""Inference engine (ref layer L4 metric path, inference/inference.py):
jit prefill + KV-cached decode, batch runner, results/metrics JSON."""

from .engine import GenerationConfig, SalmonnEngine, decode_from_sequence, salmonn_generate
from .runner import InferenceSettings, run_inference, save_final_results
from .serving import ContinuousBatchingEngine, ServingConfig

__all__ = [
    "GenerationConfig",
    "SalmonnEngine",
    "decode_from_sequence",
    "salmonn_generate",
    "InferenceSettings",
    "run_inference",
    "save_final_results",
    "ContinuousBatchingEngine",
    "ServingConfig",
]
