"""Inference runner: dataset → batched generation → cleaning → metrics JSON.

Rebuild of the reference's run_inference loop (ref: inference/inference.py:
106-452) on the packed engine:

- fixed-size batches (last batch padded, padding rows dropped on host);
- per-dataset ``clean_prediction`` + ``evaluate_predictions``;
- results/metrics JSON with the reference's filename schema
  ``{run_name}_{datasets}_{input_mode}_{fewshot_mode}_{k}shots_{results,metrics}.json``
  (ref :411-448).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..data.collate import ICLSample, collate_icl_batch
from ..data.packing import PackConfig
from ..evaluation import clean_prediction, evaluate_predictions, to_json_compatible
from ..registry import DatasetType
from ..utils.perf import PerformanceTracker
from .engine import SalmonnEngine

logger = logging.getLogger(__name__)


@dataclass
class InferenceSettings:
    batch_size: int = 4
    max_new_tokens: int = 10
    results_dir: str = "results"
    run_name: str = "run"
    input_mode: str = "speech_only"
    fewshot_mode: str = "text"
    num_examples: int = 5
    max_samples: Optional[int] = None


def run_inference(
    engine: SalmonnEngine,
    dataset,
    pack_cfg: PackConfig,
    settings: InferenceSettings,
) -> Dict[str, Any]:
    """Generate predictions over ``dataset`` and score them per task."""
    tracker = PerformanceTracker(log_interval=10)
    results: List[Dict[str, Any]] = []
    n = len(dataset)
    if settings.max_samples:
        n = min(n, settings.max_samples)

    bs = settings.batch_size
    for start in range(0, n, bs):
        idxs = list(range(start, min(start + bs, n)))
        samples: List[ICLSample] = [dataset[i] for i in idxs]
        real = len(samples)
        while len(samples) < bs:  # pad the tail batch to the compiled shape
            samples.append(samples[-1])
        batch = collate_icl_batch(samples, engine.tokenizer, pack_cfg)
        preds = engine.generate(batch, batch.audio)[:real]
        for sample, pred in zip(samples[:real], preds):
            dt = sample.extras.get("dataset_type", "")
            results.append(
                {
                    "text": sample.extras.get("text", ""),
                    "true_label": sample.completion,
                    "predicted_label": pred,
                    "cleaned_prediction": clean_prediction(
                        pred, DatasetType(dt) if dt else None
                    ),
                    "dataset_type": dt,
                }
            )
        tracker.update(examples=real, tokens=real * settings.max_new_tokens)

    summary = tracker.get_summary()
    logger.info(
        f"Inference done: {len(results)} samples, "
        f"{summary['examples_per_sec']:.2f} utt/s"
    )
    return {"results": results, "perf": summary}


def save_final_results(
    payload: Dict[str, Any],
    dataset_types: Sequence[DatasetType],
    settings: InferenceSettings,
) -> Dict[str, str]:
    """Write results + per-dataset metrics JSON (reference filename schema)."""
    os.makedirs(settings.results_dir, exist_ok=True)
    ds_names = "_".join(dt.value for dt in dataset_types)
    stem = (
        f"{settings.run_name}_{ds_names}_{settings.input_mode}_"
        f"{settings.fewshot_mode}_{settings.num_examples}shots"
    )
    results_path = os.path.join(settings.results_dir, f"{stem}_results.json")
    with open(results_path, "w") as f:
        json.dump(to_json_compatible(payload), f, indent=2)

    metrics: Dict[str, Any] = {}
    for dt in dataset_types:
        subset = [r for r in payload["results"] if r["dataset_type"] == dt.value]
        if subset:
            metrics[dt.value] = evaluate_predictions(subset, dt)
    metrics["perf"] = payload.get("perf", {})
    metrics_path = os.path.join(settings.results_dir, f"{stem}_metrics.json")
    with open(metrics_path, "w") as f:
        json.dump(to_json_compatible(metrics), f, indent=2)
    logger.info(f"Saved results to {results_path} and metrics to {metrics_path}")
    return {"results": results_path, "metrics": metrics_path}
