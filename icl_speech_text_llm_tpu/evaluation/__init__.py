"""Metric engine + prediction cleaning (ref layer L5, utils/evaluation_utils.py)."""

from .cleaning import clean_prediction
from .metrics import (
    evaluate_hvb,
    evaluate_multi_label,
    evaluate_predictions,
    evaluate_single_label,
    evaluate_sqa,
    evaluate_sqq,
    evaluate_voxceleb,
    evaluate_voxpopuli,
    evaluate_vp_nel,
    normalize_answer,
    parse_entities,
)
from .reporting import (
    analyze_errors,
    reprocess_results,
    save_evaluation_results,
    to_json_compatible,
)

__all__ = [
    "clean_prediction",
    "evaluate_predictions",
    "evaluate_single_label",
    "evaluate_multi_label",
    "evaluate_voxceleb",
    "evaluate_hvb",
    "evaluate_voxpopuli",
    "evaluate_vp_nel",
    "evaluate_sqa",
    "evaluate_sqq",
    "normalize_answer",
    "parse_entities",
    "analyze_errors",
    "save_evaluation_results",
    "reprocess_results",
    "to_json_compatible",
]
