"""Per-task metric engine with reference parity.

Behavioral contract from ref: utils/evaluation_utils.py:16-467,714-957.
Implemented in numpy/sklearn host-side code (metrics are not a TPU workload);
golden-tested against the reference implementation.
"""

from __future__ import annotations

import logging
import re
from collections import Counter
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix,
    f1_score,
    precision_score,
    recall_score,
)

from ..registry import DatasetType, get_dataset_config, get_swap_config
from .cleaning import clean_prediction

logger = logging.getLogger(__name__)

_SWAP_TYPES = {
    DatasetType.VOXCELEB_SWAP,
    DatasetType.HVB_SWAP,
    DatasetType.VOXPOPULI_SWAP,
}

_SINGLE_LABEL_ROUTES = {
    DatasetType.VOXCELEB,
    DatasetType.VOXCELEB_SWAP,
    DatasetType.VOXCELEB_GREEK,
    DatasetType.MELD,
    DatasetType.MELD_GREEK,
    DatasetType.MELD_EMOTION,
    DatasetType.MELD_EMOTION_GREEK,
}
_HVB_ROUTES = {DatasetType.HVB, DatasetType.HVB_SWAP, DatasetType.HVB_GREEK}
_VOXPOPULI_ROUTES = {
    DatasetType.VOXPOPULI,
    DatasetType.VOXPOPULI_SWAP,
    DatasetType.VOXPOPULI_GREEK,
}


def evaluate_predictions(
    predictions: List[Dict[str, Any]], dataset_type: DatasetType
) -> Dict[str, Any]:
    """Route a list of {true_label, predicted_label, text} dicts to the task metric
    (ref: utils/evaluation_utils.py:16-104)."""
    if not predictions:
        logger.warning("Empty predictions list provided for evaluation")
        return {"error": "Empty predictions list", "accuracy": 0.0}

    try:
        if dataset_type in _SWAP_TYPES:
            config = get_swap_config(dataset_type)
        else:
            config = get_dataset_config(dataset_type)
        if not config:
            return {"error": "Invalid dataset type"}

        true_labels = [p.get("true_label", "") for p in predictions]
        pred_labels = [
            clean_prediction(p.get("predicted_label", ""), dataset_type)
            for p in predictions
        ]
        df = pd.DataFrame(
            {
                "text": [p.get("text", "") for p in predictions],
                "gt": true_labels,
                "pd": pred_labels,
            }
        )

        valid_labels = None
        if config.valid_labels is not None:
            valid_labels = [label.lower() for label in config.valid_labels]

        if dataset_type in _SINGLE_LABEL_ROUTES:
            return evaluate_single_label(df, valid_labels)
        if dataset_type in _HVB_ROUTES:
            return evaluate_multi_label(df, valid_labels, add_none=False)
        if dataset_type in _VOXPOPULI_ROUTES:
            return evaluate_multi_label(df, valid_labels, add_none=True)
        if dataset_type == DatasetType.VOXPOPULI_NEL:
            return evaluate_vp_nel(df, valid_labels)
        if dataset_type == DatasetType.SQA:
            return evaluate_sqa(df)
        logger.warning(f"Unsupported dataset type for evaluation: {dataset_type}")
        return {"accuracy": 0.0}
    except Exception as e:  # metric engine must never raise into the run loop
        logger.error(f"Error in evaluate_predictions: {e}")
        return {"error": str(e), "accuracy": 0.0}


def evaluate_single_label(df: pd.DataFrame, valid_classes: List[str]) -> Dict[str, Any]:
    """Single-label classification: macro-F1 with an 'invalid' bucket plus
    filtered standard metrics (ref: utils/evaluation_utils.py:106-211)."""
    total_samples = len(df)
    df = df.assign(gt=df["gt"].str.lower(), pd=df["pd"].str.lower())
    df = df[df["gt"].isin(valid_classes)]
    after_gt_filter = len(df)

    # Out-of-vocabulary predictions become an explicit 'invalid' class.
    pred_with_invalid = df["pd"].where(df["pd"].isin(valid_classes), "invalid")
    macro_f1_with_invalid = f1_score(
        df["gt"].values,
        pred_with_invalid.values,
        average="macro",
        labels=valid_classes,
        zero_division=0,
    )
    n_invalid = int((~df["pd"].isin(valid_classes)).sum())

    df_filtered = df[df["pd"].isin(valid_classes)]
    if len(df_filtered) == 0:
        logger.warning("No valid predictions found for evaluation")
        return {
            "macro_f1_filtered": 0.0,
            "macro_f1_with_invalid": 0.0,
            "invalid_predictions": n_invalid,
            "total_samples": total_samples,
            "valid_gt_samples": after_gt_filter,
            "valid_samples": 0,
        }

    gt, pdv = df_filtered["gt"].values, df_filtered["pd"].values
    matrix = confusion_matrix(gt, pdv, labels=valid_classes)
    kwargs = dict(average=None, labels=valid_classes, zero_division=0)
    return {
        "accuracy": accuracy_score(gt, pdv),
        "macro_f1_filtered": f1_score(
            gt, pdv, average="macro", labels=valid_classes, zero_division=0
        ),
        "class_accuracy_filtered": (matrix.diagonal() / matrix.sum(axis=1)).tolist(),
        "class_precision": precision_score(gt, pdv, **kwargs).tolist(),
        "class_recall": recall_score(gt, pdv, **kwargs).tolist(),
        "class_f1": f1_score(gt, pdv, **kwargs).tolist(),
        "confusion_matrix_filtered": matrix.tolist(),
        "valid_samples": len(df_filtered),
        "macro_f1_with_invalid": macro_f1_with_invalid,
        "invalid_predictions": n_invalid,
        "total_samples": total_samples,
        "valid_gt_samples": after_gt_filter,
        "valid_classes": valid_classes,
    }


# Reference alias (ref: utils/evaluation_utils.py:106)
evaluate_voxceleb = evaluate_single_label


def _split_labels(value, strip: bool) -> List[str]:
    if isinstance(value, str):
        parts = value.split(",")
        return [p.strip().lower() for p in parts] if strip else [p.lower() for p in parts]
    return [label.lower() for label in value]


def _binary_matrix(rows: Sequence[List[str]], classes: List[str]) -> np.ndarray:
    """Binary indicator matrix; rows with no valid label become all-zero
    (ref: utils/evaluation_utils.py:234-243)."""
    out = np.zeros((len(rows), len(classes)))
    for i, labels in enumerate(rows):
        if any(label in classes for label in labels):
            out[i] = [1 if c in labels else 0 for c in classes]
    return out


def evaluate_multi_label(
    df: pd.DataFrame, valid_classes: List[str], add_none: bool
) -> Dict[str, Any]:
    """Multi-label classification (HVB dialog acts; VoxPopuli entity types with an
    extra 'none' class) (ref: utils/evaluation_utils.py:213-337).

    NB: the HVB route does NOT strip spaces around commas while the VoxPopuli
    route does — preserved because ground-truth formatting depends on it
    (SURVEY.md §8 item 7).
    """
    total_samples = len(df)
    classes = (
        valid_classes + ["none"]
        if add_none and "none" not in valid_classes
        else list(valid_classes)
    )
    gt_rows = [_split_labels(v, strip=add_none) for v in df["gt"]]
    pd_rows = [_split_labels(v, strip=add_none) for v in df["pd"]]

    keep = [any(label in classes for label in labels) for labels in gt_rows]
    gt_rows = [r for r, k in zip(gt_rows, keep) if k]
    pd_rows = [r for r, k in zip(pd_rows, keep) if k]
    after_gt_filter = len(gt_rows)

    invalid_samples = sum(
        1 for labels in pd_rows if not any(label in classes for label in labels)
    )

    y_true = _binary_matrix(gt_rows, classes)
    y_pred = _binary_matrix(pd_rows, classes)

    exact_match = sum(
        np.array_equal(t, p) for t, p in zip(y_true, y_pred)
    ) / max(1, len(y_true))

    return {
        "exact_match": exact_match,
        "macro_f1": f1_score(y_true, y_pred, average="macro", zero_division=0),
        "micro_f1": f1_score(y_true, y_pred, average="micro", zero_division=0),
        "weighted_f1": f1_score(y_true, y_pred, average="weighted", zero_division=0),
        "class_precision": precision_score(
            y_true, y_pred, average=None, zero_division=0
        ).tolist(),
        "class_recall": recall_score(y_true, y_pred, average=None, zero_division=0).tolist(),
        "class_f1": f1_score(y_true, y_pred, average=None, zero_division=0).tolist(),
        "support": y_true.sum(axis=0).tolist(),
        "total_samples": total_samples,
        "valid_gt_samples": after_gt_filter,
        "invalid_samples": invalid_samples,
        "valid_classes": valid_classes,
    }


def evaluate_hvb(df: pd.DataFrame, valid_classes: List[str]) -> Dict[str, Any]:
    return evaluate_multi_label(df, valid_classes, add_none=False)


def evaluate_voxpopuli(df: pd.DataFrame, valid_classes: List[str]) -> Dict[str, Any]:
    return evaluate_multi_label(df, valid_classes, add_none=True)


def parse_entities(entity_string: str) -> List[Tuple[str, float, float]]:
    """Parse 'TYPE: start end; ...' spans (ref: utils/evaluation_utils.py:339-354)."""
    parsed = []
    if not entity_string or entity_string.strip() == "":
        return parsed
    for entity in entity_string.split(";"):
        if entity.strip():
            try:
                entity_type, times = entity.strip().split(":")
                start, end = map(float, times.strip().split())
                parsed.append((entity_type.strip(), start, end))
            except Exception as e:
                logger.warning(f"Error parsing entity: {entity}, Error: {e}")
    return parsed


def _greedy_span_match(
    gt_entities: List[Tuple], pred_entities: List[Tuple], tolerance: float, typed: bool
) -> int:
    """Count predictions matching an unmatched GT span with overlap ≥ tolerance
    (relative to GT duration) (ref: utils/evaluation_utils.py:384-408)."""
    matched_gt: set = set()
    correct = 0
    for pred in pred_entities:
        p_type, p_start, p_end = pred if typed else (None, *pred)
        best_overlap, best_idx = 0.0, None
        for gt_idx, gt in enumerate(gt_entities):
            if gt_idx in matched_gt:
                continue
            g_type, g_start, g_end = gt if typed else (None, *gt)
            if typed and p_type.upper() != g_type.upper():
                continue
            overlap_start = max(p_start, g_start)
            overlap_end = min(p_end, g_end)
            if overlap_end > overlap_start:
                overlap = (overlap_end - overlap_start) / (g_end - g_start)
                if overlap >= tolerance and overlap > best_overlap:
                    best_overlap, best_idx = overlap, gt_idx
        if best_idx is not None:
            correct += 1
            matched_gt.add(best_idx)
    return correct


def _span_f1(correct: int, n_pred: int, n_gt: int) -> Dict[str, float]:
    precision = correct / max(n_pred, 1)
    recall = correct / max(n_gt, 1)
    return {
        "precision": precision,
        "recall": recall,
        "f1": 2 * (precision * recall) / max(precision + recall, 1e-6),
    }


def _timestamp_metrics(
    parsed_gt: Dict[int, list], parsed_pred: Dict[int, list], typed: bool
) -> Dict[str, Any]:
    """Word-level (tolerance sweep) + frame-level (centisecond) span metrics
    (ref: utils/evaluation_utils.py:368-467,733-830)."""
    word_metrics = {}
    for tolerance in [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]:
        total_correct = total_pred = total_gt = 0
        for idx in parsed_gt:
            gt_entities = parsed_gt[idx]
            pred_entities = parsed_pred.get(idx, [])
            total_gt += len(gt_entities)
            total_pred += len(pred_entities)
            total_correct += _greedy_span_match(gt_entities, pred_entities, tolerance, typed)
        word_metrics[str(tolerance)] = _span_f1(total_correct, total_pred, total_gt)

    total_pred_frames = total_gt_frames = total_correct_frames = 0
    for idx in parsed_gt:
        gt_entities = parsed_gt[idx]
        pred_entities = parsed_pred.get(idx, [])
        for pred in pred_entities:
            p_type, p_start, p_end = pred if typed else (None, *pred)
            total_pred_frames += int((p_end - p_start) * 100)
            for gt in gt_entities:
                g_type, g_start, g_end = gt if typed else (None, *gt)
                if typed and p_type.upper() != g_type.upper():
                    continue
                overlap_start = max(p_start, g_start)
                overlap_end = min(p_end, g_end)
                if overlap_end > overlap_start:
                    total_correct_frames += int((overlap_end - overlap_start) * 100)
        for gt in gt_entities:
            _, g_start, g_end = gt if typed else (None, *gt)
            total_gt_frames += int((g_end - g_start) * 100)

    return {
        "word_metrics": word_metrics,
        "frame_metrics": _span_f1(total_correct_frames, total_pred_frames, total_gt_frames),
        "total_frames": {
            "gt": total_gt_frames,
            "pred": total_pred_frames,
            "correct": total_correct_frames,
        },
    }


def evaluate_vp_nel(
    df: pd.DataFrame, valid_classes: Optional[List[str]] = None
) -> Dict[str, Any]:
    """VP-NEL: typed timestamp spans (ref: utils/evaluation_utils.py:356-467)."""
    df = df.assign(gt=df["gt"].str.lower(), pd=df["pd"].str.lower())
    parsed_gt = {idx: parse_entities(row["gt"]) for idx, row in df.iterrows()}
    parsed_pred = {idx: parse_entities(row["pd"]) for idx, row in df.iterrows()}
    out = _timestamp_metrics(parsed_gt, parsed_pred, typed=True)
    out.update(
        total_samples=len(df),
        total_gt_entities=sum(len(v) for v in parsed_gt.values()),
        total_pred_entities=sum(len(v) for v in parsed_pred.values()),
    )
    return out


def _parse_timestamps(time_string: str) -> List[Tuple[float, float]]:
    if not time_string or time_string.strip() == "":
        return []
    try:
        start, end = map(float, time_string.strip().split())
        return [(start, end)]
    except Exception as e:
        logger.warning(f"Error parsing timestamps: {time_string}, Error: {e}")
        return []


def evaluate_sqq(
    df: pd.DataFrame, valid_classes: Optional[List[str]] = None
) -> Dict[str, Any]:
    """Untyped 'start end' timestamp variant (ref: utils/evaluation_utils.py:714-830)."""
    parsed_gt = {idx: _parse_timestamps(row["gt"]) for idx, row in df.iterrows()}
    parsed_pred = {idx: _parse_timestamps(row["pd"]) for idx, row in df.iterrows()}
    out = _timestamp_metrics(parsed_gt, parsed_pred, typed=False)
    out.update(
        total_samples=len(df),
        total_gt_segments=sum(len(v) for v in parsed_gt.values()),
        total_pred_segments=sum(len(v) for v in parsed_pred.values()),
    )
    return out


def normalize_answer(text) -> str:
    """Lowercase, strip punctuation/extra spaces (ref: utils/evaluation_utils.py:855-862)."""
    if text is None:
        return ""
    text = str(text).lower()
    text = re.sub(r"[^\w\s]", " ", text)
    return re.sub(r"\s+", " ", text).strip()


def evaluate_sqa(
    df: pd.DataFrame, valid_classes: Optional[List[str]] = None
) -> Dict[str, Any]:
    """QA: normalized exact match, token F1, smoothed BLEU
    (ref: utils/evaluation_utils.py:832-957)."""
    from nltk.translate.bleu_score import SmoothingFunction, sentence_bleu

    total_samples = len(df)
    smoother = SmoothingFunction().method1
    exact_matches = 0
    f1_scores: List[float] = []
    bleu_scores: List[float] = []

    for _, row in df.iterrows():
        gt = row.get("gt") or ""
        pred = row.get("pd") or ""
        exact_matches += int(normalize_answer(gt) == normalize_answer(pred))

        gt_tokens = normalize_answer(gt).split() if normalize_answer(gt) else []
        pred_tokens = normalize_answer(pred).split() if normalize_answer(pred) else []
        if not gt_tokens and not pred_tokens:
            f1 = 1.0
        elif not gt_tokens or not pred_tokens:
            f1 = 0.0
        else:
            common = Counter(gt_tokens) & Counter(pred_tokens)
            num_common = sum(common.values())
            precision = num_common / max(len(pred_tokens), 1)
            recall = num_common / max(len(gt_tokens), 1)
            f1 = 2 * (precision * recall) / max(precision + recall, 1e-6)
        f1_scores.append(f1)

        try:
            if gt_tokens:
                bleu = sentence_bleu([gt_tokens], pred_tokens, smoothing_function=smoother)
            else:
                bleu = 0.0 if pred_tokens else 1.0
        except Exception as e:
            logger.warning(f"Error calculating BLEU score: {e}")
            bleu = 0.0
        bleu_scores.append(bleu)

    return {
        "exact_match": exact_matches / max(total_samples, 1),
        "f1_score": sum(f1_scores) / max(len(f1_scores), 1),
        "bleu_score": sum(bleu_scores) / max(len(bleu_scores), 1),
        "total_samples": total_samples,
        "samples_evaluated": len(f1_scores),
        "sample_metrics": {
            "exact_match": [1 if f == 1.0 else 0 for f in f1_scores],
            "f1_scores": f1_scores,
            "bleu_scores": bleu_scores,
        },
    }
