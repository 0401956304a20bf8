"""Golden parity for label formatting against the reference's _format_label
(fixtures generated from data/multi_task_dataset.py)."""

import json
import os

from icl_speech_text_llm_tpu.data.labels import format_label
from icl_speech_text_llm_tpu.registry import DatasetType, get_dataset_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "format_label.json")


def test_format_label_golden_parity():
    with open(GOLDEN) as f:
        cases = json.load(f)
    assert len(cases) >= 14
    for case in cases:
        dt = DatasetType(case["dt"])
        cfg = get_dataset_config(dt)
        label = case["label"]
        got = format_label(
            label, dt, cfg,
            current_mapping=cfg.label_mapping,
            text=case.get("text"),
            is_raw_ner=(case["kind"] == "raw_ner"),
        )
        assert got == case["out"], case
