"""MELD dataset preparation + fewshot-layout build (offline paths).

Ref: utils/process_datasets.py:166-271 (MELD from CSV/hub with integer→text
label mapping) and archive/utils/generate_fewshots.py (the *_embedding_topk10
layout). Hub downloads need network, so these tests exercise the CSV source
and a monkeypatched loader.
"""

import numpy as np
import pandas as pd
import pytest

datasets = pytest.importorskip("datasets")

from icl_speech_text_llm_tpu.data import prepare  # noqa: E402
from icl_speech_text_llm_tpu.registry import DatasetType  # noqa: E402


def _write_csv(tmp_path, with_paths=False):
    rows = []
    for i in range(6):
        rows.append({
            "text": f"utterance number {i} about feelings",
            "emotion": i % 7,
            "sentiment": i % 3,
            **({"path": str(tmp_path / f"missing_{i}.flac")} if with_paths else {}),
        })
    csv = tmp_path / "meld.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv)


def test_prepare_meld_from_csv(tmp_path):
    csv = _write_csv(tmp_path)
    out = tmp_path / "meld_train"
    ds = prepare.prepare_meld("train", str(out), source=csv)
    assert len(ds) == 6
    assert ds[0]["emotion_label"] == "neutral"
    assert ds[1]["emotion_label"] == "joy"
    assert ds[1]["sentiment_label"] == "positive"
    assert ds[2]["sentiment_label"] == "negative"
    assert ds[0]["unique_id"] == "meld_0"
    # round-trips through save_to_disk
    reloaded = datasets.load_from_disk(str(out))
    assert reloaded[3]["emotion_label"] == "anger"


def test_prepare_meld_filters_missing_audio(tmp_path):
    # rows carry 'path' columns pointing at files that don't exist → dropped,
    # mirroring the reference's os.path.exists filter
    csv = _write_csv(tmp_path, with_paths=True)
    out = tmp_path / "meld_filtered"
    ds = prepare.prepare_meld("train", str(out), source=csv)
    assert len(ds) == 0


def test_build_fewshots_layout(tmp_path, monkeypatch):
    pool = [{"normalized_text": f"sample about topic {i % 3} item {i}",
             "sentiment": ["positive", "negative", "neutral"][i % 3]}
            for i in range(12)]

    from icl_speech_text_llm_tpu.data import sources

    def fake_load(dataset_type, split, use_cache=True):
        return pool

    monkeypatch.setattr(sources, "load_dataset", fake_load)
    out = tmp_path / "vox_topk"
    rows = prepare.build_fewshots(DatasetType.VOXCELEB, "train", str(out), k=4)
    assert len(rows) == len(pool)
    for r in rows:
        few = r["few_shot_examples"]
        assert len(few) == 4
        assert {"text", "label", "index"} <= set(few[0])
        # self-retrieval excluded: own text never its own exemplar
        assert all(f["text"] != r["normalized_text"] for f in few)
    reloaded = datasets.load_from_disk(str(out))
    assert len(reloaded) == len(pool)
