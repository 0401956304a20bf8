"""reprocess CLI: offline re-scoring of a saved results JSON."""

import json

from icl_speech_text_llm_tpu.cli.reprocess import main


def test_reprocess_roundtrip(tmp_path, capsys):
    results = {"results": [
        {"text": "a", "true_label": "positive", "predicted_label": "positive",
         "cleaned_prediction": "positive", "dataset_type": "voxceleb"},
        {"text": "b", "true_label": "negative", "predicted_label": "positive",
         "cleaned_prediction": "positive", "dataset_type": "voxceleb"},
        {"text": "c", "true_label": "neutral", "predicted_label": "neutral",
         "cleaned_prediction": "neutral", "dataset_type": "voxceleb"},
    ]}
    src = tmp_path / "run_results.json"
    src.write_text(json.dumps(results))
    out = tmp_path / "rescored_metrics.json"

    metrics = main(["--results", str(src), "--dataset_type", "voxceleb",
                    "--out", str(out)])
    assert 0.0 < metrics["accuracy"] < 1.0  # 2/3 correct
    assert out.exists()
    printed = json.loads(capsys.readouterr().out)
    assert printed["accuracy"] == metrics["accuracy"]
