"""serve CLI wiring: synthetic end-to-end through the slot pool."""

import json

from icl_speech_text_llm_tpu.cli.serve import main


def test_serve_cli_salmonn(capsys):
    results = main([
        "--model_type", "salmonn-tiny", "--dataset_type", "voxceleb",
        "--synthetic", "--max_samples", "3", "--num_slots", "2",
        "--num_examples", "1", "--max_new_tokens", "4",
    ])
    assert len(results) == 3
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["requests"] == 3
    assert summary["throughput_req_s"] > 0
    assert sum(1 for line in out if line.startswith("[req ")) == 3


def test_serve_cli_shared_prefix(capsys):
    """--shared_prefix: pinned-fewshot serving — the exemplar header registers
    once as prefix KV and every request prefills only its query suffix."""
    results = main([
        "--model_type", "salmonn-tiny", "--dataset_type", "voxceleb",
        "--synthetic", "--max_samples", "3", "--num_slots", "2",
        "--num_examples", "2", "--fewshot_mode", "speech",
        "--max_new_tokens", "4", "--shared_prefix",
        "--prompt_buckets", "128,256", "--prefix_buckets", "512",
    ])
    assert len(results) == 3
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["requests"] == 3
