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
