"""Interactive REPL smoke: one 'synth' query through stdin, clean exit."""

import io

from icl_speech_text_llm_tpu.cli import interactive


def test_interactive_synth_roundtrip(monkeypatch, capsys):
    monkeypatch.setattr("sys.stdin", io.StringIO("synth\n\n"))
    interactive.main(["--model_type", "salmonn-tiny", "--max_new_tokens", "4"])
    out = capsys.readouterr().out
    assert "raw:" in out and "cleaned:" in out
    assert out.strip().endswith("bye")


def test_interactive_bad_path_recovers(monkeypatch, capsys):
    monkeypatch.setattr("sys.stdin", io.StringIO("/nope/missing.wav\nsynth\n\n"))
    interactive.main(["--model_type", "salmonn-tiny", "--max_new_tokens", "4"])
    out = capsys.readouterr().out
    assert "could not load /nope/missing.wav" in out
    assert "raw:" in out  # the loop survived and served the next query
