"""Run a single bench.py block by name, skipping the headline bench.

Usage: python scripts/run_bench_block.py <block> [block ...]
  block in {13b, 7b, train7b, serving, qwen7b, qwen7b_speech, prefix}

Honors the same env knobs as bench.py (BENCH_KV_INT8, BENCH_TRAIN7B_REMAT,
BENCH_SERVING_SCALE, ...). Prints one JSON object per block.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

import jax  # noqa: E402

if os.environ.get("BENCH_CPU"):  # mirror bench.main()'s platform switch
    jax.config.update("jax_platforms", "cpu")

from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer  # noqa: E402


def main():
    tok = get_tokenizer()
    out = {}
    for name in sys.argv[1:]:
        if name == "13b":
            out[name] = bench.bench_salmonn_7b(jax, tok, scale="13b")
        elif name == "7b":
            out[name] = bench.bench_salmonn_7b(jax, tok)
        elif name == "train7b":
            out[name] = bench.bench_train_7b(jax, tok)
        elif name == "serving":
            out[name] = bench.bench_serving(jax, tok)
        elif name == "qwen7b":
            out[name] = bench.bench_qwen2_audio_7b(jax, tok)
        elif name == "qwen7b_speech":
            out[name] = bench.bench_qwen2_audio_7b_speech_fs(jax, tok)
        elif name == "prefix":
            out[name] = bench.bench_prefix(jax, tok)
        else:
            raise SystemExit(f"unknown block {name!r}")
        print(json.dumps({name: out[name]}), flush=True)


if __name__ == "__main__":
    main()
