"""Interactive single-query inference REPL
(ref: inference/interactive_inference.py:23-288).

Loads a model once, then loops: read a wav path (or 'synth' for a synthetic
tone) + optional task name, generate, print the cleaned prediction. Device
memory probing/device_map juggling from the reference is unnecessary on TPU —
the model either fits in HBM or a sharded mesh is used.
"""

from __future__ import annotations

import argparse
import os
import logging
import sys

import numpy as np

from ..data.collate import ICLSample
from ..data.packing import PackConfig
from ..data.prompts import build_default_prompt
from ..evaluation import clean_prediction
from ..inference.engine import GenerationConfig
from ..models.factory import create_model, get_model_from_checkpoint
from ..registry import DatasetType, get_dataset_config


def _load_wav(path: str) -> np.ndarray:
    if path == "synth":
        t = np.arange(16000 * 2) / 16000.0
        return (0.1 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import wave

    with wave.open(path, "rb") as w:
        frames = w.readframes(w.getnframes())
        data = np.frombuffer(frames, dtype=np.int16).astype(np.float32) / 32768.0
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
        if w.getframerate() != 16000:
            from ..utils.native import resample

            data = resample(data, w.getframerate(), 16000)
        return data


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(description="Interactive ICL inference")
    p.add_argument("--model_type", type=str, default="salmonn-tiny")
    p.add_argument("--peft_model_path", type=str, default=None)
    p.add_argument("--dataset_type", type=str, default="voxceleb")
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--compile_cache", type=str,
                   default=os.environ.get("ICL_TPU_COMPILE_CACHE"),
                   help="persistent XLA compilation cache dir: first compiles\n"
                        "(20-40 s/program on TPU) become one-time across processes")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        from ..utils.perf import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    if args.peft_model_path:
        model = get_model_from_checkpoint(args.peft_model_path, args.model_type)
    else:
        model = create_model(args.model_type)
    model.engine.gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        eos_token_id=model.tokenizer.eos_token_id,
        pad_token_id=model.tokenizer.pad_token_id,
    )
    pack_cfg = PackConfig(seq_len=768, text_len=512, max_slots=1,
                          audio_tokens_per_slot=model.cfg.audio_tokens_per_slot)
    dt = DatasetType(args.dataset_type)
    task = get_dataset_config(dt)
    print("Interactive inference. Enter a wav path (or 'synth'), empty line to quit.")
    for line in sys.stdin:
        path = line.strip()
        if not path:
            break
        try:
            wav = _load_wav(path)
        except Exception as e:
            print(f"could not load {path}: {e}")
            continue
        plan = build_default_prompt(task.prompt_template, "", [],
                                    input_mode="speech_only", fewshot_mode="text")
        sample = ICLSample(plan=plan, completion="", slot_audio={("main", 0): wav},
                           extras={"dataset_type": dt.value})
        batch_pred = model.generate_output([sample])[0]
        print(f"raw:     {batch_pred!r}")
        print(f"cleaned: {clean_prediction(batch_pred, dt)!r}")
    print("bye")


if __name__ == "__main__":
    main()
