"""Full-layout salmonn_v1.pth + Vicuna-13B streaming conversion check at REAL shapes.

Round-2 VERDICT missing #2: the streaming converter was only exercised tiny.
This script synthesizes, ON DISK, the complete checkpoint layouts the
reference consumes (ref models/custom_salmon.py:83 `ckpt` wrapper; PEFT
`.lora_A.default.weight` nesting at :190-192; HF sharded-safetensors for the
decoder), streams them through ``cli/convert.py`` in child processes with RSS
accounting, loads the int4 dir, and runs generation.

Phases (composable, so the device-bound one can be retried alone):
  synth    — write a 13B-shaped HF f16 sharded checkpoint (~25 GB) and a
             full-key salmonn_v1.pth (Q-Former + PEFT LoRA, `ckpt`-wrapped)
  convert  — cli/convert --quantize_int4 (decoder, streamed; RSS asserted
             ~one layer) and cli/convert --component salmonn
  generate — load the converted dirs (mmap) and greedy-decode a few tokens
             (uses the real TPU when reachable, else CPU)
  all      — everything, then print one JSON verdict line

Usage: python scripts/check_convert_13b.py [--phase all] [--root /tmp/ckpt13b]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM, N_LAYERS, HIDDEN, VOCAB = 5120, 40, 13824, 32000  # vicuna-13b
QF_DIM, QF_LAYERS, QF_WIDTH, QF_MLP = 768, 2, 2048, 4  # QFORMER_CONFIGS["salmonn"]
LORA_RANK = 8
LAYERS_PER_SHARD = 8

# One converted layer resident at a time: the largest tensor is
# down_proj/up_proj at 13824x5120 f32 = 283 MB; budget covers a few copies
# (read buffer + transpose + quantize) plus interpreter/numpy overhead.
# The cap applies to peak ANONYMOUS memory (RssAnon): ru_maxrss also counts
# mmap'd input shards and dirty output-memmap pages — file-backed, evicted
# under pressure, and ~the whole 33 GB checkpoint by the end of a streaming
# pass, which says nothing about residency.
MAX_CONVERT_RSS_GB = 4.0


def _rng(i):
    return np.random.RandomState(1234 + i)


def synth_decoder(root: str) -> None:
    """HF-style sharded f16 safetensors with the exact vicuna key set."""
    from safetensors.numpy import save_file

    hf = os.path.join(root, "hf-vicuna-13b")
    os.makedirs(hf, exist_ok=True)
    weight_map = {}

    def shard_name(s):
        return f"model-{s + 1:05d}-of-{N_LAYERS // LAYERS_PER_SHARD + 1:05d}.safetensors"

    for s in range(N_LAYERS // LAYERS_PER_SHARD):
        tensors = {}
        for li in range(s * LAYERS_PER_SHARD, (s + 1) * LAYERS_PER_SHARD):
            r = _rng(li)
            p = f"model.layers.{li}."
            for name, shape in (
                ("self_attn.q_proj.weight", (DIM, DIM)),
                ("self_attn.k_proj.weight", (DIM, DIM)),
                ("self_attn.v_proj.weight", (DIM, DIM)),
                ("self_attn.o_proj.weight", (DIM, DIM)),
                ("mlp.gate_proj.weight", (HIDDEN, DIM)),
                ("mlp.up_proj.weight", (HIDDEN, DIM)),
                ("mlp.down_proj.weight", (DIM, HIDDEN)),
            ):
                tensors[p + name] = (r.randn(*shape) * 0.02).astype(np.float16)
            tensors[p + "input_layernorm.weight"] = np.ones(DIM, np.float16)
            tensors[p + "post_attention_layernorm.weight"] = np.ones(DIM, np.float16)
        fn = shard_name(s)
        save_file(tensors, os.path.join(hf, fn))
        weight_map.update({k: fn for k in tensors})
        print(f"shard {fn} written ({len(tensors)} tensors)", flush=True)

    r = _rng(999)
    tail = {
        "model.embed_tokens.weight": (r.randn(VOCAB, DIM) * 0.02).astype(np.float16),
        "model.norm.weight": np.ones(DIM, np.float16),
        "lm_head.weight": (r.randn(VOCAB, DIM) * 0.02).astype(np.float16),
    }
    fn = shard_name(N_LAYERS // LAYERS_PER_SHARD)
    save_file(tail, os.path.join(hf, fn))
    weight_map.update({k: fn for k in tail})
    with open(os.path.join(hf, "model.safetensors.index.json"), "w") as f:
        json.dump({"weight_map": weight_map}, f)


def synth_salmonn(root: str) -> None:
    """salmonn_v1.pth with EVERY key family the real checkpoint has, at real
    shapes, inside the reference's `ckpt` wrapper (custom_salmon.py:83)."""
    import torch

    r = _rng(7)
    sd = {}
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a.astype(np.float32)))
    sd["speech_query_tokens"] = t(r.randn(1, 1, QF_DIM) * 0.02)
    sd["ln_speech.weight"] = t(np.ones(1280))
    sd["ln_speech.bias"] = t(np.zeros(1280))
    sd["ln_audio.weight"] = t(np.ones(768))
    sd["ln_audio.bias"] = t(np.zeros(768))
    for i in range(QF_LAYERS):
        p = f"speech_Qformer.bert.encoder.layer.{i}."
        for blk, w_in, w_out in (
            ("attention.self.query", QF_DIM, QF_DIM),
            ("attention.self.key", QF_WIDTH, QF_DIM),
            ("attention.self.value", QF_WIDTH, QF_DIM),
            ("attention.output.dense", QF_DIM, QF_DIM),
            ("crossattention.self.query", QF_DIM, QF_DIM),
            ("crossattention.self.key", QF_WIDTH, QF_DIM),
            ("crossattention.self.value", QF_WIDTH, QF_DIM),
            ("crossattention.output.dense", QF_DIM, QF_DIM),
            ("intermediate_query.dense", QF_DIM, QF_DIM * QF_MLP),
            ("output_query.dense", QF_DIM * QF_MLP, QF_DIM),
        ):
            sd[p + blk + ".weight"] = t(r.randn(w_out, w_in) * 0.02)
            sd[p + blk + ".bias"] = t(np.zeros(w_out))
        for ln in ("attention.output.LayerNorm", "crossattention.output.LayerNorm",
                   "output_query.LayerNorm"):
            sd[p + ln + ".weight"] = t(np.ones(QF_DIM))
            sd[p + ln + ".bias"] = t(np.zeros(QF_DIM))
    sd["speech_llama_proj.weight"] = t(r.randn(DIM, QF_DIM) * 0.02)
    sd["speech_llama_proj.bias"] = t(np.zeros(DIM))
    # PEFT LoRA, q/v, with the `.default.` infix trap (custom_salmon.py:190-192)
    for i in range(N_LAYERS):
        for proj in ("q_proj", "v_proj"):
            base = (f"llama_model.base_model.model.model.layers.{i}."
                    f"self_attn.{proj}")
            sd[base + ".lora_A.default.weight"] = t(r.randn(LORA_RANK, DIM) * 0.02)
            sd[base + ".lora_B.default.weight"] = t(np.zeros((DIM, LORA_RANK)))
    torch.save({"ckpt": sd}, os.path.join(root, "salmonn_v1.pth"))
    print(f"salmonn_v1.pth written ({len(sd)} tensors)", flush=True)


def _run_convert(args_list, rss_cap_gb=None):
    """Run cli.convert in a child; return its ru_maxrss in GB."""
    code = (
        "import json, threading, time\n"
        "peak = [0.0]\n"
        "def _sample():\n"
        "    while True:\n"
        "        with open('/proc/self/status') as f:\n"
        "            for line in f:\n"
        "                if line.startswith('RssAnon:'):\n"
        "                    peak[0] = max(peak[0], int(line.split()[1]) / 1e6)\n"
        "        time.sleep(0.05)\n"
        "threading.Thread(target=_sample, daemon=True).start()\n"
        "from icl_speech_text_llm_tpu.cli.convert import main\n"
        f"main({args_list!r})\n"
        "print(json.dumps({'maxrss_gb': peak[0]}))\n"
    )
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO,
                          env={**os.environ, "JAX_PLATFORMS": "cpu"})
    sys.stdout.write(proc.stdout)
    assert proc.returncode == 0, proc.stderr[-3000:]
    rss = json.loads(proc.stdout.strip().splitlines()[-1])["maxrss_gb"]
    print(f"convert {args_list[:2]}... done in {time.time() - t0:.0f}s, "
          f"maxrss {rss:.2f} GB", flush=True)
    if rss_cap_gb is not None:
        assert rss < rss_cap_gb, (
            f"convert RSS {rss:.2f} GB exceeds the ~one-layer cap {rss_cap_gb} GB")
    return rss


def convert(root: str) -> dict:
    rss_dec = _run_convert([
        "--src", os.path.join(root, "hf-vicuna-13b"),
        "--dst", os.path.join(root, "out-decoder-int4"),
        "--model_type", "vicuna-13b", "--quantize_int4",
    ], rss_cap_gb=MAX_CONVERT_RSS_GB)
    rss_sal = _run_convert([
        "--src", os.path.join(root, "salmonn_v1.pth"),
        "--dst", os.path.join(root, "out-salmonn"),
        "--model_type", "vicuna-13b", "--component", "salmonn",
    ])
    return {"decoder_maxrss_gb": rss_dec, "salmonn_maxrss_gb": rss_sal}


def generate(root: str) -> dict:
    """Load the int4 dir + adapter and greedy-decode from a random prompt."""
    import jax
    import jax.numpy as jnp

    from icl_speech_text_llm_tpu.inference.engine import (
        GenerationConfig, decode_from_sequence)
    from icl_speech_text_llm_tpu.models.llama import DECODER_CONFIGS
    from icl_speech_text_llm_tpu.models.stream_convert import load_params_dir

    cfg = DECODER_CONFIGS["vicuna-13b"]
    params = load_params_dir(os.path.join(root, "out-decoder-int4"))
    adapter = load_params_dir(os.path.join(root, "out-salmonn"))
    assert "lora" in adapter and "qformer" in adapter, sorted(adapter)
    assert adapter["lora"]["wq"]["a"].shape == (N_LAYERS, DIM, LORA_RANK)
    assert adapter["qformer"]["proj"]["w"].shape == (QF_DIM, DIM)

    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randn(1, 32, DIM).astype(np.float32) * 0.1,
                      jnp.bfloat16)
    lengths = jnp.array([32], jnp.int32)
    t0 = time.time()
    toks = decode_from_sequence(
        cfg, params, seq, lengths, GenerationConfig(max_new_tokens=4),
        lora=adapter["lora"], lora_scaling=32.0 / LORA_RANK, dt=jnp.bfloat16)
    toks = np.asarray(toks)
    dt = time.time() - t0
    assert toks.shape == (1, 4) and (toks >= 0).all() and (toks < VOCAB).all()
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"generation ok on {jax.devices()[0].platform}: tokens {toks.tolist()} "
          f"in {dt:.0f}s, host maxrss {rss:.2f} GB", flush=True)
    return {"tokens": toks.tolist(), "gen_platform": jax.devices()[0].platform,
            "gen_host_maxrss_gb": rss}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["synth", "convert", "generate", "all"])
    ap.add_argument("--root", default="/tmp/ckpt13b")
    a = ap.parse_args()
    os.makedirs(a.root, exist_ok=True)
    out = {}
    if a.phase in ("synth", "all"):
        synth_decoder(a.root)
        synth_salmonn(a.root)
    if a.phase in ("convert", "all"):
        out.update(convert(a.root))
    if a.phase in ("generate", "all"):
        out.update(generate(a.root))
    print("CONVERT13B " + json.dumps(out))


if __name__ == "__main__":
    main()
