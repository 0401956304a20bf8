"""Benchmark harness: utterances/sec for k=5 ICL inference (VoxCeleb-style).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against the first recorded run of this harness (stored in BENCH_BASELINE.json
once measured on TPU); until then it is null.

Runs on whatever accelerator JAX offers (the real TPU chip under the driver;
CPU with BENCH_CPU=1 for smoke). Model: the fixed "salmonn-bench" topology —
full component stack with a head_dim-128 bf16 LLM (Pallas flash-attention
prefill), comparable across rounds. BENCH_MODEL=tiny selects the CPU-fast
tiny config.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

K_SHOTS = 5
BATCH = 4
ROUNDS = 5


def main():
    import jax

    if os.environ.get("BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
    from icl_speech_text_llm_tpu.data.packing import PackConfig
    from icl_speech_text_llm_tpu.data.prompts import build_default_prompt
    from icl_speech_text_llm_tpu.inference.engine import GenerationConfig, salmonn_generate
    from icl_speech_text_llm_tpu.models.salmonn import (
        init_salmonn,
        salmonn_bench,
        salmonn_tiny,
    )
    from icl_speech_text_llm_tpu.registry import DatasetType, get_dataset_config
    from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

    model_name = os.environ.get("BENCH_MODEL", "salmonn-bench")
    cfg = salmonn_tiny() if model_name == "tiny" else salmonn_bench()
    if model_name == "tiny":
        model_name = "salmonn-tiny"
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    task = get_dataset_config(DatasetType.VOXCELEB)
    pack_cfg = PackConfig(
        seq_len=1536, text_len=768, max_slots=K_SHOTS + 1,
        audio_tokens_per_slot=cfg.audio_tokens_per_slot,
    )

    rng = np.random.RandomState(0)
    samples = []
    for i in range(BATCH):
        examples = [
            {"text": f"few shot exemplar number {j}", "label": ["positive", "negative", "neutral"][j % 3]}
            for j in range(K_SHOTS)
        ]
        plan = build_default_prompt(
            task.prompt_template, f"utterance {i}", examples,
            input_mode="speech_only", fewshot_mode="speech",
        )
        slot_audio = {s: rng.randn(16000 * 5).astype(np.float32) * 0.05 for s in plan.slots}
        samples.append(ICLSample(plan=plan, completion="positive", slot_audio=slot_audio))

    import jax.numpy as jnp

    batch_h = collate_icl_batch(samples, tok, pack_cfg)
    dev = {
        "text_tokens": jnp.asarray(batch_h.text_tokens),
        "gather_idx": jnp.asarray(batch_h.gather_idx),
        "seq_lengths": jnp.asarray(batch_h.seq_lengths),
        "wavs": jnp.asarray(batch_h.audio["wavs"]),
    }
    gen = GenerationConfig(max_new_tokens=10, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    fn = jax.jit(lambda p, b: salmonn_generate(cfg, gen, p, b))

    # compile + warmup; np.asarray forces a device→host sync (on this box the
    # tunneled backend's block_until_ready returns before execution finishes)
    np.asarray(fn(params, dev))

    # latency: serial round trips (one sync per batch)
    times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        np.asarray(fn(params, dev))
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))

    # throughput (headline): pipelined dispatch — enqueue N batches, sync the
    # last. Device execution is in-order, so the final sync bounds all N;
    # this is how a deployment drives the chip (dispatch runs ahead of the
    # device) and amortizes the per-call host RPC floor.
    n_pipe = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(n_pipe):
        out = fn(params, dev)
    np.asarray(out)
    pipe_dt = time.perf_counter() - t0
    utts_per_sec = BATCH * n_pipe / pipe_dt

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        # only compare like-for-like model configs
        if base.get("value") and base.get("model") == model_name:
            vs_baseline = round(utts_per_sec / base["value"], 3)

    print(json.dumps({
        "metric": f"utterances/sec, {model_name} k={K_SHOTS} ICL inference (VoxCeleb, batch={BATCH}, 10 new tokens)",
        "value": round(utts_per_sec, 3),
        "unit": "utt/s",
        "vs_baseline": vs_baseline,
        "p50_batch_latency_s": round(p50, 4),
        "model": model_name,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
