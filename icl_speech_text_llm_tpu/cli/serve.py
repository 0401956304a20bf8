"""Continuous-batching serving demo CLI.

Streams dataset samples as individual requests through the slot-pool engine
(`inference/serving.py`) instead of static batches — the serving-scale decode
path the reference lacks (its inference loop is whole-dataset batching,
ref: inference/inference.py:303-380).

Hermetic example:
    python -m icl_speech_text_llm_tpu.cli.serve \
        --model_type salmonn-tiny --dataset_type voxceleb --synthetic \
        --max_samples 8 --num_slots 4 --platform cpu
"""

from __future__ import annotations

import argparse
import os
import json
import logging
import time
from functools import partial

import jax
import numpy as np

from ..data.collate import collate_icl_batch
from ..data.factory import create_dataset
from ..data.packing import PackConfig
from ..inference.serving import (
    ContinuousBatchingEngine,
    ServingConfig,
    qwen_prompt_embeddings,
    salmonn_prompt_embeddings,
)
from ..models.factory import create_model
from ..registry import DatasetSplit, parse_dataset_types
from ..utils.tokenization import get_tokenizer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Slot-pool continuous-batching serving demo")
    p.add_argument("--model_type", type=str, default="salmonn-tiny",
                   help="SALMONN- or Qwen2-Audio-family preset")
    p.add_argument("--dataset_type", type=str, default="voxceleb")
    p.add_argument("--split", type=str, default="test",
                   choices=["train", "validation", "test"])
    p.add_argument("--input_mode", type=str, default="speech_only")
    p.add_argument("--fewshot_mode", type=str, default="text")
    p.add_argument("--num_examples", type=int, default=1)
    p.add_argument("--max_samples", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--num_slots", type=int, default=4)
    p.add_argument("--sync_every", type=int, default=4,
                   help="decode steps fused per dispatch (lax.scan block); "
                        "set ~max_new_tokens-1 to reach one decode dispatch "
                        "per slot generation")
    p.add_argument("--prompt_buckets", type=str, default="256,512",
                   help="comma-separated prompt-length buckets")
    p.add_argument("--seq_len", type=int, default=512)
    p.add_argument("--text_len", type=int, default=384)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="per-request sampling temperature (0 = greedy)")
    p.add_argument("--num_beams", type=int, default=1,
                   help="per-request beam width; >1 routes requests through "
                        "the engine's beam lane (batched whole-beam-search "
                        "dispatches — ref models/multi_task_model.py:130-149 "
                        "carries per-task num_beams)")
    p.add_argument("--admit_batch", type=int, default=4,
                   help="requests encoded together per admission wave (audio "
                        "encoding amortizes across the wave)")
    p.add_argument("--warmup", type=int, default=0,
                   help="requests to run untimed first (compile warmup) so the "
                        "throughput summary reflects steady state")
    p.add_argument("--quantize_int8", action="store_true",
                   help="weight-only int8 LLM decode (halves weight HBM reads)")
    p.add_argument("--quantize_int4", action="store_true",
                   help="weight-only group-128 int4 LLM decode (quarters "
                        "weight HBM reads; fits Vicuna-13B + encoders + KV "
                        "on a single 16 GB v5e chip)")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV cache (+per-position scales): halves the "
                        "decode-phase KV read and the pooled cache's HBM "
                        "footprint; dequant fuses into the flash-decode kernel")
    p.add_argument("--llm_params_dir", type=str, default=None,
                   help="converted LLM weight dir (cli/convert.py output — "
                        "plain, int8, or int4; pre-quantized dirs skip "
                        "runtime quantization)")
    p.add_argument("--adapter_params_dir", type=str, default=None,
                   help="converted salmonn_v1.pth adapter dir "
                        "(cli/convert.py --component salmonn output)")
    p.add_argument("--lora_bank", type=str, default=None,
                   help="comma-separated trainable-checkpoint dirs: their "
                        "'lora' subtrees stack into a multi-adapter bank "
                        "(training/checkpoint.load_lora_bank) and requests "
                        "cycle adapter_id over them — one engine, per-request "
                        "adapters (the reference's per-task artifacts)")
    p.add_argument("--mesh", type=str, default=None,
                   help="serving mesh 'dp,fsdp,tp' (sizes must multiply to "
                        "the device count): tp-sharded decode over the pod — "
                        "params megatron-sharded, pooled KV sharded by head")
    p.add_argument("--chunk_len", type=int, default=0,
                   help="chunked prefill: admit prompts as fixed-size chunk "
                        "dispatches with decode blocks interleaved between "
                        "chunks, so a long admission stalls in-flight slots "
                        "for one chunk instead of a whole bucket prefill "
                        "(must divide every prompt bucket; 0 = off)")
    p.add_argument("--shared_prefix", action="store_true",
                   help="pinned-fewshot serving: register the FIRST sample's "
                        "ICL header (template + exemplar block) once via the "
                        "engine's prefix cache, then prefill only each "
                        "request's query suffix — admission drops from "
                        "O(header+query) prefill FLOPs to O(query) + one HBM "
                        "copy (every request reuses the pinned exemplar set)")
    p.add_argument("--prefix_buckets", type=str, default="512",
                   help="comma-separated prefix-length buckets (with "
                        "--shared_prefix)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--compile_cache", type=str,
                   default=os.environ.get("ICL_TPU_COMPILE_CACHE"),
                   help="persistent XLA compilation cache dir: first compiles\n"
                        "(20-40 s/program on TPU) become one-time across processes")
    p.add_argument("--platform", type=str, default=None)
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        from ..utils.perf import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)
    is_qwen = args.model_type.lower().startswith("qwen")
    if args.shared_prefix and args.num_beams > 1:
        raise SystemExit("--shared_prefix is slot-pool only (the beam lane "
                         "prefills its full prompt); drop --num_beams")
    if args.shared_prefix and args.lora_bank:
        raise SystemExit("--shared_prefix + --lora_bank: the demo registers "
                         "one prefix (prefix KV is per-adapter); register "
                         "per-adapter prefixes via the engine API instead")

    tok = get_tokenizer(None)
    model = create_model(args.model_type, seed=args.seed,
                         llm_params_dir=args.llm_params_dir,
                         adapter_params_dir=args.adapter_params_dir)
    dataset_types = parse_dataset_types(args.dataset_type)
    dataset = create_dataset(
        dataset_types[0], split=DatasetSplit(args.split),
        input_mode=args.input_mode, fewshot_mode=args.fewshot_mode,
        num_examples=args.num_examples, is_training=False,
        max_samples=args.max_samples, synthetic=args.synthetic,
        synthetic_size=args.synthetic_size, seed=args.seed,
        prompt_style="qwen" if is_qwen else "salmonn",
    )
    buckets = tuple(int(b) for b in args.prompt_buckets.split(","))
    pack_cfg = PackConfig(
        seq_len=args.seq_len, text_len=args.text_len,
        max_slots=args.num_examples + 1 if args.fewshot_mode == "speech" else 1,
        audio_tokens_per_slot=model.cfg.audio_tokens_per_slot,
        audio_len_fn=getattr(model.cfg, "audio_len_fn", None),
    )
    scfg = ServingConfig(
        num_slots=args.num_slots, max_new_tokens=args.max_new_tokens,
        prompt_buckets=buckets, sync_every=args.sync_every,
        admit_batch=args.admit_batch,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
        kv_int8=args.kv_int8,
        prefix_buckets=tuple(int(b) for b in args.prefix_buckets.split(","))
        if args.shared_prefix else (),
        chunk_len=args.chunk_len,
    )
    mesh = None
    if args.mesh:
        from ..parallel import make_mesh
        from ..parallel.sharding import shard_params

        sizes = [int(x) for x in args.mesh.split(",")]
        if len(sizes) != 3:
            raise SystemExit(
                f"--mesh wants exactly 'dp,fsdp,tp' (got {args.mesh!r})")
        dp, fsdp, tp = sizes
        if model.cfg.llm.n_kv_heads % max(tp, 1) != 0:
            raise SystemExit(
                f"tp={tp} must divide n_kv_heads={model.cfg.llm.n_kv_heads} "
                f"for the KV-head-sharded pool")
        mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp)
        model.params = shard_params(model.params, mesh)
    llm_params = model.params["llm"]
    already_quantized = isinstance(llm_params["layers"]["attn"]["wq"], dict)
    if (args.quantize_int8 or args.quantize_int4) and not already_quantized:
        from ..ops.quant import quantize_decoder

        # on a sharded tree the scales/int8 outputs inherit the sharding
        llm_params = quantize_decoder(
            llm_params, bits=4 if args.quantize_int4 else 8)
    elif already_quantized:
        logging.info("LLM weights arrived pre-quantized (converted dir); "
                     "skipping runtime quantization")
    lora = model.params.get("lora")
    n_adapters = 0
    if args.lora_bank:
        from ..training.checkpoint import load_lora_bank

        dirs = args.lora_bank.split(",")
        lora = load_lora_bank(dirs)
        n_adapters = len(dirs)
        logging.info("multi-LoRA bank: %d adapters from %s", n_adapters, dirs)
    engine = ContinuousBatchingEngine(
        model.cfg.llm, llm_params, scfg,
        lora=lora,
        lora_scaling=model.cfg.lora.scaling if model.cfg.lora is not None else 1.0,
        mesh=mesh,
    )
    embed = qwen_prompt_embeddings if is_qwen else salmonn_prompt_embeddings
    # params must be an ARGUMENT, not a closure constant — baked-in weights
    # bloat the compiled program (and break remote-compile payload limits)
    embed_jit = jax.jit(partial(embed, model.cfg))
    embed_fn = lambda batch: embed_jit(model.params, batch)

    n = min(len(dataset), args.max_samples)

    def _collate_to_batch(samples, cfg_pack):
        packed = collate_icl_batch(samples, tok, cfg_pack)
        return {
            "text_tokens": np.asarray(packed.text_tokens),
            "gather_idx": np.asarray(packed.gather_idx),
            "seq_lengths": np.asarray(packed.seq_lengths),
            **{k: np.asarray(v) for k, v in packed.audio.items()},
        }

    prefix_id = None
    if args.shared_prefix:
        # pinned-fewshot mode: every request reuses the FIRST sample's
        # exemplar block — registered once, its KV copied per admission
        from ..data.collate import ICLSample
        from ..data.prompts import split_prompt_plan

        s0 = dataset[0]
        pre_plan, _ = split_prompt_plan(s0.plan)
        pre_sample = ICLSample(
            plan=pre_plan, completion="",
            slot_audio={k: v for k, v in s0.slot_audio.items()
                        if k in pre_plan.slots},
            extras=s0.extras)
        pre_pack = PackConfig(
            seq_len=args.seq_len, text_len=args.text_len,
            max_slots=max(1, len(pre_plan.slots)),
            audio_tokens_per_slot=model.cfg.audio_tokens_per_slot,
            audio_len_fn=getattr(model.cfg, "audio_len_fn", None),
        )
        pre_batch = _collate_to_batch([pre_sample], pre_pack)
        pre_seq, _ = embed_fn(pre_batch)
        pre_len = int(pre_batch["seq_lengths"][0])
        prefix_id = engine.register_prefix(pre_seq[0, :pre_len], pre_len)
        logging.info("registered shared prefix: %d positions (%d exemplar "
                     "audio slots)", pre_len, len(pre_plan.slots))

    def submit_group(samples):
        """One batched collate+encode for a wave of requests.

        Audio encoding dominates ICL admission cost; batching it across a
        wave amortizes the encoder pass exactly like the static engine does.
        The wave pads to --admit_batch (repeating the last sample) so there
        is ONE compiled embed program; padded rows are simply not submitted.
        """
        wave = list(samples)
        real = len(wave)
        while len(wave) < args.admit_batch:
            wave.append(wave[-1])
        cfg_pack = pack_cfg
        if prefix_id is not None:
            # submit only each request's query suffix; the pinned exemplar
            # header decodes from the registered prefix KV
            from ..data.collate import ICLSample
            from ..data.prompts import split_prompt_plan

            def _suffix(s):
                _, suf = split_prompt_plan(s.plan)
                return ICLSample(
                    plan=suf, completion=s.completion,
                    slot_audio={k: v for k, v in s.slot_audio.items()
                                if k in suf.slots},
                    extras=s.extras)

            wave = [_suffix(s) for s in wave]
            cfg_pack = PackConfig(
                seq_len=args.seq_len, text_len=args.text_len, max_slots=1,
                audio_tokens_per_slot=model.cfg.audio_tokens_per_slot,
                audio_len_fn=getattr(model.cfg, "audio_len_fn", None),
            )
        batch = _collate_to_batch(wave, cfg_pack)
        seq, _ = embed_fn(batch)
        # lengths come straight from the host-side packed batch — syncing the
        # jit output here would serialize every admission wave on the device
        lengths = batch["seq_lengths"]
        rids = []
        for r in range(real):
            length = int(lengths[r])
            rids.append(engine.submit(
                seq[r, :length], length,
                temperature=args.temperature,
                num_beams=args.num_beams,
                prefix_id=prefix_id,
                # demo routing: requests cycle over the bank's adapters
                adapter_id=(engine._next_id % n_adapters) if n_adapters else 0))
        return rids

    if args.warmup:
        # warmup waves must be admit_batch-sized — the embed program is
        # compiled per wave batch size, and a bigger warmup group would leave
        # the steady-state program to compile inside the timed section
        k = min(args.warmup, len(dataset))
        for start in range(0, k, args.admit_batch):
            submit_group([dataset[(start + w) % len(dataset)]
                          for w in range(args.admit_batch)])
        engine.run()  # drain untimed — compiles prefill/decode/embed programs

    t0 = time.perf_counter()
    rid_to_sample = {}
    for start in range(0, n, args.admit_batch):
        group = [dataset[i] for i in range(start, min(start + args.admit_batch, n))]
        for rid, sample in zip(submit_group(group), group):
            rid_to_sample[rid] = sample
        engine.step()  # overlap decode with admission, serving-style

    results = engine.run()
    elapsed = time.perf_counter() - t0

    for rid in sorted(results):
        text = tok.decode(results[rid], skip_special_tokens=True)
        print(f"[req {rid}] label={rid_to_sample[rid].completion!r} -> {text!r}")
    print(json.dumps({
        "requests": n, "elapsed_s": round(elapsed, 3),
        "throughput_req_s": round(n / elapsed, 3),
        "slots": args.num_slots, "buckets": list(buckets),
    }))
    return results


if __name__ == "__main__":
    main()
