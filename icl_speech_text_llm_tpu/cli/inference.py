"""Inference CLI — flag surface mirrors the reference
(ref: inference/inference.py:31-93).

Hermetic example (no SLUE data needed):
    python -m icl_speech_text_llm_tpu.cli.inference \
        --dataset_type voxceleb --input_mode speech_only --fewshot_mode text \
        --num_examples 2 --model_type salmonn-tiny --synthetic \
        --max_samples 8 --batch_size 4 --results_dir /tmp/out
"""

from __future__ import annotations

import argparse
import os
import logging

from ..data.factory import create_dataset
from ..data.packing import PackConfig
from ..inference.engine import GenerationConfig
from ..inference.runner import InferenceSettings, run_inference, save_final_results
from ..models.factory import create_model, get_model_from_checkpoint
from ..registry import DatasetSplit, parse_dataset_types
from ..utils.tokenization import get_tokenizer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batched ICL inference (TPU-native)")
    # reference flag surface (inference/inference.py:31-93)
    p.add_argument("--dataset_type", type=str, default="voxceleb",
                   help="dataset name(s), '-' or ',' separated")
    p.add_argument("--input_mode", type=str, default="speech_only",
                   choices=["speech_only", "speech_and_text", "text_only"])
    p.add_argument("--fewshot_mode", type=str, default="text",
                   choices=["text", "speech", "none"])
    p.add_argument("--num_examples", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--debug_samples", type=int, default=None,
                   help="alias of --max_samples (reference smoke flag)")
    p.add_argument("--split", type=str, default="test",
                   choices=["train", "validation", "test"])
    p.add_argument("--model_type", type=str, default="salmonn-tiny")
    p.add_argument("--peft_model_path", type=str, default=None,
                   help="trainable-only checkpoint dir to restore")
    p.add_argument("--llm_params_dir", type=str, default=None,
                   help="converted LLM weight dir (cli/convert.py output)")
    p.add_argument("--adapter_params_dir", type=str, default=None,
                   help="converted salmonn_v1.pth adapter dir "
                        "(cli/convert.py --component salmonn output)")
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--run_name", type=str, default="run")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--max_new_tokens", type=int, default=10)
    p.add_argument("--do_sample", action="store_true")
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top_p", type=float, default=0.9)
    # HF-generate options the reference forwards (custom_salmon.py:704-720)
    p.add_argument("--num_beams", type=int, default=1)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    p.add_argument("--length_penalty", type=float, default=1.0)
    p.add_argument("--min_new_tokens", "--min_length", type=int, default=0)
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 KV cache: halves decode-phase KV HBM reads "
                        "(dequant fused into the flash-decode kernel)")
    quant = p.add_mutually_exclusive_group()
    quant.add_argument("--quantize_int8", action="store_true",
                       help="weight-only int8 LLM: halves decode weight "
                            "reads (error if llm_params_dir is already "
                            "quantized at a different width)")
    quant.add_argument("--quantize_int4", action="store_true",
                       help="weight-only group-wise int4 LLM via the Pallas "
                            "packed-tile decode kernel (13B-on-one-chip "
                            "layout)")
    p.add_argument("--randomize_swap", action="store_true")
    # packing budget (TPU-native additions)
    p.add_argument("--seq_len", type=int, default=2048)
    p.add_argument("--text_len", type=int, default=1024)
    # hermetic data
    p.add_argument("--synthetic", action="store_true",
                   help="fabricated schema-correct data instead of disk datasets")
    p.add_argument("--synthetic_size", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--compile_cache", type=str,
                   default=os.environ.get("ICL_TPU_COMPILE_CACHE"),
                   help="persistent XLA compilation cache dir: first compiles\n"
                        "(20-40 s/program on TPU) become one-time across processes")
    p.add_argument("--auto_batch", "--optimize_batch_size",
                   action="store_true",
                   help="pick the largest batch size whose COMPILED generate "
                        "program fits HBM (compiler memory analysis, no OOM "
                        "probing; the reference's --optimize_batch_size was "
                        "a stub, ref: inference/inference.py:252-256)")
    p.add_argument("--auto_batch_max", type=int, default=64,
                   help="--auto_batch search ceiling")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (e.g. 'cpu'); default: auto")
    return p


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.compile_cache:
        from ..utils.perf import enable_compilation_cache

        enable_compilation_cache(args.compile_cache)

    dataset_types = parse_dataset_types(args.dataset_type)
    max_samples = args.max_samples or args.debug_samples

    tok = get_tokenizer(args.tokenizer)
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens, do_sample=args.do_sample,
        temperature=args.temperature, top_p=args.top_p,
        eos_token_id=tok.eos_token_id, pad_token_id=tok.pad_token_id,
        num_beams=args.num_beams, repetition_penalty=args.repetition_penalty,
        length_penalty=args.length_penalty, min_new_tokens=args.min_new_tokens,
        kv_int8=args.kv_int8,
    )
    n_slots = {
        "speech": args.num_examples + 1,
        "text": 1,
        "none": 1,
    }[args.fewshot_mode]
    if any(dt.value == "sqa" for dt in dataset_types):
        n_slots = 2 * (args.num_examples if args.fewshot_mode == "speech" else 0) + 2

    if args.peft_model_path:
        model = get_model_from_checkpoint(
            args.peft_model_path, args.model_type, tokenizer=args.tokenizer,
            seed=args.seed, generation=gen, llm_params_dir=args.llm_params_dir,
            adapter_params_dir=args.adapter_params_dir,
        )
    else:
        model = create_model(args.model_type, tokenizer=args.tokenizer,
                             seed=args.seed, generation=gen,
                             llm_params_dir=args.llm_params_dir,
                             adapter_params_dir=args.adapter_params_dir)
    if args.quantize_int8 or args.quantize_int4:
        llm = model.params["llm"]
        if isinstance(llm["layers"]["attn"]["wq"], dict):
            # pre-quantized checkpoint: int4 stores packed nibbles under
            # "q4", int8 stores bytes under "q" (ops/quant.py) — a width
            # mismatch silently running the wrong layout (e.g. int8 13B,
            # which OOMs one chip) must be a hard error, not an info log
            have = 4 if "q4" in llm["layers"]["attn"]["wq"] else 8
            want = 4 if args.quantize_int4 else 8
            if have != want:
                raise SystemExit(
                    f"--quantize_int{want} requested but llm_params_dir is "
                    f"already int{have}-quantized; re-convert the checkpoint "
                    f"(cli/convert.py) or drop the flag")
            logging.info("LLM weights arrived pre-quantized at the "
                         "requested int%d width; skipping runtime "
                         "quantization", want)
        else:
            from ..ops.quant import quantize_decoder

            model.params["llm"] = quantize_decoder(
                llm, bits=4 if args.quantize_int4 else 8)
    pack_cfg = PackConfig(
        seq_len=args.seq_len, text_len=args.text_len, max_slots=n_slots,
        audio_tokens_per_slot=model.cfg.audio_tokens_per_slot,
        audio_len_fn=getattr(model.cfg, "audio_len_fn", None),
    )

    dataset = create_dataset(
        dataset_types if len(dataset_types) > 1 else dataset_types[0],
        split=DatasetSplit(args.split),
        input_mode=args.input_mode,
        fewshot_mode=args.fewshot_mode,
        num_examples=0 if args.fewshot_mode == "none" else args.num_examples,
        randomize_swap=args.randomize_swap,
        is_training=False,
        max_samples=max_samples,
        synthetic=args.synthetic,
        synthetic_size=args.synthetic_size,
        seed=args.seed,
        prompt_style="qwen" if args.model_type.lower().startswith("qwen") else "salmonn",
    )

    if args.auto_batch:
        import functools

        import jax
        import jax.numpy as jnp

        from ..data.collate import collate_icl_batch
        from ..inference.engine import salmonn_generate
        from ..utils.memory import BatchSizeOptimizer, tile_batch

        pb = collate_icl_batch([dataset[0]], model.tokenizer, pack_cfg)
        probe = {
            "text_tokens": pb.text_tokens,
            "gather_idx": pb.gather_idx,
            "seq_lengths": pb.seq_lengths,
            **pb.audio,
        }
        fn = functools.partial(salmonn_generate, model.cfg, model.engine.gen)
        sizer = BatchSizeOptimizer(
            fn,
            lambda bs: (model.params,
                        jax.tree_util.tree_map(jnp.asarray, tile_batch(probe, bs))),
            max_batch=args.auto_batch_max)
        picked = sizer.find_optimal_batch_size(start=1)
        if picked and picked != args.batch_size:
            logging.info("--auto_batch: batch_size %d → %d (largest whose "
                         "compiled generate fits HBM)", args.batch_size, picked)
            args.batch_size = picked

    settings = InferenceSettings(
        batch_size=args.batch_size,
        max_new_tokens=args.max_new_tokens,
        results_dir=args.results_dir,
        run_name=args.run_name,
        input_mode=args.input_mode,
        fewshot_mode=args.fewshot_mode,
        num_examples=args.num_examples,
        max_samples=max_samples,
    )
    payload = run_inference(model.engine, dataset, pack_cfg, settings)
    paths = save_final_results(payload, dataset_types, settings)
    print(paths["metrics"])
    return paths


if __name__ == "__main__":
    main()
