"""Training CLI — flag surface mirrors the reference (ref: train/train.py:31-106).

Hermetic example:
    python -m icl_speech_text_llm_tpu.cli.train \
        --dataset_type voxceleb --model_type salmonn-tiny --synthetic \
        --num_epochs 1 --batch_size 2 --max_samples 8 --output_dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import os
import logging
import random
import re

import numpy as np

from ..data.factory import create_dataset
from ..data.packing import PackConfig
from ..models.factory import create_model
from ..registry import DatasetSplit, parse_dataset_types
from ..training.loop import TrainSettings, train
from ..training.schedulers import get_schedule
from ..training.step import (
    OptimizerSettings,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LoRA fine-tuning (TPU-native)")
    # reference flags (train/train.py:31-106)
    p.add_argument("--dataset_type", type=str, default="voxceleb")
    p.add_argument("--input_mode", type=str, default="speech_only",
                   choices=["speech_only", "speech_and_text", "text_only"])
    p.add_argument("--fewshot_mode", type=str, default="text",
                   choices=["text", "speech", "none"])
    p.add_argument("--num_examples", type=int, default=5)
    p.add_argument("--model_type", type=str, default="salmonn-tiny")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_epochs", type=int, default=3)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--scheduler", type=str, default="linear",
                   choices=["linear", "cosine", "cosine_with_restarts", "polynomial",
                            "constant", "constant_with_warmup", "inverse_sqrt",
                            "per_epoch_warmup_restart"])
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--gradient_checkpointing_policy", type=str, default="full",
                   help="'full' remats whole layers; 'dots' saves weight-"
                        "matmul outputs and recomputes only attention dots "
                        "and elementwise ops (needs the saved activations "
                        "to fit — OOMs at 7B on one 16 GB chip); '1inK' "
                        "(e.g. 1in4) checkpoints K-1 of every K layers and "
                        "leaves the K-th plain: backward recompute drops "
                        "1/K for a bounded activation-memory increase")
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--output_dir", type=str, default="checkpoints")
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--val_split", type=str, default="validation",
                   choices=["train", "validation", "test"])
    p.add_argument("--val_max_samples", type=int, default=200)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--debug_samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    # proper booleans (the reference's type=bool was a footgun — SURVEY.md §8.12)
    p.add_argument("--balance_datasets", action="store_true", default=True)
    p.add_argument("--no_balance_datasets", dest="balance_datasets", action="store_false")
    p.add_argument("--interleave", action="store_true", default=True)
    p.add_argument("--no_interleave", dest="interleave", action="store_false")
    p.add_argument("--randomize_swap", action="store_true")
    # TPU-native additions
    p.add_argument("--mesh", type=str, default=None,
                   help="parallelism mesh 'dp,fsdp,tp[,pp]' (sizes multiply "
                        "to the device count), e.g. 4,2,1 or 2,1,1,2; "
                        "pp>1 GPipe-schedules the decoder")
    p.add_argument("--pp_microbatches", type=int, default=2,
                   help="microbatches per pipeline tick (pp>1); batch_size "
                        "must be divisible by it")
    p.add_argument("--seq_len", type=int, default=2048)
    p.add_argument("--text_len", type=int, default=1024)
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_size", type=int, default=16)
    p.add_argument("--compile_cache", type=str,
                   default=os.environ.get("ICL_TPU_COMPILE_CACHE"),
                   help="persistent XLA compilation cache dir: first compiles\n"
                        "(20-40 s/program on TPU) become one-time across processes")
    p.add_argument("--auto_batch", action="store_true",
                   help="pick the largest batch size whose COMPILED train "
                        "step fits HBM (compiler memory analysis at the "
                        "bucketed shapes — no OOM probing; the reference's "
                        "--optimize_batch_size was a stub, "
                        "ref: inference/inference.py:252-256)")
    p.add_argument("--auto_batch_max", type=int, default=64,
                   help="--auto_batch search ceiling")
    p.add_argument("--platform", type=str, default=None)
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
    random.seed(args.seed)
    np.random.seed(args.seed)

    dataset_types = parse_dataset_types(args.dataset_type)
    max_samples = args.max_samples or args.debug_samples

    model = create_model(args.model_type, tokenizer=args.tokenizer, seed=args.seed)

    mesh = pipeline = None
    if args.mesh:
        from ..parallel import make_mesh
        from ..parallel.sharding import shard_params

        sizes = [int(x) for x in args.mesh.split(",")]
        dp, fsdp, tp = (sizes + [1, 1, 1])[:3]
        pp = sizes[3] if len(sizes) > 3 else 1
        mesh = make_mesh(dp=dp, fsdp=fsdp, tp=tp, pp=pp)
        model.params = shard_params(model.params, mesh)
        if pp > 1:
            pipeline = (mesh, args.pp_microbatches)

    n_slots = args.num_examples + 1 if args.fewshot_mode == "speech" else 1
    pack_cfg = PackConfig(
        seq_len=args.seq_len, text_len=args.text_len, max_slots=n_slots,
        audio_tokens_per_slot=model.cfg.audio_tokens_per_slot,
        audio_len_fn=getattr(model.cfg, "audio_len_fn", None),
    )

    common = dict(
        input_mode=args.input_mode,
        fewshot_mode=args.fewshot_mode,
        num_examples=0 if args.fewshot_mode == "none" else args.num_examples,
        randomize_swap=args.randomize_swap,
        max_samples=max_samples,
        synthetic=args.synthetic,
        synthetic_size=args.synthetic_size,
        seed=args.seed,
        prompt_style="qwen" if args.model_type.lower().startswith("qwen") else "salmonn",
    )
    train_ds = create_dataset(
        dataset_types if len(dataset_types) > 1 else dataset_types[0],
        split=DatasetSplit.TRAIN, is_training=True,
        balance_datasets=args.balance_datasets, interleave=args.interleave, **common,
    )
    val_ds = create_dataset(
        dataset_types if len(dataset_types) > 1 else dataset_types[0],
        split=DatasetSplit(args.val_split), is_training=False, **common,
    )

    if args.model_type.lower().startswith("qwen"):
        from ..models.qwen_audio import qwen_audio_train_loss as loss_fn
    else:
        from ..models.salmonn import salmonn_train_loss as loss_fn

    def _build(batch_size):
        steps_per_epoch = max(1, len(train_ds) // batch_size)
        total_steps = steps_per_epoch * args.num_epochs
        schedule = get_schedule(args.scheduler, args.learning_rate,
                                args.warmup_steps, total_steps, steps_per_epoch)
        opt = OptimizerSettings(
            learning_rate=args.learning_rate, weight_decay=args.weight_decay,
            max_grad_norm=args.max_grad_norm,
            grad_accum_steps=args.gradient_accumulation_steps, schedule=schedule,
        )
        optimizer = make_optimizer(opt)
        state, frozen = init_train_state(model.params, optimizer)
        remat = False
        if args.gradient_checkpointing:
            pol = args.gradient_checkpointing_policy
            if pol != "full" and pol != "dots" and not re.fullmatch(
                    r"1in\d+", pol):
                raise SystemExit(
                    f"--gradient_checkpointing_policy: invalid value {pol!r} "
                    "(expected 'full', 'dots', or '1inK' e.g. '1in4')")
            remat = True if pol == "full" else pol
        step_fn = make_train_step(model.cfg, optimizer, loss_fn=loss_fn,
                                  remat=remat,
                                  pipeline=pipeline)
        return state, frozen, step_fn

    state, frozen, step_fn = _build(args.batch_size)
    if args.auto_batch:
        from ..data.collate import collate_icl_batch
        from ..training.loop import _device_batch
        from ..utils.memory import BatchSizeOptimizer, tile_batch

        probe = _device_batch(
            collate_icl_batch([train_ds[0]], model.tokenizer, pack_cfg))
        sizer = BatchSizeOptimizer(
            step_fn, lambda bs: (state, frozen, tile_batch(probe, bs)),
            max_batch=args.auto_batch_max)
        picked = sizer.find_optimal_batch_size(start=1)
        if picked and picked != args.batch_size:
            logging.info("--auto_batch: batch_size %d → %d (largest whose "
                         "compiled step fits HBM)", args.batch_size, picked)
            args.batch_size = picked
            state, frozen, step_fn = _build(picked)

    settings = TrainSettings(
        num_epochs=args.num_epochs, batch_size=args.batch_size,
        save_every=args.save_every, output_dir=args.output_dir,
        val_max_samples=args.val_max_samples,
        resume_from=args.resume_from_checkpoint,
        val_batch_size=args.batch_size,
    )
    metadata = {"dataset_type": args.dataset_type, "model_type": args.model_type,
                "input_mode": args.input_mode, "fewshot_mode": args.fewshot_mode,
                "num_examples": args.num_examples}
    state = train(model, state, frozen, step_fn, train_ds, pack_cfg, settings,
                  val_dataset=val_ds, dataset_types=dataset_types,
                  metadata=metadata, mesh=mesh)
    print(f"done: {int(state.step)} steps")
    return state


if __name__ == "__main__":
    main()
