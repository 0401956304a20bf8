"""Symbol-adapter inference CLI
(ref: models/symbolAdapter/orchestrator_inference.py, models/unified_inference.py).

Loads a symbol-training checkpoint (embedded config + symbol mappings), runs
the 3-mode comprehensive validation in inference mode, writes detailed JSON.
"""

from __future__ import annotations

import argparse
import os
import logging

from ..symbol_adapter import InferenceOrchestrator, TrainingConfig


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(description="Symbol-adapter inference")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--dataset_type", type=str, default=None)
    p.add_argument("--val_dataset_type", type=str, default=None)
    p.add_argument("--model_type", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="results/symbol_inference")
    p.add_argument("--run_name", type=str, default="symbol_inference")
    p.add_argument("--max_samples", type=int, default=10)
    p.add_argument("--val_max_samples", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--synthetic", action="store_true")
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

    config = TrainingConfig()
    config.output_dir = args.output_dir
    config.run_name = args.run_name
    config.data_config.max_samples = args.max_samples
    config.data_config.val_max_samples = args.val_max_samples
    config.data_config.batch_size = args.batch_size
    config.data_config.val_batch_size = args.batch_size
    config.data_config.synthetic = args.synthetic
    if args.model_type:
        config.model_type = args.model_type
    if args.dataset_type:
        config.data_config.dataset_type = args.dataset_type
    if args.val_dataset_type:
        config.data_config.val_dataset_type = args.val_dataset_type

    orchestrator = InferenceOrchestrator(args.checkpoint, config=config)
    results = orchestrator.run()
    for mode, res in results.items():
        print(f"{mode}: {res['composite']}")
    return results


if __name__ == "__main__":
    main()
