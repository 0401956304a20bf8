"""Training loop: epochs over packed batches, periodic validation, checkpoints.

Rebuild of the reference's train/train.py main loop (ref :412-744):
- per-step metrics via PerformanceTracker (examples/s, loss);
- validation = batched generation + per-dataset metrics on a capped set
  (ref validate(): train/train.py:664-744, val cap 200);
- trainable-only checkpoints every ``save_every`` epochs + resume.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import collate_icl_batch
from ..data.packing import PackConfig
from ..evaluation import evaluate_predictions
from ..registry import DatasetType
from ..utils.perf import PerformanceTracker
from .checkpoint import load_checkpoint, save_checkpoint, wait_for_checkpoints
from .step import TrainState, merge_params

logger = logging.getLogger(__name__)


@dataclass
class TrainSettings:
    num_epochs: int = 3  # ref default (train/train.py:57)
    batch_size: int = 2
    save_every: int = 1
    eval_every: int = 0  # steps; 0 = once per epoch (ref quirk §8.4 dropped)
    output_dir: str = "checkpoints"
    val_max_samples: int = 200  # ref cap (configs/training_configs.py:108)
    resume_from: Optional[str] = None
    val_batch_size: int = 4
    seed: int = 42  # data-order seed (per-epoch reshuffle, ref set_epoch)
    shard_data: bool = True  # per-host input sharding (ref DistributedSampler)


def _device_batch(batch, mesh=None):
    out = {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_mask": jnp.asarray(batch.seq_mask),
        "shifted_labels": jnp.asarray(batch.labels_shifted),
        # wavs + any model-specific audio sidecars (e.g. Qwen audio_lengths)
        **{k: jnp.asarray(v) for k, v in batch.audio.items()},
    }
    if mesh is not None:
        from ..parallel.sharding import shard_batch

        out = shard_batch(out, mesh)
    return out


def iter_batches(dataset, batch_size: int, tokenizer, pack_cfg: PackConfig,
                 order=None):
    """Fixed-size batches; tail batch padded by repeating the last sample.

    ``order`` (optional index array) drives per-host sharding + per-epoch
    shuffling — see parallel/multihost.shard_indices (ref DistributedSampler,
    train/train.py:325-330)."""
    if order is None:
        order = range(len(dataset))
    order = list(order)
    for start in range(0, len(order), batch_size):
        samples = [dataset[int(i)] for i in order[start:start + batch_size]]
        while len(samples) < batch_size:
            samples.append(samples[-1])
        yield collate_icl_batch(samples, tokenizer, pack_cfg)


def validate(
    engine,
    val_dataset,
    pack_cfg: PackConfig,
    dataset_types: List[DatasetType],
    settings: TrainSettings,
) -> Dict[str, Any]:
    """Generation-based validation with per-dataset metrics
    (ref: train/train.py:664-744)."""
    from ..parallel.multihost import gather_predictions, shard_indices

    results = []
    n = min(len(val_dataset), settings.val_max_samples)
    # each host evaluates its slice; predictions are gathered before metrics
    order = list(shard_indices(n, shuffle=False)) if settings.shard_data else list(range(n))
    bs = settings.val_batch_size
    for start in range(0, len(order), bs):
        samples = [val_dataset[int(i)] for i in order[start:start + bs]]
        real = len(samples)
        while len(samples) < bs:
            samples.append(samples[-1])
        batch = collate_icl_batch(samples, engine.tokenizer, pack_cfg)
        preds = engine.generate(batch, batch.audio)[:real]
        for s, p, gi in zip(samples[:real], preds, order[start:start + bs]):
            results.append(
                {
                    "text": s.extras.get("text", ""),
                    "true_label": s.completion,
                    "predicted_label": p,
                    "dataset_type": s.extras.get("dataset_type", ""),
                    # global dataset index: shard_indices pads by wrapping, so
                    # a sample can be evaluated on TWO hosts — dedupe below
                    "_index": int(gi),
                }
            )
    if settings.shard_data:
        results = gather_predictions(results)
    seen, deduped = set(), []
    for r in results:
        gi = r.pop("_index", None)
        if gi is None or gi not in seen:
            if gi is not None:
                seen.add(gi)
            deduped.append(r)
    results = deduped
    metrics = {}
    for dt in dataset_types:
        subset = [r for r in results if r["dataset_type"] == dt.value]
        if subset:
            metrics[dt.value] = evaluate_predictions(subset, dt)
    return metrics


def train(
    model,  # SalmonnModel
    state: TrainState,
    frozen: Dict[str, Any],
    step_fn: Callable,
    train_dataset,
    pack_cfg: PackConfig,
    settings: TrainSettings,
    val_dataset=None,
    dataset_types: Optional[List[DatasetType]] = None,
    metadata: Optional[Dict[str, Any]] = None,
    mesh=None,  # jax.sharding.Mesh → batches placed per the GSPMD rules
) -> TrainState:
    """Run the full training schedule; returns the final state."""
    tracker = PerformanceTracker(log_interval=10)
    start_epoch = 0
    if settings.resume_from:
        ck = load_checkpoint(settings.resume_from)
        state = state.replace(trainable=ck["trainable"],
                              step=jnp.asarray(ck.get("step", 0), jnp.int32))
        if "opt_state" in ck:
            # restore optimizer moments too (the reference restored optimizer
            # state only in the symbol trainer — we do it everywhere).
            # Orbax restores plain nested containers, not optax's NamedTuple
            # states, so graft the saved LEAVES onto the live treedef.
            flat_tmpl, treedef = jax.tree_util.tree_flatten(state.opt_state)
            flat_saved = jax.tree_util.tree_leaves(ck["opt_state"])
            if len(flat_saved) == len(flat_tmpl):
                leaves = [
                    jnp.asarray(s).astype(t.dtype) if hasattr(t, "dtype") else s
                    for t, s in zip(flat_tmpl, flat_saved)
                ]
                state = state.replace(
                    opt_state=jax.tree_util.tree_unflatten(treedef, leaves)
                )
            else:
                logger.warning(
                    "optimizer state restore skipped: %d saved leaves vs %d live",
                    len(flat_saved), len(flat_tmpl),
                )
        start_epoch = int(ck.get("meta", {}).get("epoch", 0))
        logger.info(f"Resumed from {settings.resume_from} at epoch {start_epoch}")

    from ..data.pipeline import PrefetchIterator

    from ..parallel.multihost import shard_indices

    last_loss = float("nan")
    for epoch in range(start_epoch, settings.num_epochs):
        # per-host data shard, reshuffled per epoch (the reference's
        # DistributedSampler + set_epoch, ref: train/train.py:325-330,418-419)
        order = (shard_indices(len(train_dataset), epoch, seed=settings.seed)
                 if settings.shard_data else None)
        # background-thread prefetch overlaps host collation with device steps
        # (the reference's DataLoader workers, ref: train/train.py:338-365)
        batches = PrefetchIterator(
            lambda order=order: iter_batches(
                train_dataset, settings.batch_size,
                model.tokenizer, pack_cfg, order=order), depth=2,
        )
        try:
            for batch in batches:
                try:
                    state, metrics = step_fn(state, frozen, _device_batch(batch, mesh))
                except KeyboardInterrupt:
                    raise
                except Exception as e:
                    # per-batch skip, matching the reference's training loop
                    # (ref: train/train.py:593-597)
                    logger.warning(f"skipping batch after error: {e}")
                    continue
                last_loss = float(metrics["loss"])
                if metrics.get("skipped_nonfinite") is not None and float(
                    metrics["skipped_nonfinite"]
                ):
                    logger.warning("non-finite loss — batch became a no-op update")
                tracker.update(loss=last_loss, examples=batch.batch_size)
        except KeyboardInterrupt:
            # graceful stop: keep the state trained so far
            # (ref: train/train.py:657-659)
            logger.info("KeyboardInterrupt — stopping training early")
            break
        if hasattr(train_dataset, "on_epoch_end"):
            train_dataset.on_epoch_end()

        if val_dataset is not None and dataset_types:
            # validation uses the CURRENT adapter weights
            model.params = merge_params(frozen, state.trainable)
            model.engine.params = model.params
            val_metrics = validate(model.engine, val_dataset, pack_cfg,
                                   dataset_types, settings)
            logger.info(f"epoch {epoch} validation: "
                        + ", ".join(f"{k}={_headline(v):.4f}" for k, v in val_metrics.items()))

        if settings.save_every and (epoch + 1) % settings.save_every == 0:
            path = os.path.join(
                settings.output_dir, f"epoch_{epoch}_loss_{last_loss:.4f}"
            )
            # async: the next epoch's steps overlap the checkpoint write
            save_checkpoint(path, state.trainable, opt_state=state.opt_state,
                            step=int(state.step), epoch=epoch + 1, loss=last_loss,
                            metadata=metadata, block=False)
    wait_for_checkpoints()
    return state


def _headline(metrics: Dict[str, Any]) -> float:
    """Headline metric per task (ref: validation.py:292-299)."""
    for key in ("macro_f1_with_invalid", "macro_f1", "f1_score", "accuracy"):
        if key in metrics:
            return float(metrics[key])
    return 0.0
