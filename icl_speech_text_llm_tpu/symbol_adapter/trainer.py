"""Unified phase-driven trainer for symbol-adapter research.

Rebuild of the reference UnifiedTrainer (ref: models/symbolAdapter/training/
unified_trainer.py:53-507 and the fuller `__` variant :195-718):

- per-phase optimizer setup over the right parameter subset (lora / mlp /
  joint) — freezing is expressed by WHICH subtree gets gradients, not by
  requires_grad flags;
- per-batch symbol replacement with random_mask=True and forced regeneration
  every ``100 × grad_accum`` batches (ref :286-292);
- per-epoch warmup-restart cosine schedule for LoRA phases (ref :227-248);
- trainable-only checkpoints embedding config + symbol mappings (ref :448-482).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.collate import ICLSample, collate_icl_batch
from ..data.packing import PackConfig
from ..training.checkpoint import save_checkpoint
from ..training.schedulers import get_schedule
from ..utils.perf import PerformanceTracker
from .configs import SymbolMode, TrainingConfig
from .losses import mlp_salmonn_train_loss
from .mlp_adapter import label_token_mask
from .schedulers import TrainingStep
from .symbol_manager import SymbolManager

logger = logging.getLogger(__name__)

FORCE_NEW_SYMBOLS_EVERY = 100  # × grad_accum batches (ref :286-292)


def replace_symbols_in_sample(
    sample: ICLSample, mappings: Dict[str, str], masked: Optional[set] = None
) -> ICLSample:
    """String-replace label words with symbols in a rendered ICLSample."""
    if masked is None:
        masked = set(mappings.keys())

    def rep(text: str) -> str:
        for original, symbol in mappings.items():
            if original in masked:
                text = text.replace(original, symbol)
        return text

    from ..data.prompts import PromptPlan

    new_plan = PromptPlan(
        segments=[rep(s) for s in sample.plan.segments],
        slots=list(sample.plan.slots),
        prompt=rep(sample.plan.prompt),
    )
    return ICLSample(
        plan=new_plan,
        completion=rep(sample.completion),
        slot_audio=sample.slot_audio,
        extras=sample.extras,
    )


@dataclass
class PhaseState:
    trainable: Dict[str, Any]
    opt_state: Any
    step: int = 0


class UnifiedTrainer:
    def __init__(
        self,
        config: TrainingConfig,
        model,  # SalmonnModel
        mlp_params: Dict[str, Any],
        symbol_manager: SymbolManager,
        pack_cfg: PackConfig,
        validator=None,
    ):
        self.config = config
        self.model = model
        self.mlp_params = mlp_params
        self.symbol_manager = symbol_manager
        self.pack_cfg = pack_cfg
        self.validator = validator
        self.training_summary: List[Dict[str, Any]] = []
        self._symbol_token_ids = self._compute_symbol_token_ids()

    # ------------------------------------------------------------------
    def _compute_symbol_token_ids(self) -> List[int]:
        # both bare and space-prefixed encodings: symbols appear mid-sentence,
        # where space-merged pieces tokenize differently than standalone
        ids: List[int] = []
        for sym in self.symbol_manager.get_current_symbols().values():
            ids.extend(self.model.tokenizer.encode(sym, add_special_tokens=False))
            ids.extend(self.model.tokenizer.encode(" " + sym, add_special_tokens=False))
        return ids

    def _phase_trainables(self, step: TrainingStep):
        """Which subtrees get gradients this phase."""
        trainable: Dict[str, Any] = {}
        if not step.freeze_lora:
            trainable["lora"] = self.model.params["lora"]
        if not step.freeze_mlp:
            trainable["mlp_adapter"] = self.mlp_params
        if not trainable:  # degenerate phases still need something to optimize
            trainable["lora"] = self.model.params["lora"]
        return trainable

    def _make_optimizer(self, step: TrainingStep, steps_per_epoch: int):
        lc = self.config.lora_config
        lr = step.learning_rate or lc.learning_rate
        if step.phase == "lora" and lc.warmup_per_epoch and steps_per_epoch > 0:
            schedule = get_schedule("per_epoch_warmup_restart", lr, 0, 0,
                                    steps_per_epoch=steps_per_epoch)
        else:
            total = max(1, steps_per_epoch * step.epochs)
            schedule = get_schedule("cosine", lr, min(100, total // 10), total)
        return optax.chain(
            optax.clip_by_global_norm(step.max_grad_norm or 1.0),
            optax.adamw(schedule, weight_decay=lc.weight_decay),
        )

    def _make_step_fn(self, step: TrainingStep, optimizer) -> Callable:
        cfg = self.model.cfg
        temperature = self.config.mlp_config.temperature
        use_mlp = not step.freeze_mlp or (not step.bypass_mlp and step.phase != "lora")

        def loss_fn(trainable, static_params, batch):
            lora = trainable.get("lora", static_params.get("lora"))
            mlp = trainable.get("mlp_adapter", self.mlp_params if use_mlp else None)
            loss, disc, sims = mlp_salmonn_train_loss(
                cfg, static_params, batch,
                mlp_params=mlp if not step.bypass_mlp else None,
                temperature=temperature,
                bypass_mlp=step.bypass_mlp,
                lora_params=lora,
            )
            return loss, (disc, sims)

        @jax.jit
        def train_step(trainable, opt_state, static_params, batch):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, static_params, batch
            )
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, aux

        return train_step

    # ------------------------------------------------------------------
    def _device_batch(self, samples: List[ICLSample]):
        batch = collate_icl_batch(samples, self.model.tokenizer, self.pack_cfg)
        label_mask = label_token_mask(batch.text_tokens, self._symbol_token_ids)
        return {
            "text_tokens": jnp.asarray(batch.text_tokens),
            "gather_idx": jnp.asarray(batch.gather_idx),
            "seq_mask": jnp.asarray(batch.seq_mask),
            "shifted_labels": jnp.asarray(batch.labels_shifted),
            "wavs": jnp.asarray(batch.audio["wavs"]),
            "label_mask": jnp.asarray(label_mask),
        }

    def train_step(self, step: TrainingStep, dataset) -> Dict[str, Any]:
        """Run one schedule step (possibly several epochs). Returns summary."""
        bs = self.config.data_config.batch_size
        steps_per_epoch = max(1, len(dataset) // bs)
        optimizer = self._make_optimizer(step, steps_per_epoch)
        trainable = self._phase_trainables(step)
        opt_state = optimizer.init(trainable)
        step_fn = self._make_step_fn(step, optimizer)
        tracker = PerformanceTracker(log_interval=0)

        use_symbols = step.use_symbols and (
            self.config.symbol_config.mode != SymbolMode.NO_SYMBOLS
        )
        accum = step.gradient_accumulation_steps or 1
        last_loss = float("nan")
        epoch_summaries = []
        for epoch in range(step.epochs):
            if step.dynamic_symbols and use_symbols:
                self.symbol_manager.get_symbols_for_epoch(epoch, force_new_symbols=True)
                self._symbol_token_ids = self._compute_symbol_token_ids()
            for b_idx in range(steps_per_epoch):
                samples = [dataset[b_idx * bs + j] for j in range(bs)]
                if use_symbols:
                    force_new = (
                        step.dynamic_symbols
                        and b_idx > 0
                        and b_idx % (FORCE_NEW_SYMBOLS_EVERY * accum) == 0
                    )
                    mappings = self.symbol_manager.get_symbols_for_epoch(
                        epoch, force_new_symbols=force_new
                    )
                    n_mask = max(1, len(mappings) // 8)
                    masked = set(
                        self.symbol_manager._rng.sample(list(mappings), n_mask)
                    )
                    samples = [
                        replace_symbols_in_sample(s, mappings, masked) for s in samples
                    ]
                batch = self._device_batch(samples)
                trainable, opt_state, loss, _ = step_fn(
                    trainable, opt_state, self.model.params, batch
                )
                last_loss = float(loss)
                tracker.update(loss=last_loss, examples=bs)

            val_metrics = {}
            if self.validator is not None:
                self._publish(trainable)
                val_metrics = self.validator.validate_model(epoch=epoch)
            epoch_summaries.append({"epoch": epoch, "loss": last_loss, "val": val_metrics})
            logger.info(
                f"[{step.phase} step {step.step_id}] epoch {epoch}: loss={last_loss:.4f}"
                + (f", val={val_metrics}" if val_metrics else "")
            )

        self._publish(trainable)
        summary = {
            "step_id": step.step_id,
            "phase": step.phase,
            "cycle": step.cycle,
            "epochs": epoch_summaries,
            "final_loss": last_loss,
            "perf": tracker.get_summary(),
        }
        self.training_summary.append(summary)
        return summary

    def _publish(self, trainable: Dict[str, Any]):
        """Fold trained subtrees back into the model/adapter state."""
        if "lora" in trainable:
            self.model.params = {**self.model.params, "lora": trainable["lora"]}
            self.model.engine.params = self.model.params
        if "mlp_adapter" in trainable:
            self.mlp_params = trainable["mlp_adapter"]

    # ------------------------------------------------------------------
    def save_checkpoint_with_config(
        self, ckpt_dir: str, step: TrainingStep, loss: float
    ) -> str:
        """Trainable params + embedded config + symbol mappings (ref :448-482)."""
        name = f"{step.phase}_step{step.step_id}_cycle{step.cycle}"
        trainable = {"lora": self.model.params["lora"], "mlp_adapter": self.mlp_params}
        metadata = {
            "training_config": {
                "mode": self.config.mode.value,
                "symbol_mode": self.config.symbol_config.mode.value,
                "dataset_type": self.config.data_config.dataset_type,
                "model_type": self.config.model_type,
            },
            "symbol_mappings": self.symbol_manager.get_current_symbols(),
            "phase": step.phase,
        }
        return save_checkpoint(
            os.path.join(ckpt_dir, name), trainable, step=step.step_id,
            epoch=step.epochs, loss=loss, metadata=metadata,
        )
