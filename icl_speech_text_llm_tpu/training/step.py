"""The jit-compiled training step.

Replaces the reference's torch loop body — autocast forward, GradScaler
backward, grad-accum, clipping, optimizer/scheduler step
(ref: train/train.py:412-597) — with one compiled function:

- bf16 forward (no GradScaler needed on TPU; fp16 loss scaling is a CUDA
  artifact — SURVEY.md §2.5);
- gradient accumulation via ``optax.MultiSteps`` (micro-batches stream through
  the same compiled step);
- global-norm clipping fused into the optax chain;
- only the TRAINABLE subtree (LoRA + Q-Former + projection by default —
  matching SALMONN's freeze flags, ref: models/custom_salmon.py:33-46) gets
  optimizer state, so memory matches the reference's trainable-only design.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.salmonn import SalmonnConfig, salmonn_train_loss


@dataclass
class OptimizerSettings:
    learning_rate: float = 1e-5  # ref default (train/train.py:55)
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0  # ref --max_grad_norm (train/train.py:68)
    grad_accum_steps: int = 1
    schedule: Optional[optax.Schedule] = None
    b1: float = 0.9
    b2: float = 0.999


#: Subtrees that train by default (everything else is frozen), mirroring the
#: reference's freeze flags: whisper/beats frozen, Q-Former + proj + LoRA train.
DEFAULT_TRAINABLE_KEYS = ("lora", "qformer")


def split_params(
    params: Dict[str, Any], trainable_keys=DEFAULT_TRAINABLE_KEYS
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    trainable = {k: v for k, v in params.items() if k in trainable_keys}
    frozen = {k: v for k, v in params.items() if k not in trainable_keys}
    return trainable, frozen


def merge_params(frozen: Dict[str, Any], trainable: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(frozen)
    out.update(trainable)
    return out


def make_optimizer(opt: OptimizerSettings) -> optax.GradientTransformation:
    lr = opt.schedule if opt.schedule is not None else opt.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(opt.max_grad_norm),
        optax.adamw(lr, b1=opt.b1, b2=opt.b2, weight_decay=opt.weight_decay),
    )
    if opt.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt.grad_accum_steps)
    return tx


@dataclass
class TrainState:
    trainable: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    def replace(self, **kw):
        d = dict(trainable=self.trainable, opt_state=self.opt_state, step=self.step)
        d.update(kw)
        return TrainState(**d)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.trainable, s.opt_state, s.step), None),
    lambda _, kids: TrainState(*kids),
)


def init_train_state(
    params: Dict[str, Any],
    optimizer: optax.GradientTransformation,
    trainable_keys=DEFAULT_TRAINABLE_KEYS,
) -> Tuple[TrainState, Dict[str, Any]]:
    trainable, frozen = split_params(params, trainable_keys)
    # deep-copy the trainable subtree: the jitted step donates the TrainState's
    # buffers, which would otherwise invalidate the caller's params tree
    trainable = jax.tree_util.tree_map(jnp.array, trainable)
    opt_state = optimizer.init(trainable)
    return TrainState(trainable, opt_state, jnp.zeros((), jnp.int32)), frozen


def make_train_step(
    cfg: SalmonnConfig,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable = salmonn_train_loss,
    remat: bool = False,
    pipeline=None,  # (Mesh with a "pp" axis, n_micro) → GPipe the decoder
    sp=None,  # (Mesh, axis) → sequence-parallel decoder
) -> Callable:
    """Build the jitted train step: (state, frozen, batch) → (state, metrics)."""

    def step(state: TrainState, frozen: Dict[str, Any], batch: Dict[str, jnp.ndarray]):
        def compute_loss(trainable):
            params = merge_params(frozen, trainable)
            kw = {}
            if pipeline is not None:
                kw["pipeline"] = pipeline
            if sp is not None:
                kw["sp"] = sp
            return loss_fn(cfg, params, batch, remat=remat, **kw)

        loss, grads = jax.value_and_grad(compute_loss)(state.trainable)
        # non-finite-loss guard: make the batch a true no-op update — zeroed
        # param deltas AND untouched optimizer moments (the reference zeroes
        # the loss on NaN — ref: models/mlp_salmonn_old.py:385-387).
        # Branch-free select so XLA compiles one program.
        ok = jnp.isfinite(loss)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.trainable)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), opt_state, state.opt_state
        )
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "skipped_nonfinite": (~ok).astype(jnp.float32),
            "step": state.step,
        }
        return state.replace(trainable=trainable, opt_state=opt_state, step=state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))
