"""Checkpointing: trainable-only Orbax checkpoints + JSON sidecars.

Reference conventions preserved (ref: utils/training_utils.py:29-101,
models/symbolAdapter/training/unified_trainer.py:448-507):
- only TRAINABLE params are saved (LoRA/Q-Former adapters — tiny vs the full
  model), with optimizer state, step, epoch and loss;
- config and symbol mappings ride along as a JSON sidecar;
- loads are tolerant: missing keys keep their current values (the reference's
  ``strict=False`` semantics, SURVEY.md §8 item 10).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_ASYNC_CKPTR = None  # one StandardCheckpointer so async writes can be awaited


def wait_for_checkpoints() -> None:
    """Block until every ``save_checkpoint(block=False)`` write has landed.

    Call before process exit or before reading a just-written checkpoint;
    the training loop calls it at the end of the run."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    ckpt_dir: str,
    trainable: Dict[str, Any],
    opt_state: Any = None,
    step: int = 0,
    epoch: int = 0,
    loss: float = 0.0,
    metadata: Optional[Dict[str, Any]] = None,
    block: bool = True,
) -> str:
    """Write a trainable-only checkpoint; returns the checkpoint path.

    ``block=False`` snapshots the tree to host and returns while Orbax
    writes in the background (the device keeps training through the save —
    epoch-boundary checkpoints stop costing a step of wall clock). The next
    save through this module, or ``wait_for_checkpoints()``, joins the
    in-flight write. Falls back to a blocking write without Orbax."""
    global _ASYNC_CKPTR
    path = os.path.abspath(ckpt_dir)
    os.makedirs(path, exist_ok=True)
    state = {"trainable": _tree_to_numpy(trainable), "step": int(step)}
    if opt_state is not None:
        state["opt_state"] = _tree_to_numpy(opt_state)

    if _HAVE_ORBAX:
        if _ASYNC_CKPTR is None:
            _ASYNC_CKPTR = ocp.StandardCheckpointer()
        ckptr = _ASYNC_CKPTR
        ckptr.wait_until_finished()  # join any previous async write first
        target = os.path.join(path, "state")
        if os.path.exists(target):
            import shutil

            shutil.rmtree(target)
        ckptr.save(target, state)
        if block:
            ckptr.wait_until_finished()
    else:  # minimal fallback
        np.save(os.path.join(path, "state.npy"), state, allow_pickle=True)

    sidecar = {
        "epoch": epoch,
        "step": int(step),
        "loss": float(loss),
        "metadata": metadata or {},
    }
    with open(os.path.join(path, "train_meta.json"), "w") as f:
        json.dump(sidecar, f, indent=2)

    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(trainable))
    logger.info(f"Saved trainable-only checkpoint ({n_params:,} params) to {path}")
    return path


def load_checkpoint(
    ckpt_dir: str, template: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Restore a checkpoint dir → {"trainable", "opt_state"?, "step", meta...}."""
    path = os.path.abspath(ckpt_dir)
    target = os.path.join(path, "state")
    if _HAVE_ORBAX and os.path.exists(target):
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(target)
    elif os.path.exists(os.path.join(path, "state.npy")):
        state = np.load(os.path.join(path, "state.npy"), allow_pickle=True).item()
    else:
        raise FileNotFoundError(f"No checkpoint found under {path}")

    meta_path = os.path.join(path, "train_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            state["meta"] = json.load(f)
    return state


def apply_trainable(
    params: Dict[str, Any], trainable: Dict[str, Any], strict: bool = False
) -> Dict[str, Any]:
    """Merge restored trainable subtrees into a full param tree.

    Non-strict (default): unknown keys are skipped with a warning — the
    reference's strict=False partial-load behavior."""
    out = dict(params)
    for key, sub in trainable.items():
        if key in out:
            out[key] = sub
        elif strict:
            raise KeyError(f"Checkpoint key {key} not in model params")
        else:
            logger.warning(f"Skipping unknown checkpoint subtree: {key}")
    return out


def load_lora_bank(ckpt_dirs) -> Dict[str, Any]:
    """Stack the ``lora`` subtrees of N trainable checkpoints into a
    multi-adapter BANK for multi-LoRA serving.

    The reference keeps one fine-tuned adapter per task/phase as separate
    checkpoint artifacts (symbol-adapter phases, per-task LoRAs); this loads
    them side by side so ONE serving engine decodes per-request adapters
    (models/llama.py:stack_lora_bank; adapter_id follows list order). All
    checkpoints must share rank and target set."""
    if not ckpt_dirs:
        raise ValueError("load_lora_bank needs at least one checkpoint dir")
    from ..models.llama import stack_lora_bank

    adapters = []
    for d in ckpt_dirs:
        trainable = load_checkpoint(d)["trainable"]
        if "lora" not in trainable:
            raise KeyError(f"checkpoint {d} has no 'lora' subtree "
                           f"(keys: {list(trainable)})")
        adapters.append(trainable["lora"])
    return stack_lora_bank(adapters)
