"""GSPMD sharding rules for the model zoo.

Pattern-matched over parameter-tree paths: one table expresses
megatron-style tensor parallelism for the LLM (column-parallel qkv/up
projections, row-parallel output/down projections), FSDP-style sharding for
the big encoder matrices, and replication for small tensors. The reference has
no equivalent — its only parallelism is DDP (SURVEY.md §2.6); this module is
the TP/FSDP growth path GSPMD gives us for free.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .mesh import DP_AXIS, FSDP_AXIS, TP_AXIS

P = PartitionSpec

# (regex over 'a/b/c' path, spec builder). First match wins. Layer-stacked
# params have a leading n_layers axis → specs lead with None.
_RULES: Tuple[Tuple[str, PartitionSpec], ...] = (
    # --- LLM (stacked layers) ---
    (r"llm/layers/attn/wq$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"llm/layers/attn/wk$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"llm/layers/attn/wv$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"llm/layers/attn/wo$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"llm/layers/attn/b[qkv]$", P(None, TP_AXIS)),
    (r"llm/layers/mlp/w_gate$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"llm/layers/mlp/w_up$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"llm/layers/mlp/w_down$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"llm/tok_embed$", P(TP_AXIS, None)),  # vocab-sharded embedding
    (r"llm/lm_head$", P(None, TP_AXIS)),
    # --- LoRA adapters: A column-parallel-in, B matches target's out sharding
    (r"lora/w[qkv]/a$", P(None, FSDP_AXIS, None)),
    (r"lora/w[qkv]/b$", P(None, None, TP_AXIS)),
    (r"lora/wo/a$", P(None, TP_AXIS, None)),
    (r"lora/wo/b$", P(None, None, FSDP_AXIS)),
    (r"lora/w_(gate|up)/a$", P(None, FSDP_AXIS, None)),
    (r"lora/w_(gate|up)/b$", P(None, None, TP_AXIS)),
    (r"lora/w_down/a$", P(None, TP_AXIS, None)),
    (r"lora/w_down/b$", P(None, None, FSDP_AXIS)),
    # --- Whisper encoder blocks (stacked) ---
    (r"whisper/blocks/attn/w[qkv]$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"whisper/blocks/attn/wo$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"whisper/blocks/mlp/w1$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"whisper/blocks/mlp/w2$", P(None, TP_AXIS, FSDP_AXIS)),
    # --- BEATs layers (stacked) ---
    (r"beats/layers/attn/w[qkv]$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"beats/layers/attn/wo$", P(None, TP_AXIS, FSDP_AXIS)),
    (r"beats/layers/mlp/w1$", P(None, FSDP_AXIS, TP_AXIS)),
    (r"beats/layers/mlp/w2$", P(None, TP_AXIS, FSDP_AXIS)),
    # --- Q-Former: small; replicate ---
)


def spec_for_path(path: str, ndim: int) -> PartitionSpec:
    for pattern, spec in _RULES:
        if re.search(pattern, path):
            if len(spec) <= ndim:
                return spec
            return P(*spec[:ndim])
    return P()  # replicate


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Mirror of the param tree with NamedShardings."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k) for k, v in tree.items()}
        return NamedSharding(mesh, spec_for_path(prefix, getattr(tree, "ndim", 0)))

    return walk(params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a param tree onto the mesh according to the rule table."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def batch_shardings(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Batch-dim sharding over (dp, fsdp): standard data parallelism."""
    return {
        k: NamedSharding(mesh, P((DP_AXIS, FSDP_AXIS), *([None] * (v.ndim - 1))))
        for k, v in batch.items()
    }


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = batch_shardings(batch, mesh)
    return {k: jax.device_put(np.asarray(v), shardings[k]) for k, v in batch.items()}
