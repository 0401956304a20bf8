"""TRUE sequence/context parallelism for the decoder (activations sharded).

``decoder_forward(ring=...)`` distributes only the KV tensors (Q replicated
— every device computes the full attention). This module shards the
ACTIVATIONS along the sequence axis instead: each device runs the whole
layer stack on its T/n slice (projections, norms, and MLPs are positionwise),
and attention uses the ring collective with a per-device ``q_offset`` — so
compute, activation memory, AND KV memory all scale 1/n with the mesh axis.
This is the real "prompts past one chip" growth path (SURVEY.md §5.7).

Built from the same pieces as the single-chip path: ``run_layer_stack`` with
an ``attn_override`` that calls ``_ring_attention_local`` per layer inside
ONE ``shard_map`` over the whole stack (no nested shard_map; KV rotation is
a neighbor ``ppermute`` per step). Parity-tested against the plain forward
in tests/test_sequence_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from ..models.llama import DecoderConfig, rms_norm, run_layer_stack
from .pipeline import shard_map
from .ring_attention import _ring_attention_local

P = PartitionSpec


def _sp_stack(cfg, axis, use_lora, lora_scaling, remat,
              layers, lora, x_sh, pos_sh, lengths):
    """Per-device body: run the full layer stack on this device's T shard."""
    idx = jax.lax.axis_index(axis)
    shard_len = x_sh.shape[1]
    sm_scale = cfg.hd**-0.5

    def attn(q, k, v):  # heads-first (B, H, T/n, hd), KV repeated to n_heads
        return _ring_attention_local(
            q, k, v, lengths, axis, causal=True, sm_scale=sm_scale,
            q_offset=idx * shard_len,
        )

    return run_layer_stack(
        cfg, layers, x_sh, None, pos_sh,
        lora=lora if use_lora else None, lora_scaling=lora_scaling,
        remat=remat, attn_override=attn,
    )


def sp_decoder_forward(
    mesh: Mesh,
    axis: str,
    cfg: DecoderConfig,
    params: Dict[str, Any],
    inputs_embeds: jnp.ndarray,  # (B, T, dim); T % mesh.shape[axis] == 0
    positions: jnp.ndarray,  # (B, T)
    lengths: jnp.ndarray,  # (B,) valid lengths (causal + length masking)
    lora: Optional[Dict[str, Any]] = None,
    lora_scaling: float = 1.0,
    remat: bool = False,
) -> jnp.ndarray:
    """Causal decoder forward with sequence-sharded activations.

    Equivalent to ``decoder_forward(...)[0]`` with a causal+length mask;
    weights replicate per device, activations/KV shard 1/n along T.
    """
    n = mesh.shape[axis]
    B, T, D = inputs_embeds.shape
    if T % n:
        raise ValueError(f"seq len {T} not divisible by {axis}={n}")
    use_lora = lora is not None
    lora_in = lora if use_lora else jnp.zeros((cfg.n_layers, 1))

    # Explicit two-step reshard at the shard_map boundary: callers usually
    # hand in batch-sharded activations (dp/fsdp), and GSPMD cannot reshard
    # batch-sharded ↔ T-sharded directly — it falls back to "involuntary
    # full rematerialization" on the BACKWARD copy (round-2 VERDICT weak #3).
    # Forcing replicate-then-slice makes both directions a single efficient
    # collective (all-gather) plus a free local slice, in fwd AND transpose.
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    tsh = NamedSharding(mesh, P(None, axis, None))
    x = jax.lax.with_sharding_constraint(inputs_embeds, rep)
    x = jax.lax.with_sharding_constraint(x, tsh)
    pos = jax.lax.with_sharding_constraint(positions, NamedSharding(mesh, P()))

    fn = shard_map(
        functools.partial(_sp_stack, cfg, axis, use_lora, lora_scaling, remat),
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(None, axis), P()),
        out_specs=P(None, axis, None),
    )
    hidden = fn(params["layers"], lora_in, x, pos, lengths)
    hidden = jax.lax.with_sharding_constraint(hidden, tsh)
    out = rms_norm(hidden, params["final_norm"], cfg.rms_eps)
    # hand back replicated: downstream (lm head + CE) consumes arbitrary
    # caller shardings; T-shard → replicated is one all-gather
    return jax.lax.with_sharding_constraint(out, rep)
