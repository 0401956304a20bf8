"""Pipeline parallelism for the scan-stacked decoder (GPipe schedule).

The reference's only parallelism is DDP (SURVEY.md §2.6; ref train/train.py:
136-141) — model scale there is bounded by one GPU's memory. This module is
the TPU-native growth axis past tp/fsdp: the decoder's layer-stacked
parameters (models/llama.py — leading axis = layer) shard naturally over a
"pp" mesh axis, so each stage holds ``n_layers / pp`` contiguous layers and
runs them with the SAME ``run_layer_stack`` scan the single-chip path uses.

Schedule: GPipe over ``n_micro`` microbatches split from the batch axis.
One ``lax.scan`` tick = every stage runs its local sub-stack on its current
microbatch, then activations rotate one hop stage→stage+1 via ``ppermute``
(a neighbor ICI transfer — never a broadcast). A tick's work is identical on
every stage, so the compiled program is SPMD; pipeline bubbles are the
standard ``(pp-1) / (n_micro + pp - 1)`` fraction.

Differentiable end-to-end: ``shard_map`` + ``ppermute`` have transposes, so
``jax.grad`` through ``pipeline_decoder_forward`` yields the reverse-schedule
backward pipeline automatically — no hand-written backward pass.

Scope: prefill/training forward (no KV cache). Decode keeps the single-stage
engine — 10-token ICL decode does not pipeline profitably (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# jax>=0.8 renamed check_rep → check_vma; we must disable it either way
# (the masked psum that replicates the last stage's outputs is intentional)
_CHECK_KW = (
    "check_vma"
    if "check_vma" in inspect.signature(_shard_map).parameters
    else "check_rep"
)


def shard_map(f, *, mesh, in_specs, out_specs):
    return _shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **{_CHECK_KW: False}
    )
from jax.sharding import Mesh, PartitionSpec

from ..models.llama import DecoderConfig, rms_norm, run_layer_stack
from .mesh import DP_AXIS, PP_AXIS

P = PartitionSpec


def _stage_forward(cfg, use_lora, lora_scaling, remat, layers, lora, x, mask,
                   positions):
    """One stage's local sub-stack (layers carry the LOCAL leading axis)."""
    return run_layer_stack(
        cfg, layers, x, mask, positions,
        lora=lora if use_lora else None, lora_scaling=lora_scaling,
        remat=remat,
    )


def _gpipe_loop(cfg, n_micro, n_stages, use_lora, lora_scaling, remat,
                layers, lora, x_micro, mask_micro, pos_micro):
    """Body run per-device under shard_map.

    x_micro: (n_micro, mb, T, D) — this device's dp shard of every microbatch.
    layers/lora: the LOCAL pp slice of the stacked parameter trees.
    Returns (n_micro, mb, T, D) hidden states, valid on the LAST stage only
    (caller masks + psums over pp to replicate).
    """
    stage = jax.lax.axis_index(PP_AXIS)
    out_shape = x_micro.shape[1:]

    def tick(carry, t):
        recv, outputs = carry
        # stage 0 feeds microbatch t from the input queue; later stages
        # consume what the previous stage handed over last tick
        feed = jax.lax.dynamic_index_in_dim(
            x_micro, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        inp = jnp.where(stage == 0, feed, recv)
        # every microbatch uses its OWN mask/positions at every stage: the
        # microbatch occupying this stage at tick t is t - stage
        mi = jnp.clip(t - stage, 0, n_micro - 1)
        mask = jax.lax.dynamic_index_in_dim(mask_micro, mi, 0, keepdims=False)
        pos = jax.lax.dynamic_index_in_dim(pos_micro, mi, 0, keepdims=False)
        out = _stage_forward(cfg, use_lora, lora_scaling, remat, layers, lora,
                             inp, mask, pos)
        # the LAST stage completes microbatch t-(pp-1) at tick t
        done_idx = t - (n_stages - 1)
        safe = jnp.clip(done_idx, 0, n_micro - 1)
        cur = jax.lax.dynamic_index_in_dim(outputs, safe, 0, keepdims=False)
        upd = jnp.where(done_idx >= 0, out, cur)
        outputs = jax.lax.dynamic_update_index_in_dim(outputs, upd, safe, 0)
        # rotate activations one hop forward (wraparound lands on stage 0,
        # which ignores it — bubbles flush out of the pipe)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        recv = jax.lax.ppermute(out, PP_AXIS, perm)
        return (recv, outputs), None

    init = (jnp.zeros(out_shape, x_micro.dtype),
            jnp.zeros((n_micro,) + out_shape, x_micro.dtype))
    (_, outputs), _ = jax.lax.scan(
        tick, init, jnp.arange(n_micro + n_stages - 1))
    # replicate the last stage's results across pp (activations are tiny
    # next to weights; keeps the caller's loss computation mesh-agnostic)
    outputs = jnp.where(stage == n_stages - 1, outputs, 0.0)
    return jax.lax.psum(outputs, PP_AXIS)


def pipeline_decoder_forward(
    mesh: Mesh,
    cfg: DecoderConfig,
    params: Dict[str, Any],
    inputs_embeds: jnp.ndarray,  # (B, T, dim)
    mask: jnp.ndarray,  # (B, 1, T, T) boolean
    positions: jnp.ndarray,  # (B, T)
    n_micro: int,
    lora: Optional[Dict[str, Any]] = None,
    lora_scaling: float = 1.0,
    remat: bool = False,
) -> jnp.ndarray:
    """Decoder stack over a (dp, pp) mesh; microbatched GPipe schedule.

    Equivalent to ``decoder_forward(...)[0]`` (no cache); parity-tested
    against it in tests/test_pipeline.py. ``params["layers"]``/``lora`` must
    be sharded P("pp") on the layer axis OR replicated (shard_map slices
    either way); batch must divide ``n_micro * dp``.
    """
    n_stages = mesh.shape[PP_AXIS]
    if cfg.n_layers % n_stages:
        raise ValueError(f"{cfg.n_layers} layers not divisible by pp={n_stages}")
    B, T, D = inputs_embeds.shape
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    mb = B // n_micro

    x_micro = inputs_embeds.reshape(n_micro, mb, T, D)
    mask_micro = mask.reshape((n_micro, mb) + mask.shape[1:])
    pos_micro = positions.reshape(n_micro, mb, T)

    use_lora = lora is not None
    lora_in = lora if use_lora else jnp.zeros((cfg.n_layers, 1))

    # layer-stacked trees shard over pp on axis 0; microbatches shard over dp
    # on their batch axis; everything else is replicated per stage
    spec_layers = jax.tree_util.tree_map(lambda _: P(PP_AXIS), params["layers"])
    spec_lora = jax.tree_util.tree_map(lambda _: P(PP_AXIS), lora_in)
    data_spec = P(None, DP_AXIS)

    fn = shard_map(
        functools.partial(
            _gpipe_loop, cfg, n_micro, n_stages, use_lora, lora_scaling, remat,
        ),
        mesh=mesh,
        in_specs=(spec_layers, spec_lora, data_spec, data_spec, data_spec),
        out_specs=data_spec,
    )
    out = fn(params["layers"], lora_in, x_micro, mask_micro, pos_micro)
    hidden = out.reshape(B, T, D)
    return rms_norm(hidden, params["final_norm"], cfg.rms_eps)
