"""Ring attention: context-parallel attention over a mesh axis.

The growth path for prompts beyond single-chip HBM (SURVEY.md §5.7): KV shards
rotate around the mesh axis with ``jax.lax.ppermute`` while each device
computes attention on the shard in front of it, maintaining online-softmax
statistics — total communication equals one all-gather but overlapped with
compute, point-to-point over ICI neighbors.

Not present in the reference (it caps k and relies on Q-Former compression);
this module exists so exemplar counts can grow past HBM later. Used via
``shard_map`` over the mesh's "tp" (or a dedicated "ctx") axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _ring_attention_local(
    q: jnp.ndarray,  # (B, H, S_q, D) — full queries on every device
    k_shard: jnp.ndarray,  # (B, H, S_kv/N, D) — this device's KV shard
    v_shard: jnp.ndarray,
    lengths: Optional[jnp.ndarray],  # (B,) global valid KV length
    axis_name: str,
    causal: bool,
    sm_scale: float,
    q_offset: int = 0,
):
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    B, H, S_q, D = q.shape
    shard_len = k_shard.shape[2]

    m = jnp.full((B, H, S_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, S_q, 1), jnp.float32)
    o = jnp.zeros((B, H, S_q, D), jnp.float32)

    def step(carry, step_idx):
        m, l, o, k_blk, v_blk = carry
        # the shard currently on this device originated at:
        src = (my_idx - step_idx) % n
        kv_start = src * shard_len

        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_blk, preferred_element_type=jnp.float32)
        s = s * sm_scale
        kv_pos = kv_start + jnp.arange(shard_len)[None, None, None, :]
        mask = jnp.ones_like(s, bool)
        if lengths is not None:
            mask = mask & (kv_pos < lengths[:, None, None, None])
        if causal:
            q_pos = q_offset + jnp.arange(S_q)[None, None, :, None]
            mask = mask & (kv_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o_next = alpha * o + jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_blk.dtype), v_blk)

        # rotate KV to the next device (skipped logically on the last step —
        # the extra rotate restores the original placement, harmless)
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_next, l_next, o_next, k_blk, v_blk), None

    (m, l, o, _, _), _ = jax.lax.scan(
        step, (m, l, o, k_shard.astype(q.dtype), v_shard.astype(q.dtype)),
        jnp.arange(n),
    )
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return (o / l_safe).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B, H, S_q, D) replicated
    k: jnp.ndarray,  # (B, H, S_kv, D) — sharded along S_kv by the caller
    v: jnp.ndarray,
    mesh,
    axis_name: str = "tp",
    lengths: Optional[jnp.ndarray] = None,
    causal: bool = True,
    sm_scale: Optional[float] = None,
) -> jnp.ndarray:
    """Context-parallel attention: shard KV's sequence over ``axis_name``.

    Inside shard_map each device sees its KV slice; Q is replicated (the
    common decode/moderate-S_q regime). Output is replicated.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5

    fn = functools.partial(
        _ring_attention_local,
        axis_name=axis_name, causal=causal, sm_scale=sm_scale,
    )
    specs_in = (
        P(),  # q replicated
        P(None, None, axis_name, None),  # k sharded on seq
        P(None, None, axis_name, None),  # v sharded on seq
        P() if lengths is not None else None,
    )
    if lengths is None:
        wrapped = shard_map(
            lambda q, k, v: fn(q, k, v, None),
            mesh=mesh, in_specs=specs_in[:3], out_specs=P(), check_vma=False,
        )
        return wrapped(q, k, v)
    wrapped = shard_map(
        lambda q, k, v, ln: fn(q, k, v, ln),
        mesh=mesh, in_specs=specs_in, out_specs=P(), check_vma=False,
    )
    return wrapped(q, k, v, lengths)
