"""Pallas TPU flash attention (forward).

Tiled online-softmax attention for the LLM prefill path — the dominant cost of
k-shot ICL inference (1-2k-position prompts, 10 decode tokens; SURVEY.md §7.3
hard part #3). Never materializes the (S, S) scores matrix: per Q tile it
streams KV tiles through VMEM keeping running max/sum/accumulator scratch.

Supports the masks this framework needs:
- causal;
- per-sample valid length (right-padded packed prompts) via scalar prefetch.

Block-skipping: KV tiles entirely above the causal diagonal or entirely beyond
the sample's length are skipped before any MXU work.

Used for head_dim ≥ MIN_LANES tensors (the LLM's 128); the XLA einsum path
(ops/attention.py) remains the numerics oracle and the fallback for the small
encoder heads.

Training support: ``flash_attention`` carries a custom VJP. The forward kernel
additionally emits the softmax statistics (running max m, sum l) as residuals;
the backward runs two dedicated Pallas kernels (dq: accumulate over KV tiles;
dk/dv: accumulate over Q tiles) that recompute P in the transposed frame
``sT = k·qT`` so the per-row stats broadcast along lanes. A ``lax.scan``
blockwise backward (`_flash_bwd_scan_rule`) is kept as the numerics oracle.
"""

from __future__ import annotations

import functools
import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_LANES = 128
MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = math.log2(math.e)  # exp→exp2 domain fold (gated-bias kernels)



def _online_softmax_update(s, v, m_scratch, l_scratch, acc_scratch,
                           exp2_domain: bool = False):
    """One KV tile of the online softmax shared by the forward kernels:
    fold scores ``s`` (block_q, block_k) and values ``v`` into the running
    (m, l, acc) VMEM scratch (lanes of m/l replicated).

    ``exp2_domain``: scores arrive PRE-MULTIPLIED by log2(e) (folded into q
    / the bias host-side), so the transcendental becomes ``exp2`` — no
    per-element ·log2e multiply — and it runs in ``v.dtype`` (bf16 packs two
    lanes on the VPU; the (s−m) argument is ≤0 and largest-magnitude terms
    round to exp2≈0, so bf16 rounding only perturbs near-max entries by
    ≤2⁻⁸ relative). m/l residuals then live in the log2 domain — only the
    forward-only gated-bias kernels use this; the differentiable kernel
    keeps e-domain residuals for its backward."""
    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast over lanes
    if exp2_domain:
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2((s - m_next[:, :1]).astype(v.dtype))
        l_add = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    else:
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_add = jnp.sum(p, axis=1, keepdims=True)
        p = p.astype(v.dtype)
    m_scratch[...] = m_next
    l_scratch[...] = alpha * l_prev + l_add
    pv = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    # lanes of alpha are replicated; broadcast one lane over D
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv


def _flash_kernel(
    lengths_ref,  # scalar prefetch: (B,) int32 valid length per sample
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_k, D)
    v_ref,  # (1, 1, block_k, D)
    o_ref,  # (1, 1, block_q, D)
    m_out_ref,  # (1, 1, 8, block_q) f32 — softmax running max (residual)
    l_out_ref,  # (1, 1, 8, block_q) f32 — softmax sum (residual)
    m_scratch,  # (block_q, MIN_LANES) f32
    l_scratch,  # (block_q, MIN_LANES) f32
    acc_scratch,  # (block_q, D) f32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    length = lengths_ref[b]
    q_start = q_idx * block_q
    kv_start = kv_idx * block_k

    # skip tiles fully above the causal diagonal or fully beyond the length
    on_or_below_diag = (q_start + block_q - 1) >= kv_start if causal else True
    within_length = kv_start < length
    should_run = jnp.logical_and(on_or_below_diag, within_length)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]  # (block_q, D)
        k = k_ref[0, 0]  # (block_k, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        if sm_scale != 1.0:
            s = s * sm_scale

        row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_start
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_start
        mask = col_ids < length
        if causal:
            mask = jnp.logical_and(mask, col_ids <= row_ids)
        s = s + jnp.where(mask, 0.0, MASK_VALUE)
        _online_softmax_update(s, v_ref[0, 0], m_scratch, l_scratch, acc_scratch)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        # Mosaic block constraint: last two dims (8, block_q); sublanes replicated
        m_out_ref[0, 0] = jnp.broadcast_to(m_scratch[...][:, 0][None, :], m_out_ref.shape[2:])
        l_out_ref[0, 0] = jnp.broadcast_to(l_scratch[...][:, 0][None, :], l_out_ref.shape[2:])


def _flash_forward(q, k, v, lengths, causal, sm_scale, block_q, block_k):
    """Raw kernel launch → (o, m (B,H,8,S) sublane-replicated, l same)."""
    B, H, S, D = q.shape
    S_kv = k.shape[2]
    grid = (B, H, S // block_q, S_kv // block_k)
    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        kv_len=S_kv,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h, ki, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, h, qi, ki, *_: (b, h, 0, qi)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, h, qi, ki, *_: (b, h, 0, qi)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, 8, S), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 8, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(lengths, q, k, v)


def _flash_inf_kernel(
    lengths_ref,  # scalar prefetch: (B,) int32 — tile-skip only
    q_ref,  # (1, 1, block_q, D) — PRE-scaled by sm_scale·log2e
    k_ref,  # (1, 1, block_k, D)
    v_ref,  # (1, 1, block_k, D)
    mrow_ref,  # (1, 1, block_k) f32 additive key mask row
    o_ref,
    m_out_ref,  # (1, 1, 8, block_q) f32 — log2-domain running max
    l_out_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    block_k: int,
):
    """Lean NON-CAUSAL forward: the plain kernel's per-element chain is
    ~10 VPU f32 ops (2 iotas, compare, where, sm_scale mul, max, sub, exp,
    sum, cast) and measured VPU-bound at the whisper-large shape — 1.26 ms
    vs the 0.44 ms D=64 MXU floor (scripts/probe_hd64_mxu.py). This variant
    drops to ~4: precomputed additive mask row (1 add), max, sub, and a
    v.dtype exp2 (log2e folded into q host-side; bf16 packs 2 lanes)."""
    b = pl.program_id(0)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    @pl.when(kv_idx * block_k < lengths_ref[b])
    def _run():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + mrow_ref[0]
        _online_softmax_update(s, v_ref[0, 0], m_scratch, l_scratch,
                               acc_scratch, exp2_domain=True)

    @pl.when(kv_idx == pl.num_programs(3) - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        m_out_ref[0, 0] = jnp.broadcast_to(m_scratch[...][:, 0][None, :], m_out_ref.shape[2:])
        l_out_ref[0, 0] = jnp.broadcast_to(l_scratch[...][:, 0][None, :], l_out_ref.shape[2:])


def _flash_forward_noncausal(q, k, v, lengths, sm_scale, block_q, block_k):
    """exp2-domain lean forward → (o, m (e-domain, backward-compatible), l).

    The log2e fold lives entirely inside: q is pre-scaled host-side, the
    kernel's m comes back in the log2 domain and is converted (m·ln2) so
    callers — including the standard flash backward — see exactly the
    (o, m, l) the plain kernel would have produced (l is domain-invariant:
    Σ2^(s′−m′) = Σe^(s−m))."""
    B, H, S, D = q.shape
    S_kv = k.shape[2]
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    mask_rows = jnp.where(
        jnp.arange(S_kv, dtype=jnp.int32)[None, :]
        < lengths[:, None].astype(jnp.int32),
        0.0, MASK_VALUE).astype(jnp.float32)[:, None, :]
    grid = (B, H, S // block_q, S_kv // block_k)
    o, m, l = pl.pallas_call(
        functools.partial(_flash_inf_kernel, block_k=block_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b, h, qi, ki, *_: (b, 0, ki)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, h, qi, ki, *_: (b, h, 0, qi)),
                pl.BlockSpec((1, 1, 8, block_q), lambda b, h, qi, ki, *_: (b, h, 0, qi)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, H, 8, S), jnp.float32),
            jax.ShapeDtypeStruct((B, H, 8, S), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(lengths.astype(jnp.int32), q, k, v, mask_rows)
    return o, m * math.log(2.0), l


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_attention_diff(q, k, v, lengths, causal, sm_scale, block_q, block_k,
                          bwd_block_q, bwd_block_k):
    if not causal:
        o, _, _ = _flash_forward_noncausal(q, k, v, lengths, sm_scale,
                                           block_q, block_k)
        return o
    o, _, _ = _flash_forward(q, k, v, lengths, causal, sm_scale, block_q, block_k)
    return o


def _flash_fwd_rule(q, k, v, lengths, causal, sm_scale, block_q, block_k,
                    bwd_block_q, bwd_block_k):
    fwd = (_flash_forward_noncausal(q, k, v, lengths, sm_scale, block_q, block_k)
           if not causal else
           _flash_forward(q, k, v, lengths, causal, sm_scale, block_q, block_k))
    o, m, l = fwd
    return o, (q, k, v, lengths, o, m[:, :, 0], l[:, :, 0])


def _bwd_tile_grads(q, k, v, do, m, l, delta, length, q_start, kv_start,
                    causal, sm_scale):
    """Shared per-tile backward math in the TRANSPOSED frame.

    Computing sT = k·qT (block_k, block_q) keeps the per-Q-row softmax stats
    (m, l, delta — passed as (1, block_q) rows) broadcasting along lanes, so
    neither the stats nor P ever need an in-kernel transpose.
    Returns (pT, dsT): dsT includes sm_scale.
    """
    sT = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (block_k, block_q)
    kv_ids = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 0) + kv_start
    q_ids = jax.lax.broadcasted_iota(jnp.int32, sT.shape, 1) + q_start
    mask = kv_ids < length
    if causal:
        mask = jnp.logical_and(mask, kv_ids <= q_ids)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    pT = jnp.where(mask, jnp.exp(sT - m) * l_inv, 0.0)  # (block_k, block_q)
    dpT = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_k, block_q)
    dsT = pT * (dpT - delta) * sm_scale
    return pT, dsT


def _flash_bwd_dq_kernel(
    lengths_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, delta_ref,
    dq_ref, dq_scratch, *, causal, sm_scale, block_q, block_k,
):
    b = pl.program_id(0)
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scratch[...] = jnp.zeros(dq_scratch.shape, jnp.float32)

    length = lengths_ref[b]
    q_start = q_idx * block_q
    kv_start = kv_idx * block_k
    on_or_below = (q_start + block_q - 1) >= kv_start if causal else True
    should_run = jnp.logical_and(on_or_below, kv_start < length)

    @pl.when(should_run)
    def _run():
        k = k_ref[0, 0]
        _, dsT = _bwd_tile_grads(
            q_ref[0, 0], k, v_ref[0, 0], do_ref[0, 0],
            m_ref[0, 0][:1, :], l_ref[0, 0][:1, :], delta_ref[0, 0][:1, :],
            length, q_start, kv_start, causal, sm_scale,
        )
        dq_scratch[...] = dq_scratch[...] + jax.lax.dot_general(
            dsT, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, D)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    lengths_ref, q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, delta_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch, *, causal, sm_scale, block_q, block_k,
):
    b = pl.program_id(0)
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    length = lengths_ref[b]
    q_start = q_idx * block_q
    kv_start = kv_idx * block_k
    on_or_below = (q_start + block_q - 1) >= kv_start if causal else True
    should_run = jnp.logical_and(on_or_below, kv_start < length)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        pT, dsT = _bwd_tile_grads(
            q, k_ref[0, 0], v_ref[0, 0], do,
            m_ref[0, 0][:1, :], l_ref[0, 0][:1, :], delta_ref[0, 0][:1, :],
            length, q_start, kv_start, causal, sm_scale,
        )
        dv_scratch[...] = dv_scratch[...] + jax.lax.dot(
            pT.astype(do.dtype), do, preferred_element_type=jnp.float32
        )  # (block_k, D)
        dk_scratch[...] = dk_scratch[...] + jax.lax.dot(
            dsT.astype(q.dtype), q, preferred_element_type=jnp.float32
        )  # (block_k, D)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, lengths, o, m, l, do, causal, sm_scale,
                    block_q, block_k):
    """Pallas backward launch: dq kernel + dkv kernel.

    m/l arrive as (B, H, S); delta = rowsum(dO·O). All three are re-broadcast
    to the (B, H, 8, S) sublane-replicated layout the forward already uses for
    its stat outputs (Mosaic wants ≥(8, 128) tiles on the last two dims).
    """
    B, H, S, D = q.shape
    S_kv = k.shape[2]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def rep(x):  # (B,H,S) → (B,H,8,S)
        return jnp.broadcast_to(x[:, :, None, :], (B, H, 8, x.shape[-1]))

    m8, l8, d8 = rep(m), rep(l), rep(delta)
    stat_spec_q = pl.BlockSpec((1, 1, 8, block_q), lambda b, h, qi, ki, *_: (b, h, 0, qi))
    qd_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki, *_: (b, h, qi, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, D), lambda b, h, qi, ki, *_: (b, h, ki, 0))

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, S // block_q, S_kv // block_k),
            in_specs=[qd_spec, kv_spec, kv_spec, qd_spec,
                      stat_spec_q, stat_spec_q, stat_spec_q],
            out_specs=qd_spec,
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(lengths, q, k, v, do, m8, l8, d8)

    # dkv grid iterates kv tiles outer, q tiles inner (accumulation dim last)
    stat_spec_kv = pl.BlockSpec((1, 1, 8, block_q), lambda b, h, ki, qi, *_: (b, h, 0, qi))
    qd_spec_kv = pl.BlockSpec((1, 1, block_q, D), lambda b, h, ki, qi, *_: (b, h, qi, 0))
    kv_spec_kv = pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki, qi, *_: (b, h, ki, 0))
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, causal=causal, sm_scale=sm_scale,
            block_q=block_q, block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, S_kv // block_k, S // block_q),
            in_specs=[qd_spec_kv, kv_spec_kv, kv_spec_kv, qd_spec_kv,
                      stat_spec_kv, stat_spec_kv, stat_spec_kv],
            out_specs=(kv_spec_kv, kv_spec_kv),
            scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                            pltpu.VMEM((block_k, D), jnp.float32)],
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(lengths, q, k, v, do, m8, l8, d8)
    return dq, dk, dv


def _flash_bwd_rule(causal, sm_scale, block_q, block_k, bwd_block_q,
                    bwd_block_k, res, do):
    """Backward via the dedicated Pallas kernels (dq + dkv), with their own
    measured block sizes (independent of the forward's)."""
    q, k, v, lengths, o, m, l = res
    dq, dk, dv = _flash_backward(
        q, k, v, lengths, o, m, l, do, causal, sm_scale,
        bwd_block_q, bwd_block_k,
    )
    return dq, dk, dv, None


def _flash_bwd_scan_rule(causal, sm_scale, block_q, block_k, res, do):
    """Blockwise backward from saved (m, l): recompute P per KV tile with a
    lax.scan — flash memory profile, XLA matmuls. Kept as the numerics oracle
    for the Pallas backward kernels (tests compare all three: XLA autodiff,
    this, and the kernels)."""
    q, k, v, lengths, o, m, l = res
    B, H, S, D = q.shape
    S_kv = k.shape[2]
    n_blocks = S_kv // block_k

    qf = q.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    l_safe = jnp.where(l == 0.0, 1.0, l)[..., None]  # (B,H,S,1)
    m_e = m[..., None]
    d_i = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)  # (B,H,S,1)
    q_pos = jnp.arange(S)[None, None, :, None]

    def body(dq_acc, j):
        ks = jax.lax.dynamic_slice_in_dim(k, j * block_k, block_k, axis=2)
        vs = jax.lax.dynamic_slice_in_dim(v, j * block_k, block_k, axis=2)
        ksf = ks.astype(jnp.float32)
        vsf = vs.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, ksf) * sm_scale
        kv_pos = j * block_k + jnp.arange(block_k)[None, None, None, :]
        mask = kv_pos < lengths[:, None, None, None]
        if causal:
            mask = mask & (kv_pos <= q_pos)
        p = jnp.where(mask, jnp.exp(s - m_e) / l_safe, 0.0)  # (B,H,S,bk)
        dp = jnp.einsum("bhqd,bhkd->bhqk", dof, vsf)
        ds = p * (dp - d_i) * sm_scale
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, ksf)
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p, dof)
        return dq_acc, (dk_j, dv_j)

    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        body, jnp.zeros_like(qf), jnp.arange(n_blocks)
    )
    # (n_blocks, B, H, bk, D) → (B, H, S_kv, D)
    dk = jnp.moveaxis(dk_blocks, 0, 2).reshape(B, H, S_kv, D)
    dv = jnp.moveaxis(dv_blocks, 0, 2).reshape(B, H, S_kv, D)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_attention_diff.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def default_blocks(seq_len: int, kv_len: int, causal: bool) -> tuple:
    """Measured-on-v5e block heuristic (OPTIMIZATIONS.md block sweeps).

    128×128 tiles underutilize the MXU (especially at head_dim 64); large
    tiles win everywhere:
    - non-causal (encoders): (768, kv_len) — full-row KV per Q tile, fat Q
      tiles (r3 sweep at 6×20×1536×64, scripts/sweep_flash_encoder.py:
      768/1536 1.097 ms vs 512/1536 1.204 vs 1536/1536 1.350; r2 sweep:
      512/1536 5.7 ms vs 9.0 XLA / 19.9 at 128×128 on 24×8×1536×64);
    - causal (prefill): (512, 1024) — r3 sweep at the 7B prefill shape
      (scripts/sweep_flash_causal.py, 4×32×1024×128): 512/1024 0.725 ms vs
      the old 256/512 default 0.975; 512-row Q tiles keep diagonal
      block-skipping meaningful at longer S where 1024/1024 (0.708 there)
      would compute the full square.
    """

    def pick(target, n):
        for b in (target, 768, 512, 256, 128):
            if b <= n and n % b == 0:
                return b
        return n

    if causal:
        return pick(512, seq_len), pick(1024, kv_len)
    return pick(768, seq_len), pick(kv_len, kv_len)


def default_bwd_blocks(seq_len: int, kv_len: int, causal: bool) -> tuple:
    """Measured backward block heuristic (scripts/sweep_flash_bwd.py, v5e).

    The backward kernels accumulate over the *other* axis of the grid, so the
    forward's huge-KV-tile choice is not optimal there. r4 sweep at the REAL
    production shapes: causal 7B-train 4×32×1024×128 → best (256,256),
    423 ms = 1.16× XLA autodiff (the r2 winner at the bench shape holds);
    non-causal whisper-large 6×20×1536×64 → best (256,512), 270 ms = 1.66×
    XLA, where the old (256,128) default sat at 425 ms. (The r2 sweep at the
    bench-model shape 24×8×1536×64 had preferred kv=128 — tile choice is
    B/H-dependent; the production shape wins the default.)"""

    def pick(target, n):
        for b in (target, 512, 256, 128):
            if b <= n and n % b == 0:
                return b
        return n

    return pick(256, seq_len), pick(256 if causal else 512, kv_len)


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "block_k",
                              "bwd_block_q", "bwd_block_k")
)
def flash_attention(
    q: jnp.ndarray,  # (B, H, S, D)
    k: jnp.ndarray,  # (B, H, S_kv, D)
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid KV length; None = all
    causal: bool = True,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    bwd_block_q: Optional[int] = None,
    bwd_block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention (differentiable). Requires S % block_q == 0,
    S_kv % block_k == 0, D >= 64 (use ops.attention otherwise). Forward and
    backward block sizes default to their own measured heuristics
    (``default_blocks`` / ``default_bwd_blocks``)."""
    B, H, S, D = q.shape
    S_kv = k.shape[2]
    bq, bk = default_blocks(S, S_kv, causal)
    if block_q is None:
        block_q = bq
    if block_k is None:
        block_k = bk
    bbq, bbk = default_bwd_blocks(S, S_kv, causal)
    if bwd_block_q is None:
        bwd_block_q = bbq
    if bwd_block_k is None:
        bwd_block_k = bbk
    if sm_scale is None:
        sm_scale = D**-0.5
    if lengths is None:
        lengths = jnp.full((B,), S_kv, jnp.int32)
    lengths = lengths.astype(jnp.int32)
    return _flash_attention_diff(q, k, v, lengths, causal, sm_scale,
                                 block_q, block_k, bwd_block_q, bwd_block_k)


def flash_attention_usable(seq_len: int, head_dim: int, block: int = 128) -> bool:
    """Whether the Pallas kernel can serve these shapes on this backend.

    head_dim needs no 128 alignment — blocks span the full D, which Mosaic
    accepts (verified on-device at D=64); require a multiple of 64 to stay on
    well-tiled layouts. Pallas-Mosaic only lowers on TPU, so non-TPU backends
    (CPU smoke runs, the 8-device virtual mesh) fall back to XLA attention."""
    if jax.default_backend() != "tpu":
        return False
    return head_dim % 64 == 0 and head_dim >= 64 and seq_len % block == 0


# ---------------------------------------------------------------------------
# Gated-bias flash forward (BEATs/WavLM attention). Forward-only: SALMONN
# freezes the audio encoders (training/step.DEFAULT_TRAINABLE_KEYS), so no
# VJP is needed — gradients never traverse BEATs attention.
# ---------------------------------------------------------------------------


def _flash_bias_kernel(
    lengths_ref,  # scalar prefetch: (B,) int32 valid KV length
    grep_a_ref,  # scalar prefetch: (H,) f32 per-head gate multiplier
    q_ref,  # (1, 1, block_q, D)
    k_ref,  # (1, 1, block_k, D)
    v_ref,  # (1, 1, block_k, D)
    xh_ref,  # (1, 1, block_q, D) raw layer input split per head (gate input)
    bias_ref,  # (1, block_q, block_k) f32 shared rel-pos bias for this head
    gw_ref,  # (D, 8) f32 grep_linear weight
    gb_ref,  # (1, 8) f32 grep_linear bias
    mrow_ref,  # (1, 1, block_k) f32 additive key mask row for this sample
    o_ref,  # (1, 1, block_q, D)
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
):
    """Non-causal flash attention with the WavLM gated relative position
    bias computed IN-KERNEL: scale = sigmoid(Σ₄ proj[:4]) · (sigmoid(Σ₄
    proj[4:]) · grep_a[h] − 1) + 2 per query row, s += scale · bias. The
    (B, H, T, T) logits/bias tensors never exist in HBM (the XLA fallback
    materializes both — measured 100 ms of the 278 ms BEATs forward at
    salmonn-7b shapes).

    VPU diet (r4): the kernel is VPU-bound, not HBM-bound (analytic ~0.88 ms
    of elementwise work vs 0.51 ms HBM floor at the BEATs shape), so the
    per-element chain is kept minimal — the key mask arrives as a
    PRECOMPUTED additive (B, S) row (1 add/elem, replacing the old
    iota+compare+where ≈ 3 ops/elem) and sm_scale folds into q host-side
    when it is a power of two (exact in bf16)."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    kv_idx = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    length = lengths_ref[b]
    kv_start = kv_idx * block_k

    @pl.when(kv_start < length)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if sm_scale != 1.0:
            s = s * sm_scale

        # per-row gate from the raw layer input (WavLM gru_rel_pos fast path)
        xh = xh_ref[0, 0].astype(jnp.float32)  # (block_q, D)
        proj = jax.lax.dot(xh, gw_ref[...], preferred_element_type=jnp.float32)
        proj = proj + gb_ref[...]
        ga = jax.nn.sigmoid(jnp.sum(proj[:, :4], axis=1, keepdims=True))
        gb = jax.nn.sigmoid(jnp.sum(proj[:, 4:8], axis=1, keepdims=True))
        # log2e folded into the SCALE constants (grep_a arrives pre-scaled),
        # so scale·bias lands in the exp2 domain while the bf16 bias table
        # keeps its plain quantization (bit-matching the XLA fallback's)
        scale = ga * (gb * grep_a_ref[h] - LOG2E) + 2.0 * LOG2E  # (block_q, 1)
        s = s + scale * bias_ref[0].astype(jnp.float32)
        s = s + mrow_ref[0]  # additive key mask, broadcast over rows
        _online_softmax_update(s, v_ref[0, 0], m_scratch, l_scratch,
                               acc_scratch, exp2_domain=True)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _flash_bias_batch_kernel(
    lengths_ref,  # scalar prefetch: (B,) int32 valid KV length
    grep_a_ref,  # scalar prefetch: (H,) f32 per-head gate multiplier
    q_ref,  # (B, 1, block_q, D)
    k_ref,  # (B, 1, block_k, D)
    v_ref,  # (B, 1, block_k, D)
    xh_ref,  # (B, 1, block_q, D)
    bias_ref,  # (1, block_q, block_k) shared rel-pos bias for this head
    gw_ref,  # (D, 8) f32
    gb_ref,  # (1, 8) f32
    o_ref,  # (B, 1, block_q, D)
    m_scratch,  # (B, block_q, MIN_LANES) f32
    l_scratch,  # (B, block_q, MIN_LANES) f32
    acc_scratch,  # (B, block_q, D) f32
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
    batch: int,
):
    """Batch-blocked variant of ``_flash_bias_kernel``: one program owns ALL
    batch elements of a (head, q-tile, kv-tile) cell, so the shared bias tile
    is fetched from HBM once per cell instead of once per (batch, cell).

    Why this matters: at the BEATs-large bench shape (6×12×1536×64) the bias
    is (12, 1536, 1536) — per-batch streaming reads 6×57 MB = 340 MB of the
    kernel's ~410 MB total HBM traffic, pinning it at ~39% MFU. Reading the
    bias once cuts traffic to ~130 MB and leaves the D=64 MXU bound as the
    limiter. (The r3 batch-innermost GRID reorder was measured WORSE — Mosaic
    can't reuse a block across grid steps; an in-kernel loop can.)"""
    h = pl.program_id(0)
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    kv_start = kv_idx * block_k
    # hoisted: one bias read serves every batch element below
    bias = bias_ref[0].astype(jnp.float32)
    for b in range(batch):

        @pl.when(kv_start < lengths_ref[b])
        def _run(b=b):
            q = q_ref[b, 0]
            k = k_ref[b, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if sm_scale != 1.0:
                s = s * sm_scale
            xh_b = xh_ref[b, 0].astype(jnp.float32)
            proj = jax.lax.dot(xh_b, gw_ref[...],
                               preferred_element_type=jnp.float32)
            proj = proj + gb_ref[...]
            ga = jax.nn.sigmoid(jnp.sum(proj[:, :4], axis=1, keepdims=True))
            gb = jax.nn.sigmoid(jnp.sum(proj[:, 4:8], axis=1, keepdims=True))
            # grep_a pre-scaled by log2e; see _flash_bias_kernel
            scale = ga * (gb * grep_a_ref[h] - LOG2E) + 2.0 * LOG2E
            s = s + scale * bias
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_start
            s = s + jnp.where(col_ids < lengths_ref[b], 0.0, MASK_VALUE)
            _online_softmax_update(
                s, v_ref[b, 0],
                m_scratch.at[b], l_scratch.at[b], acc_scratch.at[b],
                exp2_domain=True)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        for b in range(batch):
            l = l_scratch[b][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[b, 0] = (acc_scratch[b] * l_inv).astype(o_ref.dtype)


def _gated_bias_batched_call(q, k, v, xh, bias, grep_w, grep_b, grep_a,
                             lengths, sm_scale, bq, bk):
    B, H, S, D = q.shape
    grid = (H, S // bq, S // bk)
    kernel = functools.partial(
        _flash_bias_batch_kernel, sm_scale=sm_scale, block_q=bq, block_k=bk,
        batch=B)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((B, 1, bq, D), lambda h, qi, ki, *_: (0, h, qi, 0)),
                pl.BlockSpec((B, 1, bk, D), lambda h, qi, ki, *_: (0, h, ki, 0)),
                pl.BlockSpec((B, 1, bk, D), lambda h, qi, ki, *_: (0, h, ki, 0)),
                pl.BlockSpec((B, 1, bq, D), lambda h, qi, ki, *_: (0, h, qi, 0)),
                pl.BlockSpec((1, bq, bk), lambda h, qi, ki, *_: (h, qi, ki)),
                pl.BlockSpec((D, 8), lambda h, qi, ki, *_: (0, 0)),
                pl.BlockSpec((1, 8), lambda h, qi, ki, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (B, 1, bq, D), lambda h, qi, ki, *_: (0, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((B, bq, MIN_LANES), jnp.float32),
                pltpu.VMEM((B, bq, MIN_LANES), jnp.float32),
                pltpu.VMEM((B, bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(lengths.astype(jnp.int32), grep_a.astype(jnp.float32),
      q, k, v, xh, bias.astype(jnp.bfloat16),
      grep_w.astype(jnp.float32), grep_b.reshape(1, 8).astype(jnp.float32))


def flash_attention_gated_bias(
    q: jnp.ndarray,  # (B, H, S, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    xh: jnp.ndarray,  # (B, H, S, D) raw layer input split per head
    bias: jnp.ndarray,  # (H, S, S) f32 rel-pos bias (shared over batch)
    grep_w: jnp.ndarray,  # (D, 8)
    grep_b: jnp.ndarray,  # (8,)
    grep_a: jnp.ndarray,  # (H,)
    lengths: jnp.ndarray,  # (B,) valid KV lengths
    sm_scale: Optional[float] = None,
    block_q: int = 768,
    block_k: int = 1536,
    batch_block: Optional[bool] = None,  # opt-in (measured negative at BEATs shape)
    batch_block_q: Optional[int] = None,  # explicit batched-path tiles
    batch_block_k: Optional[int] = None,  # (sweep override; None = auto)
) -> jnp.ndarray:
    """BEATs/WavLM gated-rel-pos attention, flash-style (forward only).

    Default blocks from the r3 sweep at the BEATs-large shape
    (scripts/sweep_gated_bias.py, 6×12×1536×64 bf16): (768, 1536) 0.809 ms
    vs the old (256, 512) 2.093 ms — 2.6×. Small KV tiles re-stream the
    q/xh tiles and underfill the MXU. Tiles auto-shrink when the estimated
    per-program VMEM footprint exceeds the scoped budget (f32 inputs at
    D=128 overflow the 16 MB limit at the full (768, 1536) default —
    measured 16.93M on the v5e; production bf16/D=64 keeps the fat tiles)."""
    B, H, S, D = q.shape
    if sm_scale is None:
        sm_scale = D**-0.5
    if S % 128:
        raise ValueError(f"flash_attention_gated_bias needs S % 128 == 0, got {S}")

    # exp2 domain (r4): scores reach the softmax PRE-multiplied by log2(e) —
    # sm_scale·log2e folds into q host-side and log2e into the gate-scale
    # constants (grep_a pre-scaled; the bias table keeps its plain bf16
    # quantization so the XLA-fallback parity bound is unchanged), so the
    # VPU-bound kernel's transcendental becomes exp2 (no per-element
    # ·sm_scale or ·log2e multiplies) and runs in v.dtype (bf16 = 2 lanes
    # per VPU slot). The mask rows need no scaling: 0 and −1e30 work in
    # either domain. Forward-only kernels, so log2-domain m/l are fine.
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    sm_scale = 1.0
    grep_a = grep_a.astype(jnp.float32) * LOG2E
    bias = bias.astype(jnp.bfloat16)

    # batch-blocked path: one program per (h, q-tile, kv-tile) owns all B
    # batch elements → the shared bias tile is read once per cell, not once
    # per (b, cell). MEASURED NEGATIVE at the BEATs-large shape
    # (scripts/sweep_gated_bias_batched.py, 6×12×1536×64): best batched tile
    # (384,768) = 1.521 ms vs per-batch 0.973 ms — the unrolled in-kernel
    # batch loop serializes the VPU-heavy softmax work and Mosaic loses
    # cross-program pipelining; fat tiles OOM the scoped VMEM stack
    # ((256,1536) measured 16.57 MB vs the 16 MB limit). The kernel is NOT
    # bias-bandwidth-bound: per-program traffic is ~3 MB vs 6.75 µs measured
    # (~54% of the HBM roofline) with the (tq,tk) exp/mask/softmax VPU chain
    # as the co-limiter. Kept as an explicit opt-in for future shapes where
    # B is large and tiles are small; do NOT auto-enable.
    isz = q.dtype.itemsize

    def _batch_tile_bytes(tq, tk):
        io = B * 2 * (tq + tk) * D * isz + tq * tk * 2  # q,xh,k,v + bf16 bias
        out = B * tq * D * isz
        scratch = B * tq * (2 * MIN_LANES + D) * 4
        score = tq * tk * 4 + tq * tk * 2  # f32 s + bf16 p per batch step
        return 2 * (io + out) + scratch + score

    if batch_block:
        if batch_block_q is not None and batch_block_k is not None:
            cand = (batch_block_q, batch_block_k)  # sweep override
        else:
            # KV traffic scales with S/tq (k/v re-streamed per q-tile) while
            # the bias is read exactly once at any tile size, so prefer the
            # fattest q tile; tk only has to keep the per-iteration (tq, tk)
            # stack intermediates inside the Mosaic scoped limit
            cand = None
            divs = [d for d in range(S, 0, -128) if S % d == 0]
            for tq in divs:
                for tk in divs:
                    if _batch_tile_bytes(tq, tk) <= 14_500_000:
                        cand = (tq, tk)
                        break
                if cand:
                    break
        if cand is None:
            raise ValueError(
                f"gated-bias batch_block requested but no tile fits VMEM "
                f"(B={B}, S={S}, D={D}, itemsize={isz})")
        return _gated_bias_batched_call(
            q, k, v, xh, bias, grep_w, grep_b, grep_a, lengths,
            sm_scale, *cand)

    bq = next(b for b in range(min(block_q, S), 0, -128) if S % b == 0)
    bk = next(b for b in range(min(block_k, S), 0, -128) if S % b == 0)

    # estimated per-program VMEM (double-buffered operands + f32 scratch);
    # the Mosaic scoped limit is 16 MB and the compiler adds its own stack,
    # so shrink the larger tile dim while a conservative budget is exceeded
    def _tile_bytes(tq, tk):
        io = (3 * tq * D + 2 * tk * D) * isz + tq * tk * 2 + tq * D * isz
        scratch = tq * (2 * MIN_LANES + D) * 4
        # the kernel's (tq, tk) f32 score intermediate (QK^T + bias, then
        # exp) lives in VMEM too — without it the estimate trailed the
        # measured footprint by ~28% (est 12.2 MB vs 16.93 MB measured for
        # f32/D=128 at (768, 1536) on v5e)
        score = tq * tk * 4
        return 2 * io + scratch + score

    # calibrated against the measured Mosaic footprint: f32/D=128 at
    # (768, 1536) estimates 16.9 MB here vs 16.93 MB measured; threshold
    # leaves ~1.5 MB under the 16 MB scoped limit for compiler stack while
    # keeping the production bf16/D=64 fat tiles (est 12.0 MB) intact
    while _tile_bytes(bq, bk) > 14_500_000 and (bq > 128 or bk > 128):
        if bk >= bq and bk > 128:
            bk = next(b for b in range(bk - 128, 0, -128) if S % b == 0)
        else:
            bq = next(b for b in range(bq - 128, 0, -128) if S % b == 0)
    # precomputed additive key mask (B, 1, S): one broadcast add per element
    # in the kernel instead of iota+compare+where
    mask_rows = jnp.where(
        jnp.arange(S, dtype=jnp.int32)[None, :] < lengths[:, None].astype(jnp.int32),
        0.0, MASK_VALUE).astype(jnp.float32)[:, None, :]
    grid = (B, H, S // bq, S // bk)
    kernel = functools.partial(
        _flash_bias_kernel, sm_scale=sm_scale, block_q=bq, block_k=bk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, qi, ki, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, bk, D), lambda b, h, qi, ki, *_: (b, h, ki, 0)),
                pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
                pl.BlockSpec((1, bq, bk), lambda b, h, qi, ki, *_: (h, qi, ki)),
                pl.BlockSpec((D, 8), lambda b, h, qi, ki, *_: (0, 0)),
                pl.BlockSpec((1, 8), lambda b, h, qi, ki, *_: (0, 0)),
                # middle singleton keeps Mosaic's block rule happy: the
                # block's dim -2 (1) equals the array's, dim -1 is 128-mult
                pl.BlockSpec((1, 1, bk), lambda b, h, qi, ki, *_: (b, 0, ki)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, D), lambda b, h, qi, ki, *_: (b, h, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((bq, MIN_LANES), jnp.float32),
                pltpu.VMEM((bq, MIN_LANES), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(lengths.astype(jnp.int32), grep_a.astype(jnp.float32),
      q, k, v, xh, bias,  # bf16 (halves the dominant HBM read), ·log2e folded
      grep_w.astype(jnp.float32), grep_b.reshape(1, 8).astype(jnp.float32),
      mask_rows)


def _flash_bias_rows_kernel(
    q_ref,  # (1, 1, block_q, D) — pre-scaled by sm_scale·log2e
    k_ref,  # (1, 1, S, D) the WHOLE key row for this sample/head
    v_ref,  # (1, 1, S, D)
    scale_ref,  # (1, 1, block_q, 1) f32 per-row gate·log2e (precomputed)
    bias_ref,  # (1, block_q, S) bf16 shared rel-pos bias for this head
    mrow_ref,  # (1, 1, S) f32 additive key mask row for this sample
    o_ref,  # (1, 1, block_q, D)
):
    """Single-KV-pass gated-bias attention (the r5 lean variant).

    Two structural changes vs ``_flash_bias_kernel`` at the production BEATs
    shape (block_k == S, so the online-softmax machinery is dead weight):

    1. grid is (H, n_q, B) with BATCH INNERMOST and the bias block index a
       function of (h, qi) only — consecutive grid steps keep the same bias
       block, so Mosaic skips its DMA and the shared (H, S, S) table is
       fetched once per (head, q-tile) instead of once per (batch, head,
       q-tile). At 6×12×1536×64 that is 340 MB → 57 MB of HBM traffic per
       layer. (The r3 batch-innermost experiment was on the GENERAL kernel,
       whose kv-loop scratch carry forced 'arbitrary' semantics and extra
       work per step; this kernel has no scratch at all.)
    2. the per-row gate arrives PRECOMPUTED (`scale_ref`): the grep_linear
       matmul + sigmoids run once per layer as one fused XLA op over
       (B, H, S) instead of per (q-tile, kv-tile) program, and the kernel
       sheds the gw/gb operands and their VPU chain.

    One-shot softmax (no m/l scratch): s is the COMPLETE score row, so
    max/exp2/sum/PV happen in-register per program.
    """
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + scale_ref[0, 0] * bias_ref[0].astype(jnp.float32)
    s = s + mrow_ref[0]  # additive key mask, broadcast over rows
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2((s - m).astype(v_ref.dtype))  # exp2 domain; bf16 = 2/lane
    l = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    o = jax.lax.dot(p, v_ref[0, 0], preferred_element_type=jnp.float32)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (o * l_inv).astype(o_ref.dtype)


def flash_attention_gated_bias_rows(
    q: jnp.ndarray,  # (B, H, S, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale_rows: jnp.ndarray,  # (B, H, S) f32 gate scale (NOT log2e-scaled)
    bias: jnp.ndarray,  # (H, S, S) rel-pos bias (shared over batch)
    lengths: jnp.ndarray,  # (B,) valid KV lengths
    sm_scale: Optional[float] = None,
    block_q: int = 768,
) -> jnp.ndarray:
    """Gated-bias attention with a HOST-precomputed per-row gate.

    The fast path for BEATs/WavLM when the full KV row fits VMEM (S ≤ ~2k at
    D=64): see ``_flash_bias_rows_kernel``. Falls back tile-compatibly —
    callers should guard with ``flash_bias_rows_usable``."""
    B, H, S, D = q.shape
    if sm_scale is None:
        sm_scale = D**-0.5
    if S % 128:
        raise ValueError(f"flash_attention_gated_bias_rows needs S % 128 == 0, got {S}")
    q = q * jnp.asarray(sm_scale * LOG2E, q.dtype)
    scale_rows = (scale_rows.astype(jnp.float32) * LOG2E)[..., None]  # (B,H,S,1)
    bias = bias.astype(jnp.bfloat16)
    mask_rows = jnp.where(
        jnp.arange(S, dtype=jnp.int32)[None, :] < lengths[:, None].astype(jnp.int32),
        0.0, MASK_VALUE).astype(jnp.float32)[:, None, :]

    bq = next(b for b in range(min(block_q, S), 0, -128) if S % b == 0)
    while _rows_tile_bytes(bq, S, D, q.dtype.itemsize) > 14_500_000 and bq > 128:
        bq = next(b for b in range(bq - 128, 0, -128) if S % b == 0)

    grid = (H, S // bq, B)  # batch INNERMOST: bias block constant across b
    return pl.pallas_call(
        _flash_bias_rows_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda h, qi, b: (b, h, qi, 0)),
                pl.BlockSpec((1, 1, S, D), lambda h, qi, b: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, S, D), lambda h, qi, b: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda h, qi, b: (b, h, qi, 0)),
                pl.BlockSpec((1, bq, S), lambda h, qi, b: (h, qi, 0)),
                pl.BlockSpec((1, 1, S), lambda h, qi, b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, D), lambda h, qi, b: (b, h, qi, 0)),
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            # no cross-step scratch state → every dim is parallel; the grid
            # still runs b innermost, keeping the bias block index constant
            # across consecutive steps so its re-fetch is skipped
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(q, k, v, scale_rows, bias, mask_rows)


def _rows_tile_bytes(bq: int, S: int, D: int, isz: int) -> int:
    """Conservative per-program VMEM estimate for the lean rows kernel:
    double-buffered operands + the (bq, S) f32 score and v-dtype p tiles."""
    io = (bq * D + 2 * S * D) * isz + bq * S * 2 + bq * 4 + S * 4
    out = bq * D * isz
    score = bq * S * 4 + bq * S * isz  # f32 s + p in v.dtype
    return 2 * (io + out) + score


def flash_bias_rows_usable(B: int, H: int, S: int, D: int, itemsize: int = 2) -> bool:
    """True when the lean kernel fits at some bq (S % 128 == 0 and the whole
    KV row + a ≥128-row score tile stay under the VMEM budget)."""
    if S % 128:
        return False
    return _rows_tile_bytes(128, S, D, itemsize) <= 14_500_000


# ---------------------------------------------------------------------------
# Single-position decode attention over the KV cache
# ---------------------------------------------------------------------------


def _decode_kernel(
    lengths_ref,  # scalar prefetch: (B,) int32 attendable positions per sample
    *refs,  # [layer_ref (1,) i32 when stacked,] q_ref (1, hb, 8, D),
    #         k_ref, v_ref ((1,)[stacked] 1, hb, block_k, D), compute dtype or
    #         int8 when quant, [ks_ref, vs_ref ((1,) 1, hb, block_k) f32,]
    #         [kn_ref, vn_ref (1, hb, 1, D) — current-token self column,]
    #         o_ref, m_scratch (hb*8, MIN_LANES) f32, l_scratch same,
    #         acc_scratch (hb*8, D) f32
    sm_scale: float,
    block_k: int,
    quant: bool,
    head_block: int,
    stacked: bool,
    self_kv: bool,
):
    rest = list(refs)
    if stacked:
        rest.pop(0)  # layer index is consumed by the BlockSpec index maps
    q_ref, k_ref, v_ref = rest[:3]
    rest = rest[3:]
    ks_ref = vs_ref = kn_ref = vn_ref = None
    if quant:
        ks_ref, vs_ref = rest[:2]
        rest = rest[2:]
    if self_kv:
        kn_ref, vn_ref = rest[:2]
        rest = rest[2:]
    o_ref, m_scratch, l_scratch, acc_scratch = rest
    # stacked operands carry a leading (1,) layer block dim
    kv = (lambda r, j: r[0, 0, j]) if stacked else (lambda r, j: r[0, j])
    sc = (lambda r, j: r[0, 0, j:j + 1]) if stacked else (lambda r, j: r[0, j:j + 1])
    b = pl.program_id(0)
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    length = lengths_ref[b]
    kv_start = kv_idx * block_k

    @pl.when(kv_start < length)
    def _run():
        # head_block KV heads share this grid step: per-grid-step cost
        # (DMA issue, pipeline bubble) amortizes over a fat
        # (hb·block_k, D) tile — measured 66 GB/s at hb=1 vs ~600 at the
        # ~2-3 MB tile geometry (scripts/probe_kernel_variants.py, and the
        # same lesson as ops/int4_matmul.py's tile-budget policy)
        for j in range(head_block):  # static unroll
            rows = slice(8 * j, 8 * (j + 1))
            q = q_ref[0, j]  # (8, D): rows 0..r-1 real query heads, rest pad
            k = kv(k_ref, j).astype(q.dtype)  # int8 → compute dtype when quant
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale  # (8, block_k)
            if quant:
                # dequant linearity: scaling k rows == scaling score columns
                s = s * sc(ks_ref, j)  # (1, block_k) broadcast
            col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_start
            s = s + jnp.where(col_ids < length, 0.0, MASK_VALUE)
            # v's scales fold into p (NOT into l — the normalizer must sum
            # unscaled probabilities), so _online_softmax_update can't be
            # reused verbatim for the quant case; keep ONE inlined copy.
            m_prev = m_scratch[rows]
            l_prev = l_scratch[rows]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            m_scratch[rows] = m_next
            l_scratch[rows] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            if quant:
                p = p * sc(vs_ref, j)
            pv = jax.lax.dot(p.astype(q.dtype), kv(v_ref, j).astype(q.dtype),
                             preferred_element_type=jnp.float32)
            acc_scratch[rows] = acc_scratch[rows] * alpha[:, :1] + pv

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        if self_kv:
            # the CURRENT token's kv never touched the cache (it is appended
            # once per decode step, outside the layer loop): fold it in as
            # one extra always-valid online-softmax column per head
            for j in range(head_block):
                rows = slice(8 * j, 8 * (j + 1))
                q = q_ref[0, j]
                kn = kn_ref[0, j].astype(q.dtype)  # (1, D)
                s_self = jnp.sum(
                    q.astype(jnp.float32) * kn.astype(jnp.float32),
                    axis=1, keepdims=True) * sm_scale  # (8, 1)
                m_prev = m_scratch[rows]
                l_prev = l_scratch[rows]
                m_next = jnp.maximum(m_prev, s_self)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s_self - m_next[:, :1])  # (8, 1)
                l_scratch[rows] = alpha * l_prev + p
                vn = vn_ref[0, j].astype(jnp.float32)  # (1, D)
                acc_scratch[rows] = acc_scratch[rows] * alpha[:, :1] + p[:, :1] * vn
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o = acc_scratch[...] * l_inv
        o_ref[0] = o.reshape(head_block, 8, o.shape[-1]).astype(o_ref.dtype)


def flash_decode_attention(
    q: jnp.ndarray,  # (B, H, 1, D) — ONE query position per sample
    k: jnp.ndarray,  # (B, Hkv, S, D) KV cache (Hkv divides H; GQA via index map)
    v: jnp.ndarray,  # (B, Hkv, S, D)
    lengths: jnp.ndarray,  # (B,) attendable positions (cur_len + 1)
    sm_scale: Optional[float] = None,
    block_k: int = 512,
    self_kv=None,  # ((B,Hkv,1,D), (B,Hkv,1,D)) current-token kv column
    layer: Optional[jnp.ndarray] = None,  # (1,) i32 → k/v are stacked (L,...)
) -> jnp.ndarray:
    """KV-cached decode attention that streams the cache at HBM rate.

    XLA lowers the M=1 scores/values contractions of single-token decode to
    reduce ops whose throughput sits far below the HBM roofline (measured:
    the whole 7B decode step ran at 38% of roofline while its weight matmuls
    alone run at ~89% — the KV attention read was the eater). This kernel
    tiles the cache along S, keeps the one query resident in VMEM (sublane-
    replicated to 8 rows so every matmul has a legal tile — the 8× MAC
    overcount is free, the stream is bandwidth-bound), and runs the standard
    online softmax per tile. Beyond-length tiles are skipped entirely, so
    short occupants in a long cache pay only for what they attend.

    GQA: the r = H/Hkv query heads that share one KV head ride in the 8
    sublanes of ONE query tile (query head kvh·r+j → row j), so the cache is
    read exactly once per sample per step — the true HBM minimum — instead
    of r× (and never ``repeat_kv``-materialized, which the XLA decode path
    does, replicating the whole cache n_rep× per step for Qwen2). For MHA
    (r=1) the remaining sublanes are padding; the stream is bandwidth-bound
    either way, so the pad rows' MACs are free.

    Reference cost center: the token-by-token HF generate loop,
    ref models/custom_salmon.py:704-720.

    ``layer``/``self_kv``: zero-copy cached-decode mode — see _flash_decode.
    """
    return _flash_decode(q, k, v, None, lengths, sm_scale, block_k,
                         self_kv=self_kv, layer=layer)


# Combined k+v tile byte budget per grid step. Per-grid-step overhead is the
# throughput killer on the v5e (measured: (1-head, 384-row) 196 KB tiles
# stream at 66 GB/s; ~2 MB tiles at ~600 — scripts/probe_kernel_variants.py,
# matching ops/int4_matmul.py's tile-geometry finding), so the launcher packs
# as many KV heads per step as fit the budget. Kept well under VMEM/2 ≈ 8 MB
# (Mosaic double-buffers the pipeline).
_DECODE_TILE_BUDGET = 3_000_000


def _flash_decode(q, k, v, scales, lengths, sm_scale, block_k,
                  self_kv=None, layer=None):
    """Shared launcher for the bf16 and int8-KV decode kernels; ``scales`` is
    None or a ((B, Hkv, S) k-scale, same v-scale) pair.

    ``layer``: (1,) int32 — k/v (and scales) are then the FULL STACKED cache
    with a leading n_layers axis; the kernel streams layer ``layer[0]``
    directly from HBM via the scalar-prefetched block index, so the caller
    never slices the cache (an XLA slice materializes a per-layer copy and,
    inside the decode scan, re-copies the whole cache every step — the
    measured xs/ys eater, scripts/probe_decode_structures.py).

    ``self_kv``: (k_new, v_new) each (B, Hkv, 1, D), the CURRENT token's kv
    (always compute dtype, even over a quantized cache). The kernel folds it
    in as one extra online-softmax column, so the cache append can happen
    once per decode step outside the layer loop; ``lengths`` then counts
    PREVIOUS tokens only (cur_len, not cur_len + 1).
    """
    B, H, Tq, D = q.shape
    stacked = layer is not None
    _, Hkv, S, _ = k.shape[1:] if stacked else k.shape
    if Tq != 1:
        raise ValueError(f"flash decode attention is single-position; Tq={Tq}")
    n_rep = H // Hkv
    if n_rep > 8:
        raise ValueError(f"flash decode attention packs GQA groups into 8 "
                         f"sublanes; H/Hkv={n_rep} > 8")
    if sm_scale is None:
        sm_scale = D**-0.5
    quant = scales is not None
    bk = next(b for b in range(min(block_k, S), 0, -128) if S % b == 0)
    # head-block: largest divisor of Hkv whose combined k+v tile fits the
    # per-step byte budget (≥1 always)
    kv_itemsize = 1 if quant else k.dtype.itemsize
    per_head = 2 * bk * D * kv_itemsize
    # int8-KV scale blocks are (…, hb, bk): Mosaic requires the sublane dim
    # (hb) divisible by 8 or equal to the full Hkv axis — 13B MHA (Hkv=40)
    # would otherwise pick hb=5 and fail to lower
    def _hb_ok(h):
        return (not quant) or h % 8 == 0 or h == Hkv

    cands = [h for h in range(Hkv, 0, -1) if Hkv % h == 0 and _hb_ok(h)]
    hb = next((h for h in cands if h * per_head <= _DECODE_TILE_BUDGET),
              cands[-1])
    if hb * per_head > _DECODE_TILE_BUDGET:
        # quant path with no multiple-of-8 divisor of Hkv small enough:
        # _hb_ok excludes the guaranteed-minimum hb=1, so the fallback can
        # exceed the tile budget — surface it so an unlowered/OOM config is
        # diagnosable instead of failing silently deep in Mosaic
        logging.warning(
            "flash decode: head block hb=%d (Hkv=%d, bk=%d) needs %d bytes "
            "of k+v tile, over the %d budget — int8-KV scale layout forced "
            "the oversize block; expect VMEM pressure or lowering failure",
            hb, Hkv, bk, hb * per_head, _DECODE_TILE_BUDGET)
    # (B, H, 1, D) → (B, Hkv, r, D): row j of group kvh is query head kvh·r+j
    qg = q.reshape(B, Hkv, n_rep, D)
    q8 = jnp.pad(qg, ((0, 0), (0, 0), (0, 8 - n_rep), (0, 0)))
    grid = (B, Hkv // hb, S // bk)
    kernel = functools.partial(_decode_kernel, sm_scale=sm_scale, block_k=bk,
                               quant=quant, head_block=hb, stacked=stacked,
                               self_kv=self_kv is not None)
    if stacked:
        # index maps see the prefetched scalars: (..., lengths_ref, layer_ref)
        kv_spec = pl.BlockSpec((1, 1, hb, bk, D),
                               lambda b, h, ki, lens, lyr: (lyr[0], b, h, ki, 0))
        s_spec = pl.BlockSpec((1, 1, hb, bk),
                              lambda b, h, ki, lens, lyr: (lyr[0], b, h, ki))
        n_prefetch = 2
        prefetch = [lengths.astype(jnp.int32), layer.astype(jnp.int32)]
    else:
        kv_spec = pl.BlockSpec((1, hb, bk, D), lambda b, h, ki, *_: (b, h, ki, 0))
        s_spec = pl.BlockSpec((1, hb, bk), lambda b, h, ki, *_: (b, h, ki))
        n_prefetch = 1
        prefetch = [lengths.astype(jnp.int32)]
    in_specs = [
        pl.BlockSpec((1, hb, 8, D), lambda b, h, ki, *_: (b, h, 0, 0)),
        kv_spec,
        kv_spec,
    ]
    operands = prefetch + [q8, k, v]
    if quant:
        in_specs += [s_spec, s_spec]
        operands += [scales[0].astype(jnp.float32), scales[1].astype(jnp.float32)]
    if self_kv is not None:
        kn, vn = self_kv
        n_spec = pl.BlockSpec((1, hb, 1, D), lambda b, h, ki, *_: (b, h, 0, 0))
        in_specs += [n_spec, n_spec]
        operands += [kn.astype(q.dtype), vn.astype(q.dtype)]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hb, 8, D), lambda b, h, ki, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hb * 8, MIN_LANES), jnp.float32),
                pltpu.VMEM((hb * 8, MIN_LANES), jnp.float32),
                pltpu.VMEM((hb * 8, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, 8, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)
    return out[:, :, :n_rep, :].reshape(B, H, D)[:, :, None, :]


def flash_decode_attention_q8(
    q: jnp.ndarray,  # (B, H, 1, D) — ONE query position per sample
    k8: jnp.ndarray,  # (B, Hkv, S, D) int8 KV cache
    v8: jnp.ndarray,  # (B, Hkv, S, D) int8
    k_s: jnp.ndarray,  # (B, Hkv, S) f32 per-position scales
    v_s: jnp.ndarray,  # (B, Hkv, S) f32
    lengths: jnp.ndarray,  # (B,) attendable positions (cur_len + 1)
    sm_scale: Optional[float] = None,
    block_k: int = 512,
    self_kv=None,  # ((B,Hkv,1,D), (B,Hkv,1,D)) compute-dtype current-token kv
    layer: Optional[jnp.ndarray] = None,  # (1,) i32 → stacked (L,...) cache
) -> jnp.ndarray:
    """``flash_decode_attention`` over an int8-quantized KV cache.

    HBM sees 8-bit KV bytes (the dominant decode stream halves); the int8→
    compute-dtype convert happens in-register per tile, and the per-position
    scales fold in as cheap (8, block_k) column scalings — k's into the raw
    scores, v's into the softmax probs — so no (S, D) dequant multiply ever
    materializes. Same GQA sublane packing / tile skipping as the bf16
    kernel (shared launcher). Beyond-reference: halves decode KV traffic and
    doubles the serving engine's slot capacity at a fixed HBM budget.
    """
    return _flash_decode(q, k8, v8, (k_s, v_s), lengths, sm_scale, block_k,
                         self_kv=self_kv, layer=layer)


# Rows per aliased write block along S. TPU block shapes need the
# second-to-last dim divisible by 8 (and int8's native sublane tile is 32),
# so the kernel writes a 32-row aligned block and masks the target row in —
# 32 rows per (L, B, Hkv) is still ~1e-4 of the cache per step.
_APPEND_ROWS = 32


def _append_kernel(positions_ref, nk_ref, nv_ref, ck_ref, cv_ref,
                   ok_ref, ov_ref):
    # ck/cv blocks are the (aliased) 32-row windows holding the target row —
    # inputs only because input_output_aliases requires the aliased buffers
    # as operands; all rows but positions[b] % 32 are copied back unchanged
    b = pl.program_id(1)
    row = positions_ref[b] % _APPEND_ROWS
    sel = jax.lax.broadcasted_iota(
        jnp.int32, ck_ref.shape[2:], 1) == row  # (Hkv, ROWS, D)
    ok_ref[0, 0] = jnp.where(sel, nk_ref[0, 0, :, 0, :][:, None, :],
                             ck_ref[0, 0])
    ov_ref[0, 0] = jnp.where(sel, nv_ref[0, 0, :, 0, :][:, None, :],
                             cv_ref[0, 0])


def append_kv(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
              new_k: jnp.ndarray, new_v: jnp.ndarray,
              positions: jnp.ndarray):
    """In-place per-sample append into the stacked KV cache.

    cache_k/v: (L, B, Hkv, S, D); new_k/v: (L, B, Hkv, 1, D) — ONE decode
    step's kv for every layer at once (collected as tiny scan ys);
    positions: (B,) write index per sample. Returns the SAME buffers
    (``input_output_aliases``), updated in place: Mosaic rewrites only the
    aligned (Hkv, 32, D) window holding each target row, so the cache never
    moves. An XLA
    dynamic_update_slice here copies the full cache every decode step —
    XLA does not alias DUS through scan-carried buffers (measured +5 ms/step
    at 7B shapes, scripts/probe_decode_structures.py); a scan xs/ys cache
    costs ~12 ms/step. Works for bf16 and int8 caches alike (pure copy —
    the caller pre-quantizes new kv for int8 caches; per-position scale
    planes are cache_bytes/256 and go through plain XLA DUS).
    """
    L, B, Hkv, S, D = cache_k.shape
    if S % _APPEND_ROWS:
        raise ValueError(f"cache length {S} must be a multiple of {_APPEND_ROWS}")
    n_spec = pl.BlockSpec((1, 1, Hkv, 1, D), lambda l, b, pos: (l, b, 0, 0, 0))
    o_spec = pl.BlockSpec((1, 1, Hkv, _APPEND_ROWS, D),
                          lambda l, b, pos: (l, b, 0, pos[b] // _APPEND_ROWS, 0))
    return pl.pallas_call(
        _append_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B),
            in_specs=[n_spec, n_spec, o_spec, o_spec],
            out_specs=[o_spec, o_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype)],
        # operand numbering includes the scalar-prefetch arg: 0=positions,
        # 1=new_k, 2=new_v, 3=cache_k, 4=cache_v → outputs (0=k, 1=v)
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(positions.astype(jnp.int32), new_k.astype(cache_k.dtype),
      new_v.astype(cache_v.dtype), cache_k, cache_v)


def flash_decode_usable(q_shape, kv_shape) -> bool:
    """Gate: TPU backend, single query position, lane-aligned D, S tileable,
    GQA group fits the 8 query sublanes."""
    if jax.default_backend() != "tpu":
        return False
    if len(q_shape) != 4 or len(kv_shape) != 4:
        return False
    B, H, Tq, D = q_shape
    _, Hkv, S, _ = kv_shape
    return (Tq == 1 and D % 128 == 0 and S % 128 == 0
            and Hkv > 0 and H % Hkv == 0 and H // Hkv <= 8)
