"""Pallas int4×bf16 matmul for the KV-cached decode path.

Decode at 13B scale is pure HBM bandwidth: every generated token reads every
decoder weight once. Weight-only int4 (ops/quant.py, split-half packed,
group-wise scales) quarters those bytes — but only if the nibble unpack FUSES
into the matmul. XLA materializes the unpacked bf16 operand instead (measured
on the v5e: Vicuna-13B decode collapsed to 5.6 tok/s through the XLA unpack
path — worse than just reading bf16). This kernel streams the PACKED tiles
through VMEM and unpacks in-register, so HBM sees exactly the 4-bit bytes.

Schedule (measured iterations):
1. one quant-group (128 rows) per grid step → 540 programs for a 13B w_down;
   per-step overhead capped the stream at 21 GB/s;
2. multi-group tiles with dynamic ``pl.dslice`` into a whole-K x block →
   Mosaic compile exploded (>8 min);
3. (current) x enters PRE-SPLIT as its low/high nibble halves, each with a
   per-step BlockSpec — every in-kernel slice is static. Each grid step
   loads a (block_k, block_n) packed tile covering ``block_k/group`` quant
   groups and unrolls over them: int32 nibble extract (Mosaic has no i8
   vector sub/shift) → two small dots, each scaled by that group's
   per-column scales. Split-half packing (ops/quant.py) means a tile's low
   nibbles are rows [k·bk, k·bk+bk) and its high nibbles the same rows
   offset by K/2 — no row interleave anywhere.

f32 accumulator in VMEM scratch, written once per N tile. Prefill keeps the
XLA unpack path (M is thousands there; the unpack cost amortizes and XLA's
matmul is better at big M).
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# packed-tile byte budget for the default block_n choice (see int4_matmul)
_TILE_BYTES_BUDGET = 2_900_000


def _int4_kernel(*refs, n_k: int, group: int, sub: int, stacked: bool,
                 zero_fold: bool, unpack_u8: bool):
    """One (n, k) grid step: ``sub`` quant groups of packed rows → 2·sub dots.

    Blocks (all static): x_lo/x_hi (M, bk) — this step's input rows for the
    low/high nibbles; w (bk, bn) packed uint8 ((1, bk, bn) when ``stacked`` —
    the layer picked by the scalar-prefetched block index, whose ref leads
    the argument list); s_lo/s_hi (sub, bn) scales.

    ``zero_fold``: the packed nibbles store v+8; the straightforward unpack
    spends 7 VPU ops/byte (u8→i32, and, sub, cast / shift, sub, cast) — more
    VPU time than the tile's HBM stream time, making the kernel unpack-bound
    (~640 GB/s of the 810 roofline, r3). Folding the −8 zero point out of
    the per-element path drops it to 5 ops/byte: dot with the UNSIGNED
    nibbles, then correct with the rank-1 term 8·Σ_rows(x)·s (per group;
    O(M·bn) — negligible at decode M). Exact same math in f32:
    Σ x(w−8)·s = (Σ x·w)·s − 8·(Σ x)·s.

    ``unpack_u8``: additionally skip the up-front uint8→int32 widening and
    mask/shift the uint8 vectors directly (4 ops/byte). MEASURED DEAD END on
    current Mosaic (r4, scripts/probe_int4_bw.py U8=1): lowering rejects the
    uint8→bfloat16 vector cast (`NotImplementedError: Unsupported cast`), and
    routing through an intermediate widen re-adds the op the variant exists
    to remove. Kept as a flag so the A/B reruns trivially if Mosaic grows
    the cast; zero_fold's 5 ops/byte is the production path."""
    if stacked:  # leading scalar-prefetch ref (the layer index)
        _, x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref, acc = refs
    else:
        x_lo_ref, x_hi_ref, w_ref, s_lo_ref, s_hi_ref, o_ref, acc = refs
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

    dot = functools.partial(jax.lax.dot, preferred_element_type=jnp.float32)
    w_blk = w_ref[0] if stacked else w_ref
    for j in range(sub):  # static unroll over the tile's quant groups
        rows = slice(j * group, (j + 1) * group)
        wq = w_blk[rows, :]
        w32 = wq if (zero_fold and unpack_u8) else wq.astype(jnp.int32)
        s_lo = s_lo_ref[0, j:j + 1, :]
        s_hi = s_hi_ref[0, j:j + 1, :]
        if zero_fold:
            lo = (w32 & jnp.asarray(0xF, w32.dtype)).astype(x_lo_ref.dtype)
            hi = (w32 >> jnp.asarray(4, w32.dtype)).astype(x_hi_ref.dtype)
            rs_lo = jnp.sum(x_lo_ref[:, rows].astype(jnp.float32), axis=1,
                            keepdims=True)  # (M, 1)
            rs_hi = jnp.sum(x_hi_ref[:, rows].astype(jnp.float32), axis=1,
                            keepdims=True)
            acc[...] += (dot(x_lo_ref[:, rows], lo) - 8.0 * rs_lo) * s_lo
            acc[...] += (dot(x_hi_ref[:, rows], hi) - 8.0 * rs_hi) * s_hi
        else:
            lo = ((w32 & 0xF) - 8).astype(x_lo_ref.dtype)
            hi = ((w32 >> 4) - 8).astype(x_hi_ref.dtype)
            acc[...] += dot(x_lo_ref[:, rows], lo) * s_lo
            acc[...] += dot(x_hi_ref[:, rows], hi) * s_hi

    @pl.when(k == n_k - 1)
    def _store():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                block_n: Optional[int] = None,
                block_k: int = 512,
                layer: Optional[jnp.ndarray] = None,
                zero_fold: bool = True,
                unpack_u8: bool = False) -> jnp.ndarray:
    """x (M, K) @ int4-packed weight → (M, N).

    ``packed`` (K/2, N) uint8 split-half nibbles, ``scales`` (K/group, N) f32
    (group inferred; both halves hold whole groups by construction).

    ``layer``: (1,) int32 — ``packed`` is then the FULL STACKED weight with a
    leading n_layers axis and the kernel streams layer ``layer[0]`` straight
    from HBM via the scalar-prefetched block index. Inside the decode layer
    scan this matters a lot: a scan-xs slice of the packed weights
    materializes a per-layer COPY before the kernel can read it (Pallas
    cannot consume a fused dynamic-slice), tripling the physical weight
    traffic (slice read + slice write + kernel read). ``scales`` stays this
    layer's 2D (K/group, N) — per-layer scale slices are 1/128 the bytes and
    may ride the scan.

    Default ``block_n``: the largest 128-multiple divisor of N whose packed
    tile (block_k × block_n bytes) stays ≤ ~2.8 MB. Tile GEOMETRY dominates
    this kernel's throughput on v5e — measured (r3, 500-iter in-jit loop,
    dispatch floor subtracted): N=11008 bn=256 → 252 GB/s packed vs bn=5504 →
    578 GB/s; N=13824 bn=256 → 263 vs bn=3456..6912 → 558..580. Small bn
    re-reads x N/bn times and pays per-program overhead; tiles much past
    ~3 MB fail Mosaic compilation at bk=512."""
    M, K = x.shape
    stacked = layer is not None
    half, N = packed.shape[1:] if stacked else packed.shape
    n_groups = scales.shape[0]
    group = K // n_groups
    g_half = n_groups // 2
    if block_k < group:
        raise ValueError(f"block_k must be >= group ({group}); got {block_k}")
    bk0 = min(block_k, half) // group * group
    bk = next(b for b in range(bk0, 0, -group) if half % b == 0)
    if block_n is None:
        block_n = max(128, _TILE_BYTES_BUDGET // bk // 128 * 128)
        if M > 64:
            # prefill-sized x (r5: the kernel now also serves serving-bucket
            # prefills, M ≤ 1024): the (M, bn) f32 accumulator and the two
            # (M, bk) x tiles join the VMEM budget — cap bn so the
            # accumulator stays ≤ ~2.5 MB. At 13B this path replaces XLA's
            # per-layer bf16 weight materialization (~0.6 GB/layer transient
            # liveness), which is what OOMed the serving engine's admission.
            block_n = max(128, min(block_n, 2_500_000 // (4 * M) // 128 * 128))
    elif block_n < 128:
        raise ValueError(f"block_n must be >= 128, got {block_n}")
    # largest multiple of 128 ≤ block_n dividing N (exists once the search
    # start is rounded down to the step: N % 128 == 0 is gated — an unaligned
    # caller block size must not skip it)
    bn0 = min(block_n, N) // 128 * 128
    bn = next(b for b in range(bn0, 0, -128) if N % b == 0)
    sub = bk // group
    n_k = half // bk
    grid = (N // bn, n_k)
    kernel = functools.partial(_int4_kernel, n_k=n_k, group=group, sub=sub,
                               stacked=stacked, zero_fold=zero_fold,
                               unpack_u8=unpack_u8)
    x_lo, x_hi = x[:, : K // 2], x[:, K // 2:]
    # scales regrouped per K tile: (n_k, sub, N) so the block's last two dims
    # match the array exactly (Mosaic's sublane rule forbids a bare (sub, bn)
    # block when sub < 8); the kernel indexes rows statically
    s_lo = scales[:g_half].reshape(n_k, sub, N)
    s_hi = scales[g_half:].reshape(n_k, sub, N)
    if stacked:
        # index maps see the prefetched scalar: (n, k, layer_ref)
        w_spec = pl.BlockSpec((1, bk, bn), lambda n, k, lyr: (lyr[0], k, n))
        specs = [
            pl.BlockSpec((M, bk), lambda n, k, lyr: (0, k)),
            pl.BlockSpec((M, bk), lambda n, k, lyr: (0, k)),
            w_spec,
            pl.BlockSpec((1, sub, bn), lambda n, k, lyr: (k, 0, n)),
            pl.BlockSpec((1, sub, bn), lambda n, k, lyr: (k, 0, n)),
        ]
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=specs,
                out_specs=pl.BlockSpec((M, bn), lambda n, k, lyr: (0, n)),
                scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(layer.astype(jnp.int32), x_lo, x_hi, packed, s_lo, s_hi)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, bk), lambda n, k: (0, k)),
            pl.BlockSpec((M, bk), lambda n, k: (0, k)),
            pl.BlockSpec((bk, bn), lambda n, k: (k, n)),
            pl.BlockSpec((1, sub, bn), lambda n, k: (k, 0, n)),
            pl.BlockSpec((1, sub, bn), lambda n, k: (k, 0, n)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x_lo, x_hi, packed, s_lo, s_hi)


def int4_matmul_usable(x_shape, packed_shape, scales_shape,
                       max_rows: int = 1024) -> bool:
    """Kernel gate: TPU backend, decode- or serving-prefill-sized M (≤1024 —
    beyond that the (M, bn) f32 accumulator starves bn below useful tiles
    and the big static-engine prefills amortize XLA's unpack anyway),
    MXU/VPU-friendly tiles."""
    if jax.default_backend() != "tpu":
        return False
    if len(x_shape) != 2 or len(packed_shape) != 2:
        return False
    M, K = x_shape
    half, N = packed_shape
    if M > max_rows or K != half * 2 or N % 128:
        return False
    n_groups = scales_shape[0]
    if K % n_groups or n_groups % 2:
        return False
    group = K // n_groups
    # tiles must be full sublane×lane multiples for Mosaic
    return group % 128 == 0 and half % group == 0
