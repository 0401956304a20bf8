"""Decoder-only transformer family: LLaMA/Vicuna and Qwen2 in one config space.

TPU-native replacement for the reference's HF Vicuna-13B (inside external
SALMONN; ref: models/custom_salmon.py:630-636,704-720) and Qwen2 LLM
(ref: models/custom_qwen.py:180-234):

- layers stored STACKED (leading axis = layer) and executed with ``lax.scan``
  → one compiled layer body regardless of depth, fast compiles, and a single
  sharding spec for all layers;
- grouped-query attention + RoPE, softmax in f32, bf16-friendly throughout;
- KV cache threaded through scan for O(1) decode steps;
- LoRA as a parallel parameter subtree applied additively inside the matmuls
  (ref PEFT usage: models/custom_qwen.py:69-81), so base weights stay frozen
  and checkpoints store only the adapter (ref: utils/training_utils.py:29-75);
- optional rematerialization of each layer for memory-bound training.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, repeat_kv
from .common import apply_rope, dense_init, embed_init, rms_norm, rope_frequencies, split_keys

logger = logging.getLogger(__name__)


def _warn_remat_degraded(remat, n_layers: int, why: str) -> None:
    """A requested '1inK' spec silently becoming full per-layer remat would
    make backward-recompute regressions untraceable — say so once."""
    logger.warning(
        "remat=%r degraded to full per-layer remat (%s; n_layers=%d): "
        "backward recompute will NOT drop by 1/K", remat, why, n_layers)


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    hidden_dim: int
    head_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    qkv_bias: bool = False  # True for Qwen2
    tie_embeddings: bool = False
    max_seq_len: int = 4096

    @property
    def hd(self) -> int:
        return self.head_dim if self.head_dim is not None else self.dim // self.n_heads


# Canonical small configs. Real-size entries mirror the reference backbones.
DECODER_CONFIGS: Dict[str, DecoderConfig] = {
    # Vicuna-13B (ref backbone: models/custom_salmon.py:30)
    "vicuna-13b": DecoderConfig(
        vocab_size=32000, dim=5120, n_layers=40, n_heads=40, n_kv_heads=40,
        hidden_dim=13824,
    ),
    # Vicuna-7B variant for SALMONN-7B configs
    "vicuna-7b": DecoderConfig(
        vocab_size=32000, dim=4096, n_layers=32, n_heads=32, n_kv_heads=32,
        hidden_dim=11008,
    ),
    # Qwen2-7B LLM half of Qwen2-Audio (ref: models/custom_qwen.py:51)
    "qwen2-7b": DecoderConfig(
        vocab_size=156032, dim=3584, n_layers=28, n_heads=28, n_kv_heads=4,
        hidden_dim=18944, qkv_bias=True, rope_theta=1_000_000.0,
    ),
    # Qwen2-0.5B for the CPU smoke benchmark config (BASELINE.md config #1)
    "qwen2-0.5b": DecoderConfig(
        vocab_size=151936, dim=896, n_layers=24, n_heads=14, n_kv_heads=2,
        hidden_dim=4864, qkv_bias=True, rope_theta=1_000_000.0, tie_embeddings=True,
    ),
    # Tiny test model (TinyTokenizer vocab)
    "tiny": DecoderConfig(
        vocab_size=36764, dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
        hidden_dim=352, max_seq_len=2048,
    ),
    # Benchmark model: head_dim 128 (flash-attention path), ~150M params —
    # the fixed config bench.py measures across rounds
    "bench": DecoderConfig(
        vocab_size=36764, dim=1024, n_layers=8, n_heads=8, n_kv_heads=4,
        hidden_dim=2816, max_seq_len=2048,
    ),
}


def _init_layer(key, cfg: DecoderConfig):
    hd = cfg.hd
    keys = split_keys(key, 7)
    layer = {
        "attn": {
            "wq": dense_init(keys[0], cfg.dim, cfg.n_heads * hd),
            "wk": dense_init(keys[1], cfg.dim, cfg.n_kv_heads * hd),
            "wv": dense_init(keys[2], cfg.dim, cfg.n_kv_heads * hd),
            "wo": dense_init(keys[3], cfg.n_heads * hd, cfg.dim),
        },
        "mlp": {
            "w_gate": dense_init(keys[4], cfg.dim, cfg.hidden_dim),
            "w_up": dense_init(keys[5], cfg.dim, cfg.hidden_dim),
            "w_down": dense_init(keys[6], cfg.hidden_dim, cfg.dim),
        },
        "ln_attn": jnp.ones((cfg.dim,), jnp.float32),
        "ln_mlp": jnp.ones((cfg.dim,), jnp.float32),
    }
    if cfg.qkv_bias:
        layer["attn"]["bq"] = jnp.zeros((cfg.n_heads * hd,), jnp.float32)
        layer["attn"]["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), jnp.float32)
        layer["attn"]["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), jnp.float32)
    return layer


def init_decoder(key, cfg: DecoderConfig) -> Dict[str, Any]:
    """Random-init decoder params; per-layer trees stacked along axis 0."""
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = split_keys(k_layers, cfg.n_layers)
    layers = [_init_layer(k, cfg) for k in layer_keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    params = {
        "tok_embed": embed_init(k_embed, cfg.vocab_size, cfg.dim),
        "layers": stacked,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense_init(k_head, cfg.dim, cfg.vocab_size)
    return params


def init_decoder_quantized(key, cfg: DecoderConfig, dtype=jnp.bfloat16,
                           bits: int = 8, group: int = 128) -> Dict[str, Any]:
    """Random-init decoder directly in the int8/int4 serving layout.

    For benchmarking real-scale (7B/13B) models on one chip: builds the same
    tree quantize_decoder produces — ``{"q","s"}`` (int8) or ``{"q4","s"}``
    (group-wise int4) matmul weights, ``dtype`` embeddings/norms — without
    ever materializing f32 weights (a 7B f32 init would need 27 GB; int8
    needs ~7 GB, int4 ~3.5 GB).
    """
    hd = cfg.hd
    q_out, kv_out = cfg.n_heads * hd, cfg.n_kv_heads * hd

    def qtensor(k, d_in, d_out):
        # generate LAYER BY LAYER: randint's 4-byte random-bits intermediate
        # for a whole stacked tensor is 4x the output (7.6 GB transient for
        # one Qwen2-7B mlp stack — measured OOM); per-layer it is ~d_in*d_out*4
        ks = jax.random.split(k, cfg.n_layers)
        if bits == 4:
            packed = jnp.stack([
                jax.random.randint(ki, (d_in // 2, d_out), 0, 256, jnp.int32
                                   ).astype(jnp.uint8) for ki in ks])
            s = jnp.full((cfg.n_layers, d_in // group, d_out),
                         (d_in**-0.5) / 4.6, jnp.float32)  # nibble std ≈ 4.6
            return {"q4": packed, "s": s}
        q = jnp.stack([
            jax.random.randint(ki, (d_in, d_out), -127, 128, jnp.int8)
            for ki in ks])
        s = jnp.full((cfg.n_layers, d_out), (d_in**-0.5) / 127.0, jnp.float32)
        return {"q": q, "s": s}

    keys = jax.random.split(key, 9)
    layers = {
        "attn": {
            "wq": qtensor(keys[0], cfg.dim, q_out),
            "wk": qtensor(keys[1], cfg.dim, kv_out),
            "wv": qtensor(keys[2], cfg.dim, kv_out),
            "wo": qtensor(keys[3], q_out, cfg.dim),
        },
        "mlp": {
            "w_gate": qtensor(keys[4], cfg.dim, cfg.hidden_dim),
            "w_up": qtensor(keys[5], cfg.dim, cfg.hidden_dim),
            "w_down": qtensor(keys[6], cfg.hidden_dim, cfg.dim),
        },
        "ln_attn": jnp.ones((cfg.n_layers, cfg.dim), jnp.float32),
        "ln_mlp": jnp.ones((cfg.n_layers, cfg.dim), jnp.float32),
    }
    if cfg.qkv_bias:
        layers["attn"]["bq"] = jnp.zeros((cfg.n_layers, q_out), jnp.float32)
        layers["attn"]["bk"] = jnp.zeros((cfg.n_layers, kv_out), jnp.float32)
        layers["attn"]["bv"] = jnp.zeros((cfg.n_layers, kv_out), jnp.float32)
    params = {
        "tok_embed": (embed_init(keys[7], cfg.vocab_size, cfg.dim)).astype(dtype),
        "layers": layers,
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
    }
    if not cfg.tie_embeddings:
        lm = jax.random.randint(keys[8], (cfg.dim, cfg.vocab_size), -127, 128, jnp.int8)
        params["lm_head"] = {
            "q": lm, "s": jnp.full((cfg.vocab_size,), (cfg.dim**-0.5) / 127.0, jnp.float32)
        }
    return params


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------

LORA_TARGET_SHAPES = {
    "wq": ("dim", "q_out"),
    "wk": ("dim", "kv_out"),
    "wv": ("dim", "kv_out"),
    "wo": ("q_out", "dim"),
    "w_gate": ("dim", "hidden"),
    "w_up": ("dim", "hidden"),
    "w_down": ("hidden", "dim"),
}


@dataclass(frozen=True)
class LoraConfig:
    rank: int = 8
    alpha: float = 16.0
    dropout: float = 0.05  # applied at train time by the training step
    targets: Tuple[str, ...] = ("wq", "wv")  # SALMONN default q/v projections

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _target_dims(cfg: DecoderConfig, name: str) -> Tuple[int, int]:
    hd = cfg.hd
    dims = {
        "dim": cfg.dim,
        "q_out": cfg.n_heads * hd,
        "kv_out": cfg.n_kv_heads * hd,
        "hidden": cfg.hidden_dim,
    }
    d_in, d_out = LORA_TARGET_SHAPES[name]
    return dims[d_in], dims[d_out]


def init_lora(key, cfg: DecoderConfig, lora_cfg: LoraConfig) -> Dict[str, Any]:
    """LoRA adapter tree: per target, stacked (n_layers, ·) A (down) and B (up).

    A ~ N(0, 1/r) fan-in, B = 0 → adapter starts as identity (PEFT convention).
    """
    tree: Dict[str, Any] = {}
    keys = split_keys(key, len(lora_cfg.targets))
    for k, name in zip(keys, lora_cfg.targets):
        d_in, d_out = _target_dims(cfg, name)
        a = jax.random.normal(k, (cfg.n_layers, d_in, lora_cfg.rank)) * (d_in**-0.5)
        b = jnp.zeros((cfg.n_layers, lora_cfg.rank, d_out))
        tree[name] = {"a": a.astype(jnp.float32), "b": b}
    return tree


def stack_lora_bank(adapters) -> Dict[str, Any]:
    """Stack same-shaped LoRA adapter trees into a multi-adapter BANK.

    Bank leaves are (n_layers, n_adapters, ...) — the adapter axis sits
    AFTER the layer axis so the decoder's layer scan slices it away and each
    layer body sees (n_adapters, d_in, r) to gather per-sample adapters from
    (multi-LoRA serving: one slot pool, per-request adapter —
    ``decoder_forward(..., lora=bank, lora_ids=(B,) int32)``). All adapters
    must share rank and targets (pad ranks beforehand if they differ)."""
    if not adapters:
        raise ValueError("stack_lora_bank needs at least one adapter")
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=1), *adapters)


def _proj(x, w, lora_layer, name: str, scaling: float, bias=None,
          lora_ids=None):
    """x @ w (+ bias) with optional additive LoRA delta.

    ``w`` may be a plain array or an int8 ``{"q", "s"}`` dict from
    ops/quant.quantize_decoder (weight-only quantized decode).
    With ``lora_ids`` (B,), ``lora_layer`` holds a bank — leaves
    (n_adapters, d_in, r) — and each sample applies its own adapter."""
    from ..ops.quant import dequant_matmul

    y = dequant_matmul(x, w)
    if lora_layer is not None and name in lora_layer:
        a = lora_layer[name]["a"].astype(x.dtype)
        b = lora_layer[name]["b"].astype(x.dtype)
        if lora_ids is None:
            y = y + ((x @ a) @ b) * scaling
        else:
            # per-sample adapter: gather this layer's (n_adapters, ·, ·)
            # bank rows, then batched GEMMs. The gathered operands are
            # rank-r thin — bytes ≈ B·(d_in + d_out)·r, noise next to the
            # base weight read even at decode batch sizes.
            delta = jnp.einsum("btd,bdr->btr", x, a[lora_ids])
            y = y + jnp.einsum("btr,brd->btd", delta, b[lora_ids]) * scaling
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_forward(
    cfg: DecoderConfig,
    layer,
    lora_layer,
    lora_scaling: float,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    positions: jnp.ndarray,
    inv_freq: jnp.ndarray,
    cache_kv,  # None, (k, v), or (k, v, k_s, v_s): (B, Hkv, T_cache, hd)
    cache_positions,  # None or (B,) write index per sample
    flash_lengths=None,  # (B,) → use the Pallas flash kernel for this prefill
    ring=None,  # (Mesh, axis name) → KV-distributed ring attention
    attn_override=None,  # callable(q, k, v) heads-first — replaces attention
    use_flash_decode=True,  # False → XLA decode attention (GSPMD-partitionable)
    lora_ids=None,  # (B,) → lora_layer is a BANK; per-sample adapter gather
):
    B, T, _ = x.shape
    hd = cfg.hd

    q, k, v = _qkv_heads(cfg, layer, lora_layer, lora_scaling, x, positions,
                         inv_freq, lora_ids)

    new_cache_kv = None
    kv_scales = None  # (k_s, v_s) when the cache is int8-quantized
    if cache_kv is not None:
        quant = len(cache_kv) == 4  # decoder_forward flattens the keyed cache
        if quant:
            from ..ops.quant import quantize_kv

            ck, cv, cks, cvs = cache_kv
            k_st, k_sc = quantize_kv(k)  # (B,Hkv,T,hd) int8 + (B,Hkv,T) f32
            v_st, v_sc = quantize_kv(v)
        else:
            ck, cv = cache_kv
            k_st, v_st = k, v
        if cache_positions is None:
            # prefill: write [0:T) for every sample
            ck = jax.lax.dynamic_update_slice(ck, k_st.astype(ck.dtype), (0, 0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v_st.astype(cv.dtype), (0, 0, 0, 0))
            if quant:
                cks = jax.lax.dynamic_update_slice(cks, k_sc, (0, 0, 0))
                cvs = jax.lax.dynamic_update_slice(cvs, v_sc, (0, 0, 0))
        else:
            # decode: per-sample write position (right-padded prompts differ
            # in length, so each sample appends at its own index)
            def write(c, kv, pos):
                # c: (Hkv, T_cache, hd); kv: (Hkv, T, hd)
                return jax.lax.dynamic_update_slice(c, kv.astype(c.dtype), (0, pos, 0))

            def write_s(c, s, pos):
                # c: (Hkv, T_cache); s: (Hkv, T)
                return jax.lax.dynamic_update_slice(c, s, (0, pos))

            ck = jax.vmap(write)(ck, k_st, cache_positions)
            cv = jax.vmap(write)(cv, v_st, cache_positions)
            if quant:
                cks = jax.vmap(write_s)(cks, k_sc, cache_positions)
                cvs = jax.vmap(write_s)(cvs, v_sc, cache_positions)
        if quant:
            new_cache_kv = (ck, cv, cks, cvs)
            kv_scales = (cks, cvs)
        else:
            new_cache_kv = (ck, cv)
        k_att, v_att = ck, cv
    else:
        k_att, v_att = k, v

    if attn_override is not None and cache_kv is None:
        # sequence-parallel path (parallel/sequence_parallel.py): the caller
        # runs this layer INSIDE shard_map with activations sharded along T
        # and supplies the collective attention (per-shard Q vs rotating KV)
        n_rep = cfg.n_heads // cfg.n_kv_heads
        out = attn_override(
            q, repeat_kv(k.astype(q.dtype), n_rep), repeat_kv(v.astype(q.dtype), n_rep)
        )
    elif ring is not None and cache_kv is None:
        # context-parallel (sp): KV sequence shards rotate over the mesh axis
        # (parallel/ring_attention.py) — prompts past one chip's HBM
        from ..parallel.ring_attention import ring_attention

        mesh, axis = ring
        n_rep = cfg.n_heads // cfg.n_kv_heads
        out = ring_attention(
            q,
            repeat_kv(k.astype(q.dtype), n_rep),
            repeat_kv(v.astype(q.dtype), n_rep),
            mesh, axis_name=axis, lengths=flash_lengths, causal=True,
        )
    elif flash_lengths is not None and cache_positions is None:
        # Pallas flash attention over the CURRENT k/v (identical to attending
        # the cache: positions beyond T are masked anyway).
        from ..ops.flash_attention import flash_attention

        n_rep = cfg.n_heads // cfg.n_kv_heads
        out = flash_attention(
            q,
            repeat_kv(k.astype(q.dtype), n_rep),
            repeat_kv(v.astype(q.dtype), n_rep),
            lengths=flash_lengths,
            causal=True,
        )
    else:
        from ..ops.flash_attention import (
            flash_decode_attention,
            flash_decode_attention_q8,
            flash_decode_usable,
        )

        # use_flash_decode: True (single chip), False (XLA path), or a
        # (Mesh, tp_axis) pair — the kernel is a Mosaic custom call GSPMD
        # cannot auto-partition, so under a mesh it runs per-shard inside
        # shard_map over the KV-head (tp) axis
        shard_ctx = use_flash_decode if isinstance(use_flash_decode, tuple) else None
        if shard_ctx is not None:
            ntp = shard_ctx[0].shape[shard_ctx[1]]
            flash_ok = (
                cfg.n_heads % ntp == 0 and cfg.n_kv_heads % ntp == 0
                and (cfg.n_heads // ntp) % (cfg.n_kv_heads // ntp) == 0
                and flash_decode_usable(
                    (B, cfg.n_heads // ntp, T, hd),
                    (B, cfg.n_kv_heads // ntp) + k_att.shape[2:]))
        else:
            flash_ok = use_flash_decode and flash_decode_usable(q.shape, k_att.shape)
        if flash_ok and cache_positions is not None and T == 1:
            # single-token decode: stream the cache through the Pallas
            # decode kernel at HBM rate (XLA's M=1 contraction lowering runs
            # far below the roofline) — GQA handled by sublane packing, so
            # the cache is read once and never repeat_kv-materialized
            lengths = cache_positions + 1
            if kv_scales is not None:
                kern = lambda q_, k_, v_, ks_, vs_, l_: flash_decode_attention_q8(
                    q_, k_, v_, ks_, vs_, l_)
                args = (q, k_att, v_att, kv_scales[0], kv_scales[1], lengths)
                ranks = (4, 4, 4, 3, 3, 1)
            else:
                kern = lambda q_, k_, v_, l_: flash_decode_attention(q_, k_, v_, l_)
                args = (q, k_att, v_att, lengths)
                ranks = (4, 4, 4, 1)
            if shard_ctx is not None:
                from jax.sharding import PartitionSpec

                from ..parallel.pipeline import shard_map  # rep-checks off

                mesh, axis = shard_ctx
                # heads live on dim 1 of every rank>1 operand; lengths (B,)
                # are replicated
                specs = tuple(
                    PartitionSpec(None, axis) if r > 1 else PartitionSpec()
                    for r in ranks)
                out = shard_map(
                    kern, mesh=mesh, in_specs=specs,
                    out_specs=PartitionSpec(None, axis))(*args)
            else:
                out = kern(*args)
        else:
            if kv_scales is not None:
                # XLA fallback: materialize the dequantized cache
                k_att = k_att.astype(q.dtype) * kv_scales[0][..., None].astype(q.dtype)
                v_att = v_att.astype(q.dtype) * kv_scales[1][..., None].astype(q.dtype)
            k_att = repeat_kv(k_att.astype(q.dtype), cfg.n_heads // cfg.n_kv_heads)
            v_att = repeat_kv(v_att.astype(q.dtype), cfg.n_heads // cfg.n_kv_heads)
            out = dot_product_attention(q, k_att, v_att, mask)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, cfg.n_heads * hd)
    x = _attn_out_mlp(cfg, layer, lora_layer, lora_scaling, x, out, lora_ids)
    return x, new_cache_kv


def _qkv_heads(cfg, layer, lora_layer, lora_scaling, x, positions, inv_freq,
               lora_ids=None):
    """Pre-norm + q/k/v projections + head split + RoPE (shared by the
    scanned layer forward and the zero-copy decode step)."""
    B, T, _ = x.shape
    hd = cfg.hd
    attn = layer["attn"]
    pj = partial(_proj, lora_ids=lora_ids)
    h = rms_norm(x, layer["ln_attn"], cfg.rms_eps)
    q = pj(h, attn["wq"], lora_layer, "wq", lora_scaling, attn.get("bq"))
    k = pj(h, attn["wk"], lora_layer, "wk", lora_scaling, attn.get("bk"))
    v = pj(h, attn["wv"], lora_layer, "wv", lora_scaling, attn.get("bv"))
    q = q.reshape(B, T, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, cfg.n_kv_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, cfg.n_kv_heads, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)
    return q, k, v


def _attn_out_mlp(cfg, layer, lora_layer, lora_scaling, x, out, lora_ids=None):
    """Attention output projection + residual + MLP block (shared)."""
    attn, mlp = layer["attn"], layer["mlp"]
    pj = partial(_proj, lora_ids=lora_ids)
    x = x + pj(out, attn["wo"], lora_layer, "wo", lora_scaling)
    h = rms_norm(x, layer["ln_mlp"], cfg.rms_eps)
    gate = pj(h, mlp["w_gate"], lora_layer, "w_gate", lora_scaling)
    up = pj(h, mlp["w_up"], lora_layer, "w_up", lora_scaling)
    return x + pj(jax.nn.silu(gate) * up, mlp["w_down"], lora_layer,
                  "w_down", lora_scaling)


def init_kv_cache(
    cfg: DecoderConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
    quant: bool = False,
) -> Dict[str, jnp.ndarray]:
    """KV cache tree. ``quant=True`` stores int8 KV + per-position f32 scales
    ({"k","v"} int8, {"k_s","v_s"} (L,B,Hkv,S)) — halves the decode-phase KV
    read and doubles slot capacity; dequant folds into the flash-decode
    kernel (ops/flash_attention.flash_decode_attention_q8)."""
    hd = cfg.hd
    shape = (cfg.n_layers, batch, cfg.n_kv_heads, max_len, hd)
    if quant:
        return {
            "k": jnp.zeros(shape, jnp.int8), "v": jnp.zeros(shape, jnp.int8),
            "k_s": jnp.zeros(shape[:-1], jnp.float32),
            "v_s": jnp.zeros(shape[:-1], jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _remat_policy(remat):
    """Map the ``remat`` option to a jax.checkpoint policy.

    ``True`` → full per-layer remat (recompute everything; the reference's
    gradient_checkpointing, train/train.py:199-208). ``"dots"`` → selective
    remat: weight-matmul outputs are SAVED, only batched dots (the attention
    score/context einsums) and elementwise ops recompute. MEASURED at 7B
    batch 4 / seq 1024 (r4): "dots" needs 22.3 GB HBM — the saved gate/up
    activations are bf16[32,4,1024,11008] = 2.7 GB EACH — and cannot compile
    on a 16 GB v5e; it remains useful at smaller scales / bigger chips.
    ``"1inK"`` (e.g. "1in4") → MIXED-DEPTH remat: K−1 of every K layers are
    checkpointed, the K-th runs plain and lets autodiff save its own
    residuals — backward recompute drops by 1/K for a bounded activation-
    memory increase (the profitable selective axis at this scale: attention
    dots are ~4% of layer FLOPs here, so policy-level selectivity must save
    the matmul outputs, which is exactly what doesn't fit)."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    return None  # full remat


def _mixed_remat_group(remat) -> int:
    """0 when ``remat`` is not a "1inK" spec, else K (>= 2).

    Compile-size tradeoff: the mixed-remat scan body unrolls K layer calls
    per scan step, so the layer HLO is duplicated K times. Compile time and
    program size grow roughly linearly in K — keep K small (2–4 is the
    profitable range at 7B; beyond that the recompute saving per extra K
    shrinks as 1/K while compile cost keeps growing)."""
    if isinstance(remat, str) and remat.startswith("1in"):
        g = int(remat[3:])
        if g < 2:
            raise ValueError(f"1inK remat needs K >= 2, got {remat!r}")
        return g
    return 0


def run_layer_stack(
    cfg: DecoderConfig,
    layers,  # stacked layer tree, leading axis = n_local_layers
    x: jnp.ndarray,  # (B, T, dim)
    mask: jnp.ndarray,
    positions: jnp.ndarray,
    lora=None,  # stacked LoRA tree with the SAME leading axis, or None
    lora_scaling: float = 1.0,
    remat: bool = False,
    flash_lengths: Optional[jnp.ndarray] = None,
    ring=None,  # (Mesh, axis) → ring attention; flash_lengths doubles as lengths
    attn_override=None,  # callable(q, k, v) heads-first — replaces attention
) -> jnp.ndarray:
    """Scan a contiguous sub-stack of decoder layers (no KV cache).

    The building block shared by ``decoder_forward`` (full stack) and
    ``parallel/pipeline.py`` (each pipeline stage runs its local slice of the
    stacked parameters). No final norm."""
    inv_freq = jnp.asarray(rope_frequencies(cfg.hd, cfg.rope_theta))
    use_lora = lora is not None
    n_local = jax.tree_util.tree_leaves(layers)[0].shape[0]
    dummy = jnp.zeros((n_local, 1))

    # ring is bound by CLOSURE (a Mesh is not a traceable array, so it must
    # not pass through jax.checkpoint as an argument — remat+ring crashed)
    def _fwd(cfg, layer, lo, scaling, x, mask, positions, inv_freq, ckv,
             cpos, fl):
        return _layer_forward(cfg, layer, lo, scaling, x, mask, positions,
                              inv_freq, ckv, cpos, fl, ring, attn_override)

    layer_fn = _fwd
    g = _mixed_remat_group(remat)
    if g and n_local % g:
        _warn_remat_degraded(remat, n_local, "stack not divisible by K")
        g = 0  # stack not divisible: degrade to full per-layer remat
        remat = True
    if remat and not g:
        layer_fn = jax.checkpoint(_fwd, static_argnums=(0,),
                                  policy=_remat_policy(remat))

    def call(fn, layer, lo, x):
        x, _ = fn(
            cfg, layer, lo if use_lora else None, lora_scaling, x, mask,
            positions, inv_freq, None, None, flash_lengths,
        )
        return x

    scanned = (layers, lora if use_lora else dummy)
    if g:
        ckpt_fn = jax.checkpoint(_fwd, static_argnums=(0,))
        scanned = jax.tree_util.tree_map(
            lambda a: a.reshape((n_local // g, g) + a.shape[1:]), scanned)

        def scan_body(x, sc):
            # K−1 checkpointed layers, then one plain (saves its residuals)
            for j in range(g):
                layer, lo = jax.tree_util.tree_map(lambda a: a[j], sc)
                x = call(ckpt_fn if j < g - 1 else _fwd, layer, lo, x)
            return x, None
    else:
        def scan_body(x, sc):
            layer, lo = sc
            return call(layer_fn, layer, lo, x), None

    x, _ = jax.lax.scan(scan_body, x, scanned)
    return x


def decoder_forward(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    inputs_embeds: jnp.ndarray,  # (B, T, dim)
    mask: jnp.ndarray,  # (B, 1, T, Tk) boolean
    positions: jnp.ndarray,  # (B, T) rope positions
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_positions: Optional[jnp.ndarray] = None,  # (B,) decode write index
    lora: Optional[Dict[str, Any]] = None,
    lora_scaling: float = 1.0,
    remat: bool = False,
    flash_lengths: Optional[jnp.ndarray] = None,
    ring=None,  # (Mesh, axis) → context-parallel ring attention (no-cache only)
    use_flash_decode: bool = True,  # False → XLA decode attention; required
    # under multi-chip GSPMD jit, where a Mosaic custom call cannot be
    # auto-partitioned (it would force the sharded cache to replicate)
    lora_ids: Optional[jnp.ndarray] = None,  # (B,) → ``lora`` is a BANK
    # (stack_lora_bank leaves (n_layers, n_adapters, ·)); each sample applies
    # its own adapter — multi-LoRA serving
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Run the decoder stack. Returns (hidden_states, updated_cache).

    ``flash_lengths`` switches prefill attention to the Pallas flash kernel
    (requires head_dim ≥ 128 and seq multiple of 128; inference path only).
    ``ring=(mesh, axis)`` runs attention context-parallel over the mesh axis
    (parallel/ring_attention.py; cacheless forward only) — ``flash_lengths``
    then supplies the per-sample valid lengths."""
    inv_freq = jnp.asarray(rope_frequencies(cfg.hd, cfg.rope_theta))
    x = inputs_embeds
    use_lora = lora is not None
    use_cache = cache is not None
    if (use_cache and cache_positions is not None
            and inputs_embeds.shape[1] == 1
            and use_flash_decode in (True, "xla")):
        from ..ops.flash_attention import flash_decode_usable

        B = inputs_embeds.shape[0]
        # "xla": zero-copy layout with the fused-slice XLA attention instead
        # of the Pallas kernel (usable on any backend — no Mosaic gate)
        if use_flash_decode == "xla":
            return _decode_step_zero_copy(
                cfg, params, inputs_embeds, positions, cache, cache_positions,
                inv_freq, lora, lora_scaling, lora_ids, attn_mode="xla")
        if flash_decode_usable((B, cfg.n_heads, 1, cfg.hd),
                               (B, cfg.n_kv_heads) + cache["k"].shape[-2:]):
            return _decode_step_zero_copy(
                cfg, params, inputs_embeds, positions, cache, cache_positions,
                inv_freq, lora, lora_scaling, lora_ids)
    # Every scanned input needs a leading n_layers axis; absent subtrees get a
    # dummy so the scan signature stays uniform.
    dummy = jnp.zeros((cfg.n_layers, 1))
    kv_quant = use_cache and "k_s" in cache
    if use_cache:
        cache_leaves = (
            (cache["k"], cache["v"], cache["k_s"], cache["v_s"])
            if kv_quant else (cache["k"], cache["v"])
        )
    scanned = (
        params["layers"],
        lora if use_lora else dummy,
        cache_leaves if use_cache else dummy,
    )

    ring_fwd = ring if not use_cache else None

    def _fwd(cfg, layer, lo, scaling, x, mask, positions, inv_freq, ckv,
             cpos, fl):
        # ring and lora_ids bound by closure: a Mesh cannot traverse
        # jax.checkpoint, and lora_ids is layer-invariant
        return _layer_forward(cfg, layer, lo, scaling, x, mask, positions,
                              inv_freq, ckv, cpos, fl, ring_fwd,
                              use_flash_decode=use_flash_decode,
                              lora_ids=lora_ids)

    layer_fn = _fwd
    g = _mixed_remat_group(remat)
    if g and (use_cache or cfg.n_layers % g):
        _warn_remat_degraded(
            remat, cfg.n_layers,
            "KV cache present" if use_cache else "n_layers not divisible by K")
        g = 0  # mixed remat is a training-path option; degrade to full
        remat = True
    if remat and not g:
        layer_fn = jax.checkpoint(_fwd, static_argnums=(0,),
                                  policy=_remat_policy(remat))

    if g:
        ckpt_fn = jax.checkpoint(_fwd, static_argnums=(0,))
        scanned = jax.tree_util.tree_map(
            lambda a: a.reshape((cfg.n_layers // g, g) + a.shape[1:]), scanned)

        def scan_body(x, sc):
            # K−1 checkpointed layers, then one plain (saves its residuals)
            for j in range(g):
                layer, lo, _ = jax.tree_util.tree_map(lambda a: a[j], sc)
                x, _ = (ckpt_fn if j < g - 1 else _fwd)(
                    cfg, layer, lo if use_lora else None, lora_scaling, x,
                    mask, positions, inv_freq, None, None, flash_lengths,
                )
            return x, jnp.zeros(())
    else:
        def scan_body(x, sc):
            layer, lo, ckv = sc
            x, new_kv = layer_fn(
                cfg, layer, lo if use_lora else None, lora_scaling, x, mask,
                positions, inv_freq, ckv if use_cache else None, cache_positions,
                flash_lengths,
            )
            return x, (new_kv if use_cache else jnp.zeros(()))

    x, new_kvs = jax.lax.scan(scan_body, x, scanned)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)

    new_cache = None
    if use_cache:
        new_cache = {"k": new_kvs[0], "v": new_kvs[1]}
        if kv_quant:
            new_cache["k_s"], new_cache["v_s"] = new_kvs[2], new_kvs[3]
    return x, new_cache


def _hoist_q4(layers):
    """Split stacked int4 leaves out of the layer tree for the decode scan.

    Returns ``(xs_tree, hoisted)``: every ``{"q4", "s"}`` dict in ``layers``
    has its packed (L, K/2, N) array moved to ``hoisted`` (path-keyed) and
    the xs copy keeps only the scales. On non-TPU backends (CPU tests) the
    tree is returned untouched — the scan slices as before.
    """
    import jax as _jax

    if _jax.default_backend() != "tpu":
        return layers, {}
    hoisted = {}

    def rec(node, path):
        if isinstance(node, dict) and "q4" in node:
            hoisted[path] = node["q4"]
            return {"s": node["s"]}
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    out = rec(layers, ())
    return (out, hoisted) if hoisted else (layers, {})


def _reinject_q4(layer, hoisted, li):
    """Rebuild the per-layer tree inside the scan body: each hoisted path
    becomes a STACKED int4 dict ({"q4": (L,·,·), "s": this layer's,
    "layer": li}) that ops/quant.dequant_matmul routes to the
    scalar-prefetched kernel read."""

    def rec(node, path):
        if path in hoisted:
            return {"q4": hoisted[path], "s": node["s"], "layer": li}
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        return node

    return rec(layer, ())


def _xla_decode_attn(cfg: DecoderConfig, q, ck, cv, k_self, v_self, lengths,
                     k_s=None, v_s=None):
    """Single-token decode attention over one layer's cache slice, pure XLA.

    q (B, H, 1, hd); ck/cv (B, Hkv, S, hd) — a READ-ONLY lax.scan xs slice of
    the stacked cache (XLA fuses the slice into the matmuls: measured
    844 GB/s physical cache read at 7B decode shapes vs the Pallas
    flash-decode kernel's 348, scripts/profile_decode.py r5). The current
    token's (k_self, v_self) is folded in as one extra softmax column —
    UNQUANTIZED under int8 KV, matching the kernel's semantics. GQA handled
    by grouped einsums (no repeat_kv materialization)."""
    B, H, _, hd = q.shape
    Hkv, S = ck.shape[1], ck.shape[2]
    g = H // Hkv
    qg = q.reshape(B, Hkv, g, hd)
    sm = hd ** -0.5
    # scores over the cache; int8 KV dequant folds AFTER the matmul (the
    # int8→bf16 cast fuses into the operand load; the per-position scale is
    # a rank-1 column correction)
    s_cache = jnp.einsum("bkgd,bksd->bkgs", qg, ck.astype(q.dtype),
                         preferred_element_type=jnp.float32) * sm
    if k_s is not None:
        s_cache = s_cache * k_s[:, :, None, :]
    valid = (jnp.arange(S, dtype=jnp.int32)[None, :]
             < lengths[:, None].astype(jnp.int32))  # (B, S)
    s_cache = jnp.where(valid[:, None, None, :], s_cache, -jnp.inf)
    s_self = jnp.einsum("bkgd,bkd->bkg", qg,
                        k_self.reshape(B, Hkv, hd).astype(q.dtype),
                        preferred_element_type=jnp.float32)[..., None] * sm
    m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True), s_self)
    p_cache = jnp.exp(s_cache - m)
    p_self = jnp.exp(s_self - m)  # (B, Hkv, g, 1)
    l = jnp.sum(p_cache, axis=-1, keepdims=True) + p_self
    if v_s is not None:
        p_cache = p_cache * v_s[:, :, None, :]
    out = jnp.einsum("bkgs,bksd->bkgd", p_cache.astype(q.dtype),
                     cv.astype(q.dtype), preferred_element_type=jnp.float32)
    out = out + p_self * v_self.reshape(B, Hkv, 1, hd).astype(jnp.float32)
    out = out / l
    return out.reshape(B, H, 1, hd).astype(q.dtype)


def _decode_step_zero_copy(
    cfg: DecoderConfig,
    params: Dict[str, Any],
    x: jnp.ndarray,  # (B, 1, dim)
    positions: jnp.ndarray,  # (B, 1)
    cache: Dict[str, jnp.ndarray],
    cache_positions: jnp.ndarray,  # (B,)
    inv_freq: jnp.ndarray,
    lora,
    lora_scaling: float,
    lora_ids,
    attn_mode: str = "flash",  # "flash" (Pallas kernel) | "xla" (fused slice)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single-token cached decode with ZERO cache copies.

    The scanned xs/ys cache of the general path moves the whole cache ~2×
    per decode step (scan slices in, stacked ys out) on top of the attention
    kernel's read — measured ~12 ms/step at 7B shapes, rivaling the weight
    stream itself (scripts/probe_decode_structures.py). Here the cache never
    enters the layer scan: the flash-decode kernel streams layer ``l``
    straight from the stacked HBM buffer (scalar-prefetched block index) and
    folds the CURRENT token's kv in as one extra online-softmax column; the
    scan emits each layer's new kv as tiny ys (L·B·Hkv·D elements), and ONE
    aliased Pallas append (ops/flash_attention.append_kv) writes all layers
    in place after the scan. Numerics: identical to the general path — the
    appended values equal what it would have written pre-attention, and the
    self column equals what it would have read back (for int8-KV caches the
    self column is attended UNQUANTIZED, one step earlier than the general
    path quantizes it — strictly less quantization error).
    """
    from ..ops.flash_attention import (
        append_kv,
        flash_decode_attention,
        flash_decode_attention_q8,
    )

    B = x.shape[0]
    quant = "k_s" in cache
    use_lora = lora is not None
    dummy = jnp.zeros((cfg.n_layers, 1))
    layer_ids = jnp.arange(cfg.n_layers, dtype=jnp.int32)[:, None]  # (L, 1)
    lengths = cache_positions  # PREVIOUS tokens; the self column is separate
    # int4 weights: the packed arrays stay OUT of the scan xs — a scan-xs
    # slice COPIES each layer's packed weights before the Pallas kernel can
    # read them (read + write + kernel read = 3× the weight traffic; at 13B
    # that is the difference between a ~29 ms and a ~16 ms decode step). The
    # kernel instead streams layer ``li`` straight from the stacked HBM
    # buffer (ops/int4_matmul layer=), exactly like the stacked-cache read.
    # Scales (1/128 the bytes) keep riding the scan.
    xs_layers, hoisted_q4 = _hoist_q4(params["layers"])
    xla_attn = attn_mode == "xla"

    def scan_body(x, sc):
        if xla_attn:
            layer, lo, li, ckv = sc
        else:
            layer, lo, li = sc
        if hoisted_q4:
            layer = _reinject_q4(layer, hoisted_q4, li)
        lo = lo if use_lora else None
        q, k, v = _qkv_heads(cfg, layer, lo, lora_scaling, x, positions,
                             inv_freq, lora_ids)
        if quant:
            from ..ops.quant import quantize_kv

            k_st, k_sc = quantize_kv(k)
            v_st, v_sc = quantize_kv(v)
            if xla_attn:
                out = _xla_decode_attn(cfg, q, ckv[0], ckv[1], k, v, lengths,
                                       k_s=ckv[2], v_s=ckv[3])
            else:
                out = flash_decode_attention_q8(
                    q, cache["k"], cache["v"], cache["k_s"], cache["v_s"],
                    lengths, self_kv=(k, v), layer=li)
            new = (k_st, v_st, k_sc, v_sc)
        else:
            if xla_attn:
                out = _xla_decode_attn(cfg, q, ckv[0], ckv[1], k, v, lengths)
            else:
                out = flash_decode_attention(q, cache["k"], cache["v"],
                                             lengths, self_kv=(k, v), layer=li)
            new = (k.astype(cache["k"].dtype), v.astype(cache["v"].dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, cfg.n_heads * cfg.hd)
        x = _attn_out_mlp(cfg, layer, lo, lora_scaling, x, out, lora_ids)
        return x, new

    xs = (xs_layers, lora if use_lora else dummy, layer_ids)
    if xla_attn:
        # the cache rides the scan READ-ONLY (xs, no ys): XLA fuses each
        # layer's slice into the attention matmuls — no materialized copy
        # (the copy danger is ys carrying the cache OUT, which append_kv
        # below replaces)
        ckv_xs = ((cache["k"], cache["v"], cache["k_s"], cache["v_s"])
                  if quant else (cache["k"], cache["v"]))
        xs = xs + (ckv_xs,)
    x, new_kv = jax.lax.scan(scan_body, x, xs)
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    if jax.default_backend() == "tpu":
        ck, cv = append_kv(cache["k"], cache["v"], new_kv[0], new_kv[1],
                           cache_positions)
    else:
        # non-TPU (the "xla" attn mode has no Mosaic gate, so this path runs
        # on CPU in tests): plain per-sample DUS — copies, but correct
        def _dus(c, n, p):  # c (L, Hkv, S, D); n (L, Hkv, 1, D)
            return jax.lax.dynamic_update_slice(c, n, (0, 0, p, 0))

        vw = jax.vmap(_dus, in_axes=(1, 1, 0), out_axes=1)
        ck = vw(cache["k"], new_kv[0], cache_positions)
        cv = vw(cache["v"], new_kv[1], cache_positions)
    new_cache = {"k": ck, "v": cv}
    if quant:
        # scale planes are cache_bytes/256 — a plain per-sample DUS copy is
        # ~0.1 ms at 7B; not worth an aliased kernel (lane-dim-1 blocks)
        def wr_s(c, s, p):  # c (L, Hkv, S); s (L, Hkv, 1)
            return jax.lax.dynamic_update_slice(c, s, (0, 0, p))

        vw = jax.vmap(wr_s, in_axes=(1, 1, 0), out_axes=1)
        new_cache["k_s"] = vw(cache["k_s"], new_kv[2], cache_positions)
        new_cache["v_s"] = vw(cache["v_s"], new_kv[3], cache_positions)
    return x, new_cache


def embed_tokens(params: Dict[str, Any], token_ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Token ids → embeddings (the reference's PEFT-nested embed_tokens access,
    models/custom_salmon.py:190-192, becomes a plain lookup)."""
    return params["tok_embed"].astype(dtype)[token_ids]


def lm_logits(cfg: DecoderConfig, params: Dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
    from ..ops.quant import dequant_matmul

    w = params["tok_embed"].T if cfg.tie_embeddings else params["lm_head"]
    return dequant_matmul(hidden, w)


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100
) -> jnp.ndarray:
    """Mean CE over positions where labels != ignore_index (HF convention,
    ref loss path: models/custom_salmon.py:630-636). Labels are pre-shifted by
    the caller (next-token targets aligned to logits)."""
    mask = labels != ignore_index
    safe_labels = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
