"""BEATs audio encoder, pure JAX.

TPU-native replacement for the reference's BEATs checkpoint encoder
(ref: models/custom_salmon.py:32,67 — BEATs_iter3_plus_AS2M_finetuned...).

Faithful to the BEATs architecture (microsoft/unilm BEATs, WavLM-lineage
backbone) so the real checkpoint converts exactly:

kaldi-style 128-bin fbank → (x - 15.41663) / (2 * 6.55582) normalization →
16×16 conv patch embedding (stride 16) over (time, freq) → LayerNorm(512) →
linear 512→768 → grouped-conv positional embedding → LayerNorm(768) →
12 post-LN transformer layers with deep-norm residual scaling and **gated
relative position bias** (T5-style bucketed bias shared across layers, WavLM
"gru_rel_pos" per-layer gating) → (B, ~1496, 768).

On 30 s audio the output length is 1496; SALMONN pads it to Whisper's 1500
frames before concatenation (handled by the caller in models/salmonn.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import NEG_INF, dot_product_attention
from .common import dense_init, gelu, layer_norm, split_keys

FBANK_MEAN = 15.41663
FBANK_STD = 6.55582


@dataclass(frozen=True)
class BeatsConfig:
    n_fbank: int = 128
    patch: int = 16
    embed_dim: int = 512
    dim: int = 768
    n_heads: int = 12
    n_layers: int = 12
    conv_pos: int = 128  # conv positional embedding kernel
    conv_pos_groups: int = 16
    mlp_ratio: int = 4
    # Gated relative position bias (the real BEATs config: gru_rel_pos=True,
    # num_buckets=320, max_distance=800). With use_flash, biased attention
    # runs through ops/flash_attention.flash_attention_gated_bias.
    gated_rel_pos: bool = True
    rel_pos_buckets: int = 320
    rel_pos_max_distance: int = 800
    use_flash: bool = False  # pad tokens to a 128 multiple + Pallas flash
    # (plain kernel when gated_rel_pos is off; flash_attention_gated_bias when on)
    # r5 lean single-KV-pass gated-bias kernel (host-precomputed gate,
    # batch-innermost grid → bias fetched once per (head, q-tile)). MEASURED
    # NEGATIVE at the BEATs-large shape (scripts/probe_gated_bias_rows.py,
    # 6×12×1536×64, bq ∈ {256,384,768,1536}): 0.92–1.07 ms vs the general
    # kernel's 0.80–0.93 — the kernel is VPU-bound on the f32 score chain
    # (analytic ~0.86 ms at ~5 f32 ops/elem over 170M score elements), so
    # eliminating the per-batch bias re-fetch buys nothing. Kept opt-in for
    # shapes with much larger B where the bias read dominates.
    lean_bias_flash: bool = False
    # Grouped-conv positional embedding lowering strategy (numerics identical):
    #   "grouped"  — one lax.conv with feature_group_count (XLA's grouped-conv
    #                lowering may expand filters block-diagonally → G× FLOPs)
    #   "unrolled" — G dense convs, one per group (no expansion; small-channel
    #                convs, C/G in→out each)
    #   "im2col"   — time-blocked im2col + per-group GEMM (pure MXU batched
    #                matmul, K·C/G contraction; halo blocks keep the unfold
    #                transient at a few MB)
    # default "unrolled": measured 1.57 ms vs grouped 2.35 / im2col 26.2 per
    # 6-clip chunk on v5e (scripts/profile_prefill.py r4; lowerings are
    # numerically identical)
    conv_pos_impl: str = "unrolled"

    @property
    def deep_norm_alpha(self) -> float:
        return float((2.0 * self.n_layers) ** 0.25)

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


BEATS_CONFIGS: Dict[str, BeatsConfig] = {
    "iter3-as2m": BeatsConfig(),
    "tiny-test": BeatsConfig(dim=64, embed_dim=32, n_heads=4, n_layers=2, conv_pos=16,
                             conv_pos_groups=4, rel_pos_buckets=32, rel_pos_max_distance=16),
}


def kaldi_fbank(
    wav: jnp.ndarray, n_mels: int = 128, frame_length: int = 400, hop: int = 160,
    use_dft: bool = True,
) -> jnp.ndarray:
    """Kaldi-compatible log-mel fbank (snip_edges, povey window, pre-emphasis).

    wav: (B, n_samples) 16 kHz float32 scaled to int16 range (BEATs convention:
    waveform * 2**15 before torchaudio.compliance.kaldi.fbank).
    Returns (B, n_frames, n_mels) with n_frames = (n_samples - 400)//160 + 1.
    """
    B, n = wav.shape
    n_frames = (n - frame_length) // hop + 1
    nfft = 512
    n_freqs = nfft // 2 + 1
    if use_dft:
        # The whole per-frame chain — DC-offset removal, pre-emphasis 0.97
        # (edge-duplicated), povey window, 512-pt real DFT — is LINEAR in
        # the raw frame, so it folds into ONE (400, 514) matrix in float64
        # at cache time (`_kaldi_fused_basis`). Framing then needs no
        # gather (r4): with hop 160 / frame 400, frame i is rows i, i+1 and
        # the first half of row i+2 of the signal viewed as (·, 160) —
        # three contiguous-slice matmuls against 160-row chunks of the
        # fused matrix, summed. Identical math; the old gather materialized
        # a (B, T, 400) tensor and dominated the frontend (~50× the
        # transform's FLOP cost). Precision.HIGHEST keeps the device
        # log-fbank within 7.7e-3 of the rfft path (sub-bf16-resolution
        # for the encoder input; ~1e-6 on CPU).
        M = jnp.asarray(_kaldi_fused_basis(frame_length, nfft))
        hp = jax.lax.Precision.HIGHEST
        n_full = frame_length // hop
        rem = frame_length - n_full * hop
        n_rows = n_frames + n_full + 1
        sig = jnp.pad(wav, ((0, 0), (0, n_rows * hop - n)))
        rows = sig.reshape(B, n_rows, hop)
        dn = (((2,), (0,)), ((), ()))
        spec2 = jax.lax.dot_general(
            rows[:, 0:n_frames], M[:hop], dn, precision=hp)
        for j in range(1, n_full):
            spec2 = spec2 + jax.lax.dot_general(
                rows[:, j:n_frames + j], M[j * hop:(j + 1) * hop], dn,
                precision=hp)
        if rem:
            spec2 = spec2 + jax.lax.dot_general(
                rows[:, n_full:n_frames + n_full, :rem], M[n_full * hop:],
                dn, precision=hp)
        power = spec2[..., :n_freqs] ** 2 + spec2[..., n_freqs:] ** 2
    else:
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(frame_length)[None, :]).astype(np.int32)
        frames = wav[:, idx]  # (B, T, 400)
        # kaldi: remove DC offset, pre-emphasis 0.97 (with edge duplication)
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - 0.97 * prev
        # povey window = hann^0.85 (periodic=False in kaldi: denominator N-1)
        t = np.arange(frame_length)
        hann = 0.5 - 0.5 * np.cos(2 * np.pi * t / (frame_length - 1))
        povey = jnp.asarray((hann**0.85).astype(np.float32))
        frames = frames * povey
        padded = jnp.pad(frames, ((0, 0), (0, 0), (0, nfft - frame_length)))
        spec = jnp.fft.rfft(padded, axis=-1)
        power = spec.real**2 + spec.imag**2  # (B, T, 257)
    fb = jnp.asarray(_htk_mel_bank(nfft // 2 + 1, n_mels))
    mel = power @ fb
    return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))  # kaldi epsilon


@functools.lru_cache(maxsize=2)
def _kaldi_dft_basis(frame_length: int = 400, nfft: int = 512) -> np.ndarray:
    """Real-DFT basis truncated to the unpadded frame rows,
    (frame_length, 2*(nfft//2+1)): [cos | -sin] columns."""
    n_freqs = nfft // 2 + 1
    k = np.arange(frame_length)[:, None]
    f = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * k * f / nfft
    return np.concatenate(
        [np.cos(angle), -np.sin(angle)], axis=1).astype(np.float32)


@functools.lru_cache(maxsize=2)
def _kaldi_fused_basis(frame_length: int = 400, nfft: int = 512) -> np.ndarray:
    """The ENTIRE kaldi per-frame chain as one (frame_length, 2·n_freqs)
    matrix, composed in float64: spec2 = frame_raw @ M with
    M = (I − J/N) · P · diag(povey) · dft_basis, where J/N is the DC-offset
    (mean) removal, P the pre-emphasis 0.97 with kaldi's edge duplication
    (P[0,0] = 0.03), povey = hann(N−1)^0.85."""
    n_freqs = nfft // 2 + 1
    k = np.arange(frame_length, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    angle = 2.0 * np.pi * k * f / nfft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    t = np.arange(frame_length, dtype=np.float64)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * t / (frame_length - 1))) ** 0.85
    # pre-emphasis as a right-multiplication: out[t] = in[t] − 0.97·in[t−1],
    # out[0] = 0.03·in[0] → A[t,t]=1, A[t−1,t]=−0.97, A[0,0]=0.03
    A = np.eye(frame_length)
    A[np.arange(frame_length - 1), np.arange(1, frame_length)] = -0.97
    A[0, 0] = 0.03
    M = A @ (povey[:, None] * basis)
    M = M - M.mean(axis=0, keepdims=True)  # (I − J/N)·M
    return M.astype(np.float32)


def _htk_mel_bank(n_freqs: int, n_mels: int, sr: int = 16000) -> np.ndarray:
    """Kaldi/HTK mel filter bank (no normalization), (n_freqs, n_mels)."""
    def to_mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    def to_hz(m):
        return 700.0 * (np.exp(m / 1127.0) - 1.0)

    low, high = 20.0, sr / 2  # kaldi fbank defaults: low_freq=20
    mel_pts = np.linspace(to_mel(low), to_mel(high), n_mels + 2)
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        left, center, right = to_hz(mel_pts[m]), to_hz(mel_pts[m + 1]), to_hz(mel_pts[m + 2])
        up = (fft_freqs - left) / (center - left)
        down = (right - fft_freqs) / (right - center)
        fb[:, m] = np.maximum(0, np.minimum(up, down))
    return fb.astype(np.float32)


def relative_position_buckets(t: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5-style bidirectional relative-position bucketing, (t, t) int32.

    Matches WavLM/BEATs `_relative_positions_bucket` (bidirectional=True):
    half the buckets for key>query, half for key<=query; within each half the
    first `nb//2` are exact offsets and the rest log-spaced up to max_distance.
    Computed in numpy — `t` is static under jit.
    """
    context = np.arange(t, dtype=np.int64)[:, None]
    memory = np.arange(t, dtype=np.int64)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)  # trunc toward zero, same as torch .to(long)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


def _init_layer(key, cfg: BeatsConfig):
    d = cfg.dim
    keys = split_keys(key, 7)
    inner = cfg.mlp_ratio * d
    layer = {
        "attn": {
            "wq": dense_init(keys[0], d, d), "bq": jnp.zeros((d,)),
            "wk": dense_init(keys[1], d, d), "bk": jnp.zeros((d,)),
            "wv": dense_init(keys[2], d, d), "bv": jnp.zeros((d,)),
            "wo": dense_init(keys[3], d, d), "bo": jnp.zeros((d,)),
        },
        "ln_attn": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "mlp": {
            "w1": dense_init(keys[4], d, inner), "b1": jnp.zeros((inner,)),
            "w2": dense_init(keys[5], inner, d), "b2": jnp.zeros((d,)),
        },
        "ln_mlp": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }
    if cfg.gated_rel_pos:
        layer["attn"]["grep_w"] = dense_init(keys[6], cfg.head_dim, 8)
        layer["attn"]["grep_b"] = jnp.zeros((8,))
        layer["attn"]["grep_a"] = jnp.ones((cfg.n_heads,))
    return layer


def init_beats(key, cfg: BeatsConfig) -> Dict[str, Any]:
    kp, kproj, kpos, kl, kb = jax.random.split(key, 5)
    layers = [_init_layer(k, cfg) for k in split_keys(kl, cfg.n_layers)]
    params = {
        "patch_embed": {
            "w": dense_init(kp, cfg.patch * cfg.patch, cfg.embed_dim).reshape(
                cfg.patch, cfg.patch, 1, cfg.embed_dim
            ),
            "b": jnp.zeros((cfg.embed_dim,)),
        },
        # LayerNorm over the 512-dim patch features (BEATs.layer_norm,
        # applied BEFORE post_extract_proj)
        "ln_patch": {"w": jnp.ones((cfg.embed_dim,)), "b": jnp.zeros((cfg.embed_dim,))},
        "post_proj": {
            "w": dense_init(kproj, cfg.embed_dim, cfg.dim),
            "b": jnp.zeros((cfg.dim,)),
        },
        "conv_pos": {
            "w": dense_init(
                kpos, cfg.conv_pos * (cfg.dim // cfg.conv_pos_groups), cfg.dim
            ).reshape(cfg.conv_pos, cfg.dim // cfg.conv_pos_groups, cfg.dim),
            "b": jnp.zeros((cfg.dim,)),
        },
        # encoder.layer_norm, applied AFTER adding the conv positional embedding
        "ln_pre": {"w": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
    }
    if cfg.gated_rel_pos:
        # shared across layers: BEATs ties every layer's relative_attention_bias
        # to layer 0's embedding table
        params["rel_bias"] = 0.02 * jax.random.normal(
            kb, (cfg.rel_pos_buckets, cfg.n_heads), jnp.float32
        )
    return params


def _conv_pos_grouped(cfg: BeatsConfig, w, x: jnp.ndarray) -> jnp.ndarray:
    pad = cfg.conv_pos // 2
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=((pad, pad),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=cfg.conv_pos_groups,
    )


def _conv_pos_unrolled(cfg: BeatsConfig, w, x: jnp.ndarray) -> jnp.ndarray:
    """G independent dense convs — sidesteps XLA's grouped-conv filter
    expansion (block-diagonal dense conv = G× the FLOPs)."""
    G = cfg.conv_pos_groups
    Cg = x.shape[-1] // G          # input channels per group
    Og = cfg.dim // G              # output channels per group
    pad = cfg.conv_pos // 2
    outs = [
        jax.lax.conv_general_dilated(
            x[..., g * Cg:(g + 1) * Cg], w[:, :, g * Og:(g + 1) * Og],
            window_strides=(1,),
            padding=((pad, pad),),
            dimension_numbers=("NTC", "TIO", "NTC"),
        )
        for g in range(G)
    ]
    return jnp.concatenate(outs, axis=-1)


def _conv_pos_im2col(cfg: BeatsConfig, w, x: jnp.ndarray) -> jnp.ndarray:
    """Time-blocked im2col + per-group GEMM.

    Output block of Tb positions unfolds a (Tb + K - 1) halo slice into a
    (B·Tb, K·Cg) matrix and contracts with the (G, K·Cg, Og) reshaped
    filters — a G-batched MXU GEMM, no conv lowering involved. The unfold
    transient is (B, Tb, K, C) per scan step (a few MB), never the full
    (B, T, K, C) im2col.
    """
    K, G = cfg.conv_pos, cfg.conv_pos_groups
    B, T, C = x.shape
    Cg, Og = C // G, cfg.dim // G
    pad = K // 2
    Tout = T + 2 * pad - K + 1
    Tb = min(128, Tout)
    nb = -(-Tout // Tb)
    # (G, K·Cg, Og): group g's filters are output columns [g·Og, (g+1)·Og)
    wg = w.reshape(K, Cg, G, Og).transpose(2, 0, 1, 3).reshape(G, K * Cg, Og)
    # pad so every block's (Tb + K - 1) halo slice is in range
    x_pad = jnp.pad(x, ((0, 0), (pad, pad + nb * Tb + K - 1 - (T + 2 * pad)), (0, 0)))
    unfold = np.arange(Tb)[:, None] + np.arange(K)[None, :]  # (Tb, K)

    def block(_, i):
        xs = jax.lax.dynamic_slice_in_dim(x_pad, i * Tb, Tb + K - 1, axis=1)
        col = xs[:, unfold]  # (B, Tb, K, C)
        colg = col.reshape(B, Tb, K, G, Cg).transpose(3, 0, 1, 2, 4).reshape(
            G, B * Tb, K * Cg)
        out = jnp.einsum("gmk,gkn->gmn", colg, wg)  # (G, B·Tb, Og)
        return None, out.reshape(G, B, Tb, Og).transpose(1, 2, 0, 3).reshape(B, Tb, C)

    _, blocks = jax.lax.scan(block, None, jnp.arange(nb))  # (nb, B, Tb, C)
    return blocks.transpose(1, 0, 2, 3).reshape(B, nb * Tb, C)[:, :Tout]


_CONV_POS_IMPLS = {
    "grouped": _conv_pos_grouped,
    "unrolled": _conv_pos_unrolled,
    "im2col": _conv_pos_im2col,
}


def _conv_pos_embed(cfg: BeatsConfig, p, x: jnp.ndarray) -> jnp.ndarray:
    """Grouped conv positional embedding (wav2vec2-style)."""
    out = _CONV_POS_IMPLS[cfg.conv_pos_impl](cfg, p["w"].astype(x.dtype), x)
    out = out + p["b"].astype(x.dtype)
    if cfg.conv_pos % 2 == 0:
        out = out[:, :-1]
    return gelu(out)


def _gate_scale_rows(cfg: BeatsConfig, a, x: jnp.ndarray) -> jnp.ndarray:
    """Per-query-row gate scale, (B, H, T) f32 — the WavLM gru_rel_pos gate.

    Gate input is the raw layer input split into heads (the non-incremental
    fast path in WavLM/BEATs MultiheadAttention, as validated by HF's WavLM
    port): sigmoid(sum-of-4 pairs of grep_linear(x_heads)) → gates a,b;
    scale = a * (b * grep_a - 1) + 2.
    """
    B, T, d = x.shape
    g = x.reshape(B, T, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)  # (B,H,T,hd)
    proj = g.astype(jnp.float32) @ a["grep_w"].astype(jnp.float32) + a["grep_b"].astype(jnp.float32)
    pair = jax.nn.sigmoid(proj.reshape(B, cfg.n_heads, T, 2, 4).sum(-1))  # (B,H,T,2)
    gate_a, gate_b = pair[..., 0], pair[..., 1]
    return gate_a * (gate_b * a["grep_a"].astype(jnp.float32)[None, :, None] - 1.0) + 2.0


def _gated_bias(cfg: BeatsConfig, a, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """WavLM-style gated relative position bias, (B, H, T, T) f32."""
    return _gate_scale_rows(cfg, a, x)[..., None] * bias[None]  # (B,H,T,T)


def _layer_forward(cfg: BeatsConfig, layer, x, bias: Optional[jnp.ndarray],
                   lengths=None, bias_flash=False):
    B, T, d = x.shape
    hd = cfg.head_dim
    a = layer["attn"]
    dt = x.dtype
    q = (x @ a["wq"].astype(dt) + a["bq"].astype(dt)).reshape(B, T, cfg.n_heads, hd)
    k = (x @ a["wk"].astype(dt) + a["bk"].astype(dt)).reshape(B, T, cfg.n_heads, hd)
    v = (x @ a["wv"].astype(dt) + a["bv"].astype(dt)).reshape(B, T, cfg.n_heads, hd)
    if bias is not None and bias_flash and lengths is not None:
        # gated-bias flash: the (B, H, T, T) logits/bias never materialize
        # (forward-only — the audio encoders are frozen in SALMONN training).
        # Two kernels: the r5 LEAN single-KV-pass kernel (gate precomputed
        # host-side, batch-innermost grid so the shared bias tile is fetched
        # once per (head, q-tile) — see _flash_bias_rows_kernel) whenever the
        # whole KV row fits VMEM, else the general tiled kernel with the
        # gate computed in-kernel.
        from ..ops.flash_attention import (
            flash_attention_gated_bias,
            flash_attention_gated_bias_rows,
            flash_bias_rows_usable,
        )

        if cfg.lean_bias_flash and flash_bias_rows_usable(
                B, cfg.n_heads, T, hd, q.dtype.itemsize):
            scale = _gate_scale_rows(cfg, a, x)  # (B, H, T) f32, one fused op
            out = flash_attention_gated_bias_rows(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), scale, bias, lengths,
            ).transpose(0, 2, 1, 3).reshape(B, T, d)
        else:
            xh = x.reshape(B, T, cfg.n_heads, hd).transpose(0, 2, 1, 3)
            out = flash_attention_gated_bias(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), xh, bias,
                a["grep_w"], a["grep_b"], a["grep_a"], lengths,
            ).transpose(0, 2, 1, 3).reshape(B, T, d)
    elif bias is not None:
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        logits = logits + _gated_bias(cfg, a, x, bias)
        if lengths is not None:
            valid = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None]
            logits = jnp.where(valid, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), v).reshape(B, T, d)
    elif lengths is not None:
        from ..ops.flash_attention import flash_attention

        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), lengths=lengths, causal=False,
        ).transpose(0, 2, 1, 3).reshape(B, T, d)
    else:
        out = dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
        ).transpose(0, 2, 1, 3).reshape(B, T, d)
    out = out @ a["wo"].astype(dt) + a["bo"].astype(dt)
    # deep-norm: residual scaled by alpha before post-LN
    x = layer_norm(x * cfg.deep_norm_alpha + out, layer["ln_attn"]["w"], layer["ln_attn"]["b"])
    m = layer["mlp"]
    h = gelu(x @ m["w1"].astype(dt) + m["b1"].astype(dt))
    h = h @ m["w2"].astype(dt) + m["b2"].astype(dt)
    return layer_norm(x * cfg.deep_norm_alpha + h, layer["ln_mlp"]["w"], layer["ln_mlp"]["b"])


def beats_num_tokens(cfg: BeatsConfig, n_samples: int) -> int:
    """Tokens a clip of ``n_samples`` produces (kaldi snip_edges framing →
    patch grid): n_frames = (n−400)//160+1, tokens = (n_frames//16)·(128//16).
    30 s → 1496."""
    n_frames = (n_samples - 400) // 160 + 1
    return (n_frames // cfg.patch) * (cfg.n_fbank // cfg.patch)


def beats_bias_table(cfg: BeatsConfig, params: Dict[str, Any],
                     n_tokens: int, pad_to: int = 0) -> jnp.ndarray:
    """The shared gated-rel-pos bias table (H, T, T) f32 for a T-token clip
    (zero-padded to (H, pad_to, pad_to) when ``pad_to`` > n_tokens — the
    flash kernels' 128-aligned layout).

    A pure function of the FROZEN rel_bias embedding and T — hoist it out of
    per-chunk encode loops: built inside the `lax.map` chunk body the 113 MB
    gather+transpose(+pad) re-materializes once per chunk (~2 ms each at the
    salmonn-7b shape); computed once here, it is loop-invariant and every
    chunk reuses it (numerics identical)."""
    buckets = relative_position_buckets(
        n_tokens, cfg.rel_pos_buckets, cfg.rel_pos_max_distance)
    bias = params["rel_bias"].astype(jnp.float32)[buckets]  # (T,T,H)
    bias = bias.transpose(2, 0, 1)  # (H,T,T)
    if pad_to > n_tokens:
        pad = pad_to - n_tokens
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
    return bias


def beats_encode_fbank(
    cfg: BeatsConfig,
    params: Dict[str, Any],
    fbank: jnp.ndarray,  # (B, T_frames, n_fbank) already normalized
    dtype=jnp.float32,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid token counts
    bias_table: Optional[jnp.ndarray] = None,  # precomputed beats_bias_table
) -> jnp.ndarray:
    """Normalized fbank → (B, n_tokens, dim) BEATs features."""
    B, T, F = fbank.shape
    tp, fp = T // cfg.patch, F // cfg.patch
    # Non-overlapping stride-16 patch conv == reshape + matmul (exact: the
    # HWIO weight's (h, w) flatten order matches the patch flatten order).
    # Stated as a matmul so the MXU gets a (B·tp·fp, 256)×(256, 512) GEMM —
    # a 1-input-channel conv is the worst case for TPU conv lowering.
    p = cfg.patch
    x = fbank[:, : tp * p, : fp * p].reshape(B, tp, p, fp, p).transpose(0, 1, 3, 2, 4)
    x = x.reshape(B, tp * fp, p * p).astype(dtype)
    w = params["patch_embed"]["w"].reshape(p * p, cfg.embed_dim).astype(dtype)
    x = x @ w + params["patch_embed"]["b"].astype(dtype)  # (B, tp·fp, embed)
    x = layer_norm(x, params["ln_patch"]["w"], params["ln_patch"]["b"])
    x = x @ params["post_proj"]["w"].astype(dtype) + params["post_proj"]["b"].astype(dtype)
    x = x + _conv_pos_embed(cfg, params["conv_pos"], x)
    x = layer_norm(x, params["ln_pre"]["w"], params["ln_pre"]["b"])

    n_tokens = x.shape[1]
    bias = None
    bias_flash = False
    if cfg.gated_rel_pos:
        if bias_table is not None:
            bias = bias_table  # hoisted (H,T,T) — see beats_bias_table
        else:
            bias = beats_bias_table(cfg, params, n_tokens)
        if cfg.use_flash and lengths is None:
            from ..ops.flash_attention import flash_attention_usable

            pad_to = -(-n_tokens // 128) * 128
            if flash_attention_usable(pad_to, cfg.head_dim):
                pad = pad_to - n_tokens
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                if bias.shape[1] != pad_to:  # hoisted tables arrive pre-padded
                    bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
                lengths = jnp.full((x.shape[0],), n_tokens, jnp.int32)
                bias_flash = True
    elif cfg.use_flash and lengths is None:
        from ..ops.flash_attention import flash_attention_usable

        pad_to = -(-n_tokens // 128) * 128
        if flash_attention_usable(pad_to, cfg.head_dim):
            x = jnp.pad(x, ((0, 0), (0, pad_to - n_tokens), (0, 0)))
            lengths = jnp.full((x.shape[0],), n_tokens, jnp.int32)

    if bias is not None and not bias_flash and bias.shape[1] != n_tokens:
        # pre-padded hoisted table but the materialized path runs (e.g. CPU):
        # trim back to the live token count
        bias = bias[:, :n_tokens, :n_tokens]

    def body(x, layer):
        return _layer_forward(cfg, layer, x, bias, lengths, bias_flash), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x[:, :n_tokens]


def beats_encode(
    cfg: BeatsConfig,
    params: Dict[str, Any],
    wav: jnp.ndarray,  # (B, n_samples) float32 in [-1, 1]
    dtype=jnp.float32,
    bias_table: Optional[jnp.ndarray] = None,  # precomputed beats_bias_table
) -> jnp.ndarray:
    """Raw wav → (B, n_tokens, dim) BEATs features.

    n_tokens = (n_frames // 16) * (n_fbank // 16); 30 s → 1496.
    """
    fb = kaldi_fbank(wav * (2**15), n_mels=cfg.n_fbank)  # BEATs scales wav to int16 range
    fb = (fb - FBANK_MEAN) / (2 * FBANK_STD)
    return beats_encode_fbank(cfg, params, fb, dtype=dtype,
                              bias_table=bias_table)
