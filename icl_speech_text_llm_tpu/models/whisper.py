"""Whisper audio encoder, pure JAX.

TPU-native replacement for the reference's Whisper-large-v2 encoder hidden
inside the external SALMONN package (ref: models/custom_salmon.py:31,546-554).

Structure (matches openai/whisper + HF WhisperEncoder for weight conversion):
conv1(k3,s1) → gelu → conv2(k3,s2) → gelu → +sinusoid positions → N pre-LN
transformer blocks (MHA with biases, GELU MLP) → final LN. (80, 3000) mel in,
(1500, dim) states out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .common import dense_init, gelu, layer_norm, sinusoidal_positions, split_keys


@dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    n_ctx: int = 1500  # frames after stride-2 conv
    dim: int = 1280
    n_heads: int = 20
    n_layers: int = 32
    use_flash: bool = False  # pad 1500→1536 and run Pallas flash attention


WHISPER_CONFIGS: Dict[str, WhisperEncoderConfig] = {
    # ref uses openai/whisper-large-v2 (models/custom_salmon.py:31)
    "large-v2": WhisperEncoderConfig(),  # SALMONN presets enable use_flash:
    #   with the measured block heuristic (512 × full-KV-row for non-causal)
    #   the Pallas kernel beats XLA attention ~1.6× at these shapes; the old
    #   128×128 default was what made flash slower end-to-end (OPTIMIZATIONS.md)
    "tiny-test": WhisperEncoderConfig(dim=64, n_heads=4, n_layers=2),
}


def _init_block(key, cfg: WhisperEncoderConfig):
    keys = split_keys(key, 6)
    d = cfg.dim
    return {
        "ln1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "attn": {
            "wq": dense_init(keys[0], d, d), "bq": jnp.zeros((d,)),
            "wk": dense_init(keys[1], d, d),  # whisper k_proj has no bias
            "wv": dense_init(keys[2], d, d), "bv": jnp.zeros((d,)),
            "wo": dense_init(keys[3], d, d), "bo": jnp.zeros((d,)),
        },
        "ln2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "mlp": {
            "w1": dense_init(keys[4], d, 4 * d), "b1": jnp.zeros((4 * d,)),
            "w2": dense_init(keys[5], 4 * d, d), "b2": jnp.zeros((d,)),
        },
    }


def init_whisper_encoder(key, cfg: WhisperEncoderConfig) -> Dict[str, Any]:
    k1, k2, kb = jax.random.split(key, 3)
    block_keys = split_keys(kb, cfg.n_layers)
    blocks = [_init_block(k, cfg) for k in block_keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        # conv kernels stored (width, in, out) for lax.conv_general_dilated
        "conv1": {
            "w": dense_init(k1, 3 * cfg.n_mels, cfg.dim).reshape(3, cfg.n_mels, cfg.dim),
            "b": jnp.zeros((cfg.dim,)),
        },
        "conv2": {
            "w": dense_init(k2, 3 * cfg.dim, cfg.dim).reshape(3, cfg.dim, cfg.dim),
            "b": jnp.zeros((cfg.dim,)),
        },
        "positions": jnp.asarray(sinusoidal_positions(cfg.n_ctx, cfg.dim)),
        "blocks": stacked,
        "ln_post": {"w": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))},
    }


def _conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int) -> jnp.ndarray:
    """x: (B, T, C_in), w: (K, C_in, C_out); SAME-ish padding of 1 each side."""
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return out + b.astype(x.dtype)


def _block_forward(
    cfg: WhisperEncoderConfig, block, x: jnp.ndarray, lengths=None, use_flash=False
) -> jnp.ndarray:
    B, T, d = x.shape
    h = layer_norm(x, block["ln1"]["w"], block["ln1"]["b"])
    a = block["attn"]
    q = (h @ a["wq"].astype(x.dtype) + a["bq"].astype(x.dtype))
    k = h @ a["wk"].astype(x.dtype)
    v = (h @ a["wv"].astype(x.dtype) + a["bv"].astype(x.dtype))
    hd = d // cfg.n_heads
    q = q.reshape(B, T, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    if use_flash:
        from ..ops.flash_attention import flash_attention

        out = flash_attention(q, k, v, lengths=lengths, causal=False)
    elif lengths is not None:
        # key-only padding mask — matches HF Qwen2-Audio's additive -inf mask
        # over the audio tower (padded queries produce garbage rows that the
        # splice discards, exactly like HF)
        key_mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, None, None, :]
        out = dot_product_attention(q, k, v, mask=key_mask)
    else:
        out = dot_product_attention(q, k, v)  # full bidirectional, no mask
    out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
    x = x + (out @ a["wo"].astype(x.dtype) + a["bo"].astype(x.dtype))

    h = layer_norm(x, block["ln2"]["w"], block["ln2"]["b"])
    m = block["mlp"]
    h = gelu(h @ m["w1"].astype(x.dtype) + m["b1"].astype(x.dtype))
    x = x + (h @ m["w2"].astype(x.dtype) + m["b2"].astype(x.dtype))
    return x


def whisper_encode(
    cfg: WhisperEncoderConfig,
    params: Dict[str, Any],
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    dtype=jnp.float32,
    apply_ln_post: bool = True,
    frame_lengths: jnp.ndarray = None,  # (B,) valid post-conv frames (≤ n_ctx)
) -> jnp.ndarray:
    """Mel spectrogram → (B, 1500, dim) encoder states.

    ``apply_ln_post=False`` returns pre-final-LN states (Qwen2-Audio pools
    BEFORE the final layer norm).

    ``frame_lengths`` masks self-attention keys past each sample's valid
    frame count — the Qwen2-Audio ``feature_attention_mask`` semantics
    (ref: models/custom_qwen.py:174-185 passes the mask into HF, which
    builds a key-padding mask over the audio tower). Rows past the length
    are garbage and must be discarded by the caller's splice."""
    x = mel.astype(dtype).transpose(0, 2, 1)  # (B, 3000, n_mels)
    x = gelu(_conv1d(x, params["conv1"]["w"], params["conv1"]["b"], 1))
    x = gelu(_conv1d(x, params["conv2"]["w"], params["conv2"]["b"], 2))
    x = x + params["positions"].astype(dtype)[None, : x.shape[1]]

    lengths = frame_lengths
    use_flash = False
    n_ctx = x.shape[1]
    if cfg.use_flash:
        from ..ops.flash_attention import flash_attention_usable

        pad_to = -(-n_ctx // 128) * 128  # 1500 → 1536
        if flash_attention_usable(pad_to, cfg.dim // cfg.n_heads):
            x = jnp.pad(x, ((0, 0), (0, pad_to - n_ctx), (0, 0)))
            if lengths is None:
                lengths = jnp.full((x.shape[0],), n_ctx, jnp.int32)
            use_flash = True

    def body(x, block):
        return _block_forward(cfg, block, x, lengths, use_flash), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = x[:, :n_ctx]
    if not apply_ln_post:
        return x
    return layer_norm(x, params["ln_post"]["w"], params["ln_post"]["b"])
