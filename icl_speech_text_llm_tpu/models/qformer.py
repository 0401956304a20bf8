"""Window-level Q-Former: the audio→LLM bridge.

TPU-native rebuild of SALMONN's window-level Q-Former
(ref config: models/custom_salmon.py:33-40,72-77 — num_speech_query_token=1,
second_per_window = second_stride = 1/3 s).

Semantics (matching the external SALMONN implementation the reference wraps):
- encoder features (B, 1500, C) are cut into ``n_windows`` non-overlapping
  windows of ``window`` frames (1500·(1/3)/30 ≈ 17 → 88 windows, remainder
  frames dropped);
- each window is attended by ``n_query`` learned query tokens through a
  BERT-style (post-LN) stack of self-attn + cross-attn + FFN;
- query outputs project to the LLM embedding dim: 88 speech positions per 30 s
  clip, a fixed static shape (key to XLA-friendly ICL packing).

TPU-first delta vs reference: all B·88 windows run as one batched call —
the reference encodes exemplars one-by-one in a Python loop
(ref: models/custom_salmon.py:460-537), a major throughput bug fixed here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .common import dense_init, gelu, layer_norm, split_keys


@dataclass(frozen=True)
class QFormerConfig:
    encoder_width: int = 2048  # whisper 1280 + beats 768
    dim: int = 768
    n_heads: int = 12
    n_layers: int = 2  # SALMONN speech Q-Former depth
    n_query: int = 1
    window: int = 17  # round(1500 * second_per_window / 30)
    n_windows: int = 88  # (1500 - 17) // 17 + 1
    llm_dim: int = 5120  # projection target (vicuna-13b)
    mlp_ratio: int = 4


QFORMER_CONFIGS: Dict[str, QFormerConfig] = {
    "salmonn": QFormerConfig(),
    "salmonn-7b": QFormerConfig(llm_dim=4096),
    "tiny-test": QFormerConfig(encoder_width=96, dim=32, n_heads=4, n_layers=2, llm_dim=128),
}


def _init_layer(key, cfg: QFormerConfig):
    d, ew = cfg.dim, cfg.encoder_width
    keys = split_keys(key, 10)
    inner = cfg.mlp_ratio * d
    return {
        "self_attn": {
            "wq": dense_init(keys[0], d, d), "bq": jnp.zeros((d,)),
            "wk": dense_init(keys[1], d, d), "bk": jnp.zeros((d,)),
            "wv": dense_init(keys[2], d, d), "bv": jnp.zeros((d,)),
            "wo": dense_init(keys[3], d, d), "bo": jnp.zeros((d,)),
        },
        "ln_self": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "cross_attn": {
            "wq": dense_init(keys[4], d, d), "bq": jnp.zeros((d,)),
            "wk": dense_init(keys[5], ew, d), "bk": jnp.zeros((d,)),
            "wv": dense_init(keys[6], ew, d), "bv": jnp.zeros((d,)),
            "wo": dense_init(keys[7], d, d), "bo": jnp.zeros((d,)),
        },
        "ln_cross": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "mlp": {
            "w1": dense_init(keys[8], d, inner), "b1": jnp.zeros((inner,)),
            "w2": dense_init(keys[9], inner, d), "b2": jnp.zeros((d,)),
        },
        "ln_mlp": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }


def init_qformer(key, cfg: QFormerConfig) -> Dict[str, Any]:
    kq, kl, kp, kln = jax.random.split(key, 4)
    layers = [_init_layer(k, cfg) for k in split_keys(kl, cfg.n_layers)]
    return {
        "query_tokens": jax.random.normal(kq, (cfg.n_query, cfg.dim)) * 0.02,
        "ln_input": {"w": jnp.ones((cfg.encoder_width,)), "b": jnp.zeros((cfg.encoder_width,))},
        "layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers),
        "proj": {"w": dense_init(kp, cfg.dim, cfg.llm_dim), "b": jnp.zeros((cfg.llm_dim,))},
    }


def _mha(cfg: QFormerConfig, p, q_in, kv_in, mask=None):
    Bq, Tq, _ = q_in.shape
    Tk = kv_in.shape[1]
    d = cfg.dim
    hd = d // cfg.n_heads
    dt = q_in.dtype
    q = q_in @ p["wq"].astype(dt) + p["bq"].astype(dt)
    k = kv_in @ p["wk"].astype(dt) + p["bk"].astype(dt)
    v = kv_in @ p["wv"].astype(dt) + p["bv"].astype(dt)
    q = q.reshape(Bq, Tq, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(Bq, Tk, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(Bq, Tk, cfg.n_heads, hd).transpose(0, 2, 1, 3)
    out = dot_product_attention(q, k, v, mask)
    out = out.transpose(0, 2, 1, 3).reshape(Bq, Tq, d)
    return out @ p["wo"].astype(dt) + p["bo"].astype(dt)


def _layer_forward(cfg: QFormerConfig, layer, q, windows, mask):
    # BERT post-LN: sublayer → residual add → LayerNorm
    q = layer_norm(q + _mha(cfg, layer["self_attn"], q, q),
                   layer["ln_self"]["w"], layer["ln_self"]["b"])
    q = layer_norm(q + _mha(cfg, layer["cross_attn"], q, windows, mask),
                   layer["ln_cross"]["w"], layer["ln_cross"]["b"])
    m = layer["mlp"]
    h = gelu(q @ m["w1"].astype(q.dtype) + m["b1"].astype(q.dtype))
    h = h @ m["w2"].astype(q.dtype) + m["b2"].astype(q.dtype)
    return layer_norm(q + h, layer["ln_mlp"]["w"], layer["ln_mlp"]["b"])


def qformer_windows(
    cfg: QFormerConfig,
    params: Dict[str, Any],
    features: jnp.ndarray,  # (B, 1500, encoder_width)
) -> jnp.ndarray:
    """Window-level Q-Former: (B, T, C) → (B, n_windows * n_query, llm_dim)."""
    B = features.shape[0]
    x = layer_norm(features, params["ln_input"]["w"], params["ln_input"]["b"])
    usable = cfg.n_windows * cfg.window
    windows = x[:, :usable].reshape(B * cfg.n_windows, cfg.window, cfg.encoder_width)

    q = jnp.broadcast_to(
        params["query_tokens"].astype(x.dtype)[None],
        (B * cfg.n_windows, cfg.n_query, cfg.dim),
    )

    def body(q, layer):
        return _layer_forward(cfg, layer, q, windows, None), None

    q, _ = jax.lax.scan(body, q, params["layers"])
    out = q @ params["proj"]["w"].astype(q.dtype) + params["proj"]["b"].astype(q.dtype)
    return out.reshape(B, cfg.n_windows * cfg.n_query, cfg.llm_dim)
