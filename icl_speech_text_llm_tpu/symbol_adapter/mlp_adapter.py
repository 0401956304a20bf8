"""MLP symbol-discovery adapter, pure JAX.

Re-implementation of the reference's MLPSalmonn transformation core
(ref: models/mlp_salmonn_old.py:98-123 MLP stacks; :213-316 soft/hard
vocab-similarity quantization + discovery collection):

- input/output MLPs: Linear(D,H) → LayerNorm → GELU → Linear(H,D), applied
  residually (x + MLP(x)) at label-token positions only;
- quantization against the tied vocabulary embedding matrix: cosine
  similarities, softmax(sim/T) soft mixture for training vs argmax hard snap
  for targets — an einsum + softmax, natively TPU-friendly;
- discovery: per-position argmax token ids + similarities are returned as
  arrays; the host accumulates the discovered_mappings dict.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.common import dense_init, layer_norm


def init_mlp_adapter(key, embed_dim: int, hidden_dim: Optional[int] = None) -> Dict[str, Any]:
    """Two symmetric MLPs (input + output), ref :108-123."""
    hidden_dim = hidden_dim or embed_dim

    def one(k):
        k1, k2 = jax.random.split(k)
        return {
            "w1": dense_init(k1, embed_dim, hidden_dim),
            "b1": jnp.zeros((hidden_dim,)),
            "ln": {"w": jnp.ones((hidden_dim,)), "b": jnp.zeros((hidden_dim,))},
            "w2": dense_init(k2, hidden_dim, embed_dim),
            "b2": jnp.zeros((embed_dim,)),
        }

    ki, ko = jax.random.split(key)
    return {"input_mlp": one(ki), "output_mlp": one(ko)}


def mlp_forward(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    dt = x.dtype
    h = x @ p["w1"].astype(dt) + p["b1"].astype(dt)
    h = layer_norm(h, p["ln"]["w"], p["ln"]["b"])
    h = jax.nn.gelu(h, approximate=False)
    return h @ p["w2"].astype(dt) + p["b2"].astype(dt)


def quantize_to_vocab(
    x: jnp.ndarray,  # (..., D)
    vocab_embeds: jnp.ndarray,  # (V, D)
    temperature: float = 0.1,
    hard: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity quantization (ref :222-243).

    Returns (quantized_embeddings, argmax_token_ids, argmax_similarities).
    """
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    vn = vocab_embeds / (jnp.linalg.norm(vocab_embeds, axis=-1, keepdims=True) + 1e-8)
    sims = xn @ vn.T.astype(xn.dtype)  # (..., V)
    hard_ids = jnp.argmax(sims, axis=-1)
    hard_sims = jnp.max(sims, axis=-1)
    if hard:
        quantized = vocab_embeds[hard_ids].astype(x.dtype)
    else:
        weights = jax.nn.softmax(sims.astype(jnp.float32) / temperature, axis=-1)
        quantized = (weights @ vocab_embeds.astype(jnp.float32)).astype(x.dtype)
    return quantized, hard_ids, hard_sims


def transform_label_embeddings(
    mlp_params: Dict[str, Any],
    embeds: jnp.ndarray,  # (B, L, D)
    label_mask: jnp.ndarray,  # (B, L) bool — positions holding symbol tokens
    vocab_embeds: jnp.ndarray,  # (V, D)
    temperature: float = 0.1,
    hard: bool = False,
    bypass: bool = False,
    quantize: bool = True,
    which: str = "input_mlp",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual MLP transform + vocab quantization at masked positions
    (ref :235-316: X̂ ← X + MLP(X), then quantize X̂ against the vocab).

    Returns (new_embeds, discovered_ids (B, L), similarities (B, L)); outside
    the mask embeds pass through and discovered_ids are -1.
    """
    if bypass:
        B, L, _ = embeds.shape
        return embeds, jnp.full((B, L), -1, jnp.int32), jnp.zeros((B, L), embeds.dtype)

    transformed = embeds + mlp_forward(mlp_params[which], embeds)
    if quantize:
        quantized, ids, sims = quantize_to_vocab(transformed, vocab_embeds, temperature, hard)
    else:
        quantized, ids, sims = transformed, jnp.argmax(
            jnp.zeros((*embeds.shape[:2], 1)), axis=-1
        ), jnp.zeros(embeds.shape[:2], embeds.dtype)

    mask = label_mask[..., None]
    out = jnp.where(mask, quantized, embeds)
    ids = jnp.where(label_mask, ids, -1).astype(jnp.int32)
    sims = jnp.where(label_mask, sims, 0.0)
    return out, ids, sims


def label_token_mask(text_tokens, symbol_token_ids) -> "np.ndarray":
    """Host helper: mark positions whose token id belongs to any symbol.

    text_tokens: (B, L_text) int array; symbol_token_ids: iterable of ints.
    """
    import numpy as np

    ids = np.asarray(sorted(set(int(i) for i in symbol_token_ids)), np.int64)
    if ids.size == 0:
        return np.zeros(np.asarray(text_tokens).shape, bool)
    return np.isin(np.asarray(text_tokens), ids)


def collect_discoveries(
    discovered_ids, similarities, text_tokens, tokenizer
) -> Dict[int, Dict[str, Any]]:
    """Host-side discovery accumulation (ref :245-316): original token id →
    {discovered token id, texts, similarity}."""
    import numpy as np

    ids = np.asarray(discovered_ids)
    sims = np.asarray(similarities)
    toks = np.asarray(text_tokens)
    out: Dict[int, Dict[str, Any]] = {}
    for b in range(ids.shape[0]):
        for l in range(ids.shape[1]):
            if ids[b, l] < 0:
                continue
            orig = int(toks[b, l])
            disc = int(ids[b, l])
            out[orig] = {
                "discovered_token": disc,
                "similarity": float(sims[b, l]),
                "random_text": tokenizer.decode([orig], skip_special_tokens=True),
                "discovered_text": tokenizer.decode([disc], skip_special_tokens=True),
            }
    return out
