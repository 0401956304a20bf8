"""Few-shot exemplar retrieval: build *_embedding_topk{k} datasets.

Rebuild of the reference's offline fewshot generator
(ref: archive/utils/generate_fewshots.py:69-112,218 — BERT-CLS embedding
cosine top-k over the train split, attached to each eval item as
``few_shot_examples``).

The embedder is pluggable:
- ``HashedNGramEmbedder`` — deterministic hashed char-ngram TF-IDF embedding,
  fully offline (default; no model downloads);
- ``HFEmbedder`` — CLS embedding from a local transformers checkpoint, the
  reference's choice when assets exist.

Similarity search runs as one jitted matmul on the accelerator — the
reference's per-item loop becomes a (Q, D) @ (D, N) product + top_k.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from ..registry import DatasetType, get_dataset_config

logger = logging.getLogger(__name__)


class HashedNGramEmbedder:
    """Character n-gram hashing embedder: deterministic, offline, no training.

    Embeds text as an L2-normalized bag of hashed 3-5-grams — a strong
    lexical-similarity retriever, standing in for BERT-CLS when no checkpoint
    is available.
    """

    def __init__(self, dim: int = 512, ngram_range=(3, 5)):
        self.dim = dim
        self.ngram_range = ngram_range

    def _ngrams(self, text: str):
        text = f" {text.lower().strip()} "
        lo, hi = self.ngram_range
        for n in range(lo, hi + 1):
            for i in range(max(0, len(text) - n + 1)):
                yield text[i : i + n]

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for row, text in enumerate(texts):
            for gram in self._ngrams(text):
                h = int.from_bytes(
                    hashlib.blake2b(gram.encode(), digest_size=8).digest(), "little"
                )
                idx = h % self.dim
                sign = 1.0 if (h >> 63) & 1 else -1.0
                out[row, idx] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-8)


class HFEmbedder:
    """CLS-token embedding from a LOCAL transformers checkpoint
    (the reference used bert-base; ref: archive/utils/generate_fewshots.py:69)."""

    def __init__(self, model_path: str, batch_size: int = 32):
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path, local_files_only=True)
        self.model = AutoModel.from_pretrained(model_path, local_files_only=True)
        self.batch_size = batch_size

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        import torch

        outs = []
        with torch.no_grad():
            for i in range(0, len(texts), self.batch_size):
                batch = self.tokenizer(
                    list(texts[i : i + self.batch_size]), padding=True,
                    truncation=True, max_length=128, return_tensors="pt",
                )
                cls = self.model(**batch).last_hidden_state[:, 0]
                outs.append(torch.nn.functional.normalize(cls, dim=-1).numpy())
        return np.concatenate(outs, axis=0)


def topk_similar(
    query_embeds: np.ndarray, pool_embeds: np.ndarray, k: int,
    exclude_self: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Cosine top-k via one device matmul: (Q, D) @ (D, N) → indices (Q, k)."""
    import jax.numpy as jnp
    import jax

    sims = jnp.asarray(query_embeds) @ jnp.asarray(pool_embeds).T  # (Q, N)
    if exclude_self is not None:
        q_idx = jnp.arange(sims.shape[0])
        sims = sims.at[q_idx, jnp.asarray(exclude_self)].set(-jnp.inf)
    _, idx = jax.lax.top_k(sims, k)
    return np.asarray(idx)


def build_fewshot_dataset(
    items: Sequence[Dict[str, Any]],
    pool: Sequence[Dict[str, Any]],
    dataset_type: DatasetType,
    k: int = 10,
    embedder: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
    pool_is_self: bool = False,
) -> List[Dict[str, Any]]:
    """Attach retrieval-ranked ``few_shot_examples`` to each item.

    ``pool`` is the exemplar source (typically the train split);
    ``pool_is_self=True`` excludes each item's own index (train→train mode).
    Output rows carry {text, label, index} exemplars, the schema the ICL
    dataset consumes (ref datasets *_embedding_topk10).
    """
    config = get_dataset_config(dataset_type)
    embedder = embedder or HashedNGramEmbedder()

    pool_texts = [p[config.text_key] for p in pool]
    item_texts = [it[config.text_key] for it in items]
    pool_embeds = embedder(pool_texts)
    query_embeds = embedder(item_texts) if not pool_is_self else pool_embeds

    exclude = np.arange(len(items)) if pool_is_self else None
    idx = topk_similar(query_embeds, pool_embeds, min(k, len(pool)), exclude)

    out = []
    for i, item in enumerate(items):
        few = []
        for j in idx[i]:
            p = pool[int(j)]
            few.append(
                {
                    "text": p[config.text_key],
                    "label": p[config.completion_key],
                    "index": str(p.get("index", j)),
                }
            )
        row = dict(item)
        row["few_shot_examples"] = few
        out.append(row)
    logger.info(f"Built fewshot dataset: {len(out)} items × top-{k} exemplars")
    return out
