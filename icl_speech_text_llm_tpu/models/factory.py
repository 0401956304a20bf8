"""Model factory + high-level model wrappers.

API parity with the reference's ModelFactory / BaseModel surface
(ref: models/model_factory.py:29-386, models/base_model.py:8-143):
``create_model``, ``from_config``, ``get_model_from_checkpoint``; models expose
``forward(samples) → {"loss": ...}`` and ``generate_output(samples) → [str]``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import ICLSample, collate_icl_batch
from ..data.packing import PackConfig
from ..training.checkpoint import apply_trainable, load_checkpoint

# NB: inference.engine is imported lazily inside SalmonnModel — a module-level
# import would close a cycle (engine imports models.llama → models/__init__ →
# this module).
from ..utils.tokenization import Tokenizer, get_tokenizer
from .salmonn import (
    SalmonnConfig,
    init_salmonn,
    salmonn_13b,
    salmonn_7b,
    salmonn_tiny,
    salmonn_train_loss,
)

logger = logging.getLogger(__name__)

SALMONN_PRESETS = {
    "salmonn": salmonn_13b,
    "salmonn-13b": salmonn_13b,
    "salmonn-7b": salmonn_7b,
    "salmonn-tiny": salmonn_tiny,
}


class SalmonnModel:
    """High-level model: config + params + tokenizer + compiled fns.

    The reference equivalent is CustomSALMONN (models/custom_salmon.py); here
    forward/generate consume lists of ICLSample (host structures) and all
    device work is jitted.
    """

    def __init__(
        self,
        cfg: SalmonnConfig,
        params: Dict[str, Any],
        tokenizer: Tokenizer,
        pack_cfg: Optional[PackConfig] = None,
        generation=None,
    ):
        from ..inference.engine import SalmonnEngine

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.pack_cfg = pack_cfg or PackConfig(
            audio_tokens_per_slot=cfg.audio_tokens_per_slot
        )
        self.engine = SalmonnEngine(cfg, params, tokenizer, generation)
        self._loss_fn = jax.jit(partial(salmonn_train_loss, self.cfg))

    # -- BaseModel-compatible surface ------------------------------------
    def forward(self, samples: Sequence[ICLSample]) -> Dict[str, Any]:
        batch = collate_icl_batch(list(samples), self.tokenizer, self.pack_cfg)
        dev = {
            "text_tokens": jnp.asarray(batch.text_tokens),
            "gather_idx": jnp.asarray(batch.gather_idx),
            "seq_mask": jnp.asarray(batch.seq_mask),
            "shifted_labels": jnp.asarray(batch.labels_shifted),
            "wavs": jnp.asarray(batch.audio["wavs"]),
        }
        loss = self._loss_fn(self.params, dev)
        return {"loss": loss}

    def generate_output(self, samples: Sequence[ICLSample]) -> List[str]:
        batch = collate_icl_batch(list(samples), self.tokenizer, self.pack_cfg)
        return self.engine.generate(batch, batch.audio)

    def get_speech_embeddings(self, wavs: np.ndarray):
        """(ref: models/base_model.py:52-64) — batched speech encoding."""
        from ..ops.mel import log_mel_spectrogram
        from .salmonn import encode_speech

        wavs = jnp.asarray(wavs)
        mels = log_mel_spectrogram(wavs)
        return encode_speech(self.cfg, self.params, mels,
                             wavs if self.cfg.beats is not None else None)

    def load_trainable(self, ckpt_dir: str):
        state = load_checkpoint(ckpt_dir)
        self.params = apply_trainable(self.params, state["trainable"])
        self.engine.params = self.params
        return state.get("meta", {})


def create_model(
    model_type: str = "salmonn-tiny",
    tokenizer: Optional[str] = None,
    seed: int = 0,
    pack_cfg: Optional[PackConfig] = None,
    generation=None,
    **_,
) -> SalmonnModel:
    """(ref: models/model_factory.py:29-97)"""
    key = model_type.lower()
    if key not in SALMONN_PRESETS:
        raise ValueError(
            f"Unknown model type '{model_type}'; options: {sorted(SALMONN_PRESETS)}"
        )
    cfg = SALMONN_PRESETS[key]()
    params = init_salmonn(jax.random.PRNGKey(seed), cfg)
    tok = get_tokenizer(tokenizer)
    logger.info(f"Created {key} (random init; convert weights via models/convert.py)")
    return SalmonnModel(cfg, params, tok, pack_cfg, generation)


def from_config(config: Dict[str, Any]) -> SalmonnModel:
    """(ref: models/model_factory.py:100-150)"""
    return create_model(**config)


def get_model_from_checkpoint(
    checkpoint_path: str, model_type: str = "salmonn-tiny", **kw
) -> SalmonnModel:
    """(ref: models/model_factory.py:328-386)"""
    model = create_model(model_type, **kw)
    meta = model.load_trainable(checkpoint_path)
    logger.info(f"Restored trainable params from {checkpoint_path}: {meta}")
    return model
