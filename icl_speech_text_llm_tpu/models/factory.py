"""Model factory + high-level model wrappers.

API parity with the reference's ModelFactory / BaseModel surface
(ref: models/model_factory.py:29-386, models/base_model.py:8-143):
``create_model``, ``from_config``, ``get_model_from_checkpoint``; models expose
``forward(samples) → {"loss": ...}`` and ``generate_output(samples) → [str]``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.collate import ICLSample, collate_icl_batch
from ..data.packing import PackConfig
from .base import BaseModel
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
    "salmonn-bench": None,  # resolved lazily (imports salmonn_bench)
}

QWEN_PRESETS = {
    "qwen2": "qwen2_audio_7b",
    "qwen2-audio": "qwen2_audio_7b",
    "qwen2-audio-7b": "qwen2_audio_7b",
    "qwen2-audio-tiny": "qwen2_audio_tiny",
    "qwen2-audio-smoke": "qwen2_audio_smoke",
}


class SalmonnModel(BaseModel):
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


class QwenAudioModel(BaseModel):
    """High-level Qwen2-Audio model with the BaseModel-compatible surface
    (ref equivalent: CustomQwen, models/custom_qwen.py)."""

    def __init__(self, cfg, params, tokenizer, pack_cfg=None, generation=None):
        from functools import partial as _partial

        from ..inference.engine import GenerationConfig
        from .qwen_audio import (
            audio_output_length,
            qwen_audio_generate,
            qwen_audio_train_loss,
        )

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.pack_cfg = pack_cfg or PackConfig(
            audio_tokens_per_slot=cfg.audio_tokens_per_slot,
            audio_len_fn=audio_output_length,
        )
        if self.pack_cfg.audio_len_fn is None:
            # per-clip variable audio positions are part of the Qwen2-Audio
            # contract (HF feature_attention_mask splice) — enforce even for
            # caller-supplied pack configs
            import dataclasses as _dc

            self.pack_cfg = _dc.replace(self.pack_cfg, audio_len_fn=audio_output_length)
        self.gen = generation or GenerationConfig(
            eos_token_id=tokenizer.eos_token_id, pad_token_id=tokenizer.pad_token_id
        )
        self._loss_fn = jax.jit(_partial(qwen_audio_train_loss, cfg))
        # compile cache keyed by the CURRENT gen config: MultiTaskModel sets
        # engine.gen per task, so a partial() baked at init would silently
        # drop per-task generation params (max_new_tokens, penalties, beams)
        self._gen_cache = {}
        self._qwen_generate = qwen_audio_generate
        # engine-protocol compatibility (inference runner calls model.engine.generate)
        self.engine = self

    def _dev(self, samples, train: bool):
        batch = collate_icl_batch(list(samples), self.tokenizer, self.pack_cfg)
        dev = {
            "text_tokens": jnp.asarray(batch.text_tokens),
            "gather_idx": jnp.asarray(batch.gather_idx),
            "seq_mask": jnp.asarray(batch.seq_mask),
            "seq_lengths": jnp.asarray(batch.seq_lengths),
            **{k: jnp.asarray(v) for k, v in batch.audio.items()},
        }
        if train:
            dev["shifted_labels"] = jnp.asarray(batch.labels_shifted)
        return dev

    def forward(self, samples):
        return {"loss": self._loss_fn(self.params, self._dev(samples, True))}

    def generate(self, packed, audio):
        """Engine-protocol generate over a PackedBatch (runner compatibility)."""
        dev = {
            "text_tokens": jnp.asarray(packed.text_tokens),
            "gather_idx": jnp.asarray(packed.gather_idx),
            "seq_lengths": jnp.asarray(packed.seq_lengths),
            **{k: jnp.asarray(v) for k, v in audio.items()},
        }
        toks = np.asarray(self._gen_fn()(self.params, dev))
        return self._decode_rows(toks)

    def _decode_rows(self, toks):
        out = []
        for row in toks:
            ids = []
            for t in row:
                if t == self.gen.eos_token_id:
                    break
                ids.append(int(t))
            out.append(self.tokenizer.decode(ids, skip_special_tokens=True))
        return out

    def generate_output(self, samples):
        toks = np.asarray(self._gen_fn()(self.params, self._dev(samples, False)))
        return self._decode_rows(toks)

    def _gen_fn(self):
        from functools import partial as _partial

        if self.gen not in self._gen_cache:
            self._gen_cache[self.gen] = jax.jit(
                _partial(self._qwen_generate, self.cfg, self.gen))
        return self._gen_cache[self.gen]

    def get_speech_embeddings(self, wavs):
        from ..ops.mel import log_mel_spectrogram
        from .qwen_audio import encode_audio

        mels = log_mel_spectrogram(jnp.asarray(wavs), self.cfg.encoder.n_mels)
        return encode_audio(self.cfg, self.params, mels)

    def load_trainable(self, ckpt_dir: str):
        state = load_checkpoint(ckpt_dir)
        self.params = apply_trainable(self.params, state["trainable"])
        return state.get("meta", {})


def _check_tree_shapes(name: str, expect, got):
    """Converted adapter leaves must match the preset's init shapes — a
    mismatch means the wrong --model_type was used at convert or load time."""
    flat_e = {"/".join(str(getattr(p, "key", p)) for p in kp): v.shape
              for kp, v in jax.tree_util.tree_flatten_with_path(expect)[0]}
    flat_g = {"/".join(str(getattr(p, "key", p)) for p in kp): v.shape
              for kp, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    for k, shape in flat_g.items():
        if k in flat_e and tuple(flat_e[k]) != tuple(shape):
            raise ValueError(
                f"adapter '{name}/{k}' shape {tuple(shape)} does not match "
                f"the model preset's {tuple(flat_e[k])} — wrong --model_type?")


def create_model(
    model_type: str = "salmonn-tiny",
    tokenizer: Optional[str] = None,
    seed: int = 0,
    pack_cfg: Optional[PackConfig] = None,
    generation=None,
    llm_params_dir: Optional[str] = None,
    adapter_params_dir: Optional[str] = None,
    **_,
):
    """(ref: models/model_factory.py:29-97) — SALMONN and Qwen2-Audio families.

    ``llm_params_dir``: converted decoder weights (cli/convert.py streaming
    output — plain or int8) replace the random-init LLM; the memmapped arrays
    stream to device on first use.

    ``adapter_params_dir``: converted ``salmonn_v1.pth`` adapter weights
    (cli/convert.py --component salmonn — Q-Former + speech projection + LoRA;
    ref layout: models/custom_salmon.py:83, PEFT nesting :190-192). Subtrees
    present in the dir (``qformer``/``lora``) replace their random-init
    counterparts; shapes are validated against the preset."""
    key = model_type.lower()
    tok = get_tokenizer(tokenizer)

    def _maybe_real_llm(params, compute_dtype=None):
        if llm_params_dir:
            from .stream_convert import load_params_dir

            # device_put ONCE: leaving the tree as numpy memmaps would
            # re-upload every weight on EVERY jitted call (jax only caches
            # committed device arrays, not host numpy)
            params["llm"] = jax.device_put(load_params_dir(llm_params_dir))
            logger.info(f"Loaded converted LLM weights from {llm_params_dir}")
            # Frozen encoders run in compute_dtype anyway (they are cast at
            # use); storing them f32 next to a real-scale quantized decoder
            # wastes HBM (~1.5 GB at whisper-large) — keep only the trainable
            # subtrees (qformer/lora/projector) at full precision.
            if compute_dtype == jnp.bfloat16:
                for sub in ("whisper", "beats", "encoder"):
                    if sub in params:
                        params[sub] = jax.tree_util.tree_map(
                            lambda x: x.astype(jnp.bfloat16)
                            if x.dtype == jnp.float32 else x, params[sub])
        if adapter_params_dir:
            from .stream_convert import load_params_dir

            adapter = load_params_dir(adapter_params_dir)
            for sub in ("qformer", "lora"):
                if sub not in adapter:
                    continue
                if sub in params:
                    _check_tree_shapes(sub, params[sub], adapter[sub])
                params[sub] = jax.device_put(adapter[sub])
            logger.info(f"Loaded converted adapter weights from {adapter_params_dir}"
                        f" ({sorted(adapter)})")
        return params
    if key in QWEN_PRESETS:
        from . import qwen_audio as qa
        from .qwen_audio import init_qwen_audio

        cfg = getattr(qa, QWEN_PRESETS[key])()
        params = _maybe_real_llm(
            init_qwen_audio(jax.random.PRNGKey(seed), cfg,
                            skip_llm=bool(llm_params_dir)),
            compute_dtype=cfg.compute_dtype)
        logger.info(f"Created {key} (random init; convert weights via models/convert.py)")
        return QwenAudioModel(cfg, params, tok, pack_cfg, generation)
    if key not in SALMONN_PRESETS:
        raise ValueError(
            f"Unknown model type '{model_type}'; options: "
            f"{sorted(SALMONN_PRESETS) + sorted(QWEN_PRESETS)}"
        )
    if key == "salmonn-bench":
        from .salmonn import salmonn_bench

        cfg = salmonn_bench()
    else:
        cfg = SALMONN_PRESETS[key]()
    params = _maybe_real_llm(init_salmonn(jax.random.PRNGKey(seed), cfg,
                                          skip_llm=bool(llm_params_dir)),
                             compute_dtype=cfg.compute_dtype)
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
