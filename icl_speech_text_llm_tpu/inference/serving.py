"""Continuous-batching serving engine (slot-based, static shapes).

The reference serves inference as static batches through HF ``generate``
(ref: inference/inference.py:303-380 — whole-dataset batch loop, no request
admission). For production serving the TPU-native design is a *slot pool*:

- a fixed number of decode slots, each owning a contiguous region of a
  pooled KV cache ``(n_layers, S, n_kv, cache_len, hd)``;
- admission = a jitted batch-1 prefill (compile-cached per prompt-length
  bucket) whose KV block is written into a free slot with one
  ``dynamic_update_slice``;
- one jitted decode step advances ALL slots together — finished or empty
  slots ride along masked (wasted lanes cost less than a recompile);
- the host scheduler (admit / collect / free) runs between steps and never
  enters jit, so shapes stay static and there are exactly two compiled
  programs per bucket set.

This is the TPU analog of vLLM-style continuous batching: XLA wants static
shapes, so instead of paged block tables we keep per-slot contiguous KV and
recycle whole slots. Requests of different prompt lengths share one decode
program; per-slot positions make each slot attend only to its own history.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import (
    DecoderConfig,
    decoder_forward,
    embed_tokens,
    init_kv_cache,
    lm_logits,
)
from ..ops.attention import make_decode_mask, make_prefill_mask


@dataclass(frozen=True)
class ServingConfig:
    num_slots: int = 8
    max_new_tokens: int = 10
    prompt_buckets: Tuple[int, ...] = (128, 256, 512)
    eos_token_id: int = 2
    pad_token_id: int = 0

    @property
    def cache_len(self) -> int:
        return max(self.prompt_buckets) + self.max_new_tokens


@dataclass
class _Slot:
    request_id: int = -1
    prompt_len: int = 0
    tokens: List[int] = field(default_factory=list)
    active: bool = False


def _bucket_for(length: int, buckets: Tuple[int, ...]) -> int:
    for b in sorted(buckets):
        if length <= b:
            return b
    raise ValueError(f"prompt length {length} exceeds largest bucket {max(buckets)}")


def _sample_next(logits, temps, rng):
    """Per-row token choice: temperature 0 → greedy, else gumbel-argmax.

    Branch-free so one compiled decode program serves mixed greedy/sampled
    slots (gumbel-argmax over logits/T samples the softmax exactly)."""
    greedy = jnp.argmax(logits, axis=-1)
    g = jax.random.gumbel(rng, logits.shape, jnp.float32)
    t = jnp.maximum(temps, 1e-6)[:, None]
    sampled = jnp.argmax(logits.astype(jnp.float32) / t + g, axis=-1)
    return jnp.where(temps > 0, sampled, greedy)


def _prefill_kernel(llm_cfg, scfg, params, cache, seq, length, slot, temp, rng,
                    lora, lora_scaling):
    """Batch-1 prefill at bucket length L; KV block lands in slot ``slot``.

    Returns (updated pooled cache, first generated token id).
    """
    L = seq.shape[1]
    local = init_kv_cache(llm_cfg, 1, L, dtype=cache["k"].dtype)
    mask = make_prefill_mask(length[None], L)
    hidden, local = decoder_forward(
        llm_cfg, params, seq, mask, jnp.arange(L)[None],
        cache=local, lora=lora, lora_scaling=lora_scaling,
    )
    last = jnp.take_along_axis(hidden, (length - 1)[None, None, None], axis=1)
    first_logits = lm_logits(llm_cfg, params, last)[0, :1]  # (1, V)
    first_tok = _sample_next(first_logits, temp[None], rng)[0]

    zero = jnp.int32(0)

    def write(pool, block):
        return jax.lax.dynamic_update_slice(pool, block, (zero, slot, zero, zero, zero))

    cache = {
        "k": write(cache["k"], local["k"]),
        "v": write(cache["v"], local["v"]),
    }
    return cache, first_tok


def _decode_kernel(llm_cfg, scfg, params, cache, tok, cur_len, done, temps, rng,
                   lora, lora_scaling):
    """One decode step for every slot. Inactive slots are masked to pad."""
    dt = cache["k"].dtype
    emb = embed_tokens(params, tok[:, None], dtype=dt)
    mask = make_decode_mask(cur_len + 1, scfg.cache_len)
    hidden, cache = decoder_forward(
        llm_cfg, params, emb, mask, cur_len[:, None],
        cache=cache, cache_positions=cur_len, lora=lora, lora_scaling=lora_scaling,
    )
    logits = lm_logits(llm_cfg, params, hidden)[:, 0]
    nxt = _sample_next(logits, temps, rng)
    nxt = jnp.where(done, scfg.pad_token_id, nxt)
    done = done | (nxt == scfg.eos_token_id)
    return cache, nxt, cur_len + 1, done


class ContinuousBatchingEngine:
    """Model-agnostic request scheduler over prompt *embeddings*.

    ``submit`` enqueues a request; ``run`` drains the queue and returns
    ``{request_id: [token ids]}`` (EOS-truncated). Multimodal fronts
    (SALMONN / Qwen2-Audio) encode audio + assemble the ICL prompt, then
    hand the embedding sequence here — decode is model-family agnostic.
    """

    def __init__(
        self,
        llm_cfg: DecoderConfig,
        params: Dict[str, Any],
        cfg: ServingConfig = ServingConfig(),
        lora: Optional[Dict[str, Any]] = None,
        lora_scaling: float = 1.0,
        dtype=jnp.float32,
        seed: int = 0,
    ):
        self.llm_cfg, self.params, self.cfg = llm_cfg, params, cfg
        self.lora, self.lora_scaling = lora, lora_scaling
        S = cfg.num_slots
        self._rng = jax.random.PRNGKey(seed)
        self._temps = jnp.zeros((S,), jnp.float32)
        self._cache = init_kv_cache(llm_cfg, S, cfg.cache_len, dtype=dtype)
        self._tok = jnp.zeros((S,), jnp.int32)
        self._cur_len = jnp.zeros((S,), jnp.int32)
        self._done = jnp.ones((S,), bool)  # empty slots ride along as done
        self._slots = [_Slot() for _ in range(S)]
        self._queue: deque = deque()
        self._results: Dict[int, List[int]] = {}
        self._next_id = 0
        self._prefill = {}  # bucket L -> jitted fn
        self._decode = jax.jit(
            partial(_decode_kernel, self.llm_cfg, self.cfg),
            donate_argnums=(1,),
        )

    # -- public API ---------------------------------------------------------
    def submit(self, seq_emb, length: int, temperature: float = 0.0) -> int:
        """Enqueue a request: (L, D) prompt embeddings + true length.

        ``seq_emb`` may be a numpy array or a device (jax) array — device
        arrays stay on device through admission (no host round-trip).
        ``temperature`` is per-request: 0 = greedy, >0 = softmax sampling."""
        _bucket_for(int(length), self.cfg.prompt_buckets)  # fail fast on oversize
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, seq_emb, int(length), float(temperature)))
        return rid

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue + all in-flight slots; return finished results."""
        while self._queue or any(s.active for s in self._slots):
            self.step()
        out, self._results = self._results, {}
        return out

    def step(self) -> None:
        """Admit waiting requests into free slots, then advance one token."""
        self._admit()
        if not any(s.active for s in self._slots):
            return
        self._rng, step_rng = jax.random.split(self._rng)
        self._cache, self._tok, self._cur_len, self._done = self._decode(
            self.params, self._cache, self._tok, self._cur_len, self._done,
            self._temps, step_rng, self.lora, self.lora_scaling,
        )
        self._collect(np.asarray(self._tok), np.asarray(self._done))

    # -- scheduler internals ------------------------------------------------
    def _admit(self) -> None:
        for i, slot in enumerate(self._slots):
            if not self._queue:
                return
            if slot.active:
                continue
            rid, emb, length, temperature = self._queue.popleft()
            L = _bucket_for(length, self.cfg.prompt_buckets)
            if L not in self._prefill:
                self._prefill[L] = jax.jit(
                    partial(_prefill_kernel, self.llm_cfg, self.cfg),
                    donate_argnums=(1,),
                )
            if isinstance(emb, jnp.ndarray):
                # device path: pad on device, no host round-trip
                emb = emb[:L]
                padded = jnp.pad(emb, ((0, L - emb.shape[0]), (0, 0)))[None]
            else:
                host = np.zeros((1, L, emb.shape[-1]), emb.dtype)
                host[0, : emb.shape[0]] = emb[:L]
                padded = jnp.asarray(host)
            self._rng, admit_rng = jax.random.split(self._rng)
            self._cache, first = self._prefill[L](
                self.params, self._cache, padded,
                jnp.int32(length), jnp.int32(i), jnp.float32(temperature),
                admit_rng, lora=self.lora, lora_scaling=self.lora_scaling,
            )
            self._temps = self._temps.at[i].set(temperature)
            first = int(first)
            self._slots[i] = _Slot(rid, length, [], True)
            self._tok = self._tok.at[i].set(first)
            self._cur_len = self._cur_len.at[i].set(length)
            self._done = self._done.at[i].set(first == self.cfg.eos_token_id)
            self._record(i, first)

    def _collect(self, tok: np.ndarray, done: np.ndarray) -> None:
        for i, slot in enumerate(self._slots):
            if slot.active:
                self._record(i, int(tok[i]))

    def _record(self, i: int, tok: int) -> None:
        """Append one freshly emitted token; finish on EOS or length cap.

        A freed slot stays ``done=True`` on device until readmission, so an
        *active* slot's previous ``done`` was False and the emitted token is
        genuine: EOS ends the request (and is not part of the output), any
        other token is content.
        """
        slot = self._slots[i]
        if tok != self.cfg.eos_token_id:
            slot.tokens.append(tok)
        if tok == self.cfg.eos_token_id or len(slot.tokens) >= self.cfg.max_new_tokens:
            self._results[slot.request_id] = slot.tokens
            self._slots[i] = _Slot()  # free the slot (device done[i] stays True)


def qwen_prompt_embeddings(cfg, params, batch):
    """Packed Qwen2-Audio batch → (seq embeddings (B,L,D), lengths (B,)).

    Mirrors ``salmonn_prompt_embeddings`` for the Qwen family: audio tower →
    pool → projector → one-gather assembly (models/qwen_audio.py).
    """
    from ..models.qwen_audio import _assemble, _encode_batch_audio

    audio = _encode_batch_audio(cfg, params, batch)
    seq = _assemble(cfg, params, batch["text_tokens"], audio, batch["gather_idx"])
    return seq, batch["seq_lengths"]


def salmonn_prompt_embeddings(cfg, params, batch):
    """Packed SALMONN batch → (seq embeddings (B,L,D), lengths (B,)).

    The encoder/assembly half of ``engine.salmonn_generate`` — reused by the
    serving front so requests enter the slot pool as plain embeddings.
    """
    from ..models.salmonn import assemble_sequence, encode_speech
    from ..ops.mel import log_mel_spectrogram, pad_or_trim, wavs_to_float

    B = batch["text_tokens"].shape[0]
    wavs = wavs_to_float(batch["wavs"])
    n_slots = wavs.shape[1]
    flat = pad_or_trim(wavs.reshape(B * n_slots, wavs.shape[-1]))
    mels = log_mel_spectrogram(flat)
    speech = encode_speech(
        cfg, params, mels, flat if cfg.beats is not None else None
    ).reshape(B, n_slots, -1, cfg.llm.dim)
    seq = assemble_sequence(cfg, params, batch["text_tokens"], speech, batch["gather_idx"])
    return seq, batch["seq_lengths"]
