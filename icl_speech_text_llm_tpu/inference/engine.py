"""Batched generation engine: jit-compiled prefill + KV-cached greedy/sampled
decode.

Replaces the reference's HF ``llama_model.generate(inputs_embeds=...)`` call
(ref: models/custom_salmon.py:704-720; defaults max_new_tokens=10, greedy —
SURVEY.md §8 item 5) with a single compiled program:

  1. encode ALL audio clips in one batched encoder call;
  2. assemble the ICL sequence with one table-gather (PackedBatch indices);
  3. prefill attention over the prompt (mask derived from per-sample lengths);
  4. ``lax.scan`` decode loop with per-sample cache append positions (prompts
     are right-padded, every sample decodes from its own length);
  5. stop-on-EOS via a done mask (emitted tokens forced to pad after EOS).

Static shapes throughout: one compile per (batch, seq_len, max_new_tokens)
bucket.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.packing import PackedBatch
from ..models.llama import (
    decoder_forward,
    embed_tokens,
    init_kv_cache,
    lm_logits,
)
from ..ops.attention import make_decode_mask, make_prefill_mask
from ..ops.mel import log_mel_spectrogram, pad_or_trim, wavs_to_float

# NB: models.salmonn is imported lazily inside salmonn_generate — importing it
# at module level closes a cycle through models/__init__ → factory → engine.


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 10  # reference default (custom_salmon.py:708)
    do_sample: bool = False
    temperature: float = 0.8
    top_p: float = 0.9
    eos_token_id: int = 2
    pad_token_id: int = 0
    # HF-generate options the reference forwards (custom_salmon.py:704-720)
    num_beams: int = 1
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    min_new_tokens: int = 0  # the reference's min_length (empty input_ids)
    # TPU-serving addition (no reference equivalent): int8 KV cache — halves
    # the decode-phase KV read, dequant fused into the flash-decode kernel
    kv_int8: bool = False
    # Decode attention implementation:
    #   "xla" (default, r5) — zero-copy cache layout with the cache riding
    #     the layer scan as a READ-ONLY xs whose per-layer slice XLA fuses
    #     into the attention matmuls. Measured faster than the Pallas
    #     flash-decode kernel at both real scales (7B 19.71 → 17.18 ms/step,
    #     13B 20.79 → 19.66; the kernel reads the cache at ~348 GB/s vs
    #     XLA's ~844, scripts/profile_decode.py r5).
    #   True — the Pallas flash-decode kernel (zero-copy layout).
    #   False — generic scanned-cache path. REQUIRED when jitting generate
    #     over GSPMD-sharded params (a Mosaic custom call cannot be
    #     auto-partitioned — it would force the KV cache to replicate); the
    #     serving engine handles this itself via shard_map, the static
    #     engine cannot see the caller's mesh.
    use_flash_decode: Any = "xla"

    @property
    def needs_history(self) -> bool:
        return self.repetition_penalty != 1.0 or self.min_new_tokens > 0


def _process_logits(
    logits: jnp.ndarray, history, step, gen: GenerationConfig
) -> jnp.ndarray:
    """HF greedy/sample processor order: repetition penalty + min-length ban,
    applied to raw logits before argmax/sampling."""
    from .beam import apply_repetition_penalty

    logits = logits.astype(jnp.float32)
    if gen.repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, history, step, gen.repetition_penalty)
    if gen.min_new_tokens > 0:
        ban = step < gen.min_new_tokens
        logits = logits.at[:, gen.eos_token_id].set(
            jnp.where(ban, -jnp.inf, logits[:, gen.eos_token_id]))
    return logits


def _sample_token(logits: jnp.ndarray, rng, gen: GenerationConfig) -> jnp.ndarray:
    """(B, V) logits → (B,) token ids."""
    if not gen.do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / gen.temperature
    # top-p: sort, mask tail below cumulative p
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < gen.top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    masked = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(rng, masked, axis=-1)


def decode_from_sequence(
    llm_cfg,
    llm_params: Dict[str, Any],
    seq: jnp.ndarray,  # (B, L, D) assembled prompt embeddings
    lengths: jnp.ndarray,  # (B,) per-sample prompt length
    gen: GenerationConfig,
    lora: Optional[Dict[str, Any]] = None,
    lora_scaling: float = 1.0,
    dt=jnp.float32,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Shared prefill + KV-decode core used by every model family."""
    from ..ops.flash_attention import flash_attention_usable

    B, L, _ = seq.shape
    # 128-aligned so the Pallas decode-attention kernel can tile the cache
    # (ops/flash_attention.flash_decode_attention); the surplus positions sit
    # beyond every per-sample length and are never attended or written
    cache_len = -(-(L + gen.max_new_tokens) // 128) * 128
    cache = init_kv_cache(llm_cfg, B, cache_len, dtype=dt, quant=gen.kv_int8)
    prefill_mask = jnp.concatenate(
        [make_prefill_mask(lengths, L), jnp.zeros((B, 1, L, cache_len - L), bool)], axis=-1
    )
    positions = jnp.broadcast_to(jnp.arange(L), (B, L))

    # Pallas flash attention for the prefill when shapes allow (head_dim ≥ 128,
    # seq a multiple of 128) — the dominant cost of k-shot ICL inference.
    flash_lengths = lengths if flash_attention_usable(L, llm_cfg.hd) else None
    hidden, cache = decoder_forward(
        llm_cfg, llm_params, seq, prefill_mask, positions,
        cache=cache, lora=lora, lora_scaling=lora_scaling,
        flash_lengths=flash_lengths,
    )
    # logits at each sample's final prompt position
    last_hidden = jnp.take_along_axis(hidden, (lengths - 1)[:, None, None], axis=1)
    first_logits = lm_logits(llm_cfg, llm_params, last_hidden)[:, 0]

    if rng is None:
        rng = jax.random.PRNGKey(0)

    history0 = jnp.full((B, gen.max_new_tokens), gen.pad_token_id, jnp.int32)

    def step(carry, inputs):
        cache, tok, done, cur_len, history = carry
        t, step_rng = inputs
        emb = embed_tokens(llm_params, tok[:, None], dtype=dt)
        mask = make_decode_mask(cur_len + 1, cache_len)
        hidden, cache = decoder_forward(
            llm_cfg, llm_params, emb, mask, cur_len[:, None],
            cache=cache, cache_positions=cur_len, lora=lora, lora_scaling=lora_scaling,
            use_flash_decode=gen.use_flash_decode,
        )
        logits = lm_logits(llm_cfg, llm_params, hidden)[:, 0]
        if gen.needs_history:
            logits = _process_logits(logits, history, t, gen)
        nxt = _sample_token(logits, step_rng, gen)
        nxt = jnp.where(done, gen.pad_token_id, nxt).astype(jnp.int32)
        if gen.needs_history:
            # final step's t == max_new_tokens: that token is discarded, drop
            # the out-of-bounds history write instead of clamping
            history = history.at[:, t].set(nxt, mode="drop")
        done = done | (nxt == gen.eos_token_id)
        return (cache, nxt, done, cur_len + 1, history), tok

    logits0 = first_logits
    if gen.needs_history:
        logits0 = _process_logits(logits0, history0, 0, gen)
    tok0 = _sample_token(logits0, rng, gen).astype(jnp.int32)
    if gen.needs_history:
        history0 = history0.at[:, 0].set(tok0)
    done0 = tok0 == gen.eos_token_id
    step_rngs = jax.random.split(rng, gen.max_new_tokens)
    steps = (jnp.arange(1, gen.max_new_tokens + 1), step_rngs)
    (_, _, _, _, _), toks = jax.lax.scan(
        step, (cache, tok0, done0, lengths, history0), steps)
    return toks.T  # (B, max_new_tokens): tok0 first, then scan outputs


def salmonn_generate(
    cfg,
    gen: GenerationConfig,
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Packed batch → (B, max_new_tokens) generated token ids.

    ``batch``: text_tokens (B,L_text), gather_idx (B,L_seq), seq_lengths (B,),
    wavs (B, n_slots, n_samples). Mel extraction runs on-device.
    Jit this whole function (cfg/gen static).
    """
    from ..models.salmonn import assemble_sequence, encode_speech

    B = batch["text_tokens"].shape[0]
    wavs = wavs_to_float(batch["wavs"])
    n_slots = wavs.shape[1]
    dt = cfg.compute_dtype

    flat_wavs = pad_or_trim(wavs.reshape(B * n_slots, wavs.shape[-1]))
    mels = log_mel_spectrogram(flat_wavs)
    speech = encode_speech(
        cfg, params, mels, flat_wavs if cfg.beats is not None else None
    ).reshape(B, n_slots, -1, cfg.llm.dim)

    seq = assemble_sequence(cfg, params, batch["text_tokens"], speech, batch["gather_idx"])
    lora = params.get("lora")
    scaling = cfg.lora.scaling if cfg.lora is not None else 1.0
    decode = decode_from_sequence
    if gen.num_beams > 1:
        from .beam import beam_decode_from_sequence

        decode = beam_decode_from_sequence
    return decode(
        cfg.llm, params["llm"], seq, batch["seq_lengths"], gen,
        lora=lora, lora_scaling=scaling, dt=dt, rng=rng,
    )


class SalmonnEngine:
    """Host-side wrapper: compile cache per shape bucket, decode to strings.

    API parity with the reference's ``generate_output(samples) -> List[str]``
    (ref: models/base_model.py:38-50, custom_salmon.py:642-739).
    """

    def __init__(self, cfg, params, tokenizer, gen: GenerationConfig = None):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.gen = gen or GenerationConfig(
            eos_token_id=tokenizer.eos_token_id, pad_token_id=tokenizer.pad_token_id
        )
        self._compiled = {}

    def _fn(self, key):
        if key not in self._compiled:
            self._compiled[key] = jax.jit(
                partial(salmonn_generate, self.cfg, self.gen)
            )
        return self._compiled[key]

    def generate(self, packed: PackedBatch, audio: Dict[str, np.ndarray]) -> List[str]:
        batch = {
            "text_tokens": jnp.asarray(packed.text_tokens),
            "gather_idx": jnp.asarray(packed.gather_idx),
            "seq_lengths": jnp.asarray(packed.seq_lengths),
            **{k: jnp.asarray(v) for k, v in audio.items()},
        }
        # keyed by gen config too: per-task generation params (multi_task.py)
        # switch compiled programs without recompiling
        shape_key = (self.gen, tuple(v.shape for v in batch.values()))
        toks = np.asarray(self._fn(shape_key)(self.params, batch))
        return self.decode_rows(toks)

    def decode_rows(self, toks: np.ndarray) -> List[str]:
        """EOS-truncate + detokenize generated rows — the string boundary the
        reference crosses via batch_decode (ref: custom_salmon.py:729-739)."""
        out = []
        for row in toks:
            ids = []
            for t in row:
                if t == self.gen.eos_token_id:
                    break
                ids.append(int(t))
            out.append(self.tokenizer.decode(ids, skip_special_tokens=True))
        return out
