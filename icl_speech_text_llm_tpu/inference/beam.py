"""Jit-compatible beam search with HF-parity semantics.

Implements the generation options the reference forwards to HF ``generate``
(ref: models/custom_salmon.py:704-720 — ``num_beams``, ``repetition_penalty``,
``length_penalty``, ``min_length``; per-task ``num_beams`` in
models/multi_task_model.py:130-149) as a single compiled program:

- static beam width K; every shape fixed at trace time;
- HF BeamSearchScorer semantics: 2K candidates per step, EOS candidates among
  the top-K ranks become finished hypotheses (scored ``cum_logprob /
  len**length_penalty`` over generated-token length), non-EOS candidates fill
  the K running beams in rank order; with ``early_stopping=False`` a batch
  item finishes when its worst finished hypothesis outscores the best
  attainable running continuation;
- KV cache rows are physically reordered each step (gather over the beam
  axis) — beams ride the same per-sample append positions as greedy decode;
- processors match HF order for beam search: log_softmax → repetition
  penalty → min-length EOS ban → add beam scores.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.llama import decoder_forward, embed_tokens, init_kv_cache, lm_logits
from ..ops.attention import make_decode_mask, make_prefill_mask

NEG = -1e9


def apply_repetition_penalty(
    scores: jnp.ndarray,  # (N, V) f32
    history: jnp.ndarray,  # (N, T) token ids
    hist_len,  # scalar int (traced ok): number of valid history positions
    penalty: float,
) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor: seen tokens get score*p if negative
    else score/p. History is the generated-so-far buffer (HF starts from empty
    input_ids when driven by inputs_embeds, as the reference does)."""
    if penalty == 1.0:
        return scores
    N, V = scores.shape
    valid = jnp.broadcast_to(jnp.arange(history.shape[1]) < hist_len, history.shape)
    appeared = jnp.zeros((N, V), bool).at[jnp.arange(N)[:, None], history].max(valid)
    return jnp.where(appeared,
                     jnp.where(scores < 0, scores * penalty, scores / penalty),
                     scores)


def _norm(cum: jnp.ndarray, length, length_penalty: float) -> jnp.ndarray:
    """Length-normalized score, cum / len**penalty.

    Intentional divergence from HF: a hypothesis finished by EOS at the very
    first step (length 0) normalizes by max(len, 1) == 1 here, where HF
    divides by 0**length_penalty (inf/nan) — rankings can differ from HF in
    that degenerate case when length_penalty != 0. Every hypothesis with at
    least one generated token matches HF exactly."""
    return cum / (jnp.maximum(length, 1).astype(jnp.float32) ** length_penalty)


def beam_decode_from_sequence(
    llm_cfg,
    llm_params: Dict[str, Any],
    seq: jnp.ndarray,  # (B, L, D) assembled prompt embeddings
    lengths: jnp.ndarray,  # (B,) per-sample prompt length
    gen,  # GenerationConfig with num_beams > 1
    lora: Optional[Dict[str, Any]] = None,
    lora_scaling: float = 1.0,
    dt=jnp.float32,
    rng=None,  # used only when gen.do_sample (stochastic beam search)
) -> jnp.ndarray:
    """Prefill once, then K-wide beam decode. Returns (B, max_new_tokens)
    best-hypothesis tokens, EOS-filled after each hypothesis ends.

    ``gen.do_sample`` + ``num_beams > 1`` runs STOCHASTIC beam search
    (the reference forwards both to HF generate → beam-sample,
    ref models/custom_salmon.py:704-720): candidate ranking is
    gumbel-perturbed over the temperature-warped joint scores (Gumbel
    top-2K = sampling without replacement from the candidate softmax —
    HF's multinomial draw differs in RNG detail, same semantics), while
    cumulative bookkeeping keeps the TRUE log-probs like HF does."""
    from ..ops.flash_attention import flash_attention_usable

    B, L, _ = seq.shape
    K = gen.num_beams
    Tmax = gen.max_new_tokens
    lp = gen.length_penalty
    cache_len = -(-(L + Tmax) // 128) * 128  # 128-aligned for the decode kernel
    V = llm_cfg.vocab_size
    sample = bool(gen.do_sample) and gen.temperature > 0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    temp = gen.temperature if sample else 1.0

    # ---- prefill on B rows (beams share the prompt) ----
    cache = init_kv_cache(llm_cfg, B, cache_len, dtype=dt, quant=gen.kv_int8)
    prefill_mask = jnp.concatenate(
        [make_prefill_mask(lengths, L), jnp.zeros((B, 1, L, cache_len - L), bool)], axis=-1
    )
    positions = jnp.broadcast_to(jnp.arange(L), (B, L))
    flash_lengths = lengths if flash_attention_usable(L, llm_cfg.hd) else None
    hidden, cache = decoder_forward(
        llm_cfg, llm_params, seq, prefill_mask, positions,
        cache=cache, lora=lora, lora_scaling=lora_scaling, flash_lengths=flash_lengths,
    )
    last_hidden = jnp.take_along_axis(hidden, (lengths - 1)[:, None, None], axis=1)
    first_logits = lm_logits(llm_cfg, llm_params, last_hidden)[:, 0].astype(jnp.float32)

    # expand cache to B*K rows (beam-major within each sample)
    def expand(c):  # (layers, B, *rest) → (layers, B*K, *rest); rank-generic
        # so int8-KV scale leaves (layers, B, H, T) expand alongside k/v
        rest = c.shape[2:]
        return jnp.broadcast_to(
            c[:, :, None], (c.shape[0], B, K) + rest
        ).reshape(c.shape[0], B * K, *rest)

    cache = {k: expand(v) for k, v in cache.items()}

    # ---- state ----
    run_scores = jnp.where(jnp.arange(K) == 0, 0.0, NEG)[None].repeat(B, 0)  # (B,K)
    run_toks = jnp.full((B, K, Tmax), gen.pad_token_id, jnp.int32)
    hyp_scores = jnp.full((B, K), -jnp.inf, jnp.float32)
    hyp_toks = jnp.full((B, K, Tmax), gen.pad_token_id, jnp.int32)
    hyp_lens = jnp.zeros((B, K), jnp.int32)
    batch_done = jnp.zeros((B,), bool)

    def select(state, scores_bkv, t, step_rng=None):
        """One HF BeamSearchScorer.process step. t = generated count so far.

        ``step_rng`` (sampling only): rank candidates by gumbel-perturbed
        temperature-warped scores; accumulate the TRUE scores."""
        run_scores, run_toks, hyp_scores, hyp_toks, hyp_lens, batch_done = state
        flat = scores_bkv.reshape(B, K * V)
        if step_rng is not None:
            g = jax.random.gumbel(step_rng, flat.shape, jnp.float32)
            _, top_idx = jax.lax.top_k(flat / temp + g, 2 * K)
            top_scores = jnp.take_along_axis(flat, top_idx, axis=1)
        else:
            top_scores, top_idx = jax.lax.top_k(flat, 2 * K)  # (B, 2K)
        tok2k = (top_idx % V).astype(jnp.int32)
        beam2k = top_idx // V
        is_eos = tok2k == gen.eos_token_id
        rank = jnp.arange(2 * K)

        # finished hypotheses: EOS candidates at rank < K (HF skips worse ones)
        cand_hist = jnp.take_along_axis(run_toks, beam2k[..., None], axis=1)  # (B,2K,Tmax)
        cand_valid = is_eos & (rank < K)[None] & ~batch_done[:, None]
        cand_norm = jnp.where(cand_valid, _norm(top_scores, t, lp), -jnp.inf)
        all_scores = jnp.concatenate([hyp_scores, cand_norm], axis=1)  # (B, 3K)
        all_toks = jnp.concatenate([hyp_toks, cand_hist], axis=1)
        all_lens = jnp.concatenate(
            [hyp_lens, jnp.full((B, 2 * K), t, jnp.int32)], axis=1)
        hyp_scores, keep = jax.lax.top_k(all_scores, K)
        hyp_toks = jnp.take_along_axis(all_toks, keep[..., None], axis=1)
        hyp_lens = jnp.take_along_axis(all_lens, keep, axis=1)

        # running beams: non-EOS candidates in rank order, first K
        perm = jnp.argsort(is_eos.astype(jnp.int32) * (2 * K) + rank, axis=-1)[:, :K]
        sel_scores = jnp.take_along_axis(top_scores, perm, axis=1)
        sel_tok = jnp.take_along_axis(tok2k, perm, axis=1)
        sel_beam = jnp.take_along_axis(beam2k, perm, axis=1)

        # frozen batches keep their state and append pad
        frozen = batch_done[:, None]
        new_scores = jnp.where(frozen, run_scores, sel_scores)
        step_tok = jnp.where(frozen, gen.pad_token_id, sel_tok)
        src_beam = jnp.where(frozen, jnp.arange(K)[None], sel_beam)
        new_toks = jnp.take_along_axis(run_toks, src_beam[..., None], axis=1)
        new_toks = new_toks.at[:, :, t].set(jnp.where(
            frozen, new_toks[:, :, t], step_tok))

        # early_stopping=False: done when worst finished >= best attainable
        worst = hyp_scores.min(axis=1)
        best_running = _norm(new_scores.max(axis=1), t + 1, lp)
        batch_done = batch_done | (worst >= best_running)
        return ((new_scores, new_toks, hyp_scores, hyp_toks, hyp_lens, batch_done),
                step_tok, src_beam)

    def processors(logprobs, run_toks, t):
        """HF beam-search processor order on log-softmax scores."""
        flat = apply_repetition_penalty(
            logprobs.reshape(B * K, V), run_toks.reshape(B * K, Tmax),
            t, gen.repetition_penalty,
        ).reshape(B, K, V)
        if gen.min_new_tokens > 0:
            ban = t < gen.min_new_tokens
            flat = flat.at[:, :, gen.eos_token_id].set(
                jnp.where(ban, -jnp.inf, flat[:, :, gen.eos_token_id]))
        return flat

    # ---- t=0: all beams share the prefill logits ----
    state = (run_scores, run_toks, hyp_scores, hyp_toks, hyp_lens, batch_done)
    logprobs0 = jax.nn.log_softmax(first_logits, axis=-1)[:, None].repeat(K, 1)
    scores0 = processors(logprobs0, run_toks, 0) + run_scores[..., None]
    rng, rng0 = jax.random.split(rng)
    state, tok, _ = select(state, scores0, 0, step_rng=rng0 if sample else None)
    # (no cache reorder at t=0: all beam rows are identical copies)

    cur_len = jnp.repeat(lengths, K)  # (B*K,) append position for next write

    def step(carry, t_and_rng):
        t, step_rng = t_and_rng
        state, tok, cur_len, cache = carry
        run_scores = state[0]
        emb = embed_tokens(llm_params, tok.reshape(B * K, 1), dtype=dt)
        mask = make_decode_mask(cur_len + 1, cache_len)
        hidden, cache = decoder_forward(
            llm_cfg, llm_params, emb, mask, cur_len[:, None],
            cache=cache, cache_positions=cur_len, lora=lora, lora_scaling=lora_scaling,
            use_flash_decode=gen.use_flash_decode,
        )
        logits = lm_logits(llm_cfg, llm_params, hidden)[:, 0].astype(jnp.float32)
        logprobs = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        scores = processors(logprobs, state[1], t) + run_scores[..., None]
        new_state, new_tok, src_beam = select(
            state, scores, t, step_rng=step_rng if sample else None)

        # physically reorder the cache rows to follow the selected beams
        flat_src = (src_beam + jnp.arange(B)[:, None] * K).reshape(B * K)

        def reorder(c):
            return jnp.take(c, flat_src, axis=1)

        cache = {k: reorder(v) for k, v in cache.items()}
        return (new_state, new_tok, cur_len + 1, cache), None

    if Tmax > 1:
        step_rngs = jax.random.split(rng, Tmax - 1)
        (state, tok, cur_len, cache), _ = jax.lax.scan(
            step, (state, tok, cur_len, cache),
            (jnp.arange(1, Tmax), step_rngs))

    run_scores, run_toks, hyp_scores, hyp_toks, hyp_lens, batch_done = state

    # ---- finalize: surviving running beams become hypotheses (HF finalize) ----
    fin_norm = jnp.where(~batch_done[:, None], _norm(run_scores, Tmax, lp), -jnp.inf)
    all_scores = jnp.concatenate([hyp_scores, fin_norm], axis=1)
    all_toks = jnp.concatenate([hyp_toks, run_toks], axis=1)
    all_lens = jnp.concatenate([hyp_lens, jnp.full((B, K), Tmax, jnp.int32)], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    toks = jnp.take_along_axis(all_toks, best[:, None, None], axis=1)[:, 0]  # (B,Tmax)
    lens = jnp.take_along_axis(all_lens, best[:, None], axis=1)  # (B,1)
    # EOS-fill past each hypothesis end so host-side decoding stops there
    return jnp.where(jnp.arange(Tmax)[None] >= lens, gen.eos_token_id, toks)
