"""Generation parity vs HF `generate` on a tiny locally-built LLaMA.

The reference forwards num_beams / repetition_penalty / length_penalty /
min_length into HF generate over inputs_embeds (ref: models/custom_salmon.py:
704-720). These tests drive the SAME tiny model through HF generate
(inputs_embeds path — empty initial input_ids, so processors see generated
tokens only, exactly the reference's situation) and through our
decode_from_sequence / beam_decode_from_sequence, asserting token-exact
output.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icl_speech_text_llm_tpu.inference.beam import beam_decode_from_sequence  # noqa: E402
from icl_speech_text_llm_tpu.inference.engine import (  # noqa: E402
    GenerationConfig,
    decode_from_sequence,
)
from icl_speech_text_llm_tpu.models.convert import convert_hf_decoder  # noqa: E402
from icl_speech_text_llm_tpu.models.llama import DecoderConfig, embed_tokens  # noqa: E402

EOS = 2
MAX_NEW = 8


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(7)
    hf = LlamaForCausalLM(
        LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=128,
                    rms_norm_eps=1e-6, rope_theta=10000.0,
                    eos_token_id=EOS, pad_token_id=0, bos_token_id=1)
    ).eval()
    cfg = DecoderConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=128)
    params = convert_hf_decoder(
        {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return hf, cfg, params


PROMPTS = np.array([
    [5, 17, 99, 3, 42, 7, 64, 23, 11, 88],
    [91, 2, 54, 33, 120, 45, 6, 77, 19, 101],
])


def _hf_generate(hf, **kwargs):
    with torch.no_grad():
        emb = hf.get_input_embeddings()(torch.tensor(PROMPTS))
        out = hf.generate(
            inputs_embeds=emb,
            attention_mask=torch.ones(PROMPTS.shape, dtype=torch.long),
            max_new_tokens=MAX_NEW, pad_token_id=0, eos_token_id=EOS,
            **kwargs,
        )
    return out.numpy()  # with inputs_embeds HF returns generated tokens only


def _trim(row):
    out = []
    for t in row:
        if t == EOS:
            break
        out.append(int(t))
    return out


def _run_mine(cfg, params, gen):
    seq = embed_tokens(params, jnp.asarray(PROMPTS))
    lengths = jnp.full((PROMPTS.shape[0],), PROMPTS.shape[1], jnp.int32)
    decode = beam_decode_from_sequence if gen.num_beams > 1 else decode_from_sequence
    return np.asarray(decode(cfg, params, seq, lengths, gen))


def _assert_match(hf_out, mine):
    for b in range(hf_out.shape[0]):
        assert _trim(hf_out[b]) == _trim(mine[b]), (
            f"sample {b}: HF {hf_out[b].tolist()} vs ours {mine[b].tolist()}")


def test_greedy_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False)
    mine = _run_mine(cfg, params, GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=EOS))
    _assert_match(ref, mine)


def test_repetition_penalty_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False, repetition_penalty=1.3)
    mine = _run_mine(cfg, params, GenerationConfig(
        max_new_tokens=MAX_NEW, eos_token_id=EOS, repetition_penalty=1.3))
    _assert_match(ref, mine)


def test_min_new_tokens_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False, min_new_tokens=5)
    mine = _run_mine(cfg, params, GenerationConfig(
        max_new_tokens=MAX_NEW, eos_token_id=EOS, min_new_tokens=5))
    _assert_match(ref, mine)


def test_beam2_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False, num_beams=2)
    mine = _run_mine(cfg, params, GenerationConfig(
        max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=2))
    _assert_match(ref, mine)


def test_beam2_repetition_penalty_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False, num_beams=2, repetition_penalty=1.3)
    mine = _run_mine(cfg, params, GenerationConfig(
        max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=2,
        repetition_penalty=1.3))
    _assert_match(ref, mine)


def test_beam3_length_penalty_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False, num_beams=3, length_penalty=2.0)
    mine = _run_mine(cfg, params, GenerationConfig(
        max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=3,
        length_penalty=2.0))
    _assert_match(ref, mine)


def test_beam_min_new_tokens_matches_hf(tiny_llama):
    hf, cfg, params = tiny_llama
    ref = _hf_generate(hf, do_sample=False, num_beams=2, min_new_tokens=6)
    mine = _run_mine(cfg, params, GenerationConfig(
        max_new_tokens=MAX_NEW, eos_token_id=EOS, num_beams=2,
        min_new_tokens=6))
    _assert_match(ref, mine)


def test_beam_sample_stochastic_properties(tiny_llama):
    """num_beams>1 + do_sample (the reference forwards both to HF beam-sample,
    custom_salmon.py:704-720): deterministic per rng, varies across rngs, and
    collapses to plain beam search as temperature → 0."""
    _, cfg, params = tiny_llama
    seq = embed_tokens(params, jnp.asarray(PROMPTS))
    lengths = jnp.full((PROMPTS.shape[0],), PROMPTS.shape[1], jnp.int32)

    gen_hot = GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=EOS,
                               num_beams=2, do_sample=True, temperature=5.0)
    a = np.asarray(beam_decode_from_sequence(cfg, params, seq, lengths, gen_hot,
                                             rng=jax.random.PRNGKey(0)))
    b = np.asarray(beam_decode_from_sequence(cfg, params, seq, lengths, gen_hot,
                                             rng=jax.random.PRNGKey(0)))
    c = np.asarray(beam_decode_from_sequence(cfg, params, seq, lengths, gen_hot,
                                             rng=jax.random.PRNGKey(9)))
    np.testing.assert_array_equal(a, b)  # same rng → same draw
    assert not np.array_equal(a, c)      # different rng → (a.s.) different

    gen_cold = GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=EOS,
                                num_beams=2, do_sample=True, temperature=1e-4)
    gen_det = GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=EOS,
                               num_beams=2)
    cold = np.asarray(beam_decode_from_sequence(cfg, params, seq, lengths,
                                                gen_cold, rng=jax.random.PRNGKey(3)))
    det = np.asarray(beam_decode_from_sequence(cfg, params, seq, lengths, gen_det))
    np.testing.assert_array_equal(cold, det)  # T→0 recovers beam search
