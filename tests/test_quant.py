"""Weight-only int8 decode quantization (ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.models.llama import (
    DECODER_CONFIGS,
    decoder_forward,
    embed_tokens,
    init_decoder,
    lm_logits,
)
from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask
from icl_speech_text_llm_tpu.ops.quant import (
    dequant_matmul,
    quantize_decoder,
    quantize_tensor,
)


def test_quantize_tensor_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    qt = quantize_tensor(w)
    assert qt["q"].dtype == jnp.int8 and qt["s"].shape == (32,)
    deq = qt["q"].astype(jnp.float32) * qt["s"]
    # per-channel symmetric int8: error bounded by s/2 per element
    assert np.abs(np.asarray(deq - w)).max() <= np.asarray(qt["s"]).max() / 2 + 1e-7
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
    np.testing.assert_allclose(
        np.asarray(dequant_matmul(x, qt)), np.asarray(x @ deq), rtol=1e-5, atol=1e-5
    )


def test_int4_roundtrip_exact_on_grid():
    """Weights that are exact scale-multiples must round-trip EXACTLY through
    pack → unpack (catches nibble-order / offset / group-indexing bugs)."""
    from icl_speech_text_llm_tpu.ops.quant import _dequant_int4, quantize_tensor_int4

    rng = np.random.RandomState(0)
    scale = 0.02
    w = (rng.randint(-7, 8, size=(256, 96)) * scale).astype(np.float32)
    qt = quantize_tensor_int4(jnp.asarray(w), group=128)
    assert qt["q4"].shape == (128, 96) and qt["q4"].dtype == jnp.uint8
    assert qt["s"].shape == (2, 96)
    deq = np.asarray(_dequant_int4(qt, jnp.float32))
    np.testing.assert_allclose(deq, w, rtol=0, atol=1e-6)


def test_int4_matmul_and_error_bound():
    from icl_speech_text_llm_tpu.ops.quant import _dequant_int4, quantize_tensor_int4

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 64)) * 0.1
    qt = quantize_tensor_int4(w, group=64)
    deq = _dequant_int4(qt, jnp.float32)
    # per-element error bounded by half an int4 step within its group
    err = np.abs(np.asarray(deq - w))
    bound = np.repeat(np.asarray(qt["s"]), 64, axis=0) / 2 + 1e-7
    assert (err <= bound).all()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    np.testing.assert_allclose(
        np.asarray(dequant_matmul(x, qt)), np.asarray(x @ deq), rtol=2e-5, atol=2e-5
    )


def test_int4_stacked_decoder_runs_and_tracks_f32():
    """bits=4 decoder: scan-compatible stacked layout; logits track the f32
    model loosely (group-wise int4 ~1.5% weight error on random weights)."""
    cfg = DECODER_CONFIGS["tiny"]
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    qparams = quantize_decoder(params, bits=4, group=64)
    assert qparams["layers"]["attn"]["wq"]["q4"].dtype == jnp.uint8

    ids = np.array([[3, 17, 42, 7, 99, 5, 23, 61]])
    S = ids.shape[1]
    mask = make_prefill_mask(jnp.array([S]), S)
    pos = jnp.arange(S)[None]

    def logits(p):
        emb = embed_tokens(p, jnp.asarray(ids))
        hidden, _ = decoder_forward(cfg, p, emb, mask, pos)
        return np.asarray(lm_logits(cfg, p, hidden))

    full, quant = logits(params), logits(qparams)
    scale = np.abs(full).max()
    # random-weight tiny decoder = worst case (near-uniform logits, ~1.5%
    # weight noise compounding through layers); bit-exactness of the packing
    # itself is pinned by test_int4_roundtrip_exact_on_grid
    assert np.abs(full - quant).max() / scale < 0.4, np.abs(full - quant).max()


def test_quantized_decoder_close_and_stacked():
    cfg = DECODER_CONFIGS["tiny"]
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    qparams = quantize_decoder(params)
    assert qparams["layers"]["attn"]["wq"]["q"].dtype == jnp.int8
    # original untouched
    assert not isinstance(params["layers"]["attn"]["wq"], dict)

    ids = np.array([[3, 17, 42, 7, 99, 5, 23, 61]])
    S = ids.shape[1]
    mask = make_prefill_mask(jnp.array([S]), S)
    pos = jnp.arange(S)[None]

    def logits(p):
        emb = embed_tokens(p, jnp.asarray(ids))
        hidden, _ = decoder_forward(cfg, p, emb, mask, pos)
        return np.asarray(lm_logits(cfg, p, hidden))

    full = logits(params)
    quant = logits(qparams)
    scale = np.abs(full).max()
    assert np.abs(full - quant).max() / scale < 0.05, np.abs(full - quant).max()
    # greedy decisions overwhelmingly agree
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.8, agree


def test_int8_quality_on_trained_weights():
    """Task-level int8 validation on TRAINED weights (round-1 VERDICT weak #8:
    random weights are near-uniform logits — the worst case but not the
    deployed case). Train salmonn-tiny until its loss collapses onto the
    label tokens, quantize the decoder, and require the quantized model to
    produce the SAME task predictions (accuracy delta 0 on the probe set)
    with near-total greedy token agreement."""
    from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
    from icl_speech_text_llm_tpu.data.packing import PackConfig
    from icl_speech_text_llm_tpu.data.prompts import build_default_prompt
    from icl_speech_text_llm_tpu.inference.engine import GenerationConfig, salmonn_generate
    from icl_speech_text_llm_tpu.models.salmonn import init_salmonn, salmonn_tiny
    from icl_speech_text_llm_tpu.training.step import (
        OptimizerSettings,
        init_train_state,
        make_optimizer,
        make_train_step,
        merge_params,
    )
    from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

    cfg = salmonn_tiny()
    tok = get_tokenizer()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    pack_cfg = PackConfig(seq_len=256, text_len=160, max_slots=1,
                          audio_tokens_per_slot=cfg.audio_tokens_per_slot)
    rng = np.random.RandomState(0)
    labels = ["positive", "negative"]
    samples = []
    for i in range(4):
        plan = build_default_prompt("Classify the speaker emotion.", f"utt {i}", [],
                                    input_mode="speech_only", fewshot_mode="text")
        samples.append(ICLSample(
            plan=plan, completion=labels[i % 2],
            slot_audio={("main", 0): rng.randn(16000).astype(np.float32) * 0.05},
        ))
    batch = collate_icl_batch(samples, tok, pack_cfg)
    train_batch = {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_mask": jnp.asarray(batch.seq_mask),
        "shifted_labels": jnp.asarray(batch.labels_shifted),
        "wavs": jnp.asarray(batch.audio["wavs"]),
    }

    optimizer = make_optimizer(OptimizerSettings(learning_rate=1e-2, max_grad_norm=1.0))
    state, frozen = init_train_state(params, optimizer)
    step_fn = make_train_step(cfg, optimizer)
    loss0 = None
    for _ in range(20):
        state, metrics = step_fn(state, frozen, train_batch)
        loss0 = loss0 or float(metrics["loss"])
    assert float(metrics["loss"]) < loss0 * 0.5, "training failed to converge"

    trained = merge_params(frozen, state.trainable)
    quantized = {**trained, "llm": quantize_decoder(trained["llm"])}

    gen_batch = {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_lengths": jnp.asarray(batch.seq_lengths),
        "wavs": jnp.asarray(batch.audio["wavs"]),
    }
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    toks_full = np.asarray(salmonn_generate(cfg, gen, trained, gen_batch))
    toks_int8 = np.asarray(salmonn_generate(cfg, gen, quantized, gen_batch))

    agree = (toks_full == toks_int8).mean()
    assert agree >= 0.95, (agree, toks_full, toks_int8)

    def predictions(toks):
        return [tok.decode([t for t in row if t != tok.pad_token_id],
                           skip_special_tokens=True) for row in toks]

    preds_full, preds_int8 = predictions(toks_full), predictions(toks_int8)
    # task-level: accuracy must be IDENTICAL between bf16 and int8
    want = [s.completion for s in samples]
    acc_full = np.mean([w in p for w, p in zip(want, preds_full)])
    acc_int8 = np.mean([w in p for w, p in zip(want, preds_int8)])
    assert acc_full == acc_int8, (preds_full, preds_int8)

    # int4 (group-wise) on the same trained model: the 13B-enabling layout
    # must also preserve the task predictions on peaked (trained) logits
    int4 = {**trained, "llm": quantize_decoder(trained["llm"], bits=4, group=64)}
    toks_int4 = np.asarray(salmonn_generate(cfg, gen, int4, gen_batch))
    preds_int4 = predictions(toks_int4)
    acc_int4 = np.mean([w in p for w, p in zip(want, preds_int4)])
    assert acc_full == acc_int4, (preds_full, preds_int4)

    # int8 KV cache on the same trained model: the decode-bandwidth halving
    # must preserve the task predictions on peaked (trained) logits too
    gen_kv = GenerationConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                              pad_token_id=tok.pad_token_id, kv_int8=True)
    toks_kv8 = np.asarray(salmonn_generate(cfg, gen_kv, trained, gen_batch))
    assert (toks_full == toks_kv8).mean() >= 0.95, (toks_full, toks_kv8)
    preds_kv8 = predictions(toks_kv8)
    acc_kv8 = np.mean([w in p for w, p in zip(want, preds_kv8)])
    assert acc_full == acc_kv8, (preds_full, preds_kv8)


def test_quantize_kv_roundtrip_and_zero_rows():
    from icl_speech_text_llm_tpu.ops.quant import quantize_kv

    kv = jax.random.normal(jax.random.PRNGKey(5), (3, 2, 17, 64), jnp.float32)
    kv = kv.at[0, 0, 3].set(0.0)  # an all-zero (padding) row
    q8, s = quantize_kv(kv)
    assert q8.dtype == jnp.int8 and s.shape == (3, 2, 17)
    deq = q8.astype(jnp.float32) * s[..., None]
    # symmetric rounding: |err| <= scale/2 per element
    err = np.abs(np.asarray(deq - kv))
    bound = np.asarray(s)[..., None] / 2 + 1e-9
    assert (err <= bound).all()
    assert float(s[0, 0, 3]) == 0.0 and float(np.abs(deq[0, 0, 3]).max()) == 0.0
