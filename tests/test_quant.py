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
