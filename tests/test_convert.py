"""Checkpoint conversion tests with synthetic torch-style state dicts."""

import numpy as np
import pytest

from icl_speech_text_llm_tpu.models.convert import (
    convert_hf_decoder,
    convert_hf_whisper_encoder,
    convert_salmonn_checkpoint,
)
from icl_speech_text_llm_tpu.models.llama import DECODER_CONFIGS, DecoderConfig
from icl_speech_text_llm_tpu.models.qformer import QFormerConfig
from icl_speech_text_llm_tpu.models.whisper import WhisperEncoderConfig

CFG = DecoderConfig(vocab_size=64, dim=16, n_layers=2, n_heads=4, n_kv_heads=2,
                    hidden_dim=32, qkv_bias=True)


def _fake_hf_llm(cfg, prefix="model."):
    rng = np.random.RandomState(0)
    sd = {
        prefix + "embed_tokens.weight": rng.randn(cfg.vocab_size, cfg.dim).astype(np.float32),
        prefix + "norm.weight": np.ones(cfg.dim, np.float32),
        "lm_head.weight": rng.randn(cfg.vocab_size, cfg.dim).astype(np.float32),
    }
    hd = cfg.hd
    for i in range(cfg.n_layers):
        p = f"{prefix}layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = rng.randn(cfg.n_heads * hd, cfg.dim).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = rng.randn(cfg.n_kv_heads * hd, cfg.dim).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = rng.randn(cfg.n_kv_heads * hd, cfg.dim).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = rng.randn(cfg.dim, cfg.n_heads * hd).astype(np.float32)
        sd[p + "self_attn.q_proj.bias"] = rng.randn(cfg.n_heads * hd).astype(np.float32)
        sd[p + "self_attn.k_proj.bias"] = rng.randn(cfg.n_kv_heads * hd).astype(np.float32)
        sd[p + "self_attn.v_proj.bias"] = rng.randn(cfg.n_kv_heads * hd).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = rng.randn(cfg.hidden_dim, cfg.dim).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = rng.randn(cfg.hidden_dim, cfg.dim).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = rng.randn(cfg.dim, cfg.hidden_dim).astype(np.float32)
        sd[p + "input_layernorm.weight"] = np.ones(cfg.dim, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(cfg.dim, np.float32)
    return sd


def test_convert_hf_decoder_shapes_and_transpose():
    sd = _fake_hf_llm(CFG)
    params = convert_hf_decoder(sd, CFG)
    assert params["tok_embed"].shape == (64, 16)
    assert params["layers"]["attn"]["wq"].shape == (2, 16, 16)
    assert params["layers"]["attn"]["bk"].shape == (2, 8)
    assert params["lm_head"].shape == (16, 64)
    # transpose correctness: ours (in,out) == torch (out,in).T
    np.testing.assert_array_equal(
        params["layers"]["attn"]["wq"][0], sd["model.layers.0.self_attn.q_proj.weight"].T
    )


def test_convert_hf_decoder_peft_nesting():
    """PEFT-wrapped checkpoints prefix base_model.model. — the reference's
    embed_tokens nesting trap (custom_salmon.py:190-192)."""
    sd = _fake_hf_llm(CFG)
    nested = {("base_model.model." + k if k != "lm_head.weight" else k): v
              for k, v in sd.items()}
    params = convert_hf_decoder(nested, CFG)
    np.testing.assert_array_equal(params["tok_embed"], sd["model.embed_tokens.weight"])


def test_convert_whisper_encoder():
    cfg = WhisperEncoderConfig(dim=16, n_heads=4, n_layers=1)
    rng = np.random.RandomState(1)
    p = "model.encoder."
    sd = {
        p + "conv1.weight": rng.randn(16, 80, 3).astype(np.float32),
        p + "conv1.bias": np.zeros(16, np.float32),
        p + "conv2.weight": rng.randn(16, 16, 3).astype(np.float32),
        p + "conv2.bias": np.zeros(16, np.float32),
        p + "embed_positions.weight": rng.randn(1500, 16).astype(np.float32),
        p + "layer_norm.weight": np.ones(16, np.float32),
        p + "layer_norm.bias": np.zeros(16, np.float32),
    }
    lp = p + "layers.0."
    for name, shape in [
        ("self_attn.q_proj.weight", (16, 16)), ("self_attn.q_proj.bias", (16,)),
        ("self_attn.k_proj.weight", (16, 16)),
        ("self_attn.v_proj.weight", (16, 16)), ("self_attn.v_proj.bias", (16,)),
        ("self_attn.out_proj.weight", (16, 16)), ("self_attn.out_proj.bias", (16,)),
        ("self_attn_layer_norm.weight", (16,)), ("self_attn_layer_norm.bias", (16,)),
        ("final_layer_norm.weight", (16,)), ("final_layer_norm.bias", (16,)),
        ("fc1.weight", (64, 16)), ("fc1.bias", (64,)),
        ("fc2.weight", (16, 64)), ("fc2.bias", (16,)),
    ]:
        sd[lp + name] = rng.randn(*shape).astype(np.float32)
    params = convert_hf_whisper_encoder(sd, cfg)
    assert params["conv1"]["w"].shape == (3, 80, 16)  # (k, in, out)
    assert params["blocks"]["attn"]["wq"].shape == (1, 16, 16)
    # conv kernel transpose: torch (out,in,k) -> ours (k,in,out)
    np.testing.assert_array_equal(
        params["conv1"]["w"][0, :, 0], sd[p + "conv1.weight"][0, :, 0]
    )


def test_convert_salmonn_lora_and_proj():
    llm = CFG
    qf = QFormerConfig(encoder_width=32, dim=8, n_heads=2, n_layers=1, llm_dim=16)
    rng = np.random.RandomState(2)
    sd = {}
    for i in range(llm.n_layers):
        base = f"llama_model.base_model.model.model.layers.{i}.self_attn."
        sd[base + "q_proj.lora_A.weight"] = rng.randn(4, llm.dim).astype(np.float32)
        sd[base + "q_proj.lora_B.weight"] = rng.randn(llm.n_heads * llm.hd, 4).astype(np.float32)
        sd[base + "v_proj.lora_A.weight"] = rng.randn(4, llm.dim).astype(np.float32)
        sd[base + "v_proj.lora_B.weight"] = rng.randn(llm.n_kv_heads * llm.hd, 4).astype(np.float32)
    sd["speech_query_tokens"] = rng.randn(1, 1, qf.dim).astype(np.float32)
    sd["speech_llama_proj.weight"] = rng.randn(qf.llm_dim, qf.dim).astype(np.float32)
    sd["speech_llama_proj.bias"] = np.zeros(qf.llm_dim, np.float32)
    sd["ln_speech.weight"] = np.ones(16, np.float32)
    sd["ln_speech.bias"] = np.zeros(16, np.float32)
    sd["ln_audio.weight"] = np.ones(16, np.float32)
    sd["ln_audio.bias"] = np.zeros(16, np.float32)

    out = convert_salmonn_checkpoint(sd, qf, llm)
    assert out["lora"]["wq"]["a"].shape == (2, llm.dim, 4)
    assert out["lora"]["wq"]["b"].shape == (2, 4, llm.n_heads * llm.hd)
    assert out["qformer"]["query_tokens"].shape == (1, qf.dim)
    assert out["qformer"]["proj"]["w"].shape == (qf.dim, qf.llm_dim)
    assert out["qformer"]["ln_input"]["w"].shape == (32,)  # speech+audio concat
