"""Architectural fidelity vs the reference's actual runtimes (HF models).

Tiny HF models are CONSTRUCTED LOCALLY from configs (random init, no hub
access), their torch state dicts converted via models/convert.py, and forward
outputs compared exactly. This validates the full real-weight loading path:
RoPE convention, GQA, RMSNorm, SwiGLU, qkv biases, conv padding, pre-LN blocks.

Parity targets f32 epsilon — any architectural mismatch shows up as O(1)
divergence, not 1e-7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from icl_speech_text_llm_tpu.models.convert import (
    convert_hf_decoder,
    convert_hf_whisper_encoder,
)
from icl_speech_text_llm_tpu.models.llama import (
    DecoderConfig,
    decoder_forward,
    embed_tokens,
    lm_logits,
)
from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask

IDS = np.array([[5, 17, 99, 3, 42, 7, 64, 23]])


def _run_mine(cfg, params, ids):
    emb = embed_tokens(params, jnp.asarray(ids))
    S = ids.shape[1]
    hidden, _ = decoder_forward(
        cfg, params, emb, make_prefill_mask(jnp.array([S]), S), jnp.arange(S)[None]
    )
    return np.asarray(lm_logits(cfg, params, hidden))


def test_llama_matches_hf():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=128,
                    rms_norm_eps=1e-6, rope_theta=10000.0)
    ).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = DecoderConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=128)
    params = convert_hf_decoder(sd, cfg)
    with torch.no_grad():
        ref = hf(torch.tensor(IDS)).logits.numpy()
    mine = _run_mine(cfg, params, IDS)
    assert np.abs(mine - ref).max() < 1e-5
    np.testing.assert_array_equal(mine.argmax(-1), ref.argmax(-1))


def test_qwen2_matches_hf():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(
        Qwen2Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, max_position_embeddings=128,
                    rms_norm_eps=1e-6, rope_theta=10000.0,
                    tie_word_embeddings=False)
    ).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = DecoderConfig(vocab_size=128, dim=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, hidden_dim=128, qkv_bias=True)
    params = convert_hf_decoder(sd, cfg)
    with torch.no_grad():
        ref = hf(torch.tensor(IDS)).logits.numpy()
    mine = _run_mine(cfg, params, IDS)
    assert np.abs(mine - ref).max() < 1e-5


def test_whisper_encoder_matches_hf():
    from transformers import WhisperConfig, WhisperModel

    from icl_speech_text_llm_tpu.models.whisper import (
        WhisperEncoderConfig,
        whisper_encode,
    )

    torch.manual_seed(2)
    hf = WhisperModel(
        WhisperConfig(d_model=64, encoder_layers=2, encoder_attention_heads=4,
                      decoder_layers=1, decoder_attention_heads=4,
                      encoder_ffn_dim=128, decoder_ffn_dim=128, num_mel_bins=80,
                      max_source_positions=1500)
    ).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = WhisperEncoderConfig(dim=64, n_heads=4, n_layers=2)
    params = convert_hf_whisper_encoder(sd, cfg, prefix="encoder.")
    mel = np.random.RandomState(0).randn(1, 80, 3000).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = hf.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    mine = np.asarray(whisper_encode(cfg, params, jnp.asarray(mel)))
    assert np.abs(mine - ref).max() < 1e-4


def test_qwen2_audio_path_matches_hf():
    """Audio tower → avg_pool → final LN → projector vs HF Qwen2-Audio."""
    from transformers import Qwen2AudioConfig, Qwen2AudioForConditionalGeneration, Qwen2Config
    from transformers.models.qwen2_audio.configuration_qwen2_audio import (
        Qwen2AudioEncoderConfig,
    )

    from icl_speech_text_llm_tpu.models.convert import convert_hf_qwen_audio
    from icl_speech_text_llm_tpu.models.qwen_audio import QwenAudioConfig, encode_audio
    from icl_speech_text_llm_tpu.models.whisper import WhisperEncoderConfig

    torch.manual_seed(3)
    acfg = Qwen2AudioEncoderConfig(d_model=64, encoder_layers=2,
                                   encoder_attention_heads=4, encoder_ffn_dim=128,
                                   num_mel_bins=80, max_source_positions=1500)
    tcfg = Qwen2Config(vocab_size=128, hidden_size=48, intermediate_size=96,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, rms_norm_eps=1e-6,
                       rope_theta=10000.0, tie_word_embeddings=False)
    hf = Qwen2AudioForConditionalGeneration(
        Qwen2AudioConfig(audio_config=acfg, text_config=tcfg)
    ).eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    mycfg = QwenAudioConfig(
        encoder=WhisperEncoderConfig(dim=64, n_heads=4, n_layers=2),
        llm=DecoderConfig(vocab_size=128, dim=48, n_layers=2, n_heads=4,
                          n_kv_heads=2, hidden_dim=96, qkv_bias=True),
    )
    params = convert_hf_qwen_audio(sd, mycfg)
    mel = np.random.RandomState(1).randn(1, 80, 3000).astype(np.float32) * 0.3
    with torch.no_grad():
        feats = hf.audio_tower(torch.tensor(mel)).last_hidden_state
        ref = hf.multi_modal_projector(feats).numpy()
    mine = np.asarray(encode_audio(mycfg, params, jnp.asarray(mel)))
    assert mine.shape == ref.shape == (1, 750, 48)
    assert np.abs(mine - ref).max() < 1e-4
