"""Qwen2-Audio family: prompt structure, loss, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
from icl_speech_text_llm_tpu.data.packing import PackConfig
from icl_speech_text_llm_tpu.data.prompts import build_qwen_prompt
from icl_speech_text_llm_tpu.inference.engine import GenerationConfig
from icl_speech_text_llm_tpu.models.qwen_audio import (
    init_qwen_audio,
    qwen2_audio_tiny,
    qwen_audio_generate,
    qwen_audio_train_loss,
)
from icl_speech_text_llm_tpu.registry import DatasetType
from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer


def test_qwen_prompt_structure():
    plan = build_qwen_prompt(
        "SYSTEM T", "main text",
        [{"text": "ex", "label": "positive"}],
        input_mode="speech_only", fewshot_mode="speech",
    )
    assert plan.slots == [("example", 0), ("main", 0)]
    assert plan.prompt.startswith("<|im_start|>system\nSYSTEM T<|im_end|>")
    assert plan.prompt.count("<|AUDIO|>") == 2
    assert "Audio 1: <|audio_bos|>" in plan.prompt
    assert plan.prompt.endswith("<|im_start|>assistant\n")
    # segment structure: rebuild by joining with <|AUDIO|>
    assert "<|AUDIO|>".join(plan.segments) == plan.prompt


def test_qwen_prompt_sqa_dual_audio():
    plan = build_qwen_prompt(
        "S", "doc", [], input_mode="speech_and_text", fewshot_mode="text",
        dataset_type=DatasetType.SQA, question="q?",
    )
    assert plan.slots == [("question", -1), ("document", -1)]
    assert "Question text: q?" in plan.prompt


def test_qwen_audio_loss_and_generate():
    cfg = qwen2_audio_tiny()
    params = init_qwen_audio(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    pack_cfg = PackConfig(
        seq_len=1024, text_len=192, max_slots=1,
        audio_tokens_per_slot=cfg.audio_tokens_per_slot,
    )
    rng = np.random.RandomState(0)
    samples = []
    for i in range(2):
        plan = build_qwen_prompt("Classify the sentiment.", "", [],
                                 input_mode="speech_only", fewshot_mode="text")
        samples.append(ICLSample(
            plan=plan, completion="positive",
            slot_audio={("main", 0): rng.randn(16000).astype(np.float32) * 0.05},
        ))
    batch = collate_icl_batch(samples, tok, pack_cfg)
    dev = {
        "text_tokens": jnp.asarray(batch.text_tokens),
        "gather_idx": jnp.asarray(batch.gather_idx),
        "seq_mask": jnp.asarray(batch.seq_mask),
        "shifted_labels": jnp.asarray(batch.labels_shifted),
        "wavs": jnp.asarray(batch.audio["wavs"]),
        "seq_lengths": jnp.asarray(batch.seq_lengths),
    }
    loss = qwen_audio_train_loss(cfg, params, dev)
    assert bool(jnp.isfinite(loss))
    assert 0.5 * np.log(cfg.llm.vocab_size) < float(loss) < 2 * np.log(cfg.llm.vocab_size)

    gen = GenerationConfig(max_new_tokens=4, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    toks = qwen_audio_generate(cfg, gen, params, dev)
    assert toks.shape == (2, 4)
    assert bool((toks >= 0).all())


def test_factory_routes_qwen():
    from icl_speech_text_llm_tpu.models.factory import QwenAudioModel, create_model

    model = create_model("qwen2-audio-tiny")
    assert isinstance(model, QwenAudioModel)
    assert model.cfg.audio_tokens_per_slot == 750
    assert model.engine is model  # engine protocol
    import pytest

    with pytest.raises(ValueError):
        create_model("not-a-model")
