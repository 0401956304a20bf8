"""Driver benchmark configs 1 and 4, exercised exactly as BASELINE.md names
them (round-1 VERDICT weak #3).

Config 1: VoxCeleb sentiment, speech_only + text few-shot (k=5), Qwen2-0.5B
backbone — CPU smoke: pack → loss → generate on the REAL 0.5B decoder config
(`qwen2_audio_smoke` / DECODER_CONFIGS["qwen2-0.5b"]).

Config 4: MELD emotion + SQA through the symbolAdapter unified symbol
training path (orchestrated schedule on synthetic data).
"""

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
from icl_speech_text_llm_tpu.data.packing import PackConfig
from icl_speech_text_llm_tpu.data.prompts import build_qwen_prompt
from icl_speech_text_llm_tpu.inference.engine import GenerationConfig
from icl_speech_text_llm_tpu.registry import DatasetType, get_dataset_config
from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer


def test_config1_qwen2_0_5b_voxceleb_k5_smoke():
    """BASELINE.md config #1 with the real Qwen2-0.5B decoder shape."""
    from icl_speech_text_llm_tpu.models.qwen_audio import (
        init_qwen_audio,
        qwen2_audio_smoke,
        qwen_audio_generate,
        qwen_audio_train_loss,
    )

    cfg = qwen2_audio_smoke()
    assert cfg.llm.dim == 896 and cfg.llm.n_layers == 24  # Qwen2-0.5B shape
    params = init_qwen_audio(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    task = get_dataset_config(DatasetType.VOXCELEB)
    pack_cfg = PackConfig(
        seq_len=1280, text_len=512, max_slots=1,
        audio_tokens_per_slot=cfg.audio_tokens_per_slot,
    )
    rng = np.random.RandomState(0)
    examples = [
        {"text": f"speech about topic {j}",
         "label": ["positive", "negative", "neutral"][j % 3]}
        for j in range(5)  # k=5 text few-shot
    ]
    plan = build_qwen_prompt(task.prompt_template, "", examples,
                             input_mode="speech_only", fewshot_mode="text")
    sample = ICLSample(
        plan=plan, completion="positive",
        slot_audio={("main", 0): rng.randn(16000).astype(np.float32) * 0.05},
    )
    batch = collate_icl_batch([sample], tok, pack_cfg)
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
    assert 0.2 * np.log(cfg.llm.vocab_size) < float(loss) < 2 * np.log(cfg.llm.vocab_size)

    gen = GenerationConfig(max_new_tokens=3, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    toks = np.asarray(qwen_audio_generate(cfg, gen, params, dev))
    assert toks.shape == (1, 3)
    assert (toks >= 0).all() and (toks < cfg.llm.vocab_size).all()


def test_config4_meld_emotion_sqa_symbol_training(tmp_path):
    """BASELINE.md config #4: symbol-adapter unified training over
    MELD_EMOTION + SQA (ref orchestrator_training.py:43-110)."""
    from icl_speech_text_llm_tpu.symbol_adapter import (
        TrainingConfig,
        TrainingMode,
        build_training_world,
    )

    cfg = TrainingConfig(
        mode=TrainingMode.BYPASS_MLP_SYM,
        total_cycles=1,
        model_type="salmonn-tiny",
    )
    cfg.output_dir = str(tmp_path / "config4")
    cfg.data_config.dataset_type = "meld_emotion-sqa"
    cfg.data_config.val_dataset_type = "meld_emotion"
    cfg.data_config.batch_size = 2
    cfg.data_config.max_samples = 4
    cfg.data_config.val_max_samples = 2
    cfg.data_config.val_batch_size = 2
    cfg.data_config.num_examples = 1
    cfg.data_config.fewshot_mode = "text"
    cfg.data_config.synthetic = True
    cfg.lora_config.epochs = 1
    cfg.lora_config.final_epochs = 1

    orch = build_training_world(cfg, seed=0)
    # the symbol manager learned MELD emotion labels (SQA carries none)
    labels = set(orch.trainer.symbol_manager.original_labels)
    assert {"anger", "joy", "sadness"} <= labels

    out = orch.run_complete_training()
    assert len(out["summaries"]) >= 1
    assert all(np.isfinite(s["final_loss"]) for s in out["summaries"])
