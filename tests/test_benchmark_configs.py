"""End-to-end coverage of the driver benchmark configs (BASELINE.md), tiny
models, hermetic data:

1. VoxCeleb k-shot text-fewshot inference (config #1 shape, covered elsewhere)
2. HVB classification inference (config #2)
3. Multi-task VOXCELEB+HVB LoRA training with grad ckpt (config #3)
4. MELD emotion + SQA via the symbol path building blocks (config #4)
5. VoxPopuli k=10 speech-exemplar long-context generation (config #5)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.data.factory import create_dataset
from icl_speech_text_llm_tpu.data.packing import PackConfig
from icl_speech_text_llm_tpu.data.pipeline import PrefetchIterator
from icl_speech_text_llm_tpu.inference.runner import (
    InferenceSettings,
    run_inference,
    save_final_results,
)
from icl_speech_text_llm_tpu.models.factory import create_model
from icl_speech_text_llm_tpu.registry import DatasetSplit, DatasetType
from icl_speech_text_llm_tpu.training.loop import TrainSettings, iter_batches, train
from icl_speech_text_llm_tpu.training.step import (
    OptimizerSettings,
    init_train_state,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def model():
    return create_model("salmonn-tiny", seed=0)


def _pack(model, slots, seq=768, text=512):
    return PackConfig(seq_len=seq, text_len=text, max_slots=slots,
                      audio_tokens_per_slot=model.cfg.audio_tokens_per_slot)


def test_hvb_inference_e2e(model, tmp_path):
    """Config #2: HVB dialog-act inference with metrics JSON."""
    ds = create_dataset(DatasetType.HVB, synthetic=True, synthetic_size=4,
                        fewshot_mode="text", num_examples=1, input_mode="speech_only")
    settings = InferenceSettings(batch_size=2, results_dir=str(tmp_path),
                                 run_name="hvbtest", num_examples=1)
    payload = run_inference(model.engine, ds, _pack(model, 1, seq=1024, text=768),
                            settings)
    assert len(payload["results"]) == 4
    paths = save_final_results(payload, [DatasetType.HVB], settings)
    import json

    metrics = json.load(open(paths["metrics"]))
    assert "hvb" in metrics and "macro_f1" in metrics["hvb"]


def test_multitask_training_e2e(model):
    """Config #3: VOXCELEB+HVB multi-task LoRA training, grad checkpointing."""
    mt = create_dataset([DatasetType.VOXCELEB, DatasetType.HVB],
                        split=DatasetSplit.TRAIN, is_training=True,
                        synthetic=True, synthetic_size=2, fewshot_mode="text",
                        num_examples=1, input_mode="speech_only")
    assert len(mt) == 4  # balanced 2 tasks x max size 2
    pack = _pack(model, 1, seq=1024, text=768)
    optimizer = make_optimizer(OptimizerSettings(learning_rate=1e-3))
    state, frozen = init_train_state(model.params, optimizer)
    step_fn = make_train_step(model.cfg, optimizer, remat=True)  # grad ckpt
    losses = []
    for batch in iter_batches(mt, 2, model.tokenizer, pack):
        state, metrics = step_fn(state, frozen, {
            "text_tokens": jnp.asarray(batch.text_tokens),
            "gather_idx": jnp.asarray(batch.gather_idx),
            "seq_mask": jnp.asarray(batch.seq_mask),
            "shifted_labels": jnp.asarray(batch.labels_shifted),
            "wavs": jnp.asarray(batch.audio["wavs"]),
        })
        losses.append(float(metrics["loss"]))
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_sqa_generation_e2e(model):
    """Config #4 building block: SQA dual-audio prompts generate."""
    ds = create_dataset(DatasetType.SQA, synthetic=True, synthetic_size=2,
                        fewshot_mode="speech", num_examples=1,
                        input_mode="speech_only")
    item = ds[0]
    kinds = [k for k, _ in item.plan.slots]
    assert kinds == ["document", "question", "document", "question"]
    preds = None
    pack = PackConfig(seq_len=1024, text_len=512, max_slots=4,
                      audio_tokens_per_slot=model.cfg.audio_tokens_per_slot)
    from icl_speech_text_llm_tpu.data.collate import collate_icl_batch

    batch = collate_icl_batch([ds[0], ds[1]], model.tokenizer, pack)
    preds = model.engine.generate(batch, batch.audio)
    assert len(preds) == 2 and all(isinstance(p, str) for p in preds)


def test_many_shot_k10_generation(model):
    """Config #5: k=10 interleaved speech exemplars → 11 audio slots, ~1k audio
    positions, batched long-context generation."""
    ds = create_dataset(DatasetType.VOXPOPULI, synthetic=True, synthetic_size=2,
                        fewshot_mode="speech", num_examples=10,
                        input_mode="speech_only")
    item = ds[0]
    assert len(item.plan.slots) == 11  # 10 exemplars + main
    pack = PackConfig(seq_len=2048, text_len=768, max_slots=11,
                      audio_tokens_per_slot=model.cfg.audio_tokens_per_slot)
    from icl_speech_text_llm_tpu.data.collate import collate_icl_batch

    batch = collate_icl_batch([ds[0], ds[1]], model.tokenizer, pack)
    # 11 slots x 88 positions = 968 audio positions interleaved
    assert batch.seq_lengths.min() > 968
    preds = model.engine.generate(batch, batch.audio)
    assert len(preds) == 2


def test_prefetch_iterator_equivalence(model):
    ds = create_dataset(DatasetType.VOXCELEB, synthetic=True, synthetic_size=5,
                        fewshot_mode="text", num_examples=0, input_mode="text_only")
    pack = _pack(model, 1)
    direct = [b.text_tokens for b in iter_batches(ds, 2, model.tokenizer, pack)]
    fetched = [b.text_tokens for b in PrefetchIterator(
        lambda: iter_batches(ds, 2, model.tokenizer, pack))]
    assert len(direct) == len(fetched) == 3
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_prefetch_propagates_errors():
    def boom():
        yield 1
        raise RuntimeError("collate failed")

    it = PrefetchIterator(lambda: boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="collate failed"):
        next(it)
