"""Audio frontend parity tests against WhisperFeatureExtractor golden outputs."""

import os

import numpy as np
import pytest

from icl_speech_text_llm_tpu.ops.mel import (
    N_FRAMES,
    N_MELS,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filter_bank,
    pad_or_trim,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "whisper_mel.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_log_mel_parity_signal(golden):
    mine = np.asarray(log_mel_spectrogram(golden["wav1"]))
    assert mine.shape == (N_MELS, N_FRAMES)
    assert np.abs(mine[:, :300] - golden["mel1"]).max() < 1e-3
    # padded tail (silence region after the clip)
    assert np.abs(mine[:, -8:] - golden["mel1_tail"]).max() < 1e-3


def test_log_mel_parity_short_noise(golden):
    mine = np.asarray(log_mel_spectrogram(golden["wav2"]))
    assert np.abs(mine[:, :300] - golden["mel2"]).max() < 1e-3


def test_log_mel_batched_matches_single(golden):
    wavs = np.stack([pad_or_trim_np(golden["wav1"]), pad_or_trim_np(golden["wav2"])])
    batched = np.asarray(log_mel_spectrogram(wavs))
    single0 = np.asarray(log_mel_spectrogram(golden["wav1"]))
    single1 = np.asarray(log_mel_spectrogram(golden["wav2"]))
    assert batched.shape == (2, N_MELS, N_FRAMES)
    np.testing.assert_allclose(batched[0], single0, atol=1e-5)
    np.testing.assert_allclose(batched[1], single1, atol=1e-5)


def pad_or_trim_np(wav):
    out = np.zeros(N_SAMPLES, dtype=np.float32)
    out[: len(wav)] = wav[:N_SAMPLES]
    return out


def test_pad_or_trim():
    w = np.ones(10, np.float32)
    assert pad_or_trim(w).shape == (N_SAMPLES,)
    long = np.ones(N_SAMPLES + 5, np.float32)
    assert pad_or_trim(long).shape == (N_SAMPLES,)


def test_mel_filter_bank_properties():
    fb = mel_filter_bank()
    assert fb.shape == (201, N_MELS)
    assert fb.min() >= 0.0
    # every filter has support
    assert (fb.sum(axis=0) > 0).all()


def test_log_mel_128_parity_live():
    """Qwen2-Audio's tower takes 128 mel bins (WhisperFeatureExtractor
    feature_size=128); the n_mels parameterization must match HF."""
    pytest.importorskip("transformers")
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=128)
    wav = np.random.RandomState(5).randn(44_100).astype(np.float32) * 0.1
    ref = np.asarray(
        fe(wav, sampling_rate=16000, padding="max_length")["input_features"]
    )[0]
    mine = np.asarray(log_mel_spectrogram(wav, 128))
    assert mine.shape == ref.shape == (128, N_FRAMES)
    assert np.abs(mine - ref).max() < 1e-3
