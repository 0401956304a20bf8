"""Native host runtime (runtime/libiclrt.so): pack + resample, with fallback
equivalence."""

import numpy as np
import pytest

from icl_speech_text_llm_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    return native.get_lib()


def test_pack_audio_block(lib):
    wavs = [np.random.randn(1000).astype(np.float32), None,
            np.random.randn(3000).astype(np.float32)]
    out = native.pack_audio_block(wavs, 2000)
    assert out.shape == (3, 2000)
    np.testing.assert_array_equal(out[0, :1000], wavs[0])
    assert out[0, 1000:].any() == False  # noqa: E712
    assert out[1].any() == False  # noqa: E712
    np.testing.assert_array_equal(out[2], wavs[2][:2000])


def test_pack_matches_numpy_fallback(lib):
    wavs = [np.random.randn(n).astype(np.float32) if n else None
            for n in [100, 0, 500, 250]]
    fast = native.pack_audio_block(wavs, 300)
    saved = native._lib, native._load_attempted
    native._lib, native._load_attempted = None, True
    try:
        slow = native.pack_audio_block(wavs, 300)
    finally:
        native._lib, native._load_attempted = saved
    np.testing.assert_array_equal(fast, slow)


def test_resample_tone(lib):
    sr1, sr2 = 22050, 16000
    t = np.arange(sr1) / sr1
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    res = native.resample(tone, sr1, sr2)
    t2 = np.arange(len(res)) / sr2
    expect = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    assert np.abs(res[200:-200] - expect[200:-200]).max() < 0.01


def test_resample_identity(lib):
    w = np.random.randn(1234).astype(np.float32)
    np.testing.assert_array_equal(native.resample(w, 16000, 16000), w)


def test_resample_upsample(lib):
    sr1, sr2 = 8000, 16000
    t = np.arange(sr1) / sr1
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    res = native.resample(tone, sr1, sr2)
    t2 = np.arange(len(res)) / sr2
    expect = np.sin(2 * np.pi * 220 * t2).astype(np.float32)
    assert np.abs(res[200:-200] - expect[200:-200]).max() < 0.01
