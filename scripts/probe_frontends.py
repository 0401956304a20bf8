"""A/B the audio frontends (whisper log-mel, BEATs kaldi fbank) on device:
XLA FFT path vs the DFT-as-matmul path (Precision.HIGHEST), accuracy + time.

profile_prefill r4 put the two frontends at 11.6 ms per 6-clip chunk
(~46 ms of the salmonn-7b batch-4 step) with ~0% MFU — the XLA FFT op does
not use the MXU. The 400-point windowed DFT is a (frames, 400) x (400, 402)
matmul; at HIGHEST precision it is f32-accurate.

Usage: python scripts/probe_frontends.py [ITERS=20]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from icl_speech_text_llm_tpu.models.beats import kaldi_fbank
from icl_speech_text_llm_tpu.ops.mel import (
    N_SAMPLES,
    _log_mel_single,
    log_mel_spectrogram,
    mel_filter_bank,
)

ITERS = int(os.environ.get("ITERS", "20"))
C = 6
wav = (np.random.RandomState(0).randn(C, N_SAMPLES) * 0.05).astype(np.float32)
wav_j = jnp.asarray(wav)


def timed(fn, *args):
    def make(iters):
        def f(w):
            def rep(ww, _):
                o = fn(ww)
                return ww + (o.astype(jnp.float32).sum() * 1e-30).astype(ww.dtype), None
            ww, _ = jax.lax.scan(rep, w, None, length=iters)
            return ww.astype(jnp.float32).sum()
        return f

    t = {}
    for iters in (ITERS, 2 * ITERS):
        jf = jax.jit(make(iters))
        np.asarray(jf(wav_j))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(jf(wav_j))
            best = min(best, time.perf_counter() - t0)
        t[iters] = best
    return (t[2 * ITERS] - t[ITERS]) / ITERS


mel_fb = jnp.asarray(mel_filter_bank())
window = jnp.asarray(np.hanning(400 + 1)[:-1].astype(np.float32))


def mel_dft(w):
    return jax.vmap(lambda x: _log_mel_single(x, mel_fb, window, use_dft=True))(w)


def mel_fft(w):
    return jax.vmap(lambda x: _log_mel_single(x, mel_fb, window, use_dft=False))(w)


# accuracy: DFT-matmul vs rfft on device
a = np.asarray(jax.jit(mel_dft)(wav_j))
b = np.asarray(jax.jit(mel_fft)(wav_j))
print(f"mel  dft-vs-rfft max abs diff: {np.abs(a - b).max():.3e}", flush=True)

t_dft = timed(mel_dft)
t_fft = timed(mel_fft)
print(f"mel  x{C}: rfft {t_fft*1e3:7.3f} ms  dft-matmul {t_dft*1e3:7.3f} ms "
      f"({t_fft/t_dft:.1f}x)", flush=True)

wav16 = wav_j * 32768.0
ka = np.asarray(jax.jit(lambda w: kaldi_fbank(w, use_dft=True))(wav16))
kb = np.asarray(jax.jit(lambda w: kaldi_fbank(w, use_dft=False))(wav16))
print(f"kaldi dft-vs-rfft max abs diff: {np.abs(ka - kb).max():.3e}", flush=True)
t_kd = timed(lambda w: kaldi_fbank(w, use_dft=True))
t_kf = timed(lambda w: kaldi_fbank(w, use_dft=False))
print(f"kaldi x{C}: rfft {t_kf*1e3:7.3f} ms  dft-matmul {t_kd*1e3:7.3f} ms "
      f"({t_kf/t_kd:.1f}x)", flush=True)
