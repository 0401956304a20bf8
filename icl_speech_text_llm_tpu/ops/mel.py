"""Whisper-compatible log-mel audio frontend, TPU-native.

Replaces the reference's host-side ``WhisperFeatureExtractor`` calls
(ref: data/model_processors.py:492-495,641-645) with a jittable JAX function.

Design notes (TPU-first):
- The STFT runs as a framed ``jnp.fft.rfft``: measured f32 accuracy is ~1e-6
  against a float64 reference, whereas a single f32 DFT-matmul accumulates up
  to ~9e-2 error in low-power bins (400-term dot products at mel dynamic
  range). The windowed DFT basis is kept available (``_dft_basis``) for a
  future fused Pallas variant with compensated accumulation.
- All shapes are static: audio is padded/truncated to 30 s (480k samples) just
  like Whisper, so the function compiles exactly once.
- batched via vmap; works for (n,) or (B, n) input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
N_MELS = 80
CHUNK_LENGTH_S = 30
N_SAMPLES = SAMPLE_RATE * CHUNK_LENGTH_S  # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3_000
N_FREQS = N_FFT // 2 + 1  # 201


def hertz_to_mel_slaney(freq):
    """Slaney-scale Hz→mel (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(
        log_region, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep, mels
    )
    return mels


def mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)
    return freq


@functools.lru_cache(maxsize=4)
def mel_filter_bank(
    n_freqs: int = N_FREQS,
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
    f_min: float = 0.0,
    f_max: float = 8000.0,
) -> np.ndarray:
    """Slaney-normalized triangular mel filter bank, (n_freqs, n_mels).

    Matches transformers.audio_utils.mel_filter_bank with norm="slaney",
    mel_scale="slaney" (what WhisperFeatureExtractor uses).
    """
    fft_freqs = np.linspace(0.0, sample_rate / 2, n_freqs)
    mel_min = hertz_to_mel_slaney(f_min)
    mel_max = hertz_to_mel_slaney(f_max)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = mel_to_hertz_slaney(mel_pts)

    # Triangular filters between successive center frequencies.
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # Slaney normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_basis(n_fft: int = N_FFT) -> np.ndarray:
    """Windowed real-DFT basis, (n_fft, 2*n_freqs): [cos | -sin] columns."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * k * f / n_fft
    window = np.hanning(n_fft + 1)[:-1]  # periodic Hann, matches torch.hann_window
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (window[:, None] * basis).astype(np.float32)


def _frame_indices(n_frames: int = N_FRAMES) -> np.ndarray:
    """Gather indices into the reflect-padded signal: (n_frames, n_fft)."""
    starts = np.arange(n_frames) * HOP_LENGTH
    return (starts[:, None] + np.arange(N_FFT)[None, :]).astype(np.int32)


def wavs_to_float(wavs: jnp.ndarray) -> jnp.ndarray:
    """Undo the collator's int16 transport encoding (no-op for float input)."""
    if jnp.issubdtype(wavs.dtype, jnp.integer):
        return wavs.astype(jnp.float32) / 32768.0
    return wavs


def pad_or_trim(wav: jnp.ndarray, length: int = N_SAMPLES) -> jnp.ndarray:
    """Zero-pad / truncate the last axis to ``length`` (Whisper semantics)."""
    n = wav.shape[-1]
    if n == length:
        return wav
    if n > length:
        return wav[..., :length]
    pad = [(0, 0)] * (wav.ndim - 1) + [(0, length - n)]
    return jnp.pad(wav, pad)


def _log_mel_single(wav: jnp.ndarray, mel_fb: jnp.ndarray, window: jnp.ndarray,
                    use_dft: bool = True) -> jnp.ndarray:
    """(N_SAMPLES,) f32 → (n_mels, N_FRAMES) Whisper log-mel features.

    ``use_dft``: the STFT as windowed-DFT matmuls on the MXU at
    ``Precision.HIGHEST``. The original design note rejected the DFT-matmul
    for ~9e-2 low-power-bin error — that error came from TPU's DEFAULT
    matmul precision (bf16 operands); at HIGHEST (f32 multi-pass) the
    DFT-matmul matches the rfft path to 7.9e-4 in the log-mel output on
    device (scripts/probe_frontends.py — well under the bf16 resolution the
    encoder consumes it at) and 2e-7 on CPU.

    SLICE framing (r4): the frontend cost is ~50× the transform's FLOPs —
    it is the overlapping-frame GATHER (3000×400 rows materialized), not
    the DFT. With hop 160 / window 400, frame i is rows i, i+1 and the
    first half of row i+2 of the signal viewed as (·, 160) — so the STFT is
    THREE contiguous-slice matmuls against 160-row chunks of the windowed
    basis, summed. Identical math (a dot over 400 terms split 160+160+80),
    zero gathers, and the signal is read 3× (5.8 MB) instead of one
    materialized 4.8 MB frame tensor + gather traffic."""
    # Whisper drops the final STFT frame, so only N_FRAMES windows are needed;
    # center=True reflect padding of n_fft//2 on each side.
    padded = jnp.pad(wav, (N_FFT // 2, N_FFT // 2), mode="reflect")

    if use_dft:
        basis = jnp.asarray(_dft_basis())  # window folded into the basis
        hp = jax.lax.Precision.HIGHEST
        n_full = N_FFT // HOP_LENGTH  # full 160-rows per frame (2)
        rem = N_FFT - n_full * HOP_LENGTH  # trailing samples (80)
        n_rows = N_FRAMES + n_full + 1  # rows so every slice below is valid
        sig = jnp.pad(padded, (0, n_rows * HOP_LENGTH - padded.shape[0]))
        rows = sig.reshape(n_rows, HOP_LENGTH)
        spec2 = jax.lax.dot(
            rows[0:N_FRAMES], basis[:HOP_LENGTH], precision=hp)
        for j in range(1, n_full):
            spec2 = spec2 + jax.lax.dot(
                rows[j:N_FRAMES + j], basis[j * HOP_LENGTH:(j + 1) * HOP_LENGTH],
                precision=hp)
        if rem:
            spec2 = spec2 + jax.lax.dot(
                rows[n_full:N_FRAMES + n_full, :rem],
                basis[n_full * HOP_LENGTH:], precision=hp)
        power = spec2[:, :N_FREQS] ** 2 + spec2[:, N_FREQS:] ** 2
    else:
        frames = padded[_frame_indices()]  # (N_FRAMES, N_FFT)
        spec = jnp.fft.rfft(frames * window[None, :], axis=-1)
        power = spec.real**2 + spec.imag**2

    mel = power @ mel_fb  # (N_FRAMES, N_MELS)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # (N_MELS, N_FRAMES)


@functools.partial(jax.jit, static_argnums=(1,))
def log_mel_spectrogram(wav: jnp.ndarray, n_mels: int = N_MELS) -> jnp.ndarray:
    """Whisper log-mel features.

    Args:
        wav: (n,) or (B, n) float32 PCM at 16 kHz. Padded/truncated to 30 s.
        n_mels: filter-bank size — 80 for Whisper-large-v2 (SALMONN),
            128 for Qwen2-Audio's tower (HF ``WhisperFeatureExtractor``
            with ``feature_size=128``; same Slaney bank, more filters).

    Returns:
        (n_mels, N_FRAMES) or (B, n_mels, N_FRAMES), parity with
        ``WhisperFeatureExtractor`` to ~1e-4.
    """
    mel_fb = jnp.asarray(mel_filter_bank(n_mels=n_mels))
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1].astype(np.float32))
    wav = pad_or_trim(wav.astype(jnp.float32))
    if wav.ndim == 1:
        return _log_mel_single(wav, mel_fb, window)
    flat = wav.reshape(-1, N_SAMPLES)
    out = jax.vmap(_log_mel_single, in_axes=(0, None, None))(flat, mel_fb, window)
    return out.reshape(*wav.shape[:-1], n_mels, N_FRAMES)


def resample_kaiser(wav: jnp.ndarray, orig_sr: int, new_sr: int, zeros: int = 16) -> jnp.ndarray:
    """Windowed-sinc polyphase resampler (host-side prep for non-16 kHz audio).

    The reference relied on datasets already being 16 kHz; this covers the
    general case without torchaudio. Filter half-width covers ``zeros`` sinc
    zero crossings at the upsampled rate.
    """
    if orig_sr == new_sr:
        return wav
    from math import gcd

    g = gcd(orig_sr, new_sr)
    up, down = new_sr // g, orig_sr // g
    rate = max(up, down)
    T = zeros * rate
    cutoff = 1.0 / rate
    n = np.arange(-T, T + 1)
    h = np.sinc(n * cutoff) * cutoff * up * np.kaiser(2 * T + 1, 8.0)
    h = jnp.asarray(h, dtype=jnp.float32)
    x = jnp.zeros(wav.shape[-1] * up, dtype=jnp.float32).at[::up].set(wav)
    y = jnp.convolve(x, h, mode="same")
    return y[::down]
