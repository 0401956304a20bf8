"""Component-level profile of the SALMONN-7B prefill on the real chip.

Round-2 attributed 230 ms of the 1.19 s batch-4 prefill to BEATs+Q-Former
(~22% MFU) and ~190 ms to whisper attention. This script times every
component as its own jitted program, pipelined, with the measured
per-dispatch floor subtracted (every component is ≥10 ms of device work, so
the ~1 ms floor is noise), and prints a table with analytic-FLOPs MFU per
component.

Usage: python scripts/profile_prefill.py  [ITERS=20]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

ITERS = int(os.environ.get("ITERS", "20"))
B, K_SHOTS = 4, 5
N_CLIPS = B * (K_SHOTS + 1)


def timed(fn, *args, name="", flops=0.0, floor=0.0, peak=197e12):
    """Pipelined dispatch timing (bench.py style): every component here is
    ≥10 ms of device work, so the ~1 ms per-dispatch floor (subtracted) is
    noise — and unlike a lax.scan wrapper it adds no compile cost, which
    dominated through the remote-compile tunnel (a scan-wrapped whisper
    encoder sat >20 min in AOT compile)."""
    jfn = jax.jit(lambda c, *a: fn(*a, c).astype(jnp.float32).ravel()[:4].sum())
    np.asarray(jfn(jnp.float32(0), *args))  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jfn(jnp.float32(0), *args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS - floor
    mfu = flops / dt / peak if flops else 0.0
    print(f"{name:38s} {dt*1e3:9.2f} ms   {flops/1e12:7.2f} TF   MFU {mfu*100:5.1f}%")
    return dt


def measure_floor():
    """Per-dispatch floor: a trivial jitted program, pipelined."""
    a = jnp.float32(1.0)
    jfn = jax.jit(lambda c: a * 1e-30 + c)
    np.asarray(jfn(jnp.float32(0)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = jfn(jnp.float32(0))
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    import dataclasses

    from icl_speech_text_llm_tpu.models.beats import beats_encode_fbank, kaldi_fbank
    from icl_speech_text_llm_tpu.models.beats import FBANK_MEAN, FBANK_STD
    from icl_speech_text_llm_tpu.models.llama import (
        decoder_forward, init_decoder_quantized, init_lora, lm_logits)
    from icl_speech_text_llm_tpu.models.qformer import init_qformer, qformer_windows
    from icl_speech_text_llm_tpu.models.salmonn import init_beats, salmonn_7b
    from icl_speech_text_llm_tpu.models.whisper import (
        init_whisper_encoder, whisper_encode)
    from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask
    from icl_speech_text_llm_tpu.ops.mel import log_mel_spectrogram, pad_or_trim

    cfg = dataclasses.replace(salmonn_7b(), encode_chunk=6)
    tok = get_tokenizer()

    def to_bf16(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree)

    k = jax.random.PRNGKey(0)
    kw, kb, kq, kl, klo = jax.random.split(k, 5)
    pw = to_bf16(init_whisper_encoder(kw, cfg.whisper))
    pb = to_bf16(init_beats(kb, cfg.beats))
    pq = to_bf16(init_qformer(kq, cfg.qformer))
    pl_ = init_decoder_quantized(kl, cfg.llm, bits=8)
    plo = to_bf16(init_lora(klo, cfg.llm, cfg.lora))

    floor = measure_floor()
    peak = bench._chip_peak_flops(jax.devices()[0])
    print(f"device {jax.devices()[0]}, dispatch floor {floor*1e3:.2f} ms/call")

    C = cfg.encode_chunk  # production encodes clips in chunks of this size
    wav = jnp.asarray(np.random.RandomState(0).randn(C, 16000 * 30)
                      .astype(np.float32) * 0.05)
    flat = pad_or_trim(wav)
    mel = log_mel_spectrogram(flat)

    scale = N_CLIPS / C  # report at 24-clip batch cost

    # --- mel + fbank frontends ---
    timed(lambda w, c: log_mel_spectrogram(w + c * 0), flat,
          name=f"whisper mel x{C} (24-clip cost = x{scale:.0f})", floor=floor)
    fb = kaldi_fbank(wav * (2 ** 15), n_mels=cfg.beats.n_fbank)
    fbn = (fb - FBANK_MEAN) / (2 * FBANK_STD)
    timed(lambda w, c: kaldi_fbank(w * (2 ** 15) + c * 0,
                                   n_mels=cfg.beats.n_fbank), wav,
          name=f"beats kaldi_fbank x{C}", floor=floor)

    # --- whisper encoder ---
    # params are ARGUMENTS everywhere below: closure-captured weights become
    # HLO constants and the remote-compile payload (weights included) made a
    # single component compile take >20 min (same lesson as cli/serve.py)
    wf = bench.whisper_flops(cfg.whisper, C)
    timed(lambda p, m, c: whisper_encode(cfg.whisper, p, m + c.astype(m.dtype) * 0, dtype=jnp.bfloat16),
          pw, mel, name=f"whisper encoder x{C}", flops=wf, floor=floor, peak=peak)

    # --- beats: frontend-only vs full ---
    bf_cfg = dataclasses.replace(cfg.beats, n_layers=0)
    pb0 = dict(pb, layers=jax.tree_util.tree_map(lambda x: x[:0], pb["layers"]))
    timed(lambda p, f, c: beats_encode_fbank(bf_cfg, p, f + c.astype(f.dtype) * 0, dtype=jnp.bfloat16),
          pb0, fbn, name=f"beats frontend x{C}", floor=floor)
    bfl = bench.beats_flops(cfg.beats, C)
    timed(lambda p, f, c: beats_encode_fbank(cfg.beats, p, f + c.astype(f.dtype) * 0, dtype=jnp.bfloat16),
          pb, fbn, name=f"beats full x{C}", flops=bfl, floor=floor, peak=peak)

    # --- conv_pos lowering A/B (grouped conv = suspected frontend cost:
    # XLA's grouped-conv rewrite can expand filters block-diagonally, G×
    # the FLOPs; 'unrolled'/'im2col' avoid the expansion) ---
    from icl_speech_text_llm_tpu.models import beats as beats_mod

    bcfg = cfg.beats
    t_tokens = 1496  # 30 s → (2998//16)·(128//16)
    xpos = jnp.asarray(np.random.RandomState(2).randn(C, t_tokens, bcfg.dim)
                       .astype(np.float32) * 0.1, jnp.bfloat16)
    cpf = C * (t_tokens + 1) * bcfg.dim * (bcfg.dim // bcfg.conv_pos_groups) \
        * bcfg.conv_pos * 2
    for impl in ("grouped", "unrolled", "im2col"):
        icfg = dataclasses.replace(bcfg, conv_pos_impl=impl)
        timed(lambda p, xx, c, icfg=icfg: beats_mod._conv_pos_embed(
                  icfg, p, xx + c.astype(xx.dtype) * 0),
              pb["conv_pos"], xpos, name=f"conv_pos[{impl}] x{C}",
              flops=cpf, floor=floor, peak=peak)

    # --- qformer (input: concat whisper (C,1500,1280) + beats pad to 1500) ---
    ws = jax.jit(whisper_encode, static_argnums=(0,), static_argnames=("dtype",))(
        cfg.whisper, pw, mel, dtype=jnp.bfloat16)
    bs = jax.jit(beats_encode_fbank, static_argnums=(0,), static_argnames=("dtype",))(
        cfg.beats, pb, fbn, dtype=jnp.bfloat16)
    bs = jnp.pad(bs, ((0, 0), (0, ws.shape[1] - bs.shape[1]), (0, 0)))
    feats = jnp.concatenate([ws, bs], axis=-1)
    qf = bench.qformer_flops(cfg.qformer, C)
    timed(lambda p, f, c: qformer_windows(cfg.qformer, p, f + c.astype(f.dtype) * 0),
          pq, feats, name=f"qformer x{C}", flops=qf, floor=floor, peak=peak)

    # --- decoder prefill (batch 4, seq 1024) ---
    L = 1024
    seq = jnp.asarray(np.random.RandomState(1).randn(B, L, cfg.llm.dim)
                      .astype(np.float32) * 0.1, jnp.bfloat16)
    lengths = jnp.full((B,), L, jnp.int32)
    mask = make_prefill_mask(lengths, L)
    positions = jnp.broadcast_to(jnp.arange(L), (B, L))
    df = bench.decoder_flops(cfg.llm, B * L, L, B)

    def dec(p, lo, s, c):
        h, _ = decoder_forward(cfg.llm, p, s + c.astype(s.dtype) * 0, mask,
                               positions, lora=lo, lora_scaling=cfg.lora.scaling,
                               flash_lengths=lengths)
        last = jnp.take_along_axis(h, (lengths - 1)[:, None, None], axis=1)
        return lm_logits(cfg.llm, p, last)[:, 0]

    timed(dec, pl_, plo, seq, name=f"decoder prefill B{B} L{L}", flops=df,
          floor=floor, peak=peak)


if __name__ == "__main__":
    main()
