"""Prefix-cached serving: register a shared prompt prefix (the k-shot
exemplar block of an ICL task) once, then prefill only each request's suffix.

The reference re-prefills the full k-shot prompt for every utterance
(ref: models/custom_salmon.py:704-720 generate over the whole assembled
sequence); on TPU the exemplar block's KV is computed once and copied into
each admitted slot — admission cost drops from O(prefix+suffix) prefill
FLOPs to O(suffix) + one HBM copy. Parity contract: token-exact vs the
same engine given the full concatenated prompt.
"""

import numpy as np
import pytest

import jax

from icl_speech_text_llm_tpu.inference.serving import (
    ContinuousBatchingEngine,
    ServingConfig,
)
from icl_speech_text_llm_tpu.models.llama import DECODER_CONFIGS, init_decoder

EOS = 2
MAX_NEW = 6


@pytest.fixture(scope="module")
def llm():
    cfg = DECODER_CONFIGS["tiny"]
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _full_prompts(cfg, n, prefix_len, rng_seed=11):
    """n (prefix + suffix) prompts sharing ONE prefix block."""
    rng = np.random.RandomState(rng_seed)
    prefix = (rng.randn(prefix_len, cfg.dim) * 0.3).astype(np.float32)
    suffixes = [
        ((rng.randn(l, cfg.dim) * 0.3).astype(np.float32), l)
        for l in rng.randint(4, 15, size=n)
    ]
    return prefix, suffixes


def _run_baseline(cfg, params, prefix, suffixes, kv_int8=False, temps=None):
    """Same requests through a no-prefix engine on the full concatenation."""
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(64,), eos_token_id=EOS,
                         admit_batch=2, kv_int8=kv_int8)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    rids = []
    for i, (suf, l) in enumerate(suffixes):
        full = np.concatenate([prefix, suf], axis=0)
        t = temps[i] if temps else 0.0
        rids.append(eng.submit(full, len(prefix) + l, temperature=t))
    res = eng.run()
    return [res[r] for r in rids]


def test_prefix_cache_token_parity(llm):
    cfg, params = llm
    prefix, suffixes = _full_prompts(cfg, 5, prefix_len=20)
    baseline = _run_baseline(cfg, params, prefix, suffixes)

    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16,), prefix_buckets=(32,),
                         eos_token_id=EOS, admit_batch=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    pid = eng.register_prefix(prefix, len(prefix))
    rids = [eng.submit(suf, l, prefix_id=pid) for suf, l in suffixes]
    res = eng.run()
    assert [res[r] for r in rids] == baseline


def test_mixed_prefix_and_plain_requests(llm):
    """Prefix and no-prefix requests interleave through one engine; two
    different prefixes batch into the same admission wave."""
    cfg, params = llm
    prefix_a, suffixes = _full_prompts(cfg, 4, prefix_len=20, rng_seed=5)
    prefix_b = (np.random.RandomState(6).randn(28, cfg.dim) * 0.3).astype(np.float32)

    plan = [  # (prefix array or None, suffix idx)
        (prefix_a, 0), (prefix_b, 1), (None, 2), (prefix_a, 3),
    ]
    base = []
    for pfx, i in plan:
        suf, l = suffixes[i]
        full = np.concatenate([pfx, suf]) if pfx is not None else suf
        base.append((full, len(full)))
    baseline = _run_baseline(cfg, params, np.zeros((0, cfg.dim), np.float32),
                             base)

    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16,), prefix_buckets=(32,),
                         eos_token_id=EOS, admit_batch=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    pids = {id(prefix_a): eng.register_prefix(prefix_a, len(prefix_a)),
            id(prefix_b): eng.register_prefix(prefix_b, len(prefix_b))}
    rids = []
    for pfx, i in plan:
        suf, l = suffixes[i]
        if pfx is None:
            rids.append(eng.submit(suf, l))
        else:
            rids.append(eng.submit(suf, l, prefix_id=pids[id(pfx)]))
    res = eng.run()
    assert [res[r] for r in rids] == baseline


def test_prefix_cache_int8_kv(llm):
    """Prefix path under the int8 KV cache matches the no-prefix int8 engine
    (quantization happens per position; splitting prefill cannot change it)."""
    cfg, params = llm
    prefix, suffixes = _full_prompts(cfg, 3, prefix_len=20, rng_seed=9)
    baseline = _run_baseline(cfg, params, prefix, suffixes, kv_int8=True)

    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16,), prefix_buckets=(32,),
                         eos_token_id=EOS, admit_batch=2, kv_int8=True)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    pid = eng.register_prefix(prefix, len(prefix))
    rids = [eng.submit(suf, l, prefix_id=pid) for suf, l in suffixes]
    res = eng.run()
    assert [res[r] for r in rids] == baseline


def test_prefix_cache_validation(llm):
    cfg, params = llm
    eng = ContinuousBatchingEngine(
        cfg, params, ServingConfig(prompt_buckets=(16,)))
    with pytest.raises(ValueError):  # no prefix_buckets configured
        eng.register_prefix(np.zeros((8, cfg.dim), np.float32), 8)
    with pytest.raises(ValueError):  # unknown prefix id
        eng.submit(np.zeros((4, cfg.dim), np.float32), 4, prefix_id=0)

    scfg = ServingConfig(prompt_buckets=(16,), prefix_buckets=(32,))
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    with pytest.raises(ValueError):  # prefix longer than every bucket
        eng.register_prefix(np.zeros((64, cfg.dim), np.float32), 64)
    pid = eng.register_prefix(np.zeros((8, cfg.dim), np.float32), 8)
    with pytest.raises(ValueError):  # beam lane has no prefix path
        eng.submit(np.zeros((4, cfg.dim), np.float32), 4,
                   prefix_id=pid, num_beams=2)


def test_cache_len_covers_prefix(llm):
    scfg = ServingConfig(prompt_buckets=(128,), prefix_buckets=(512,),
                         max_new_tokens=10)
    assert scfg.cache_len >= 128 + 512 + 10
    assert scfg.cache_len % 128 == 0


def test_prefix_cache_with_chunked_prefill(llm):
    """Prefix cache + chunked admission compose: the suffix streams in as
    chunks over the padded prefix KV; token-exact vs the full-prompt engine."""
    cfg, params = llm
    prefix, suffixes = _full_prompts(cfg, 4, prefix_len=20, rng_seed=13)
    baseline = _run_baseline(cfg, params, prefix, suffixes)

    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16,), prefix_buckets=(32,),
                         eos_token_id=EOS, admit_batch=2, chunk_len=8)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    pid = eng.register_prefix(prefix, len(prefix))
    rids = [eng.submit(suf, l, prefix_id=pid) for suf, l in suffixes]
    res = eng.run()
    assert [res[r] for r in rids] == baseline
