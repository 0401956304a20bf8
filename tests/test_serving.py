"""Continuous-batching serving engine vs the static-batch decode oracle.

Every request decoded through the slot pool must emit token-for-token what a
standalone batch-1 ``decode_from_sequence`` run produces — regardless of how
requests interleave, which slot they land in, or how often slots are reused.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from icl_speech_text_llm_tpu.inference.engine import GenerationConfig, decode_from_sequence
from icl_speech_text_llm_tpu.inference.serving import (
    ContinuousBatchingEngine,
    ServingConfig,
)
from icl_speech_text_llm_tpu.models.llama import DECODER_CONFIGS, init_decoder

MAX_NEW = 6
EOS = 2


@pytest.fixture(scope="module")
def llm():
    import jax

    cfg = DECODER_CONFIGS["tiny"]
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _requests(cfg, n, seed=0):
    rng = np.random.RandomState(seed)
    reqs = []
    for i in range(n):
        length = int(rng.randint(5, 24))
        emb = rng.randn(length, cfg.dim).astype(np.float32) * 0.3
        reqs.append((emb, length))
    return reqs


def _oracle(cfg, params, emb, length):
    """Batch-1 static decode for one request."""
    L = 32  # any bucket >= length; padding must not change the output
    padded = np.zeros((1, L, cfg.dim), np.float32)
    padded[0, :length] = emb
    gen = GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=EOS, pad_token_id=0)
    toks = np.asarray(
        decode_from_sequence(cfg, params, jnp.asarray(padded),
                             jnp.asarray([length]), gen)
    )[0]
    out = []
    for t in toks:
        if t == EOS:
            break
        out.append(int(t))
    return out


def test_matches_oracle_all_at_once(llm):
    cfg, params = llm
    scfg = ServingConfig(num_slots=3, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=EOS)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    reqs = _requests(cfg, 7)
    rids = [eng.submit(emb, length) for emb, length in reqs]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, (emb, length) in zip(rids, reqs):
        assert results[rid] == _oracle(cfg, params, emb, length), f"request {rid}"
    # dispatch-count stats are the basis for device-time throughput
    # accounting (bench.py bench_serving): every compiled-program launch
    # must be counted
    assert eng.stats["decode_blocks"] > 0
    assert sum(eng.stats["prefill_waves"].values()) >= 3  # 7 reqs / 3 slots
    assert eng.stats["flushes"] >= 1


def test_staggered_arrivals_and_slot_reuse(llm):
    """Requests arriving mid-flight decode identically; 2 slots serve 6 reqs."""
    cfg, params = llm
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=EOS)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    reqs = _requests(cfg, 6, seed=1)
    rids = [eng.submit(*reqs[i]) for i in range(3)]
    for _ in range(3):  # advance mid-flight
        eng.step()
    rids += [eng.submit(*reqs[i]) for i in range(3, 6)]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, (emb, length) in zip(rids, reqs):
        assert results[rid] == _oracle(cfg, params, emb, length), f"request {rid}"


def test_eos_truncation(llm):
    """Set eos to a token the model actually emits; output must stop there."""
    cfg, params = llm
    emb, length = _requests(cfg, 1, seed=2)[0]
    free_run = _oracle(cfg, params, emb, length)
    assert len(free_run) >= 2, "need a multi-token continuation for this test"
    eos = free_run[1]  # force an early stop at step 2

    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=eos)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    rid = eng.submit(emb, length)
    results = eng.run()
    assert results[rid] == free_run[:1]
    assert eos not in results[rid]


def test_oversize_prompt_rejected(llm):
    cfg, params = llm
    scfg = ServingConfig(num_slots=1, prompt_buckets=(16,))
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        eng.submit(np.zeros((40, cfg.dim), np.float32), 40)


def test_per_request_sampling_isolation(llm):
    """A sampled request must not perturb a greedy neighbor; sampling is
    deterministic for a fixed engine seed and varies across seeds."""
    cfg, params = llm
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=EOS)
    reqs = _requests(cfg, 2, seed=3)

    def run_pair(seed):
        eng = ContinuousBatchingEngine(cfg, params, scfg, seed=seed)
        r_greedy = eng.submit(*reqs[0])  # temperature defaults to 0
        r_hot = eng.submit(*reqs[1], temperature=5.0)
        out = eng.run()
        return out[r_greedy], out[r_hot]

    greedy_a, hot_a = run_pair(seed=0)
    greedy_b, hot_b = run_pair(seed=0)
    greedy_c, hot_c = run_pair(seed=7)

    oracle = _oracle(cfg, params, *reqs[0])
    assert greedy_a == oracle            # greedy slot unaffected by neighbor
    assert greedy_c == oracle            # ...at any engine seed
    assert hot_a == hot_b                # same seed -> same sample
    assert hot_a != hot_c or hot_b != hot_c  # different seed -> (almost surely) differs


def test_cap_flush_reclaims_early_eos_lanes(llm):
    """With a long token budget and early EOS, the cap-triggered flush must
    free the lane for the next request (round-2 review finding: _flush did
    not update the schedule, so early-EOS lanes stayed blocked)."""
    cfg, params = llm
    emb, length = _requests(cfg, 1, seed=2)[0]
    free_run = _oracle(cfg, params, emb, length)
    assert len(free_run) >= 2
    eos = free_run[1]  # EOS fires at step 2 of a 64-token budget

    scfg = ServingConfig(num_slots=1, max_new_tokens=64, prompt_buckets=(16, 32),
                         eos_token_id=eos, sync_every=4, max_pending_blocks=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    r1 = eng.submit(emb, length)
    r2 = eng.submit(emb, length)
    steps = 0
    while len(eng._results) < 2 and steps < 200:
        eng.step()
        steps += 1
    eng._flush()
    assert set(eng._results) == {r1, r2}
    # without reclamation: ~2 * ceil(63/4) = 32 steps; with it, the second
    # request admits right after the first cap flush (~2 blocks in)
    assert steps <= 12, steps


def test_per_request_max_new_tokens(llm):
    """Mixed per-request budgets in one engine run (ref multi_task_model.py:
    130-149 carries per-task max_new_tokens): each output is the oracle's,
    truncated to ITS budget, and small-budget slots free early (the run
    completes with fewer decode blocks than all-max budgets would need)."""
    cfg, params = llm
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=EOS)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    reqs = _requests(cfg, 6, seed=3)
    budgets = [1, MAX_NEW, 2, 3, MAX_NEW, 2]
    rids = [eng.submit(emb, length, max_new_tokens=b)
            for (emb, length), b in zip(reqs, budgets)]
    results = eng.run()
    assert set(results) == set(rids)
    for rid, (emb, length), b in zip(rids, reqs, budgets):
        assert results[rid] == _oracle(cfg, params, emb, length)[:b], f"request {rid}"


def test_per_request_budget_validation(llm):
    cfg, params = llm
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=EOS)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    emb, length = _requests(cfg, 1)[0]
    with pytest.raises(ValueError):
        eng.submit(emb, length, max_new_tokens=MAX_NEW + 1)
    with pytest.raises(ValueError):
        eng.submit(emb, length, max_new_tokens=0)


def test_kv_int8_serving_matches_kv_int8_oracle(llm):
    """int8-KV slot pool == int8-KV static decode, token-exact: quantization
    is per (position, head), so pool slot placement and bucket padding must
    not change any dequantized value the attention sees."""
    cfg, params = llm
    scfg = ServingConfig(num_slots=3, max_new_tokens=MAX_NEW,
                         prompt_buckets=(16, 32), eos_token_id=EOS,
                         kv_int8=True)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    reqs = _requests(cfg, 5, seed=3)
    rids = [eng.submit(emb, length) for emb, length in reqs]
    results = eng.run()
    gen = GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=EOS,
                           pad_token_id=0, kv_int8=True)
    for rid, (emb, length) in zip(rids, reqs):
        L = 32
        padded = np.zeros((1, L, cfg.dim), np.float32)
        padded[0, :length] = emb
        toks = np.asarray(decode_from_sequence(
            cfg, params, jnp.asarray(padded), jnp.asarray([length]), gen))[0]
        want = []
        for t in toks:
            if t == EOS:
                break
            want.append(int(t))
        assert results[rid] == want, f"request {rid}"


def _beam_oracle(cfg, params, emb, length, num_beams, budget=None):
    """Batch-1 static beam decode for one request (the engine's beam lane
    must be token-exact vs this — same program, batched differently)."""
    from icl_speech_text_llm_tpu.inference.beam import beam_decode_from_sequence

    L = 32
    padded = np.zeros((1, L, cfg.dim), np.float32)
    padded[0, :length] = emb
    gen = GenerationConfig(max_new_tokens=MAX_NEW, num_beams=num_beams,
                           eos_token_id=EOS, pad_token_id=0)
    toks = np.asarray(
        beam_decode_from_sequence(cfg, params, jnp.asarray(padded),
                                  jnp.asarray([length]), gen)
    )[0]
    out = []
    for t in toks:
        if t == EOS or (budget is not None and len(out) >= budget):
            break
        out.append(int(t))
    return out


def test_per_request_num_beams(llm):
    """Beam requests route through the beam lane and come back token-exact
    vs the static beam program; greedy requests interleaved in the same run
    stay token-exact vs the greedy oracle (ref models/multi_task_model.py:
    130-149 — per-task num_beams in the router)."""
    cfg, params = llm
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(32,), eos_token_id=EOS, admit_batch=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    reqs = _requests(cfg, 5, seed=3)
    rids, kinds = [], []
    for i, (emb, length) in enumerate(reqs):
        if i % 2 == 0:
            rids.append(eng.submit(emb, length, num_beams=3))
            kinds.append("beam")
        else:
            rids.append(eng.submit(emb, length))
            kinds.append("greedy")
    results = eng.run()
    assert eng.stats.get("beam_waves", 0) >= 1
    for rid, kind, (emb, length) in zip(rids, kinds, reqs):
        if kind == "beam":
            want = _beam_oracle(cfg, params, emb, length, num_beams=3)
        else:
            want = _oracle(cfg, params, emb, length)
        assert results[rid] == want, (rid, kind, results[rid], want)


def test_beam_lane_budget_and_width_grouping(llm):
    """Waves group by (bucket, K): mixed widths in one submission burst still
    come back right, and a per-request max_new_tokens truncates the beam
    hypothesis."""
    cfg, params = llm
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(32,), eos_token_id=EOS, admit_batch=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    reqs = _requests(cfg, 4, seed=11)
    rids = [
        eng.submit(reqs[0][0], reqs[0][1], num_beams=2),
        eng.submit(reqs[1][0], reqs[1][1], num_beams=4),
        eng.submit(reqs[2][0], reqs[2][1], num_beams=2, max_new_tokens=2),
        eng.submit(reqs[3][0], reqs[3][1], num_beams=4),
    ]
    results = eng.run()
    assert results[rids[0]] == _beam_oracle(cfg, params, *reqs[0], num_beams=2)
    assert results[rids[1]] == _beam_oracle(cfg, params, *reqs[1], num_beams=4)
    assert results[rids[2]] == _beam_oracle(cfg, params, *reqs[2], num_beams=2,
                                            budget=2)
    assert results[rids[3]] == _beam_oracle(cfg, params, *reqs[3], num_beams=4)
    assert len(results[rids[2]]) <= 2


def test_num_beams_validation(llm):
    cfg, params = llm
    eng = ContinuousBatchingEngine(cfg, params, ServingConfig(prompt_buckets=(32,)))
    with pytest.raises(ValueError):
        eng.submit(np.zeros((4, cfg.dim), np.float32), 4, num_beams=0)


def test_multi_lora_bank_serving(llm):
    """One slot pool serving two LoRA adapters: every request decodes under
    its own adapter_id and must be token-exact vs a static decode with that
    adapter (beam requests too — their waves group by adapter). The
    production shape of the reference's per-task adapters."""
    import jax

    from icl_speech_text_llm_tpu.inference.beam import beam_decode_from_sequence
    from icl_speech_text_llm_tpu.models.llama import (
        LoraConfig, init_lora, stack_lora_bank)

    cfg, params = llm
    lcfg = LoraConfig(rank=4, targets=("wq", "wv"))
    adapters = [
        jax.tree_util.tree_map(lambda x, _s=s: x + 0.05 * (_s + 1),
                               init_lora(jax.random.PRNGKey(s), cfg, lcfg))
        for s in (7, 8)
    ]
    bank = stack_lora_bank(adapters)
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(32,), eos_token_id=EOS, admit_batch=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg, lora=bank,
                                   lora_scaling=lcfg.scaling)
    reqs = _requests(cfg, 5, seed=21)
    plan = [(0, 1), (1, 1), (0, 1), (1, 2), (0, 2)]  # (adapter_id, num_beams)
    rids = [eng.submit(emb, length, adapter_id=aid, num_beams=k)
            for (emb, length), (aid, k) in zip(reqs, plan)]
    results = eng.run()

    def static_one(emb, length, aid, k):
        L = 32
        padded = np.zeros((1, L, cfg.dim), np.float32)
        padded[0, :length] = emb
        gen = GenerationConfig(max_new_tokens=MAX_NEW, num_beams=k,
                               eos_token_id=EOS, pad_token_id=0)
        fn = beam_decode_from_sequence if k > 1 else decode_from_sequence
        toks = np.asarray(fn(cfg, params, jnp.asarray(padded),
                             jnp.asarray([length]), gen,
                             lora=adapters[aid], lora_scaling=lcfg.scaling))[0]
        out = []
        for t in toks:
            if t == EOS:
                break
            out.append(int(t))
        return out

    for rid, (emb, length), (aid, k) in zip(rids, reqs, plan):
        assert results[rid] == static_one(emb, length, aid, k), (rid, aid, k)


def test_adapter_id_requires_bank(llm):
    cfg, params = llm
    eng = ContinuousBatchingEngine(cfg, params, ServingConfig(prompt_buckets=(32,)))
    with pytest.raises(ValueError):
        eng.submit(np.zeros((4, cfg.dim), np.float32), 4, adapter_id=1)


def test_chunked_prefill_matches_unchunked(llm):
    """chunk_len splits admission into fixed-size prefill dispatches with
    decode blocks interleaved between chunks; results must be token-exact vs
    the monolithic-prefill engine (greedy) on an oversubscribed workload."""
    cfg, params = llm
    reqs = _requests(cfg, 10, seed=33)

    def run(scfg):
        eng = ContinuousBatchingEngine(cfg, params, scfg)
        rids = [eng.submit(emb, length) for emb, length in reqs]
        res = eng.run()
        return [res[r] for r in rids], eng.stats

    base = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(32,), eos_token_id=EOS,
                         admit_batch=2)
    want, _ = run(base)
    got, stats = run(ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                                   prompt_buckets=(32,), eos_token_id=EOS,
                                   admit_batch=2, chunk_len=8))
    assert got == want
    assert stats["chunk_dispatches"] >= 4 * len(reqs) // 2  # 32/8 per wave


def test_chunked_prefill_validation(llm):
    cfg, params = llm
    with pytest.raises(ValueError):  # bucket not a multiple of chunk_len
        ContinuousBatchingEngine(
            cfg, params, ServingConfig(prompt_buckets=(48,), chunk_len=32))


def test_completed_streams_results_incrementally(llm):
    """completed() pops finished requests between steps (streaming consumer);
    the union over polls equals a drained run()."""
    cfg, params = llm
    reqs = _requests(cfg, 8, seed=44)
    scfg = ServingConfig(num_slots=2, max_new_tokens=MAX_NEW,
                         prompt_buckets=(32,), eos_token_id=EOS, admit_batch=2)
    eng = ContinuousBatchingEngine(cfg, params, scfg)
    rids = [eng.submit(emb, length) for emb, length in reqs]
    seen = {}
    polls_with_results = 0
    for _ in range(200):
        eng.step()
        got = eng.completed()
        assert not (set(got) & set(seen))  # a request finishes exactly once
        polls_with_results += bool(got)
        seen.update(got)
        if len(seen) == len(reqs):
            break
    assert len(seen) == len(reqs)
    assert polls_with_results > 1  # genuinely incremental, not one big drain

    eng2 = ContinuousBatchingEngine(cfg, params, scfg)
    rids2 = [eng2.submit(emb, length) for emb, length in reqs]
    res2 = eng2.run()
    assert [seen[r] for r in rids] == [res2[r] for r in rids2]
