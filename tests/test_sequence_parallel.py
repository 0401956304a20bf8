"""True sequence parallelism (activations sharded along T) vs the plain scan."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl_speech_text_llm_tpu.models.llama import (
    DECODER_CONFIGS,
    decoder_forward,
    init_decoder,
    init_lora,
    LoraConfig,
)
from icl_speech_text_llm_tpu.ops.attention import make_prefill_mask
from icl_speech_text_llm_tpu.parallel.mesh import make_mesh
from icl_speech_text_llm_tpu.parallel.sequence_parallel import sp_decoder_forward

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)

B, T = 2, 32


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(DECODER_CONFIGS["tiny"], n_layers=2)
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.dim)) * 0.1
    lengths = jnp.array([T, T - 7])
    positions = jnp.broadcast_to(jnp.arange(T), (B, T))
    return cfg, params, x, lengths, positions


def _plain(cfg, params, x, lengths, positions, **kw):
    mask = make_prefill_mask(lengths, T)
    h, _ = decoder_forward(cfg, params, x, mask, positions, **kw)
    return h


def test_sp_matches_plain(setup):
    cfg, params, x, lengths, positions = setup
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    ref = _plain(cfg, params, x, lengths, positions)
    out = sp_decoder_forward(mesh, "tp", cfg, params, x, positions, lengths)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d[0].max() < 1e-5
    assert d[1, : T - 7].max() < 1e-5  # valid region (rows past length differ)


def test_sp_with_lora_and_remat(setup):
    cfg, params, x, lengths, positions = setup
    lora_cfg = LoraConfig(rank=4, alpha=8.0)
    lora = init_lora(jax.random.PRNGKey(2), cfg, lora_cfg)
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    ref = _plain(cfg, params, x, lengths, positions,
                 lora=lora, lora_scaling=lora_cfg.scaling)
    out = sp_decoder_forward(mesh, "tp", cfg, params, x, positions, lengths,
                             lora=lora, lora_scaling=lora_cfg.scaling, remat=True)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d[0].max() < 1e-5
    assert d[1, : T - 7].max() < 1e-5


def test_sp_seq_divisibility_guard(setup):
    cfg, params, x, lengths, positions = setup
    mesh = make_mesh(dp=1, fsdp=1, tp=8)
    with pytest.raises(ValueError, match="not divisible"):
        sp_decoder_forward(mesh, "tp", cfg, params, x[:, :30], positions[:, :30],
                           lengths)
