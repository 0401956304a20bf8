"""BEATs fidelity: JAX encoder + converter vs a minimal torch oracle.

The oracle re-implements the published BEATs architecture (microsoft/unilm
BEATs; WavLM-lineage backbone with gated relative position bias and deep-norm
residuals) in torch with the REAL checkpoint's parameter naming, so one test
validates both the numerics of models/beats.py and the state-dict mapping in
models/convert.py:convert_beats. Ref dependency: models/custom_salmon.py:32,67
loads BEATs_iter3_plus_AS2M... — without this fidelity the real checkpoint
cannot convert (round-1 VERDICT missing item #1).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from icl_speech_text_llm_tpu.models.beats import (  # noqa: E402
    BeatsConfig,
    beats_encode_fbank,
    init_beats,
    relative_position_buckets,
)
from icl_speech_text_llm_tpu.models.convert import convert_beats  # noqa: E402

CFG = BeatsConfig(
    n_fbank=32, patch=16, embed_dim=24, dim=32, n_heads=4, n_layers=2,
    conv_pos=16, conv_pos_groups=4, mlp_ratio=2,
    gated_rel_pos=True, rel_pos_buckets=32, rel_pos_max_distance=16,
)


def torch_rel_buckets(t, num_buckets, max_distance):
    """T5-style bidirectional bucketing exactly as BEATs/WavLM computes it."""
    context = torch.arange(t, dtype=torch.long)[:, None]
    memory = torch.arange(t, dtype=torch.long)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).long() * nb
    rel = rel.abs()
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        torch.log(torch.clamp(rel.float(), min=1.0) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).long()
    large = torch.min(large, torch.full_like(large, nb - 1))
    return buckets + torch.where(is_small, rel, large)


class OracleAttention(nn.Module):
    def __init__(self, cfg: BeatsConfig):
        super().__init__()
        d, h = cfg.dim, cfg.n_heads
        self.h, self.hd = h, d // h
        self.q_proj = nn.Linear(d, d)
        self.k_proj = nn.Linear(d, d)
        self.v_proj = nn.Linear(d, d)
        self.out_proj = nn.Linear(d, d)
        self.grep_linear = nn.Linear(self.hd, 8)
        self.grep_a = nn.Parameter(torch.ones(1, h, 1, 1))
        self.relative_attention_bias = nn.Embedding(cfg.rel_pos_buckets, h)

    def forward(self, x, pos_bias):
        B, T, D = x.shape
        q = self.q_proj(x).view(B, T, self.h, self.hd).transpose(1, 2)
        k = self.k_proj(x).view(B, T, self.h, self.hd).transpose(1, 2)
        v = self.v_proj(x).view(B, T, self.h, self.hd).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) * self.hd**-0.5  # (B,H,T,T)
        # gating from the raw layer input split into heads (WavLM fast path,
        # as validated by HF transformers' WavLM port)
        g = x.view(B, T, self.h, self.hd).permute(0, 2, 1, 3)
        proj = self.grep_linear(g).view(B, self.h, T, 2, 4).sum(-1)
        gate_a, gate_b = torch.sigmoid(proj).chunk(2, dim=-1)  # (B,H,T,1)
        scale = gate_a * (gate_b * self.grep_a - 1.0) + 2.0
        logits = logits + scale * pos_bias.unsqueeze(0)
        attn = torch.softmax(logits, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, T, D)
        return self.out_proj(out)


class OracleLayer(nn.Module):
    def __init__(self, cfg: BeatsConfig):
        super().__init__()
        d = cfg.dim
        self.alpha = cfg.deep_norm_alpha
        self.self_attn = OracleAttention(cfg)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, cfg.mlp_ratio * d)
        self.fc2 = nn.Linear(cfg.mlp_ratio * d, d)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, pos_bias):
        x = self.self_attn_layer_norm(x * self.alpha + self.self_attn(x, pos_bias))
        h = self.fc2(F.gelu(self.fc1(x)))
        return self.final_layer_norm(x * self.alpha + h)


class OracleEncoder(nn.Module):
    def __init__(self, cfg: BeatsConfig):
        super().__init__()
        conv = nn.Conv1d(cfg.dim, cfg.dim, kernel_size=cfg.conv_pos,
                         padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
        self.pos_conv = nn.ModuleList([nn.utils.weight_norm(conv, name="weight", dim=2)])
        self.layer_norm = nn.LayerNorm(cfg.dim)
        self.layers = nn.ModuleList([OracleLayer(cfg) for _ in range(cfg.n_layers)])
        self.even_kernel = cfg.conv_pos % 2 == 0
        # BEATs ties all layers' bias tables to layer 0's
        for i in range(1, cfg.n_layers):
            del self.layers[i].self_attn.relative_attention_bias
            self.layers[i].self_attn.relative_attention_bias = (
                self.layers[0].self_attn.relative_attention_bias
            )

    def forward(self, x, cfg: BeatsConfig):
        c = self.pos_conv[0](x.transpose(1, 2)).transpose(1, 2)
        if self.even_kernel:
            c = c[:, :-1]
        x = x + F.gelu(c)
        x = self.layer_norm(x)
        T = x.shape[1]
        buckets = torch_rel_buckets(T, cfg.rel_pos_buckets, cfg.rel_pos_max_distance)
        pos_bias = self.layers[0].self_attn.relative_attention_bias(buckets)  # (T,T,H)
        pos_bias = pos_bias.permute(2, 0, 1)  # (H,T,T)
        for layer in self.layers:
            x = layer(x, pos_bias)
        return x


class OracleBeats(nn.Module):
    def __init__(self, cfg: BeatsConfig):
        super().__init__()
        self.patch_embedding = nn.Conv2d(1, cfg.embed_dim, kernel_size=cfg.patch,
                                         stride=cfg.patch)
        self.layer_norm = nn.LayerNorm(cfg.embed_dim)
        self.post_extract_proj = nn.Linear(cfg.embed_dim, cfg.dim)
        self.encoder = OracleEncoder(cfg)
        self.cfg = cfg

    def forward(self, fbank):  # (B, T, F) already normalized
        x = self.patch_embedding(fbank.unsqueeze(1))  # (B,C,T/p,F/p)
        B, C = x.shape[:2]
        x = x.reshape(B, C, -1).transpose(1, 2)  # (B, N, C)
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)
        return self.encoder(x, self.cfg)


def _oracle_and_fbank(seed=0, B=2, frames=64):
    torch.manual_seed(seed)
    oracle = OracleBeats(CFG).eval()
    # perturb initializations away from defaults so ties/zeros can't hide bugs
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(0.05 * torch.randn_like(p))
    fbank = torch.randn(B, frames, CFG.n_fbank)
    return oracle, fbank


def test_bucketing_matches_torch_real_config():
    ours = relative_position_buckets(200, 320, 800)
    ref = torch_rel_buckets(200, 320, 800).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_beats_forward_matches_torch_oracle():
    import jax.numpy as jnp

    oracle, fbank = _oracle_and_fbank()
    with torch.no_grad():
        ref = oracle(fbank).numpy()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = convert_beats(sd, CFG)
    out = np.asarray(beats_encode_fbank(CFG, params, jnp.asarray(fbank.numpy())))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_convert_beats_accepts_salmonn_nesting():
    import jax.numpy as jnp

    oracle, fbank = _oracle_and_fbank(seed=1)
    sd = {"beats." + k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    sd["predictor.weight"] = np.zeros((3, 3), np.float32)  # pretraining head: ignored
    params = convert_beats(sd, CFG)
    with torch.no_grad():
        ref = oracle(fbank).numpy()
    out = np.asarray(beats_encode_fbank(CFG, params, jnp.asarray(fbank.numpy())))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_init_beats_matches_converted_structure():
    """init_beats and convert_beats must produce identical tree structure."""
    import jax

    oracle, _ = _oracle_and_fbank()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    converted = convert_beats(sd, CFG)
    initialized = init_beats(jax.random.PRNGKey(0), CFG)
    c_paths = {"/".join(str(p) for p in path): np.shape(leaf)
               for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]}
    i_paths = {"/".join(str(p) for p in path): np.shape(leaf)
               for path, leaf in jax.tree_util.tree_flatten_with_path(initialized)[0]}
    assert c_paths == i_paths


def test_kaldi_fbank_matches_torchaudio():
    torchaudio = pytest.importorskip("torchaudio")
    import jax.numpy as jnp

    from icl_speech_text_llm_tpu.models.beats import kaldi_fbank

    rng = np.random.RandomState(0)
    wav = (rng.randn(16000).astype(np.float32) * 0.05).clip(-1, 1)
    ref = torchaudio.compliance.kaldi.fbank(
        torch.from_numpy(wav[None] * 2**15), num_mel_bins=128,
        sample_frequency=16000, frame_length=25, frame_shift=10,
    ).numpy()
    ours = np.asarray(kaldi_fbank(jnp.asarray(wav[None] * 2**15)))[0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-3)


def test_patch_embed_matmul_equals_conv_formulation():
    """The stride-16 patch embedding is stated as reshape+matmul for the MXU;
    it must be bit-equal to the conv formulation it replaces."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from icl_speech_text_llm_tpu.models import beats as m

    cfg = m.BeatsConfig()
    params = m.init_beats(jax.random.PRNGKey(0), cfg)
    fb = jax.random.normal(jax.random.PRNGKey(1), (2, 163, 128), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        fb[:, :160].reshape(2, 160, 128, 1), params["patch_embed"]["w"],
        window_strides=(16, 16), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    conv = (conv + params["patch_embed"]["b"]).reshape(2, -1, cfg.embed_dim)
    p, tp, fp = 16, 10, 8
    x = fb[:, : tp * p, : fp * p].reshape(2, tp, p, fp, p).transpose(0, 1, 3, 2, 4)
    mat = x.reshape(2, tp * fp, p * p) @ params["patch_embed"]["w"].reshape(
        p * p, cfg.embed_dim) + params["patch_embed"]["b"]
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(mat))


def test_conv_pos_impls_agree():
    """The three conv_pos lowerings (grouped conv / per-group dense convs /
    time-blocked im2col GEMM) are the same operator — outputs must agree to
    f32 reassociation tolerance at the real kernel geometry (K=128, G=16)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from icl_speech_text_llm_tpu.models import beats as m

    cfg = m.BeatsConfig()  # real geometry: conv_pos=128, groups=16, dim=768
    params = m.init_beats(jax.random.PRNGKey(0), cfg)
    # T=333 is deliberately NOT a multiple of the im2col block (128): the
    # ragged final block must trim exactly
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2, 333, cfg.dim), jnp.float32)
    ref = m._conv_pos_embed(cfg, params["conv_pos"], x)
    for impl in ("unrolled", "im2col"):
        alt = m._conv_pos_embed(
            dataclasses.replace(cfg, conv_pos_impl=impl), params["conv_pos"], x)
        assert alt.shape == ref.shape, impl
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=impl)


def test_conv_pos_impls_agree_odd_kernel():
    """Odd kernels skip the trailing-position trim — all impls must handle
    the Tout = T + 2·pad − K + 1 arithmetic for both parities."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from icl_speech_text_llm_tpu.models import beats as m

    cfg = m.BeatsConfig(dim=64, conv_pos=15, conv_pos_groups=4)
    params = m.init_beats(jax.random.PRNGKey(2), cfg)
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (3, 50, cfg.dim), jnp.float32)
    ref = m._conv_pos_embed(cfg, params["conv_pos"], x)
    for impl in ("unrolled", "im2col"):
        alt = m._conv_pos_embed(
            dataclasses.replace(cfg, conv_pos_impl=impl), params["conv_pos"], x)
        assert alt.shape == ref.shape, impl
        np.testing.assert_allclose(np.asarray(alt), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=impl)
