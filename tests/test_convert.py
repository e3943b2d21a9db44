"""Weight-converter tests: weight-norm folding vs torch, DAC state-dict
mapping on a real torch weight-normed module tree, model state-dict mapping
producing the exact pytree structure of init_model_params."""

import numpy as np
import jax
import torch
import torch.nn as nn
import pytest

from unimoe_audio_tpu.codec.dac import DACConfig, dac_encode, dac_decode, tiny_dac_config
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.core import convert as CV
from unimoe_audio_tpu.models.model import init_model_params


def test_fold_weight_norm_matches_torch():
    conv = nn.Conv1d(3, 5, 7)
    wn = nn.utils.weight_norm(conv)
    g = wn.weight_g.detach().numpy()
    v = wn.weight_v.detach().numpy()
    want = wn.weight.detach().numpy()
    got = CV.fold_weight_norm(g, v)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _wn(m):
    return nn.utils.weight_norm(m)


class TorchSnake(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, dim, 1))

    def forward(self, x):
        return x + (1.0 / (self.alpha + 1e-9)) * torch.sin(self.alpha * x) ** 2


def build_torch_dac(cfg: DACConfig) -> nn.Module:
    """Minimal torch module tree with descript-audio-codec's module paths."""

    class Wrap(nn.Module):
        pass

    def res_unit(dim, dil):
        # Real DAC's ResidualUnit is a module with a .block Sequential child.
        ru = Wrap()
        ru.block = nn.Sequential(
            TorchSnake(dim),
            _wn(nn.Conv1d(dim, dim, 7, dilation=dil, padding=((7 - 1) * dil) // 2)),
            TorchSnake(dim),
            _wn(nn.Conv1d(dim, dim, 1)),
        )
        return ru

    import math

    model = Wrap()
    d = cfg.encoder_dim
    enc = [
        _wn(nn.Conv1d(1, d, 7, padding=3)),
    ]
    for stride in cfg.encoder_rates:
        blk = Wrap()
        blk.block = nn.Sequential(
            res_unit(d, 1), res_unit(d, 3), res_unit(d, 9),
            TorchSnake(d),
            _wn(nn.Conv1d(d, d * 2, 2 * stride, stride=stride, padding=math.ceil(stride / 2))),
        )
        enc.append(blk)
        d *= 2
    enc += [TorchSnake(d), _wn(nn.Conv1d(d, cfg.latent_dim, 3, padding=1))]
    model.encoder = Wrap()
    model.encoder.block = nn.Sequential(*enc)

    model.quantizer = Wrap()
    qs = []
    for _ in range(cfg.n_codebooks):
        q = Wrap()
        q.in_proj = _wn(nn.Conv1d(cfg.latent_dim, cfg.codebook_dim, 1))
        q.out_proj = _wn(nn.Conv1d(cfg.codebook_dim, cfg.latent_dim, 1))
        q.codebook = nn.Embedding(cfg.codebook_size, cfg.codebook_dim)
        qs.append(q)
    model.quantizer.quantizers = nn.ModuleList(qs)

    d = cfg.decoder_dim
    dec = [_wn(nn.Conv1d(cfg.latent_dim, d, 7, padding=3))]
    for stride in cfg.decoder_rates:
        out_d = d // 2
        blk = Wrap()
        blk.block = nn.Sequential(
            TorchSnake(d),
            _wn(nn.ConvTranspose1d(d, out_d, 2 * stride, stride=stride,
                                   padding=math.ceil(stride / 2),
                                   output_padding=stride % 2)),
            res_unit(out_d, 1), res_unit(out_d, 3), res_unit(out_d, 9),
        )
        dec.append(blk)
        d = out_d
    dec += [TorchSnake(d), _wn(nn.Conv1d(d, 1, 7, padding=3)), nn.Tanh()]
    model.decoder = Wrap()
    model.decoder.model = nn.Sequential(*dec)
    return model


def test_dac_conversion_roundtrip_forward():
    """Convert a torch weight-normed DAC tree and check the JAX forward is
    consistent (encode shapes + decode finite, deterministic codes)."""
    cfg = tiny_dac_config()
    torch.manual_seed(0)
    tm = build_torch_dac(cfg)
    sd = tm.state_dict()
    params = CV.convert_dac_state_dict(
        sd, n_enc_blocks=len(cfg.encoder_rates),
        n_dec_blocks=len(cfg.decoder_rates), n_codebooks=cfg.n_codebooks,
    )
    params = jax.tree.map(np.asarray, params)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, 1, cfg.hop_length * 10)).astype(np.float32) * 0.2
    codes = np.asarray(dac_encode(params, audio, cfg))
    assert codes.shape == (1, cfg.n_codebooks, 10)
    wave = np.asarray(dac_decode(params, codes, cfg))
    assert np.isfinite(wave).all() and (np.abs(wave) <= 1).all()

    # Folded conv weight equals torch's effective weight.
    eff = tm.encoder.block[0].weight.detach().numpy()
    np.testing.assert_allclose(params["encoder"]["conv_in_w"], eff, rtol=1e-5, atol=1e-6)


def test_model_state_dict_conversion_structure():
    """Converted HF-style state dict must match init_model_params' pytree
    structure and shapes exactly."""
    cfg = tiny_test_config()
    tc = cfg.text_config
    ref = init_model_params(jax.random.PRNGKey(0), cfg, dtype=np.float32)

    rng = np.random.default_rng(0)
    sd = {}

    def add(name, shape):
        sd[name] = rng.normal(size=shape).astype(np.float32)

    D, V = tc.hidden_size, tc.vocab_size
    H, KV, Dh = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim
    add("language_model.embed_tokens.weight", (V, D))
    add("language_model.norm.weight", (D,))
    add("lm_head.weight", (V, D))
    for c in range(cfg.codec_channels):
        add(f"codec_embed_tokens.{c}.weight", (cfg.codec_embed_size, D))
    add("codec_head.weight", (cfg.codec_channels * cfg.codec_embed_size, D))
    for l in range(tc.num_hidden_layers):
        p = f"language_model.layers.{l}"
        add(f"{p}.input_layernorm.weight", (D,))
        add(f"{p}.post_attention_layernorm.weight", (D,))
        add(f"{p}.self_attn.q_proj.weight", (H * Dh, D))
        add(f"{p}.self_attn.q_proj.bias", (H * Dh,))
        add(f"{p}.self_attn.k_proj.weight", (KV * Dh, D))
        add(f"{p}.self_attn.k_proj.bias", (KV * Dh,))
        add(f"{p}.self_attn.v_proj.weight", (KV * Dh, D))
        add(f"{p}.self_attn.v_proj.bias", (KV * Dh,))
        add(f"{p}.self_attn.o_proj.weight", (D, H * Dh))
        add(f"{p}.mlp.gate.weight", (tc.num_experts, D))
        for e in range(tc.mlp_dynamic_expert_num):
            base = f"{p}.mlp.dynamic_real_moe.deepspeed_moe.experts.deepspeed_experts.{e}"
            add(f"{base}.gate_proj.weight", (tc.dynamic_intermediate_size, D))
            add(f"{base}.up_proj.weight", (tc.dynamic_intermediate_size, D))
            add(f"{base}.down_proj.weight", (D, tc.dynamic_intermediate_size))
        for e in range(tc.mlp_fixed_expert_num):
            base = f"{p}.mlp.fixed_real_moe.{e}"
            add(f"{base}.gate_proj.weight", (tc.shared_intermediate_size, D))
            add(f"{base}.up_proj.weight", (tc.shared_intermediate_size, D))
            add(f"{base}.down_proj.weight", (D, tc.shared_intermediate_size))

    got = CV.convert_model_state_dict(sd, cfg)

    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), got)
    assert ref_shapes == got_shapes

    # Transposition check: q_proj row 0 of torch weight [out, in] must appear
    # as column 0 of the converted [in, out] matrix.
    np.testing.assert_allclose(
        got["layers"]["attn"]["q_proj"]["w"][0][:, 0],
        sd["language_model.layers.0.self_attn.q_proj.weight"][0],
        rtol=1e-6,
    )
