"""Golden parity: one full decoder layer (RMSNorm → GQA attention+RoPE →
RMSNorm → DCMoE) vs an independent torch oracle built from the reference's
math (utils/UniMoE_Audio_model.py:193-256 + utils/UniMoE_Audio_core.py:
196-358), with identical weights.  Catches attention/rope/norm/router
integration drift that unit tests can miss."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from tests.test_router import torch_block_routing
from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, text_model_forward


def torch_rms_norm(x, w, eps=1e-6):
    xf = x.float()
    v = xf.pow(2).mean(-1, keepdim=True)
    return (xf * torch.rsqrt(v + eps) * w.float()).to(x.dtype)


def torch_rope(pos, head_dim, theta):
    half = head_dim // 2
    inv = 1.0 / (theta ** (torch.arange(half, dtype=torch.float64) / half))
    ang = pos[:, None].double() * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    return emb.cos().float(), emb.sin().float()


def rot_half(x):
    a, b = x.chunk(2, dim=-1)
    return torch.cat([-b, a], dim=-1)


def torch_layer(weights, x, cfg):
    """x: [B, T, D] torch; weights: numpy dict from the JAX layer."""
    tc = cfg
    B, T, D = x.shape
    H, KV, Dh = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim
    w = {k: torch.tensor(np.asarray(v)) for k, v in weights.items() if not isinstance(v, dict)}
    attn = {k: {kk: torch.tensor(np.asarray(vv)) for kk, vv in v.items()}
            for k, v in weights["attn"].items()}
    moe = weights["moe"]

    residual = x
    h = torch_rms_norm(x, w["input_layernorm"])
    q = (h @ attn["q_proj"]["w"] + attn["q_proj"]["b"]).view(B, T, H, Dh)
    k = (h @ attn["k_proj"]["w"] + attn["k_proj"]["b"]).view(B, T, KV, Dh)
    v = (h @ attn["v_proj"]["w"] + attn["v_proj"]["b"]).view(B, T, KV, Dh)
    cos, sin = torch_rope(torch.arange(T), Dh, tc.rope_theta)
    cos, sin = cos[None, :, None], sin[None, :, None]
    q = q * cos + rot_half(q) * sin
    k = k * cos + rot_half(k) * sin
    k = k.repeat_interleave(H // KV, dim=2)
    v = v.repeat_interleave(H // KV, dim=2)
    scores = torch.einsum("bthd,bshd->bhts", q.float(), k.float()) * Dh ** -0.5
    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
    scores = scores.masked_fill(~mask[None, None], float("-inf"))
    probs = scores.softmax(-1)
    o = torch.einsum("bhts,bshd->bthd", probs, v.float()).reshape(B, T, H * Dh)
    x = residual + (o.to(x.dtype) @ attn["o_proj"]["w"])

    residual = x
    h = torch_rms_norm(x, w["post_attention_layernorm"])
    hs = h.reshape(-1, D)
    gate_w = torch.tensor(np.asarray(moe["gate"]))
    full_logits = hs @ gate_w
    E_dyn = tc.num_dynamic_experts
    E_real = tc.mlp_dynamic_expert_num
    dyn_logits = full_logits[:, :E_dyn].float()
    rw, mask_t, _ = torch_block_routing(dyn_logits, tc.mlp_dynamic_top_p,
                                        tc.router_jitter_noise)
    em = torch.zeros(hs.shape[0], tc.num_experts, dtype=torch.int32)
    em[:, :E_dyn] = mask_t
    em[:, E_dyn:] = 1
    gw = torch.softmax(full_logits.float().masked_fill(em == 0, float("-inf")), -1)
    dyn_mass = gw[:, :E_dyn].sum(-1, keepdim=True)
    global_w = torch.cat([rw * dyn_mass, gw[:, E_dyn:]], dim=-1)

    out = torch.zeros_like(hs)
    for e in range(E_real):
        wg = torch.tensor(np.asarray(moe["dynamic"]["gate"][e]))
        wu = torch.tensor(np.asarray(moe["dynamic"]["up"][e]))
        wd = torch.tensor(np.asarray(moe["dynamic"]["down"][e]))
        y = (F.silu(hs @ wg) * (hs @ wu)) @ wd
        out += y * (global_w[:, e] * em[:, e]).unsqueeze(-1)
    for j in range(tc.mlp_fixed_expert_num):
        wg = torch.tensor(np.asarray(moe["fixed"]["gate"][j]))
        wu = torch.tensor(np.asarray(moe["fixed"]["up"][j]))
        wd = torch.tensor(np.asarray(moe["fixed"]["down"][j]))
        y = (F.silu(hs @ wg) * (hs @ wu)) @ wd
        out += y * global_w[:, E_dyn + j].unsqueeze(-1)
    return residual + out.reshape(B, T, D)


def test_decoder_layer_matches_torch_oracle():
    cfg = tiny_test_config(num_hidden_layers=1)
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    B, T = 2, 9
    x = np.random.default_rng(0).normal(size=(B, T, tc.hidden_size)).astype(np.float32) * 0.3
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))

    # JAX: one-layer stack without the final norm — rerun manually.
    out = text_model_forward(params, jnp.asarray(x), pos, tc)
    # undo final rms_norm? Instead compare THROUGH the final norm by also
    # applying it in torch.
    lw = {k: np.asarray(v[0]) if not isinstance(v, dict) else v
          for k, v in params["layers"].items()}
    layer_weights = {
        "input_layernorm": np.asarray(params["layers"]["input_layernorm"][0]),
        "post_attention_layernorm": np.asarray(
            params["layers"]["post_attention_layernorm"][0]),
        "attn": jax.tree.map(lambda a: np.asarray(a[0]), params["layers"]["attn"]),
        "moe": jax.tree.map(lambda a: np.asarray(a[0]), params["layers"]["moe"]),
    }
    want = torch_layer(layer_weights, torch.tensor(x), tc)
    want = torch_rms_norm(want, torch.tensor(np.asarray(params["norm"])))

    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), want.numpy(), rtol=5e-4, atol=5e-4,
    )
