"""Weight converters: torch/HF checkpoints → JAX param pytrees.

Covers the reference's two weight sources:
  * DAC codec checkpoint `weights_16khz.pth` (torch, weight-normed convs;
    reference loads it via dac.DAC.load, utils/UniMoE_Audio_utils.py:88)
  * UniMoE-Audio HF safetensors shards (module names from
    utils/UniMoE_Audio_model.py:460-487 and utils/UniMoE_Audio_core.py:196-523)

Conversion rules:
  - weight-norm (weight_g, weight_v) pairs fold into a single weight:
    W = g · v / ‖v‖ with the norm over all dims except dim 0 (torch default).
  - torch Linear weights [out, in] transpose to [in, out] matmul layout.
  - per-layer tensors stack along a leading [L] axis; per-expert FFN weights
    stack along [E] (the reference keeps per-expert shards,
    UniMoEV2-Preview/inference/deepspeed_ep_param_aggregation.py:17-19).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    """torch tensor → float32/raw numpy (no torch import needed by callers)."""
    try:
        return t.detach().to("cpu").float().numpy()
    except AttributeError:
        return np.asarray(t)


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """W = g · v/‖v‖, norm over all dims except 0 (torch weight_norm dim=0)."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / np.maximum(norm, 1e-12)).astype(
        np.float32
    )


# ---------------------------------------------------------------------------
# DAC codec
# ---------------------------------------------------------------------------

def _wn_conv(sd: Dict[str, Any], prefix: str):
    """Read a weight-normed conv from a torch state dict, folded."""
    if f"{prefix}.weight_g" in sd:
        g, v = _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
        w = fold_weight_norm(g, v)
    # torch>=2.1 parametrized naming
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
        w = fold_weight_norm(g, v)
    else:
        w = _np(sd[f"{prefix}.weight"])
    b = _np(sd[f"{prefix}.bias"]) if f"{prefix}.bias" in sd else None
    return w, b


def convert_dac_state_dict(sd: Dict[str, Any], *, n_enc_blocks: int = 4,
                           n_dec_blocks: int = 4, n_codebooks: int = 12) -> Dict:
    """torch DAC state dict → JAX param pytree (codec/dac.py layout).

    Module paths follow descript-audio-codec:
      encoder.block: [0]=conv_in, [1..N]=EncoderBlock, [N+1]=Snake, [N+2]=conv_out
      EncoderBlock.block: [0..2]=ResidualUnit, [3]=Snake, [4]=strided conv
      ResidualUnit.block: [0]=Snake, [1]=conv k7, [2]=Snake, [3]=conv k1
      decoder.model: [0]=conv_in, [1..N]=DecoderBlock, [N+1]=Snake, [N+2]=conv_out
      DecoderBlock.block: [0]=Snake, [1]=conv_transpose, [2..4]=ResidualUnit
      quantizer.quantizers.{i}.{in_proj,out_proj,codebook}
    """

    def res_unit(prefix):
        w1, b1 = _wn_conv(sd, f"{prefix}.block.1")
        w2, b2 = _wn_conv(sd, f"{prefix}.block.3")
        return {
            "snake1_alpha": _np(sd[f"{prefix}.block.0.alpha"]),
            "conv1_w": w1, "conv1_b": b1,
            "snake2_alpha": _np(sd[f"{prefix}.block.2.alpha"]),
            "conv2_w": w2, "conv2_b": b2,
        }

    enc_in_w, enc_in_b = _wn_conv(sd, "encoder.block.0")
    enc_blocks = []
    for i in range(1, n_enc_blocks + 1):
        p = f"encoder.block.{i}.block"
        w, b = _wn_conv(sd, f"{p}.4")
        enc_blocks.append({
            "res": [res_unit(f"{p}.{j}") for j in range(3)],
            "snake_alpha": _np(sd[f"{p}.3.alpha"]),
            "conv_w": w, "conv_b": b,
        })
    enc_out_w, enc_out_b = _wn_conv(sd, f"encoder.block.{n_enc_blocks + 2}")
    encoder = {
        "conv_in_w": enc_in_w, "conv_in_b": enc_in_b,
        "blocks": enc_blocks,
        "snake_out_alpha": _np(sd[f"encoder.block.{n_enc_blocks + 1}.alpha"]),
        "conv_out_w": enc_out_w, "conv_out_b": enc_out_b,
    }

    quantizers = []
    for i in range(n_codebooks):
        p = f"quantizer.quantizers.{i}"
        wi, bi = _wn_conv(sd, f"{p}.in_proj")
        wo, bo = _wn_conv(sd, f"{p}.out_proj")
        quantizers.append({
            "in_proj_w": wi, "in_proj_b": bi,
            "out_proj_w": wo, "out_proj_b": bo,
            "codebook": _np(sd[f"{p}.codebook.weight"]),
        })

    dec_in_w, dec_in_b = _wn_conv(sd, "decoder.model.0")
    dec_blocks = []
    for i in range(1, n_dec_blocks + 1):
        p = f"decoder.model.{i}.block"
        wt, bt = _wn_conv(sd, f"{p}.1")
        dec_blocks.append({
            "snake_alpha": _np(sd[f"{p}.0.alpha"]),
            "convt_w": wt, "convt_b": bt,
            "res": [res_unit(f"{p}.{j}") for j in range(2, 5)],
        })
    dec_out_w, dec_out_b = _wn_conv(sd, f"decoder.model.{n_dec_blocks + 2}")
    decoder = {
        "conv_in_w": dec_in_w, "conv_in_b": dec_in_b,
        "blocks": dec_blocks,
        "snake_out_alpha": _np(sd[f"decoder.model.{n_dec_blocks + 1}.alpha"]),
        "conv_out_w": dec_out_w, "conv_out_b": dec_out_b,
    }

    return {"encoder": encoder, "quantizer": {"quantizers": quantizers}, "decoder": decoder}


def convert_dac_weights(torch_path: str, out_path: str) -> None:
    """weights_16khz.pth → pickled JAX pytree + config."""
    import torch

    blob = torch.load(torch_path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    meta = blob.get("metadata", {}).get("kwargs", {})
    from ..codec.dac import DACConfig

    cfg = DACConfig(
        encoder_dim=meta.get("encoder_dim", 64),
        encoder_rates=tuple(meta.get("encoder_rates", (2, 4, 5, 8))),
        decoder_dim=meta.get("decoder_dim", 1536),
        decoder_rates=tuple(meta.get("decoder_rates", (8, 5, 4, 2))),
        n_codebooks=meta.get("n_codebooks", 12),
        codebook_size=meta.get("codebook_size", 1024),
        codebook_dim=meta.get("codebook_dim", 8) if not isinstance(
            meta.get("codebook_dim", 8), list) else meta["codebook_dim"][0],
        sample_rate=meta.get("sample_rate", 16000),
    )
    params = convert_dac_state_dict(
        sd,
        n_enc_blocks=len(cfg.encoder_rates),
        n_dec_blocks=len(cfg.decoder_rates),
        n_codebooks=cfg.n_codebooks,
    )
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump({"params": params, "config": cfg.__dict__}, f)


# ---------------------------------------------------------------------------
# UniMoE-Audio main model
# ---------------------------------------------------------------------------

def convert_model_state_dict(sd: Dict[str, Any], cfg) -> Dict:
    """HF/torch UniMoE-Audio state dict → layer-stacked JAX pytree.

    Name map (reference: utils/UniMoE_Audio_model.py:470-487, experts at
    utils/UniMoE_Audio_core.py:392-416):
      language_model.embed_tokens.weight                         [V, D]
      language_model.layers.{l}.input_layernorm.weight
      language_model.layers.{l}.self_attn.{q,k,v,o}_proj.weight/bias
      language_model.layers.{l}.post_attention_layernorm.weight
      language_model.layers.{l}.mlp.gate.weight
      language_model.layers.{l}.mlp.fixed_real_moe.{j}.{gate,up,down}_proj.weight
      language_model.layers.{l}.mlp.dynamic_real_moe.deepspeed_moe.experts.
          deepspeed_experts.{e}.{gate,up,down}_proj.weight
      language_model.norm.weight / lm_head.weight
      codec_embed_tokens.{c}.weight / codec_head.weight
    """
    tc = cfg.text_config
    L = tc.num_hidden_layers

    def get(name, transpose=False):
        t = _np(sd[name])
        return t.T if transpose else t

    def layer_stack(fmt, transpose=False):
        return np.stack([get(fmt.format(l=l), transpose) for l in range(L)])

    def attn_proj(which):
        w = layer_stack(
            "language_model.layers.{l}.self_attn.%s.weight" % which, transpose=True
        )
        p = {"w": w}
        bias_name = "language_model.layers.0.self_attn.%s.bias" % which
        if bias_name in sd:
            p["b"] = np.stack([
                get(f"language_model.layers.{l}.self_attn.{which}.bias") for l in range(L)
            ])
        elif which != "o_proj":
            # Bias-free sources: the forward and exporter index ['b']
            # unconditionally (Qwen2.5 layout) — zero-fill like init does.
            p["b"] = np.zeros((L, w.shape[-1]), dtype=w.dtype)
        return p

    def expert_stack(container_fmt, n, proj):
        # [L, n, din, dout]
        return np.stack([
            np.stack([
                get(container_fmt.format(l=l, e=e) + f".{proj}_proj.weight", transpose=True)
                for e in range(n)
            ])
            for l in range(L)
        ])

    dyn_fmt = (
        "language_model.layers.{l}.mlp.dynamic_real_moe.deepspeed_moe.experts."
        "deepspeed_experts.{e}"
    )
    fixed_fmt = "language_model.layers.{l}.mlp.fixed_real_moe.{e}"

    layers = {
        "input_layernorm": layer_stack("language_model.layers.{l}.input_layernorm.weight"),
        "post_attention_layernorm": layer_stack(
            "language_model.layers.{l}.post_attention_layernorm.weight"
        ),
        "attn": {
            "q_proj": attn_proj("q_proj"),
            "k_proj": attn_proj("k_proj"),
            "v_proj": attn_proj("v_proj"),
            "o_proj": {"w": layer_stack(
                "language_model.layers.{l}.self_attn.o_proj.weight", transpose=True)},
        },
        "moe": {
            "gate": layer_stack("language_model.layers.{l}.mlp.gate.weight", transpose=True),
            "dynamic": {
                "gate": expert_stack(dyn_fmt, tc.mlp_dynamic_expert_num, "gate"),
                "up": expert_stack(dyn_fmt, tc.mlp_dynamic_expert_num, "up"),
                "down": expert_stack(dyn_fmt, tc.mlp_dynamic_expert_num, "down"),
            },
            "fixed": {
                "gate": expert_stack(fixed_fmt, tc.mlp_fixed_expert_num, "gate"),
                "up": expert_stack(fixed_fmt, tc.mlp_fixed_expert_num, "up"),
                "down": expert_stack(fixed_fmt, tc.mlp_fixed_expert_num, "down"),
            },
        },
    }

    params = {
        "embed_tokens": get("language_model.embed_tokens.weight"),
        "layers": layers,
        "norm": get("language_model.norm.weight"),
        "lm_head": (
            get("lm_head.weight", transpose=True)
            if "lm_head.weight" in sd
            else get("language_model.embed_tokens.weight").T  # tied fallback
        ),
        "codec_embed": np.stack([
            get(f"codec_embed_tokens.{c}.weight") for c in range(cfg.codec_channels)
        ]),
        "codec_head": get("codec_head.weight", transpose=True),
    }
    if cfg.vision_config is not None and "visual.patch_embed.proj.weight" in sd:
        params["vision"] = convert_vision_state_dict(sd, cfg.vision_config)
    return params


def convert_vision_state_dict(sd: Dict[str, Any], vcfg) -> Dict:
    """visual.* weights → vision.py layout.

    The conv3d patch embed [D, C, tps, ps, ps] flattens to a [C·tps·ps·ps, D]
    matmul (kernel == stride ⇒ exact equivalence; replaces the reference's
    Ascend Conv3D workaround, utils/UniMoE_Audio_utils.py:585-725)."""

    def get(name, transpose=False):
        t = _np(sd[name])
        return t.T if transpose else t

    def lin(prefix):
        p = {"w": get(f"{prefix}.weight", transpose=True)}
        if f"{prefix}.bias" in sd:
            p["b"] = get(f"{prefix}.bias")
        else:
            p["b"] = np.zeros(p["w"].shape[-1], dtype=np.float32)
        return p

    pe = _np(sd["visual.patch_embed.proj.weight"])  # [D, C, tps, ps, ps]
    blocks = []
    for i in range(vcfg.depth):
        b = f"visual.blocks.{i}"
        blocks.append({
            "norm1": get(f"{b}.norm1.weight"),
            "norm2": get(f"{b}.norm2.weight"),
            "qkv": lin(f"{b}.attn.qkv"),
            "proj": lin(f"{b}.attn.proj"),
            "mlp": {
                "gate": lin(f"{b}.mlp.gate_proj"),
                "up": lin(f"{b}.mlp.up_proj"),
                "down": lin(f"{b}.mlp.down_proj"),
            },
        })
    return {
        "patch_embed": pe.reshape(pe.shape[0], -1).T,
        "blocks": blocks,
        "merger": {
            "ln_q": get("visual.merger.ln_q.weight"),
            "fc1": lin("visual.merger.mlp.0"),
            "fc2": lin("visual.merger.mlp.2"),
        },
    }


def load_hf_safetensors(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors shards in an HF checkpoint dir into one dict."""
    from safetensors import safe_open

    sd: Dict[str, np.ndarray] = {}
    files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    return sd


def convert_model_weights(model_dir: str, out_path: str, dtype="bfloat16") -> None:
    """HF checkpoint dir (config.json + safetensors) → pickled JAX pytree."""
    import jax.numpy as jnp
    import jax

    from ..config import UniMoEAudioConfig

    cfg = UniMoEAudioConfig.from_json(os.path.join(model_dir, "config.json"))
    sd = load_hf_safetensors(model_dir)
    params = convert_model_state_dict(sd, cfg)
    params = jax.tree.map(lambda a: np.asarray(a, dtype=dtype), params)
    # The router gate stays fp32 (design invariant: init, surgery, and the
    # quantizer all preserve it) — re-upcast after the blanket cast.
    params["layers"]["moe"]["gate"] = np.asarray(
        params["layers"]["moe"]["gate"], dtype=np.float32)
    with open(out_path, "wb") as f:
        pickle.dump({"params": params, "config": cfg.to_dict()}, f)
