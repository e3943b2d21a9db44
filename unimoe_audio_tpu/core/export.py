"""Export: JAX param pytree → HF-style safetensors checkpoint.

The inverse of core/convert.py — produces the reference's inference
checkpoint layout (module names from utils/UniMoE_Audio_model.py:460-487,
per-expert FFN entries per utils/UniMoE_Audio_core.py:392-416) so weights
trained in this framework load into the torch reference, and round-trips
are testable.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def model_params_to_state_dict(params: Dict, cfg) -> Dict[str, np.ndarray]:
    """Layer-stacked pytree → flat HF/torch-layout state dict."""
    tc = cfg.text_config
    L = tc.num_hidden_layers
    sd: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr, dtype=np.float32)
        # ascontiguousarray matters: safetensors writes the raw buffer and
        # silently scrambles non-contiguous (transposed-view) arrays.
        sd[name] = np.ascontiguousarray(a.T if transpose else a)

    put("language_model.embed_tokens.weight", params["embed_tokens"])
    put("language_model.norm.weight", params["norm"])
    put("lm_head.weight", params["lm_head"], transpose=True)
    for c in range(cfg.codec_channels):
        put(f"codec_embed_tokens.{c}.weight", params["codec_embed"][c])
    put("codec_head.weight", params["codec_head"], transpose=True)

    layers = params["layers"]
    for l in range(L):
        p = f"language_model.layers.{l}"
        put(f"{p}.input_layernorm.weight", layers["input_layernorm"][l])
        put(f"{p}.post_attention_layernorm.weight", layers["post_attention_layernorm"][l])
        for proj in ("q_proj", "k_proj", "v_proj"):
            put(f"{p}.self_attn.{proj}.weight", layers["attn"][proj]["w"][l], transpose=True)
            put(f"{p}.self_attn.{proj}.bias", layers["attn"][proj]["b"][l])
        put(f"{p}.self_attn.o_proj.weight", layers["attn"]["o_proj"]["w"][l], transpose=True)
        put(f"{p}.mlp.gate.weight", layers["moe"]["gate"][l], transpose=True)
        for e in range(tc.mlp_dynamic_expert_num):
            base = (f"{p}.mlp.dynamic_real_moe.deepspeed_moe.experts."
                    f"deepspeed_experts.{e}")
            put(f"{base}.gate_proj.weight", layers["moe"]["dynamic"]["gate"][l, e], transpose=True)
            put(f"{base}.up_proj.weight", layers["moe"]["dynamic"]["up"][l, e], transpose=True)
            put(f"{base}.down_proj.weight", layers["moe"]["dynamic"]["down"][l, e], transpose=True)
        for e in range(tc.mlp_fixed_expert_num):
            base = f"{p}.mlp.fixed_real_moe.{e}"
            put(f"{base}.gate_proj.weight", layers["moe"]["fixed"]["gate"][l, e], transpose=True)
            put(f"{base}.up_proj.weight", layers["moe"]["fixed"]["up"][l, e], transpose=True)
            put(f"{base}.down_proj.weight", layers["moe"]["fixed"]["down"][l, e], transpose=True)
    return sd


def export_hf_checkpoint(params: Dict, cfg, out_dir: str, *, dtype="float32") -> None:
    """Write config.json + model.safetensors in the reference layout."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    sd = model_params_to_state_dict(params, cfg)
    # copy=False: model_params_to_state_dict already materialized
    # contiguous copies; re-copying all of it is ~26 GB transient at
    # flagship scale when the dtype already matches.
    sd = {k: v.astype(dtype, copy=False) for k, v in sd.items()}
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    cfg.save_json(os.path.join(out_dir, "config.json"))
