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


# ---------------------------------------------------------------------------
# Serving snapshots: persist ALREADY-QUANTIZED params (QTensor leaves,
# packed s4 included) so a server restart skips the quantization pass —
# and for "int4-gptq" the self-calibration generation + per-layer GPTQ,
# minutes of cold-start at flagship size.  (The reference has no
# quantized serving at all; this is TPU-native added capability.)
# ---------------------------------------------------------------------------

SERVING_SNAPSHOT = "serving.jax.pkl"


def save_serving_snapshot(params: Dict, cfg, out_dir: str, *,
                          serving_mode, kv_cache_dtype=None) -> str:
    """Write quantized serving params + config + mode to
    out_dir/serving.jax.pkl.  s4 leaves are widened to int8 for storage
    (a pickled s4 buffer could never be re-laid-out on load — the jax
    0.9 sub-byte relayout bug) and re-packed at load time."""
    import pickle

    import jax
    import jax.numpy as jnp

    from ..ops.quant import QTensor

    widen = jax.jit(lambda a: a.astype(jnp.int8))

    def enc(x):
        if isinstance(x, QTensor):
            int4 = x.q.dtype == jnp.int4
            return {"__qtensor__": True, "int4": int4,
                    "q": np.asarray(jax.device_get(widen(x.q) if int4
                                                   else x.q)),
                    "s": np.asarray(jax.device_get(x.s))}
        return np.asarray(jax.device_get(x))

    tree = jax.tree.map(enc, params,
                        is_leaf=lambda x: isinstance(x, QTensor))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, SERVING_SNAPSHOT)
    with open(path, "wb") as f:
        pickle.dump({"config": cfg.to_dict(), "serving_mode": serving_mode,
                     "kv_cache_dtype": kv_cache_dtype, "params": tree}, f)
    return path


def load_serving_snapshot(model_dir: str):
    """Returns (cfg, params, serving_mode, kv_cache_dtype).  int4-tagged
    leaves re-enter the packed s4 layout through the producer-side
    out_shardings path (ops.quant._to_packed_int4)."""
    import pickle

    import jax.numpy as jnp

    from ..config import UniMoEAudioConfig
    from ..ops.quant import QTensor, _to_packed_int4

    with open(os.path.join(model_dir, SERVING_SNAPSHOT), "rb") as f:
        blob = pickle.load(f)

    def dec(node):
        if isinstance(node, dict) and node.get("__qtensor__"):
            q = jnp.asarray(node["q"])
            if node["int4"]:
                q = _to_packed_int4(q, q)
            return QTensor(q=q, s=jnp.asarray(node["s"]))
        return jnp.asarray(node)

    import jax

    params = jax.tree.map(
        dec, blob["params"],
        is_leaf=lambda x: isinstance(x, dict) and x.get("__qtensor__"))
    cfg = UniMoEAudioConfig.from_dict(blob["config"])
    return cfg, params, blob["serving_mode"], blob.get("kv_cache_dtype")
