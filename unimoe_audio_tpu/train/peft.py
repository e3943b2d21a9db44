"""Prefix-tuning / P-tuning / prompt-tuning adapters.

Completes PEFT parity with the reference's four modes (reference:
UniMoEV2-Preview/training/training_utils.py:121-163 — LoRA lives in
train/lora.py).  Defaults mirror the reference configs: 10 virtual
tokens, 512 encoder hidden size, prefix_projection=True.

Functional design: adapters are a pytree planted at `params["peft"]`
(one of the keys below), so the optimizer, orbax checkpointing, and
`trainable_pattern="peft"` freezing all work unchanged:

  prompt-tuning   params["peft"]["prompt"]  = {"embed": [n, D]}
  P-tuning        params["peft"]["ptuning"] = {"embed": [n, D], "mlp": …}
  prefix-tuning   params["peft"]["prefix"]  = {"embed": [n, D], "mlp": …}

* prompt/P-tuning produce `virtual_embeds` [n, D] prepended to the input
  embeddings (train: `prepend_virtual_tokens`; generation: injected
  through generate_jit's existing visual_embeds scatter — see api tests).
* prefix-tuning produces per-layer key/value tensors [L, n, KV, Dh]
  injected ahead of every layer's KV: concatenated in the no-cache
  training path, written into cache slots [0, n) for generation (the
  preallocated-cache design makes this a plain dynamic_update_slice).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import UniMoEAudioConfig

N_VIRTUAL_TOKENS = 10       # reference: num_virtual_tokens=10
ENCODER_HIDDEN = 512        # reference: encoder_hidden_size=512


def init_prompt_tuning(
    rng: jax.Array, cfg: UniMoEAudioConfig, *, n_virtual: int = N_VIRTUAL_TOKENS,
    dtype=jnp.float32,
) -> Dict:
    """PromptTuningConfig equivalent: a bare learnable soft-prompt table."""
    D = cfg.text_config.hidden_size
    return {"prompt": {
        "embed": (jax.random.normal(rng, (n_virtual, D)) * 0.02).astype(dtype),
    }}


def init_p_tuning(
    rng: jax.Array, cfg: UniMoEAudioConfig, *, n_virtual: int = N_VIRTUAL_TOKENS,
    encoder_hidden: int = ENCODER_HIDDEN, dtype=jnp.float32,
) -> Dict:
    """PromptEncoderConfig equivalent: soft prompts re-parameterized by an
    MLP encoder (embed → Linear → ReLU → Linear)."""
    D = cfg.text_config.hidden_size
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"ptuning": {
        "embed": (jax.random.normal(k1, (n_virtual, D)) * 0.02).astype(dtype),
        "mlp": {
            "w1": (jax.random.normal(k2, (D, encoder_hidden)) * D ** -0.5).astype(dtype),
            "b1": jnp.zeros((encoder_hidden,), dtype),
            "w2": (jax.random.normal(k3, (encoder_hidden, D)) * encoder_hidden ** -0.5).astype(dtype),
            "b2": jnp.zeros((D,), dtype),
        },
    }}


def init_prefix_tuning(
    rng: jax.Array, cfg: UniMoEAudioConfig, *, n_virtual: int = N_VIRTUAL_TOKENS,
    encoder_hidden: int = ENCODER_HIDDEN, dtype=jnp.float32,
) -> Dict:
    """PrefixTuningConfig equivalent with prefix_projection=True: soft
    prompts projected by an MLP to per-layer K/V prefixes."""
    tc = cfg.text_config
    D = tc.hidden_size
    out = tc.num_hidden_layers * 2 * tc.num_key_value_heads * tc.head_dim
    k1, k2, k3 = jax.random.split(rng, 3)
    return {"prefix": {
        "embed": (jax.random.normal(k1, (n_virtual, D)) * 0.02).astype(dtype),
        "mlp": {
            "w1": (jax.random.normal(k2, (D, encoder_hidden)) * D ** -0.5).astype(dtype),
            "b1": jnp.zeros((encoder_hidden,), dtype),
            "w2": (jax.random.normal(k3, (encoder_hidden, out)) * encoder_hidden ** -0.5).astype(dtype),
            "b2": jnp.zeros((out,), dtype),
        },
    }}


def virtual_embeds(peft: Dict) -> Optional[jnp.ndarray]:
    """[n, D] soft-prompt embeddings for prompt/P-tuning (None for prefix)."""
    if "prompt" in peft:
        return peft["prompt"]["embed"]
    if "ptuning" in peft:
        p = peft["ptuning"]
        h = jax.nn.relu(p["embed"] @ p["mlp"]["w1"] + p["mlp"]["b1"])
        return h @ p["mlp"]["w2"] + p["mlp"]["b2"]
    return None


def prefix_kv(peft: Dict, cfg: UniMoEAudioConfig) -> Optional[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-layer prefix (k, v), each [L, n, KV, Dh] (None unless prefix mode).
    Injected POST-RoPE like HF PEFT's past_key_values — learned KV carry no
    rotary positions; real tokens' positions shift by n."""
    if "prefix" not in peft:
        return None
    tc = cfg.text_config
    p = peft["prefix"]
    n = p["embed"].shape[0]
    h = jax.nn.relu(p["embed"] @ p["mlp"]["w1"] + p["mlp"]["b1"])
    flat = h @ p["mlp"]["w2"] + p["mlp"]["b2"]
    kv = flat.reshape(n, tc.num_hidden_layers, 2, tc.num_key_value_heads, tc.head_dim)
    kv = jnp.moveaxis(kv, 0, 2)  # [L, 2, n, KV, Dh]
    return kv[:, 0], kv[:, 1]


def prepend_virtual_tokens(
    batch: Dict, inputs_embeds: jnp.ndarray, virt: jnp.ndarray,
) -> Tuple[Dict, jnp.ndarray]:
    """Prepend n soft tokens to a training batch: embeds get the virtual
    rows; ids/masks/labels get inert padding (-100 labels, mask 1).
    Positions recompute downstream from the extended attention mask, so
    virtual tokens occupy positions [0, n) like HF PEFT."""
    B, T, D = inputs_embeds.shape
    n = virt.shape[0]
    out = dict(batch)
    emb = jnp.concatenate(
        [jnp.broadcast_to(virt[None].astype(inputs_embeds.dtype), (B, n, D)),
         inputs_embeds], axis=1)

    def pre(x, value):
        pad = jnp.full((B, n) + x.shape[2:], value, dtype=x.dtype)
        return jnp.concatenate([pad, x], axis=1)

    out["input_ids"] = pre(batch["input_ids"], 0)
    if batch.get("attention_mask") is not None:
        out["attention_mask"] = pre(batch["attention_mask"], 1)
    for key, fill in (("labels", -100), ("codec_labels", -100),
                      ("codec_input_ids", 0), ("aux_balance_weight", 1)):
        if batch.get(key) is not None:
            out[key] = pre(batch[key], fill)
    if batch.get("position_ids") is not None:
        # Explicit (mRoPE/vision) positions: virtual tokens take [0, n),
        # real tokens shift right by n — consistent with the prefix-KV
        # convention and with positions recomputed from the extended mask.
        pos = batch["position_ids"]                    # [3, B, T]
        pos = jnp.asarray(pos)
        vpos = jnp.broadcast_to(
            jnp.arange(n)[None, None, :], pos.shape[:2] + (n,)
        ).astype(pos.dtype)
        out["position_ids"] = jnp.concatenate([vpos, pos + n], axis=-1)
    return out, emb
