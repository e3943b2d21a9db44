"""Device mesh + sharding specs: the TPU-native replacement for DeepSpeed's
process-group registry.

The reference manages named expert-parallel groups (`ep_size_{k}`) plus
ZeRO-2 data parallelism (reference: utils/UniMoE_Audio_core.py:496-523,
UniMoEV2-Preview/deepspeed_zero2.conf).  Here ONE `jax.sharding.Mesh` with
axes ('data', 'expert', 'model') replaces all of it:

  data   — batch/data parallelism (grad sync = psum inserted by XLA)
  expert — expert parallelism (dynamic-expert dim; all-to-all or GSPMD)
  model  — tensor parallelism (attention heads / FFN intermediate dims)

Sharding rules live in `param_specs` so pjit/GSPMD inserts all collectives;
no group bookkeeping anywhere.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import UniMoEAudioConfig

AXES = ("data", "expert", "model")


def make_mesh(
    data: int = 1, expert: int = 1, model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * expert * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, expert, model)
    return Mesh(dev, AXES)


def default_mesh_shape(n_devices: int, ep_size: int = 1, tp_size: int = 1) -> Tuple[int, int, int]:
    """Factor n_devices into (data, expert, model)."""
    assert n_devices % (ep_size * tp_size) == 0
    return n_devices // (ep_size * tp_size), ep_size, tp_size


def param_specs(cfg: UniMoEAudioConfig) -> Dict:
    """PartitionSpecs matching init_model_params' pytree.

    TP (model axis) shards attention head dims and FFN intermediate dims
    (megatron-style column/row split); EP (expert axis) shards the dynamic
    expert dim — the reference's EP placement of 2 routed experts/chip
    (paper: EP=4 on 196 NPUs; SURVEY.md §2.5).
    """
    lin_col = {"w": P(None, None, "model"), "b": P(None, "model")}
    return {
        "embed_tokens": P(None, None),
        "layers": {
            "input_layernorm": P(None, None),
            "post_attention_layernorm": P(None, None),
            "attn": {
                "q_proj": dict(lin_col),
                "k_proj": dict(lin_col),
                "v_proj": dict(lin_col),
                "o_proj": {"w": P(None, "model", None)},
            },
            "moe": {
                "gate": P(None, None, None),
                "dynamic": {
                    "gate": P(None, "expert", None, "model"),
                    "up": P(None, "expert", None, "model"),
                    "down": P(None, "expert", "model", None),
                },
                "fixed": {
                    "gate": P(None, None, None, "model"),
                    "up": P(None, None, None, "model"),
                    "down": P(None, None, "model", None),
                },
            },
        },
        "norm": P(None),
        "lm_head": P(None, "model"),
        "codec_embed": P(None, None, None),
        "codec_head": P(None, "model"),
    }


def shard_params(params: Dict, mesh: Mesh, cfg: UniMoEAudioConfig) -> Dict:
    """Place a param pytree onto the mesh per param_specs.

    Handles int8-quantized leaves (ops.quant.QTensor): the q tensor takes
    the weight's spec; the per-channel scale keeps each spec entry only
    where its dim survived the reduction (size-1 dims can't shard)."""
    from ..ops.quant import QTensor

    specs = param_specs(cfg)
    if "vision" in params:
        # Vision tower (0.67B) replicates — it runs once per request.
        specs = dict(specs)
        specs["vision"] = jax.tree.map(lambda x: P(), params["vision"])
    if "peft" in params:
        # PEFT adapters (train/peft.py) are tiny — replicate.
        specs = dict(specs)
        specs["peft"] = jax.tree.map(lambda x: P(), params["peft"])

    def place(x, s):
        if isinstance(x, QTensor):
            q = jax.device_put(x.q, NamedSharding(mesh, s))
            s_spec = P(*[
                ax if (i < x.s.ndim and x.s.shape[i] == x.q.shape[i]) else None
                for i, ax in enumerate(s)
            ]) if len(s) else P()
            return QTensor(q=q, s=jax.device_put(x.s, NamedSharding(mesh, s_spec)))
        return jax.device_put(x, NamedSharding(mesh, s))

    # tree.map flattens `specs` up to `params`' treedef, so each P lands whole
    # at its matching leaf; QTensor counts as a leaf here.
    return jax.tree.map(
        place, params, specs, is_leaf=lambda x: isinstance(x, QTensor)
    )


def batch_spec() -> P:
    """Token batches shard over data AND expert axes combined — every rank
    holds distinct data, like DeepSpeed's expert+data groups
    (reference: utils/UniMoE_Audio_core.py:513-520)."""
    return P(("data", "expert"))
