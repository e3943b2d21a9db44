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
import jax.numpy as jnp
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


def add_fsdp_axis(specs, params, mesh: Mesh, *, min_bytes: int = 1 << 18):
    """Upgrade base PartitionSpecs with 'data'-axis (ZeRO/FSDP-style)
    sharding — the TPU-native equivalent of the reference's ZeRO-2
    partitioned optimizer state + gradients
    (reference: UniMoEV2-Preview/deepspeed_zero2.conf:23-37).

    Every large leaf gets 'data' added on its largest divisible dim that
    isn't already sharded (skipping the scanned layer-stack dim 0 of
    rank>=3 tensors — sharding L would turn every scan iteration into a
    cross-rank fetch).  Params sharded this way pull their Adam moments
    along (optax zeros_like follows sharding), so optimizer state shards
    over data ranks instead of replicating; XLA inserts the all-gathers
    (forward/update) and reduce-scatters (backward) — GSPMD's "weight
    sharding over the data axis == ZeRO" correspondence.
    """
    data_size = int(mesh.shape.get("data", 1))
    axis_size = {a: int(mesh.shape[a]) for a in mesh.axis_names}

    def upgrade(path, leaf, spec):
        if type(leaf).__name__ == "QTensor":  # quantized leaf: shard by q
            leaf = leaf.q
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if not shape or data_size <= 1:
            return spec
        size = 1
        for d in shape:
            size *= d
        itemsize = getattr(getattr(leaf, "dtype", None), "itemsize", 4)
        if size * itemsize < min_bytes:
            return spec
        # Leaves under "layers" are layer-stacked [L, ...] and consumed by
        # the decoder scan: dim 0 stays unsharded and the last (output) dim
        # is off limits (see pass 1).
        scanned = bool(path) and getattr(path[0], "key", None) == "layers"
        entries = list(spec) if spec is not None else []
        entries += [None] * (len(shape) - len(entries))
        start = 1 if scanned else 0
        last = len(shape) - 1
        # Pass 1: largest unsharded divisible NON-LAST dim.  The last dim
        # is usually the matmul OUTPUT dim; data-sharding it propagates a
        # 'data' sharding onto the residual stream inside the layer scan,
        # which this XLA version handles via "involuntary full
        # rematerialization" — and miscompiles to NaN in the scan
        # transpose (observed on the o_proj/down projections).
        for i in sorted(range(start, last), key=lambda j: -shape[j]):
            if entries[i] is None and shape[i] % data_size == 0:
                entries[i] = "data"
                return P(*entries)
        # Pass 2: stack 'data' onto an already-sharded non-last dim when
        # jointly divisible (e.g. F sharded 'model' -> ('model', 'data')).
        for i in sorted(range(start, last), key=lambda j: -shape[j]):
            e = entries[i]
            if isinstance(e, str) and shape[i] % (axis_size[e] * data_size) == 0:
                entries[i] = (e, "data")
                return P(*entries)
        # Pass 3: the last dim — only outside the scanned layer stack
        # (embeds/heads/vision, consumed via gather or one matmul, no scan).
        if not scanned:
            if entries[last] is None and shape[last] % data_size == 0:
                entries[last] = "data"
            elif (isinstance(entries[last], str)
                  and shape[last] % (axis_size[entries[last]] * data_size) == 0):
                entries[last] = (entries[last], "data")
        return P(*entries)

    from ..ops.quant import QTensor

    return jax.tree_util.tree_map_with_path(
        upgrade, params, specs, is_leaf=lambda x: isinstance(x, QTensor))


def shard_params(params: Dict, mesh: Mesh, cfg: UniMoEAudioConfig,
                 *, fsdp: bool = False, fsdp_min_bytes: int = 1 << 18) -> Dict:
    """Place a param pytree onto the mesh per param_specs.

    Handles int8-quantized leaves (ops.quant.QTensor): the q tensor takes
    the weight's spec; the per-channel scale keeps each spec entry only
    where its dim survived the reduction (size-1 dims can't shard).

    fsdp=True additionally shards every large leaf over the 'data' axis
    (add_fsdp_axis) — optimizer moments created from these params inherit
    the sharding, giving ZeRO-style partitioned optimizer state."""
    from ..ops.quant import QTensor

    specs = param_specs(cfg)
    if "vision" in params:
        # Vision tower (0.67B) replicates — it runs once per request.
        # (Under fsdp its big leaves shard over 'data' like everything else.)
        specs = dict(specs)
        specs["vision"] = jax.tree.map(lambda x: P(), params["vision"])
    if "peft" in params:
        # PEFT adapters (train/peft.py) are tiny — replicate.
        specs = dict(specs)
        specs["peft"] = jax.tree.map(lambda x: P(), params["peft"])
    if fsdp:
        specs = add_fsdp_axis(specs, params, mesh, min_bytes=fsdp_min_bytes)

    def place(x, s):
        if isinstance(x, QTensor):
            tgt = NamedSharding(mesh, s)
            if x.q.dtype == jnp.int4:
                # s4 leaves (int4 serving mode) cannot cross a device_put
                # relayout on this jax version (the 0→4 sub-byte relayout
                # recurses — see ops.quant.packed_int4_format).  Widen to
                # int8 in one jit, then re-emit s4 already in the packed
                # SHARDED layout via the producer-side out_shardings
                # workaround — values identical, never relayouted.
                from ..ops.quant import packed_int4_format

                fmt = packed_int4_format(x.q.shape, tgt) or tgt
                widened = jax.jit(lambda a: a.astype(jnp.int8))(x.q)
                q = jax.jit(lambda a: a.astype(jnp.int4),
                            out_shardings=fmt)(widened)
            else:
                q = jax.device_put(x.q, tgt)
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
