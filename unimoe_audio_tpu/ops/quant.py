"""Int8 weight-only quantization for the serving path.

AR decode at this model size is HBM-bandwidth-bound: every step streams the
touched weights once (measured ~16 ms/step ≈ 13 GB bf16 / 819 GB/s on v5e).
Storing weights int8 with per-output-channel scales halves the stream;
XLA fuses the int8→bf16 convert into the matmul operand read, so MXU work
is unchanged.

Quantization: symmetric per-output-channel
  w[..., d, f] ≈ q[..., d, f] · s[..., 1, f],  q ∈ int8, s = max|w|/127.

Matmul identity used everywhere:  x @ (q·s) == (x @ q) · s  (s per column).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Union

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 weight + per-output-channel scale (last dim)."""

    q: jnp.ndarray   # int8, same shape as original
    s: jnp.ndarray   # f32, shape [..., 1, out]


WeightLike = Union[jnp.ndarray, QTensor]


def quantize_tensor(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric int8 quantization (last dim = out)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # reduce the in-dim
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return QTensor(q=q, s=s)


def wshape(w: WeightLike):
    """Shape of a raw or quantized weight."""
    return w.q.shape if isinstance(w, QTensor) else w.shape


def matmul(x: jnp.ndarray, w: WeightLike) -> jnp.ndarray:
    """x @ w for raw or quantized weights ([..., D, F] layouts)."""
    if isinstance(w, QTensor):
        y = x @ w.q.astype(x.dtype)
        return y * w.s.astype(x.dtype)
    return x @ w.astype(x.dtype)


def proj_matmul(x: jnp.ndarray, proj: Dict) -> jnp.ndarray:
    """x @ proj['w'] (+ bias-free LoRA delta when lora_a/lora_b present —
    see train/lora.py)."""
    y = matmul(x, proj["w"])
    if "lora_a" in proj:
        delta = (x @ proj["lora_a"].astype(x.dtype)) @ proj["lora_b"].astype(x.dtype)
        y = y + delta * proj["lora_scale"].astype(x.dtype)
    return y


def expert_einsum(spec: str, x: jnp.ndarray, w: WeightLike) -> jnp.ndarray:
    """einsum('ecd,edf->ecf'-style) for raw or quantized expert weights."""
    if isinstance(w, QTensor):
        y = jnp.einsum(spec, x, w.q.astype(x.dtype))
        return y * w.s.astype(x.dtype)
    return jnp.einsum(spec, x, w.astype(x.dtype))


_QUANT_PATHS = (
    ("layers", "attn", "q_proj", "w"),
    ("layers", "attn", "k_proj", "w"),
    ("layers", "attn", "v_proj", "w"),
    ("layers", "attn", "o_proj", "w"),
    ("layers", "moe", "dynamic", "gate"),
    ("layers", "moe", "dynamic", "up"),
    ("layers", "moe", "dynamic", "down"),
    ("layers", "moe", "fixed", "gate"),
    ("layers", "moe", "fixed", "up"),
    ("layers", "moe", "fixed", "down"),
    ("codec_head",),
    ("lm_head",),
)


def packed_int4_format(shape, sharding):
    """The PACKED s4 layout (two nibbles per byte in HBM).

    Plain `astype(jnp.int4)` on this jax version emits s4 with
    sub_byte_element_size_in_bits=0 (one BYTE per nibble — no bandwidth
    saved) while consumers expect =4, and the 0→4 relayout device_put
    recurses (axon jax 0.9 bug).  Forcing the producer's out_shardings to
    this Format sidesteps both: the array is half-size in HBM and every
    consuming jit accepts it directly (measured 1.48x over int8 on the
    36-layer decode expert stream).  Returns None off-TPU (tests fall back
    to plain int4 arrays; numerics identical)."""
    import jax as _jax

    if _jax.default_backend() not in ("tpu", "axon"):
        return None
    from jax._src.layout import Format, Layout

    return Format(
        layout=Layout(
            major_to_minor=tuple(range(len(shape))),
            tiling=((64, 128), (8, 1)),
            sub_byte_element_size_in_bits=4,
        ),
        sharding=sharding,
    )


def _to_packed_int4(q_vals: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Cast integer-valued q (in [-7, 7]) to s4 with the packed layout."""
    fmt = packed_int4_format(q_vals.shape, like.sharding)
    f = jax.jit(lambda q: q.astype(jnp.int4),
                **({"out_shardings": fmt} if fmt is not None else {}))
    return f(q_vals)


def quantize_tensor_int4(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric int4 (15 levels): s = max|w|/7.
    q stored as PACKED s4 — half the weight stream of int8.  Relative
    weight RMS error ~12.6% on gaussian weights (step = amax/7, rms =
    step/sqrt(12); int8 is ~0.7%) — a latency-optimized operating point,
    NOT near-lossless like int8: serve it where the step is
    weight-streaming-bound (single-stream/low-batch decode; reference AR
    loop anchor: utils/UniMoE_Audio_model.py:918-1068) and the quality
    budget allows.  See docs/STATUS.md for the measured logits-delta
    table."""
    w32 = jnp.asarray(w).astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(w32 / s), -7, 7).astype(jnp.int8)
    return QTensor(q=_to_packed_int4(q, jnp.asarray(w)), s=s)


def requantize_experts_int4_inplace(params: Dict) -> Dict:
    """Convert the (already int8-quantized, lane-padded) expert FFN
    weights to packed s4 — the int4 serving mode's second quantization
    stage.  Requantizing from the int8 grid adds negligible error on top
    of direct int4 (the int8 grid is 18x finer).  MUTATES and returns
    `params`; per-leaf streaming keeps the transient at one dequantized
    leaf."""
    import gc

    def f(q8, s8):
        w = q8.astype(jnp.float32) * s8          # dequantize
        amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)
        s4 = jnp.maximum(amax, 1e-8) / 7.0
        q4 = jnp.clip(jnp.round(w / s4), -7, 7).astype(jnp.int8)
        return q4, s4

    f_jit = jax.jit(f)

    def conv(qt: QTensor) -> QTensor:
        # Chunk along the stacked-L dim: the fp32 dequantize transient of
        # a full flagship expert leaf is ~6.6 GB — chunking bounds it at
        # ~1 GB so int4 conversion works alongside a resident int8 model.
        L = qt.q.shape[0]
        per_layer_f32 = (qt.q.size // max(L, 1)) * 4
        ch = max(1, min(L, (1 << 30) // max(per_layer_f32, 1)))
        q4s, s4s = [], []
        for a in range(0, L, ch):
            q4c, s4c = f_jit(qt.q[a:a + ch], qt.s[a:a + ch])
            q4s.append(q4c)
            s4s.append(s4c)
        q4 = jnp.concatenate(q4s) if len(q4s) > 1 else q4s[0]
        s4 = jnp.concatenate(s4s) if len(s4s) > 1 else s4s[0]
        del q4s, s4s
        out = QTensor(q=_to_packed_int4(q4, qt.q), s=s4)
        del q4
        return out

    def walk(node):
        if isinstance(node, dict):
            if "dynamic" in node and "fixed" in node:  # a moe param group
                for g in (node["dynamic"], node["fixed"]):
                    if isinstance(g, dict) and "gate" in g:
                        for key in ("gate", "up", "down"):
                            if isinstance(g[key], QTensor):
                                old = g[key]
                                g[key] = conv(old)
                                del old
                                gc.collect()
                return
            for v in node.values():
                walk(v)

    walk(params)
    return params


def quantize_vision_params(vision: Dict) -> Dict:
    """Int8 weight-only quantization of the vision tower (0.67B params at
    flagship scale — serves VT2M prefill bandwidth and HBM headroom).
    Norms and biases stay full precision; vision_block's projections go
    through ops.quant.matmul so QTensor weights apply transparently."""

    def q(proj):
        return {**proj, "w": quantize_tensor(proj["w"])}

    out = dict(vision)
    out["patch_embed"] = quantize_tensor(vision["patch_embed"])
    out["blocks"] = [
        {
            **blk,
            "qkv": q(blk["qkv"]),
            "proj": q(blk["proj"]),
            "mlp": {k: q(v) for k, v in blk["mlp"].items()},
        }
        for blk in vision["blocks"]
    ]
    out["merger"] = {
        **vision["merger"],
        "fc1": q(vision["merger"]["fc1"]),
        "fc2": q(vision["merger"]["fc2"]),
    }
    return out


def pad_expert_ffn(params: Dict, multiple: int = 128) -> Dict:
    """Zero-pad expert FFN intermediate dims up to a lane multiple
    (serving-only; apply BEFORE quantization).

    The flagship's dynamic F=2752 and shared F=1376 are not 128-divisible,
    so the down-projection contracts over a ragged K dim — measured
    5.7 ms/step vs 2.1 ms for an aligned projection at decode shapes
    (the MXU pads every K tile).  Padding is numerics-exact:
    silu(0)·0 == 0 in the padded gate/up outputs, and the padded down
    rows only ever multiply those zeros.

    MUTATES and returns `params`, padding leaf by leaf.  At flagship size
    call it on ALREADY-QUANTIZED params (QTensor leaves are handled): a
    pad is a shape-changing copy, so padding the bf16 originals peaks at
    ~16 GB of HBM while padding int8 peaks under 9 GB.
    """
    import gc

    def pad_leaf(node, key, axis):
        w = node[key]
        q = w.q if isinstance(w, QTensor) else w
        F = q.shape[axis]
        Fp = -(-F // multiple) * multiple
        if Fp == F:
            return
        pads = [(0, 0)] * q.ndim
        pads[axis] = (0, Fp - F)
        if isinstance(w, QTensor):
            qp = jax.jit(lambda x: jnp.pad(x, pads))(w.q)
            s = w.s
            if axis % q.ndim == q.ndim - 1:
                # padded OUTPUT channels need a (harmless, nonzero) scale
                s_pads = [(0, 0)] * s.ndim
                s_pads[-1] = (0, Fp - F)
                s = jax.jit(lambda x: jnp.pad(x, s_pads, constant_values=1.0))(s)
            node[key] = QTensor(q=qp, s=s)
        else:
            node[key] = jax.jit(lambda x: jnp.pad(x, pads))(w)
        del w, q
        gc.collect()

    def walk(node):
        if isinstance(node, dict):
            if "dynamic" in node and "fixed" in node:  # a moe param group
                for g in (node["dynamic"], node["fixed"]):
                    if isinstance(g, dict) and "gate" in g:
                        pad_leaf(g, "gate", -1)
                        pad_leaf(g, "up", -1)
                        pad_leaf(g, "down", -2)
                return
            for v in node.values():
                walk(v)

    walk(params)
    return params


def quantize_model_params(params: Dict) -> Dict:
    """Quantize the bandwidth-dominant weights (attention projections,
    expert FFNs, output heads).  Router gate, norms, biases, and embeddings
    stay full precision."""

    def set_path(tree, path, value):
        node = tree
        for key in path[:-1]:
            node = node[key]
        node[path[-1]] = value

    def get_path(tree, path):
        node = tree
        for key in path:
            node = node[key]
        return node

    def copy_containers(t):
        if isinstance(t, dict):
            return {k: copy_containers(v) for k, v in t.items()}
        if isinstance(t, list):
            return [copy_containers(v) for v in t]
        return t  # array leaves shared, not copied

    out = copy_containers(params)
    for path in _QUANT_PATHS:
        try:
            w = get_path(out, path)
        except (KeyError, TypeError):
            continue
        set_path(out, path, quantize_tensor(w))
    return out


def quantize_model_params_inplace(params: Dict) -> Dict:
    """Streaming variant for HBM-tight conversion: quantizes leaf by leaf,
    dropping each full-precision source before the next (peak HBM =
    original params + one leaf).  MUTATES and returns `params`; the caller
    must hold no other references to the replaced leaves."""
    import gc

    def get_path(tree, path):
        node = tree
        for key in path:
            node = node[key]
        return node

    q_jit = jax.jit(quantize_tensor, donate_argnums=0)
    for path in _QUANT_PATHS:
        node = params
        try:
            for key in path[:-1]:
                node = node[key]
            w = node[path[-1]]
        except (KeyError, TypeError):
            continue
        node[path[-1]] = q_jit(w)
        del w
        gc.collect()
    return params
