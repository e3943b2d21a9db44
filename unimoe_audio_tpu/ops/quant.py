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
    """Quantized weight + scales.

    q: int8 (or packed s4), same shape as the original weight.
    s: f32 (int8 path) or bf16 (int4 path) scales, shape [..., Dg, out]
       where the contraction dim D (axis -2 of q) is split into Dg groups
       of G = D // Dg rows.  Dg == 1 — per-output-channel — is the SERVING
       layout for both int8 and int4: the scale multiply commutes out of
       the dot, so weights stream quantized.  Dg > 1 (group-wise) is an
       opt-in quality-experiment/off-TPU layout: on TPU the reshape·mul
       dequant does NOT fuse into the dot, the bf16 weights materialize in
       HBM, and int4 decode measured 18.7 ms/step vs 6.2 per-channel
       (2026-08-19 battery).  Int4 quality comes from GPTQ error
       compensation at per-channel scales, not finer groups.
    """

    q: jnp.ndarray   # int8 / packed s4, same shape as original
    s: jnp.ndarray   # f32, shape [..., Dg, out]


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


def _dequant_grouped(w: QTensor, dtype) -> jnp.ndarray:
    """Dequantize a group-wise QTensor to `dtype`, original shape.

    WARNING (measured, 2026-08-19): on TPU the reshape + group-scale
    multiply does NOT fuse into the consuming dot's operand read — XLA
    materializes the dequantized bf16 weights in HBM, costing the full
    bf16 stream (int4 decode: 18.7 ms/step group-wise vs 6.2 per-channel).
    Group-wise is therefore NOT a serving layout; keep serving scales
    per-channel (Dg == 1).  See quantize_tensor_int4's docstring."""
    q, s = w.q, w.s
    Dg = s.shape[-2]
    D, F = q.shape[-2], q.shape[-1]
    qf = q.astype(dtype).reshape(*q.shape[:-2], Dg, D // Dg, F)
    qf = qf * s[..., :, None, :].astype(dtype)
    return qf.reshape(q.shape)


def dequantize(w: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Dequantize any QTensor (per-channel or group-wise) to `dtype`."""
    if w.s.shape[-2] > 1:
        return _dequant_grouped(w, dtype)
    return w.q.astype(dtype) * w.s.astype(dtype)


def matmul(x: jnp.ndarray, w: WeightLike) -> jnp.ndarray:
    """x @ w for raw or quantized weights ([..., D, F] layouts)."""
    if isinstance(w, QTensor):
        if w.s.shape[-2] > 1:  # group-wise: dequant fused into the dot
            return x @ _dequant_grouped(w, x.dtype)
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


def act_quant_int8(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 activation quantization over the LAST dim.

    Returns (q s8 same shape, s f32 [..., 1]) with x ≈ q · s.  Zero rows
    (packed-dispatch padding slots) quantize to q=0 under the epsilon
    floor, so padding stays exact."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def expert_einsum(spec: str, x: jnp.ndarray, w: WeightLike) -> jnp.ndarray:
    """einsum('ecd,edf->ecf'-style) for raw or quantized expert weights.

    Requires the weight operand's contraction dim at axis -2 and output
    dim at axis -1 (true of every expert spec used in moe/dispatch.py)."""
    if isinstance(w, QTensor):
        if w.s.shape[-2] > 1:  # group-wise
            return jnp.einsum(spec, x, _dequant_grouped(w, x.dtype))
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


def _group_size_for(D: int, group_size) -> int:
    """Largest divisor of D that is ≤ group_size (so groups tile D
    exactly; after pad_expert_ffn every contraction dim is 128-divisible
    and this returns group_size itself).  group_size in (0, None) means
    per-channel: one group spanning the whole contraction dim (Dg == 1 —
    the layout whose dequant XLA fuses into the dot's operand read)."""
    if not group_size or group_size >= D:
        return D
    g = min(group_size, D)
    while D % g:
        g -= 1
    return g


_CLIP_RATIOS = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65)


def _quantize_grouped_int4_core(w32: jnp.ndarray, G: int):
    """Group-wise int4 on the FULL [-8, 7] grid with per-group MSE-optimal
    scale search.

    For each group of G contraction rows × 1 output column, tries scale
    candidates s = r·amax/d for r ∈ _CLIP_RATIOS and d ∈ {7, 8} (anchoring
    the group max to either grid end — the 16th level is free in the s4
    format, symmetric [-7,7] wastes it) and keeps the scale with the
    lowest reconstruction MSE.  Clipping the tail of each group trades a
    little saturation error for a finer step on the bulk.  On gaussian
    weights: per-channel amax/7 RTN ~12.6% weight RMS error → 10.1% at
    G=128, 9.5% at G=64, 8.7% at G=32 — near the data-free limit for a
    16-level uniform grid; denser clip grids buy <0.1pp.  Scales are
    emitted bf16 (halves the scale stream; ≤0.4% relative scale error is
    negligible against the quant error).  Returns (q int8 in [-8,7],
    s bf16 [..., Dg, F])."""
    D, F = w32.shape[-2], w32.shape[-1]
    Dg = D // G
    wg = w32.reshape(*w32.shape[:-2], Dg, G, F)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # [..., Dg, 1, F]
    amax = jnp.maximum(amax, 1e-8)

    def try_scale(carry, s):
        best_err, best_s = carry
        s = s.astype(jnp.bfloat16).astype(jnp.float32)  # storage-true scale
        q = jnp.clip(jnp.round(wg / s), -8, 7)
        err = jnp.sum(jnp.square(wg - q * s), axis=-2, keepdims=True)
        take = err < best_err
        return (jnp.where(take, err, best_err), jnp.where(take, s, best_s)), None

    cands = jnp.stack([amax * (r / d) for r in _CLIP_RATIOS for d in (7.0, 8.0)])
    init = (jnp.full_like(amax, jnp.inf), amax / 7.0)
    (_, s), _ = jax.lax.scan(try_scale, init, cands)
    q = jnp.clip(jnp.round(wg / s), -8, 7).astype(jnp.int8)
    return q.reshape(w32.shape), s[..., :, 0, :].astype(jnp.bfloat16)


def quantize_tensor_int4(w: jnp.ndarray, group_size: int = 0) -> QTensor:
    """Int4 on the full [-8, 7] grid, MSE-searched scales; q stored as
    PACKED s4 — half the weight stream of int8.

    group_size=0 (the SERVING default) is per-channel: one clip-searched
    scale per output column (s [1, F], weight RMS error ~11.3% on
    gaussian weights vs 12.6% for plain amax/7 RTN).  Per-channel keeps
    the decode matmul on the fast path — `y = (x @ q.astype(bf16)) * s`,
    where XLA fuses the s4→bf16 convert into the dot's operand read
    (measured 6.2 ms/step single-stream at flagship 36L).

    group_size=G>0 is group-wise (s [Dg, F], ~9.5% RMS at G=64): finer
    scales, but the group-scale multiply is a reshape·mul producer XLA
    will NOT fuse into the dot — the dequantized bf16 weights materialize
    in HBM and the step runs ~3x slower than int8 (measured 18.7 ms
    single-stream).  Use group-wise for quality experiments or off-TPU;
    the quality serving mode is per-channel GPTQ (ops/gptq.py), which
    recovers most of the group-wise accuracy at per-channel speed.

    Still a latency-optimized operating point, NOT near-lossless like
    int8: serve it where the step is weight-streaming-bound
    (single-stream/low-batch decode; reference AR loop anchor:
    utils/UniMoE_Audio_model.py:918-1068) and the quality budget allows.
    See docs/STATUS.md for the measured logits-delta table."""
    w32 = jnp.asarray(w).astype(jnp.float32)
    G = _group_size_for(w32.shape[-2], group_size)
    q, s = _quantize_grouped_int4_core(w32, G)
    return QTensor(q=_to_packed_int4(q, jnp.asarray(w)), s=s)


def requantize_experts_int4_inplace(params: Dict, group_size: int = 0) -> Dict:
    """Convert the (already int8-quantized, lane-padded) expert FFN
    weights to packed s4 — the int4 serving mode's second quantization
    stage.  Default per-channel (group_size=0: clip-searched scale per
    output column — the fast convert-fused decode layout); group_size=G
    selects group-wise scales along the contraction dim (finer error,
    ~3x slower decode: see quantize_tensor_int4).  Requantizing from
    the int8 grid adds negligible error on top of direct int4 (the int8
    grid is 18x finer).  MUTATES and returns `params`; per-leaf streaming
    keeps the transient at one dequantized leaf."""
    import gc

    def f(q8, s8):
        w = q8.astype(jnp.float32) * s8          # dequantize (s8 per-channel)
        G = _group_size_for(w.shape[-2], group_size)
        return _quantize_grouped_int4_core(w, G)

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
            if q.dtype == jnp.int4:
                # Keep the PACKED s4 layout through the pad: a plain jit
                # would emit sub_byte=0 (byte-per-nibble, bandwidth win
                # gone) and the result could never be relayouted (the
                # 0→4 s4 device_put recursion).
                out_shape = list(q.shape)
                out_shape[axis % q.ndim] = Fp
                fmt = packed_int4_format(tuple(out_shape), q.sharding)
                qp = jax.jit(lambda x: jnp.pad(x, pads),
                             out_shardings=fmt)(q) if fmt is not None \
                    else jax.jit(lambda x: jnp.pad(x, pads))(q)
            else:
                qp = jax.jit(lambda x: jnp.pad(x, pads))(w.q)
            s = w.s
            if axis % q.ndim == q.ndim - 1:
                # padded OUTPUT channels need a (harmless, nonzero) scale
                s_pads = [(0, 0)] * s.ndim
                s_pads[-1] = (0, Fp - F)
                s = jax.jit(lambda x: jnp.pad(x, s_pads, constant_values=1.0))(s)
            elif s.shape[-2] > 1:
                # group-wise scales over a padded CONTRACTION dim (the
                # quantize-before-pad GPTQ flow): append whole scale groups
                # of 1.0 covering the zero q rows.
                G = F // s.shape[-2]
                if (Fp - F) % G:
                    raise ValueError(
                        f"contraction pad {Fp - F} not a multiple of the "
                        f"scale group size {G}; quantize with a group size "
                        f"dividing the padded dim or pad first")
                s_pads = [(0, 0)] * s.ndim
                s_pads[-2] = (0, (Fp - F) // G)
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
        if isinstance(w, QTensor):  # already quantized (e.g. GPTQ experts)
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
        if isinstance(w, QTensor):  # already quantized (e.g. GPTQ experts)
            continue
        node[path[-1]] = q_jit(w)
        del w
        gc.collect()
    return params
