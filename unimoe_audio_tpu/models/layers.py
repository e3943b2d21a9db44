"""Transformer building blocks: RMSNorm, mRoPE, GQA attention with a
preallocated functional KV cache.

TPU-native equivalents of the reference's HF-block usage
(reference: utils/UniMoE_Audio_model.py:193-457 building on
transformers Qwen2_5_VLAttention / Qwen2RMSNorm / Qwen2_5_VLRotaryEmbedding).
Everything is a pure function over param pytrees with static shapes so the
whole decode step fuses under one jit.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import TextMoEConfig


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Qwen2RMSNorm: normalize in fp32, scale, cast back."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def compute_mrope(
    position_ids: jnp.ndarray,  # [3, B, T]
    head_dim: int,
    rope_theta: float,
    mrope_section: Tuple[int, int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multimodal rotary embedding (Qwen2.5-VL style).

    Frequencies are split into (t, h, w) sections of mrope_section sizes
    (halves of head_dim/2); each section takes its angle from the matching
    position row.  For text-only inputs all three rows are equal and this
    degenerates to standard 1-D RoPE.  Returns cos/sin of shape [B, T, head_dim].
    """
    half = head_dim // 2
    inv_freq = 1.0 / (rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    # angles[r, b, t, f] for each of the 3 position rows
    angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [3, B, T, half]
    # select section per frequency index
    bounds = jnp.cumsum(jnp.asarray(mrope_section))
    freq_idx = jnp.arange(half)
    row = jnp.sum(freq_idx[:, None] >= bounds[None, :], axis=-1)  # 0/1/2 per freq
    picked = jnp.einsum("rbtf,fr->btf", angles, jax.nn.one_hot(row, 3, dtype=jnp.float32))
    emb = jnp.concatenate([picked, picked], axis=-1)  # [B, T, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: [B, T, H, Dh]; cos,sin: [B, T, Dh]."""
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin
    return q, k


class KVCache(NamedTuple):
    """Preallocated KV cache, TIME-major: [L, T_max, B, KV_heads, Dh].

    The model scans over the leading layer axis, so per-layer slices
    [T_max, B, KV, Dh] thread through `lax.scan` as xs — replacing the
    reference's DynamicCache growth (utils/UniMoE_Audio_model.py:353-354)
    with a static buffer + dynamic_update_slice.  Time-major so the decode
    path's valid-prefix window [0, w) is a CONTIGUOUS leading slice — XLA
    reads it as a view fused into the attention einsum instead of
    materializing a windowed copy (measured ~5 ms/step dead traffic at
    flagship shapes in the [B, T, ...] layout).

    Optional int8 storage (kv_dtype="int8", beyond the reference): k/v are
    int8 with per-(position, head) symmetric scales k_scale/v_scale
    [L, T_max, B, KV] f32 (amax/127 over Dh).  Every decode step streams
    the live cache prefix, so at long generations (the reference's 20 s
    headline case) the bf16 KV stream rivals the int8 weight stream —
    int8 KV halves it.  Scales apply OUTSIDE the attention einsums (on
    scores / on probs), so XLA still fuses the int8→bf16 convert into the
    dot reads.  k_scale/v_scale are None in bf16 mode.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, num_layers, batch, max_len, kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (num_layers, max_len, batch, kv_heads, head_dim)
        if dtype in (jnp.int8, "int8"):
            return cls(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:-1], jnp.float32),
                v_scale=jnp.zeros(shape[:-1], jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype=dtype), v=jnp.zeros(shape, dtype=dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def quantize_kv(x: jnp.ndarray):
    """Symmetric int8 over the trailing Dh: [..., Dh] → (q int8, s f32
    [...])."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1)
    s = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x32 / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def update_cache_slice(cache_k, cache_v, k_new, v_new, start,
                       cache_ks=None, cache_vs=None):
    """Write [B, T_new, KV, Dh] into per-layer [T_max, B, KV, Dh] slices at
    time offset start.  With int8 cache storage (cache_ks/cache_vs given)
    the fresh k/v quantize on write and the per-position scales land in
    the matching [T_max, B, KV] slices."""
    if cache_ks is not None:
        qk, sk = quantize_kv(k_new)
        qv, sv = quantize_kv(v_new)
        k = jax.lax.dynamic_update_slice(
            cache_k, jnp.swapaxes(qk, 0, 1), (start, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache_v, jnp.swapaxes(qv, 0, 1), (start, 0, 0, 0))
        ks = jax.lax.dynamic_update_slice(
            cache_ks, jnp.swapaxes(sk, 0, 1).astype(cache_ks.dtype),
            (start, 0, 0))
        vs = jax.lax.dynamic_update_slice(
            cache_vs, jnp.swapaxes(sv, 0, 1).astype(cache_vs.dtype),
            (start, 0, 0))
        return k, v, ks, vs
    k_t = jnp.swapaxes(k_new, 0, 1).astype(cache_k.dtype)
    v_t = jnp.swapaxes(v_new, 0, 1).astype(cache_v.dtype)
    k = jax.lax.dynamic_update_slice(cache_k, k_t, (start, 0, 0, 0))
    v = jax.lax.dynamic_update_slice(cache_v, v_t, (start, 0, 0, 0))
    return k, v, None, None


def attention(
    params: Dict,
    x: jnp.ndarray,                 # [B, T, D]
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: TextMoEConfig,
    *,
    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # per-layer [B, T_max, KV, Dh]
    cache_scales: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # per-layer [T_max, B, KV] f32 (int8 cache)
    cache_position: Optional[jnp.ndarray] = None,  # scalar start offset
    kv_valid_mask: Optional[jnp.ndarray] = None,   # [B, T_kv] 1=attendable
    causal: bool = True,
    use_flash: Optional[bool] = None,
    is_sliding: Optional[jnp.ndarray] = None,      # traced bool: window this layer
    decode_emit: bool = False,
    prefix_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # [n, KV, Dh] each
    ring: Optional[Tuple] = None,   # (Mesh, axis_name): ring attention over T
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """GQA attention (q/k/v with bias, o without — Qwen2.5 layout).

    Two modes:
      * no cache: self-attention over x with causal+padding mask.
      * cache: writes k/v at cache_position, attends over the full cache
        masked by kv_valid_mask (precomputed length mask).

    use_flash: route the T>1 self-attention window through the Pallas
    flash kernel (ops/flash_attention).  None = auto: on for TPU backends
    with T ≥ 128.  Prefill-into-cache also qualifies (cache_position==0
    writes exactly positions [0, T), so attending over the fresh k/v
    equals attending over the cache window).
    """
    from ..ops.quant import matmul, proj_matmul

    B, T, Dm = x.shape
    H, KV, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = (proj_matmul(x, params["q_proj"]) + params["q_proj"]["b"]).reshape(B, T, H, Dh)
    k = (proj_matmul(x, params["k_proj"]) + params["k_proj"]["b"]).reshape(B, T, KV, Dh)
    v = (proj_matmul(x, params["v_proj"]) + params["v_proj"]["b"]).reshape(B, T, KV, Dh)
    q, k = apply_rope(q, k, cos, sin)

    if prefix_kv is not None and cache_kv is None:
        # Prefix-tuning (no-cache training/eval path): learned KV injected
        # ahead of every key — post-RoPE like HF PEFT past_key_values; real
        # tokens' positions must come in shifted by n (train/peft.py).  The
        # cache path instead writes the prefix into slots [0, n)
        # (generate/loop.py).
        pk, pv = prefix_kv
        n_pre = pk.shape[0]
        k = jnp.concatenate(
            [jnp.broadcast_to(pk[None].astype(k.dtype), (B, n_pre, KV, Dh)), k], axis=1)
        v = jnp.concatenate(
            [jnp.broadcast_to(pv[None].astype(v.dtype), (B, n_pre, KV, Dh)), v], axis=1)
        if kv_valid_mask is not None:
            kv_valid_mask = jnp.concatenate(
                [jnp.ones((B, n_pre), kv_valid_mask.dtype), kv_valid_mask], axis=1)

    if decode_emit:
        # Decode fast path (T == 1): do NOT rewrite the cache here — attend
        # over the existing cache (kv_valid_mask must exclude the current
        # position) plus an explicit self-term, and hand the fresh k/v back
        # so the caller batches one small cache write for all layers.  This
        # keeps a lax.scan over layers from emitting a full cache copy as
        # stacked ys every step (the round-1 decode bandwidth sink).
        assert T == 1 and cache_kv is not None and kv_valid_mask is not None
        k_all, v_all = cache_kv                     # [T_kv, B, KV, Dh]
        T_kv = k_all.shape[0]
        groups = H // KV
        qg = q.reshape(B, KV, groups, Dh)           # T == 1 squeezed
        scale = Dh ** -0.5
        neg = jnp.float32(-1e30)
        self_score = (jnp.einsum(
            "bkgd,bkd->bkg", qg, k.reshape(B, KV, Dh).astype(qg.dtype)
        ).astype(jnp.float32) * scale)              # [B, KV, g]

        def window_mask(idx):
            m = kv_valid_mask[:, idx] > 0           # [B, |idx|]
            if is_sliding is not None and cfg.sliding_window:
                in_w = (cache_position - idx) < cfg.sliding_window
                m = m & jnp.where(is_sliding, in_w, jnp.ones_like(in_w))[None, :]
            return m

        def attend_window(w: int):
            """Plain masked attention over the first `w` cache positions +
            the self-term (valid keys always lie in [0, cache_position)).
            Time-major cache AND time-major scores: the QK gemm contracts
            the trailing Dh of both operands and the PV gemm contracts the
            leading time dim of both — no operand transposes, so XLA reads
            the [0:w] prefix as a fused view (the [B, T, ...] layout
            measured ~5 ms/step of slice+transpose copies at flagship).
            int8 cache: scales apply on scores (K) and on probs (V), so
            the einsums stay int8-read + convert-fused."""
            ks = k_all[:w]                          # [w, B, KV, Dh]
            vs = v_all[:w]
            s = jnp.einsum(
                "sbkd,bkgd->sbkg", ks.astype(qg.dtype), qg
            ).astype(jnp.float32) * scale           # [w, B, KV, g]
            if cache_scales is not None:
                s = s * cache_scales[0][:w][..., None]
            valid = window_mask(jnp.arange(w))      # [B, w]
            s = jnp.where(valid.T[:, :, None, None], s, neg)
            all_s = jnp.concatenate([s, self_score[None]], axis=0)
            probs = jax.nn.softmax(all_s, axis=0).astype(x.dtype)
            pv = probs[:w]
            if cache_scales is not None:
                pv = pv * cache_scales[1][:w][..., None].astype(pv.dtype)
            o = jnp.einsum("sbkg,sbkd->bkgd", pv, vs.astype(x.dtype))
            return o + probs[w][..., None] * v.reshape(B, KV, 1, Dh).astype(x.dtype)

        # Always attend over the whole (right-sized) buffer: callers bound
        # dead reads by growing the cache across decode CHUNKS
        # (generate_chunked) rather than by in-step window selection —
        # dynamic windows inside the layer scan cross a control-flow
        # boundary, which forces XLA to materialize the sliced cache
        # (measured ~5 ms/step of copy traffic at flagship shapes).
        out = attend_window(T_kv)
        out = proj_matmul(out.reshape(B, 1, H * Dh), params["o_proj"])
        return out, (k, v)

    if ring is not None:
        # Ring attention (sequence/context parallelism): q/k/v shard over
        # the sequence dim along the given mesh axis; K/V chunks rotate via
        # ppermute with an online-softmax merge (ops/ring_attention).  No
        # device holds full-sequence K/V or any full [T, T] score block.
        assert cache_kv is None and prefix_kv is None and causal, (
            "ring attention supports the causal no-cache path"
        )
        from jax.sharding import PartitionSpec as P
        try:
            from jax.experimental.shard_map import shard_map
        except ImportError:  # newer JAX
            from jax.shard_map import shard_map

        from ..ops.ring_attention import ring_attention

        mesh, axis = ring
        valid = (
            kv_valid_mask[:, :T].astype(jnp.int32) if kv_valid_mask is not None
            else jnp.ones((B, T), jnp.int32)
        )
        fn = shard_map(
            lambda q_, k_, v_, val: ring_attention(
                q_, k_, v_, val, axis_name=axis, causal=True
            ),
            mesh=mesh,
            in_specs=(
                P(None, None, axis, None), P(None, None, axis, None),
                P(None, None, axis, None), P(None, axis),
            ),
            out_specs=P(None, None, axis, None),
            check_rep=False,
        )
        out = fn(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), valid,
        ).transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        out = proj_matmul(out, params["o_proj"])
        return out, None

    if cache_kv is not None:
        k_all, v_all, ks_all, vs_all = update_cache_slice(
            cache_kv[0], cache_kv[1], k, v, cache_position,
            *(cache_scales if cache_scales is not None else (None, None)))
        if cache_scales is not None:
            cache_scales = (ks_all, vs_all)
            cache_kv = (k_all, v_all, ks_all, vs_all)
        else:
            cache_kv = (k_all, v_all)
    else:
        k_all, v_all = k, v

    if use_flash is None:
        # Auto mode never applies flash in cache mode: the flash window only
        # covers the fresh k/v block, which is correct solely for a
        # cache_position==0 prefill — callers that guarantee that (the
        # generate loop's prefill) opt in with use_flash=True.
        use_flash = (
            T >= 128 and causal and cache_kv is None
            and jax.default_backend() in ("tpu", "axon")
        )
    if use_flash and T > 1 and causal:
        # Self-attention window through the Pallas flash kernel.  With a
        # cache this is valid only for a cache_position==0 prefill (the
        # window [0, T) holds every attendable key) — generate_jit's
        # prefill is the only such caller.
        from ..ops.flash_attention import flash_attention

        S_win = k.shape[1]  # == T, or n_prefix + T with injected prefix KV
        window_valid = (
            kv_valid_mask[:, :S_win] if kv_valid_mask is not None
            else jnp.ones((B, S_win), jnp.int32)
        )
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), window_valid, causal=True,
        ).transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
        out = proj_matmul(out, params["o_proj"])
        return out, cache_kv

    # Cache tensors are time-major [T_kv, B, KV, Dh]; fresh self-attention
    # k/v are [B, T, KV, Dh].
    kv_spec = "bskd" if cache_kv is None else "sbkd"
    T_kv = k_all.shape[1] if cache_kv is None else k_all.shape[0]
    groups = H // KV
    qg = q.reshape(B, T, KV, groups, Dh)

    scale = Dh ** -0.5
    # scores: [B, KV, groups, T, T_kv]
    scores = jnp.einsum(
        f"btkgd,{kv_spec}->bkgts", qg, k_all.astype(qg.dtype)
    ).astype(jnp.float32) * scale
    if cache_kv is not None and cache_scales is not None:
        # int8 cache: per-(position, head) K scales apply on the scores
        # ([T_kv, B, KV] → [B, KV, 1, 1, T_kv]).
        scores = scores * cache_scales[0].transpose(1, 2, 0)[:, :, None, None, :]

    neg = jnp.float32(-1e30)
    if kv_valid_mask is not None:
        scores = jnp.where(kv_valid_mask[:, None, None, None, :] > 0, scores, neg)
    # Positional masks: causal, plus the optional per-layer sliding window
    # (reference mask mapping, utils/UniMoE_Audio_model.py:370-383).
    key_pos = jnp.arange(T_kv)[None, :]
    if cache_kv is None:
        q_pos = jnp.arange(T)[:, None] + (T_kv - T)
    else:
        q_pos = (cache_position if cache_position is not None else 0) + jnp.arange(T)[:, None]
    if causal and (cache_kv is None or T > 1):
        scores = jnp.where((key_pos <= q_pos)[None, None, None], scores, neg)
    if is_sliding is not None and cfg.sliding_window:
        in_window = (q_pos - key_pos) < cfg.sliding_window
        allowed = jnp.where(is_sliding, in_window, jnp.ones_like(in_window))
        scores = jnp.where(allowed[None, None, None], scores, neg)

    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    if cache_kv is not None and cache_scales is not None:
        probs = probs * cache_scales[1].transpose(1, 2, 0)[
            :, :, None, None, :].astype(probs.dtype)
    out = jnp.einsum(
        f"bkgts,{kv_spec}->btkgd", probs, v_all.astype(x.dtype)
    ).reshape(B, T, H * Dh)
    out = proj_matmul(out, params["o_proj"])
    return out, cache_kv


def init_attention_params(rng, cfg: TextMoEConfig, dtype=jnp.bfloat16) -> Dict:
    D, H, KV, Dh = cfg.hidden_size, cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    ks = jax.random.split(rng, 4)

    def lin(key, din, dout, bias=True):
        p = {"w": (jax.random.normal(key, (din, dout)) * din ** -0.5).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype=dtype)
        return p

    return {
        "q_proj": lin(ks[0], D, H * Dh),
        "k_proj": lin(ks[1], D, KV * Dh),
        "v_proj": lin(ks[2], D, KV * Dh),
        "o_proj": {"w": (jax.random.normal(ks[3], (H * Dh, D)) * (H * Dh) ** -0.5).astype(dtype)},
    }
