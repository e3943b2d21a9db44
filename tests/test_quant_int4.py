"""int4 (packed s4) weight-only serving quantization: error bounds, the
requantize-from-int8 path, and end-to-end generation equivalence at tiny
scale.  The packed HBM layout itself is TPU-only (ops/quant.py
packed_int4_format returns None off-TPU); numerics are identical."""

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.ops.quant import (
    QTensor, dequantize, expert_einsum, pad_expert_ffn,
    quantize_model_params, quantize_tensor, quantize_tensor_int4,
    requantize_experts_int4_inplace,
)


def test_int4_quantize_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 128), jnp.float32)
    qt = quantize_tensor_int4(w, group_size=128)
    assert str(qt.q.dtype) == "int4"
    assert qt.s.shape == (4, 2, 128)  # G=128 groups along D=256
    deq = dequantize(qt)
    err = np.asarray(jnp.abs(deq - w))
    # group-wise bound: within each group, |err| <= max(s/2, clip error);
    # the smallest scale candidate is 0.65*amax/8, so clip error at the
    # group max is at most (1 - 7*0.65/8) * amax ≈ 0.432*amax
    amax_g = np.asarray(jnp.max(jnp.abs(w.reshape(4, 2, 128, 128)),
                                axis=-2, keepdims=False))  # [4, 2, 128]
    bound = np.repeat(0.44 * amax_g + 1e-6, 128, axis=1).reshape(err.shape)
    assert (err <= bound).all()
    rms = float(jnp.sqrt(jnp.mean((deq - w) ** 2) / jnp.mean(w ** 2)))
    assert rms < 0.11, rms  # [-8,7] + clip search at G=128 beats RTN (~12.6%)


def test_int4_groupwise_beats_per_channel():
    """Group-wise clip-searched int4 has lower reconstruction error than
    single-group (per-channel-sized) quantization of the same weights."""
    w = jax.random.normal(jax.random.PRNGKey(7), (512, 64), jnp.float32)
    fine = quantize_tensor_int4(w, group_size=128)
    coarse = quantize_tensor_int4(w, group_size=512)
    e_fine = float(jnp.mean((dequantize(fine) - w) ** 2))
    e_coarse = float(jnp.mean((dequantize(coarse) - w) ** 2))
    assert fine.s.shape == (4, 64) and coarse.s.shape == (1, 64)
    assert e_fine < e_coarse


def test_requantize_from_int8_close_to_direct():
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32), jnp.float32)
    direct = quantize_tensor_int4(w)
    q8 = quantize_tensor(w)
    params = {"moe": {"dynamic": {"gate": q8, "up": q8, "down": q8},
                      "fixed": {"gate": q8, "up": q8, "down": q8}}}
    out = requantize_experts_int4_inplace(params)
    two_stage = out["moe"]["dynamic"]["gate"]
    d_deq = dequantize(direct)
    t_deq = dequantize(two_stage)
    # the int8 grid is ~18x finer than int4, but the per-group clip search
    # can settle on adjacent ratios for near-tied MSE — reconstructions
    # agree to a fraction of the weight scale overall
    d_rms = float(jnp.sqrt(jnp.mean((d_deq - w) ** 2)))
    t_rms = float(jnp.sqrt(jnp.mean((t_deq - w) ** 2)))
    assert abs(d_rms - t_rms) < 0.02 * float(jnp.sqrt(jnp.mean(w ** 2)))
    step = np.asarray(direct.s.astype(jnp.float32))
    close = np.abs(np.asarray(d_deq - t_deq)) <= 2 * np.repeat(
        step[:, :, None, :], 64, axis=2).reshape(d_deq.shape) + 1e-6
    assert close.mean() > 0.98, close.mean()


def test_int4_expert_einsum_matches_dequantized():
    w = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 96), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 64), jnp.float32)
    qt = quantize_tensor_int4(w)
    y_q = expert_einsum("ecd,edf->ecf", x, qt)
    y_ref = jnp.einsum("ecd,edf->ecf", x, qt.q.astype(jnp.float32) * qt.s)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_int4_serving_generation_close_to_int8(tmp_path):
    """Tiny model: int4-expert serving generates the same shapes and stays
    numerically close to int8 serving (same seeds, greedy)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio

    cfg = tiny_test_config()
    kw = dict(allow_random=True, config=cfg, max_tokens=16, min_tokens=4)
    m8 = UniMoEAudio(None, tokenizer=StubTokenizer(cfg), serving_mode="int8", **kw)
    p8 = m8.text_to_music("int4 parity tune", output_dir=str(tmp_path / "a"),
                          seed=0, do_sample=False)
    m4 = UniMoEAudio(None, tokenizer=StubTokenizer(cfg), serving_mode="int4", **kw)
    from unimoe_audio_tpu.ops.quant import QTensor as QT
    dyn = m4.params["layers"]["moe"]["dynamic"]["up"]
    assert isinstance(dyn, QT) and str(dyn.q.dtype) == "int4"
    p4 = m4.text_to_music("int4 parity tune", output_dir=str(tmp_path / "b"),
                          seed=0, do_sample=False)
    assert len(p8) == len(p4) == 1

    from unimoe_audio_tpu.codec import audio_io
    a, _ = audio_io.read_wav(p8[0])
    b, _ = audio_io.read_wav(p4[0])
    assert np.isfinite(a).all() and np.isfinite(b).all()


def test_int4_serving_default_is_per_channel():
    """The SERVING defaults must emit per-channel scales (s.shape[-2] == 1):
    group-wise scales (Dg > 1) route quant.matmul/expert_einsum through
    _dequant_grouped, whose reshape-mul producer XLA will not fuse into
    the dot on TPU — the dequantized bf16 weights materialize in HBM and
    single-stream decode measured 3x slower (18.7 vs 6.2 ms/step,
    2026-08-19 battery).  Quality comes from GPTQ error compensation at
    per-channel scales, not finer groups (docs/STATUS.md)."""
    w = jax.random.normal(jax.random.PRNGKey(11), (2, 256, 128), jnp.float32)
    qt = quantize_tensor_int4(w)                       # default group size
    assert qt.s.shape == (2, 1, 128), qt.s.shape

    params = {"layers": {"moe": {
        "dynamic": {k: quantize_tensor(jax.random.normal(
            jax.random.PRNGKey(i), (2, 3, 256, 128), jnp.float32))
            for i, k in enumerate(("gate", "up"))} | {
            "down": quantize_tensor(jax.random.normal(
                jax.random.PRNGKey(5), (2, 3, 128, 256), jnp.float32))},
        "fixed": {},
    }}}
    out = requantize_experts_int4_inplace(params)      # default group size
    for k in ("gate", "up", "down"):
        s = out["layers"]["moe"]["dynamic"][k].s
        assert s.shape[-2] == 1, (k, s.shape)


def test_gptq_per_channel_scale_layout_and_quality():
    """gptq_quantize_int4's default (group_size=0) emits per-channel
    scales and still beats per-channel RTN on correlated inputs."""
    from unimoe_audio_tpu.ops.gptq import gptq_quantize_int4

    rng = np.random.default_rng(0)
    D, F, N = 64, 48, 256
    base = rng.normal(size=(N, 8)).astype(np.float32)
    X = jnp.asarray(base @ rng.normal(size=(8, D)).astype(np.float32)
                    + 0.05 * rng.normal(size=(N, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(D, F)).astype(np.float32))
    H = X.T @ X
    g = gptq_quantize_int4(W, H)                       # default: per-channel
    assert g.s.shape == (1, F), g.s.shape
    r = quantize_tensor_int4(W)                        # per-channel RTN
    err_g = float(jnp.mean((X @ dequantize(g) - X @ W) ** 2))
    err_r = float(jnp.mean((X @ dequantize(r) - X @ W) ** 2))
    assert err_g < err_r, (err_g, err_r)
