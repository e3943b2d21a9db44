"""Error-compensated (GPTQ-style) int4 expert quantization (ops/gptq.py).

Property under test: given the calibration Hessian H = X^T X, GPTQ
minimizes OUTPUT error ||X W - X Wq|| — it must beat round-to-nearest
(RTN, ops/quant.quantize_tensor_int4) on correlated inputs at the same
group size, while staying interchangeable with RTN's QTensor contract.
"""

import numpy as np
import jax
import jax.numpy as jnp

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.ops.gptq import (
    _gptq_int4_raw, collect_moe_hessians, gptq_quantize_int4,
    quantize_experts_int4_gptq,
)
from unimoe_audio_tpu.ops.quant import (
    QTensor, dequantize, quantize_tensor_int4,
)


def _correlated_inputs(key, N, D, rank):
    kz, km, kn = jax.random.split(key, 3)
    Z = jax.random.normal(kz, (N, rank), jnp.float32)
    M = jax.random.normal(km, (rank, D), jnp.float32)
    return Z @ M + 0.05 * jax.random.normal(kn, (N, D), jnp.float32)


def test_gptq_qtensor_contract():
    """Same storage contract as quantize_tensor_int4: int4 q of the weight
    shape, bf16 group scales [Dg, F], dequantize()-compatible."""
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (64, 48), jnp.float32)
    X = _correlated_inputs(jax.random.PRNGKey(1), 256, 64, 16)
    qt = gptq_quantize_int4(W, X.T @ X, group_size=16)
    assert isinstance(qt, QTensor)
    assert str(qt.q.dtype) == "int4" and qt.q.shape == (64, 48)
    assert qt.s.dtype == jnp.bfloat16 and qt.s.shape == (4, 48)
    deq = dequantize(qt)
    # weight-space error stays in the int4 ballpark (GPTQ trades a little
    # weight error for output error, but not catastrophically)
    rms = float(jnp.sqrt(jnp.mean((deq - W) ** 2) / jnp.mean(W ** 2)))
    assert rms < 0.35, rms


def test_gptq_beats_rtn_output_error_on_correlated_inputs():
    key = jax.random.PRNGKey(2)
    D, F, N = 64, 32, 512
    X = _correlated_inputs(key, N, D, rank=8)
    W = jax.random.normal(jax.random.PRNGKey(3), (D, F), jnp.float32)
    H = X.T @ X

    rtn = quantize_tensor_int4(W, group_size=16)
    gptq = gptq_quantize_int4(W, H, group_size=16)
    ref = X @ W
    e_rtn = float(jnp.sqrt(jnp.mean((X @ dequantize(rtn) - ref) ** 2)))
    e_gptq = float(jnp.sqrt(jnp.mean((X @ dequantize(gptq) - ref) ** 2)))
    # strict win, with margin: error compensation routes rounding error
    # into the low-energy directions of H
    assert e_gptq < 0.8 * e_rtn, (e_gptq, e_rtn)


def test_gptq_near_identity_hessian_close_to_rtn():
    """With an (almost) identity Hessian there is nothing to compensate:
    GPTQ output error on white inputs matches RTN within noise."""
    D, F, N = 32, 24, 2048
    X = jax.random.normal(jax.random.PRNGKey(4), (N, D), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(5), (D, F), jnp.float32)
    rtn = quantize_tensor_int4(W, group_size=16)
    gptq = gptq_quantize_int4(W, jnp.eye(D) * N / D, group_size=16)
    ref = X @ W
    e_rtn = float(jnp.sqrt(jnp.mean((X @ dequantize(rtn) - ref) ** 2)))
    e_gptq = float(jnp.sqrt(jnp.mean((X @ dequantize(gptq) - ref) ** 2)))
    assert e_gptq < 1.15 * e_rtn, (e_gptq, e_rtn)


def test_gptq_leading_dim_hessian_broadcast():
    """[L, E, D, F] leaves with per-layer [L, D, D] Hessians: each (l, e)
    matrix must be quantized against its own layer's Hessian."""
    L, E, D, F = 2, 3, 32, 16
    W = jax.random.normal(jax.random.PRNGKey(6), (L, E, D, F), jnp.float32)
    Xs = [_correlated_inputs(jax.random.PRNGKey(10 + l), 128, D, 4)
          for l in range(L)]
    H = jnp.stack([x.T @ x for x in Xs])

    q_all, s_all = jax.jit(_gptq_int4_raw, static_argnums=2)(W, H, 16)
    assert q_all.shape == (L, E, D, F) and s_all.shape == (L, E, D // 16, F)
    for l in range(L):
        for e in range(E):
            q1, s1 = jax.jit(_gptq_int4_raw, static_argnums=2)(
                W[l, e], H[l], 16)
            np.testing.assert_array_equal(np.asarray(q_all[l, e]),
                                          np.asarray(q1))
            np.testing.assert_array_equal(
                np.asarray(s_all[l, e]).astype(np.float32),
                np.asarray(s1).astype(np.float32))


def _calib_batch(cfg, B=2, T=24):
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 60, (B, T)).astype(np.int32)
    codes = rng.integers(0, cfg.codec_eos_value,
                         (B, T, cfg.codec_channels)).astype(np.int32)
    ids = np.where(np.arange(T)[None, :] < 6, ids,
                   cfg.codec_placeholder_value).astype(np.int32)
    return jnp.asarray(ids), jnp.asarray(codes)


def test_collect_moe_hessians_shape_and_psd():
    cfg = tiny_test_config(num_hidden_layers=2)
    from unimoe_audio_tpu.models.model import init_model_params

    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids, codes = _calib_batch(cfg)
    H = collect_moe_hessians(params, cfg, ids, codec_input_ids=codes)
    D = cfg.text_config.hidden_size
    assert H.shape == (2, D, D)
    Hn = np.asarray(H)
    np.testing.assert_allclose(Hn, np.swapaxes(Hn, -1, -2), rtol=0, atol=1e-3)
    evals = np.linalg.eigvalsh(Hn)
    assert (evals > -1e-3).all()


def test_quantize_experts_gptq_end_to_end():
    """Tiny model: GPTQ expert conversion runs, produces int4 QTensor
    experts, and the quantized model's codec logits are at least as close
    to the fp32 reference as the RTN int4 model's (on the calibration
    distribution)."""
    from unimoe_audio_tpu.models.model import init_model_params, model_forward
    from unimoe_audio_tpu.ops import quant as Q

    cfg = tiny_test_config(num_hidden_layers=2)
    ids, codes = _calib_batch(cfg)
    batch = dict(codec_input_ids=codes,
                 attention_mask=jnp.ones(ids.shape, jnp.int32))
    fwd = jax.jit(lambda p: model_forward(
        p, cfg, ids, **batch).codec_logits.astype(jnp.float32))

    def fresh():
        return init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    ref = np.asarray(fwd(fresh()))

    p_rtn = fresh()
    for g in ("dynamic", "fixed"):
        grp = p_rtn["layers"]["moe"][g]
        for k in ("gate", "up", "down"):
            grp[k] = quantize_tensor_int4(grp[k], group_size=16)
    rtn_out = np.asarray(fwd(p_rtn))

    p_gptq = quantize_experts_int4_gptq(
        fresh(), cfg, ids, codec_input_ids=codes, group_size=16)
    dyn = p_gptq["layers"]["moe"]["dynamic"]["gate"]
    assert isinstance(dyn, QTensor) and str(dyn.q.dtype) == "int4"
    gptq_out = np.asarray(fwd(p_gptq))

    assert np.isfinite(gptq_out).all()
    e_rtn = float(np.sqrt(np.mean((rtn_out - ref) ** 2)))
    e_gptq = float(np.sqrt(np.mean((gptq_out - ref) ** 2)))
    # calibration-aware quantization should not be worse; allow slack for
    # the tiny model's noise floor
    assert e_gptq < 1.1 * e_rtn, (e_gptq, e_rtn)


def test_int4_gptq_serving_mode(tmp_path):
    """serving_mode="int4-gptq": load-time self-calibration (greedy
    generation → Hessians → GPTQ experts), then generation runs with the
    packed experts; non-expert weights int8 as usual."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from tests.test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio

    cfg = tiny_test_config()
    m = UniMoEAudio(
        None, tokenizer=StubTokenizer(cfg), allow_random=True, config=cfg,
        max_tokens=16, min_tokens=4, serving_mode="int4-gptq",
        gptq_calibration={"captions": ["calm synth arpeggio",
                                       "noisy drum loop"],
                          "frames": 8, "group_size": 16},
    )
    dyn = m.params["layers"]["moe"]["dynamic"]["gate"]
    assert isinstance(dyn, QTensor) and str(dyn.q.dtype) == "int4"
    assert dyn.s.shape[-2] > 1  # group-wise scales
    attn_w = m.params["layers"]["attn"]["q_proj"]["w"]
    assert isinstance(attn_w, QTensor) and str(attn_w.q.dtype) == "int8"
    paths = m.text_to_music("gptq serving tune", output_dir=str(tmp_path),
                            seed=0, do_sample=False)
    assert len(paths) == 1
    from unimoe_audio_tpu.codec import audio_io
    a, _ = audio_io.read_wav(paths[0])
    assert np.isfinite(a).all()


def test_pad_expert_ffn_grouped_contraction_scales():
    """The GPTQ flow quantizes BEFORE padding: pad_expert_ffn must extend
    group-wise scales over a padded contraction dim with 1.0 groups and
    keep the dequantized weight exactly the zero-padded original."""
    from unimoe_audio_tpu.ops.quant import pad_expert_ffn

    E, F, D = 2, 96, 64   # F=96 pads to 128 (pad 32)
    down = jax.random.normal(jax.random.PRNGKey(8), (E, F, D), jnp.float32)
    qt = quantize_tensor_int4(down, group_size=32)
    gate = jax.random.normal(jax.random.PRNGKey(9), (E, D, F), jnp.float32)
    tree = {"moe": {"dynamic": {"gate": quantize_tensor_int4(gate, group_size=32),
                                "up": quantize_tensor_int4(gate, group_size=32),
                                "down": qt},
                    "fixed": {}}}
    before = dequantize(tree["moe"]["dynamic"]["down"])
    pad_expert_ffn(tree, multiple=128)
    padded = tree["moe"]["dynamic"]["down"]
    assert padded.q.shape == (E, 128, D)
    assert padded.s.shape == (E, 128 // 32, D)
    after = dequantize(padded)
    np.testing.assert_array_equal(np.asarray(after[:, :F, :]),
                                  np.asarray(before))
    assert float(jnp.abs(after[:, F:, :]).max()) == 0.0

    # a group size NOT dividing the pad must be rejected loudly
    bad = {"moe": {"dynamic": {
        "gate": quantize_tensor_int4(gate, group_size=32),
        "up": quantize_tensor_int4(gate, group_size=32),
        "down": quantize_tensor_int4(down, group_size=48)},
        "fixed": {}}}
    import pytest
    with pytest.raises(ValueError, match="scale group"):
        pad_expert_ffn(bad, multiple=128)
