"""Int8 weight-only quantization tests: numeric fidelity of the dequant
matmul identity, quantized model forward closeness, generation runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, model_forward
from unimoe_audio_tpu.ops.quant import (
    QTensor, expert_einsum, matmul, quantize_model_params, quantize_tensor,
)


def test_quantize_tensor_fidelity():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w))
    assert qt.q.dtype == jnp.int8
    deq = np.asarray(qt.q, dtype=np.float32) * np.asarray(qt.s)
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # int8 per-channel ≤ ~1/254 relative error


def test_matmul_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    qt = quantize_tensor(w)
    got = np.asarray(matmul(x, qt))
    want = np.asarray(x @ (qt.q.astype(jnp.float32) * qt.s))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # vs full precision: small relative error
    ref = np.asarray(x @ w)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02


def test_expert_einsum_identity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 16, 32)).astype(np.float32))
    qt = quantize_tensor(w)
    got = np.asarray(expert_einsum("ecd,edf->ecf", x, qt))
    ref = np.asarray(jnp.einsum("ecd,edf->ecf", x, w))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02


def test_quantized_model_forward_close():
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_model_params(params)
    assert isinstance(qparams["layers"]["attn"]["q_proj"]["w"], QTensor)
    assert isinstance(qparams["codec_head"], QTensor)
    # Router gate + norms untouched.
    assert not isinstance(qparams["layers"]["moe"]["gate"], QTensor)

    ids = jnp.asarray(np.random.default_rng(3).integers(3, 100, size=(2, 10)))
    full = model_forward(params, cfg, ids)
    quant = model_forward(qparams, cfg, ids)
    f, q = np.asarray(full.codec_logits), np.asarray(quant.codec_logits)
    # Logits correlated strongly; exact tolerance is loose (error compounds
    # through layers) but top-1 predictions should mostly agree.
    agree = (f.argmax(-1) == q.argmax(-1)).mean()
    assert agree > 0.9, f"top-1 agreement {agree}"


def test_quantized_generation_runs():
    from unimoe_audio_tpu.codec import delay as dl
    from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer

    cfg = tiny_test_config()
    params = quantize_model_params(
        init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    )
    B, T_text, max_tokens = 1, 7, 12
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, size=(2 * B, T_text)))
    attn = jnp.ones((2 * B, T_text), dtype=jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern,
    )
    res = generate_jit(
        params, cfg, ids, attn, None, pad_buffer(prefill, max_tokens),
        jnp.asarray(steps, jnp.int32), jax.random.PRNGKey(1),
        max_tokens=max_tokens, min_tokens=jnp.int32(2),
        cfg_scale=jnp.float32(1.0), temperature=jnp.float32(1.0),
        top_p=jnp.float32(0.95), cfg_filter_top_k=8,
        eos_prob_mul_factor=jnp.float32(1.0), do_sample=True,
    )
    codes = np.asarray(res.codes)
    assert (codes >= 0).all() and (codes < cfg.codec_embed_size).all()


def test_pad_expert_ffn_exact():
    """Zero-padding FFN intermediate dims to a lane multiple is
    numerics-exact for the DCMoE block (silu(0)*0 == 0; padded down rows
    multiply zeros)."""
    import jax
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.moe.block import dcmoe_block, init_dcmoe_params
    from unimoe_audio_tpu.ops.quant import pad_expert_ffn

    cfg = tiny_test_config(
        hidden_size=64, dynamic_intermediate_size=48,   # not a multiple of 32
        shared_intermediate_size=24,
    ).text_config
    params = init_dcmoe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    padded = pad_expert_ffn({"layers": {"moe": params}}, multiple=32)
    pp = padded["layers"]["moe"]
    assert pp["dynamic"]["gate"].shape[-1] == 64
    assert pp["fixed"]["down"].shape[-2] == 32
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)
    out_a = dcmoe_block(params, x, cfg)
    out_b = dcmoe_block(pp, x, cfg)
    np.testing.assert_allclose(
        np.asarray(out_a.hidden_states), np.asarray(out_b.hidden_states),
        rtol=1e-6, atol=1e-6,
    )
    # packed path too
    out_c = dcmoe_block(pp, x, cfg, dispatch_mode="packed", capacity=16)
    np.testing.assert_allclose(
        np.asarray(out_a.hidden_states), np.asarray(out_c.hidden_states),
        rtol=1e-5, atol=1e-6,
    )


def test_pad_expert_ffn_after_quantize_exact():
    """Padding QTensor (already-int8) expert weights == quantizing padded
    weights: dequantized outputs identical."""
    import jax
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.moe.block import dcmoe_block, init_dcmoe_params
    from unimoe_audio_tpu.ops.quant import pad_expert_ffn, quantize_model_params

    cfg = tiny_test_config(
        hidden_size=64, dynamic_intermediate_size=48,
        shared_intermediate_size=24,
    ).text_config
    params = init_dcmoe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tree = quantize_model_params({"layers": {"moe": params}})
    tree = pad_expert_ffn(tree, multiple=32)
    pp = tree["layers"]["moe"]
    assert pp["dynamic"]["gate"].q.shape[-1] == 64
    assert pp["dynamic"]["gate"].s.shape[-1] == 64
    assert pp["fixed"]["down"].q.shape[-2] == 32
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)
    base = quantize_model_params({"layers": {"moe": params}})["layers"]["moe"]
    out_a = dcmoe_block(base, x, cfg)
    out_b = dcmoe_block(pp, x, cfg)
    np.testing.assert_allclose(
        np.asarray(out_a.hidden_states), np.asarray(out_b.hidden_states),
        rtol=1e-5, atol=1e-6,
    )


def test_quantize_vision_params_near_lossless():
    """Int8 vision tower: features close to the bf16 tower; serving_mode
    with a vision model still runs VT2M."""
    import jax
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.models.vision import init_vision_params, vision_forward
    from unimoe_audio_tpu.ops.quant import QTensor, quantize_vision_params

    cfg = tiny_test_config(with_vision=True)
    vcfg = cfg.vision_config
    params = init_vision_params(jax.random.PRNGKey(0), vcfg, dtype=jnp.float32)
    qparams = quantize_vision_params(params)
    assert isinstance(qparams["blocks"][0]["qkv"]["w"], QTensor)
    grid = np.array([[1, 4, 4]])
    pd = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    pv = jnp.asarray(np.random.default_rng(0).normal(size=(16, pd)), jnp.float32)
    want = np.asarray(vision_forward(params, pv, grid, vcfg))
    got = np.asarray(vision_forward(qparams, pv, grid, vcfg))
    # int8 per-channel weight-only: small relative error on features
    denom = np.maximum(np.abs(want), 1e-2)
    assert np.median(np.abs(got - want) / denom) < 0.1
