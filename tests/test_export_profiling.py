"""Export round-trip + profiling/observability tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.core.convert import convert_model_state_dict
from unimoe_audio_tpu.core.export import export_hf_checkpoint, model_params_to_state_dict
from unimoe_audio_tpu.models.model import init_model_params, model_forward, text_model_forward
from unimoe_audio_tpu.utils.profiling import WallClock, router_stats, timeit_in_jit


def test_export_convert_round_trip():
    """params → state dict → convert back == identity."""
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sd = model_params_to_state_dict(params, cfg)
    back = convert_model_state_dict(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), rtol=1e-6,
            err_msg=str(path),
        )


def test_export_safetensors_loadable(tmp_path):
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    export_hf_checkpoint(params, cfg, str(tmp_path))
    assert (tmp_path / "model.safetensors").exists()
    assert (tmp_path / "config.json").exists()
    # The API loads the exported checkpoint directly.
    from unimoe_audio_tpu.api import UniMoEAudio
    m = UniMoEAudio(str(tmp_path), dtype=jnp.float32)
    ids = jnp.ones((1, 4), dtype=jnp.int32)
    out = model_forward(m.params, m.config, ids)
    want = model_forward(params, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(out.codec_logits), np.asarray(want.codec_logits),
        rtol=1e-4, atol=1e-4,
    )


def test_router_stats():
    cfg = tiny_test_config()
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 6, tc.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(6)[None, None], (3, 2, 6))
    out = text_model_forward(params, emb, pos, tc, output_router_stats=True)
    stats = router_stats(out.expert_mask, out.router_top_k, tc.num_dynamic_experts)
    assert 1 <= stats["mean_top_k"] <= tc.num_dynamic_experts
    assert len(stats["expert_load"]) == tc.num_dynamic_experts
    assert len(stats["per_layer_mean_k"]) == tc.num_hidden_layers


def test_wallclock():
    import time

    clock = WallClock()
    with clock("phase"):
        time.sleep(0.01)
    assert clock("phase").elapsed() >= 0.01


def test_timeit_in_jit_runs():
    f = lambda x: x @ x
    x = jnp.ones((128, 128))
    dt = timeit_in_jit(f, x, iters=2)
    assert dt >= 0
