"""DCMoE block tests: dispatch-mode consistency, fixed-expert forcing,
padding gating, token-drop policies (reference block:
utils/UniMoE_Audio_core.py:196-358)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.moe.block import dcmoe_block, init_dcmoe_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config().text_config
    params = init_dcmoe_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, cfg.hidden_size), dtype=jnp.float32)
    return cfg, params, x


def test_dense_vs_packed_mode(setup):
    cfg, params, x = setup
    out_d = dcmoe_block(params, x, cfg, dispatch_mode="dense")
    out_p = dcmoe_block(params, x, cfg, dispatch_mode="packed", capacity=x.shape[0] * x.shape[1])
    np.testing.assert_allclose(
        np.asarray(out_d.hidden_states), np.asarray(out_p.hidden_states), rtol=1e-5, atol=1e-5
    )


def test_fixed_experts_always_on(setup):
    cfg, params, x = setup
    out = dcmoe_block(params, x, cfg)
    mask = np.asarray(out.expert_mask)
    assert (mask[:, cfg.num_dynamic_experts:] == 1).all()


def test_padding_mask_gates_dynamic_experts(setup):
    cfg, params, x = setup
    pad = jnp.zeros((2, 12), dtype=jnp.int32).at[:, :5].set(1)
    out = dcmoe_block(params, x, cfg, padding_token_mask=pad)
    mask = np.asarray(out.expert_mask).reshape(2, 12, -1)
    assert (mask[:, 5:, : cfg.num_dynamic_experts] == 0).all()
    assert (mask[:, :5, : cfg.num_dynamic_experts].sum(-1) >= 1).all()


def test_topk_in_valid_range(setup):
    cfg, params, x = setup
    out = dcmoe_block(params, x, cfg)
    k = np.asarray(out.router_top_k)
    assert (k >= 1).all() and (k <= cfg.num_dynamic_experts).all()


def test_router_weight_normalized(setup):
    cfg, params, x = setup
    out = dcmoe_block(params, x, cfg)
    w = np.asarray(out.router_weight)
    m = np.asarray(out.expert_mask)
    # Global weight sums to ~1 over selected experts (softmax renorm).
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-3)
    # No weight on unselected dynamic experts.
    assert np.abs(w[:, : cfg.num_dynamic_experts] * (1 - m[:, : cfg.num_dynamic_experts])).max() < 1e-6


@pytest.mark.parametrize("policy", ["probs", "position"])
def test_token_drop_respects_capacity(setup, policy):
    cfg, params, x = setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, token_drop=True, drop_policy=policy,
                               capacity_factor=1.0, min_capacity=2)
    out = dcmoe_block(params, x, cfg2)
    mask = np.asarray(out.expert_mask)
    from unimoe_audio_tpu.moe.router import expert_capacity
    cap = expert_capacity(24, cfg2.num_dynamic_experts, 1.0, 2)
    assert (mask[:, : cfg2.num_dynamic_experts].sum(0) <= cap).all()
    # Fixed experts unaffected by drop.
    assert (mask[:, cfg2.num_dynamic_experts:] == 1).all()


def test_training_mode_runs_and_differentiable(setup):
    cfg, params, x = setup
    import dataclasses
    cfg2 = dataclasses.replace(cfg, ignore_differentiable_router=False)

    def loss_fn(p):
        out = dcmoe_block(p, x, cfg2, training=True, rng=jax.random.PRNGKey(7))
        return jnp.sum(out.hidden_states ** 2) + out.aux_loss

    g = jax.grad(loss_fn)(params)
    gn = jax.tree.map(lambda a: float(jnp.abs(a).max()), g)
    assert gn["gate"] > 0  # router receives gradient (mixer estimator + aux)
    assert gn["dynamic"]["gate"] > 0
    assert gn["fixed"]["down"] > 0
    flat, _ = jax.tree.flatten(jax.tree.map(lambda a: jnp.isfinite(a).all(), g))
    assert all(bool(v) for v in flat)


def test_top_k_fallback_mode(setup):
    """mlp_dynamic_top_p == 0 → fixed top-k routing (reference:
    utils/UniMoE_Audio_core.py:254-257)."""
    import dataclasses
    cfg, params, x = setup
    cfg2 = dataclasses.replace(cfg, mlp_dynamic_top_p=0.0, mlp_dynamic_top_k=2)
    out = dcmoe_block(params, x, cfg2)
    k = np.asarray(out.router_top_k)
    assert (k == 2).all()
    mask = np.asarray(out.expert_mask)
    assert (mask[:, : cfg2.num_dynamic_experts].sum(-1) == 2).all()
