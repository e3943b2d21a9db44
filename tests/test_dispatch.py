"""Dispatch path equivalence: dense == packed == EP(shard_map over 8 CPU
devices).  Mirrors the reference's single-process-vs-EP equivalence contract
(utils/UniMoE_Audio_core.py:446-493 with/without ep_group)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from unimoe_audio_tpu.moe import dispatch as D


def make_params(rng, E, dim, F):
    k = jax.random.split(rng, 3)
    return {
        "gate": jax.random.normal(k[0], (E, dim, F)) * 0.1,
        "up": jax.random.normal(k[1], (E, dim, F)) * 0.1,
        "down": jax.random.normal(k[2], (E, F, dim)) * 0.1,
    }


def random_routing(rng, S, E):
    k1, k2 = jax.random.split(rng)
    mask = (jax.random.uniform(k1, (S, E)) > 0.6).astype(jnp.int32)
    w = jax.random.uniform(k2, (S, E))
    return mask, w


def test_dense_equals_packed_full_capacity():
    rng = jax.random.PRNGKey(0)
    S, E, dim, F = 48, 4, 16, 32
    params = make_params(rng, E, dim, F)
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask, w = random_routing(jax.random.fold_in(rng, 2), S, E)

    dense = D.moe_ffn_dense(hidden, mask, w, params)
    packed = D.moe_ffn_packed(hidden, mask, w, params, capacity=S)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(packed), rtol=1e-5, atol=1e-5)


def test_packed_capacity_drop_matches_position_policy():
    """With capacity < max load, packed drops later-sequence tokens — the
    reference 'position' overflow semantics (cumsum ≥ cap ⇒ dropped)."""
    rng = jax.random.PRNGKey(3)
    S, E, dim, F = 32, 2, 8, 16
    params = make_params(rng, E, dim, F)
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask = jnp.ones((S, E), dtype=jnp.int32)
    w = jnp.ones((S, E)) * 0.5
    cap = 10

    got = D.moe_ffn_packed(hidden, mask, w, params, capacity=cap)
    # Tokens with position >= cap contribute zero.
    kept_mask = (jnp.cumsum(mask, axis=0) - 1 < cap).astype(jnp.int32)
    want = D.moe_ffn_dense(hidden, kept_mask, w, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ep", [2, 4, 8])
def test_ep_shard_map_matches_dense(ep):
    """EP over an `expert` mesh axis reproduces the single-device result on
    each rank's local token shard."""
    devices = np.array(jax.devices()[:ep])
    mesh = Mesh(devices, ("expert",))
    E = 8
    S_local, dim, F = 16, 8, 16
    S = S_local * ep
    rng = jax.random.PRNGKey(42)
    params = make_params(rng, E, dim, F)
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask, w = random_routing(jax.random.fold_in(rng, 2), S, E)
    cap = S_local  # local capacity bound

    got = shard_map(
        lambda h, m, wt, g, u, d: D.moe_ffn_ep(
            h, m, wt, {"gate": g, "up": u, "down": d}, cap, axis_name="expert"
        ),
        mesh=mesh,
        in_specs=(P("expert"), P("expert"), P("expert"), P("expert"), P("expert"), P("expert")),
        out_specs=P("expert"),
    )(hidden, mask, w, params["gate"], params["up"], params["down"])

    want = D.moe_ffn_dense(hidden, mask, w, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gmm_matches_dense():
    """Ragged grouped-GEMM (megablox) path == dense path."""
    rng = jax.random.PRNGKey(9)
    S, E, dim, F = 64, 4, 128, 128
    params = make_params(rng, E, dim, F)
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask, w = random_routing(jax.random.fold_in(rng, 2), S, E)
    got = D.moe_ffn_gmm(hidden, mask, w, params)
    want = D.moe_ffn_dense(hidden, mask, w, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gmm_budget_drops_overflow():
    rng = jax.random.PRNGKey(10)
    S, E, dim, F = 64, 2, 128, 128
    params = make_params(rng, E, dim, F)
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask = jnp.ones((S, E), dtype=jnp.int32)  # 128 assignments
    w = jnp.full((S, E), 0.5)
    got = D.moe_ffn_gmm(hidden, mask, w, params, assignment_budget=128)
    want = D.moe_ffn_dense(hidden, mask, w, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_compress_decompress_round_trip():
    """decompress∘compress == mask-filtered identity (SURVEY §4 property;
    reference primitives utils/UniMoE_Audio_utils.py:436-523)."""
    rng = np.random.default_rng(11)
    S, E, M = 20, 3, 5
    mask = jnp.asarray((rng.random((S, E)) > 0.5).astype(np.int32))
    A = jnp.asarray(rng.normal(size=(S, E, M)).astype(np.float32))
    cap = int(np.asarray(mask.sum(0)).max())
    packed = D.compress_matrix(A, mask, force_dim=cap)
    assert packed.shape == (cap, E, M)
    back = np.asarray(D.decompress_matrix(packed, mask))
    want = np.asarray(A) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(back, want, rtol=1e-6)
    # 2-D variant (mask itself), force_dim larger than S
    packed2 = D.compress_matrix(mask.astype(jnp.float32), mask, force_dim=S + 7)
    back2 = np.asarray(D.decompress_matrix(packed2, mask))
    np.testing.assert_allclose(back2, np.asarray(mask, dtype=np.float32))


def _quantize_expert_params(params):
    from unimoe_audio_tpu.ops.quant import quantize_tensor

    return {k: quantize_tensor(v) for k, v in params.items()}


def test_a8_matches_bf16_within_quant_error():
    """packed_a8 == packed up to int8 activation-quant error (the a8 path
    changes only the projections' arithmetic, not dispatch/combine)."""
    rng = jax.random.PRNGKey(7)
    S, E, dim, F = 48, 4, 32, 64
    params = _quantize_expert_params(make_params(rng, E, dim, F))
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask, w = random_routing(jax.random.fold_in(rng, 2), S, E)

    base = D.moe_ffn_packed(hidden, mask, w, params, capacity=S)
    a8 = D.moe_ffn_packed(hidden, mask, w, params, capacity=S, a8=True)
    # int8 per-row activation quant: ~0.5% relative error per projection.
    err = np.abs(np.asarray(a8) - np.asarray(base))
    scale = np.abs(np.asarray(base)).mean() + 1e-6
    assert err.mean() / scale < 0.05, err.mean() / scale
    # and it must actually differ (the a8 path ran, not the fallback)
    assert err.max() > 0


def test_a8_falls_back_on_raw_weights():
    """a8 with unquantized (or group-wise) weights is exactly the bf16
    path — serving configs without QTensor experts stay untouched."""
    rng = jax.random.PRNGKey(8)
    S, E, dim, F = 24, 2, 16, 32
    params = make_params(rng, E, dim, F)
    hidden = jax.random.normal(jax.random.fold_in(rng, 1), (S, dim))
    mask, w = random_routing(jax.random.fold_in(rng, 2), S, E)

    base = D.moe_ffn_packed(hidden, mask, w, params, capacity=S)
    a8 = D.moe_ffn_packed(hidden, mask, w, params, capacity=S, a8=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(a8))


def test_a8_block_mode_suffix_and_training_guard():
    """dcmoe_block accepts 'packed_a8' and rejects it under training."""
    from unimoe_audio_tpu.config import tiny_test_config
    from unimoe_audio_tpu.moe.block import dcmoe_block, init_dcmoe_params

    cfg = tiny_test_config(num_hidden_layers=1).text_config
    rng = jax.random.PRNGKey(9)
    params = init_dcmoe_params(rng, cfg)
    params["dynamic"] = _quantize_expert_params(params["dynamic"])
    params["fixed"] = _quantize_expert_params(params["fixed"])
    x = jax.random.normal(jax.random.fold_in(rng, 1),
                          (2, 6, cfg.hidden_size), dtype=jnp.bfloat16)

    base = dcmoe_block(params, x, cfg, dispatch_mode="packed", capacity=12)
    a8 = dcmoe_block(params, x, cfg, dispatch_mode="packed_a8", capacity=12)
    # Router outputs are untouched by a8 (same gate math).
    np.testing.assert_array_equal(np.asarray(base.expert_mask),
                                  np.asarray(a8.expert_mask))
    d = np.abs(np.asarray(a8.hidden_states, np.float32)
               - np.asarray(base.hidden_states, np.float32))
    s = np.abs(np.asarray(base.hidden_states, np.float32)).mean() + 1e-6
    assert d.mean() / s < 0.1, d.mean() / s

    with pytest.raises(ValueError, match="serving-only"):
        dcmoe_block(params, x, cfg, dispatch_mode="packed_a8", capacity=12,
                    training=True, rng=rng)
