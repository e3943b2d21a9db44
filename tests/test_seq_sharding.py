"""Activation sequence sharding: constraining hidden states over the
sequence dim (Megatron-SP style) must compile with collectives inserted by
GSPMD and leave numerics unchanged."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, text_model_forward


def test_seq_sharded_forward_matches_unsharded():
    cfg = tiny_test_config()
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, T = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, tc.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))

    want = text_model_forward(params, x, pos, tc).last_hidden_state

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    hs = NamedSharding(mesh, P("data", "model", None))  # B over data, T over model

    @jax.jit
    def fwd(p, x):
        return text_model_forward(
            p, x, pos, tc, hidden_sharding=hs
        ).last_hidden_state

    got = fwd(params, jax.device_put(x, NamedSharding(mesh, P("data", None, None))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)
