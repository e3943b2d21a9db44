"""Pipeline-parallel forward: staged+microbatched execution over a 'pipe'
mesh axis must equal the single-device layer scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, text_model_forward
from unimoe_audio_tpu.parallel.pipeline import pipeline_forward


@pytest.mark.parametrize("stages,n_micro", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_matches_sequential(stages, n_micro):
    cfg = tiny_test_config(num_hidden_layers=4)
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    B, T = n_micro * 2, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, tc.hidden_size),
                          dtype=jnp.float32) * 0.1
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))

    want = text_model_forward(params, x, pos, tc).last_hidden_state

    mesh = Mesh(np.array(jax.devices()[:stages]), ("pipe",))
    got = pipeline_forward(
        params["layers"], params["norm"], x, pos, tc, mesh,
        n_micro=n_micro,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-5)


def test_pipeline_differentiable():
    cfg = tiny_test_config(num_hidden_layers=2)
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    B, T = 2, 4
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, tc.hidden_size)) * 0.1
    pos = jnp.broadcast_to(jnp.arange(T)[None, None], (3, B, T))

    def loss(lp):
        h = pipeline_forward(lp, params["norm"], x, pos, tc, mesh, n_micro=2)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(params["layers"])
    gmax = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0
