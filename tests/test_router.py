"""Router math tests vs a torch oracle of the reference semantics
(utils/UniMoE_Audio_core.py:94-193).  The oracle re-derives the math
independently (eval path: deterministic argmax mixer per top-k bucket)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from unimoe_audio_tpu.moe import router as R


def torch_dynamic_expert_selection(logits, top_p):
    scores = torch.softmax(logits, dim=-1)
    s_sorted, _ = torch.sort(scores, dim=-1, descending=True)
    csum = s_sorted.cumsum(dim=-1)
    k = (~(csum >= top_p)).sum(dim=-1) + 1
    return k


def torch_mixer_eval(scores, top_k, jitter_eps):
    """Eval-mode iterative mixer, one bucket (reference lines 94-154)."""
    masked_scores = scores.clone()
    mults, sels = [], []
    for _ in range(top_k):
        mask_logits_threshold, max_ind = masked_scores.max(dim=-1, keepdim=True)
        factor = scores.abs().clamp(min=mask_logits_threshold.abs())
        thr = ((mask_logits_threshold - scores) / factor) > (2 * jitter_eps)
        masked_gates = masked_scores.masked_fill(thr, float("-inf"))
        selected = max_ind
        probs = torch.softmax(masked_gates, dim=-1)
        mults.append(probs.gather(dim=-1, index=selected))
        sels.append(selected)
        masked_scores = torch.scatter(masked_scores, -1, selected, float("-inf"))
    return torch.cat(mults, dim=-1), torch.cat(sels, dim=-1)


def torch_block_routing(logits, top_p, jitter_eps):
    """The per-bucket group loop (reference lines 254-284) → weights & mask."""
    S, E = logits.shape
    top_k = torch_dynamic_expert_selection(logits, top_p)
    weights = torch.zeros(S, E, dtype=logits.dtype)
    mask = torch.zeros(S, E, dtype=torch.int32)
    for k in range(1, E + 1):
        idx = torch.nonzero(top_k == k, as_tuple=True)[0]
        if len(idx) == 0:
            continue
        m, s = torch_mixer_eval(logits[idx], k, jitter_eps)
        oh = torch.nn.functional.one_hot(s, num_classes=E).sum(dim=1)
        w = torch.zeros(len(idx), E, dtype=logits.dtype)
        w.scatter_(dim=-1, index=s, src=m)
        weights.index_add_(0, idx, w)
        mask.index_add_(0, idx, oh.to(mask.dtype))
    weights = weights / (weights.sum(dim=-1, keepdim=True) + 1e-6)
    return weights, mask, top_k


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_topk_selection_matches(seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(64, 9)).astype(np.float32)
    got = np.asarray(R.dynamic_expert_selection(jnp.asarray(logits), 0.7))
    want = torch_dynamic_expert_selection(torch.tensor(logits), 0.7).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,jeps", [(0, 0.01), (1, 0.01), (2, 0.1), (3, 0.0)])
def test_mixer_matches_reference_bucketed_loop(seed, jeps):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(96, 9)).astype(np.float32)
    top_k = np.asarray(R.dynamic_expert_selection(jnp.asarray(logits), 0.7))
    w, m = R.sparse_expert_mixer(
        jnp.asarray(logits), jnp.asarray(top_k), max_k=9, jitter_eps=jeps, training=False
    )
    w = np.asarray(w / (w.sum(-1, keepdims=True) + 1e-6))
    tw, tm, _ = torch_block_routing(torch.tensor(logits), 0.7, jeps)
    np.testing.assert_array_equal(np.asarray(m), tm.numpy())
    np.testing.assert_allclose(w, tw.numpy(), rtol=1e-5, atol=1e-6)


def test_global_routing_weight_matches():
    rng = np.random.default_rng(7)
    S, E_dyn, E = 32, 9, 11
    logits = rng.normal(size=(S, E)).astype(np.float32)
    mask = (rng.random((S, E)) > 0.5).astype(np.int32)
    mask[:, E_dyn:] = 1
    mask[:, 0] = 1  # ensure ≥1 dynamic selected
    rw = rng.random((S, E_dyn)).astype(np.float32)

    got = np.asarray(R.global_routing_weight(jnp.asarray(mask), jnp.asarray(logits), E_dyn, jnp.asarray(rw)))

    tl, tm, trw = torch.tensor(logits), torch.tensor(mask), torch.tensor(rw)
    gw = torch.softmax(tl.masked_fill(tm == 0, float("-inf")), dim=-1)
    dyn, fx = gw[:, :E_dyn], gw[:, E_dyn:]
    want = torch.cat([trw * dyn.sum(-1, keepdim=True), fx], dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_aux_loss_matches():
    rng = np.random.default_rng(11)
    S, E_dyn, E = 40, 9, 11
    logits = rng.normal(size=(S, E)).astype(np.float32)
    mask = (rng.random((S, E)) > 0.4).astype(np.int32)
    mask[:, E_dyn:] = 1
    mask[:, 1] = 1

    got = float(R.load_balancing_loss(jnp.asarray(mask), jnp.asarray(logits), E_dyn))

    tl, tm = torch.tensor(logits), torch.tensor(mask)
    gw = tl.masked_fill(tm == 0, torch.finfo(torch.float32).min)[:, :E_dyn].softmax(dim=-1)
    em = tm[:, :E_dyn].float()
    want = float((em.mean(0) * gw.mean(0)).sum() * E_dyn)
    assert abs(got - want) < 1e-5

    # Weighted variant (reference lines 381-385 with num_hidden_layers=1).
    abw = rng.integers(1, 5, size=S).astype(np.float32)
    got_w = float(R.load_balancing_loss(jnp.asarray(mask), jnp.asarray(logits), E_dyn, jnp.asarray(abw)))
    tw = torch.tensor(abw)[:, None].expand(S, E_dyn)
    tpe = (em * tw).sum(0) / tw.sum(0)
    ppe = (gw * tw).sum(0) / tw.sum(0)
    want_w = float((tpe * ppe).sum() * E_dyn)
    assert abs(got_w - want_w) < 1e-5


def test_mixer_gradient_matches_reference_estimator():
    """The autodiff gradient must equal the estimator the reference's custom
    autograd function implements manually (utils/UniMoE_Audio_core.py:82-91):

      dL/dscore_j = Σ_rounds  g_r · p_sel_r · (1[j=sel_r] - p_r[j])

    where p_r = softmax over that round's unmasked gates, g_r = upstream
    gradient at the selected slot, and mask_for_one is IGNORED in backward.
    """
    rng = np.random.default_rng(3)
    S, E = 16, 5
    logits = rng.normal(size=(S, E)).astype(np.float32)
    top_k = np.asarray(R.dynamic_expert_selection(jnp.asarray(logits), 0.7))
    upstream = rng.normal(size=(S, E)).astype(np.float32)
    key = jax.random.PRNGKey(0)

    def f(scores):
        res = R.sparse_expert_mixer(
            scores, jnp.asarray(top_k), max_k=E, jitter_eps=0.05,
            training=True, rng=key,
        )
        return jnp.sum(res.routing_weights * upstream)

    grad = np.asarray(jax.grad(f)(jnp.asarray(logits)))

    # Capture the per-round internals from an identical forward pass.
    _, internals = R.sparse_expert_mixer(
        jnp.asarray(logits), jnp.asarray(top_k), max_k=E, jitter_eps=0.05,
        training=True, rng=key, return_internals=True,
    )
    sels = np.asarray(internals["selections"])      # [K, S]
    gmask = np.asarray(internals["gate_masks"])     # [K, S, E]
    active = np.asarray(internals["active"])        # [K, S]

    want = np.zeros_like(logits)
    for r in range(E):
        for s in range(S):
            if not active[r, s]:
                continue
            masked = np.where(gmask[r, s], -np.inf, logits[s])
            p = np.exp(masked - masked.max())
            p = p / p.sum()
            sel = sels[r, s]
            g = upstream[s, sel] * p[sel]
            want[s] += g * (np.eye(E)[sel] - p)
    np.testing.assert_allclose(grad, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed,jeps", [(0, 0.05), (1, 0.0), (2, 0.01), (3, 0.3)])
def test_eval_mixer_closed_form_matches_scan(seed, jeps):
    """sparse_expert_mixer_eval (one-sort closed form, the decode fast path)
    == sparse_expert_mixer(training=False) in value AND gradient."""
    S, E = 64, 8
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(S, E)).astype(np.float32) * 2.0
    # include exact ties to exercise stable tie-breaking
    logits[0, :4] = 1.5
    logits[1, :] = 0.0
    top_k = rng.integers(1, E + 1, size=(S,)).astype(np.int32)

    scan_res = R.sparse_expert_mixer(
        jnp.asarray(logits), jnp.asarray(top_k), max_k=E, jitter_eps=jeps,
        training=False,
    )
    fast_res = R.sparse_expert_mixer_eval(
        jnp.asarray(logits), jnp.asarray(top_k), jitter_eps=jeps,
    )
    np.testing.assert_array_equal(
        np.asarray(scan_res.expert_mask), np.asarray(fast_res.expert_mask)
    )
    np.testing.assert_allclose(
        np.asarray(scan_res.routing_weights),
        np.asarray(fast_res.routing_weights), rtol=1e-5, atol=1e-6,
    )

    upstream = rng.normal(size=(S, E)).astype(np.float32)

    def loss(fn):
        def f(x):
            res = fn(x)
            return jnp.sum(res.routing_weights * upstream)
        return f

    g_scan = jax.grad(loss(lambda x: R.sparse_expert_mixer(
        x, jnp.asarray(top_k), max_k=E, jitter_eps=jeps, training=False)))(
        jnp.asarray(logits))
    g_fast = jax.grad(loss(lambda x: R.sparse_expert_mixer_eval(
        x, jnp.asarray(top_k), jitter_eps=jeps)))(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_scan), np.asarray(g_fast), rtol=1e-4, atol=1e-6
    )
