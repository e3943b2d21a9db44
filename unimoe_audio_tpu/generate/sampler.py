"""Token sampling for codec-frame decoding.

Port of _sample_next_token (reference: utils/UniMoE_Audio_model.py:873-916):
temperature → EOS-unless-top suppression → top-k → top-p (nucleus) →
categorical sample, applied per (batch × channel) row, fully in-jit via
jax.random (replacing torch.multinomial).  temperature/top_p are dynamic
(traced) scalars so changing them never recompiles; top_k and the EOS id
are static.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def topk_threshold_bisect(x: jnp.ndarray, k: int, iters: int = 40) -> jnp.ndarray:
    """Per-row value `lo` such that `x >= lo` is exactly the top-k set.

    lax.top_k lowers to a V-wide sort (~0.52 ms/step at B=88 decode
    shapes); when only the top-k SET is needed (not the sorted order), a
    bit-converged bisection on the k-th value costs <0.1 ms.  `iters`
    halvings of the [row min, row max] interval maintain the invariant
    count(x >= lo) >= k > count(x >= hi), so lo lands within float ulp of
    the k-th largest value and `x >= lo` is the exact top-k set — exact
    fp ties at the threshold all stay in (the reference's torch.topk
    breaks such ties arbitrarily; at fp32 logit resolution real ties are
    measure-zero).  -inf entries (suppressed tokens) are never selected:
    the interval starts at the FINITE row minimum — seeding lo at -inf
    (or a -1e30 clamp) would leave the interval ~1e30 wide, far too wide
    for `iters` halvings to converge, and the threshold would keep
    everything.  x must be free of nan/+inf and have >= k finite entries
    per row.
    """
    lo = jnp.min(jnp.where(jnp.isfinite(x), x, jnp.inf),
                 axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * lo + 0.5 * hi
        ge = jnp.sum((x >= mid).astype(jnp.int32), -1, keepdims=True) >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def sample_next_token(
    rng: jax.Array,
    logits_NxV: jnp.ndarray,
    *,
    temperature: Union[float, jnp.ndarray],
    top_p: Union[float, jnp.ndarray],
    top_k: Optional[int],
    audio_eos_value: Optional[int],
) -> jnp.ndarray:
    """Sample one token per row.  Use greedy=argmax at the caller for
    temperature==0 (the reference's early-exit branch).

    temperature/top_p may be scalars or per-row [N] vectors (heterogeneous
    serving batches mix tasks with different sampling knobs).

    rng may be ONE key (one stream for the whole batch) or PER-ROW keys
    [N, 2] — per-row keys make each row's draw independent of the other
    rows' presence (per-request determinism in shared serving batches)."""
    per_row = rng.ndim == 2

    def draw(key, row_logits):
        if per_row:
            return jax.vmap(jax.random.categorical)(key, row_logits)
        return jax.random.categorical(key, row_logits, axis=-1)
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p = jnp.asarray(top_p, jnp.float32)
    if temperature.ndim == 1:
        temperature = temperature[:, None]
    if top_p.ndim == 1:
        top_p = top_p[:, None]
    logits = logits_NxV.astype(jnp.float32) / jnp.maximum(temperature, 1e-8)
    V = logits.shape[-1]

    if audio_eos_value is not None and audio_eos_value >= 0:
        # Suppress EOS unless it is already the top logit
        # (reference: utils/UniMoE_Audio_model.py:886-891).
        top_idx = jnp.argmax(logits, axis=-1)
        eos_not_top = top_idx != audio_eos_value
        eos_col = jnp.arange(V) == audio_eos_value
        suppress = eos_not_top[:, None] & eos_col[None, :]
        logits = jnp.where(suppress, NEG_INF, logits)

    if top_k is not None and top_k < V:
        def nucleus_path(lg):
            # Work entirely inside the top-k subset: tokens outside it are
            # masked regardless, and lax.top_k returns values sorted
            # descending — so the nucleus cumsum runs over k elements
            # instead of two full V-wide sorts.
            top_vals, top_ids = jax.lax.top_k(lg, top_k)  # sorted desc
            # softmax over the k kept values == the reference's
            # renormalized probabilities after the top-k mask.
            top_probs = jax.nn.softmax(top_vals, axis=-1)
            csum = jnp.cumsum(top_probs, axis=-1)
            keep = jnp.roll(csum <= top_p, 1, axis=-1).at[:, 0].set(True)
            keep = keep | (top_p >= 1.0)
            sub_logits = jnp.where(keep, top_vals, NEG_INF)
            choice = draw(rng, sub_logits)  # [N] in [0,k)
            return jnp.take_along_axis(top_ids, choice[:, None], axis=-1)[:, 0]

        def topk_only_path(lg):
            # top_p >= 1 (the serving defaults): the nucleus keeps the
            # whole top-k subset, so the sorted ORDER is unnecessary —
            # only the exact top-k SET, found sort-free by bisection
            # (see topk_threshold_bisect; -inf suppressed tokens are
            # excluded there).
            lo = topk_threshold_bisect(lg, top_k)
            # Same renormalized-softmax draw as the subset path: zeroing
            # everything below the threshold and sampling over V is
            # distribution-identical to sampling over the gathered top-k.
            return draw(rng, jnp.where(lg >= lo, lg, NEG_INF))

        return jax.lax.cond(
            jnp.all(top_p >= 1.0), topk_only_path, nucleus_path, logits)

    # No top-k: nucleus over the full vocabulary.
    probs = jax.nn.softmax(logits, axis=-1)
    order = jnp.argsort(-probs, axis=-1, stable=True)
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sorted_probs, axis=-1)
    # Token at sorted rank 0 always kept; rank i kept iff csum[i-1] <= p
    # (the reference's roll-by-one, utils/UniMoE_Audio_model.py:904-906).
    sorted_keep = jnp.roll(csum <= top_p, 1, axis=-1).at[:, 0].set(True)
    sorted_keep = sorted_keep | (top_p >= 1.0)
    keep = jnp.put_along_axis(
        jnp.zeros_like(sorted_keep), order, sorted_keep, axis=-1, inplace=False
    )
    logits = jnp.where(keep, logits, NEG_INF)

    return draw(rng, logits)
