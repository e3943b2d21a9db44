"""Host-offloaded AdamW: fp32 Adam moments resident in TPU-host memory.

The reference trains under DeepSpeed ZeRO-2 with CPU offload of the
partitioned optimizer state (reference:
UniMoEV2-Preview/deepspeed_zero2.conf:23-37 "offload_optimizer: cpu").
The TPU-native equivalent uses JAX memory kinds: mu/nu live in
`pinned_host` memory on the TPU server (NOT the client — transfers ride
the server's PCIe at ~6.5 GB/s effective round trip, measured), and the
update step streams them through the device chunk by chunk.

This is what lets flagship-WIDTH models 3-4x deeper than the on-device
Adam limit train on a single 16 GB v5e chip: device residency drops to
bf16 params + bf16 grads (4 bytes/param) + one chunk of fp32 moments in
flight, instead of 12 bytes/param with device-resident fp32 moments.

Moments are stored CHUNKED: each large leaf's mu/nu is a list of host
arrays split along dim 0 (the stacked-L dim for layer leaves), sized by
`chunk_bytes`.  The update never slices or concatenates host arrays —
each chunk round-trips the device independently and asynchronously, so
XLA overlaps PCIe in/out streams with compute.

Step structure (two phases, mirroring DeepSpeed's engine step):
  1. `fwd_bwd` — ONE jitted loss+grad program (remat inside).
  2. `apply`   — per-chunk jitted AdamW updates; grads are freed leaf by
     leaf as they are consumed.

AdamW math matches optax.adamw bit-for-bit in fp32 (equality-tested in
tests/test_offload.py): global-norm clip -> scale_by_adam with bias
correction -> decoupled weight decay (norms/biases exempt) -> schedule
lr.  Non-finite loss/grad-norm skips the whole apply phase (the
reference's nan/inf filter + overflow skip, moe_trainer.py:664-669).
"""

from __future__ import annotations

from typing import Callable, Dict, List, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UniMoEAudioConfig


def host_sharding():
    """A pinned_host NamedSharding (replicated, single-axis mesh over the
    default devices).  None when the backend has no pinned_host space
    (virtual CPU meshes in tests fall back to device-resident moments —
    the math and chunking still run identically)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    try:
        kinds = {m.kind for m in jax.devices()[0].addressable_memories()}
    except Exception:
        kinds = set()
    if "pinned_host" not in kinds:
        return None
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("_off",))
    s = NamedSharding(mesh, P(), memory_kind="pinned_host")
    try:
        # Functional probe: the CPU backend lists pinned_host but lacks the
        # device-placement custom call — a jitted placement must actually run.
        jax.block_until_ready(jax.jit(lambda: jnp.zeros((1,), jnp.float32),
                                      out_shardings=s)())
    except Exception:
        return None
    return s


def _is_decay(path) -> bool:
    """Decay mask matching train/step.make_optimizer (no decay on
    norms/biases)."""
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    return not any(s in name for s in ("layernorm", "norm", "_b", "/b"))


def _chunk_bounds(shape, chunk_bytes: int) -> List[Tuple[int, int]]:
    """Split dim 0 so each chunk's fp32 bytes stay under chunk_bytes."""
    if not shape:
        return [(0, 1)]
    nbytes = int(np.prod(shape)) * 4
    L = shape[0]
    n = int(min(L, max(1, -(-nbytes // chunk_bytes))))
    bounds = np.linspace(0, L, n + 1).astype(int)
    return [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:])]


class OffloadState(NamedTuple):
    params: Dict
    mu: Dict          # per-leaf: List[host fp32 chunks]
    nu: Dict
    count: jnp.ndarray
    step: jnp.ndarray


class OffloadAdamW:
    """AdamW with host-resident fp32 moments, chunked device streaming."""

    def __init__(
        self,
        *,
        learning_rate: Union[Callable, float],
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        chunk_bytes: int = 512 << 20,
        moment_dtype: str = "float32",
    ):
        if moment_dtype not in ("float32", "int8"):
            raise ValueError(f"moment_dtype must be float32|int8, got {moment_dtype}")
        self.lr = learning_rate if callable(learning_rate) else (lambda c: learning_rate)
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip
        self.chunk_bytes = chunk_bytes
        # 'int8': moments stream as blockwise log-quantized codes + absmax
        # (train/qmoment.py) — 4x less PCIe per chunk; stochastic rounding
        # keyed on (count, chunk) keeps runs deterministic.
        self.moment_format = moment_dtype
        self._update_jit: Dict[bool, Callable] = {}
        self.host = host_sharding()

    # -- init ------------------------------------------------------------
    def init_state(self, params: Dict) -> OffloadState:
        """fp32 zero moment chunks, created on device (eager zeros — no
        per-chunk compiles) and device_put straight into host memory;
        device transient = one chunk."""
        host = self.host

        int8 = self.moment_format == "int8"
        if int8:
            from .qmoment import BLOCK, padded_len

        def zeros_chunks(p):
            # Moments are stored FLAT (1-D) per chunk: AdamW is elementwise,
            # and flat chunks let leaves with equal element counts share one
            # compiled update program (e.g. all per-layer expert chunks).
            rest = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            out = []
            for a, b in _chunk_bounds(p.shape, self.chunk_bytes):
                n = (b - a) * rest if p.ndim else 1
                if int8:
                    npad = padded_len(n)
                    z = {"q": jnp.zeros((npad,), jnp.uint8),
                         "s": jnp.zeros((npad // BLOCK,), jnp.float32)}
                else:
                    z = jnp.zeros((n,), jnp.float32)
                if host is not None:
                    z = jax.tree.map(lambda x: jax.device_put(x, host), z)
                out.append(z)
                del z
            return out

        mu = jax.tree.map(zeros_chunks, params)
        nu = jax.tree.map(zeros_chunks, params)
        return OffloadState(params=params, mu=mu, nu=nu,
                            count=jnp.zeros((), jnp.int32),
                            step=jnp.zeros((), jnp.int32))

    # -- per-chunk update -------------------------------------------------
    def _update_fn(self, is_decay: bool):
        if is_decay in self._update_jit:
            return self._update_jit[is_decay]
        host = self.host
        b1, b2, eps = self.b1, self.b2, self.eps
        wd = self.weight_decay if is_decay else 0.0
        int8 = self.moment_format == "int8"
        if int8:
            from .qmoment import dequantize_blockwise, padded_len, quantize_blockwise

        def update(p, g, mu_h, nu_h, scale, count, lr, qkey):
            # p/g arrive in their natural (chunk) shape; moments are flat
            # (int8: {'q','s'} code/absmax pairs).  The flatten happens
            # INSIDE the program (fused, no eager temp copies) and new_p
            # returns in p's shape.
            if host is not None:
                from jax.sharding import NamedSharding

                dev_s = NamedSharding(host.mesh, host.spec)
                put_d = lambda t: jax.tree.map(
                    lambda x: jax.device_put(x, dev_s), t)
                mu, nu = put_d(mu_h), put_d(nu_h)
            else:
                mu, nu = mu_h, nu_h
            g32 = g.reshape(-1).astype(jnp.float32) * scale
            n = g32.shape[0]
            if int8:
                mu = dequantize_blockwise(mu["q"], mu["s"], signed=True)[:n]
                nu = dequantize_blockwise(nu["q"], nu["s"], signed=False)[:n]
            mu = b1 * mu + (1 - b1) * g32
            nu = b2 * nu + (1 - b2) * g32 * g32
            c = count.astype(jnp.float32)
            mu_hat = mu / (1 - b1 ** c)
            nu_hat = nu / (1 - b2 ** c)
            upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
            p32 = p.reshape(-1).astype(jnp.float32)
            if wd:
                upd = upd + wd * p32
            new_p = (p32 - lr * upd).astype(p.dtype).reshape(p.shape)
            if int8:
                pad = padded_len(n) - n
                mq, ms = quantize_blockwise(
                    jnp.pad(mu, (0, pad)), signed=True,
                    key=jax.random.fold_in(qkey, 0))
                vq, vs = quantize_blockwise(
                    jnp.pad(nu, (0, pad)), signed=False,
                    key=jax.random.fold_in(qkey, 1))
                mu = {"q": mq, "s": ms}
                nu = {"q": vq, "s": vs}
            if host is not None:
                put_h = lambda t: jax.tree.map(
                    lambda x: jax.device_put(x, host), t)
                mu, nu = put_h(mu), put_h(nu)
            return new_p, mu, nu

        fn = jax.jit(update, donate_argnums=(0, 1, 2, 3))
        self._update_jit[is_decay] = fn
        return fn

    # -- warmup -----------------------------------------------------------
    def precompile(self, params: Dict, max_workers: int = 8) -> int:
        """Compile every (chunk signature, decay-class) update program
        concurrently.  XLA compilation releases the GIL, so a thread pool
        turns ~14 serial remote-compile round trips (the dominant one-time
        cost of the first step) into a couple of parallel batches.
        Returns the number of distinct programs compiled."""
        from concurrent.futures import ThreadPoolExecutor

        host = self.host
        sigs = {}
        for path, p in jax.tree_util.tree_flatten_with_path(params)[0]:
            decay = _is_decay(path)
            rest = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            for a, b in _chunk_bounds(p.shape, self.chunk_bytes):
                cshape = ((b - a,) + tuple(p.shape[1:])) if p.ndim else ()
                n = (b - a) * rest if p.ndim else 1
                sigs[(cshape, str(p.dtype), decay)] = (cshape, p.dtype, n, decay)

        scale = jnp.float32(1.0)
        count = jnp.int32(1)
        lr = jnp.float32(0.0)

        int8 = self.moment_format == "int8"
        if int8:
            from .qmoment import BLOCK, padded_len
        qkey = jax.random.PRNGKey(0)

        def compile_one(sig):
            # Warm via a real call on donated dummies — guaranteed to land
            # in the jit dispatch cache (AOT lower/compile does not).
            cshape, dtype, n, decay = sig
            fn = self._update_fn(decay)
            p_d = jnp.zeros(cshape, dtype)
            g_d = jnp.zeros(cshape, dtype)
            if int8:
                npad = padded_len(n)
                m_d = {"q": jnp.zeros((npad,), jnp.uint8),
                       "s": jnp.zeros((npad // BLOCK,), jnp.float32)}
                nu_d = jax.tree.map(jnp.copy, m_d)
            else:
                m_d = jnp.zeros((n,), jnp.float32)
                nu_d = jnp.zeros((n,), jnp.float32)
            if host is not None:
                m_d = jax.tree.map(lambda x: jax.device_put(x, host), m_d)
                nu_d = jax.tree.map(lambda x: jax.device_put(x, host), nu_d)
            out = fn(p_d, g_d, m_d, nu_d, scale, count, lr, qkey)
            jax.block_until_ready(out)
            for x in jax.tree.leaves(out):
                x.delete()

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(compile_one, sigs.values()))
        return len(sigs)

    # -- apply ------------------------------------------------------------
    def apply(self, state: OffloadState, grads: Dict,
              grad_norm: jnp.ndarray) -> OffloadState:
        """One AdamW step.  CONSUMES `state` and `grads`: leaves are
        donated or explicitly deleted as processed (like a donated jit
        argument, the old state must not be reused), capping device
        residency at params + unconsumed grads + chunks in flight."""
        count = state.count + 1
        gnorm = jnp.maximum(grad_norm.astype(jnp.float32), 1e-12)
        scale = jnp.minimum(1.0, self.grad_clip / gnorm)
        # optax scale_by_schedule consumes the PRE-increment count.
        lr = jnp.asarray(self.lr(state.count), jnp.float32)
        # Stochastic-rounding base key: fixed seed x step count, folded with
        # a running chunk index inside the loop (deterministic on resume).
        qstep = jax.random.fold_in(jax.random.PRNGKey(0x8B17), state.count)
        chunk_no = 0

        flat_p, treedef = jax.tree_util.tree_flatten_with_path(state.params)
        flat_g = jax.tree_util.tree_leaves(grads)
        is_chunks = lambda x: isinstance(x, list)
        flat_mu = jax.tree_util.tree_leaves(state.mu, is_leaf=is_chunks)
        flat_nu = jax.tree_util.tree_leaves(state.nu, is_leaf=is_chunks)
        new_p, new_mu, new_nu = [], [], []
        for i in range(len(flat_p)):
            path, p = flat_p[i]
            g, mus, nus = flat_g[i], flat_mu[i], flat_nu[i]
            # Drop list references so consumed buffers free immediately —
            # device residency during apply stays ~params + unconsumed
            # grads + one chunk in flight.
            flat_p[i] = flat_g[i] = flat_mu[i] = flat_nu[i] = None
            fn = self._update_fn(_is_decay(path))
            bounds = _chunk_bounds(p.shape, self.chunk_bytes)
            assert len(bounds) == len(mus), "moment chunking drifted"
            if len(bounds) == 1:
                np_, nmu, nnu = fn(p, g, mus[0], nus[0], scale, count, lr,
                                   jax.random.fold_in(qstep, chunk_no))
                chunk_no += 1
                new_p.append(np_)
                new_mu.append([nmu]); new_nu.append([nnu])
            else:
                ps, nmu, nnu = [], [], []
                for (a, b), mu_c, nu_c in zip(bounds, mus, nus):
                    cp, cmu, cnu = fn(p[a:b], g[a:b], mu_c, nu_c,
                                      scale, count, lr,
                                      jax.random.fold_in(qstep, chunk_no))
                    chunk_no += 1
                    ps.append(cp)
                    nmu.append(cmu); nnu.append(cnu)
                # Originals were only sliced (not donated) — free them
                # deterministically before materializing the concat.
                p.delete()
                g.delete()
                new_p.append(jnp.concatenate(ps, axis=0))
                new_mu.append(nmu); new_nu.append(nnu)
                del ps
            del p, g, mus, nus
        unflat_p = jax.tree_util.tree_unflatten(treedef, new_p)
        unflat = lambda leaves: jax.tree_util.tree_unflatten(treedef, leaves)
        return OffloadState(
            params=unflat_p, mu=unflat(new_mu), nu=unflat(new_nu),
            count=count, step=state.step + 1,
        )


class OffloadTrainer:
    """Minimal two-phase training driver around OffloadAdamW for
    single-chip deep-model training (the Trainer class covers the
    standard optax path; this one exists for models whose fp32 moments
    exceed device HBM — the reference's ZeRO-2 CPU-offload regime)."""

    def __init__(self, cfg: UniMoEAudioConfig, params: Dict,
                 opt: OffloadAdamW, *, dispatch_mode: str = "dense",
                 capacity: Optional[int] = None, remat: bool = True):
        from .step import loss_fn

        self.cfg = cfg
        self.opt = opt
        self.state = opt.init_state(params)

        def fwd_bwd(params, batch, rng, aux_w):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                params, cfg, batch, rng, aux_w,
                dispatch_mode=dispatch_mode, capacity=capacity, remat=remat,
            )
            gnorm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree.leaves(grads)))
            metrics["grad_norm"] = gnorm
            return grads, gnorm, metrics

        self._fwd_bwd = jax.jit(fwd_bwd)

    def train_step(self, batch: Dict, rng: jax.Array,
                   aux_weight: Optional[float] = None) -> Dict[str, float]:
        from .step import aux_weight_at_step

        aux_w = (aux_weight_at_step(self.cfg, self.state.step)
                 if aux_weight is None else jnp.float32(aux_weight))
        step_rng = jax.random.fold_in(rng, int(self.state.step))
        grads, gnorm, metrics = self._fwd_bwd(
            self.state.params, batch, step_rng, aux_w)
        # One device_get for ALL metrics: each separate float(v) is a
        # ~30 ms tunnel round trip on the axon TPU.
        host_metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
        if not (np.isfinite(host_metrics["loss"])
                and np.isfinite(host_metrics["grad_norm"])):
            # Skip the whole apply phase (reference nan/inf filter).
            host_metrics["skipped"] = 1.0
            del grads
            return host_metrics
        self.state = self.opt.apply(self.state, grads, gnorm)
        host_metrics["skipped"] = 0.0
        return host_metrics
