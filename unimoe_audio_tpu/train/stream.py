"""Layer-streamed full-flagship training: params AND optimizer state on the host.

The reference's deepest offload regime is DeepSpeed ZeRO-2 with BOTH
`offload_optimizer` and `offload_param` set to cpu (reference:
UniMoEV2-Preview/deepspeed_zero2.conf:23-37).  train/offload.py covers the
optimizer half (fp32 Adam moments in TPU-host pinned memory); this module
adds the parameter half: bf16 decoder-layer weights ALSO live in
`pinned_host` memory, and each training step streams ONE layer at a time
through the device —

  forward:  layer weights h2d (prefetched one ahead) -> layer compute ->
            save the [B, T, D] boundary activation, free the weights;
  backward: layer weights h2d again -> within-layer recompute
            (jax.checkpoint'd vjp) -> layer grads d2h, free everything;
  update:   per-layer AdamW programs stream (params, grads, mu, nu) in and
            (params, mu, nu) out of host memory with full buffer donation.

Device residency is bounded by outer params (embeddings/heads) + L
boundary activations + 2 layers of weights (current + prefetch) + 1 layer
of grads, INDEPENDENT OF DEPTH — which is what lets the full 36-layer
~6.9B-param flagship train on a single 16 GB chip (bench.py
--stream-train).  XLA's async dispatch overlaps the PCIe streams with
compute; no explicit double-buffer machinery is needed beyond issuing the
next layer's device_put before dispatching the current layer's work.

AdamW math matches train/offload.OffloadAdamW (itself equality-tested
against optax.adamw): global-norm clip -> bias-corrected Adam ->
decoupled weight decay (norms/biases exempt) -> schedule lr.  A
non-finite loss or grad norm skips the whole update phase (the
reference's nan/inf filter + DeepSpeed overflow skip,
moe_trainer.py:664-669).  Outer params (embeddings, final norm, heads)
stay device-resident in bf16 with host-offloaded moments via
OffloadAdamW.

Scope: text+codec training (the flagship audio regime).  Vision-tower and
PEFT training run through train.Trainer / train.OffloadTrainer;
sliding-window attention layers are not supported here.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TextMoEConfig, UniMoEAudioConfig
from ..models.layers import attention, compute_mrope, init_attention_params, rms_norm
from ..models.model import calculate_input_embedding
from ..moe.block import dcmoe_block, init_dcmoe_params
from .offload import OffloadAdamW, _is_decay, host_sharding
from .step import aux_weight_at_step


def layer_apply(
    lp: Dict,
    h: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cfg: TextMoEConfig,
    *,
    kv_valid_mask: Optional[jnp.ndarray],
    padding_token_mask: Optional[jnp.ndarray],
    aux_balance_weight: Optional[jnp.ndarray],
    rng: Optional[jax.Array],
    training: bool = True,
    dispatch_mode: str = "dense",
    capacity: Optional[int] = None,
    use_flash: Optional[bool] = None,
):
    """One decoder layer: pre-norm attention + pre-norm DCMoE with residuals.

    The exact per-layer math of models.model.text_model_forward's scan body
    on the no-cache path (reference: utils/UniMoE_Audio_model.py:193-256),
    factored out so the stream trainer can run layers one at a time.
    Forward parity with the scanned stack is asserted in
    tests/test_stream.py.  Returns (h, aux_loss, mean_top_k).
    """
    residual = h
    hn = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
    attn_out, _ = attention(
        lp["attn"], hn, cos, sin, cfg,
        kv_valid_mask=kv_valid_mask, use_flash=use_flash,
    )
    h = residual + attn_out
    residual = h
    hn = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    moe_out = dcmoe_block(
        lp["moe"], hn, cfg,
        padding_token_mask=padding_token_mask,
        aux_balance_weight=aux_balance_weight,
        training=training,
        rng=rng if training else None,
        dispatch_mode=dispatch_mode,
        capacity=capacity,
    )
    h = residual + moe_out.hidden_states
    return h, moe_out.aux_loss, jnp.mean(moe_out.router_top_k.astype(jnp.float32))


def init_layer_params(key: jax.Array, tc: TextMoEConfig, dtype=jnp.bfloat16) -> Dict:
    """One layer's params (NO leading [L] axis) — same distributions as
    models.model.init_model_params' per-layer init."""
    k1, k2 = jax.random.split(key)
    D = tc.hidden_size
    return {
        "input_layernorm": jnp.ones((D,), dtype=dtype),
        "post_attention_layernorm": jnp.ones((D,), dtype=dtype),
        "attn": init_attention_params(k1, tc, dtype),
        "moe": init_dcmoe_params(k2, tc, dtype),
    }


class StreamTrainer:
    """Depth-independent-memory trainer: host-resident layer params +
    host-resident fp32 moments, streamed per layer through the device."""

    def __init__(
        self,
        cfg: UniMoEAudioConfig,
        params: Optional[Dict] = None,
        *,
        rng: Optional[jax.Array] = None,
        learning_rate: Union[Callable, float] = 1e-4,
        b1: float = 0.9,
        b2: float = 0.999,
        eps: float = 1e-8,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        dispatch_mode: str = "dense",
        capacity: Optional[int] = None,
        use_flash: Optional[bool] = None,
        train_lm_head: bool = False,
        param_dtype=jnp.bfloat16,
        restore_dir: Optional[str] = None,
        moment_dtype: str = "float32",
    ):
        tc = cfg.text_config
        if tc.has_sliding_layers:
            raise ValueError("StreamTrainer does not support sliding-window layers")
        if moment_dtype not in ("float32", "int8"):
            raise ValueError(f"moment_dtype must be float32|int8, got {moment_dtype}")
        self.cfg = cfg
        self.tc = tc
        self.L = tc.num_hidden_layers
        self.lr = learning_rate if callable(learning_rate) else (lambda c: learning_rate)
        self.b1, self.b2, self.eps = b1, b2, eps
        self.weight_decay = weight_decay
        self.grad_clip = grad_clip
        self.dispatch_mode = dispatch_mode
        self.capacity = capacity
        self.use_flash = use_flash
        self.train_lm_head = train_lm_head
        # Layer-moment storage format: 'int8' stores blockwise log-quantized
        # codes + per-block absmax (train/qmoment.py), quartering the
        # update phase's dominant fp32-moment PCIe round trip.  Outer
        # (embedding/head) moments stay fp32 through OffloadAdamW — they
        # are ~2% of the flagship's moment bytes.
        self.moment_format = moment_dtype
        self.host = host_sharding()
        self._count = 0          # applied (non-skipped) steps
        self._layer_update_jit = None
        self._jits: Dict[str, Callable] = {}

        # ---- storage ----------------------------------------------------
        restored_meta = None
        if restore_dir is not None:
            restored_meta = self._load_from_dir(restore_dir, param_dtype)
            outer = restored_meta["outer"]
        elif params is not None:
            # Split a full (layer-stacked) pytree: layers -> host, rest on
            # device.  Intended for tests / small models — materializing
            # the full stack needs the whole model to fit at once; deep
            # runs should pass params=None + rng for direct-to-host init.
            layers = params["layers"]
            self.layers_host: List[Dict] = []
            for l in range(self.L):
                lp = jax.tree.map(lambda x: x[l], layers)
                self.layers_host.append(self._to_host(lp))
            # Copy outer leaves: the caller may hand the same pytree to
            # another optimizer whose donating update would otherwise
            # delete OUR buffers out from under us.
            outer = {k: jax.tree.map(jnp.array, v)
                     for k, v in params.items() if k != "layers"}
        else:
            if rng is None:
                raise ValueError("params=None requires rng for random init")
            keys = jax.random.split(rng, self.L + 1)
            init_l = jax.jit(
                lambda k: init_layer_params(k, tc, param_dtype))
            self.layers_host = []
            for l in range(self.L):
                lp = init_l(keys[l])
                jax.block_until_ready(lp)
                self.layers_host.append(self._to_host(lp))
                if self.host is not None:
                    # Free the device copy; the host copy is authoritative.
                    jax.tree.map(lambda x: x.delete(), lp)
            outer = jax.jit(lambda k: self._init_outer(k, param_dtype))(keys[-1])
        # Outer params: device-resident bf16, host-offloaded moments.
        if restored_meta is None:
            self.static_outer: Dict = {}
            if not train_lm_head and "lm_head" in outer:
                # Without text labels the lm_head receives no gradient
                # signal; keep it frozen (no moments, no decay) rather than
                # streaming 5 GB of dead moment traffic per step.
                self.static_outer["lm_head"] = outer.pop("lm_head")
            if "vision" in outer:
                self.static_outer["vision"] = outer.pop("vision")
        self.outer_opt = OffloadAdamW(
            learning_rate=self.lr, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, grad_clip=grad_clip)
        self.outer_state = self.outer_opt.init_state(outer)
        if restored_meta is not None and restored_meta["omu"] is not None:
            st = self.outer_state
            mu_def = jax.tree.structure(st.mu)
            put = (lambda x: jax.device_put(jnp.asarray(x), self.host)
                   ) if self.host is not None else jnp.asarray
            self.outer_state = st._replace(
                mu=jax.tree.unflatten(
                    mu_def, [put(x) for x in restored_meta["omu"]]),
                nu=jax.tree.unflatten(
                    mu_def, [put(x) for x in restored_meta["onu"]]),
                count=jnp.int32(restored_meta["count"]))
        elif restored_meta is not None:
            # Optimizer-less checkpoint: moments stay zero but the LR
            # schedule position must still match the resumed step —
            # otherwise outer params replay warmup while layers resume.
            self.outer_state = self.outer_state._replace(
                count=jnp.int32(restored_meta["count"]))

        # Layer moments: host-resident, FLAT per leaf, same tree structure
        # as a layer's params (int8: each param leaf becomes a {'q','s'}
        # codes+absmax pair).  (Loaded from the checkpoint on restore.)
        if restored_meta is None:
            zeros_mom = self._zeros_moment
            self.mu: List[Dict] = []
            self.nu: List[Dict] = []
            for l in range(self.L):
                self.mu.append(jax.tree.map(zeros_mom, self.layers_host[l]))
                self.nu.append(jax.tree.map(zeros_mom, self.layers_host[l]))
                # Throttle: don't queue every layer's zero+transfer in HBM.
                jax.block_until_ready(jax.tree.leaves(self.nu[l]))

    # ------------------------------------------------------------------
    # checkpointing: one pickle per layer so client RAM stays bounded at
    # a single layer regardless of depth (the full-flagship checkpoint
    # with fp32 moments is ~3x model size; orbax would need the whole
    # pytree materialized at once).  Reference capability:
    # DeepSpeed ZeRO save_checkpoint with offloaded param/optimizer
    # partitions (moe_trainer.py:728 _maybe_log_save_evaluate).
    # ------------------------------------------------------------------
    def save(self, ckpt_dir: str, *, include_optimizer: bool = True) -> None:
        """Stream the checkpoint to disk layer by layer."""
        os.makedirs(ckpt_dir, exist_ok=True)
        for l in range(self.L):
            arrs = {f"p{i}": np.asarray(x)
                    for i, x in enumerate(jax.tree.leaves(self.layers_host[l]))}
            if include_optimizer:
                arrs.update({f"mu{i}": np.asarray(x)
                             for i, x in enumerate(jax.tree.leaves(self.mu[l]))})
                arrs.update({f"nu{i}": np.asarray(x)
                             for i, x in enumerate(jax.tree.leaves(self.nu[l]))})
            with open(os.path.join(ckpt_dir, f"layer_{l:03d}.pkl"), "wb") as f:
                pickle.dump(arrs, f, protocol=4)
            del arrs
        st = self.outer_state
        blob = {
            "params": {k: np.asarray(v) for k, v in st.params.items()},
            "static": jax.tree.map(np.asarray, self.static_outer),
            "count": int(self._count),
        }
        if include_optimizer:
            blob["mu"] = [np.asarray(x) for x in jax.tree.leaves(st.mu)]
            blob["nu"] = [np.asarray(x) for x in jax.tree.leaves(st.nu)]
        with open(os.path.join(ckpt_dir, "outer.pkl"), "wb") as f:
            pickle.dump(blob, f, protocol=4)
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump({"format": 1, "layers": self.L,
                       "count": int(self._count),
                       "optimizer": include_optimizer,
                       "moment_dtype": self.moment_format,
                       "train_lm_head": "lm_head" in st.params}, f)

    def _load_from_dir(self, d: str, param_dtype) -> Dict:
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)
        if meta["layers"] != self.L:
            raise ValueError(
                f"checkpoint has {meta['layers']} layers, config wants {self.L}")
        if meta["train_lm_head"] != self.train_lm_head:
            raise ValueError(
                f"checkpoint was saved with train_lm_head="
                f"{meta['train_lm_head']}; construct with the same setting")
        ck_mom = meta.get("moment_dtype", "float32")
        template = jax.eval_shape(
            lambda k: init_layer_params(k, self.tc, param_dtype),
            jax.random.PRNGKey(0))
        treedef = jax.tree.structure(template)
        n = treedef.num_leaves
        sizes = [int(np.prod(t.shape)) or 1 for t in jax.tree.leaves(template)]
        put = ((lambda x: jax.device_put(jnp.asarray(x), self.host))
               if self.host is not None else jnp.asarray)

        self.layers_host, self.mu, self.nu = [], [], []
        for l in range(self.L):
            with open(os.path.join(d, f"layer_{l:03d}.pkl"), "rb") as f:
                arrs = pickle.load(f)
            lp = jax.tree.unflatten(
                treedef, [put(arrs[f"p{i}"]) for i in range(n)])
            self.layers_host.append(lp)
            if meta["optimizer"]:
                self.mu.append(self._unflatten_moments(treedef, [
                    put(x) for x in self._moment_leaves_as_native(
                        arrs, "mu", ck_mom, sizes, signed=True)]))
                self.nu.append(self._unflatten_moments(treedef, [
                    put(x) for x in self._moment_leaves_as_native(
                        arrs, "nu", ck_mom, sizes, signed=False)]))
            else:
                self.mu.append(jax.tree.map(self._zeros_moment, lp))
                self.nu.append(jax.tree.map(self._zeros_moment, lp))
            # Throttle host-transfer queueing, as in random init.
            jax.block_until_ready(jax.tree.leaves(self.layers_host[l]))
        with open(os.path.join(d, "outer.pkl"), "rb") as f:
            blob = pickle.load(f)
        self.static_outer = jax.tree.map(jnp.asarray, blob["static"])
        self._count = int(blob["count"])
        return {"outer": {k: jnp.asarray(v) for k, v in blob["params"].items()},
                "omu": blob.get("mu"), "onu": blob.get("nu"),
                "count": int(blob["count"])}

    # ------------------------------------------------------------------
    def _zeros_moment(self, p):
        """Zero moment storage for one param leaf (shape may be a
        ShapeDtypeStruct).  Code 0 dequantizes to exactly 0, so int8 zero
        init matches fp32 zero init bit-for-bit."""
        n = int(np.prod(p.shape)) or 1
        if self.moment_format == "int8":
            from .qmoment import BLOCK, padded_len

            npad = padded_len(n)
            out = {"q": jnp.zeros((npad,), jnp.uint8),
                   "s": jnp.zeros((npad // BLOCK,), jnp.float32)}
        else:
            out = jnp.zeros((n,), jnp.float32)
        if self.host is not None:
            out = jax.tree.map(lambda x: jax.device_put(x, self.host), out)
        return out

    def _quant_key(self) -> jax.Array:
        """Stochastic-rounding base key for this step: a fixed seed folded
        with the applied-step count — independent of the user rng, so
        checkpoint-resume replays identically."""
        return jax.random.fold_in(jax.random.PRNGKey(0x8B17), self._count)

    def _moment_leaves_per_param(self) -> int:
        return 2 if self.moment_format == "int8" else 1

    def _moment_leaves_as_native(self, arrs, prefix, ck_mom, sizes, *,
                                 signed):
        """Flat saved moment leaves for one layer, converted to THIS
        trainer's moment format when the checkpoint was written in the
        other one (fp32 ↔ blockwise-int8 — see train/qmoment.py).
        Conversion uses round-to-nearest (a one-time requantization; the
        per-step stochastic rounding resumes from the converted codes).
        Returns the flat leaf list `_unflatten_moments` expects."""
        from .qmoment import dequantize_blockwise, padded_len, quantize_blockwise

        per_ck = 2 if ck_mom == "int8" else 1
        n = len(sizes)
        raw = [arrs[f"{prefix}{i}"] for i in range(n * per_ck)]
        if ck_mom == self.moment_format:
            return raw
        out = []
        if ck_mom == "float32":  # -> int8 codes+absmax
            for i, sz in enumerate(sizes):
                x = jnp.asarray(raw[i], jnp.float32)
                x = jnp.pad(x, (0, padded_len(sz) - sz))
                q, s = quantize_blockwise(x, signed=signed)
                out.extend([q, s])
        else:  # int8 -> float32
            for i, sz in enumerate(sizes):
                q, s = jnp.asarray(raw[2 * i]), jnp.asarray(raw[2 * i + 1])
                out.append(dequantize_blockwise(q, s, signed=signed)[:sz])
        return out

    def _unflatten_moments(self, treedef, leaves):
        """Rebuild a layer's moment tree from its flat saved leaves (q/s
        pairs for int8; one fp32 vector per param otherwise)."""
        if self.moment_format == "int8":
            leaves = [{"q": a, "s": b}
                      for a, b in zip(leaves[0::2], leaves[1::2])]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _to_host(self, tree):
        if self.host is None:
            return tree
        return jax.tree.map(lambda x: jax.device_put(x, self.host), tree)

    def _to_device(self, tree):
        if self.host is None:
            return tree
        from jax.sharding import NamedSharding

        dev = NamedSharding(self.host.mesh, self.host.spec)
        return jax.tree.map(lambda x: jax.device_put(x, dev), tree)

    def _init_outer(self, key, dtype):
        tc, cfg = self.tc, self.cfg
        D, V = tc.hidden_size, tc.vocab_size
        C, Vc = cfg.codec_channels, cfg.codec_embed_size
        std = tc.initializer_range
        ks = jax.random.split(key, 4)
        return {
            "embed_tokens": (jax.random.normal(ks[0], (V, D)) * std).astype(dtype),
            "norm": jnp.ones((D,), dtype=dtype),
            "lm_head": (jax.random.normal(ks[1], (D, V)) * D ** -0.5).astype(dtype),
            "codec_embed": (jax.random.normal(ks[2], (C, Vc, D)) * std).astype(dtype),
            "codec_head": (jax.random.normal(ks[3], (D, C * Vc)) * D ** -0.5).astype(dtype),
        }

    @property
    def step(self) -> int:
        return self._count

    # ------------------------------------------------------------------
    # jitted pieces (built lazily; jax.jit retraces per None-pattern of
    # the optional args, so each batch shape/field combination compiles
    # exactly once)
    # ------------------------------------------------------------------
    def _jit(self, name: str, fn: Callable, **kw) -> Callable:
        if name not in self._jits:
            self._jits[name] = jax.jit(fn, **kw)
        return self._jits[name]

    def _embed_fwd(self):
        cfg, tc = self.cfg, self.tc

        def f(ep, input_ids, codec_ids, attention_mask, position_ids, abw):
            emb = calculate_input_embedding(
                ep, input_ids, codec_ids, cfg.codec_placeholder_value)
            if position_ids is None:
                pos = jnp.cumsum(attention_mask, axis=-1) - 1
                pos = jnp.where(attention_mask == 0, 1, pos)
                position_ids = jnp.broadcast_to(
                    pos[None], (3,) + input_ids.shape)
            cos, sin = compute_mrope(
                position_ids, tc.head_dim, tc.rope_theta, tc.mrope_section)
            full_abw = attention_mask * abw if abw is not None else None
            return emb, cos, sin, full_abw

        return self._jit("embed_fwd", f)

    def _layer_fwd(self):
        tc = self.tc
        dm, cap, uf = self.dispatch_mode, self.capacity, self.use_flash

        def f(lp, h, cos, sin, mask, abw, rng):
            return layer_apply(
                lp, h, cos, sin, tc,
                kv_valid_mask=mask, padding_token_mask=mask,
                aux_balance_weight=abw, rng=rng, training=True,
                dispatch_mode=dm, capacity=cap, use_flash=uf)

        return self._jit("layer_fwd", f)

    def _layer_bwd(self, mode: str = "single"):
        """mode 'single': grads in param dtype (the one-micro-batch step).
        mode 'first'/'acc': fp32 grads for gradient accumulation — 'first'
        opens the running sum, 'acc' adds the previous sum (streamed back
        from the host) before the squared-norm so the LAST micro-batch's
        sq is the norm of the accumulated total."""
        tc = self.tc
        dm, cap, uf = self.dispatch_mode, self.capacity, self.use_flash

        def core(lp, h_in, g_out, cos, sin, mask, abw, rng, aux_cot):
            def fwd2(lp, h):
                h2, aux, _ = layer_apply(
                    lp, h, cos, sin, tc,
                    kv_valid_mask=mask, padding_token_mask=mask,
                    aux_balance_weight=abw, rng=rng, training=True,
                    dispatch_mode=dm, capacity=cap, use_flash=uf)
                return h2, aux

            _, vjp = jax.vjp(jax.checkpoint(fwd2), lp, h_in)
            g_lp, g_h = vjp((g_out, aux_cot))
            return g_h, g_lp

        def sq_of(g_lp):
            return sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                       for g in jax.tree.leaves(g_lp))

        if mode == "single":
            def f(lp, h_in, g_out, cos, sin, mask, abw, rng, aux_cot):
                g_h, g_lp = core(lp, h_in, g_out, cos, sin, mask, abw,
                                 rng, aux_cot)
                return g_h, g_lp, sq_of(g_lp)

            # h_in and g_out are both [B, T, D] like the g_h output — donate.
            return self._jit("layer_bwd", f, donate_argnums=(1, 2))
        if mode == "first":
            def f(lp, h_in, g_out, cos, sin, mask, abw, rng, aux_cot):
                g_h, g_lp = core(lp, h_in, g_out, cos, sin, mask, abw,
                                 rng, aux_cot)
                g_lp = jax.tree.map(lambda g: g.astype(jnp.float32), g_lp)
                return g_h, g_lp, sq_of(g_lp)

            return self._jit("layer_bwd_first", f, donate_argnums=(1, 2))
        assert mode == "acc"

        def f(lp, h_in, g_out, cos, sin, mask, abw, rng, aux_cot, g_prev):
            g_h, g_lp = core(lp, h_in, g_out, cos, sin, mask, abw,
                             rng, aux_cot)
            g_lp = jax.tree.map(
                lambda g, p: g.astype(jnp.float32) + p, g_lp, g_prev)
            return g_h, g_lp, sq_of(g_lp)

        return self._jit("layer_bwd_acc", f, donate_argnums=(1, 2, 9))

    def _head_loss(self, hp, h, codec_labels, labels, aux_sum, aux_w):
        """Head loss math shared by training (_head's value_and_grad) and
        the forward-only evaluate() path."""
        cfg, tc, L = self.cfg, self.tc, self.L
        from ..ops.quant import matmul as qmm

        def loss_of(hp, h, codec_labels, labels, aux_sum, aux_w):
            hn = rms_norm(h, hp["norm"], tc.rms_norm_eps)
            mean_aux = aux_sum / L
            loss = aux_w * mean_aux
            codec_loss = jnp.float32(0)
            if labels is not None:
                logits = qmm(hn, hp["lm_head"]).astype(jnp.float32)
                shift_logits = logits[:, :-1]
                shift_labels = labels[:, 1:]
                valid = shift_labels != -100
                safe = jnp.where(valid, shift_labels, 0)
                logp = jax.nn.log_softmax(shift_logits, axis=-1)
                nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
                lm_loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
                    jnp.sum(valid), 1)
                loss = loss + lm_loss
            if codec_labels is not None:
                # Per-channel shifted codec CE (models.model.model_forward).
                flat = qmm(hn, hp["codec_head"]).astype(jnp.float32)
                B, T = h.shape[:2]
                codec_logits = flat.reshape(
                    B, T, cfg.codec_channels, cfg.codec_embed_size)
                shift_logits = codec_logits[:, :-1]
                shift_labels = codec_labels[:, 1:]
                valid = shift_labels != -100
                safe_labels = jnp.where(valid, shift_labels, 0)
                logp = jax.nn.log_softmax(shift_logits, axis=-1)
                nll = -jnp.take_along_axis(
                    logp, safe_labels[..., None], axis=-1)[..., 0]
                nll = jnp.where(valid, nll, 0.0)
                per_channel = jnp.sum(nll, axis=(0, 1)) / jnp.maximum(
                    jnp.sum(valid, axis=(0, 1)), 1)
                codec_loss = jnp.sum(per_channel)
                loss = loss + codec_loss
            return loss, (codec_loss, mean_aux)

        return loss_of(hp, h, codec_labels, labels, aux_sum, aux_w)

    def _head(self):
        def f(hp, h, codec_labels, labels, aux_sum, aux_w):
            (loss, (codec_loss, mean_aux)), (g_hp, g_h) = jax.value_and_grad(
                self._head_loss, argnums=(0, 1), has_aux=True)(
                hp, h, codec_labels, labels, aux_sum, aux_w)
            sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(g_hp))
            return loss, codec_loss, mean_aux, g_hp, g_h, sq

        return self._jit("head", f, donate_argnums=(1,))

    def _embed_bwd(self):
        cfg = self.cfg

        def f(ep, input_ids, codec_ids, g_emb):
            def fwd(ep):
                return calculate_input_embedding(
                    ep, input_ids, codec_ids, cfg.codec_placeholder_value)

            _, vjp = jax.vjp(fwd, ep)
            (g_ep,) = vjp(g_emb)
            sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree.leaves(g_ep))
            return g_ep, sq

        return self._jit("embed_bwd", f, donate_argnums=(3,))

    def _layer_update(self):
        """ONE program per layer updating every leaf: params/grads/moments
        stream host->device, update in fp32, results stream back with full
        donation.  Same math as OffloadAdamW._update_fn; in int8 moment
        mode the codes dequantize after the h2d stream and requantize
        before the d2h stream (train/qmoment.py), so PCIe carries 1 byte
        + 1/2048 scale per moment instead of 4."""
        if self._layer_update_jit is not None:
            return self._layer_update_jit
        host = self.host
        b1, b2, eps, wd_all = self.b1, self.b2, self.eps, self.weight_decay
        int8 = self.moment_format == "int8"
        if int8:
            from .qmoment import dequantize_blockwise, padded_len, quantize_blockwise

        def update(lp, g, mu, nu, scale, count, lr, qkey):
            if host is not None:
                from jax.sharding import NamedSharding

                dev = NamedSharding(host.mesh, host.spec)
                put_d = lambda t: jax.tree.map(
                    lambda x: jax.device_put(x, dev), t)
                lp, g, mu, nu = put_d(lp), put_d(g), put_d(mu), put_d(nu)
            flat_p, treedef = jax.tree_util.tree_flatten_with_path(lp)
            flat_g = jax.tree.leaves(g)
            flat_mu = jax.tree.leaves(mu)
            flat_nu = jax.tree.leaves(nu)
            if int8:  # leaves come in ('q', 's') pairs per param
                flat_mu = list(zip(flat_mu[0::2], flat_mu[1::2]))
                flat_nu = list(zip(flat_nu[0::2], flat_nu[1::2]))
            c = count.astype(jnp.float32)
            new_p, new_mu, new_nu = [], [], []
            for i, ((path, p), gg, m, v) in enumerate(
                    zip(flat_p, flat_g, flat_mu, flat_nu)):
                wd = wd_all if _is_decay(path) else 0.0
                n_el = int(np.prod(p.shape)) or 1
                if int8:
                    m = dequantize_blockwise(m[0], m[1], signed=True)[:n_el]
                    v = dequantize_blockwise(v[0], v[1], signed=False)[:n_el]
                g32 = gg.reshape(-1).astype(jnp.float32) * scale
                m = b1 * m + (1 - b1) * g32
                v = b2 * v + (1 - b2) * g32 * g32
                mu_hat = m / (1 - b1 ** c)
                nu_hat = v / (1 - b2 ** c)
                upd = mu_hat / (jnp.sqrt(nu_hat) + eps)
                p32 = p.reshape(-1).astype(jnp.float32)
                if wd:
                    upd = upd + wd * p32
                new_p.append((p32 - lr * upd).astype(p.dtype).reshape(p.shape))
                if int8:
                    # Stochastic rounding keyed per (step, leaf): unbiased,
                    # and deterministic across checkpoint-resume.
                    pad = padded_len(n_el) - n_el
                    mq, ms = quantize_blockwise(
                        jnp.pad(m, (0, pad)), signed=True,
                        key=jax.random.fold_in(qkey, 2 * i))
                    vq, vs = quantize_blockwise(
                        jnp.pad(v, (0, pad)), signed=False,
                        key=jax.random.fold_in(qkey, 2 * i + 1))
                    new_mu.append({"q": mq, "s": ms})
                    new_nu.append({"q": vq, "s": vs})
                else:
                    new_mu.append(m)
                    new_nu.append(v)
            unflat = lambda leaves: jax.tree_util.tree_unflatten(treedef, leaves)
            out_p, out_mu, out_nu = unflat(new_p), unflat(new_mu), unflat(new_nu)
            if host is not None:
                put_h = lambda t: jax.tree.map(
                    lambda x: jax.device_put(x, host), t)
                out_p, out_mu, out_nu = put_h(out_p), put_h(out_mu), put_h(out_nu)
            return out_p, out_mu, out_nu

        self._layer_update_jit = jax.jit(update, donate_argnums=(0, 1, 2, 3))
        return self._layer_update_jit

    # -- outer-grad accumulation programs (gradient accumulation) -------
    def _outer_open(self):
        return self._jit(
            "outer_open",
            lambda g: jax.tree.map(lambda x: x.astype(jnp.float32), g))

    def _outer_acc(self):
        return self._jit(
            "outer_acc",
            lambda acc, g: jax.tree.map(
                lambda a, x: a + x.astype(jnp.float32), acc, g),
            donate_argnums=(0,))

    def _outer_sq(self):
        return self._jit(
            "outer_sq",
            lambda acc: sum(jnp.sum(jnp.square(a))
                            for a in jax.tree.leaves(acc)))

    def _outer_div(self):
        # The mean casts back to each param's dtype: OffloadAdamW.apply then
        # reuses the single-path update programs (same signatures — the
        # axon AOT compiler also rejects the fp32-grad variant with an
        # 'Unimplemented DMA' error, so don't hand it one).
        def f(acc, ref, n):
            return jax.tree.map(
                lambda a, p: (a / n).astype(p.dtype), acc, ref)

        return self._jit("outer_div", f, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _parse_batch(self, batch: Dict):
        input_ids = batch["input_ids"]
        mask = batch.get("attention_mask")
        if mask is None:
            mask = jnp.ones(input_ids.shape, jnp.int32)
        labels = batch.get("labels")
        codec_labels = batch.get("codec_labels")
        if labels is None and codec_labels is None:
            raise ValueError("batch needs labels and/or codec_labels")
        if labels is not None and "lm_head" not in self.outer_state.params:
            raise ValueError(
                "text labels require train_lm_head=True at construction")
        return (input_ids, batch.get("codec_input_ids"), mask, labels,
                codec_labels, batch.get("aux_balance_weight"),
                batch.get("position_ids"))

    def _stream_fwd(self, ep, input_ids, codec_ids, mask, position_ids, abw,
                    layer_rngs):
        """Forward: stream layers, save boundary activations.

        Throttling (the block_until_ready calls below): async dispatch
        otherwise outruns PCIe and queues EVERY layer's weight transfer
        at once — 11+ GB of HBM for the 36L flagship — and, in the
        update phase, a second host-side copy of all params+moments
        (host buffers cannot be donation-aliased).  Blocking one step
        behind keeps a depth-2 pipeline: layer l computes while layer
        l+1's weights stream in, and at most ~2 layers of buffers are
        in flight on either side of PCIe."""
        emb, cos, sin, full_abw = self._embed_fwd()(
            ep, input_ids, codec_ids, mask, position_ids, abw)
        fwd = self._layer_fwd()
        boundaries: List[jnp.ndarray] = []
        aux_sum = jnp.float32(0)
        topk_sum = jnp.float32(0)
        h = emb
        lp_dev = self._to_device(self.layers_host[0])
        for l in range(self.L):
            nxt = (self._to_device(self.layers_host[l + 1])
                   if l + 1 < self.L else None)
            boundaries.append(h)
            h, aux_l, topk_l = fwd(lp_dev, h, cos, sin, mask, full_abw,
                                   layer_rngs[l])
            aux_sum = aux_sum + aux_l
            topk_sum = topk_sum + topk_l
            del lp_dev
            lp_dev = nxt
            if l >= 1:
                jax.block_until_ready(boundaries[l])  # layer l-1 done
        return h, cos, sin, full_abw, boundaries, aux_sum, topk_sum

    def _stream_bwd(self, boundaries, g_h, cos, sin, mask, full_abw,
                    layer_rngs, aux_cot, mode, g_host):
        """Backward: stream layers in reverse, grads to host.

        mode 'single'/'first' writes fresh grads into g_host; 'acc'
        streams the previous fp32 sums back through the device and writes
        updated sums.  Returns (g at the embedding boundary, sum of the
        per-layer sq outputs — in 'acc' mode the squared norm of the
        RUNNING SUM, so the last micro-batch's value is the accumulated
        total's)."""
        L = self.L
        bwd = self._layer_bwd(mode)
        sq_layers = jnp.float32(0)
        lp_dev = self._to_device(self.layers_host[L - 1])
        for l in range(L - 1, -1, -1):
            nxt = self._to_device(self.layers_host[l - 1]) if l > 0 else None
            h_in = boundaries[l]
            boundaries[l] = None
            if mode == "acc":
                gp_dev = self._to_device(g_host[l])
                if self.host is not None:
                    # Free the host-side sums the moment their device copy
                    # lands: the pinned pool otherwise holds TWO fp32-sum
                    # generations in flight, and past ~40 GB of pinned
                    # allocations the d2h stream collapses to ~1.3 GB/s
                    # (measured at 36L flagship — the block also means no
                    # second-generation prefetch, a ~0.1 s/layer stall
                    # that is far cheaper than the collapse).
                    jax.block_until_ready(jax.tree.leaves(gp_dev))
                    for x in jax.tree.leaves(g_host[l]):
                        x.delete()
                g_host[l] = None
                g_h, g_lp, sq = bwd(lp_dev, h_in, g_h, cos, sin, mask,
                                    full_abw, layer_rngs[l], aux_cot, gp_dev)
                del gp_dev
            else:
                g_h, g_lp, sq = bwd(lp_dev, h_in, g_h, cos, sin, mask,
                                    full_abw, layer_rngs[l], aux_cot)
            g_host[l] = self._to_host(g_lp)
            del g_lp
            sq_layers = sq_layers + sq
            del lp_dev
            lp_dev = nxt
            if l + 1 < L:
                jax.block_until_ready(
                    jax.tree.leaves(g_host[l + 1])[0])  # layer l+1 done
        return g_h, sq_layers

    # ------------------------------------------------------------------
    def train_step(self, batch: Union[Dict, List[Dict]], rng: jax.Array,
                   aux_weight: Optional[float] = None) -> Dict[str, float]:
        """One streamed training step.  Returns host metrics.

        `batch` may be a single batch dict or a sequence of micro-batch
        dicts (gradient accumulation, the reference's
        gradient_accumulation_steps flag, script/training.sh:56): each
        micro-batch runs a full streamed forward/backward, fp32 gradient
        SUMS accumulate in host memory, and ONE update phase applies the
        clipped MEAN gradient — the ~4 GB/layer params+moments PCIe round
        trip is paid once per applied step instead of once per
        micro-batch, and the effective batch grows without growing the
        [B, T, D] boundary-activation footprint."""
        if isinstance(batch, (list, tuple)):
            if len(batch) > 1:
                return self._train_step_accum(list(batch), rng, aux_weight)
            batch = batch[0]
        cfg, L = self.cfg, self.L
        aux_w = (aux_weight_at_step(cfg, jnp.int32(self._count))
                 if aux_weight is None else jnp.float32(aux_weight))
        step_rng = jax.random.fold_in(rng, self._count)
        # Same per-layer key schedule as text_model_forward's scan.
        layer_rngs = jax.random.split(step_rng, L)

        (input_ids, codec_ids, mask, labels, codec_labels, abw,
         position_ids) = self._parse_batch(batch)

        outer = dict(self.outer_state.params)
        ep = {"embed_tokens": outer["embed_tokens"],
              "codec_embed": outer["codec_embed"]}
        hp = {"norm": outer["norm"], "codec_head": outer["codec_head"]}
        if labels is not None:
            hp["lm_head"] = outer["lm_head"]

        h, cos, sin, full_abw, boundaries, aux_sum, topk_sum = (
            self._stream_fwd(ep, input_ids, codec_ids, mask, position_ids,
                             abw, layer_rngs))

        # ---- head loss + gradient wrt final hidden --------------------
        loss, codec_loss, mean_aux, g_hp, g_h, sq_hp = self._head()(
            hp, h, codec_labels, labels, aux_sum, aux_w)
        del h

        aux_cot = (aux_w / L).astype(jnp.float32)
        g_host: List[Dict] = [None] * L
        g_h, sq_layers = self._stream_bwd(
            boundaries, g_h, cos, sin, mask, full_abw, layer_rngs, aux_cot,
            "single", g_host)
        sq_total = sq_hp + sq_layers

        g_ep, sq_ep = self._embed_bwd()(ep, input_ids, codec_ids, g_h)
        del g_h
        sq_total = sq_total + sq_ep

        gnorm = jnp.sqrt(sq_total)
        # One batched fetch (each separate float() costs a ~30 ms tunnel
        # round trip on the axon TPU).
        loss_v, codec_v, aux_v, topk_v, gnorm_v = jax.device_get(
            (loss, codec_loss, mean_aux, topk_sum, gnorm))
        metrics = {
            "loss": float(loss_v),
            "codec_loss": float(codec_v),
            "aux_loss": float(aux_v),
            "mean_top_k": float(topk_v) / L,
            "grad_norm": float(gnorm_v),
        }
        if not (np.isfinite(metrics["loss"]) and np.isfinite(metrics["grad_norm"])):
            # Skip the whole update phase (reference nan/inf filter).
            metrics["skipped"] = 1.0
            del g_host, g_hp, g_ep
            return metrics

        # ---- update: stream per-layer AdamW ---------------------------
        count = jnp.int32(self._count + 1)
        lr = jnp.asarray(self.lr(jnp.int32(self._count)), jnp.float32)
        scale = jnp.minimum(
            1.0, self.grad_clip / jnp.maximum(gnorm.astype(jnp.float32), 1e-12))
        upd = self._layer_update()
        qstep = self._quant_key()
        for l in range(L):
            new_lp, new_mu, new_nu = upd(
                self.layers_host[l], g_host[l], self.mu[l], self.nu[l],
                scale, count, lr, jax.random.fold_in(qstep, l))
            self.layers_host[l] = new_lp
            self.mu[l], self.nu[l] = new_mu, new_nu
            g_host[l] = None
            if l >= 1:
                jax.block_until_ready(
                    jax.tree.leaves(self.nu[l - 1])[0])  # layer l-1 landed

        # Outer params through OffloadAdamW (same count/lr/scale by
        # construction: both advance only on applied steps).
        g_outer = dict(g_ep)
        g_outer.update(g_hp)
        if labels is None and "lm_head" in outer:
            # lm_head is trainable (train_lm_head=True) but this batch has
            # no text labels: zero gradient, moments still decay.
            g_outer["lm_head"] = jnp.zeros_like(outer["lm_head"])
        self.outer_state = self.outer_opt.apply(self.outer_state, g_outer, gnorm)
        self._count += 1
        metrics["skipped"] = 0.0
        return metrics

    # ------------------------------------------------------------------
    def _train_step_accum(self, batches: List[Dict], rng: jax.Array,
                          aux_weight: Optional[float]) -> Dict[str, float]:
        """Gradient-accumulated streamed step over `batches` micro-batches.

        Per-layer fp32 gradient sums live in host memory between
        micro-batches; micro-batch i>0 streams layer l's running sum back
        through the device (donated into the new sum) while recomputing
        that layer's vjp.  Grad semantics match a single step on the
        concatenated batch up to the per-micro-batch normalization of the
        CE/aux terms: the applied update uses the clipped MEAN gradient
        (reference: HF/DeepSpeed gradient_accumulation_steps averaging)."""
        cfg, L = self.cfg, self.L
        n = len(batches)
        aux_w = (aux_weight_at_step(cfg, jnp.int32(self._count))
                 if aux_weight is None else jnp.float32(aux_weight))
        step_rng = jax.random.fold_in(rng, self._count)
        aux_cot = (aux_w / L).astype(jnp.float32)

        outer = dict(self.outer_state.params)
        ep = {"embed_tokens": outer["embed_tokens"],
              "codec_embed": outer["codec_embed"]}

        g_host: List[Optional[Dict]] = [None] * L
        acc_outer = None
        dev_metrics = []
        sq_layers = jnp.float32(0)
        has_labels: Optional[bool] = None
        for i, b in enumerate(batches):
            (input_ids, codec_ids, mask, labels, codec_labels, abw,
             position_ids) = self._parse_batch(b)
            if has_labels is None:
                has_labels = labels is not None
            elif (labels is not None) != has_labels:
                raise ValueError(
                    "micro-batches must agree on label kinds (text labels "
                    "present in some but not all)")
            hp = {"norm": outer["norm"], "codec_head": outer["codec_head"]}
            if labels is not None:
                hp["lm_head"] = outer["lm_head"]
            # Distinct jitter keys per micro-batch (a bigger batch should
            # sample more jitter, not repeat it).
            layer_rngs = jax.random.split(
                jax.random.fold_in(step_rng, i), L)

            h, cos, sin, full_abw, boundaries, aux_sum, topk_sum = (
                self._stream_fwd(ep, input_ids, codec_ids, mask,
                                 position_ids, abw, layer_rngs))
            loss, codec_loss, mean_aux, g_hp, g_h, _ = self._head()(
                hp, h, codec_labels, labels, aux_sum, aux_w)
            del h
            g_h, sq_layers = self._stream_bwd(
                boundaries, g_h, cos, sin, mask, full_abw, layer_rngs,
                aux_cot, "first" if i == 0 else "acc", g_host)
            g_ep, _ = self._embed_bwd()(ep, input_ids, codec_ids, g_h)
            del g_h
            g_outer = dict(g_ep)
            g_outer.update(g_hp)
            if acc_outer is None:
                acc_outer = self._outer_open()(g_outer)
            else:
                acc_outer = self._outer_acc()(acc_outer, g_outer)
            del g_outer, g_ep, g_hp
            dev_metrics.append((loss, codec_loss, mean_aux, topk_sum))

        # sq_layers is the last micro-batch's running-sum norm — the
        # accumulated total's.  ||mean|| = ||sum|| / n.
        gnorm_sum = jnp.sqrt(sq_layers + self._outer_sq()(acc_outer))
        ms, gnorm_sum_v = jax.device_get((dev_metrics, gnorm_sum))
        gnorm_v = float(gnorm_sum_v) / n
        metrics = {
            "loss": float(np.mean([m[0] for m in ms])),
            "codec_loss": float(np.mean([m[1] for m in ms])),
            "aux_loss": float(np.mean([m[2] for m in ms])),
            "mean_top_k": float(np.mean([m[3] for m in ms])) / L,
            "grad_norm": gnorm_v,
            "micro_batches": float(n),
        }
        if not (np.isfinite(metrics["loss"]) and np.isfinite(gnorm_v)):
            metrics["skipped"] = 1.0
            del g_host, acc_outer
            return metrics

        # ---- update: stream per-layer AdamW on the MEAN gradient -------
        count = jnp.int32(self._count + 1)
        lr = jnp.asarray(self.lr(jnp.int32(self._count)), jnp.float32)
        clip_scale = jnp.minimum(
            1.0, self.grad_clip / jnp.maximum(jnp.float32(gnorm_v), 1e-12))
        scale = clip_scale / n  # grads hold SUMS; apply the clipped mean
        upd = self._layer_update()
        qstep = self._quant_key()
        for l in range(L):
            new_lp, new_mu, new_nu = upd(
                self.layers_host[l], g_host[l], self.mu[l], self.nu[l],
                scale, count, lr, jax.random.fold_in(qstep, l))
            self.layers_host[l] = new_lp
            self.mu[l], self.nu[l] = new_mu, new_nu
            g_host[l] = None
            if l >= 1:
                jax.block_until_ready(
                    jax.tree.leaves(self.nu[l - 1])[0])  # layer l-1 landed

        g_outer_mean = self._outer_div()(
            acc_outer, {k: outer[k] for k in acc_outer}, jnp.float32(n))
        if not has_labels and "lm_head" in outer:
            g_outer_mean["lm_head"] = jnp.zeros_like(outer["lm_head"])
        self.outer_state = self.outer_opt.apply(
            self.outer_state, g_outer_mean, jnp.float32(gnorm_v))
        self._count += 1
        metrics["skipped"] = 0.0
        return metrics

    # ------------------------------------------------------------------
    def evaluate(self, batches, max_batches: Optional[int] = None
                 ) -> Dict[str, float]:
        """Forward-only validation pass over `batches` (the reference
        trainer's _maybe_log_save_evaluate loop, moe_trainer.py:728,746,
        for the param-offload regime): streams layers without saving
        boundaries or grads, eval-mode MoE (no jitter), params untouched.
        Returns mean eval_ metrics."""
        cfg, L = self.cfg, self.L
        if "eval_layer" not in self._jits:
            tc = self.tc
            dm, cap, uf = self.dispatch_mode, self.capacity, self.use_flash

            def f(lp, h, cos, sin, mask, abw):
                return layer_apply(
                    lp, h, cos, sin, tc,
                    kv_valid_mask=mask, padding_token_mask=mask,
                    aux_balance_weight=abw, rng=None, training=False,
                    dispatch_mode=dm, capacity=cap, use_flash=uf)

            def head_loss(hp, h, codec_labels, labels, aux_sum, aux_w):
                # Reuse the training head's loss closure via value_and_grad-
                # free evaluation: identical math path (fp32 CE).
                return self._head_loss(hp, h, codec_labels, labels,
                                       aux_sum, aux_w)

            self._jits["eval_layer"] = jax.jit(f)
            self._jits["eval_head"] = jax.jit(head_loss)
        fwd = self._jits["eval_layer"]
        sums: Dict[str, float] = {}
        n = 0
        aux_w = aux_weight_at_step(cfg, jnp.int32(self._count))
        outer = dict(self.outer_state.params)
        ep = {"embed_tokens": outer["embed_tokens"],
              "codec_embed": outer["codec_embed"]}
        for j, batch in enumerate(batches):
            if max_batches is not None and j >= max_batches:
                break
            (input_ids, codec_ids, mask, labels, codec_labels, abw,
             position_ids) = self._parse_batch(batch)
            hp = {"norm": outer["norm"], "codec_head": outer["codec_head"]}
            if labels is not None:
                hp["lm_head"] = outer["lm_head"]
            emb, cos, sin, full_abw = self._embed_fwd()(
                ep, input_ids, codec_ids, mask, position_ids, abw)
            h = emb
            aux_sum = jnp.float32(0)
            lp_dev = self._to_device(self.layers_host[0])
            prev = None
            for l in range(L):
                nxt = (self._to_device(self.layers_host[l + 1])
                       if l + 1 < L else None)
                h, aux_l, _ = fwd(lp_dev, h, cos, sin, mask, full_abw)
                aux_sum = aux_sum + aux_l
                if prev is not None:
                    jax.block_until_ready(prev)
                prev = h
                del lp_dev
                lp_dev = nxt
            loss, (codec_loss, mean_aux) = self._jits["eval_head"](
                hp, h, codec_labels, labels, aux_sum, aux_w)
            loss_v, codec_v, aux_v = jax.device_get(
                (loss, codec_loss, mean_aux))
            for k, v in (("loss", loss_v), ("codec_loss", codec_v),
                         ("aux_loss", aux_v)):
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {f"eval_{k}": v / max(n, 1) for k, v in sums.items()}

    def precompile(self, batch: Dict, rng: jax.Array) -> None:
        """Warm every program with one throwaway step on the given batch
        (params are updated once; intended before timing runs)."""
        self.train_step(batch, rng)

    def full_params(self) -> Dict:
        """Materialize the full layer-stacked pytree as host numpy (tests /
        export on small models; needs the whole model in client RAM)."""
        stacked = jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *self.layers_host)
        out = {k: np.asarray(v) for k, v in self.outer_state.params.items()}
        out.update({k: np.asarray(v) for k, v in self.static_outer.items()})
        out["layers"] = stacked
        return out
