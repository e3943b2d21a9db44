"""Training driver: epoch/step loop, metrics, checkpoint/resume.

Replaces MoETrainer (reference: UniMoEV2-Preview/training/moe_trainer.py:
288-809) — no DeepSpeed engine: the jitted train step carries the sharded
params/optimizer state; orbax handles save/resume (incl. step counter so
resume continues the aux-weight decay schedule, the reference's
deepspeed_load_checkpoint path at moe_trainer.py:510-518).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UniMoEAudioConfig
from ..core.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .step import init_train_state, make_optimizer, train_step


@dataclass
class TrainerConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    warmup_steps: int = 100
    total_steps: int = 10000
    schedule: str = "cosine"
    grad_clip: float = 1.0
    log_every: int = 10
    save_every: int = 500
    ckpt_dir: Optional[str] = None
    max_to_keep: int = 3
    dispatch_mode: str = "dense"
    # Static per-expert slot count for dispatch_mode='packed' (None = S,
    # dropless).  The packed path measured 2x over dense at uniform low-k
    # training shapes (docs/STATUS.md); capacity semantics match the
    # reference's token_drop/capacity_factor recipe.
    dispatch_capacity: Optional[int] = None
    remat: bool = True
    seed: int = 0
    # Micro-steps per optimizer update (the reference's
    # gradient_accumulation_steps, script/training.sh:56).  >1 wraps the
    # optimizer in optax.MultiSteps: fit() consumes one micro-batch per
    # iteration and the inner AdamW applies every k-th; the step counter
    # counts micro-steps (log/save cadences too).
    grad_accum_steps: int = 1
    # Run a validation pass every N optimizer steps (0 = off) when fit()
    # receives eval_batches — the reference trainer's
    # _maybe_log_save_evaluate cadence (moe_trainer.py:728,746).
    eval_every: int = 0
    # Regex over param paths; non-matching params frozen (reference
    # set_trainable / only_gate_training).  None = train everything.
    trainable_pattern: Optional[str] = None
    # Run the vision tower INSIDE the jitted step so it trains (the
    # reference's default trains all modules incl. the ViT,
    # train_unimoev2_qwen2vl.py:310-314).  False = round-1 behavior:
    # features fused outside jit, tower structurally frozen.
    train_vision: bool = True
    # Merged-vision-token bucket: grids pad up to a multiple of this so a
    # handful of compiled steps serve all image sizes.
    vision_bucket: int = 64
    # Ring-attention sequence parallelism for long-context training: shard
    # the sequence over this mesh axis (requires Trainer(mesh=...)); the
    # attention window rotates K/V via ppermute (ops/ring_attention) so no
    # device holds full-sequence K/V.  None = off.
    ring_axis: Optional[str] = None


def compress_strings_set(strings):
    """Compact a set of dotted names by folding numeric components into
    ranges, e.g. {'layers.0.w', 'layers.1.w', 'layers.2.w', 'norm.w'} →
    {'layers.[0-2].w', 'norm.w'} — the reference's trainable-parameter
    log compactor (training_utils.py:178-240: one numeric field folds per
    pass, repeated to a fixpoint so multi-index names compress fully).

    Returns a set of compacted strings."""

    def fold_once(names):
        groups: Dict[str, list] = {}
        passthrough = []
        for s in names:
            parts = s.split(".")
            idx = next((i for i, p in enumerate(parts) if p.isdigit()), None)
            if idx is None:
                passthrough.append(s)
                continue
            key = ".".join(parts[:idx] + ["\x00"] + parts[idx + 1:])
            groups.setdefault(key, []).append(int(parts[idx]))
        out = list(passthrough)
        for key, vals in groups.items():
            vals.sort()
            spans, lo = [], vals[0]
            prev = lo
            for v in vals[1:]:
                if v != prev + 1:
                    spans.append((lo, prev))
                    lo = v
                prev = v
            spans.append((lo, prev))
            ranged = ",".join(str(a) if a == b else f"{a}-{b}"
                              for a, b in spans)
            out.append(key.replace("\x00", f"[{ranged}]"))
        return out

    names = list(strings)
    while True:
        folded = fold_once(names)
        if len(folded) == len(names):
            return set(folded)
        names = folded


class MetricsLogger:
    """stdout + optional JSONL + optional wandb metrics sink (the reference
    logs losses to wandb inside model.forward,
    utils/UniMoE_Audio_model.py:849-854, with env plumbing in
    script/training.sh:5-30; here logging lives outside the compiled step).

    wandb activation mirrors the reference's env gating: use_wandb=None
    auto-enables when the wandb package imports AND one of
    WANDB_API_KEY/WANDB_PROJECT/WANDB_MODE is set; use_wandb=True forces a
    hard failure if wandb is unavailable; False disables."""

    def __init__(self, jsonl_path: Optional[str] = None, *,
                 use_wandb: Optional[bool] = None,
                 wandb_run_config: Optional[Dict[str, Any]] = None):
        self.jsonl_path = jsonl_path
        self._fh = open(jsonl_path, "a") if jsonl_path else None
        self._wandb = None
        env_on = any(os.environ.get(k) for k in
                     ("WANDB_API_KEY", "WANDB_PROJECT", "WANDB_MODE"))
        if use_wandb or (use_wandb is None and env_on):
            try:
                import wandb  # type: ignore

                if wandb.run is None:
                    wandb.init(
                        project=os.environ.get("WANDB_PROJECT", "unimoe-audio-tpu"),
                        name=os.environ.get("WANDB_NAME") or None,
                        config=wandb_run_config or {},
                    )
                self._wandb = wandb
            except ImportError:
                if use_wandb:
                    raise
                print("[metrics] wandb env set but package unavailable — "
                      "JSONL/stdout only")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        flat = {k: float(v) for k, v in metrics.items()}
        msg = ", ".join(f"{k}: {v:.4g}" for k, v in flat.items())
        print(f"step {step}: {msg}")
        if self._fh:
            import json

            self._fh.write(json.dumps({"step": step, **flat}) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None


class Trainer:
    def __init__(
        self,
        cfg: UniMoEAudioConfig,
        params: Dict,
        tcfg: TrainerConfig,
        *,
        logger: Optional[MetricsLogger] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.tcfg = tcfg
        # When a mesh is given, batches shard over (data, expert) so every
        # rank holds distinct rows (true DP; required for FSDP to actually
        # split work — a replicated batch makes every data rank redundant).
        self.mesh = mesh
        self.optimizer = make_optimizer(
            learning_rate=tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            warmup_steps=tcfg.warmup_steps,
            total_steps=tcfg.total_steps,
            schedule=tcfg.schedule,
            grad_clip=tcfg.grad_clip,
            trainable_pattern=tcfg.trainable_pattern,
            grad_accum_steps=tcfg.grad_accum_steps,
        )
        self.state = init_train_state(params, self.optimizer)
        self.logger = logger or MetricsLogger()
        if tcfg.trainable_pattern is not None:
            # Compacted trainable-set log (reference prints the full names
            # through its compress_strings_set compactor).
            import re

            pat = re.compile(tcfg.trainable_pattern)
            names = [
                ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                         for p in path)
                for path, _ in jax.tree_util.tree_leaves_with_path(params)]
            on = compress_strings_set(
                n for n in names if pat.search(n.replace(".", "/")))
            print(f"[trainer] trainable ({tcfg.trainable_pattern!r}): "
                  f"{sorted(on)}")
        ring = None
        if tcfg.ring_axis is not None:
            assert mesh is not None, "ring_axis requires Trainer(mesh=...)"
            ring = (mesh, tcfg.ring_axis)
        self._step_fn = jax.jit(
            lambda s, b, r: train_step(
                s, b, r, cfg=cfg, optimizer=self.optimizer,
                dispatch_mode=tcfg.dispatch_mode,
                capacity=tcfg.dispatch_capacity, remat=tcfg.remat,
                ring=ring,
            ),
            donate_argnums=(0,),
        )
        self.rng = jax.random.PRNGKey(tcfg.seed)
        self._eval_fn = None  # built lazily on first evaluate()

    # -- checkpointing ---------------------------------------------------
    def maybe_resume(self) -> int:
        if not self.tcfg.ckpt_dir:
            return 0
        step = latest_step(self.tcfg.ckpt_dir)
        if step is None:
            return 0
        self.state = restore_checkpoint(self.tcfg.ckpt_dir, self.state, step)
        print(f"resumed from checkpoint step {step}")
        return int(step)

    def save(self) -> None:
        if self.tcfg.ckpt_dir:
            save_checkpoint(
                self.tcfg.ckpt_dir, int(self.state.step), self.state,
                max_to_keep=self.tcfg.max_to_keep,
            )

    def save_pretrained(self, out_dir: str) -> None:
        """Export an inference checkpoint dir (model.jax.pkl + config.json)
        that UniMoEAudio loads directly — the reference's epoch-save
        callback surface (training_utils.py:61-90)."""
        import pickle

        os.makedirs(out_dir, exist_ok=True)
        params_np = jax.tree.map(lambda a: np.asarray(a), self.state.params)
        with open(os.path.join(out_dir, "model.jax.pkl"), "wb") as f:
            pickle.dump({"params": params_np, "config": self.cfg.to_dict()}, f)
        self.cfg.save_json(os.path.join(out_dir, "config.json"))

    # -- vision preprocessing ---------------------------------------------
    def _prepare_vision_batch(self, batch: Dict) -> Dict:
        """Prepare a vision batch for the jitted step.

        train_vision=True (default, the reference's set_trainable default):
        host-side index computation only (vision_indices, padded to the
        vision_bucket), with the tower itself running — and differentiating
        — inside train_step.

        train_vision=False: round-1 behavior — fuse image features into
        inputs_embeds OUTSIDE the jitted step; the tower is structurally
        frozen (the staged-curriculum reading of script/training.sh)."""
        if "pixel_values" not in batch:
            return batch
        if self.tcfg.train_vision:
            from ..models.model import get_rope_index
            from ..models.vision import vision_indices

            batch = dict(batch)
            pv = np.asarray(batch.pop("pixel_values"))
            grid = np.asarray(batch.pop("image_grid_thw"))
            vcfg = self.cfg.vision_config
            m2 = vcfg.spatial_merge_size ** 2
            n_merged = pv.shape[0] // m2
            bucket = max(self.tcfg.vision_bucket, 1)
            pad_to = -(-n_merged // bucket) * bucket
            idx = vision_indices(grid, vcfg, pad_merged_to=pad_to)
            if pad_to > n_merged:
                pv = np.concatenate(
                    [pv, np.zeros(((pad_to - n_merged) * m2, pv.shape[1]), pv.dtype)]
                )
            batch["vision_patches"] = pv
            batch["vision_pos"] = idx["pos"]
            batch["vision_win_ids"] = idx["win_ids"]
            batch["vision_sample_ids"] = idx["sample_ids"]
            batch["vision_widx"] = idx["widx"]
            batch["vision_reverse"] = idx["reverse"]
            ids = np.asarray(batch["input_ids"])
            assert int((ids == self.cfg.image_token_id).sum()) == n_merged, (
                "image tokens != merged vision features"
            )
            pos, _ = get_rope_index(
                ids, self.cfg, image_grid_thw=grid,
                attention_mask=batch.get("attention_mask"),
            )
            batch["position_ids"] = pos
            return batch
        from ..models.model import calculate_input_embedding, get_rope_index
        from ..models.vision import vision_forward

        batch = dict(batch)
        pv = jnp.asarray(batch.pop("pixel_values"))
        grid = np.asarray(batch.pop("image_grid_thw"))
        ids = np.asarray(batch["input_ids"])
        feats = vision_forward(self.state.params["vision"], pv, grid,
                               self.cfg.vision_config)
        emb = calculate_input_embedding(
            self.state.params, jnp.asarray(ids),
            batch.get("codec_input_ids"),
            self.cfg.codec_placeholder_value,
        )
        vmask = ids == self.cfg.image_token_id
        slots = np.argwhere(vmask)
        assert len(slots) == feats.shape[0], (
            f"image tokens {len(slots)} != features {feats.shape[0]}"
        )
        emb_np = np.array(emb, dtype=np.float32)  # writable copy
        emb_np[vmask] = np.asarray(feats, dtype=np.float32)
        batch["inputs_embeds"] = emb_np.astype(np.asarray(emb).dtype)
        pos, _ = get_rope_index(
            ids, self.cfg, image_grid_thw=grid,
            attention_mask=batch.get("attention_mask"),
        )
        batch["position_ids"] = pos
        return batch

    # -- batch placement -------------------------------------------------
    # Batch-dim index per key (default 0); keys absent here with other
    # leading dims replicate.
    _BATCH_DIM = {"position_ids": 1}

    def _place_batch(self, batch: Dict) -> Dict:
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = int(self.mesh.shape["data"]) * int(self.mesh.shape["expert"])
        out = {}
        for k, v in batch.items():
            v = jnp.asarray(v)
            bd = self._BATCH_DIM.get(k, 0)
            if (v.ndim > bd and v.shape[bd] % n == 0
                    and not k.startswith("vision_")):
                spec = [None] * v.ndim
                spec[bd] = ("data", "expert")
                v = jax.device_put(v, NamedSharding(self.mesh, P(*spec)))
            else:
                v = jax.device_put(v, NamedSharding(self.mesh, P()))
            out[k] = v
        return out

    # -- evaluation ------------------------------------------------------
    def evaluate(self, eval_batches: Iterable[Dict[str, np.ndarray]],
                 max_batches: Optional[int] = None) -> Dict[str, float]:
        """Forward-only validation pass: mean loss/metrics over
        eval_batches (the reference trainer's evaluate() inside
        _maybe_log_save_evaluate, moe_trainer.py:728,746).  No dropout
        jitter, no gradient, params untouched."""
        from .step import aux_weight_at_step, loss_fn

        if self._eval_fn is None:
            tcfg, cfg = self.tcfg, self.cfg

            def eval_step(params, batch, step):
                aux_w = aux_weight_at_step(cfg, step)
                # Fixed rng: eval-mode forward paths ignore jitter, and a
                # constant key keeps the metric deterministic.
                _, metrics = loss_fn(
                    params, cfg, batch, jax.random.PRNGKey(0), aux_w,
                    dispatch_mode=tcfg.dispatch_mode,
                    capacity=tcfg.dispatch_capacity, remat=False,
                )
                return metrics

            self._eval_fn = jax.jit(eval_step)

        sums: Dict[str, float] = {}
        n = 0
        for j, batch in enumerate(eval_batches):
            if max_batches is not None and j >= max_batches:
                break
            batch = self._prepare_vision_batch(batch)
            batch = self._place_batch(batch)
            m = self._eval_fn(self.state.params, batch, self.state.step)
            m = {k: float(v) for k, v in m.items()}
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1
        return {f"eval_{k}": v / max(n, 1) for k, v in sums.items()}

    # -- training --------------------------------------------------------
    def fit(self, batches: Iterable[Dict[str, np.ndarray]],
            max_steps: Optional[int] = None,
            eval_batches: Optional[List[Dict[str, np.ndarray]]] = None,
            ) -> List[Dict[str, float]]:
        start = self.maybe_resume()
        history = []
        t0 = time.time()
        i = 0
        for i, batch in enumerate(batches):
            # Host-side counter: int(self.state.step) would force a device
            # fetch (~30 ms over the axon tunnel) and serialize dispatch.
            step_no = start + i
            if max_steps is not None and step_no >= max_steps:
                break
            batch = self._prepare_vision_batch(batch)
            batch = self._place_batch(batch)
            self.state, metrics = self._step_fn(self.state, batch, self.rng)
            if step_no % self.tcfg.log_every == 0:
                jax.block_until_ready(metrics["loss"])
                metrics = {k: float(v) for k, v in metrics.items()}
                if metrics.get("skipped", 0.0) or not np.isfinite(metrics["loss"]):
                    # nan/inf filter (reference logging_nan_inf_filter +
                    # DeepSpeed overflow skip, moe_trainer.py:664-669):
                    # train_step kept the old params/opt_state, so the bad
                    # step did NOT corrupt the model — just surface it.
                    print(f"[warning] non-finite loss/grad at step {step_no} "
                          f"(loss={metrics['loss']}) — update skipped")
                metrics["steps_per_sec"] = (i + 1) / (time.time() - t0)
                self.logger.log(step_no, metrics)
                history.append({"step": step_no, **metrics})
            if (self.tcfg.eval_every and eval_batches is not None
                    and step_no > 0 and step_no % self.tcfg.eval_every == 0):
                em = self.evaluate(eval_batches)
                self.logger.log(step_no, em)
                history.append({"step": step_no, **em})
            if self.tcfg.save_every and step_no > 0 and step_no % self.tcfg.save_every == 0:
                self.save()
        if self.tcfg.eval_every and eval_batches is not None:
            em = self.evaluate(eval_batches)
            self.logger.log(start + i, em)
            history.append({"step": start + i, **em})
        self.save()
        return history
