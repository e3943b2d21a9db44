"""Training step: optax AdamW + schedule + jitted sharded update.

Replaces the reference's MoETrainer/DeepSpeed machinery
(reference: UniMoEV2-Preview/training/moe_trainer.py:288-809 + ZeRO-2
config): grad sync and optimizer-state sharding come from the mesh
shardings — params/grads follow param_specs and XLA inserts the psums.
The ZeRO-2 equivalent (optimizer state partitioned over the data axis) is
shard_params(fsdp=True) (parallel/mesh.add_fsdp_axis); the ZeRO CPU-offload
equivalent is train/offload.py.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import UniMoEAudioConfig
from ..models.model import model_forward


class TrainState(NamedTuple):
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def make_lr_schedule(learning_rate: float, warmup_steps: int,
                     total_steps: int, schedule: str = "cosine"):
    """Warmup + cosine/linear decay schedule callable (the reference's
    deepspeed WarmupDecayLR, training.sh:60-66).  Shared by the optax path
    (make_optimizer) and the offload/stream trainers, which take a
    step->lr callable directly."""
    if schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
        )
    if schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.linear_schedule(learning_rate, 0.0, total_steps - warmup_steps),
            ],
            [warmup_steps],
        )
    return learning_rate


def make_optimizer(
    *,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    warmup_steps: int = 100,
    total_steps: int = 10000,
    schedule: str = "cosine",
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    trainable_pattern: Optional[str] = None,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW + warmup-cosine/-linear decay (the reference's canonical recipe,
    UniMoEV2-Preview/script/training.sh:60-66 + deepspeed WarmupDecayLR).

    trainable_pattern: regex over slash-joined param paths; non-matching
    params are FROZEN (no updates, no optimizer state) — the reference's
    set_trainable regex freeze (training_utils.py:93-118), e.g.
    'moe/gate|moe/fixed' for the stage-2 router+shared-experts curriculum
    and 'moe/gate' for only_gate_training.

    grad_accum_steps>1 wraps the chain in optax.MultiSteps (the reference's
    gradient_accumulation_steps, script/training.sh:56): micro-step
    gradients accumulate as a running mean in the optimizer state and the
    inner AdamW (incl. clipping and the lr schedule counter) applies once
    every k calls.  Note the TrainState step counter counts MICRO-steps;
    the schedule advances per applied update."""
    sched = make_lr_schedule(learning_rate, warmup_steps, total_steps, schedule)
    # No weight decay on norms/biases/gates (the reference's decay/no-decay
    # split, moe_trainer.py:295-310).
    def decay_mask(params):
        def is_decay(path, leaf):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            return not any(s in name for s in ("layernorm", "norm", "_b", "/b"))
        return jax.tree_util.tree_map_with_path(is_decay, params)

    opt = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, b1=b1, b2=b2, weight_decay=weight_decay, mask=decay_mask),
    )
    if trainable_pattern is not None:
        import re

        pat = re.compile(trainable_pattern)

        def frozen_mask(params):
            def check(path, leaf):
                name = "/".join(
                    str(getattr(p, "key", getattr(p, "idx", p))) for p in path
                )
                return not bool(pat.search(name))
            return jax.tree_util.tree_map_with_path(check, params)

        # Zero the FINAL update for frozen params (masked() alone would pass
        # their raw gradients through untouched).
        opt = optax.chain(opt, optax.masked(optax.set_to_zero(), frozen_mask))
    if grad_accum_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=grad_accum_steps,
                               use_grad_mean=True).gradient_transformation()
    return opt


def aux_weight_at_step(cfg: UniMoEAudioConfig, step: jnp.ndarray) -> jnp.ndarray:
    """Linearly-decayed aux-loss weight (reference cur_aux_weight,
    utils/UniMoE_Audio_model.py:489-493)."""
    tc = cfg.text_config
    w0, w1 = tc.l_aux_weight, tc.min_l_aux_weight
    steps = max(1, tc.l_aux_weight_decay_steps)
    lin = w0 - (w0 - w1) / steps * step.astype(jnp.float32)
    return jnp.where(step >= steps, w1, lin)


def loss_fn(
    params: Dict,
    cfg: UniMoEAudioConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    aux_weight: jnp.ndarray,
    *,
    dispatch_mode: str = "dense",
    capacity: Optional[int] = None,
    remat: bool = True,
    ring=None,
    hidden_sharding=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    inputs_embeds = batch.get("inputs_embeds")
    prefix = None
    if "vision_patches" in batch:
        # In-jit vision tower: runs INSIDE the differentiated step so the
        # ViT trains (the reference's set_trainable default trains every
        # module incl. the tower, train_unimoev2_qwen2vl.py:310-314).
        # Index arrays come bucketed/padded from vision_indices; padding
        # rows carry zero gradient by construction.
        from ..models.model import calculate_input_embedding
        from ..models.vision import vision_tower_apply

        feats = vision_tower_apply(
            params["vision"], batch["vision_patches"], batch["vision_pos"],
            batch["vision_win_ids"], batch["vision_sample_ids"],
            batch["vision_widx"], batch["vision_reverse"], cfg.vision_config,
        )
        emb = calculate_input_embedding(
            params, batch["input_ids"], batch.get("codec_input_ids"),
            cfg.codec_placeholder_value,
        )
        vmask = batch["input_ids"] == cfg.image_token_id
        # Order-preserving scatter: j-th vision token row takes feats[j].
        slot_order = jnp.cumsum(vmask.reshape(-1)) - 1
        gathered = feats[jnp.clip(slot_order, 0, feats.shape[0] - 1)]
        gathered = gathered.reshape(emb.shape[0], emb.shape[1], -1)
        inputs_embeds = jnp.where(vmask[..., None], gathered.astype(emb.dtype), emb)
    if "peft" in params:
        # PEFT adapters (reference training_utils.py:121-163): prompt/
        # P-tuning prepend soft tokens; prefix tuning injects per-layer KV.
        # Runs AFTER the vision branch — prepending first would have its
        # rows overwritten when vision rebuilds inputs_embeds.
        from .peft import prefix_kv as peft_prefix_kv
        from .peft import prepend_virtual_tokens, virtual_embeds

        peft = params["peft"]
        virt = virtual_embeds(peft)
        if virt is not None:
            from ..models.model import calculate_input_embedding

            if inputs_embeds is None:
                inputs_embeds = calculate_input_embedding(
                    params, batch["input_ids"], batch.get("codec_input_ids"),
                    cfg.codec_placeholder_value,
                )
            batch, inputs_embeds = prepend_virtual_tokens(batch, inputs_embeds, virt)
        prefix = peft_prefix_kv(peft, cfg)
    out = model_forward(
        params, cfg, batch["input_ids"],
        codec_input_ids=batch.get("codec_input_ids"),
        attention_mask=batch.get("attention_mask"),
        position_ids=batch.get("position_ids"),
        inputs_embeds=inputs_embeds,
        codec_labels=batch.get("codec_labels"),
        labels=batch.get("labels"),
        aux_balance_weight=batch.get("aux_balance_weight"),
        aux_loss_weight=aux_weight,
        training=True,
        rng=rng,
        dispatch_mode=dispatch_mode,
        capacity=capacity,
        remat=remat,
        prefix_kv=prefix,
        ring=ring,
        hidden_sharding=hidden_sharding,
    )
    metrics = {
        "loss": out.loss,
        "codec_loss": out.codec_loss if out.codec_loss is not None else jnp.float32(0),
        "aux_loss": out.aux_loss,
        "mean_top_k": jnp.mean(out.router_top_k.astype(jnp.float32)),
    }
    return out.loss, metrics


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    cfg: UniMoEAudioConfig,
    optimizer: optax.GradientTransformation,
    dispatch_mode: str = "dense",
    capacity: Optional[int] = None,
    remat: bool = True,
    ring=None,
    hidden_sharding=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step (wrap in jax.jit with donate_argnums at the call site)."""
    aux_w = aux_weight_at_step(cfg, state.step)
    step_rng = jax.random.fold_in(rng, state.step)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, step_rng, aux_w,
        dispatch_mode=dispatch_mode, capacity=capacity, remat=remat,
        ring=ring, hidden_sharding=hidden_sharding,
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    grad_norm = optax.global_norm(grads)
    metrics["grad_norm"] = grad_norm
    # Skip-on-non-finite (the reference filters nan/inf losses and
    # DeepSpeed's overflow check skips the optimizer step,
    # moe_trainer.py:664-669): a nan/inf loss or gradient keeps the OLD
    # params/opt_state — the bad step never corrupts the model.  The step
    # counter also holds, so schedules don't advance on a skipped step.
    finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
    keep = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new, old)
    metrics["skipped"] = (~finite).astype(jnp.float32)
    return TrainState(
        params=keep(params, state.params),
        opt_state=keep(opt_state, state.opt_state),
        step=state.step + finite.astype(state.step.dtype),
    ), metrics


def init_train_state(params: Dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.zeros((), jnp.int32)
    )
