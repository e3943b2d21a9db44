#!/usr/bin/env python3
"""Training entrypoint CLI.

Port of the reference's training launcher surface (reference:
UniMoEV2-Preview/training/train_unimoev2_qwen2vl.py:48-338 +
script/training.sh:34-80): same hyperparameter names, no DeepSpeed — the
mesh shardings replace ZeRO/EP process groups, orbax replaces DS
checkpoints.

Example (mirrors script/training.sh's canonical run):
  python -m unimoe_audio_tpu.train.cli \
      --model_name_or_path /path/to/dense-or-moe-ckpt \
      --data_path /path/to/hf_dataset --initialize \
      --moe_copy all --mlp_dynamic_expert_num 4 --mlp_fixed_expert_num 2 \
      --mlp_dynamic_null_expert_num 1 --mlp_dynamic_top_p 0.7 \
      --dynamic_mlp_size_factor 4 --fixed_mlp_size_factor 8 \
      --aux_balance_weight 10 --l_aux_weight 0.025 \
      --learning_rate 1e-4 --num_train_epochs 1 --ep_size 1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="UniMoE-Audio TPU trainer")
    # Model args (reference ModelArguments)
    p.add_argument("--model_name_or_path", required=True)
    p.add_argument("--initialize", action="store_true",
                   help="run dense→MoE surgery on a dense checkpoint")
    p.add_argument("--moe_copy", choices=["all", "single", "none"], default="all")
    p.add_argument("--mlp_dynamic_expert_num", type=int, default=4)
    p.add_argument("--mlp_dynamic_null_expert_num", type=int, default=1)
    p.add_argument("--mlp_fixed_expert_num", type=int, default=2)
    p.add_argument("--mlp_dynamic_top_p", type=float, default=0.7)
    p.add_argument("--mlp_dynamic_top_k", type=int, default=0)
    p.add_argument("--dynamic_mlp_size_factor", type=int, default=4)
    p.add_argument("--fixed_mlp_size_factor", type=int, default=8)
    p.add_argument("--token_drop", action="store_true")
    p.add_argument("--drop_policy", choices=["probs", "position"], default="probs")
    p.add_argument("--capacity_factor", type=float, default=3.0)
    p.add_argument("--min_capacity", type=int, default=8)
    p.add_argument("--ep_size", type=int, default=1)
    p.add_argument("--tp_size", type=int, default=1)
    p.add_argument("--param_offload", action="store_true",
                   help="full-flagship single-chip training: layer params "
                        "AND fp32 Adam moments live in TPU-host pinned "
                        "memory, streamed per layer (train/stream.py — the "
                        "reference's ZeRO-2 offload_param+offload_optimizer "
                        "regime, deepspeed_zero2.conf:23-37)")
    p.add_argument("--moment_dtype", choices=["float32", "int8"],
                   default="float32",
                   help="(with --param_offload) Adam-moment storage: int8 "
                        "= blockwise log-quantized codes (8-bit optimizer, "
                        "Dettmers et al. 2021) — ~4x less update-phase "
                        "PCIe traffic at ~6%% relative moment error")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over the data axis "
                        "(ZeRO/FSDP-equivalent of the reference's ZeRO-2 "
                        "partitioned optimizer, deepspeed_zero2.conf)")
    p.add_argument("--only_gate_training", action="store_true")
    # Data args
    p.add_argument("--data_path", required=True)
    p.add_argument("--image_root", default=None)
    p.add_argument("--data_sample", type=int, default=None)
    p.add_argument("--model_max_length", type=int, default=4096)
    # Training args (reference TrainingArguments essentials)
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--per_device_train_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="micro-batches per optimizer update (reference "
                        "training.sh:56; stream trainer accumulates fp32 "
                        "grad sums in host memory, standard trainer wraps "
                        "optax.MultiSteps)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--lr_scheduler_type", default="cosine")
    p.add_argument("--l_aux_weight", type=float, default=0.025)
    p.add_argument("--min_l_aux_weight", type=float, default=0.001)
    p.add_argument("--l_aux_weight_decay_steps", type=int, default=10000)
    p.add_argument("--aux_balance_weight", type=float, default=10.0)
    p.add_argument("--save_steps", type=int, default=500)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--eval_ratio", type=float, default=0.0,
                   help="fraction of the dataset held out for validation "
                        "(tail split; 0 disables). Evaluated every "
                        "--eval_steps via the trainers' forward-only "
                        "evaluate() (the reference trainer's "
                        "_maybe_log_save_evaluate, moe_trainer.py:728,746)")
    p.add_argument("--eval_steps", type=int, default=0,
                   help="run validation every N optimizer steps (0 = only "
                        "at the end of training when --eval_ratio > 0)")
    p.add_argument("--gradient_checkpointing", action="store_true", default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_steps", type=int, default=None)
    from ..parallel.multihost import add_multihost_args

    add_multihost_args(p)
    p.add_argument("--peft_mode", choices=["lora", "prefix", "ptuning", "prompt"],
                   default=None,
                   help="parameter-efficient finetuning: adapters train, base "
                        "freezes (reference training_utils.py:121-163)")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=float, default=32.0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..parallel.multihost import maybe_initialize_multihost

    maybe_initialize_multihost(args)

    from ..config import UniMoEAudioConfig
    from ..models.model import init_model_params
    from ..parallel.mesh import default_mesh_shape, make_mesh, shard_params
    from ..train.data import Collator, ConversationDataset, prefetch
    from ..train.surgery import moeify_dense_params
    from ..train.trainer import MetricsLogger, Trainer, TrainerConfig

    # --- config + params -------------------------------------------------
    cfg_path = os.path.join(args.model_name_or_path, "config.json")
    cfg = UniMoEAudioConfig.from_json(cfg_path)
    tc = dataclasses.replace(
        cfg.text_config,
        mlp_dynamic_expert_num=args.mlp_dynamic_expert_num,
        mlp_dynamic_null_expert_num=args.mlp_dynamic_null_expert_num,
        mlp_fixed_expert_num=args.mlp_fixed_expert_num,
        mlp_dynamic_top_p=args.mlp_dynamic_top_p,
        mlp_dynamic_top_k=args.mlp_dynamic_top_k,
        dynamic_intermediate_size=cfg.text_config.intermediate_size // args.dynamic_mlp_size_factor,
        shared_intermediate_size=cfg.text_config.intermediate_size // args.fixed_mlp_size_factor,
        token_drop=args.token_drop,
        drop_policy=args.drop_policy,
        capacity_factor=args.capacity_factor,
        min_capacity=args.min_capacity,
        l_aux_weight=args.l_aux_weight,
        min_l_aux_weight=args.min_l_aux_weight,
        l_aux_weight_decay_steps=args.l_aux_weight_decay_steps,
        ep_size=args.ep_size,
    ) if args.initialize else cfg.text_config
    cfg = dataclasses.replace(cfg, text_config=tc)

    jax_blob = os.path.join(args.model_name_or_path, "model.jax.pkl")
    if os.path.isfile(jax_blob):
        import pickle

        with open(jax_blob, "rb") as f:
            blob = pickle.load(f)
        params = blob["params"]
        if args.initialize:
            params = moeify_dense_params(params, tc, moe_copy=args.moe_copy)
        else:
            params = jax.tree.map(jnp.asarray, params)
    else:
        print("[warning] no model.jax.pkl found — random init (development run)")
        params = init_model_params(jax.random.PRNGKey(args.seed), cfg,
                                   with_vision=cfg.vision_config is not None)

    # --- mesh ------------------------------------------------------------
    if not args.param_offload:
        n_dev = len(jax.devices())
        mesh_shape = default_mesh_shape(n_dev, args.ep_size, args.tp_size)
        mesh = make_mesh(*mesh_shape)
        params = shard_params(params, mesh, cfg, fsdp=args.fsdp)
        print(f"mesh (data, expert, model) = {mesh_shape} over {n_dev} devices"
              + (" [fsdp]" if args.fsdp else ""))

    # --- data ------------------------------------------------------------
    try:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_name_or_path)
    except Exception:
        from ..train.data import SimpleTokenizer

        print("[warning] no HF tokenizer assets — using the development "
              "whitespace tokenizer")
        tokenizer = SimpleTokenizer(
            vocab_size=cfg.text_config.vocab_size,
            # Vision specials must map to the config ids so mRoPE spans
            # resolve (get_rope_index keys on vision_start_token_id).
            special={
                "<|vision_start|>": cfg.vision_start_token_id,
                "<|vision_end|>": cfg.vision_end_token_id,
                "<|image_pad|>": cfg.image_token_id,
                "<|video_pad|>": cfg.video_token_id,
            },
        )
    dataset = ConversationDataset(
        args.data_path, tokenizer,
        image_token_index=cfg.image_token_id,
        model_max_length=args.model_max_length,
        data_sample=args.data_sample,
        image_root=args.image_root,
        vision_config=cfg.vision_config,
    )
    collator = Collator(
        pad_token_id=tokenizer.pad_token_id or 0,
        aux_balance_weight=args.aux_balance_weight,
        model_max_length=args.model_max_length,
    )

    # --- train/eval split (tail hold-out; reference eval_dataset wiring) --
    bs = args.per_device_train_batch_size
    n_eval = 0
    if args.eval_ratio > 0:
        n_eval = max(1, int(len(dataset) * args.eval_ratio))
        n_eval = min(n_eval, max(0, len(dataset) - bs))  # keep ≥1 train batch
    n_train = len(dataset) - n_eval
    eval_batches = None
    if n_eval:
        ebs = min(bs, n_eval)
        eval_batches = [
            collator([dataset[int(j)] for j in range(i, i + ebs)])
            for i in range(n_train, len(dataset) - ebs + 1, ebs)
        ]
        print(f"eval hold-out: {n_eval} samples → {len(eval_batches)} batches")

    gas = max(1, args.gradient_accumulation_steps)
    # Stream trainer counts APPLIED optimizer steps; the standard trainer's
    # step counter counts micro-steps (see TrainerConfig.grad_accum_steps).
    per_step_batches = gas if args.param_offload else 1
    steps_per_epoch = max(1, n_train // (bs * per_step_batches))
    total_steps = args.max_steps or int(steps_per_epoch * args.num_train_epochs)

    def batches():
        rng = np.random.default_rng(args.seed)
        for _ in range(int(args.num_train_epochs)):
            order = rng.permutation(n_train)
            for i in range(0, len(order) - bs + 1, bs):
                idx = order[i : i + bs]
                yield collator([dataset[int(j)] for j in idx])

    # --- layer-streamed full-offload training ----------------------------
    if args.param_offload:
        if args.peft_mode or args.only_gate_training:
            raise SystemExit(
                "--param_offload is full-parameter training only; PEFT and "
                "gate-only curricula run through the standard trainer")
        from .step import make_lr_schedule
        from .stream import StreamTrainer

        warmup = max(1, int(total_steps * args.warmup_ratio))
        sched = make_lr_schedule(args.learning_rate, warmup, total_steps,
                                 args.lr_scheduler_type)
        ckpt_dir = os.path.join(args.output_dir, "stream_ckpt")
        resume = os.path.isfile(os.path.join(ckpt_dir, "meta.json"))
        trainer = StreamTrainer(
            cfg,
            None if resume else params,
            restore_dir=ckpt_dir if resume else None,
            learning_rate=sched,
            weight_decay=args.weight_decay,
            train_lm_head=True,
            moment_dtype=args.moment_dtype,
        )
        if resume:
            print(f"resumed stream checkpoint at step {trainer.step}")
        os.makedirs(args.output_dir, exist_ok=True)
        logger = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"))
        if eval_batches is not None and any(
                "pixel_values" in b for b in eval_batches):
            raise SystemExit(
                "--param_offload does not support image samples; train "
                "vision data through the standard trainer")
        rng = jax.random.PRNGKey(args.seed)
        micro = []
        for batch in prefetch(batches()):
            if trainer.step >= total_steps:
                break
            if "pixel_values" in batch:
                raise SystemExit(
                    "--param_offload does not support image samples; train "
                    "vision data through the standard trainer")
            micro.append({k: jnp.asarray(v) for k, v in batch.items()})
            if len(micro) < gas:
                continue
            m = trainer.train_step(micro if gas > 1 else micro[0], rng)
            micro = []
            if trainer.step % args.logging_steps == 0 or m.get("skipped"):
                logger.log(trainer.step, m)
            if args.eval_steps and eval_batches is not None \
                    and trainer.step > 0 \
                    and trainer.step % args.eval_steps == 0:
                logger.log(trainer.step, trainer.evaluate(eval_batches))
            if args.save_steps and trainer.step > 0 \
                    and trainer.step % args.save_steps == 0:
                trainer.save(ckpt_dir)
        if micro and trainer.step < total_steps:
            # Flush the trailing partial micro-batch group (train_step
            # scales by the actual group length).
            m = trainer.train_step(micro if gas > 1 else micro[0], rng)
            logger.log(trainer.step, m)
        if eval_batches is not None:
            logger.log(trainer.step, trainer.evaluate(eval_batches))
        trainer.save(ckpt_dir)
        with open(os.path.join(args.output_dir, "train_done.json"), "w") as f:
            json.dump({"steps": int(trainer.step)}, f)
        return 0

    # --- train -----------------------------------------------------------
    trainable = None
    if args.only_gate_training:
        # Stage-2-style curriculum: router gate only (reference
        # only_gate_training regex freeze, train_unimoev2_qwen2vl.py:311-314).
        trainable = r"moe/gate"
    if args.peft_mode:
        # Adapter-only training (reference get_peft_config modes,
        # training_utils.py:121-163).
        peft_rng = jax.random.PRNGKey(args.seed + 1)
        if args.peft_mode == "lora":
            from ..train.lora import add_lora

            params = add_lora(params, peft_rng, rank=args.lora_r,
                              alpha=args.lora_alpha)
            trainable = r"lora"
        else:
            from ..train import peft as peft_mod

            init = {
                "prefix": peft_mod.init_prefix_tuning,
                "ptuning": peft_mod.init_p_tuning,
                "prompt": peft_mod.init_prompt_tuning,
            }[args.peft_mode]
            params["peft"] = init(peft_rng, cfg)
            trainable = r"peft"
    tcfg = TrainerConfig(
        trainable_pattern=trainable,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_steps=max(1, int(total_steps * args.warmup_ratio)),
        total_steps=total_steps,
        schedule=args.lr_scheduler_type,
        log_every=args.logging_steps,
        save_every=args.save_steps,
        ckpt_dir=os.path.join(args.output_dir, "checkpoints"),
        remat=args.gradient_checkpointing,
        seed=args.seed,
        grad_accum_steps=gas,
        # 0 with a hold-out still evaluates once at the end of fit().
        eval_every=args.eval_steps or (total_steps if eval_batches else 0),
    )
    os.makedirs(args.output_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    trainer = Trainer(cfg, params, tcfg, logger=logger)
    trainer.fit(prefetch(batches()), max_steps=args.max_steps,
                eval_batches=eval_batches)
    with open(os.path.join(args.output_dir, "train_done.json"), "w") as f:
        json.dump({"steps": int(trainer.state.step)}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
