"""Training-stack tests: conversation tokenization/collator oracles,
dense→MoE surgery slicing, trainer loop with checkpoint save/resume,
text-label CE path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, model_forward
from unimoe_audio_tpu.train import data as TD
from unimoe_audio_tpu.train.surgery import dense_ffn_to_experts, moeify_dense_params
from unimoe_audio_tpu.train.trainer import Trainer, TrainerConfig


class TinyTok:
    eos_token = "</s>"
    eos_token_id = 2
    bos_token_id = None
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=False):
        if isinstance(text, list):
            text = text[0]
        ids = [3 + (hash(w) % 90) for w in text.replace("</s>", " </s> ").split()]
        ids = [self.eos_token_id if text.replace(" ", "") == "</s>" else i for i in ids]
        # map the literal eos word
        ids = [self.eos_token_id if w == "</s>" else i
               for i, w in zip(ids, text.replace("</s>", " </s> ").split())]

        class R:  # mimic HF BatchEncoding.input_ids
            input_ids = ids

        return R


def test_preprocess_supervised_masks_sources():
    tok = TinyTok()
    conv = [
        {"from": "human", "value": "hello there"},
        {"from": "gpt", "value": "general kenobi"},
        {"from": "human", "value": "again"},
        {"from": "gpt", "value": "reply two"},
    ]
    out = TD.preprocess_supervised(conv, tok)
    ids, labels = out["input_ids"], out["labels"]
    assert len(ids) == len(labels)
    # System + source prefixes masked; assistant spans labeled.
    assert (labels[: len(TD.SYSTEM_MESSAGE.split())] == TD.IGNORE_INDEX).all()
    n_labeled = (labels != TD.IGNORE_INDEX).sum()
    assert n_labeled >= 4  # two answers + eos tokens
    # Every labeled position equals the input id there.
    m = labels != TD.IGNORE_INDEX
    np.testing.assert_array_equal(labels[m], ids[m])


def test_collator_padding_and_aux_weight():
    tok = TinyTok()
    insts = [
        {"input_ids": np.array([5, 6, 7]), "labels": np.array([-100, 6, 7])},
        {"input_ids": np.array([8, 9]), "labels": np.array([-100, 9])},
    ]
    col = TD.Collator(pad_token_id=0, aux_balance_weight=10.0)
    batch = col(insts)
    assert batch["input_ids"].shape == (2, 3)
    np.testing.assert_array_equal(batch["attention_mask"], [[1, 1, 1], [1, 1, 0]])
    np.testing.assert_array_equal(
        batch["aux_balance_weight"], [[1, 10, 10], [1, 10, 1]]
    )


def test_expand_image_tokens():
    conv = [{"from": "human", "value": "look <|image_pad|> here"},
            {"from": "gpt", "value": "ok"}]
    out = TD.expand_image_tokens(conv, 3, prepend_prompt=False)
    assert out[0]["value"].count("<|image_pad|>") == 3
    out2 = TD.expand_image_tokens(
        [{"from": "human", "value": "desc"}, {"from": "gpt", "value": "ok"}], 2)
    assert out2[0]["value"].startswith("<|vision_start|>")


def test_dense_ffn_to_experts_rotating_slices():
    cfg = tiny_test_config(
        dynamic_intermediate_size=8, shared_intermediate_size=4,
        mlp_dynamic_expert_num=4,
    ).text_config
    D, F = cfg.hidden_size, 16  # F/Fd = 2 → offsets rotate 0,8,0,8
    rng = np.random.default_rng(0)
    dense = {
        "gate": rng.normal(size=(D, F)).astype(np.float32),
        "up": rng.normal(size=(D, F)).astype(np.float32),
        "down": rng.normal(size=(F, D)).astype(np.float32),
    }
    out = dense_ffn_to_experts(dense, cfg, moe_copy="all")
    assert out["dynamic"]["gate"].shape == (4, D, 8)
    np.testing.assert_array_equal(out["dynamic"]["gate"][0], dense["gate"][:, :8])
    np.testing.assert_array_equal(out["dynamic"]["gate"][1], dense["gate"][:, 8:])
    np.testing.assert_array_equal(out["dynamic"]["gate"][2], dense["gate"][:, :8])
    np.testing.assert_array_equal(out["dynamic"]["down"][1], dense["down"][8:, :])
    # Fixed experts take the leading slice.
    np.testing.assert_array_equal(out["fixed"]["gate"][1], dense["gate"][:, :4])

    single = dense_ffn_to_experts(dense, cfg, moe_copy="single")
    np.testing.assert_array_equal(single["dynamic"]["gate"][0], dense["gate"][:, :8])
    assert not np.allclose(single["dynamic"]["gate"][1], dense["gate"][:, 8:])


def test_moeify_dense_params_structure():
    cfg = tiny_test_config(
        dynamic_intermediate_size=64, shared_intermediate_size=32,
    )
    tc = cfg.text_config
    ref = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L, D = tc.num_hidden_layers, tc.hidden_size
    F = tc.intermediate_size
    dense = {k: v for k, v in ref.items() if k != "layers"}
    dense["layers"] = {k: v for k, v in ref["layers"].items() if k != "moe"}
    rng = np.random.default_rng(1)
    dense["layers"]["mlp"] = {
        "gate": rng.normal(size=(L, D, F)).astype(np.float32),
        "up": rng.normal(size=(L, D, F)).astype(np.float32),
        "down": rng.normal(size=(L, F, D)).astype(np.float32),
    }
    out = moeify_dense_params(dense, tc, dtype=jnp.float32)
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), out)
    assert ref_shapes == got_shapes
    # Forward runs on the surgically-initialized params.
    ids = jnp.ones((1, 6), dtype=jnp.int32)
    res = model_forward(out, cfg, ids)
    assert np.isfinite(np.asarray(res.codec_logits)).all()


def test_trainer_loop_and_resume(tmp_path):
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tcfg = TrainerConfig(
        learning_rate=1e-3, total_steps=6, warmup_steps=1, log_every=1,
        save_every=2, ckpt_dir=str(tmp_path / "ckpt"), remat=False,
    )
    tr = Trainer(cfg, params, tcfg)

    rng = np.random.default_rng(0)
    C = cfg.codec_channels

    def batches(n):
        for _ in range(n):
            codec = rng.integers(0, cfg.codec_eos_value, size=(2, 8, C))
            yield {
                "input_ids": np.full((2, 8), cfg.codec_placeholder_value, np.int32),
                "codec_input_ids": codec.astype(np.int32),
                "attention_mask": np.ones((2, 8), np.int32),
                "codec_labels": codec.astype(np.int32),
            }

    hist = tr.fit(batches(4))
    assert len(hist) == 4
    assert int(tr.state.step) == 4

    # Resume continues from the saved step.
    tr2 = Trainer(cfg, params, tcfg)
    start = tr2.maybe_resume()
    assert start == 4
    hist2 = tr2.fit(batches(2))
    assert int(tr2.state.step) == 6


def test_text_label_ce_path():
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 100, size=(2, 10)))
    labels = ids.at[:, :4].set(-100)
    out = model_forward(params, cfg, ids, labels=labels, aux_loss_weight=0.025)
    assert np.isfinite(float(out.loss))
    assert out.logits is not None


def test_trainable_pattern_freezes_params():
    """only_gate_training-style freeze: only moe/gate updates."""
    from unimoe_audio_tpu.train.step import init_train_state, make_optimizer, train_step

    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    opt = make_optimizer(learning_rate=1e-2, total_steps=5, warmup_steps=1,
                         trainable_pattern=r"moe/gate")
    state = init_train_state(params, opt)
    rng = np.random.default_rng(0)
    C = cfg.codec_channels
    codec = rng.integers(0, cfg.codec_eos_value, size=(2, 8, C)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((2, 8), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    # two steps: warmup makes lr 0 at step 0
    mid_state, _ = train_step(state, batch, jax.random.PRNGKey(1), cfg=cfg,
                              optimizer=opt, remat=False)
    new_state, _ = train_step(mid_state, batch, jax.random.PRNGKey(1), cfg=cfg,
                              optimizer=opt, remat=False)
    gate_moved = float(jnp.abs(
        new_state.params["layers"]["moe"]["gate"] - params["layers"]["moe"]["gate"]
    ).max())
    attn_moved = float(jnp.abs(
        new_state.params["layers"]["attn"]["q_proj"]["w"]
        - params["layers"]["attn"]["q_proj"]["w"]
    ).max())
    emb_moved = float(jnp.abs(
        new_state.params["embed_tokens"] - params["embed_tokens"]).max())
    assert gate_moved > 0
    assert attn_moved == 0 and emb_moved == 0


def _image_batch(cfg, vcfg):
    # One image: grid 1x4x4 -> 16 patches -> 4 merged tokens.
    grid = np.array([[1, 4, 4]])
    patch_dim = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    pv = np.random.default_rng(0).normal(size=(16, patch_dim)).astype(np.float32)
    ids = np.full((1, 12), 7, dtype=np.int64)
    ids[0, 2:6] = cfg.image_token_id
    labels = ids.copy(); labels[:, :8] = -100
    return {
        "input_ids": ids, "labels": labels,
        "attention_mask": np.ones_like(ids),
        "pixel_values": pv, "image_grid_thw": grid,
    }


@pytest.mark.parametrize("train_vision", [True, False])
def test_trainer_image_batch(tmp_path, train_vision):
    """Image training path, both modes: in-jit differentiable tower
    (reference set_trainable default) and frozen-tower fusion outside jit
    (staged curriculum)."""
    from unimoe_audio_tpu.train.trainer import Trainer, TrainerConfig

    cfg = tiny_test_config(with_vision=True)
    vcfg = cfg.vision_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32,
                               with_vision=True)
    tcfg = TrainerConfig(learning_rate=1e-3, total_steps=2, warmup_steps=1,
                         log_every=1, save_every=0, ckpt_dir=None, remat=False,
                         train_vision=train_vision, vision_bucket=8)
    tr = Trainer(cfg, params, tcfg)
    # donate_argnums deletes the original state's buffers — snapshot first.
    pe_before = np.asarray(params["vision"]["patch_embed"]).copy()
    batch = _image_batch(cfg, vcfg)
    hist = tr.fit(iter([batch, batch]))
    assert len(hist) == 2 and np.isfinite(hist[-1]["loss"])
    moved = float(jnp.abs(
        np.asarray(tr.state.params["vision"]["patch_embed"]) - pe_before
    ).max())
    if train_vision:
        # Tower gradients flow (reference trains ALL modules by default,
        # train_unimoev2_qwen2vl.py:310-314).
        assert moved > 0
    else:
        assert moved == 0


def test_trainer_vision_freeze_by_pattern(tmp_path):
    """train_vision=True + trainable_pattern excluding the tower == the
    reference's set_trainable regex freeze: grads computed, updates zeroed."""
    from unimoe_audio_tpu.train.trainer import Trainer, TrainerConfig

    cfg = tiny_test_config(with_vision=True)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32,
                               with_vision=True)
    tcfg = TrainerConfig(learning_rate=1e-3, total_steps=2, warmup_steps=1,
                         log_every=1, save_every=0, ckpt_dir=None, remat=False,
                         train_vision=True, vision_bucket=8,
                         trainable_pattern=r"^(?!vision)")
    tr = Trainer(cfg, params, tcfg)
    pe_before = np.asarray(params["vision"]["patch_embed"]).copy()
    emb_before = np.asarray(params["embed_tokens"]).copy()
    batch = _image_batch(cfg, cfg.vision_config)
    tr.fit(iter([batch, batch]))  # step 0 is lr==0 (warmup)
    vis_moved = float(jnp.abs(
        np.asarray(tr.state.params["vision"]["patch_embed"]) - pe_before).max())
    emb_moved = float(jnp.abs(
        np.asarray(tr.state.params["embed_tokens"]) - emb_before).max())
    assert vis_moved == 0 and emb_moved > 0


def test_vision_tower_apply_matches_forward_with_padding():
    """vision_tower_apply on bucketed/padded indices == vision_forward on
    the unpadded grid (padding rows are inert)."""
    from unimoe_audio_tpu.models.vision import (
        init_vision_params, vision_forward, vision_indices, vision_tower_apply,
    )

    cfg = tiny_test_config(with_vision=True)
    vcfg = cfg.vision_config
    params = init_vision_params(jax.random.PRNGKey(3), vcfg, dtype=jnp.float32)
    grid = np.array([[1, 4, 4], [1, 8, 4]])  # 16 + 32 patches, 12 merged
    patch_dim = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    pv = np.random.default_rng(1).normal(size=(48, patch_dim)).astype(np.float32)

    want = np.asarray(vision_forward(params, jnp.asarray(pv), grid, vcfg))

    m2 = vcfg.spatial_merge_size ** 2
    idx = vision_indices(grid, vcfg, pad_merged_to=16)  # pad 12 -> 16
    pv_pad = np.concatenate([pv, np.zeros(((16 - 12) * m2, patch_dim), pv.dtype)])
    got = np.asarray(vision_tower_apply(
        params, jnp.asarray(pv_pad), jnp.asarray(idx["pos"]),
        jnp.asarray(idx["win_ids"]), jnp.asarray(idx["sample_ids"]),
        jnp.asarray(idx["widx"]), jnp.asarray(idx["reverse"]), vcfg,
    ))
    np.testing.assert_allclose(got[:12], want, rtol=2e-5, atol=2e-6)


def test_packed_training_matches_dense_dropless():
    """dispatch_mode='packed' with dropless capacity: same loss and
    gradients as dense (the pack is an exact regrouping), and a tight
    capacity still trains finite.  Packed measured 2x over dense at
    uniform low-k training shapes (docs/STATUS.md)."""
    from unimoe_audio_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    opt = make_optimizer(learning_rate=1e-3, total_steps=4, warmup_steps=1)
    B, T = 2, 8
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, cfg.codec_channels)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }

    def run(mode, cap):
        s = init_train_state(jax.tree.map(lambda x: x, params), opt)
        s2, m = train_step(s, batch, jax.random.PRNGKey(1), cfg=cfg,
                           optimizer=opt, dispatch_mode=mode, capacity=cap,
                           remat=False)
        return m

    m_dense = run("dense", None)
    m_packed = run("packed", B * T)  # dropless
    np.testing.assert_allclose(float(m_dense["loss"]), float(m_packed["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_dense["grad_norm"]),
                               float(m_packed["grad_norm"]), rtol=1e-4)
    m_tight = run("packed", max(4, (B * T) // 2))
    assert np.isfinite(float(m_tight["loss"]))


def test_compress_strings_set():
    """Log compactor folds numeric dotted components into ranges to a
    fixpoint (reference training_utils.py:178-240)."""
    from unimoe_audio_tpu.train.trainer import compress_strings_set

    got = compress_strings_set({
        "layers.0.attn.w", "layers.1.attn.w", "layers.2.attn.w",
        "layers.4.attn.w", "norm.w",
    })
    assert got == {"layers.[0-2,4].attn.w", "norm.w"}

    # two numeric fields compress across passes
    got = compress_strings_set({
        f"blocks.{i}.experts.{j}.up" for i in range(2) for j in range(3)})
    assert got == {"blocks.[0-1].experts.[0-2].up"}

    # nothing numeric: unchanged
    assert compress_strings_set({"a.b", "c"}) == {"a.b", "c"}
