"""Round-3 training-stack tests: image dataset last mile (load →
smart_resize → patchify → token expansion → in-jit tower training),
pretraining tokenization, non-finite-step skip, eval loop, wandb sink."""

import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.train import data as TD
from unimoe_audio_tpu.train.data import (
    Collator, ConversationDataset, SimpleTokenizer, preprocess_pretraining,
)
from unimoe_audio_tpu.train.trainer import MetricsLogger, Trainer, TrainerConfig


# ---------------------------------------------------------------------------
# preprocess_pretraining (reference datasets_utils.py:46-79)
# ---------------------------------------------------------------------------

class _Tok:
    eos_token = "</s>"
    eos_token_id = 2
    bos_token_id = None
    pad_token_id = 0

    def __call__(self, text, add_special_tokens=True):
        if isinstance(text, list):
            text = text[0]
        ids = [5 + (hash(w) % 90) for w in text.split()]

        class R:
            input_ids = ids

        return R


def test_preprocess_pretraining_appends_eos_and_targets_everything():
    out = preprocess_pretraining("three word sentence", _Tok())
    assert out["input_ids"][-1] == 2  # appended EOS
    np.testing.assert_array_equal(out["input_ids"], out["labels"])
    assert int(out["global_text_index"]) == len(out["input_ids"]) - 1


def test_preprocess_pretraining_truncation_overwrites_last_with_eos():
    out = preprocess_pretraining(
        "a b c d e f g h", _Tok(), model_max_length=4)
    assert len(out["input_ids"]) == 4
    assert out["input_ids"][-1] == 2  # EOS replaces the truncated tail


def test_preprocess_pretraining_masks_image_tokens():
    out = preprocess_pretraining(
        "look <|image_pad|> here", _Tok(), has_image=True,
        image_token_index=151655)
    assert (out["input_ids"] == 151655).sum() == 1
    assert (out["labels"] == 151655).sum() == 0
    assert (out["labels"] == TD.IGNORE_INDEX).sum() == 1


# ---------------------------------------------------------------------------
# Image training pipeline last mile
# ---------------------------------------------------------------------------

def _image_dataset(tmp_path, n=4):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.make_sample_dataset import build

    path = str(tmp_path / "ds")
    build(path, n=n, with_images=True, every=2)
    return path


def test_dataset_loads_images_and_expands_tokens(tmp_path):
    cfg = tiny_test_config(with_vision=True)
    path = _image_dataset(tmp_path)
    tok = SimpleTokenizer(vocab_size=cfg.text_config.vocab_size,
                          special={"<|image_pad|>": cfg.image_token_id,
                                   "<|vision_start|>": cfg.vision_start_token_id,
                                   "<|vision_end|>": cfg.vision_end_token_id})
    ds = ConversationDataset(
        path, tok, image_token_index=cfg.image_token_id,
        image_root=path + "_images", vision_config=cfg.vision_config,
    )
    got_image = got_plain = False
    for i in range(len(ds)):
        item = ds[i]
        if "pixel_values" in item:
            got_image = True
            grid = item["image_grid_thw"]
            m2 = cfg.vision_config.spatial_merge_size ** 2
            n_tok = int(grid.prod()) // m2
            # 56x56 image, patch 14, merge 2 -> grid [1,4,4], 4 merged tokens
            assert n_tok == 4
            assert item["pixel_values"].shape[0] == int(grid.prod())
            assert (item["input_ids"] == cfg.image_token_id).sum() == n_tok
            # image tokens are never training targets
            assert not ((item["labels"] == cfg.image_token_id)).any()
        else:
            got_plain = True
            assert (item["input_ids"] == cfg.image_token_id).sum() == 0
    assert got_image and got_plain


def test_train_cli_end_to_end_with_images(tmp_path):
    """The full CLI path: arrow dataset with images + --image_root trains
    the in-jit vision tower (VERDICT round-2 Missing #1)."""
    from unimoe_audio_tpu.train.cli import main

    cfg = tiny_test_config(with_vision=True)
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    cfg.save_json(os.path.join(model_dir, "config.json"))
    # 5 samples: 1 eval hold-out + 4 train = 2 steps at batch size 2.
    data_path = _image_dataset(tmp_path, n=5)
    out_dir = str(tmp_path / "out")

    rc = main([
        "--model_name_or_path", model_dir,
        "--data_path", data_path,
        "--image_root", data_path + "_images",
        "--output_dir", out_dir,
        "--per_device_train_batch_size", "2",
        "--max_steps", "2",
        "--logging_steps", "1",
        "--save_steps", "0",
        "--model_max_length", "128",
        "--eval_ratio", "0.25",
        "--eval_steps", "1",
    ])
    assert rc == 0
    assert os.path.isfile(os.path.join(out_dir, "train_done.json"))
    import json as _json

    rows = [_json.loads(l) for l in
            open(os.path.join(out_dir, "metrics.jsonl")).read().splitlines()]
    assert rows, "no metrics logged"
    evals = [r for r in rows if "eval_loss" in r]
    assert evals and all(np.isfinite(r["eval_loss"]) for r in evals), \
        "--eval_ratio/--eval_steps produced no eval rows"


def test_vision_tower_gradients_flow_from_dataset_batch(tmp_path):
    """A dataset-built image batch actually produces vision-tower grads."""
    from unimoe_audio_tpu.train.step import aux_weight_at_step, loss_fn

    cfg = tiny_test_config(with_vision=True)
    path = _image_dataset(tmp_path, n=2)
    tok = SimpleTokenizer(vocab_size=cfg.text_config.vocab_size,
                          special={"<|image_pad|>": cfg.image_token_id,
                                   "<|vision_start|>": cfg.vision_start_token_id,
                                   "<|vision_end|>": cfg.vision_end_token_id})
    ds = ConversationDataset(
        path, tok, image_token_index=cfg.image_token_id,
        image_root=path + "_images", vision_config=cfg.vision_config,
    )
    items = [ds[i] for i in range(len(ds)) if "pixel_values" in ds[i]]
    batch = Collator(pad_token_id=0, aux_balance_weight=10.0)(items)

    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32,
                               with_vision=True)
    tr = Trainer(cfg, params, TrainerConfig(remat=False, total_steps=2,
                                            warmup_steps=0, save_every=0))
    batch = tr._prepare_vision_batch(dict(batch))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def vision_loss(p):
        return loss_fn(p, cfg, batch, jax.random.PRNGKey(0),
                       jnp.float32(0.01), remat=False)[0]

    grads = jax.grad(vision_loss)(tr.state.params)
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), grads["vision"], 0.0))
    assert np.isfinite(gnorm) and gnorm > 0, "no gradient reached the tower"


# ---------------------------------------------------------------------------
# Non-finite step skip + eval loop + wandb sink
# ---------------------------------------------------------------------------

def _codec_batch(cfg, rng, B=2, T=8):
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, cfg.codec_channels))
    return {
        "input_ids": np.full((B, T), cfg.codec_placeholder_value, np.int32),
        "codec_input_ids": codec.astype(np.int32),
        "attention_mask": np.ones((B, T), np.int32),
        "codec_labels": codec.astype(np.int32),
    }


def test_prefetch_preserves_order_and_propagates_errors():
    """prefetch(): same items in the same order, bounded queue, and a
    worker exception re-raises in the consumer (not swallowed)."""
    from unimoe_audio_tpu.train.data import prefetch

    items = [{"i": i} for i in range(7)]
    assert list(prefetch(iter(items))) == items
    assert list(prefetch(iter([]))) == []

    def boom():
        yield {"i": 0}
        raise RuntimeError("collate failed")

    it = prefetch(boom())
    assert next(it) == {"i": 0}
    with pytest.raises(RuntimeError, match="collate failed"):
        list(it)


def test_nonfinite_step_is_skipped():
    """A nan batch must NOT corrupt params (reference nan/inf filter +
    DeepSpeed overflow skip, moe_trainer.py:664-669)."""
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tr = Trainer(cfg, params, TrainerConfig(remat=False, total_steps=4,
                                            warmup_steps=0, save_every=0))
    rng = np.random.default_rng(0)
    bad = _codec_batch(cfg, rng)
    D = cfg.text_config.hidden_size
    emb = np.zeros(bad["input_ids"].shape + (D,), np.float32)
    emb[0, 0, 0] = np.nan
    bad["inputs_embeds"] = emb

    before = jax.tree.map(np.asarray, tr.state.params)
    state, metrics = tr._step_fn(
        tr.state, {k: jnp.asarray(v) for k, v in bad.items()}, tr.rng)
    assert float(metrics["skipped"]) == 1.0
    assert not np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 0  # counter held
    after = jax.tree.map(np.asarray, state.params)
    jax.tree.map(np.testing.assert_array_equal, before, after)

    # ...and a good batch still applies.
    good = _codec_batch(cfg, rng)
    state2, m2 = tr._step_fn(state, {k: jnp.asarray(v) for k, v in good.items()},
                             tr.rng)
    assert float(m2["skipped"]) == 0.0
    assert int(state2.step) == 1


def test_trainer_grad_accum_matches_single_step():
    """grad_accum_steps=2 (optax.MultiSteps, the reference's
    gradient_accumulation_steps): two identical micro-steps apply ONE
    optimizer update equal to a k=1 step on that batch.  Jitter off +
    constant aux weight make the forward deterministic in the batch."""
    cfg = tiny_test_config(router_jitter_noise=0.0, input_jitter_noise=0.0,
                           l_aux_weight=0.01, min_l_aux_weight=0.01)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    kw = dict(remat=False, total_steps=8, warmup_steps=0, save_every=0,
              log_every=1)
    a = Trainer(cfg, jax.tree.map(jnp.array, params), TrainerConfig(**kw))
    b = Trainer(cfg, jax.tree.map(jnp.array, params),
                TrainerConfig(grad_accum_steps=2, **kw))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in _codec_batch(cfg, rng).items()}

    sa, ma = a._step_fn(a.state, batch, a.rng)

    sb, m0 = b._step_fn(b.state, batch, b.rng)
    # First micro-step: gradient banked, params untouched, counter advanced.
    assert int(sb.step) == 1 and float(m0["skipped"]) == 0.0
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        params, sb.params)
    sb, m1 = b._step_fn(sb, batch, b.rng)

    for (path, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, sa.params))[0],
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, sb.params))[0]):
        np.testing.assert_allclose(
            x, y, atol=1e-6,
            err_msg=f"accum drift at {jax.tree_util.keystr(path)}")


def test_trainer_grad_accum_nan_micro_does_not_pollute_accumulator():
    """A non-finite micro-step keeps the OLD MultiSteps accumulator and
    holds the counter; the next good micro-batches still produce a clean
    update."""
    cfg = tiny_test_config(router_jitter_noise=0.0, input_jitter_noise=0.0,
                           l_aux_weight=0.01, min_l_aux_weight=0.01)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tr = Trainer(cfg, jax.tree.map(jnp.array, params), TrainerConfig(
        grad_accum_steps=2, remat=False, total_steps=8, warmup_steps=0,
        save_every=0))
    rng = np.random.default_rng(0)
    good = {k: jnp.asarray(v) for k, v in _codec_batch(cfg, rng).items()}
    bad = dict(good)
    D = cfg.text_config.hidden_size
    emb = np.zeros(np.asarray(good["input_ids"]).shape + (D,), np.float32)
    emb[0, 0, 0] = np.nan
    bad["inputs_embeds"] = jnp.asarray(emb)

    s, m = tr._step_fn(tr.state, good, tr.rng)        # banks grad 1
    s, m = tr._step_fn(s, bad, tr.rng)                # skipped entirely
    assert float(m["skipped"]) == 1.0 and int(s.step) == 1
    s, m = tr._step_fn(s, good, tr.rng)               # completes the pair
    assert float(m["skipped"]) == 0.0 and int(s.step) == 2
    # The update applied: params moved.
    moved = any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(params), jax.tree.leaves(s.params)))
    assert moved


def test_eval_loop_runs_and_is_deterministic():
    cfg = tiny_test_config()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tr = Trainer(cfg, params, TrainerConfig(
        remat=False, total_steps=4, warmup_steps=0, save_every=0,
        eval_every=2, log_every=1))
    rng = np.random.default_rng(1)
    train = [_codec_batch(cfg, rng) for _ in range(3)]
    evalb = [_codec_batch(cfg, rng) for _ in range(2)]

    hist = tr.fit(iter(train), eval_batches=evalb)
    eval_rows = [h for h in hist if "eval_loss" in h]
    assert eval_rows, "no eval metrics logged"
    assert all(np.isfinite(h["eval_loss"]) for h in eval_rows)

    # evaluate() is pure: two calls agree bit-for-bit.
    a = tr.evaluate(evalb)
    b = tr.evaluate(evalb)
    assert a == b


def test_wandb_sink_with_fake_module(tmp_path, monkeypatch):
    calls = {"init": [], "log": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.run = None

    def _init(**kw):
        calls["init"].append(kw)
        fake.run = object()

    fake.init = _init
    fake.log = lambda d, step=None: calls["log"].append((step, d))
    def _finish():
        calls["finish"] += 1
        fake.run = None
    fake.finish = _finish
    monkeypatch.setitem(sys.modules, "wandb", fake)
    monkeypatch.setenv("WANDB_PROJECT", "test-proj")

    logger = MetricsLogger(str(tmp_path / "m.jsonl"))  # auto-enables via env
    logger.log(3, {"loss": 1.5})
    logger.close()
    assert calls["init"] and calls["init"][0]["project"] == "test-proj"
    assert calls["log"] == [(3, {"loss": 1.5})]
    assert calls["finish"] == 1

    # without env gating and without use_wandb, the sink stays off
    monkeypatch.delenv("WANDB_PROJECT")
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    monkeypatch.delenv("WANDB_MODE", raising=False)
    logger2 = MetricsLogger()
    logger2.log(0, {"loss": 1.0})
    assert calls["finish"] == 1 and len(calls["log"]) == 1
    logger2.close()
