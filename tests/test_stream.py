"""Layer-streamed trainer (train/stream.py): forward/loss parity with the
scanned model, end-to-end step parity with the offload trainer, nan-skip,
and split/gather round trip.

On the virtual CPU mesh there is no pinned_host memory space, so layer
params/grads/moments fall back to device residency — the streaming loop,
per-layer vjp chain, chunked update math, and donation paths are identical;
memory-kind placement is exercised on the real TPU (bench.py
--stream-train)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params
from unimoe_audio_tpu.train.offload import OffloadAdamW, OffloadTrainer
from unimoe_audio_tpu.train.stream import StreamTrainer


def _batch(cfg, rng, B=2, T=8):
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, cfg.codec_channels))
    return {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec.astype(np.int32)),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec.astype(np.int32)),
    }


def test_stream_split_gather_round_trip():
    cfg = tiny_test_config(num_hidden_layers=3)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    tr = StreamTrainer(cfg, params, learning_rate=1e-3)
    back = tr.full_params()
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_array_equal(
            np.asarray(a), b, err_msg=f"round trip at {jax.tree_util.keystr(pa)}")


def test_stream_step_matches_offload_trainer():
    """3 streamed steps == 3 offload-trainer steps (which themselves match
    optax): same loss metrics each step, near-identical params after."""
    cfg = tiny_test_config(num_hidden_layers=3)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)

    off = OffloadAdamW(learning_rate=sched, weight_decay=0.1, grad_clip=1.0)
    otr = OffloadTrainer(cfg, params, off, remat=False)
    # train_lm_head=True: the offload trainer's optimizer sees lm_head with
    # zero grads + weight decay; matching that requires it trainable here.
    st = StreamTrainer(cfg, params, learning_rate=sched, weight_decay=0.1,
                       grad_clip=1.0, train_lm_head=True)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    for i in range(3):
        b = _batch(cfg, rng)
        m_off = otr.train_step(b, key)
        m_st = st.train_step(b, key)
        np.testing.assert_allclose(m_off["loss"], m_st["loss"], rtol=2e-5)
        np.testing.assert_allclose(m_off["aux_loss"], m_st["aux_loss"], rtol=2e-4)
        np.testing.assert_allclose(m_off["grad_norm"], m_st["grad_norm"],
                                   rtol=1e-3)
        assert m_st["skipped"] == 0.0

    ref = otr.state.params
    got = st.full_params()
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref)[0],
            jax.tree_util.tree_flatten_with_path(got)[0]):
        np.testing.assert_allclose(
            np.asarray(a), b, atol=5e-5,
            err_msg=f"param drift at {jax.tree_util.keystr(pa)}")


def test_stream_random_init_trains():
    """params=None direct-to-host init: loss decreases over a few steps on
    a fixed batch (smoke for the deep-model path that never materializes
    the full stack)."""
    cfg = tiny_test_config(num_hidden_layers=2)
    st = StreamTrainer(cfg, rng=jax.random.PRNGKey(3), learning_rate=3e-3)
    rng = np.random.default_rng(1)
    b = _batch(cfg, rng)
    losses = [st.train_step(b, jax.random.PRNGKey(5))["loss"] for _ in range(6)]
    assert st.step == 6
    assert losses[-1] < losses[0]


def test_stream_nan_skips_update():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    bad = _batch(cfg, rng)
    # Poison one codec id out of range -> nan/inf loss is NOT guaranteed;
    # instead poison via an inf-scaled attention trick: overwrite a layer
    # weight with nan so the loss goes non-finite deterministically.
    st.layers_host[0]["attn"]["q_proj"]["w"] = (
        st.layers_host[0]["attn"]["q_proj"]["w"].at[0, 0].set(jnp.nan))
    before = st.full_params()
    m = st.train_step(bad, jax.random.PRNGKey(0))
    assert m["skipped"] == 1.0
    assert st.step == 0
    after = st.full_params()
    jax.tree.map(np.testing.assert_array_equal, before, after)


def test_stream_text_only_batch_runs_without_codec_labels():
    """Conversation-style batches (labels only, no codec keys) train: the
    codec head contributes no loss and its grads are exactly zero."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3, train_lm_head=True)
    rng = np.random.default_rng(0)
    B, T = 2, 8
    b = {
        "input_ids": jnp.asarray(
            rng.integers(5, 100, size=(B, T)).astype(np.int32)),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(
            rng.integers(0, cfg.text_config.vocab_size, (B, T)), jnp.int32),
    }
    m = st.train_step(b, jax.random.PRNGKey(0))
    assert m["skipped"] == 0.0 and np.isfinite(m["loss"])
    assert m["codec_loss"] == 0.0
    assert st.step == 1


def test_stream_neither_label_kind_raises():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3)
    b = {"input_ids": jnp.zeros((1, 4), jnp.int32)}
    with pytest.raises(ValueError):
        st.train_step(b, jax.random.PRNGKey(0))


def test_stream_checkpoint_save_restore_resume(tmp_path):
    """Streaming checkpoint round trip: restored trainer has identical
    params/moments/step and produces the identical next step."""
    cfg = tiny_test_config(num_hidden_layers=3)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    st = StreamTrainer(cfg, params, learning_rate=sched, weight_decay=0.1,
                       grad_clip=1.0)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        st.train_step(_batch(cfg, rng), key)
    ckpt = str(tmp_path / "ck")
    st.save(ckpt)

    st2 = StreamTrainer(cfg, restore_dir=ckpt, learning_rate=sched,
                        weight_decay=0.1, grad_clip=1.0,
                        param_dtype=jnp.float32)
    assert st2.step == 2
    a, b = st.full_params(), st2.full_params()
    jax.tree.map(np.testing.assert_array_equal, a, b)
    nxt = _batch(cfg, rng)
    m1 = st.train_step(nxt, key)
    m2 = st2.train_step(nxt, key)
    for k in ("loss", "grad_norm", "aux_loss"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-6)
    jax.tree.map(np.testing.assert_array_equal,
                 st.full_params(), st2.full_params())

    # train_lm_head mismatch is rejected, not silently misapplied.
    with pytest.raises(ValueError):
        StreamTrainer(cfg, restore_dir=ckpt, learning_rate=sched,
                      train_lm_head=True)


def test_stream_restore_converts_moment_formats(tmp_path):
    """An fp32-moment checkpoint restores into an int8-moment trainer (and
    back): moments convert blockwise, training resumes, and the next-step
    loss stays close to the non-converted resume."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    st = StreamTrainer(cfg, params, learning_rate=sched, weight_decay=0.1,
                       grad_clip=1.0, moment_dtype="float32")
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    for _ in range(2):
        st.train_step(_batch(cfg, rng), key)
    ckpt = str(tmp_path / "ck32")
    st.save(ckpt)

    st8 = StreamTrainer(cfg, restore_dir=ckpt, learning_rate=sched,
                        weight_decay=0.1, grad_clip=1.0,
                        param_dtype=jnp.float32, moment_dtype="int8")
    assert st8.step == 2
    jax.tree.map(np.testing.assert_array_equal,
                 st.full_params(), st8.full_params())
    nxt = _batch(cfg, rng)
    m32 = st.train_step(nxt, key)
    m8 = st8.train_step(nxt, key)
    # Same params + same batch => identical loss; only the applied update
    # differs by the <=6% moment-code error.
    np.testing.assert_allclose(m32["loss"], m8["loss"], rtol=1e-6)
    assert np.isfinite(m8["grad_norm"])

    # Round-trip the other way: int8 checkpoint -> fp32 trainer.
    ck8 = str(tmp_path / "ck8")
    st8.save(ck8)
    st32b = StreamTrainer(cfg, restore_dir=ck8, learning_rate=sched,
                          weight_decay=0.1, grad_clip=1.0,
                          param_dtype=jnp.float32, moment_dtype="float32")
    assert st32b.step == 3
    m = st32b.train_step(_batch(cfg, rng), key)
    assert np.isfinite(m["loss"])


def test_stream_optimizerless_restore_aligns_outer_schedule(tmp_path):
    """include_optimizer=False restore: outer optimizer count matches the
    resumed step (not 0), so the LR schedule stays consistent."""
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 2, 10)
    st = StreamTrainer(cfg, params, learning_rate=sched)
    rng = np.random.default_rng(0)
    for _ in range(3):
        st.train_step(_batch(cfg, rng), jax.random.PRNGKey(7))
    ckpt = str(tmp_path / "ck")
    st.save(ckpt, include_optimizer=False)
    st2 = StreamTrainer(cfg, restore_dir=ckpt, learning_rate=sched)
    assert st2.step == 3
    assert int(st2.outer_state.count) == 3


def test_stream_cli_param_offload_end_to_end(tmp_path):
    """`train.cli --param_offload` trains from a text dataset, writes a
    streaming checkpoint, and resumes from it."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.make_sample_dataset import build
    from unimoe_audio_tpu.train.cli import main

    cfg = tiny_test_config()
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    cfg.save_json(os.path.join(model_dir, "config.json"))
    data_path = str(tmp_path / "ds")
    build(data_path, n=4, with_images=False)
    out_dir = str(tmp_path / "out")

    argv = [
        "--model_name_or_path", model_dir,
        "--data_path", data_path,
        "--output_dir", out_dir,
        "--param_offload",
        "--per_device_train_batch_size", "2",
        "--max_steps", "2",
        "--num_train_epochs", "8",
        "--logging_steps", "1",
        "--save_steps", "0",
        "--model_max_length", "64",
    ]
    assert main(argv) == 0
    assert os.path.isfile(os.path.join(out_dir, "train_done.json"))
    assert os.path.isfile(os.path.join(out_dir, "stream_ckpt", "meta.json"))
    assert open(os.path.join(out_dir, "metrics.jsonl")).read().strip()

    # Second invocation resumes from the stream checkpoint and extends.
    argv[argv.index("--max_steps") + 1] = "3"
    assert main(argv) == 0
    import json as _json

    meta = _json.load(open(os.path.join(out_dir, "stream_ckpt", "meta.json")))
    assert meta["count"] == 3


def test_stream_evaluate_forward_only():
    """evaluate(): params untouched, deterministic, and (jitter off) the
    eval loss matches the training loss on the same params/batch."""
    cfg = _nojitter_cfg(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    b1, b2 = _batch(cfg, rng), _batch(cfg, rng)
    before = st.full_params()
    em1 = st.evaluate([b1, b2])
    em2 = st.evaluate([b1, b2])
    assert em1 == em2
    assert np.isfinite(em1["eval_loss"])
    assert st.step == 0
    jax.tree.map(np.testing.assert_array_equal, before, st.full_params())
    # Same params, same batch, jitter off: training-step loss == eval loss.
    m = st.train_step(b1, jax.random.PRNGKey(1))
    st2 = StreamTrainer(cfg, params, learning_rate=1e-3)
    em_b1 = st2.evaluate([b1])
    np.testing.assert_allclose(m["loss"], em_b1["eval_loss"], rtol=1e-4)
    assert em1["eval_loss"] == pytest.approx(
        (st2.evaluate([b1])["eval_loss"] + st2.evaluate([b2])["eval_loss"]) / 2,
        rel=1e-6)


def test_stream_cli_grad_accum(tmp_path):
    """`--param_offload --gradient_accumulation_steps 2`: micro-batches
    group into one applied step each."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.make_sample_dataset import build
    from unimoe_audio_tpu.train.cli import main

    cfg = tiny_test_config()
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir)
    cfg.save_json(os.path.join(model_dir, "config.json"))
    data_path = str(tmp_path / "ds")
    build(data_path, n=10, with_images=False)
    out_dir = str(tmp_path / "out")

    assert main([
        "--model_name_or_path", model_dir,
        "--data_path", data_path,
        "--output_dir", out_dir,
        "--param_offload",
        "--gradient_accumulation_steps", "2",
        "--per_device_train_batch_size", "2",
        "--max_steps", "2",
        "--logging_steps", "1",
        "--save_steps", "0",
        "--model_max_length", "64",
        # 10 samples -> 2 eval hold-outs + 8 train = 4 micro / 2 applied.
        "--eval_ratio", "0.2",
        "--eval_steps", "2",
    ]) == 0
    import json as _json

    done = _json.load(open(os.path.join(out_dir, "train_done.json")))
    assert done["steps"] == 2  # 4 micro-batches -> 2 applied steps
    rows = [_json.loads(l) for l in
            open(os.path.join(out_dir, "metrics.jsonl"))]
    train_rows = [r for r in rows if "micro_batches" in r]
    assert all(r["micro_batches"] == 2.0 for r in train_rows)
    evals = [r for r in rows if "eval_loss" in r]
    assert evals and all(np.isfinite(r["eval_loss"]) for r in evals), \
        "stream CLI --eval_ratio produced no eval rows"


def test_stream_text_labels_requires_lm_head():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    b = _batch(cfg, rng)
    b["labels"] = jnp.zeros_like(b["input_ids"])
    with pytest.raises(ValueError):
        st.train_step(b, jax.random.PRNGKey(0))


def _nojitter_cfg(**kw):
    """Jitter off + constant aux weight: the forward is then deterministic
    in the batch alone, so accumulated micro-steps can be compared exactly
    against a single step."""
    return tiny_test_config(
        router_jitter_noise=0.0, input_jitter_noise=0.0,
        l_aux_weight=0.01, min_l_aux_weight=0.01, **kw)


def test_stream_grad_accum_identical_micros_match_single():
    """train_step([b, b]) applies the clipped MEAN gradient: with two
    identical micro-batches that equals train_step(b) exactly in fp32
    ((2g)·(s/2) == g·s bitwise)."""
    cfg = _nojitter_cfg(num_hidden_layers=3)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    a = StreamTrainer(cfg, params, learning_rate=1e-3, weight_decay=0.1,
                      grad_clip=1.0)
    b_tr = StreamTrainer(cfg, params, learning_rate=1e-3, weight_decay=0.1,
                         grad_clip=1.0)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    b = _batch(cfg, rng)
    m1 = a.train_step(b, key)
    m2 = b_tr.train_step([b, b], key)
    assert m2["micro_batches"] == 2.0
    assert b_tr.step == 1
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=1e-6)
    np.testing.assert_allclose(m1["grad_norm"], m2["grad_norm"], rtol=1e-5)
    pa, pb = a.full_params(), b_tr.full_params()
    for (path, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(pa)[0],
            jax.tree_util.tree_flatten_with_path(pb)[0]):
        np.testing.assert_allclose(
            x, y, atol=1e-7,
            err_msg=f"accum drift at {jax.tree_util.keystr(path)}")


def test_stream_grad_accum_distinct_micros_train():
    """Accumulation over distinct micro-batches: one applied step per list,
    loss decreases, and a single-element list matches the dict spelling."""
    cfg = _nojitter_cfg(num_hidden_layers=2)
    st = StreamTrainer(cfg, rng=jax.random.PRNGKey(3), learning_rate=3e-3)
    rng = np.random.default_rng(1)
    b1, b2 = _batch(cfg, rng), _batch(cfg, rng)
    losses = [st.train_step([b1, b2], jax.random.PRNGKey(5))["loss"]
              for _ in range(5)]
    assert st.step == 5
    assert losses[-1] < losses[0]
    m = st.train_step([b1], jax.random.PRNGKey(5))
    assert "micro_batches" not in m and st.step == 6


def test_stream_grad_accum_nan_micro_skips_whole_step():
    cfg = _nojitter_cfg(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    st.layers_host[1]["attn"]["q_proj"]["w"] = (
        st.layers_host[1]["attn"]["q_proj"]["w"].at[0, 0].set(jnp.nan))
    before = st.full_params()
    m = st.train_step([_batch(cfg, rng), _batch(cfg, rng)],
                      jax.random.PRNGKey(0))
    assert m["skipped"] == 1.0
    assert st.step == 0
    jax.tree.map(np.testing.assert_array_equal, before, st.full_params())


def test_stream_grad_accum_mixed_label_kinds_raises():
    cfg = _nojitter_cfg(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3, train_lm_head=True)
    rng = np.random.default_rng(0)
    b1 = _batch(cfg, rng)
    b2 = _batch(cfg, rng)
    b2["labels"] = jnp.asarray(
        rng.integers(0, cfg.text_config.vocab_size, b2["input_ids"].shape),
        jnp.int32)
    with pytest.raises(ValueError):
        st.train_step([b1, b2], jax.random.PRNGKey(0))


def test_stream_text_labels_with_lm_head():
    cfg = tiny_test_config(num_hidden_layers=2)
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    st = StreamTrainer(cfg, params, learning_rate=1e-3, train_lm_head=True)
    rng = np.random.default_rng(0)
    b = _batch(cfg, rng)
    b["labels"] = jnp.asarray(
        rng.integers(0, cfg.text_config.vocab_size, b["input_ids"].shape),
        jnp.int32)
    out = st.train_step(b, jax.random.PRNGKey(0))
    assert out["skipped"] == 0.0 and np.isfinite(out["loss"])
    assert st.step == 1
