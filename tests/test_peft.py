"""PEFT parity tests: prompt-tuning / P-tuning / prefix-tuning
(reference: UniMoEV2-Preview/training/training_utils.py:121-163; LoRA is
covered by tests/test_lora.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimoe_audio_tpu.config import tiny_test_config
from unimoe_audio_tpu.models.model import init_model_params, text_model_forward
from unimoe_audio_tpu.models.layers import KVCache
from unimoe_audio_tpu.train import peft as P


def _cfg():
    return tiny_test_config()


def _train_one(params, cfg, pattern, steps=2):
    from unimoe_audio_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    opt = make_optimizer(learning_rate=1e-2, total_steps=4, warmup_steps=1,
                         trainable_pattern=pattern)
    state = init_train_state(params, opt)
    B, T, C = 2, 8, cfg.codec_channels
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(B, T, C)).astype(np.int32)
    batch = {
        "input_ids": jnp.full((B, T), cfg.codec_placeholder_value, jnp.int32),
        "codec_input_ids": jnp.asarray(codec),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.asarray(codec),
    }
    step = jax.jit(lambda s, b, r: train_step(s, b, r, cfg=cfg, optimizer=opt,
                                              remat=False))
    for i in range(steps):  # step 0 is lr==0 (warmup)
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    return state, metrics


@pytest.mark.parametrize("mode,init", [
    ("prompt", P.init_prompt_tuning),
    ("ptuning", P.init_p_tuning),
    ("prefix", P.init_prefix_tuning),
])
def test_peft_trains_adapters_only(mode, init):
    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params["peft"] = init(jax.random.PRNGKey(1), cfg)
    emb_before = np.asarray(params["embed_tokens"]).copy()
    peft_before = jax.tree.map(lambda x: np.asarray(x).copy(), params["peft"])

    state, metrics = _train_one(params, cfg, pattern="peft")
    assert np.isfinite(float(metrics["loss"]))
    emb_moved = float(np.abs(np.asarray(state.params["embed_tokens"]) - emb_before).max())
    peft_moved = max(
        float(np.abs(np.asarray(a) - b).max())
        for a, b in zip(jax.tree.leaves(state.params["peft"]),
                        jax.tree.leaves(peft_before))
    )
    assert emb_moved == 0, "base must stay frozen under pattern='peft'"
    assert peft_moved > 0, f"{mode} adapters must receive updates"


def test_prepend_virtual_tokens_shapes():
    cfg = _cfg()
    peft = P.init_prompt_tuning(jax.random.PRNGKey(0), cfg, n_virtual=4)
    virt = P.virtual_embeds(peft)
    assert virt.shape == (4, cfg.text_config.hidden_size)
    B, T = 2, 6
    batch = {
        "input_ids": jnp.ones((B, T), jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.ones((B, T), jnp.int32),
        "codec_labels": jnp.ones((B, T, cfg.codec_channels), jnp.int32),
    }
    emb = jnp.zeros((B, T, cfg.text_config.hidden_size))
    out, emb2 = P.prepend_virtual_tokens(batch, emb, virt)
    assert emb2.shape == (B, T + 4, cfg.text_config.hidden_size)
    assert out["input_ids"].shape == (B, T + 4)
    assert np.all(np.asarray(out["labels"][:, :4]) == -100)
    assert np.all(np.asarray(out["codec_labels"][:, :4]) == -100)
    assert np.all(np.asarray(out["attention_mask"][:, :4]) == 1)


def test_ptuning_encoder_differs_from_table():
    cfg = _cfg()
    pt = P.init_p_tuning(jax.random.PRNGKey(0), cfg)
    virt = P.virtual_embeds(pt)
    assert virt.shape[0] == P.N_VIRTUAL_TOKENS
    # encoder output differs from the raw table (the MLP re-parameterizes)
    assert float(jnp.abs(virt - pt["ptuning"]["embed"]).max()) > 0


def test_prefix_nocache_matches_cache_path():
    """The no-cache prefix concat (training path) and the cache-slot
    injection (generation prefill) are the same computation."""
    cfg = _cfg()
    tc = cfg.text_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    peft = P.init_prefix_tuning(jax.random.PRNGKey(1), cfg, n_virtual=3)
    pk, pv = P.prefix_kv(peft, cfg)
    n = 3
    B, T = 2, 6
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, T, tc.hidden_size)) * 0.1
    pos = jnp.broadcast_to((jnp.arange(T) + n)[None, None], (3, B, T))
    mask = jnp.ones((B, T), jnp.int32)

    out_nc = text_model_forward(
        params, emb, pos, tc, kv_valid_mask=mask, prefix_kv=(pk, pv),
    )

    T_total = n + T + 2
    cache = KVCache.create(tc.num_hidden_layers, B, T_total,
                           tc.num_key_value_heads, tc.head_dim, dtype=jnp.float32)
    shape = (tc.num_hidden_layers, n, B) + pk.shape[2:]
    cache = KVCache(
        k=cache.k.at[:, :n].set(jnp.broadcast_to(pk[:, :, None], shape)),
        v=cache.v.at[:, :n].set(jnp.broadcast_to(pv[:, :, None], shape)),
    )
    kv_valid = jnp.concatenate(
        [jnp.ones((B, n), jnp.int32), mask, jnp.zeros((B, 2), jnp.int32)], axis=-1)
    out_c = text_model_forward(
        params, emb, pos, tc, kv_cache=cache, cache_position=jnp.int32(n),
        kv_valid_mask=kv_valid,
    )
    np.testing.assert_allclose(
        np.asarray(out_nc.last_hidden_state), np.asarray(out_c.last_hidden_state),
        rtol=2e-5, atol=2e-6,
    )


def test_prefix_generation_runs_and_matters():
    from unimoe_audio_tpu.codec import delay as dl
    from unimoe_audio_tpu.generate.loop import generate_jit, pad_buffer

    cfg = _cfg()
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    peft = P.init_prefix_tuning(jax.random.PRNGKey(7), cfg, n_virtual=4)
    pkv = P.prefix_kv(peft, cfg)

    B = 2
    ids = jnp.ones((2 * B, 6), jnp.int32)
    attn = jnp.ones((2 * B, 6), jnp.int32)
    prefill, steps = dl.prepare_audio_prompt(
        [None] * B, num_channels=cfg.codec_channels,
        bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
    buf = pad_buffer(prefill, 24)
    kw = dict(max_tokens=24, min_tokens=jnp.int32(4),
              cfg_scale=jnp.float32(1.0), temperature=jnp.float32(1.0),
              top_p=jnp.float32(1.0), cfg_filter_top_k=8,
              eos_prob_mul_factor=jnp.float32(1.0), do_sample=False)
    res_p = generate_jit(params, cfg, ids, attn, None, buf,
                         jnp.asarray(steps, jnp.int32), jax.random.PRNGKey(1),
                         prefix_kv=pkv, **kw)
    res_0 = generate_jit(params, cfg, ids, attn, None, buf,
                         jnp.asarray(steps, jnp.int32), jax.random.PRNGKey(1),
                         **kw)
    assert res_p.codes.shape == res_0.codes.shape
    # A random prefix must change the greedy decode (it is attended).
    assert not np.array_equal(np.asarray(res_p.codes), np.asarray(res_0.codes))


def test_cli_peft_flags_parse():
    from unimoe_audio_tpu.train.cli import build_parser

    args = build_parser().parse_args([
        "--model_name_or_path", "x", "--data_path", "y",
        "--peft_mode", "prefix",
    ])
    assert args.peft_mode == "prefix"
    args = build_parser().parse_args([
        "--model_name_or_path", "x", "--data_path", "y",
        "--peft_mode", "lora", "--lora_r", "8",
    ])
    assert args.lora_r == 8


@pytest.mark.parametrize("mode,init2", [
    ("prefix", P.init_prefix_tuning),
    ("prompt", P.init_prompt_tuning),
])
def test_peft_train_save_generate_round_trip(tmp_path, mode, init2):
    """Adapters train -> save_pretrained -> UniMoEAudio load -> generation
    applies them (output differs from the base model; HF get_peft_model
    parity: adapters are active at inference)."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_api import StubTokenizer
    from unimoe_audio_tpu.api import UniMoEAudio
    from unimoe_audio_tpu.models.model import init_model_params as imp
    from unimoe_audio_tpu.train.trainer import Trainer, TrainerConfig

    cfg = _cfg()
    params = imp(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    base_dir = str(tmp_path / "base")
    tr0 = Trainer(cfg, jax.tree.map(lambda x: x, params),
                  TrainerConfig(total_steps=1, warmup_steps=0, save_every=0,
                                ckpt_dir=None, remat=False))
    tr0.save_pretrained(base_dir)

    params["peft"] = init2(jax.random.PRNGKey(9), cfg)
    tcfg = TrainerConfig(learning_rate=5e-2, total_steps=3, warmup_steps=1,
                         log_every=1, save_every=0, ckpt_dir=None, remat=False,
                         trainable_pattern="peft")
    tr = Trainer(cfg, params, tcfg)
    rng = np.random.default_rng(0)
    codec = rng.integers(0, cfg.codec_eos_value, size=(2, 8, cfg.codec_channels)).astype(np.int32)
    batch = {
        "input_ids": np.full((2, 8), cfg.codec_placeholder_value, np.int64),
        "codec_input_ids": codec,
        "attention_mask": np.ones((2, 8), np.int64),
        "codec_labels": codec,
    }
    tr.fit(iter([batch] * 3))
    peft_dir = str(tmp_path / "peft")
    tr.save_pretrained(peft_dir)

    tok = StubTokenizer(cfg)
    m_base = UniMoEAudio(base_dir, dtype=jnp.float32, tokenizer=tok,
                         max_tokens=12, min_tokens=4)
    m_peft = UniMoEAudio(peft_dir, dtype=jnp.float32, tokenizer=tok,
                         max_tokens=12, min_tokens=4)
    assert "peft" in m_peft.params
    p0 = m_base.text_to_music("tune", output_dir=str(tmp_path / "o0"),
                              do_sample=False, seed=0)
    p1 = m_peft.text_to_music("tune", output_dir=str(tmp_path / "o1"),
                              do_sample=False, seed=0)
    # no DAC weights in the export dir -> outputs are raw code arrays
    c0, c1 = np.load(p0[0]), np.load(p1[0])
    assert c1.size > 0
    n = min(c0.shape[0], c1.shape[0])
    # adapters must change the greedy output
    assert not np.array_equal(c0[:n], c1[:n])


def test_prompt_tuning_trains_with_vision_batch():
    """Regression: soft-prompt embeddings must survive the vision branch's
    inputs_embeds rebuild — adapter grads were silently zero when a batch
    carried pixel_values."""
    from unimoe_audio_tpu.models.vision import vision_indices
    from unimoe_audio_tpu.train.step import (
        init_train_state, make_optimizer, train_step,
    )

    cfg = tiny_test_config(with_vision=True)
    vcfg = cfg.vision_config
    params = init_model_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    from unimoe_audio_tpu.models.vision import init_vision_params

    params["vision"] = init_vision_params(jax.random.PRNGKey(2), vcfg,
                                          dtype=jnp.float32)
    params["peft"] = P.init_prompt_tuning(jax.random.PRNGKey(1), cfg)
    peft_before = np.asarray(params["peft"]["prompt"]["embed"]).copy()

    grid = np.array([[1, 4, 4]])
    pd = vcfg.in_channels * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    pv = np.random.default_rng(0).normal(size=(16, pd)).astype(np.float32)
    ids = np.full((1, 12), 7, np.int32)
    ids[0, 2:6] = cfg.image_token_id
    labels = ids.copy(); labels[:, :8] = -100
    idx = vision_indices(grid, vcfg, pad_merged_to=8)
    pv_pad = np.concatenate([pv, np.zeros((4 * 4, pd), pv.dtype)])
    batch = {
        "input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones_like(jnp.asarray(ids)),
        "vision_patches": jnp.asarray(pv_pad),
        "vision_pos": jnp.asarray(idx["pos"]),
        "vision_win_ids": jnp.asarray(idx["win_ids"]),
        "vision_sample_ids": jnp.asarray(idx["sample_ids"]),
        "vision_widx": jnp.asarray(idx["widx"]),
        "vision_reverse": jnp.asarray(idx["reverse"]),
    }
    opt = make_optimizer(learning_rate=1e-2, total_steps=4, warmup_steps=1,
                         trainable_pattern="peft")
    state = init_train_state(params, opt)
    for i in range(2):  # step 0 has lr 0 (warmup)
        state, m = train_step(state, batch, jax.random.PRNGKey(i), cfg=cfg,
                              optimizer=opt, remat=False)
    moved = float(np.abs(
        np.asarray(state.params["peft"]["prompt"]["embed"]) - peft_before).max())
    assert np.isfinite(float(m["loss"]))
    assert moved > 0, "soft-prompt adapter got zero gradient with vision batch"
