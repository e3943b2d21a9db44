"""UniMoEAudio — the user-facing task API (TTS / T2M / VT2M).

TPU-native port of the reference's high-level class
(reference: utils/UniMoE_Audio_mod.py:38-624 and the checkpoint variant
UniMoE_Audio.py:39-261): same method names, same prompt templates, same
generation defaults.  Differences under the hood:
  * model + codec are JAX param pytrees; generation is one jitted XLA
    program (generate_jit) instead of a Python decode loop;
  * text lengths are padded to buckets so repeated calls reuse compiles;
  * weights load from a converted pickle (core.convert) or random-init for
    development (`allow_random=True`).
"""

from __future__ import annotations

import os
import pickle
import time
from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from .codec import audio_io
from .codec import delay as dl
from .codec.dac_wrapper import Dac
from .config import UniMoEAudioConfig, tiny_test_config
from .generate.loop import generate_jit, pad_buffer
from .models.model import align_codec_ids, init_model_params

# Prompt templates (reference: utils/UniMoE_Audio_mod.py:56-59).
SYSTEM_MESSAGE = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
INPUT_FORMAT = "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
AUDIO_START = "<|AUDIO_START|>"
DEFAULT_VIDEO_PROMPT = "{}"

SPECIAL_TOKENS = [
    "<|AUDIO_PLACEHOLDER|>", "<|AUDIO_START|>", "<|AUDIO_END|>",
    "<|SPEECH_START|>", "<|SPEECH_END|>",
    "<|VOICE_PROMPT_START|>", "<|VOICE_PROMPT_END|>",
    "<|SPEECH_PROMPT_START|>", "<|SPEECH_PROMPT_END|>",
    "<|MUSIC_START|>", "<|MUSIC_END|>",
]


T2M_NEGATIVE_CAPTION = "Low quality."


def music_span(caption: str) -> str:
    """The caption markup every music prompt embeds."""
    return "<|MUSIC_START|>" + caption + "<|MUSIC_END|>"


def t2m_prompt(caption: str) -> str:
    """The ONE T2M serving prompt layout — shared by every T2M entry
    point (batch, stream, speculative, TTFA harness) AND the int4-gptq
    calibration pass, which must quantize against exactly this
    distribution: a template edit here changes serving and calibration
    together."""
    return SYSTEM_MESSAGE + INPUT_FORMAT.format(music_span(caption)) \
        + AUDIO_START


def _bucket(n: int, step: int = 64) -> int:
    return max(step, ((n + step - 1) // step) * step)


class UniMoEAudio:
    """Unified speech + music generation (reference surface:
    UniMoE_Audio.py:105-257)."""

    MAX_TOKENS = 1000   # ≤20 s audio at 50 frames/s (utils/UniMoE_Audio_mod.py:45)
    MIN_TOKENS = 100

    def __init__(
        self,
        model_path: Optional[str] = None,
        device_id: int = 0,
        *,
        dtype=jnp.bfloat16,
        tokenizer=None,
        allow_random: bool = False,
        config: Optional[UniMoEAudioConfig] = None,
        dac_weights: Optional[str] = None,
        max_tokens: Optional[int] = None,
        min_tokens: Optional[int] = None,
        serving_mode: bool = False,
        gptq_calibration: Optional[dict] = None,
        kv_cache_dtype: Optional[str] = None,
        a8_compute: bool = True,
    ):
        """serving_mode applies the tuned single-chip serving stack:
        weight-only quantization, lane-padded expert FFNs, and
        capacity-packed dispatch in both prefill and decode (the bench
        configuration).  True or "int8" = int8 everywhere quantizable
        (near-lossless, ~1.9× decode throughput over the exact dense
        path); "int4" additionally stores the EXPERT FFNs as packed s4
        (half the dominant weight stream — the single-stream/low-batch
        latency operating point, ~1.35× over int8 there; numerics table
        in docs/STATUS.md).  "int4-gptq" is the same int4 layout with
        error-compensated weights (ops/gptq.py): at load time the
        UNQUANTIZED model greedily generates short continuations for a
        small caption set and the expert FFNs are quantized against the
        Hessians of those (prompt + audio) sequences — the serving
        distribution itself, CFG negative rows included.  Same speed as
        "int4", substantially closer logits (docs/STATUS.md); costs one
        short generation + per-layer GPTQ pass at load.
        gptq_calibration overrides the defaults:
        {"captions": [...], "frames": int, "group_size": int}.
        kv_cache_dtype="int8" stores the decode KV cache int8 with
        per-(position, head) scales — halves the per-step KV stream,
        which at 20 s generations (max_tokens≈1000) rivals the int8
        weight stream (models/layers.KVCache).
        a8_compute (default True) runs packed-dispatch expert FFNs on
        the int8 MXU path ('packed_a8': per-row int8 activation quant,
        s8×s8→s32 dots at 2× the bf16 rate — measured +25% aggregate
        RTF at B=88, +0.0002 KL; docs/ROOFLINE.md).  It only engages
        where serving_mode enables packed dispatch AND the expert
        weights are per-channel QTensors (otherwise bit-identical
        fallback); pass False to force bf16 expert compute."""
        del device_id  # JAX targets the default device; kept for API parity
        self.MAX_TOKENS = max_tokens if max_tokens is not None else UniMoEAudio.MAX_TOKENS
        self.MIN_TOKENS = min_tokens if min_tokens is not None else UniMoEAudio.MIN_TOKENS

        from .core.export import SERVING_SNAPSHOT

        snapshot = (model_path is not None and os.path.isfile(
            os.path.join(model_path, SERVING_SNAPSHOT)))
        if snapshot:
            # Pre-quantized serving snapshot (save_serving_snapshot):
            # params load already quantized/padded/calibrated — the
            # quantization pass below (and int4-gptq's self-calibration
            # generation) is skipped entirely.
            from .core.export import load_serving_snapshot

            self.config, self.params, snap_mode, snap_kv = \
                load_serving_snapshot(model_path)
            assert serving_mode in (False, snap_mode), (
                f"snapshot was quantized as {snap_mode!r}; pass "
                f"serving_mode={snap_mode!r} or omit it")
            serving_mode = snap_mode
            kv_cache_dtype = kv_cache_dtype or snap_kv
        else:
            self.config, self.params = self._load_model(
                model_path, dtype=dtype, allow_random=allow_random,
                config=config)
        assert serving_mode in (False, True, "int8", "int4", "int4-gptq"), serving_mode
        assert kv_cache_dtype in (None, "int8"), kv_cache_dtype
        self.serving_mode = serving_mode
        self.kv_cache_dtype = kv_cache_dtype
        self.a8_compute = a8_compute
        self.tokenizer = tokenizer or self._load_tokenizer(model_path)
        if self.tokenizer is None and allow_random:
            # Self-contained dev mode: hash-vocab tokenizer with the special
            # tokens mapped onto this config's ids.
            from .train.data import SimpleTokenizer

            special = {t: 100 + i for i, t in enumerate(SPECIAL_TOKENS)}
            special["<|AUDIO_PLACEHOLDER|>"] = self.config.codec_placeholder_value
            special["<|vision_start|>"] = self.config.vision_start_token_id
            special["<|vision_end|>"] = self.config.vision_end_token_id
            special["<|video_pad|>"] = self.config.video_token_id
            self.tokenizer = SimpleTokenizer(
                vocab_size=min(self.config.text_config.vocab_size, 10000),
                special=special,
            )
        self.dac = self._load_dac(model_path, dac_weights, allow_random)
        self._compiled_shapes = set()

        if serving_mode and not snapshot:
            from .ops.quant import (
                pad_expert_ffn, quantize_model_params_inplace,
                quantize_vision_params, requantize_experts_int4_inplace,
            )

            if serving_mode == "int4-gptq":
                # Experts first (from the full-precision weights, self-
                # calibrated through the tokenizer set up above); the int8
                # pass below skips QTensor leaves and pad_expert_ffn
                # no-ops on the already-padded experts.
                self._gptq_quantize_experts(**(gptq_calibration or {}))
            self.params = quantize_model_params_inplace(self.params)
            self.params = pad_expert_ffn(self.params)
            if serving_mode == "int4":
                self.params = requantize_experts_int4_inplace(self.params)
            if "vision" in self.params:
                self.params["vision"] = quantize_vision_params(
                    self.params["vision"])

    def save_serving_snapshot(self, out_dir: str) -> str:
        """Persist the quantized serving params (QTensor leaves, packed
        s4 included) + config + mode; a UniMoEAudio pointed at `out_dir`
        loads them directly and skips the quantization pass — for
        "int4-gptq", minutes of self-calibration at flagship size."""
        assert self.serving_mode, \
            "snapshots capture QUANTIZED serving params; no serving_mode set"
        from .core.export import save_serving_snapshot

        path = save_serving_snapshot(
            self.params, self.config, out_dir,
            serving_mode=self.serving_mode,
            kv_cache_dtype=self.kv_cache_dtype)
        if hasattr(self.tokenizer, "save_pretrained"):
            try:  # HF tokenizers ride along so the dir is self-contained
                self.tokenizer.save_pretrained(out_dir)
            except Exception:  # noqa: BLE001 — snapshot stays usable
                pass
        return path

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------
    def _load_model(self, model_path, *, dtype, allow_random, config):
        if model_path is not None:
            jax_blob = os.path.join(model_path, "model.jax.pkl")
            if os.path.isfile(jax_blob):
                with open(jax_blob, "rb") as f:
                    blob = pickle.load(f)
                cfg = UniMoEAudioConfig.from_dict(blob["config"])
                params = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), blob["params"])
                return cfg, params
            cfg_json = os.path.join(model_path, "config.json")
            if os.path.isfile(cfg_json):
                cfg = UniMoEAudioConfig.from_json(cfg_json)
                has_st = any(f.endswith(".safetensors") for f in os.listdir(model_path))
                if has_st:
                    from .core.convert import convert_model_state_dict, load_hf_safetensors

                    sd = load_hf_safetensors(model_path)
                    params = convert_model_state_dict(sd, cfg)
                    params = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), params)
                    return cfg, params
                if allow_random:
                    return cfg, self._jit_init(cfg, dtype, with_vision=False)
            raise FileNotFoundError(
                f"No model weights found under {model_path} (looked for "
                "model.jax.pkl / *.safetensors)."
            )
        if not allow_random:
            raise ValueError("model_path is required unless allow_random=True")
        cfg = config or tiny_test_config()
        return cfg, self._jit_init(cfg, dtype, with_vision=True)

    @staticmethod
    def _jit_init(cfg, dtype, *, with_vision):
        """Jitted random init: eager init materializes fp32 intermediates
        per leaf and fragments the 16 GB HBM at flagship scale (the same
        trap bench.py / __graft_entry__ guard against)."""
        import functools

        init = jax.jit(functools.partial(
            init_model_params, cfg=cfg, dtype=dtype, with_vision=with_vision))
        params = init(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        return params

    @staticmethod
    def _load_tokenizer(model_path):
        if model_path is None:
            return None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_path, padding_side="left")
            assert all(len(tok([t]).input_ids[0]) == 1 for t in SPECIAL_TOKENS), (
                "special tokens must each map to a single id "
                "(reference: utils/UniMoE_Audio_mod.py:111-120)"
            )
            return tok
        except Exception:
            return None

    def _load_dac(self, model_path, dac_weights, allow_random):
        try:
            from .codec.dac import DACConfig, tiny_dac_config

            cfg = None
            if allow_random and self.config.codec_channels != 12:
                # Development mode with the tiny model config.
                cfg = tiny_dac_config()
                import dataclasses
                cfg = dataclasses.replace(cfg, n_codebooks=self.config.codec_channels)
            return Dac(dac_weights, allow_random=allow_random, config=cfg)
        except FileNotFoundError:
            return None

    # ------------------------------------------------------------------
    # Preprocessing
    # ------------------------------------------------------------------
    def _tokenize(self, texts: List[str]):
        if self.tokenizer is None:
            raise RuntimeError(
                "No tokenizer available — pass tokenizer= or a model_path with "
                "tokenizer files."
            )
        out = self.tokenizer(
            texts, add_special_tokens=False, padding=True, return_tensors="np"
        )
        ids = np.asarray(out["input_ids"], dtype=np.int32)
        mask = np.asarray(out["attention_mask"], dtype=np.int32)
        # Bucket text length (LEFT padding — reference tokenizer is created
        # with padding_side='left', utils/UniMoE_Audio_mod.py:102-105).
        T = _bucket(ids.shape[1])
        if T > ids.shape[1]:
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            pad = np.full((ids.shape[0], T - ids.shape[1]), pad_id, dtype=np.int32)
            ids = np.concatenate([pad, ids], axis=1)
            mask = np.concatenate([np.zeros_like(pad), mask], axis=1)
        return ids, mask

    def _preprocess_codec(self, codec) -> np.ndarray:
        return dl.preprocess_codec(
            np.asarray(codec),
            delay_pattern=self.config.codec_delay_pattern,
            num_channels=self.config.codec_channels,
            bos_value=self.config.codec_bos_value,
            eos_value=self.config.codec_eos_value,
            pad_value=self.config.codec_pad_value,
        )

    # ------------------------------------------------------------------
    # GPTQ self-calibration (serving_mode="int4-gptq")
    # ------------------------------------------------------------------
    GPTQ_CALIB_CAPTIONS = [
        "Upbeat electronic dance track with a driving bassline.",
        "Gentle acoustic guitar ballad, warm and intimate.",
        "Orchestral film score with sweeping strings and brass.",
        "Lo-fi hip hop beat with vinyl crackle and mellow keys.",
        "Fast bebop jazz with a saxophone solo and walking bass.",
        "Ambient drone with slowly evolving synthesizer pads.",
        "Heavy metal riff with distorted guitars and double kick drums.",
        "Solo piano nocturne, melancholic and sparse.",
    ]

    def _gptq_quantize_experts(self, captions=None, frames: int = 64,
                               group_size: int = 0,
                               max_calib_tokens: int = 4096):
        """Self-calibrating GPTQ expert conversion (ops/gptq.py).

        The still-unquantized model greedily generates `frames` audio
        frames for each calibration caption (T2M prompt template, CFG
        pairs — the exact serving layout), then the expert FFNs are
        quantized against Hessians of those (prompt + delayed audio)
        sequences.  Both rows of a CFG pair consume the same audio stream
        at serving time, so both enter the calibration set.  MUTATES
        self.params (expert leaves → packed-s4 QTensor)."""
        from .ops.gptq import quantize_experts_int4_gptq

        cfg = self.config
        captions = captions or self.GPTQ_CALIB_CAPTIONS
        neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
        text_input = []
        for c in captions:
            text_input.append(neg)
            text_input.append(t2m_prompt(c))
        ids, mask = self._tokenize(text_input)
        B2, Tt = ids.shape
        prefill, steps = dl.prepare_audio_prompt(
            [None] * (B2 // 2),
            num_channels=cfg.codec_channels,
            bos_value=cfg.codec_bos_value,
            delay_pattern=cfg.codec_delay_pattern,
        )
        buf = pad_buffer(prefill, frames)
        res = generate_jit(
            self.params, cfg, jnp.asarray(ids), jnp.asarray(mask), None,
            buf, jnp.asarray(steps, jnp.int32), jax.random.PRNGKey(0),
            max_tokens=frames, min_tokens=jnp.int32(frames),
            cfg_scale=jnp.float32(10.0), temperature=jnp.float32(1.0),
            top_p=jnp.float32(1.0), cfg_filter_top_k=45,
            eos_prob_mul_factor=jnp.float32(1.0), do_sample=False,
        )
        codes = np.asarray(res.codes)          # [B, frames, C] delayed-domain
        n_pre = int(np.asarray(steps)[0])
        stream = np.concatenate(
            [np.asarray(prefill)[:, :n_pre], codes], axis=1)
        stream = np.repeat(stream, 2, axis=0)  # both CFG rows see the audio
        Tc = stream.shape[1]
        full_ids = np.concatenate(
            [ids, np.full((B2, Tc), cfg.codec_placeholder_value, np.int32)],
            axis=1)
        full_mask = np.concatenate(
            [mask, np.ones((B2, Tc), np.int32)], axis=1)
        codec_full = np.zeros(
            (B2, full_ids.shape[1], cfg.codec_channels), np.int32)
        codec_full[:, Tt:] = stream
        self.params = quantize_experts_int4_gptq(
            self.params, cfg, jnp.asarray(full_ids),
            codec_input_ids=jnp.asarray(codec_full),
            attention_mask=jnp.asarray(full_mask),
            group_size=group_size, max_calib_tokens=max_calib_tokens)

    # ------------------------------------------------------------------
    # Core generation (reference: utils/UniMoE_Audio_mod.py:215-292)
    # ------------------------------------------------------------------
    def _generate_core(
        self,
        input_ids: np.ndarray,
        attention_mask: np.ndarray,
        codec_input_ids: Optional[np.ndarray],
        save_name: str,
        rebuild_codec=None,
        output_dir: str = "./",
        cfg_scale: float = 0.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        cfg_filter_top_k: int = 45,
        eos_prob_mul_factor: float = 0.6,
        do_sample: bool = True,
        seed: Optional[int] = None,
        visual_embeds: Optional[np.ndarray] = None,
        visual_mask: Optional[np.ndarray] = None,
        prefill_position_ids: Optional[np.ndarray] = None,
        rope_deltas: Optional[np.ndarray] = None,
        max_tokens: Optional[int] = None,
        min_tokens=None,
        max_tokens_vec: Optional[np.ndarray] = None,  # [B] per-sample budget
        decode_emit: Optional[bool] = None,
        sample_seeds: Optional[np.ndarray] = None,    # [B] per-request seeds
    ) -> List[str]:
        """cfg_scale / temperature / top_p / eos_prob_mul_factor /
        min_tokens accept floats OR per-sample [B] arrays (heterogeneous
        mixed-task batches, generate_mixed)."""
        cfg = self.config
        max_tokens = max_tokens if max_tokens is not None else self.MAX_TOKENS
        min_tokens = min_tokens if min_tokens is not None else self.MIN_TOKENS

        # PEFT adapters apply at inference (HF get_peft_model generates
        # with adapters; reference training_utils.py:121-163):
        #   prefix  -> learned per-layer KV injected into the cache;
        #   prompt/P-tuning -> soft tokens prepended, carried through the
        #   visual_embeds scatter (placeholder ids + embedding overrides).
        peft_prefix = None
        if isinstance(self.params, dict) and "peft" in self.params:
            from .train.peft import prefix_kv as _prefix_kv
            from .train.peft import virtual_embeds as _virtual_embeds

            peft_prefix = _prefix_kv(self.params["peft"], cfg)
            virt = _virtual_embeds(self.params["peft"])
            if virt is not None:
                assert prefill_position_ids is None, (
                    "soft-prompt adapters with explicit vision positions "
                    "are not supported yet"
                )
                n = virt.shape[0]
                R = input_ids.shape[0]
                virt_np = np.asarray(virt, dtype=np.float32)
                pad_ids = np.zeros((R, n), input_ids.dtype)
                input_ids = np.concatenate([pad_ids, input_ids], axis=1)
                attention_mask = np.concatenate(
                    [np.ones((R, n), attention_mask.dtype), attention_mask], axis=1)
                D = virt_np.shape[-1]
                ve = np.zeros(input_ids.shape + (D,), np.float32)
                vm = np.zeros(input_ids.shape, np.int32)
                ve[:, :n] = virt_np[None]
                vm[:, :n] = 1
                if visual_embeds is not None:
                    ve[:, n:] = visual_embeds
                    vm[:, n:] = visual_mask
                visual_embeds, visual_mask = ve, vm

        batch_size = input_ids.shape[0] // 2

        prefill, prefill_steps = dl.prepare_audio_prompt(
            [None] * batch_size,
            num_channels=cfg.codec_channels,
            bos_value=cfg.codec_bos_value,
            delay_pattern=cfg.codec_delay_pattern,
        )
        buf = pad_buffer(prefill, max_tokens)

        aligned = None
        if codec_input_ids is not None:
            aligned = jnp.asarray(
                align_codec_ids(input_ids, codec_input_ids, cfg.codec_placeholder_value)
            )

        # Serving mode: capacity-packed dispatch sized from the batch
        # (measured optimum ~0.64·S decode slots at mean routed k≈4.1 of
        # 8, ~0.57·S prefill; packed only pays off once the batch is wide
        # enough to amortize the dispatch overhead).
        dispatch_kw = {}
        if getattr(self, "serving_mode", False):
            S_dec = input_ids.shape[0]
            S_pre = input_ids.shape[0] * input_ids.shape[1]
            # a8: int8-MXU expert compute wherever packed dispatch is on
            # (graceful bit-identical fallback when the experts aren't
            # per-channel QTensors — see moe/dispatch.swiglu_expert_ffn).
            pk = "packed_a8" if getattr(self, "a8_compute", True) else "packed"
            if S_dec >= 64:
                dispatch_kw["decode_dispatch_mode"] = pk
                dispatch_kw["decode_capacity"] = -(-int(S_dec * 0.64) // 16) * 16
            if S_pre >= 1024:
                dispatch_kw["dispatch_mode"] = pk
                dispatch_kw["prefill_capacity"] = -(-int(S_pre * 0.57) // 128) * 128

        if getattr(self, "kv_cache_dtype", None):
            dispatch_kw["kv_dtype"] = self.kv_cache_dtype

        rng = jax.random.PRNGKey(seed if seed is not None else int(time.time() * 1e3) % (2**31))
        # Long generations use the chunked-cache-growth loop: every decode
        # step streams the full static KV buffer, so right-sizing it per
        # chunk (generate_chunked) bounds dead cache reads; semantically
        # identical to one generate_jit call (tested — including
        # visual_embeds/max_tokens_vec/prefix_kv: vision only affects the
        # first chunk's prefill, per-sample budgets trigger the in-loop
        # EOS machine, and the PEFT prefix length is part of the chunk
        # bucket math).  Short generations keep the single-executable path.
        gen_fn = generate_jit
        if max_tokens >= 512:
            from .generate.loop import generate_chunked

            gen_fn = generate_chunked
        res = gen_fn(
            self.params, cfg,
            jnp.asarray(input_ids), jnp.asarray(attention_mask), aligned,
            buf, jnp.asarray(prefill_steps, jnp.int32), rng,
            jnp.asarray(visual_embeds) if visual_embeds is not None else None,
            jnp.asarray(visual_mask) if visual_mask is not None else None,
            jnp.asarray(prefill_position_ids) if prefill_position_ids is not None else None,
            rope_deltas=jnp.asarray(rope_deltas, jnp.int32) if rope_deltas is not None else None,
            max_tokens=max_tokens,
            min_tokens=jnp.asarray(min_tokens, jnp.int32),
            cfg_scale=jnp.asarray(cfg_scale, jnp.float32),
            temperature=jnp.asarray(temperature, jnp.float32),
            top_p=jnp.asarray(top_p, jnp.float32),
            cfg_filter_top_k=cfg_filter_top_k,
            eos_prob_mul_factor=jnp.asarray(eos_prob_mul_factor, jnp.float32),
            do_sample=do_sample,
            max_tokens_vec=(
                jnp.asarray(max_tokens_vec, jnp.int32)
                if max_tokens_vec is not None else None
            ),
            decode_emit=decode_emit,
            prefix_kv=peft_prefix,
            sample_seeds=(jnp.asarray(sample_seeds, jnp.int32)
                          if sample_seeds is not None else None),
            **dispatch_kw,
        )

        audios = dl.generate_output(
            res.codes, res.lengths,
            pad_value=cfg.codec_pad_value, delay_pattern=cfg.codec_delay_pattern,
        )

        os.makedirs(output_dir, exist_ok=True)
        output_paths = [
            os.path.join(output_dir, f"generated_{save_name}_{i}.wav")
            for i in range(len(audios))
        ]
        if self.dac is not None:
            # ONE batched decoder forward for all streams (sequential
            # per-stream decodes cost more than the AR decode at B≈88).
            self.dac.decode_batch(
                [frames.T for frames in audios], output_paths, min_duration=1)
        else:
            output_paths = []
            for i, frames in enumerate(audios):
                p = os.path.join(output_dir, f"generated_{save_name}_{i}.wav.codes.npy")
                np.save(p, frames)
                output_paths.append(p)
        if rebuild_codec is not None and self.dac is not None:
            rebuild = np.asarray(rebuild_codec).T[None]
            for i in range(len(audios)):
                rebuild_path = os.path.join(output_dir, f"rebuild_{save_name}_{i}.wav")
                self.dac.decode(rebuild, save_path=rebuild_path)
        return output_paths

    # ------------------------------------------------------------------
    # Tasks
    # ------------------------------------------------------------------
    def text_to_music(
        self,
        caption: Union[str, List[str]],
        save_name: str = "music",
        rebuild_codec=None,
        output_dir: str = "./",
        cfg_scale: float = 10.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        cfg_filter_top_k: int = 45,
        eos_prob_mul_factor: float = 0.6,
        do_sample: bool = True,
        seed: Optional[int] = None,
        max_audio_seconds: Optional[int] = None,
        min_audio_seconds: Optional[int] = None,
        decode_emit: Optional[bool] = None,
        **_ignored,
    ) -> List[str]:
        """Text-to-music (reference: utils/UniMoE_Audio_mod.py:294-366;
        max/min_audio_seconds aliases from the checkpoint variant,
        UniMoE_Audio.py:156-170, at 50 frames/s; per-call only — they do
        not change the instance defaults)."""
        mt = int(max_audio_seconds * 50) if max_audio_seconds is not None else None
        mn = int(min_audio_seconds * 50) if min_audio_seconds is not None else None
        caption = [caption] if isinstance(caption, str) else [c for c in caption if c.strip()]
        if not caption or not all(c.strip() for c in caption):
            print("Please enter a music description.")
            return []

        neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
        text_input = []
        for c in caption:
            text_input.append(neg)
            text_input.append(t2m_prompt(c))
        ids, mask = self._tokenize(text_input)
        t0 = time.time()
        paths = self._generate_core(
            ids, mask, None, save_name, rebuild_codec, output_dir,
            cfg_scale, temperature, top_p, cfg_filter_top_k,
            eos_prob_mul_factor, do_sample, seed,
            max_tokens=mt, min_tokens=mn, decode_emit=decode_emit,
        )
        print(f"Music generation completed! Time: {time.time() - t0:.2f}s")
        return paths

    def text_to_music_stream(
        self,
        caption: str,
        *,
        chunk_frames: int = 25,
        cfg_scale: float = 10.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        cfg_filter_top_k: int = 45,
        eos_prob_mul_factor: float = 0.6,
        seed: Optional[int] = None,
    ):
        """Streaming T2M: yields {'frames', 'audio', 'done'} chunks while
        decoding continues (capability beyond the reference — its demo only
        streams status text, web_demo.py)."""
        from .generate.streaming import generate_stream

        neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
        pos = t2m_prompt(caption)
        ids, mask = self._tokenize([neg, pos])
        rng = jax.random.PRNGKey(seed if seed is not None else 0)
        yield from generate_stream(
            self.params, self.config, ids, mask, None, rng,
            max_tokens=self.MAX_TOKENS, min_tokens=self.MIN_TOKENS,
            chunk_frames=chunk_frames, cfg_scale=cfg_scale,
            temperature=temperature, top_p=top_p,
            cfg_filter_top_k=cfg_filter_top_k,
            eos_prob_mul_factor=eos_prob_mul_factor, dac=self.dac,
            kv_dtype=getattr(self, "kv_cache_dtype", None),
        )

    def text_to_speech(
        self,
        caption: Union[str, List[str]] = None,
        prompt_text: str = None,
        prompt_wav: Optional[str] = None,
        save_name: str = "speech",
        prompt_codec=None,
        rebuild_codec=None,
        output_dir: str = "./",
        cfg_scale: float = 1.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        cfg_filter_top_k: int = 45,
        eos_prob_mul_factor: float = 1.0,
        do_sample: bool = True,
        seed: Optional[int] = None,
        transcription: Union[str, List[str], None] = None,
        prompt_transcription: Optional[str] = None,
        max_audio_seconds: Optional[int] = None,
        min_audio_seconds: Optional[int] = None,
        **_ignored,
    ) -> List[str]:
        """Voice-cloning TTS (reference: utils/UniMoE_Audio_mod.py:368-481;
        transcription/prompt_transcription + max/min_audio_seconds are the
        checkpoint-variant spellings, UniMoE_Audio.py:105-118)."""
        caption = caption if caption is not None else transcription
        prompt_text = prompt_text if prompt_text is not None else prompt_transcription
        mt = int(max_audio_seconds * 50) if max_audio_seconds is not None else None
        mn = int(min_audio_seconds * 50) if min_audio_seconds is not None else None
        caption = [caption] if isinstance(caption, str) else [c for c in caption if c.strip()]
        if not caption or not all(c.strip() for c in caption):
            print("Please enter the target text.")
            return []
        if prompt_codec is None:
            if prompt_wav is None:
                print("Please provide a reference audio file.")
                return []
            if self.dac is None:
                raise RuntimeError("DAC weights unavailable — cannot encode prompt_wav")
            prompt_codec = self.dac.encode(prompt_wav)
        if not str(prompt_text).strip():
            print("Please enter the reference audio transcript.")
            return []

        codec_ids = self._preprocess_codec(prompt_codec)  # [P, C]
        n_placeholder = codec_ids.shape[0]
        prompt_caption = (
            "<|SPEECH_PROMPT_START|>" + prompt_text + "<|SPEECH_PROMPT_END|>"
            + "<|VOICE_PROMPT_START|>"
            + "<|AUDIO_PLACEHOLDER|>" * n_placeholder
            + "<|VOICE_PROMPT_END|>"
        )

        def with_target(x):
            return prompt_caption + "<|SPEECH_START|>" + x + "<|SPEECH_END|>"

        neg = SYSTEM_MESSAGE + INPUT_FORMAT.format(with_target("")) + AUDIO_START
        text_input = []
        for c in caption:
            text_input.append(neg)
            text_input.append(SYSTEM_MESSAGE + INPUT_FORMAT.format(with_target(c)) + AUDIO_START)
        ids, mask = self._tokenize(text_input)

        # Flat codec rows repeated per CFG row (reference:
        # utils/UniMoE_Audio_mod.py:466).
        flat = np.tile(codec_ids, (len(text_input), 1))
        t0 = time.time()
        paths = self._generate_core(
            ids, mask, flat, save_name, rebuild_codec, output_dir,
            cfg_scale, temperature, top_p, cfg_filter_top_k,
            eos_prob_mul_factor, do_sample, seed,
            max_tokens=mt, min_tokens=mn,
        )
        print(f"Speech generation completed! Time: {time.time() - t0:.2f}s")
        return paths

    def video_text_to_music(
        self,
        video: Union[str, List[str]],
        caption: Union[str, List[str]],
        save_name: str = "video_music",
        rebuild_codec=None,
        fps: int = 1,
        sampling_fps: int = 1,
        total_pixels: int = 3 * 28 * 28,
        max_frames: Optional[int] = 1,
        output_dir: str = "./",
        cfg_scale: float = 10.0,
        temperature: float = 1.0,
        top_p: float = 1.0,
        cfg_filter_top_k: int = 45,
        eos_prob_mul_factor: float = 0.6,
        do_sample: bool = True,
        seed: Optional[int] = None,
        **_ignored,
    ) -> List[str]:
        """Video+text-to-music (reference: utils/UniMoE_Audio_mod.py:483-619).

        Round-1 scope: the vision tower fuses video features when the model
        has a vision config AND the processor is available; otherwise the
        textual pipeline runs (captions only) with a warning.
        """
        video = [video] if isinstance(video, str) else video
        caption = [caption] if isinstance(caption, str) else caption
        assert len(video) == len(caption), "The number of videos and captions must match"

        if self.config.vision_config is None or "vision" not in self.params:
            print("[warning] model has no vision tower; generating from captions only")
            return self.text_to_music(
                caption, save_name=save_name, rebuild_codec=rebuild_codec,
                output_dir=output_dir, cfg_scale=cfg_scale, temperature=temperature,
                top_p=top_p, cfg_filter_top_k=cfg_filter_top_k,
                eos_prob_mul_factor=eos_prob_mul_factor, do_sample=do_sample, seed=seed,
            )

        from .apps.video import extract_frames, frame_process, video_to_patches
        from .models.model import get_rope_index
        from .models.vision import vision_forward

        vcfg = self.config.vision_config
        m2 = vcfg.spatial_merge_size ** 2

        text_input, all_feats, grids, spgts = [], [], [], []
        for v, c in zip(video, caption):
            if isinstance(v, str):
                frames = extract_frames(v, sampling_fps, max_frames)
                pixels = frame_process(frames, total_pixels=total_pixels,
                                       min_pixels=28 * 28)
            else:
                pixels = np.asarray(v, dtype=np.float32)  # pre-extracted [T,3,H,W]
            patches, grid = video_to_patches(
                pixels, patch_size=vcfg.patch_size,
                temporal_patch_size=vcfg.temporal_patch_size,
                merge_size=vcfg.spatial_merge_size,
            )
            feats = np.asarray(vision_forward(
                self.params["vision"], jnp.asarray(patches), grid[None], vcfg
            ))
            n_tok = patches.shape[0] // m2
            video_span = (
                "<|vision_start|>" + "<|video_pad|>" * n_tok + "<|vision_end|>"
            )
            neg = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                video_span + DEFAULT_VIDEO_PROMPT.format(
                    music_span(T2M_NEGATIVE_CAPTION))
            ) + AUDIO_START
            pos = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                video_span + DEFAULT_VIDEO_PROMPT.format(music_span(c))
            ) + AUDIO_START
            text_input.extend([neg, pos])
            all_feats.extend([feats, feats])     # video repeated for the CFG pair
            grids.extend([grid, grid])
            spgts.extend([vcfg.temporal_patch_size / fps] * 2)

        ids, mask = self._tokenize(text_input)

        # Scatter vision features at the video-token slots, row by row.
        D = self.params["embed_tokens"].shape[-1]
        visual_embeds = np.zeros((ids.shape[0], ids.shape[1], D), dtype=np.float32)
        visual_mask = (ids == self.config.video_token_id).astype(np.int32)
        for r in range(ids.shape[0]):
            slots = np.where(visual_mask[r])[0]
            assert len(slots) == all_feats[r].shape[0], (
                f"video tokens {len(slots)} != features {all_feats[r].shape[0]}"
            )
            visual_embeds[r, slots] = all_feats[r]

        position_ids, deltas = get_rope_index(
            ids, self.config, video_grid_thw=np.stack(grids),
            second_per_grid_ts=spgts, attention_mask=mask,
        )

        return self._generate_core(
            ids, mask, None, save_name, rebuild_codec, output_dir,
            cfg_scale, temperature, top_p, cfg_filter_top_k,
            eos_prob_mul_factor, do_sample, seed,
            visual_embeds=visual_embeds,
            visual_mask=visual_mask,
            prefill_position_ids=position_ids,
            rope_deltas=deltas,
        )


    def text_to_music_speculative(
        self,
        caption: str,
        *,
        save_name: str = "music_spec",
        output_dir: str = "./",
        cfg_scale: float = 10.0,
        eos_prob_mul_factor: float = 0.6,
        spec_len: int = 4,
        draft_layers: Optional[int] = None,
        max_audio_seconds: Optional[int] = None,
        min_audio_seconds: Optional[int] = None,
    ) -> List[str]:
        """Single-stream T2M via self-speculative GREEDY decoding —
        bit-identical output to text_to_music(do_sample=False), with the
        full model verifying spec_len draft frames per weight stream
        (generate/speculative.py).  Throughput scales with the draft
        agreement rate; quality is exactly equal by construction."""
        from .generate.speculative import speculative_generate_jit

        cfg = self.config
        mt = int(max_audio_seconds * 50) if max_audio_seconds else self.MAX_TOKENS
        mn = int(min_audio_seconds * 50) if min_audio_seconds else self.MIN_TOKENS
        draft_layers = draft_layers or max(1, cfg.text_config.num_hidden_layers // 4)
        neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
        pos = t2m_prompt(caption)
        ids, mask = self._tokenize([neg, pos])
        prefill, steps = dl.prepare_audio_prompt(
            [None], num_channels=cfg.codec_channels,
            bos_value=cfg.codec_bos_value, delay_pattern=cfg.codec_delay_pattern)
        buf = pad_buffer(prefill, mt)
        res = speculative_generate_jit(
            self.params, cfg, jnp.asarray(ids), jnp.asarray(mask), None,
            buf, jnp.asarray(steps, jnp.int32),
            max_tokens=mt, min_tokens=jnp.int32(mn),
            cfg_scale=jnp.float32(cfg_scale),
            eos_prob_mul_factor=jnp.float32(eos_prob_mul_factor),
            spec_len=spec_len, draft_layers=draft_layers,
        )
        audios = dl.generate_output(
            res.codes, res.lengths,
            pad_value=cfg.codec_pad_value, delay_pattern=cfg.codec_delay_pattern)
        os.makedirs(output_dir, exist_ok=True)
        out = []
        for i, frames in enumerate(audios):
            path = os.path.join(output_dir, f"generated_{save_name}_{i}.wav")
            if self.dac is not None:
                self.dac.decode(frames.T[None], save_path=path, min_duration=1)
            else:
                np.save(path + ".codes.npy", frames)
                path += ".codes.npy"
            out.append(path)
        return out

    # ------------------------------------------------------------------
    # Continuous batching (apps/continuous.py): rolling request
    # admission/retirement on one live decode state — beyond-reference
    # serving (the reference decodes each batch to completion).
    # ------------------------------------------------------------------
    def continuous_server(self, *, slots: int = 4, t_text: int = 128,
                          horizon: Optional[int] = None,
                          chunk_frames: int = 64, do_sample: bool = True,
                          deterministic: bool = False):
        """Build a SlotServer over this model's params.  Feed it with
        make_slot_request(); decode retired results to wavs with
        decode_slot_results().

        deterministic=True guarantees DROPLESS dispatch (dense expert
        routing) regardless of width/serving mode, so a request's output
        depends only on the request itself — never on co-resident load
        that could win its expert-capacity slots.  Costs throughput on
        wide servers (the packed decode dispatch is the aggregate-RTF
        configuration); narrow servers are dense either way."""
        from .apps.continuous import SlotServer

        # Wide serving-mode servers get the same capacity-packed decode
        # dispatch as _generate_core's batch path (S_dec = 2*slots CFG
        # rows); deterministic mode keeps everything dense/dropless.
        dispatch_kw = {}
        S_dec = 2 * slots
        if (not deterministic and getattr(self, "serving_mode", False)
                and S_dec >= 64):
            dispatch_kw["decode_dispatch_mode"] = (
                "packed_a8" if getattr(self, "a8_compute", True) else "packed")
            dispatch_kw["decode_capacity"] = -(-int(S_dec * 0.64) // 16) * 16
            # Packed capacity drops couple co-resident rows: a request's
            # output may depend on batch load.  Say so once rather than
            # silently voiding the narrow-server reproducibility guarantee.
            print(f"continuous_server: slots={slots} uses capacity-packed "
                  "decode dispatch (aggregate-throughput config); outputs "
                  "may vary with co-resident load — pass deterministic=True "
                  "for dropless per-request-reproducible serving")

        # Default horizon: budget + voice-clone-prompt headroom (a 10 s
        # prompt is ~500 delayed frames) + admission slack.
        return SlotServer(
            self.params, self.config, slots=slots, t_text=t_text,
            horizon=horizon or (self.MAX_TOKENS + 512 + 4 * chunk_frames),
            chunk_frames=chunk_frames, do_sample=do_sample,
            kv_dtype=getattr(self, "kv_cache_dtype", None),
            **dispatch_kw,
        )

    def make_slot_request(self, task: str = "text_to_music", *,
                          caption: str, prompt_text: Optional[str] = None,
                          prompt_wav: Optional[str] = None,
                          prompt_codec=None, video=None,
                          sampling_fps: int = 2, max_frames: int = 16,
                          seed: int = 0,
                          max_audio_seconds: Optional[float] = None,
                          min_audio_seconds: Optional[float] = None,
                          cfg_scale: Optional[float] = None,
                          temperature: float = 1.0, top_p: float = 1.0,
                          eos_prob_mul_factor: Optional[float] = None,
                          rid=None):
        """Build a SlotRequest from a task description using the same
        prompt templates / tokenization / codec / video preprocessing as
        the task methods (text_to_music / text_to_speech /
        video_text_to_music)."""
        from .apps.continuous import SlotRequest

        cfg = self.config
        vision_kw = {}
        if task in ("video_text_to_music", "vt2m"):
            if video is None or "vision" not in self.params:
                raise ValueError("VT2M requests need video= and a vision tower")
            from .apps.video import extract_frames, frame_process, video_to_patches
            from .models.model import get_rope_index
            from .models.vision import vision_forward

            vcfg = cfg.vision_config
            if isinstance(video, str):
                frames = extract_frames(video, sampling_fps, max_frames)
                pixels = frame_process(frames, total_pixels=20480 * 28 * 28,
                                       min_pixels=28 * 28)
            else:
                pixels = np.asarray(video, dtype=np.float32)
            patches, grid = video_to_patches(
                pixels, patch_size=vcfg.patch_size,
                temporal_patch_size=vcfg.temporal_patch_size,
                merge_size=vcfg.spatial_merge_size)
            feats = np.asarray(vision_forward(
                self.params["vision"], jnp.asarray(patches), grid[None], vcfg))
            n_tok = patches.shape[0] // vcfg.spatial_merge_size ** 2
            span = ("<|vision_start|>" + "<|video_pad|>" * n_tok
                    + "<|vision_end|>")
            neg = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                span + DEFAULT_VIDEO_PROMPT.format(
                    music_span(T2M_NEGATIVE_CAPTION))) + AUDIO_START
            pos = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                span + DEFAULT_VIDEO_PROMPT.format(
                    music_span(caption))) + AUDIO_START
            ids, mask = self._tokenize([neg, pos])
            D = self.params["embed_tokens"].shape[-1]
            ve = np.zeros((2, ids.shape[1], D), np.float32)
            vm = (ids == cfg.video_token_id).astype(np.int32)
            for r in range(2):
                ve[r, np.where(vm[r])[0]] = feats
            spgt = [vcfg.temporal_patch_size / sampling_fps] * 2
            position_ids, deltas = get_rope_index(
                ids, cfg, video_grid_thw=np.stack([grid, grid]),
                second_per_grid_ts=spgt, attention_mask=mask)
            vision_kw = dict(visual_embeds=ve, visual_mask=vm,
                             prefill_position_ids=np.asarray(position_ids),
                             rope_deltas=np.asarray(deltas).reshape(-1))
            codec_flat = None
            cfg_scale = 10.0 if cfg_scale is None else cfg_scale
            eosf = 0.6 if eos_prob_mul_factor is None else eos_prob_mul_factor
        elif task in ("text_to_music", "t2m"):
            neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
            pos = t2m_prompt(caption)
            codec_flat = None
            cfg_scale = 10.0 if cfg_scale is None else cfg_scale
            eosf = 0.6 if eos_prob_mul_factor is None else eos_prob_mul_factor
        elif task in ("text_to_speech", "tts"):
            if prompt_codec is None:
                if prompt_wav is None or self.dac is None:
                    raise ValueError(
                        "TTS requests need prompt_codec or prompt_wav+DAC")
                prompt_codec = self.dac.encode(prompt_wav)
            codec_flat = self._preprocess_codec(prompt_codec)  # [P, C]
            prompt_caption = (
                "<|SPEECH_PROMPT_START|>" + str(prompt_text)
                + "<|SPEECH_PROMPT_END|>" + "<|VOICE_PROMPT_START|>"
                + "<|AUDIO_PLACEHOLDER|>" * codec_flat.shape[0]
                + "<|VOICE_PROMPT_END|>"
            )

            def with_target(x):
                return prompt_caption + "<|SPEECH_START|>" + x + "<|SPEECH_END|>"

            neg = SYSTEM_MESSAGE + INPUT_FORMAT.format(with_target("")) + AUDIO_START
            pos = SYSTEM_MESSAGE + INPUT_FORMAT.format(with_target(caption)) + AUDIO_START
            cfg_scale = 1.0 if cfg_scale is None else cfg_scale
            eosf = 1.0 if eos_prob_mul_factor is None else eos_prob_mul_factor
        else:
            raise ValueError(f"unsupported continuous task: {task}")

        if not vision_kw:
            ids, mask = self._tokenize([neg, pos])
        prefill, steps = dl.prepare_audio_prompt(
            [None], num_channels=cfg.codec_channels,
            bos_value=cfg.codec_bos_value,
            delay_pattern=cfg.codec_delay_pattern)
        mt = (int(max_audio_seconds * 50) if max_audio_seconds is not None
              else self.MAX_TOKENS)
        mn = (int(min_audio_seconds * 50) if min_audio_seconds is not None
              else min(self.MIN_TOKENS, mt))
        return SlotRequest(
            input_ids=np.asarray(ids), attention_mask=np.asarray(mask),
            prefill=np.asarray(prefill[0]), prefill_steps=int(steps[0]),
            codec_flat=codec_flat, max_tokens=mt, min_tokens=mn,
            cfg_scale=cfg_scale, temperature=temperature, top_p=top_p,
            eos_prob_mul_factor=eosf, seed=seed, rid=rid, **vision_kw)

    def decode_slot_results(self, results, output_dir: str = "./",
                            save_name: str = "continuous") -> List[str]:
        """Assemble retired SlotResults to wavs (delay revert + DAC),
        mirroring _generate_core's output stage."""
        os.makedirs(output_dir, exist_ok=True)
        out = []
        for r in results:
            audios = dl.generate_output(
                jnp.asarray(r.codes[None]), jnp.asarray([r.length]),
                pad_value=self.config.codec_pad_value,
                delay_pattern=self.config.codec_delay_pattern)
            path = os.path.join(output_dir, f"generated_{save_name}_{r.rid}.wav")
            if self.dac is not None:
                self.dac.decode(audios[0].T[None], save_path=path, min_duration=1)
            else:
                np.save(path + ".codes.npy", audios[0])
                path += ".codes.npy"
            out.append(path)
        return out

    # ------------------------------------------------------------------
    # Mixed-task batch generation (one decode batch for interleaved
    # TTS / T2M / VT2M requests — BASELINE workload 5; the reference's
    # Gradio dispatcher runs tasks one-by-one, web_demo.py:829-841)
    # ------------------------------------------------------------------
    def generate_mixed(
        self,
        requests: List[dict],
        *,
        output_dir: str = "./",
        save_name: str = "mixed",
        seed: Optional[int] = None,
        do_sample: bool = True,
    ) -> List[str]:
        """Run heterogeneous requests as ONE generation batch.

        Each request dict has "task" ∈ {text_to_music, text_to_speech,
        video_text_to_music} plus that task's inputs and (optionally) its
        own cfg_scale / temperature / top_p / eos_prob_mul_factor /
        max_audio_seconds / min_audio_seconds — per-sample knobs ride the
        batch as vectors (generate_jit broadcasts them).  Returns one
        output path per request, aligned by index.
        """
        cfg = self.config
        defaults = {
            "text_to_music": dict(cfg_scale=10.0, eos_prob_mul_factor=0.6),
            "text_to_speech": dict(cfg_scale=1.0, eos_prob_mul_factor=1.0),
            "video_text_to_music": dict(cfg_scale=10.0, eos_prob_mul_factor=0.6),
        }

        texts: List[str] = []
        codec_rows: List[np.ndarray] = []    # flat [n, C] per placeholder row
        video_feats: List = []               # per ROW: feats or None
        grids, spgts = [], []
        p_cfg, p_temp, p_topp, p_eosf, p_min, p_max = [], [], [], [], [], []
        p_seed = []
        base_seed = seed if seed is not None else int(time.time() * 1e3) % (2**31)

        for r in requests:
            task = r["task"]
            if task not in defaults:
                raise ValueError(f"unknown task: {task}")
            d = defaults[task]
            mt = int(r.get("max_audio_seconds", self.MAX_TOKENS / 50) * 50)
            mn = int(r.get("min_audio_seconds", self.MIN_TOKENS / 50) * 50)
            p_cfg.append(float(r.get("cfg_scale", d["cfg_scale"])))
            p_temp.append(float(r.get("temperature", 1.0)))
            p_topp.append(float(r.get("top_p", 1.0)))
            p_eosf.append(float(r.get("eos_prob_mul_factor", d["eos_prob_mul_factor"])))
            p_min.append(mn)
            p_max.append(mt)
            # Per-request sampling seed: honored independently of batch
            # composition (generate_jit per-sample seed chains).
            p_seed.append(int(r.get("seed", base_seed + len(p_seed))))

            if task == "text_to_music":
                c = r["caption"]
                neg = t2m_prompt(T2M_NEGATIVE_CAPTION)
                pos = t2m_prompt(c)
                texts.extend([neg, pos])
                video_feats.extend([None, None])
            elif task == "text_to_speech":
                prompt_codec = r.get("prompt_codec")
                if prompt_codec is None:
                    if self.dac is None:
                        raise RuntimeError("DAC unavailable for prompt_wav")
                    prompt_codec = self.dac.encode(r["prompt_wav"])
                codec_ids = self._preprocess_codec(prompt_codec)  # [P, C]
                span = (
                    "<|SPEECH_PROMPT_START|>" + r["prompt_text"]
                    + "<|SPEECH_PROMPT_END|>" + "<|VOICE_PROMPT_START|>"
                    + "<|AUDIO_PLACEHOLDER|>" * codec_ids.shape[0]
                    + "<|VOICE_PROMPT_END|>"
                )

                def with_target(x, span=span):
                    return span + "<|SPEECH_START|>" + x + "<|SPEECH_END|>"

                neg = SYSTEM_MESSAGE + INPUT_FORMAT.format(with_target("")) + AUDIO_START
                pos = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                    with_target(r["caption"])) + AUDIO_START
                texts.extend([neg, pos])
                codec_rows.extend([codec_ids, codec_ids])  # one per CFG row
                video_feats.extend([None, None])
            else:  # video_text_to_music
                from .apps.video import extract_frames, frame_process, video_to_patches
                from .models.vision import vision_forward

                vcfg = cfg.vision_config
                if vcfg is None or "vision" not in self.params:
                    raise RuntimeError("model has no vision tower")
                m2 = vcfg.spatial_merge_size ** 2
                v = r["video"]
                if isinstance(v, str):
                    frames = extract_frames(v, r.get("sampling_fps", 1),
                                            r.get("max_frames", 1))
                    pixels = frame_process(frames,
                                           total_pixels=r.get("total_pixels", 3 * 28 * 28),
                                           min_pixels=28 * 28)
                else:
                    pixels = np.asarray(v, dtype=np.float32)
                patches, grid = video_to_patches(
                    pixels, patch_size=vcfg.patch_size,
                    temporal_patch_size=vcfg.temporal_patch_size,
                    merge_size=vcfg.spatial_merge_size,
                )
                feats = np.asarray(vision_forward(
                    self.params["vision"], jnp.asarray(patches), grid[None], vcfg))
                n_tok = patches.shape[0] // m2
                span = "<|vision_start|>" + "<|video_pad|>" * n_tok + "<|vision_end|>"
                neg = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                    span + music_span(T2M_NEGATIVE_CAPTION)) + AUDIO_START
                pos = SYSTEM_MESSAGE + INPUT_FORMAT.format(
                    span + music_span(r["caption"])) + AUDIO_START
                texts.extend([neg, pos])
                video_feats.extend([feats, feats])
                grids.extend([grid, grid])
                spgts.extend([vcfg.temporal_patch_size / r.get("fps", 1)] * 2)

        ids, mask = self._tokenize(texts)

        flat_codec = np.concatenate(codec_rows, axis=0) if codec_rows else None

        visual_embeds = visual_mask = position_ids = deltas = None
        if any(f is not None for f in video_feats):
            from .models.model import get_rope_index

            D = self.params["embed_tokens"].shape[-1]
            visual_embeds = np.zeros((ids.shape[0], ids.shape[1], D), np.float32)
            visual_mask = (ids == cfg.video_token_id).astype(np.int32)
            for row, f in enumerate(video_feats):
                slots = np.where(visual_mask[row])[0]
                if f is None:
                    assert len(slots) == 0
                    continue
                assert len(slots) == f.shape[0], "video tokens != features"
                visual_embeds[row, slots] = f
            position_ids, deltas = get_rope_index(
                ids, cfg, video_grid_thw=np.stack(grids) if grids else None,
                second_per_grid_ts=spgts or None, attention_mask=mask,
            )

        # Per-sample knobs (one entry per request == per CFG pair).
        return self._generate_core(
            ids, mask, flat_codec, save_name, None, output_dir,
            np.asarray(p_cfg, np.float32), np.asarray(p_temp, np.float32),
            np.asarray(p_topp, np.float32), 45,
            np.asarray(p_eosf, np.float32), do_sample, seed,
            visual_embeds=visual_embeds, visual_mask=visual_mask,
            prefill_position_ids=position_ids, rope_deltas=deltas,
            max_tokens=max(p_max), min_tokens=np.asarray(p_min, np.int32),
            max_tokens_vec=np.asarray(p_max, np.int32),
            sample_seeds=np.asarray(p_seed, np.int32),
        )


def create_unimoe_audio(model_path: str, device_id: int = 0) -> UniMoEAudio:
    """Convenience constructor (reference: utils/UniMoE_Audio_mod.py:623-624)."""
    return UniMoEAudio(model_path, device_id)
