"""LoRA adapters for parameter-efficient finetuning.

Parity with the reference's PEFT options (reference:
UniMoEV2-Preview/training/training_utils.py:121-163 exposes
lora/prefix/ptuning configs; LoRA is the one used in practice).  Functional
design: `add_lora` augments projection dicts with low-rank (a, b) factors;
the matmul helper applies  y = x·W + (x·a)·b · (α/r)  wherever factors are
present — composing with raw or int8-quantized base weights.  Train with
`trainable_pattern='lora'` so only adapters update; `merge_lora` folds
adapters into the base for serving.
"""

from __future__ import annotations

import zlib
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.quant import QTensor, wshape

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj")


def add_lora(
    params: Dict,
    rng: jax.Array,
    *,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict:
    """Return params with lora_a/lora_b planted in targeted attention
    projection dicts (layer-stacked [L, din, r] / [L, r, dout])."""

    def walk(node, key_path=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k in targets
                    and isinstance(v, dict)
                    and "w" in v
                ):
                    w = v["w"]
                    shape = wshape(w)
                    L = shape[0] if len(shape) == 3 else None
                    din, dout = shape[-2], shape[-1]
                    # crc32 (not hash()): str hashing is salted per process,
                    # which would make LoRA init differ across runs/hosts.
                    digest = zlib.crc32("/".join(key_path + (k,)).encode())
                    key = jax.random.fold_in(rng, digest % (2**31))
                    ka, _ = jax.random.split(key)
                    a_shape = (L, din, rank) if L else (din, rank)
                    b_shape = (L, rank, dout) if L else (rank, dout)
                    scale_shape = (L,) if L else ()
                    out[k] = {
                        **v,
                        "lora_a": (jax.random.normal(ka, a_shape) * din ** -0.5
                                   ).astype(dtype),
                        "lora_b": jnp.zeros(b_shape, dtype=dtype),
                        # [L] so layer-stacked params scan cleanly.
                        "lora_scale": jnp.full(scale_shape, alpha / rank, dtype=dtype),
                    }
                else:
                    out[k] = walk(v, key_path + (k,))
            return out
        return node

    return walk(params)


from ..ops.quant import proj_matmul as lora_matmul  # applied inside attention


def merge_lora(params: Dict) -> Dict:
    """Fold adapters into the base weights (serving path, zero overhead)."""

    def walk(node):
        if isinstance(node, dict):
            if "lora_a" in node and "w" in node:
                w = node["w"]
                assert not isinstance(w, QTensor), (
                    "merge into int8 base unsupported — merge before quantizing"
                )
                scale = node["lora_scale"]
                if scale.ndim:  # [L] → [L, 1, 1]
                    scale = scale[:, None, None]
                delta = jnp.einsum(
                    "...dr,...re->...de", node["lora_a"], node["lora_b"]
                ) * scale
                merged = dict(node)
                merged["w"] = (w.astype(jnp.float32) + delta.astype(jnp.float32)
                               ).astype(w.dtype)
                for k in ("lora_a", "lora_b", "lora_scale"):
                    merged.pop(k)
                return merged
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)
