"""Training data pipeline: conversation tokenization + batch collation.

Port of the reference's DataLoaders (reference:
UniMoEV2-Preview/training/DataLoaders/datasets_utils.py:82-164 and
qwen2vl_datasets.py:74-202) in pure numpy — no torch Dataset machinery;
JAX training consumes numpy batches directly.
"""

from __future__ import annotations

import copy
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

IGNORE_INDEX = -100
# Image budget for TRAINING samples (reference: qwen2vl_datasets.py:28-30;
# videos use tighter budgets, apps/video.py).
IMAGE_FACTOR = 28
IMAGE_MIN_PIXELS = 4 * 28 * 28
IMAGE_MAX_PIXELS = 16384 * 28 * 28
DEFAULT_IMAGE_TOKEN = "<|image_pad|>"
DEFAULT_IMAGE_PROMPT = "<|vision_start|><|image_pad|><|vision_end|>{}"
SYSTEM_MESSAGE = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
INPUT_FORMAT = "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"


def tokenizer_image_token(
    prompt: str, tokenizer, image_token: str, image_token_index: int,
    add_special_tokens: bool = True,
) -> List[int]:
    """Tokenize text around image tokens, splicing the image id between
    chunks (reference: datasets_utils.py:23-43)."""
    chunks = [
        tokenizer(chunk, add_special_tokens=add_special_tokens).input_ids
        for chunk in prompt.split(image_token)
    ]
    # HF returns [[ids]] for str input in some tokenizers; normalize.
    chunks = [c[0] if c and isinstance(c[0], list) else c for c in chunks]

    input_ids: List[int] = []
    offset = 0
    bos = getattr(tokenizer, "bos_token_id", None)
    if chunks and chunks[0] and bos is not None and chunks[0][0] == bos:
        offset = 1
        input_ids.append(chunks[0][0])
    sep = [image_token_index] * (offset + 1)
    merged: List[List[int]] = []
    for i, c in enumerate(chunks):
        merged.append(c)
        if i != len(chunks) - 1:
            merged.append(sep)
    for x in merged:
        input_ids.extend(x[offset:])
    return input_ids


def preprocess_supervised(
    conversation: List[Dict[str, str]],
    tokenizer,
    *,
    image_token: str = DEFAULT_IMAGE_TOKEN,
    image_token_index: int = 151655,
    label_ignore_index: int = IGNORE_INDEX,
    system_message: str = SYSTEM_MESSAGE,
    input_format: str = INPUT_FORMAT,
    has_image: bool = False,
    model_max_length: Optional[int] = None,
    adding_sys_in_query: bool = False,
) -> Dict[str, np.ndarray]:
    """conversation [{from: human|gpt, value}] → (input_ids, labels) with
    source masking (reference: datasets_utils.py:82-164)."""
    human_role, ai_role = "human", "gpt"
    assert conversation[0]["from"] == human_role

    sources, targets = [], []
    eos = getattr(tokenizer, "eos_token", "") or ""
    for i, message in enumerate(conversation):
        role, value = message["from"], message["value"]
        assert role == (ai_role if i % 2 else human_role)
        if i == 0 and adding_sys_in_query:
            value = system_message + value
        if i % 2 == 0:
            sources.append(input_format.format(value))
        else:
            targets.append(value + eos)

    def encode(text):
        if has_image:
            return tokenizer_image_token(
                text, tokenizer, image_token=image_token,
                image_token_index=image_token_index, add_special_tokens=False,
            )
        out = tokenizer(text, add_special_tokens=False).input_ids
        return out[0] if out and isinstance(out[0], list) else out

    input_ids: List[int] = []
    labels: List[int] = []
    bos = getattr(tokenizer, "bos_token_id", None)
    if bos is not None:
        input_ids.append(bos)
        labels.append(label_ignore_index)
    if not adding_sys_in_query:
        # Extend (not reassign) so a tokenizer-provided BOS survives.
        sys_ids = encode(system_message)
        input_ids += sys_ids
        labels += [label_ignore_index] * len(sys_ids)

    for source, target in zip(sources, targets):
        if source and source[-1] in ("\n", "\t", " "):
            full = source + target.strip()
        else:
            full = source + " " + target.strip()
        source_ids = encode(source)
        full_ids = encode(full)
        input_ids += full_ids
        labels += [label_ignore_index] * len(source_ids) + full_ids[len(source_ids):]

    if model_max_length is not None and len(input_ids) >= model_max_length:
        input_ids = input_ids[:model_max_length]
        labels = labels[:model_max_length]

    labels_arr = np.asarray(labels, dtype=np.int64)
    if has_image:
        assert not ((labels_arr == image_token_index) & (labels_arr != label_ignore_index)).any()
    return {
        "input_ids": np.asarray(input_ids, dtype=np.int64),
        "labels": labels_arr,
    }


def preprocess_pretraining(
    sentence: str,
    tokenizer,
    *,
    image_token: str = DEFAULT_IMAGE_TOKEN,
    image_token_index: int = 151655,
    label_ignore_index: int = IGNORE_INDEX,
    model_max_length: Optional[int] = None,
    has_image: bool = False,
    truncation: bool = True,
) -> Dict[str, np.ndarray]:
    """Plain-text pretraining tokenization: one sentence → input_ids +
    labels where every token is a target except image tokens, plus the
    EOS position (reference: datasets_utils.py:46-79).  Unlike
    preprocess_supervised there is no role masking — the LM trains on the
    full sequence."""
    if has_image:
        input_ids = tokenizer_image_token(
            sentence, tokenizer, image_token=image_token,
            image_token_index=image_token_index,
        )
    else:
        out = tokenizer(sentence).input_ids
        input_ids = list(out[0] if out and isinstance(out[0], list) else out)

    eos_id = getattr(tokenizer, "eos_token_id", None)
    if (truncation and model_max_length is not None
            and len(input_ids) >= model_max_length):
        input_ids = input_ids[:model_max_length]
        if eos_id is not None:
            input_ids[-1] = eos_id
    elif eos_id is not None:
        input_ids = input_ids + [eos_id]

    ids = np.asarray(input_ids, dtype=np.int64)
    labels = ids.copy()
    if has_image:
        labels[labels == image_token_index] = label_ignore_index
    return {
        "input_ids": ids,
        "labels": labels,
        "global_text_index": np.int64(len(ids) - 1),
    }


def prefetch(batches, depth: int = 2):
    """Background-thread batch prefetch.

    Host-side collation (and, for image samples, PIL decode + smart_resize
    + patchify) runs on this host's single CPU core; without pipelining it
    serializes with the device step.  A daemon thread fills a bounded
    queue `depth` deep so the next batch is built while the current one
    trains — the role the reference's torch DataLoader workers play
    (qwen2vl_datasets.py consumed via HF Trainer's dataloader).  Worker
    exceptions re-raise in the consumer; order is preserved."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    END = object()

    def worker():
        try:
            for item in batches:
                q.put(item)
            q.put(END)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def expand_image_tokens(conversation: List[Dict], n_tokens: int,
                        image_token: str = DEFAULT_IMAGE_TOKEN,
                        prepend_prompt: bool = True) -> List[Dict]:
    """Expand each <|image_pad|> to n_tokens copies; wrap turn 0 in the
    vision prompt (reference: qwen2vl_datasets.py:134-144)."""
    conversation = copy.deepcopy(conversation)
    for i, turn in enumerate(conversation):
        sentence = turn["value"]
        if i == 0 and prepend_prompt:
            sentence = DEFAULT_IMAGE_PROMPT.format(sentence)
        while image_token in sentence:
            sentence = sentence.replace(image_token, "<|placeholder|>" * n_tokens, 1)
        sentence = sentence.replace("<|placeholder|>", image_token)
        turn["value"] = sentence
    return conversation


def load_image_patches(
    image_path: str,
    *,
    patch_size: int = 14,
    temporal_patch_size: int = 2,
    merge_size: int = 2,
    min_pixels: int = IMAGE_MIN_PIXELS,
    max_pixels: int = IMAGE_MAX_PIXELS,
):
    """PIL image → (flattened vision patches [S, C·tps·ps²],
    image_grid_thw [3]).

    The reference opens image_path, smart_resizes under the pixel budget,
    and runs Qwen2VLImageProcessor for pixel_values/image_grid_thw
    (qwen2vl_datasets.py:103-132); here a single image is a one-frame
    video through the SAME patchifier the VT2M inference path uses
    (apps/video.py:video_to_patches — rescale + CLIP-normalize + conv3d
    patch order), so the matmul patch embed consumes it bit-identically.
    """
    from PIL import Image

    from ..apps.video import smart_resize, video_to_patches

    img = Image.open(image_path).convert("RGB")
    width, height = img.size
    rh, rw = smart_resize(height, width, factor=IMAGE_FACTOR,
                          min_pixels=min_pixels, max_pixels=max_pixels)
    img = img.resize((rw, rh))
    arr = np.asarray(img, dtype=np.float32).transpose(2, 0, 1)[None]  # [1,3,H,W]
    return video_to_patches(
        arr, patch_size=patch_size,
        temporal_patch_size=temporal_patch_size, merge_size=merge_size,
    )


@dataclass
class Collator:
    """Pad + mask + aux_balance_weight (reference:
    qwen2vl_datasets.py:168-202).  aux weight is 1 everywhere, N on label
    positions — output tokens get N× emphasis in the balancing loss
    (training.sh sets N=10)."""

    pad_token_id: int
    aux_balance_weight: Optional[float] = None
    model_max_length: Optional[int] = None

    def __call__(self, instances: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        T = max(len(x["input_ids"]) for x in instances)
        if self.model_max_length is not None:
            T = min(T, self.model_max_length)
        B = len(instances)
        input_ids = np.full((B, T), self.pad_token_id, dtype=np.int64)
        labels = np.full((B, T), IGNORE_INDEX, dtype=np.int64)
        for i, inst in enumerate(instances):
            n = min(len(inst["input_ids"]), T)
            input_ids[i, :n] = inst["input_ids"][:n]
            labels[i, :n] = inst["labels"][:n]
        batch = {
            "input_ids": input_ids,
            "labels": labels,
            "attention_mask": (input_ids != self.pad_token_id).astype(np.int64),
        }
        if self.aux_balance_weight is not None:
            abw = np.ones_like(input_ids, dtype=np.float32)
            abw[labels != IGNORE_INDEX] = self.aux_balance_weight
            batch["aux_balance_weight"] = abw
        for key in ("pixel_values", "image_grid_thw"):
            vals = [inst[key] for inst in instances if key in inst]
            if vals:
                batch[key] = np.concatenate(vals, axis=0)
        return batch


class SimpleTokenizer:
    """Hash-vocab whitespace tokenizer — development fallback when no HF
    tokenizer assets exist (keeps the CLI runnable end to end)."""

    eos_token = "</s>"
    eos_token_id = 2
    bos_token_id = None
    pad_token_id = 0

    def __init__(self, vocab_size: int = 151676, special: Optional[Dict[str, int]] = None):
        self.vocab_size = vocab_size
        self.special = special or {}

    def _encode(self, text: str) -> List[int]:
        ids = []
        pattern = None
        if self.special:
            pattern = "(" + "|".join(re.escape(t) for t in self.special) + ")"
        parts = re.split(pattern, text) if pattern else [text]
        for part in parts:
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
                continue
            for w in part.split():
                ids.append(self.eos_token_id if w == self.eos_token
                           else 10 + (hash(w) % (self.vocab_size - 20)))
        return ids

    def __call__(self, text, add_special_tokens=False, padding=False,
                 return_tensors=None):
        texts = text if isinstance(text, list) else [text]
        seqs = [self._encode(t) for t in texts]

        class R:
            pass

        r = R()
        if return_tensors == "np":
            T = max(len(s) for s in seqs)
            ids = np.zeros((len(seqs), T), dtype=np.int64)
            mask = np.zeros((len(seqs), T), dtype=np.int64)
            for i, s in enumerate(seqs):
                ids[i, T - len(s):] = s
                mask[i, T - len(s):] = 1
            return {"input_ids": ids, "attention_mask": mask}
        r.input_ids = seqs if isinstance(text, list) else seqs[0]
        return r


class ConversationDataset:
    """Lazy map over an HF-datasets arrow dir or a list of dicts (reference:
    LazySupervisedDataset, qwen2vl_datasets.py:74-165)."""

    def __init__(self, data, tokenizer, *, shuffle_seed: int = 233,
                 image_token_index: int = 151655,
                 model_max_length: Optional[int] = 4096,
                 data_sample: Optional[int] = None,
                 image_root: Optional[str] = None,
                 vision_config=None):
        if isinstance(data, str):
            import datasets as hfds

            data = hfds.load_from_disk(data)
            data = data.shuffle(seed=shuffle_seed)
        self.data = data
        self.tokenizer = tokenizer
        self.image_token_index = image_token_index
        self.model_max_length = model_max_length
        self.image_root = image_root
        # Patch geometry for image samples; defaults match the flagship
        # Qwen2.5-VL tower (config.VisionConfig).
        self.patch_size = getattr(vision_config, "patch_size", 14)
        self.temporal_patch_size = getattr(vision_config, "temporal_patch_size", 2)
        self.merge_size = getattr(vision_config, "spatial_merge_size", 2)
        if data_sample is not None:
            self.data = self.data.select(range(min(data_sample, len(self.data))))

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        import os

        src = self.data[i]
        image_path = src.get("image_path")
        has_image = image_path is not None
        conversations = src["conversations"]
        extra: Dict[str, np.ndarray] = {}
        if has_image:
            # Image last mile (reference LazySupervisedDataset.__getitem__,
            # qwen2vl_datasets.py:103-165): load, smart_resize, patchify,
            # and expand each <|image_pad|> to grid.prod()//merge² copies.
            if self.image_root:
                image_path = os.path.join(self.image_root, image_path)
            patches, grid = load_image_patches(
                image_path, patch_size=self.patch_size,
                temporal_patch_size=self.temporal_patch_size,
                merge_size=self.merge_size,
            )
            n_tokens = int(grid.prod()) // self.merge_size ** 2
            conversations = expand_image_tokens(conversations, n_tokens)
            extra = {"pixel_values": patches, "image_grid_thw": grid[None]}
        out = preprocess_supervised(
            conversations, self.tokenizer,
            image_token_index=self.image_token_index,
            has_image=has_image,
            model_max_length=self.model_max_length,
        )
        if has_image:
            n_in_ids = int((out["input_ids"] == self.image_token_index).sum())
            assert n_in_ids == int(extra["image_grid_thw"].prod()) // self.merge_size ** 2, (
                "image tokens truncated away — raise model_max_length or "
                "lower the image pixel budget"
            )
        out.update(extra)
        return out
