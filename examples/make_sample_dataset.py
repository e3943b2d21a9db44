"""Create a miniature HF-arrow training dataset with the reference schema
(reference: UniMoEV2-Preview/data/dataset_info.json — columns: id,
conversations[{from,value}], data_source, meta_data, image_path).

With --images, one row per --every carries a generated PNG and the
<|image_pad|> conversation marker, exercising the image training last
mile (ConversationDataset → smart_resize → patchify → token expansion).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_image(path: str, seed: int, size: int = 56) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    Image.fromarray(arr, "RGB").save(path)


def build(path: str, n: int = 3, with_images: bool = False, every: int = 2,
          image_size: int = 56):
    import datasets

    image_paths = [None] * n
    conversations = []
    for i in range(n):
        human = f"Describe melody number {i}."
        if with_images and i % every == 0:
            # No marker in the text: ConversationDataset wraps turn 0 in
            # the vision prompt (<|vision_start|><|image_pad|><|vision_end|>)
            # and expands the pad per the image grid — reference behavior
            # (qwen2vl_datasets.py:137-143).
            img_dir = os.path.join(path + "_images")
            os.makedirs(img_dir, exist_ok=True)
            rel = f"img_{i}.png"
            _write_image(os.path.join(img_dir, rel), seed=i, size=image_size)
            image_paths[i] = rel
        conversations.append([
            {"from": "human", "value": human},
            {"from": "gpt", "value": f"A calm melody numbered {i} with soft strings."},
        ])

    rows = {
        "id": [f"sample_{i}" for i in range(n)],
        "conversations": conversations,
        "data_source": ["synthetic"] * n,
        "meta_data": ["{}"] * n,
        "image_path": image_paths,
    }
    ds = datasets.Dataset.from_dict(rows)
    ds.save_to_disk(path)
    msg = f"wrote {n}-row sample dataset to {path}"
    if with_images:
        msg += f" (images in {path}_images; pass --image_root {path}_images)"
    print(msg)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./sample_dataset")
    p.add_argument("-n", type=int, default=3)
    p.add_argument("--images", action="store_true",
                   help="attach a generated PNG to every --every-th row")
    p.add_argument("--every", type=int, default=2)
    p.add_argument("--image-size", type=int, default=56)
    a = p.parse_args()
    build(a.out, a.n, with_images=a.images, every=a.every,
          image_size=a.image_size)
