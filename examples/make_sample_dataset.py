"""Create a miniature HF-arrow training dataset with the reference schema
(reference: UniMoEV2-Preview/data/dataset_info.json — columns: id,
conversations[{from,value}], data_source, meta_data, image_path)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(path: str, n: int = 3):
    import datasets

    rows = {
        "id": [f"sample_{i}" for i in range(n)],
        "conversations": [
            [
                {"from": "human", "value": f"Describe melody number {i}."},
                {"from": "gpt", "value": f"A calm melody numbered {i} with soft strings."},
            ]
            for i in range(n)
        ],
        "data_source": ["synthetic"] * n,
        "meta_data": ["{}"] * n,
        "image_path": [None] * n,
    }
    ds = datasets.Dataset.from_dict(rows)
    ds.save_to_disk(path)
    print(f"wrote {n}-row sample dataset to {path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="./sample_dataset")
    p.add_argument("-n", type=int, default=3)
    a = p.parse_args()
    build(a.out, a.n)
