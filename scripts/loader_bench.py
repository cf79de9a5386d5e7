"""Input-pipeline microbench: sustained img/s from path-backed (JPEG) data.

VERDICT r1 weak #7: the decode path must sustain more than the train-step
rate (bench.py, ~920 img/s at batch 128) or ImageNet training input-binds.
This writes ImageNet-shaped JPEGs to a temp dir, then measures the
DataLoader end-to-end (decode pool -> resize -> flip -> normalize -> padded
batches) at several worker counts. Emits one JSON line per config.

Run anywhere (CPU-only):  python scripts/loader_bench.py [--files 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_files(root: str, n: int, hw=(375, 500)) -> list:
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    # a few distinct images, symlinked to n entries — keeps setup fast while
    # the decoder still does full JPEG work per item
    for i in range(8):
        img = rng.randint(0, 256, (*hw, 3), np.uint8)
        p = os.path.join(root, f"base{i}.jpg")
        Image.fromarray(img).save(p, quality=85)
    for i in range(n):
        p = os.path.join(root, f"img{i}.jpg")
        os.symlink(os.path.join(root, f"base{i % 8}.jpg"), p)
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=224)
    args = ap.parse_args()

    from vitax.data.pipeline import DataLoader

    with tempfile.TemporaryDirectory() as root:
        paths = make_files(root, args.files)
        labels = np.arange(len(paths), dtype=np.int32) % 100

        for workers in (1, 4, 8, 16):
            for raw in (False, True):
                dl = DataLoader(paths, labels, num_classes=100,
                                image_size=args.image_size,
                                batch_size=args.batch_size, split="train",
                                num_workers=workers, prefetch=4, raw=raw)
                # warm one epoch (page cache), then time one
                for _ in dl:
                    pass
                t0 = time.perf_counter()
                n = 0
                for b in dl:
                    n += int(b.weight.sum())
                dt = time.perf_counter() - t0
                print(json.dumps({
                    "metric": "loader_throughput", "workers": workers,
                    "raw_uint8": raw, "value": round(n / dt, 1),
                    "unit": "images/sec"}), flush=True)


if __name__ == "__main__":
    main()
