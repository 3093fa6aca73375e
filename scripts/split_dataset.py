#!/usr/bin/env python
"""Hard-link dataset split (ref scripts/split_dataset.py).

Splits a frame directory into train/ and test/ subsets (default 0.9) by
hard-linking image + annotation sidecars (no data duplication).
"""

import argparse
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("--train-frac", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from hrpe_tpu.data.dream import build_frame_index

    src = Path(args.src)
    frames = build_frame_index(src)
    rng = random.Random(args.seed)
    rng.shuffle(frames)
    n_train = int(len(frames) * args.train_frac)
    splits = {"train": frames[:n_train], "test": frames[n_train:]}

    for name, subset in splits.items():
        dst = src.parent / f"{src.name}_{name}"
        dst.mkdir(exist_ok=True)
        cam = src / "_camera_settings.json"
        if cam.exists() and not (dst / cam.name).exists():
            os.link(cam, dst / cam.name)
        for i, fr in enumerate(subset):
            base = fr["base"]
            for sidecar in src.glob(f"{base}.*"):
                new_name = f"{i:06d}{''.join(sidecar.suffixes)}"
                target = dst / new_name
                if not target.exists():
                    os.link(sidecar, target)
        print(f"{name}: {len(subset)} frames -> {dst}")


if __name__ == "__main__":
    main()
