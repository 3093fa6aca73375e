#!/usr/bin/env python
"""Multi-folder dataset merge with renumbering (ref scripts/combine_dataset.py)."""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("sources", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from hrpe_tpu.data.dream import build_frame_index

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    counter = 0
    for src in args.sources:
        src = Path(src)
        cam = src / "_camera_settings.json"
        if cam.exists() and not (out / cam.name).exists():
            os.link(cam, out / cam.name)
        for fr in build_frame_index(src):
            base = fr["base"]
            for sidecar in src.glob(f"{base}.*"):
                new_name = f"{counter:06d}{''.join(sidecar.suffixes)}"
                if not (out / new_name).exists():
                    os.link(sidecar, out / new_name)
            counter += 1
    print(f"combined {counter} frames -> {out}")


if __name__ == "__main__":
    main()
