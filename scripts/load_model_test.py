#!/usr/bin/env python
"""Checkpoint-load smoke (ref scripts/load_model_test.py).

Loads a torch .pk (with DDP prefix strip) or an orbax dir and reports the
import coverage.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1]
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        state = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        import jax

        n = sum(x.size for x in jax.tree.leaves(state))
        print(f"orbax checkpoint: {n/1e6:.2f}M scalars")
        return

    from hrpe_tpu.utils.checkpoint_io import load_torch_state_dict

    sd = load_torch_state_dict(path)
    n = sum(v.size for v in sd.values())
    print(f"torch checkpoint: {len(sd)} tensors, {n/1e6:.2f}M scalars")
    for k in list(sd)[:10]:
        print(" ", k, sd[k].shape)


if __name__ == "__main__":
    main()
