#!/usr/bin/env python
"""Training CLI dispatcher.

Same interface as the reference (scripts/train.py):
    python scripts/train.py --config configs/{robot}/{full,depthnet}.yaml
Routes on the pipeline flags: use_rootnet_with_reg_int_shared_backbone ->
full network, use_rootnet -> depthnet, use_sim2real -> self-supervised.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hrpe_tpu.config import load_config


def main():
    parser = argparse.ArgumentParser("Training")
    parser.add_argument("--config", "-c", type=str, required=True)
    parser.add_argument("--epochs", type=int, default=None, help="override n_epochs")
    parser.add_argument("--epoch-size", type=int, default=None,
                        help="override epoch_size (smoke runs)")
    args = parser.parse_args()
    cfg = load_config(args.config)
    if args.epoch_size:
        cfg.epoch_size = args.epoch_size

    print("----------------- config -----------------")
    for k, v in vars(cfg).items():
        print(f"  {k}: {v}")
    print("------------------------------------------")

    from hrpe_tpu.engine.trainer import Trainer

    if cfg.use_rootnet_with_reg_int_shared_backbone:
        print("pipeline: full network (JointNet/RotationNet/KeypointNet/DepthNet)")
        Trainer(cfg, "full").fit(args.epochs)
    elif cfg.use_rootnet:
        print("pipeline: DepthNet only")
        Trainer(cfg, "depthnet").fit(args.epochs)
    elif cfg.use_sim2real:
        print("pipeline: self-supervised sim2real")
        from hrpe_tpu.engine.sim2real import Sim2RealTrainer

        Sim2RealTrainer(cfg).fit(args.epochs)
    else:
        raise SystemExit("no pipeline flag set in config")


if __name__ == "__main__":
    main()
