#!/usr/bin/env python
"""Fixed-config 1-epoch training smoke (ref scripts/train_test.py).

Builds a tiny synthetic fixture dataset and runs one epoch of the full
pipeline end-to-end (data -> sharded step -> validation -> checkpoint).
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    from fixtures import make_pickle_dataset
    from hrpe_tpu.config import make_default_config
    from hrpe_tpu.engine.trainer import Trainer

    tmp = Path(tempfile.mkdtemp())
    train_dir = tmp / "dofbot_synth_train_dr"
    test_dir = tmp / "dofbot_synth_test_dr"
    make_pickle_dataset(train_dir, "dofbot", n=8)
    make_pickle_dataset(test_dir, "dofbot", n=4)

    cfg = make_default_config()
    cfg.exp_name = "train_smoke"
    cfg.urdf_robot_name = "dofbot"
    cfg.train_ds_names = str(train_dir)
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.image_size = cfg.other_image_size = cfg.rootnet_image_size = 64.0
    cfg.batch_size = 4
    cfg.epoch_size = 8
    cfg.n_dataloader_workers = 2
    cfg.reference_keypoint_id = 1
    cfg.use_rootnet_with_reg_int_shared_backbone = True
    for w in ["pose", "rot", "trans", "uv", "kp2d", "kp3d", "kp2d_int", "kp3d_int"]:
        setattr(cfg, f"{w}_loss_weight", 1.0)
    cfg.depth_loss_weight = 10.0

    trainer = Trainer(cfg, "full")
    trainer.fit(n_epochs=1)
    print("train smoke OK")


if __name__ == "__main__":
    main()
