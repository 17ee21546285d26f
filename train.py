#!/usr/bin/env python
"""Training CLI: ``python train.py --config configs/scannet.txt``.

Surface-parity with ``python models/training.py --config ...`` of the reference
(models/training.py:299-345): builds the datasets per cfg.dataset_name (train or
train+val for submission runs), a Trainer, and runs the epoch loop. Multi-device
data parallelism is in-process over the jax device mesh (--multigpu), not
mp.spawn (parallel/mesh.py).
"""

import sys


def main(argv=None):
    from box2mask_tpu import runtime
    runtime.setup()
    from box2mask_tpu.config import get_config
    cfg = get_config(argv)
    from box2mask_tpu.datasets.loader import get_dataset
    from box2mask_tpu.engine.train import Trainer

    train_mode = 'train+val' if cfg.train_submission else 'train'
    train_ds = get_dataset(cfg, train_mode, do_augmentations=True)
    val_ds = get_dataset(cfg, 'val', do_augmentations=True)
    trainer = Trainer(cfg, train_ds, val_ds)
    trainer.train_model(cfg.num_epochs)


if __name__ == '__main__':
    main(sys.argv[1:])
