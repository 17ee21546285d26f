#!/usr/bin/env python
"""Evaluation / prediction CLI: ``python evaluate.py --config configs/scannet.txt
--fixed_seed 10``.

Surface-parity with ``python models/evaluation.py`` of the reference
(models/evaluation.py:653-734): mode dispatch over --eval_training,
--param_search, --produce_visualizations / --predict_specific_scene,
--submission_write_out[_testset], default = full validation eval. Validation is
evaluated WITH augmentations under the fixed seed unless --eval_wo_aug
(test-time augmentation, evaluation.py:672).
"""

import sys


def main(argv=None):
    from box2mask_tpu import runtime
    runtime.setup()
    from box2mask_tpu.config import get_config
    cfg = get_config(argv)
    from box2mask_tpu.datasets.loader import get_dataset
    from box2mask_tpu.engine.evaluate import Evaluater

    ev = Evaluater(cfg)

    if cfg.predict_specific_scene or cfg.produce_visualizations:
        mode = 'predict_specific_scene' if cfg.predict_specific_scene else 'val'
        ds = get_dataset(cfg, mode, do_augmentations=not cfg.eval_wo_aug)
        from box2mask_tpu.viz.export import produce_visualizations
        produce_visualizations(ev, ds, cfg)
        return

    if cfg.submission_write_out or cfg.submission_write_out_testset:
        mode = 'test' if cfg.submission_write_out_testset else 'val'
        ds = get_dataset(cfg, mode, do_augmentations=not cfg.eval_wo_aug)
        ev.submission_write_out(ds)
        return

    ds = get_dataset(cfg, 'val', do_augmentations=not cfg.eval_wo_aug)

    if cfg.param_search:
        ev.param_search(ds)
        return

    if cfg.eval_training:
        # eval a sweep of checkpoints into tensorboard (evaluation.py:699-703)
        from box2mask_tpu.engine.checkpoint import list_checkpoints
        from box2mask_tpu.engine.train import _summary_writer
        import os
        # _summary_writer falls back to a no-op writer when torch's
        # tensorboard is unavailable (this CLI path must run torch-free)
        writer = _summary_writer(os.path.join(cfg.exp_path, 'eval_training'))
        for t, path in list_checkpoints(cfg.checkpoint_path):
            cfg.checkpoint = os.path.basename(path)[:-5]
            e = Evaluater(cfg, writer=writer, epoch=int(t // 3600))
            e.eval(ds)
        return

    ev.eval(ds)


if __name__ == '__main__':
    main(sys.argv[1:])
