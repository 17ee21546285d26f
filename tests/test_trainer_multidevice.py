"""Trainer --multigpu end-to-end on the virtual CPU mesh: loader sharding,
batch collation, shard_map step, checkpointing, and the (single-device-jit)
validation loss. The reference's multi-GPU path was bitrotted
(SURVEY.md §2.9); this guards ours at the driver level."""

import os

import numpy as np
import jax
import pytest

from box2mask_tpu.config import get_config
from box2mask_tpu.datasets.loader import get_dataset
from box2mask_tpu.engine.train import Trainer


@pytest.mark.skipif(len(jax.devices()) < 2, reason='needs multiple devices')
@pytest.mark.skipif(os.environ.get('B2M_SLOW_TESTS') != '1',
                    reason='~4 min on the 1-core virtual mesh; run per round '
                           'via scripts/run_slow_suite.sh (the driver '
                           'dryrun_multichip covers the shard_map DP step on '
                           'every round)')
def test_trainer_multidevice_epoch(tmp_path):
    os.environ['BOX2MASK_EXP_ROOT'] = str(tmp_path)
    try:
        cfg = get_config([
            '--dataset_name', 'synthetic', '--exp_name', 'mdtrain',
            '--network_heads', 'mlp_offsets', 'mlp_bounds', 'mlp_bb_scores',
            'mlp_semantics',
            '--do_segment_pooling', '--bb_supervision',
            '--loss_weight_bb_bounds', '0.5', '--loss_weight_bb_scores', '1',
            '--loss_weight_semantics', '1',
            '--voxel_size', '0.08', '--vox_bucket', '256', '--seg_bucket',
            '32', '--layers', '1', '--batch_size', '1', '--num_workers', '2',
            '--dataset_size', '4', '--multigpu', '--data_axis_size', '2',
            '--ckpt_every', '1', '--val_every', '1', '--num_eval_batches',
            '1', '--eval_first'])
        train_ds = get_dataset(cfg, 'train')
        val_ds = get_dataset(cfg, 'val')
        trainer = Trainer(cfg, train_ds, val_ds)
        assert trainer.n_devices == 2
        trainer.train_model(1)
        assert trainer.iteration_num >= 2   # 4 scenes / (1 per shard x 2)
        ckpts = os.listdir(cfg.checkpoint_path)
        assert any(c.startswith('checkpoint_') for c in ckpts)
    finally:
        os.environ.pop('BOX2MASK_EXP_ROOT', None)
