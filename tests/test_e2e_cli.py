"""End-to-end CLI smoke: train a tiny synthetic run, checkpoint, evaluate.

Drives the real public surface (train.py / evaluate.py with a config file), the
analog of the reference quick-start (README 'Quick Start' +
--overfit_to_single_scene debug harness)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARGS = ['--config', 'configs/synthetic.txt', '--dataset_size', '4',
        '--num_epochs', '1', '--vox_bucket', '512', '--seg_bucket', '64',
        '--layers', '1', '--num_workers', '2', '--fixed_seed', '10',
        '--eval_first']


@pytest.fixture(scope='module')
def exp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('exp')
    os.environ['BOX2MASK_EXP_ROOT'] = str(root)
    yield root
    os.environ.pop('BOX2MASK_EXP_ROOT', None)


def test_train_eval_cycle(exp_root):
    import train as train_cli
    import evaluate as eval_cli
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    train_cli.main(list(ARGS))
    ckpt_dir = exp_root / 'synthetic' / 'checkpoints'
    assert any(p.name.startswith('checkpoint_') for p in ckpt_dir.iterdir())
    eval_cli.main(list(ARGS))
    results = exp_root / 'synthetic' / 'results'
    tables = list(results.rglob('table.txt'))
    assert tables, 'eval should write an AP table'
    text = tables[0].read_text()
    assert 'average' in text


def test_predict_specific_scene_visualizations(exp_root):
    import evaluate as eval_cli
    eval_cli.main(list(ARGS) + ['--predict_specific_scene', 'synth00099_00'])
    viz = exp_root / 'synthetic' / 'viz' / 'synth00099_00'
    assert (viz / 'pred_instances.ply').exists() or (viz / 'rgb.ply').exists()
