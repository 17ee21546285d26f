"""Checkpoint save/load with training-time-encoded filenames.

Semantics-parity with the reference's checkpoint management
(models/training.py:216-261, models/model.py:264-288):
  * filename encodes cumulative training seconds:
    ``checkpoint_{H}h:{M}m:{S}s_{float}.ckpt``,
  * payload carries {training_time, epoch, iteration_num} + model/optimizer state,
  * "latest" = max trailing float; ``closest_to`` selects the checkpoint nearest
    N hours of training (used by the 18-day eval sweeps, evaluation.py:699-703),
  * ``val_min={loss}`` marker files track the best validation loss.

Serialization: flax msgpack for the jax pytrees inside a single pickle container
(no torch). Orbax is intentionally not used: single-file checkpoints keep the
time-encoded-name selection semantics trivial and need no async manager.
"""

from __future__ import annotations

import glob
import os
import pickle

import numpy as np
import jax
from flax import serialization


def convert_secs(sec):
    return int(sec // 3600), int((sec // 60) % 60), int(sec % 60)


def checkpoint_name(training_time):
    h, m, s = convert_secs(training_time)
    return f'checkpoint_{h}h:{m}m:{s}s_{training_time}.ckpt'


def save_checkpoint(path_dir, state, training_time, epoch, iteration_num,
                    extra=None):
    os.makedirs(path_dir, exist_ok=True)
    payload = {
        'training_time': float(training_time),
        'epoch': int(epoch),
        'iteration_num': int(iteration_num),
        'params': serialization.to_bytes(jax.device_get(state.params)),
        'batch_stats': serialization.to_bytes(jax.device_get(state.batch_stats)),
        'opt_state': serialization.to_bytes(jax.device_get(state.opt_state)),
        'extra': extra or {},
    }
    path = os.path.join(path_dir, checkpoint_name(training_time))
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    return path


def list_checkpoints(path_dir):
    """Sorted (time_float, path) pairs."""
    out = []
    for p in glob.glob(os.path.join(path_dir, 'checkpoint_*.ckpt')):
        try:
            t = float(os.path.splitext(os.path.basename(p))[0].split('_')[-1])
            out.append((t, p))
        except ValueError:
            continue
    return sorted(out)


def find_checkpoint(path_dir, checkpoint=None, closest_to=None):
    """Explicit name > closest-to-N-hours > latest. None if dir is empty."""
    if checkpoint is not None:
        path = os.path.join(path_dir, checkpoint)
        if not path.endswith('.ckpt'):
            path += '.ckpt'
        return path
    ckpts = list_checkpoints(path_dir)
    if not ckpts:
        return None
    if closest_to is not None:
        times = np.array([t for t, _ in ckpts])
        return ckpts[int(np.argmin(np.abs(times - closest_to * 3600)))][1]
    return ckpts[-1][1]


def load_checkpoint(path, state, strict=True):
    """Restore pytrees into the given TrainState template.
    Returns (state, epoch, training_time, iteration_num, name)."""
    with open(path, 'rb') as f:
        payload = pickle.load(f)

    def restore(template, blob):
        try:
            return serialization.from_bytes(template, blob)
        except (ValueError, KeyError) as e:
            if strict:
                raise
            print(f'Warning: loose checkpoint loading skipped a tree: {e}')
            return template

    state = state._replace(
        params=restore(jax.device_get(state.params), payload['params']),
        batch_stats=restore(jax.device_get(state.batch_stats),
                            payload['batch_stats']),
        opt_state=restore(jax.device_get(state.opt_state), payload['opt_state']))
    name = os.path.splitext(os.path.basename(path))[0]
    return (state, payload['epoch'], payload['training_time'],
            payload['iteration_num'], name)


def write_val_min_marker(exp_path, val_loss):
    """Best-val marker files `val_min={loss}` (training.py:147-152)."""
    for f in glob.glob(os.path.join(exp_path, 'val_min=*')):
        os.remove(f)
    open(os.path.join(exp_path, f'val_min={val_loss}'), 'w').close()


def read_val_min(exp_path):
    files = glob.glob(os.path.join(exp_path, 'val_min=*'))
    if not files:
        return float('inf')
    return float(os.path.basename(files[0]).split('=')[1])
