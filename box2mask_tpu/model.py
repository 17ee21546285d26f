"""Model facade: the reference's `Model` wrapper surface (models/model.py:14-288)
on top of the functional engine.

Holds the SelectionNet + TrainState and exposes compute_loss / get_prediction /
pred2mask / load_checkpoint / state_dict with the same call shapes, so code
written against the reference's Model maps 1:1. New code should prefer the
functional engine (engine/state.py) directly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.engine import checkpoint as ckpt
from box2mask_tpu.engine import state as S
from box2mask_tpu.postprocess.detection2mask import detection_to_masks


class Model:
    def __init__(self, cfg, semantic_valid_class_ids, semantic_id2idx,
                 instance_id2idx, is_foreground, device=None):
        self.cfg = cfg
        self.semantic_valid_class_ids = np.asarray(semantic_valid_class_ids)
        self.semantic_id2idx = np.asarray(semantic_id2idx)
        self.instance_id2idx = np.asarray(instance_id2idx)
        self.is_foreground = is_foreground
        self.detection_model = S.build_model(cfg,
                                             len(self.semantic_valid_class_ids))
        self.tx = S.make_optimizer(cfg)
        self.state = None
        self._train_step = S.make_train_step(cfg, self.detection_model,
                                             self.tx, donate=False)
        self._val_step = S.make_val_step(cfg, self.detection_model)
        self._forward = S.make_forward(cfg, self.detection_model)
        self._host_batch = None

    # ------------------------------------------------------------------ state
    def ensure_state(self, batch, seed=0):
        if self.state is None:
            self.state = S.init_state(self.cfg, self.detection_model, self.tx,
                                      batch, seed=seed)
        return self.state

    def _device_batch(self, batch):
        return {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, (np.ndarray, jnp.ndarray, np.integer, int,
                                  float, np.floating, np.bool_))}

    # ------------------------------------------------------------------ train
    def compute_loss(self, batch, epoch):
        """One loss evaluation (no optimizer step) — reference
        Model.compute_loss returns the loss dict (models/model.py:33)."""
        dev = self._device_batch(batch)
        self.ensure_state(dev)
        bb_w, cs_w = S.head_weights(self.cfg, epoch)
        ld = self._val_step(self.state, dev, jnp.float32(bb_w),
                            jnp.float32(cs_w))
        return {k: np.asarray(v) for k, v in ld.items()}

    def train_step(self, batch, epoch, lr=None):
        dev = self._device_batch(batch)
        self.ensure_state(dev)
        bb_w, cs_w = S.head_weights(self.cfg, epoch)
        self.state, ld = self._train_step(
            self.state, dev, jnp.float32(lr if lr is not None else self.cfg.lr),
            jnp.float32(bb_w), jnp.float32(cs_w))
        return {k: np.asarray(v) for k, v in ld.items()}

    # ------------------------------------------------------------- prediction
    def get_prediction(self, batch, with_grad=False, to_cpu=True,
                       min_size=True, get_all=False):
        dev = self._device_batch(batch)
        self.ensure_state(dev)
        pred = self._forward(self.state.params, self.state.batch_stats, dev)
        pred = {k: np.asarray(v) for k, v in pred.items()}
        if min_size and self.cfg.min_bb_size is not None \
                and self.cfg.mlp_bounds in pred:
            pred[self.cfg.mlp_bounds] = np.clip(pred[self.cfg.mlp_bounds],
                                                self.cfg.min_bb_size, None)
        return pred

    def pred2mask(self, batch, pred, mode, host=None):
        dev = {k: np.asarray(v) for k, v in batch.items()
               if not isinstance(v, list)}
        host = host or batch.get('__host__')
        return detection_to_masks(pred, dev, host, self.cfg,
                                  self.semantic_valid_class_ids,
                                  self.is_foreground, mode,
                                  True, self.cfg.eval_ths)

    # ------------------------------------------------------------ checkpoints
    def state_dict(self):
        return {'params': jax.device_get(self.state.params),
                'batch_stats': jax.device_get(self.state.batch_stats)}

    def load_checkpoint(self, checkpoint=None, closest_to=None):
        path = ckpt.find_checkpoint(self.cfg.checkpoint_path, checkpoint,
                                    closest_to)
        if path is None:
            print(f'No checkpoints found at {self.cfg.checkpoint_path}')
            return 0, 0
        assert self.state is not None, 'call ensure_state(batch) first'
        (self.state, epoch, training_time, iteration_num,
         name) = ckpt.load_checkpoint(
            path, self.state, strict=not self.cfg.loose_model_loading)
        print(f'Loaded checkpoint from: {path}')
        return epoch, training_time, name, iteration_num

    def eval(self):
        pass      # eval/train modes are explicit `train=` flags in this engine

    def train(self):
        pass
