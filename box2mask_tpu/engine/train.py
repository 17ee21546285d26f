"""Training driver.

Surface-parity with the reference Trainer (models/training.py:27-297): experiment
dir with args.txt + config copy, auto-resume from the latest time-encoded
checkpoint, cosine LR, epoch-head checkpoint/val-loss/full-eval blocks, per-step
timing + device-memory telemetry to TensorBoard, val_min marker files.

TPU-native differences: one process drives the whole device mesh (no mp.spawn /
NCCL rendezvous — shard_map + psum, parallel/mesh.py); device memory comes from
jax memory_stats instead of pynvml; there is no empty_cache() loop because XLA
preallocates (the reference needs it to tame MinkowskiEngine fragmentation,
models/training.py:178-194).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.engine import checkpoint as ckpt
from box2mask_tpu.engine import state as S
from box2mask_tpu.engine.schedule import lr_for_epoch
from box2mask_tpu.datasets.batching import collate_device_batches
from box2mask_tpu.datasets.tables import get_tables
from box2mask_tpu.parallel import mesh as M


def _summary_writer(logdir):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(logdir)
    except Exception:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def flush(self):
                pass
        return _Null()


class Trainer:
    def __init__(self, cfg, train_dataset, val_dataset, num_classes=None):
        self.cfg = cfg
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        valid_ids, _, _, _ = get_tables(train_dataset.table_name)
        self.num_classes = num_classes or len(valid_ids)

        self.n_devices = 1
        self.spatial = (cfg.spatial_shards
                        if getattr(cfg, 'spatial_shards', 0) and
                        cfg.spatial_shards > 1 else 0)
        if cfg.multigpu:
            self.n_devices = cfg.data_axis_size or len(jax.devices())
        axis = M.AXIS if self.n_devices > 1 else None
        if self.spatial:
            # one scene sharded across the mesh (parallel/spatial.py);
            # parameter tree identical to SelectionNet so checkpoints
            # interchange with the single-device path
            from box2mask_tpu.parallel import spatial as SP
            compute_dtype = {'bfloat16': jnp.bfloat16,
                             'float32': jnp.float32}[cfg.compute_dtype]
            self.model = SP.SpatialSelectionNet(
                num_classes=self.num_classes,
                heads=tuple(cfg.network_heads), layers=cfg.layers,
                gather_level=cfg.spatial_gather_level,
                do_segment_pooling=cfg.do_segment_pooling,
                max_pool_segments=cfg.max_pool_segments_detection_net,
                mlp_bounds_relu=cfg.mlp_bounds_relu,
                compute_dtype=compute_dtype)
        else:
            self.model = S.build_model(cfg, self.num_classes, axis_name=axis)
        self.tx = S.make_optimizer(cfg)

        self.train_loader = train_dataset.get_loader(
            num_shards=self.n_devices)
        self.val_loader = val_dataset.get_loader(
            shuffle=True, drop_last=False) if val_dataset is not None else None

        # experiment dir + provenance (training.py:52-61)
        os.makedirs(cfg.exp_path, exist_ok=True)
        os.makedirs(cfg.checkpoint_path, exist_ok=True)
        with open(os.path.join(cfg.exp_path, 'args.txt'), 'w') as f:
            f.write(repr(vars(cfg)))
        if cfg.config and os.path.exists(cfg.config):
            shutil.copyfile(cfg.config, os.path.join(
                cfg.exp_path, os.path.basename(cfg.config)))
        self.writer = _summary_writer(os.path.join(
            os.path.dirname(cfg.exp_path.rstrip('/')), 'tf_summaries',
            str(cfg.exp_name)))

        self.state = None
        self.mesh = None
        self._train_step = None
        self._val_step = None
        self.training_time = 0.0
        self.iteration_num = 0
        self.start_epoch = 0
        self.val_min = ckpt.read_val_min(cfg.exp_path)

    # ------------------------------------------------------------------ setup
    def _ensure_state(self, sample_batch):
        if self.state is not None:
            return
        cfg = self.cfg
        # first-real-batch half of the auto-remat policy (config.needs_remat
        # docstring): the shipped ScanNet config (bs=8, ~120k rows/scene)
        # must run as shipped on one 16 GB chip — flip remat from the actual
        # padded row count, which get_config cannot know for configs that
        # leave vox_bucket at the small rounding quantum
        if not self.spatial and not cfg.remat and not cfg.no_auto_remat:
            from box2mask_tpu.config import needs_remat
            flat = sample_batch
            if isinstance(flat, (list, tuple)):
                flat = flat[0]
            rows = next((int(np.size(flat[k])) for k in ('valid0', 'batch0')
                         if k in flat), 0)
            if rows and needs_remat(rows // max(1, self.n_devices),
                                    getattr(cfg, 'bf16_acts', False)):
                cfg.remat = True
                cfg.remat_auto = True
                self.model = S.build_model(cfg, self.num_classes,
                                           axis_name=M.AXIS
                                           if self.n_devices > 1 else None)
                print(f'auto-remat: {rows} padded rows/step does not fit '
                      '16 GB HBM without block remat (--no_auto_remat to '
                      'override)')
        if self.spatial:
            from box2mask_tpu.parallel import spatial as SP
            devs = jax.devices()[:self.spatial]
            assert len(devs) == self.spatial, \
                f'--spatial_shards {self.spatial} needs that many devices'
            self.mesh = jax.sharding.Mesh(np.array(devs), (SP.AXIS,))
            variables = SP.make_spatial_init(self.mesh, self.model,
                                             sample_batch,
                                             seed=cfg.fixed_seed or 0)
            self.state = S.TrainState(
                params=variables['params'],
                batch_stats=variables['batch_stats'],
                opt_state=self.tx.init(variables['params']),
                step=jnp.int32(0))
            self._train_step = SP.make_spatial_train_step(
                self.mesh, cfg, self.model, self.tx, sample_batch)
            self._val_step_spatial = SP.make_spatial_val_step(
                self.mesh, cfg, self.model, sample_batch)
            self._val_step = None
            self._resume()
            return
        init_model = S.build_model(cfg, self.num_classes, axis_name=None)
        self.state = S.init_state(cfg, init_model, self.tx, sample_batch,
                                  seed=cfg.fixed_seed or 0)
        if self.n_devices > 1:
            self.mesh = M.make_mesh(self.n_devices)
            self._train_step = M.make_parallel_train_step(
                cfg, self.model, self.tx, self.mesh)
        else:
            self._train_step = S.make_train_step(cfg, self.model, self.tx)
        # eval mode has no collectives (BN uses running stats), so one plain
        # jit val step serves both single- and multi-device training
        self._val_step = S.make_val_step(cfg, self.model)
        self._resume()

    def _resume(self):
        path = ckpt.find_checkpoint(self.cfg.checkpoint_path)
        if path is None:
            print(f'No checkpoints found at {self.cfg.checkpoint_path}')
            return
        fresh = self.state
        (self.state, epoch, self.training_time, self.iteration_num,
         name) = ckpt.load_checkpoint(path, self.state,
                                      strict=not self.cfg.loose_model_loading)
        if self.cfg.apple_warmstart:
            # warm start excluding the (class-count-mismatched) final semantic
            # layer (reference models/training.py:242-249): keep the fresh
            # init for the semantic heads' output projection
            params = dict(self.state.params)
            for head in ('mlp_semantics', 'mlp_per_vox_semantics'):
                if head in params and head in fresh.params:
                    h = dict(params[head])
                    last = sorted(k for k in h if k.startswith('Linear1x1'))[-1]
                    h[last] = fresh.params[head][last]
                    params[head] = h
            self.state = self.state._replace(params=params)
            self.start_epoch = 0
            print(f'Warm-started from {name} (semantic output layer re-init)')
            return
        self.start_epoch = epoch
        print(f'Resumed from {name} (epoch {epoch})')

    # ------------------------------------------------------------------ steps
    def _to_device_batch(self, batch):
        if self.n_devices > 1:
            shards = [b for b, _ in batch] if isinstance(batch, list) else batch
            return {k: jnp.asarray(v)
                    for k, v in collate_device_batches(shards).items()}
        # single-device: ONE packed upload + one on-device unpack dispatch
        # instead of ~50 per-array transfers (engine/hostload.BatchUploader;
        # ~1.7s -> ~0.2s per ScanNet-scale step over the tunnel). No-op on
        # non-TPU backends.
        if not hasattr(self, '_uploader'):
            from box2mask_tpu.engine.hostload import BatchUploader
            self._uploader = BatchUploader()
        return self._uploader(batch)

    def compute_val_loss(self, epoch):
        """5-batch validation loss (training.py:263-284)."""
        if self.val_loader is None:
            return None
        bb_w, cs_w = S.head_weights(self.cfg, epoch)
        sums, n = {}, 0
        for i, (dev, _host) in enumerate(self.val_loader):
            if i >= self.cfg.num_eval_batches:
                break
            batch = self._to_device_batch(dev) if self.n_devices == 1 \
                else {k: jnp.asarray(v) for k, v in dev.items()}
            step = (self._val_step_spatial if self.spatial
                    else self._val_step)
            ld = step(self.state, batch, jnp.float32(bb_w),
                      jnp.float32(cs_w))
            for k, v in ld.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------ train
    def train_model(self, epochs):
        cfg = self.cfg
        for epoch in range(self.start_epoch, epochs):
            self.train_loader.set_epoch(epoch)
            lr = lr_for_epoch(cfg, epoch)
            bb_w, cs_w = S.head_weights(cfg, epoch)
            self.writer.add_scalar('learning_rate', lr, epoch)
            epoch_sums, epoch_n = {}, 0

            for batch_num, item in enumerate(self.train_loader):
                t0 = time.time()
                if self.n_devices > 1:
                    shards = item
                    dev = self._to_device_batch([s for s in shards])
                    host = shards[0][1]
                else:
                    dev_np, host = item
                    dev = self._to_device_batch(dev_np)
                self._ensure_state(
                    {k: (v[0] if self.n_devices > 1 else v)
                     for k, v in dev.items()})
                prep_time = time.time() - t0

                # epoch-head block (training.py:99-152)
                if batch_num == 0 and not (
                        epoch == self.start_epoch and cfg.skip_first_eval):
                    self._epoch_head(epoch)

                if self.cfg.profile_dir and self.iteration_num == 10:
                    jax.profiler.start_trace(self.cfg.profile_dir)
                t1 = time.time()
                self.state, ld = self._train_step(
                    self.state, dev, jnp.float32(lr), jnp.float32(bb_w),
                    jnp.float32(cs_w))
                loss = float(ld['optimization_loss'])  # blocks: true step time
                step_time = time.time() - t1
                self.training_time += time.time() - t0
                self.iteration_num += 1
                if self.cfg.profile_dir and self.iteration_num == 15:
                    jax.profiler.stop_trace()
                    print(f'Profiler trace written to {self.cfg.profile_dir}')

                self.writer.add_scalar('iteration/batch_prep_time', prep_time,
                                       self.iteration_num)
                self.writer.add_scalar('iteration/train_step_time', step_time,
                                       self.iteration_num)
                self._log_memory()
                for k, v in ld.items():
                    epoch_sums[k] = epoch_sums.get(k, 0.0) + float(v)
                epoch_n += 1
                print(f'epoch {epoch} it {self.iteration_num} '
                      f'loss {loss:.4f} (prep {prep_time:.2f}s '
                      f'step {step_time:.2f}s)')

            for k, v in epoch_sums.items():
                self.writer.add_scalar(f'train_epoch/{k}', v / max(epoch_n, 1),
                                       epoch)
            self.writer.add_scalar('epoch', epoch, self.iteration_num)
            self.writer.flush()
        return self.training_time

    def _epoch_head(self, epoch):
        cfg = self.cfg
        if epoch % cfg.ckpt_every == 0:
            t0 = time.time()
            path = ckpt.save_checkpoint(cfg.checkpoint_path, self.state,
                                        self.training_time, epoch,
                                        self.iteration_num)
            print(f'Saved checkpoint {os.path.basename(path)} '
                  f'({time.time() - t0:.1f}s)')
        if epoch % cfg.val_every == 0 and self.val_loader is not None:
            val = self.compute_val_loss(epoch)
            if val:
                for k, v in val.items():
                    self.writer.add_scalar(f'val/{k}', v, epoch)
                if val['optimization_loss'] < self.val_min:
                    self.val_min = val['optimization_loss']
                    ckpt.write_val_min_marker(cfg.exp_path, self.val_min)
        if (epoch % cfg.eval_every == 0 and epoch >= 250 and cfg.full_model
                and cfg.dataset_name == 'scannet'):
            self._full_eval(epoch)

    def _full_eval(self, epoch):
        """Full val-set mAP during training (training.py:129-142).

        Failures must not kill a multi-day training run, but they must be
        LOUD: full traceback to stderr + a TB marker scalar per failure."""
        try:
            from box2mask_tpu.engine.evaluate import Evaluater
            ev = Evaluater(self.cfg, state=self.state, model=self.model,
                           writer=self.writer, epoch=epoch)
            from box2mask_tpu.datasets.loader import get_dataset
            val_ds = get_dataset(self.cfg, 'val',
                                 do_augmentations=not self.cfg.eval_wo_aug)
            ev.eval(val_ds)
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception:
            import traceback
            traceback.print_exc()
            print(f'Full eval FAILED at epoch {epoch} (traceback above); '
                  'training continues')
            self.writer.add_scalar('val/full_eval_failed', 1.0, epoch)

    def _log_memory(self):
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                self.writer.add_scalar(
                    'memory/bytes_in_use', stats.get('bytes_in_use', 0),
                    self.iteration_num)
        except Exception:
            pass
