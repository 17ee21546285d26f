"""Evaluation / prediction driver.

Surface-parity with the reference Evaluater (models/evaluation.py:36-734):
checkpoint selection (explicit / closest-to-N-hours / latest), batch-size-1
dataset prediction with pickle caching keyed by batch size + seed, pred->mask
conversion, per-dataset evaluation protocols (ScanNet official AP /
ARKitScenes VOC OBB AP / S3DIS mPrec+mRec), eval-threshold param search,
ScanNet-benchmark submission write-out, and visualization production.

Differences by design: param search runs the grid in-process against the cached
predictions instead of spawning slurm sbatch jobs (evaluation.py:353-366) — the
expensive network forward is shared across all threshold combinations.
"""

from __future__ import annotations

import os
import pickle
import uuid

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.engine import checkpoint as ckpt
from box2mask_tpu.engine import state as S
from box2mask_tpu.datasets.tables import get_tables
from box2mask_tpu.postprocess.detection2mask import detection_to_masks
from box2mask_tpu.metrics import scannet_ap, detection_ap, box3d, s3dis_metrics


def _fused_eval_enabled(cfg):
    """The fused stacked pipeline (engine/infer.py) is THE product inference
    path on TPU; B2M_FUSED_EVAL=1/0 forces it on (CPU tests, interpret
    kernels) / off (A/B against the legacy per-array path)."""
    forced = os.environ.get('B2M_FUSED_EVAL')
    if forced is not None:
        return forced == '1'
    return jax.default_backend() == 'tpu'


class Evaluater:
    def __init__(self, cfg, state=None, model=None, writer=None, epoch=None):
        self.cfg = cfg
        self.writer = writer
        self.epoch = epoch
        (self.valid_class_ids, self.sem_id2idx, self.inst_id2idx,
         self.is_foreground) = get_tables(
            cfg.dataset_name if cfg.dataset_name != 'synthetic' else 'scannet')
        self.model = model or S.build_model(cfg, len(self.valid_class_ids),
                                            remat=False)
        self.state = state
        self._forward = S.make_forward(cfg, self.model)
        self.ckpt_name = 'untrained'
        self._needs_restore = state is None
        self.results_path = None

    # ------------------------------------------------------------ state mgmt
    def _ensure_state(self, sample_batch):
        if self.state is None:
            tx = S.make_optimizer(self.cfg)
            init_model = S.build_model(self.cfg, len(self.valid_class_ids),
                                       remat=False)
            self.state = S.init_state(self.cfg, init_model, tx, sample_batch)
        if self._needs_restore:
            path = ckpt.find_checkpoint(self.cfg.checkpoint_path,
                                        self.cfg.checkpoint,
                                        self.cfg.load_ckpt_closest_to)
            if path is not None and os.path.exists(path):
                (self.state, _, _, _, self.ckpt_name) = ckpt.load_checkpoint(
                    path, self.state, strict=not self.cfg.loose_model_loading)
                print(f'Loaded checkpoint: {self.ckpt_name}')
            else:
                print(f'No checkpoint at {self.cfg.checkpoint_path}; '
                      'evaluating the untrained model')
            self._needs_restore = False
        if self.results_path is None:
            self.results_path = os.path.join(self.cfg.exp_path, 'results',
                                             self.ckpt_name)
            os.makedirs(self.results_path, exist_ok=True)

    # ------------------------------------------------------------ prediction
    def _predictions_cache_path(self, batch_size, dataset=None):
        seed = self.cfg.fixed_seed if self.cfg.fixed_seed else 'noseed'
        tag = ''
        if dataset is not None:
            import hashlib
            names = ','.join(str(n) for n in dataset.data_list[:8])
            h = hashlib.sha1(f'{dataset.mode}:{len(dataset)}:{names}'
                             .encode()).hexdigest()[:8]
            tag = f'_{dataset.mode}_{h}'
        return os.path.join(self.results_path,
                            f'predictions_bs{batch_size}_seed{seed}{tag}.pkl')

    def dataset_prediction(self, dataset, batch_size=1, cache=True):
        """Per-scene forward passes; returns list of (pred, dev, host)."""
        loader = dataset.get_loader(shuffle=False, drop_last=False,
                                    batch_size=batch_size)
        entries = []
        if not hasattr(self, '_uploader'):
            # ONE packed upload per batch instead of ~50 per-array transfers
            # (engine/hostload.BatchUploader; no-op off-TPU)
            from box2mask_tpu.engine.hostload import BatchUploader
            self._uploader = BatchUploader()
        pending = []          # 2-deep pipeline: harvest batch b-2 while b
        # computes — upload/dispatch are async, so the only blocking op is
        # the fetch, and it hides behind two batches of device time
        # (scripts/profile_pipeline.py breakdown, DESIGN.md round-3)

        def _harvest(pred_dev, keep, host):
            pred = {k: np.asarray(v) for k, v in pred_dev.items()}
            entries.append((pred, keep, host))
            print(f'predicted {[s["name"] for s in host["scene"]]}')

        for dev_np, host in loader:
            batch = self._uploader(dev_np)
            self._ensure_state(batch)
            pred_dev = self._forward(self.state.params,
                                     self.state.batch_stats, batch)
            keep = {k: dev_np[k] for k in
                    ('num_segments', 'input_location', 'batch_ids', 'batch0',
                     'num0', 'seg_valid', 'valid0', 'pooling_ids')
                    if k in dev_np}
            pending.append((pred_dev, keep, host))
            if len(pending) > 2:
                _harvest(*pending.pop(0))
        for p in pending:
            _harvest(*p)
        if cache:
            path = self._predictions_cache_path(batch_size, dataset)
            with open(path, 'wb') as f:
                pickle.dump(entries, f)
        return entries

    # --------------------------------------------------- fused product path
    def _use_fused(self, dataset):
        """Every dataset's eval runs the fused stacked pipeline
        (engine/infer.py) — identical code path to bench.py. S3DIS rides it
        when the per-vox semantics head it consumes is configured (the u8
        `vox_sem` plane in the stacked readback, round-4 verdict #4);
        spatial sharding keeps its own forward."""
        ok = self.cfg.dataset_name in ('scannet', 'synthetic', 'arkitscenes')
        if (self.cfg.dataset_name == 's3dis'
                and self.cfg.mlp_per_vox_semantics in self.cfg.network_heads):
            ok = True
        return (_fused_eval_enabled(self.cfg) and ok
                and getattr(self.cfg, 'spatial_shards', 0) <= 1)

    def fused_dataset_results(self, dataset, ths=None, cache=True):
        """Product inference: returns (results, light_entries).

        `results` is the detection_to_masks-compatible dict straight from the
        stacked device readback; `light_entries` [(None, None, host), ...]
        carry the per-scene host metadata the eval protocols need (GT
        derivation, OBB corners). Cached per (batch size, seed, split,
        thresholds) as the compact stacked readbacks — ~1 MB/scene instead of
        raw head outputs."""
        self._ensure_state_from_dataset(dataset)
        ths = tuple(float(t) for t in
                    (ths if ths is not None else self.cfg.eval_ths))
        bs = max(1, int(getattr(self.cfg, 'eval_batch_size', 1) or 1))
        path = self._predictions_cache_path(bs, dataset)[:-4] \
            + '_fused_' + '_'.join(str(t) for t in ths) + '.pkl'
        self._vox_sem = {}      # scene -> u8 per-vox semantics (s3dis eval)
        if cache and os.path.exists(path):
            print(f'Reusing cached fused readbacks: {path}')
            with open(path, 'rb') as f:
                cached = pickle.load(f)
            from box2mask_tpu.postprocess.device_post import (
                stacked_masks_to_results)
            results, entries = {}, []
            for out_np, host, overflow_results in cached:
                results.update(stacked_masks_to_results(
                    out_np, None, host, self.valid_class_ids, mode='eval'))
                results.update(overflow_results)   # fallback-resolved scenes
                entries.append((None, None, host))
                self._collect_vox_sem(out_np, host)
            return results, entries

        if not hasattr(self, '_fused_pipe'):
            from box2mask_tpu.engine.infer import FusedInferencePipeline
            self._fused_pipe = FusedInferencePipeline(
                self.cfg, self.valid_class_ids, self.is_foreground,
                model=self.model, top_k=128)
        loader = dataset.get_loader(shuffle=False, drop_last=False,
                                    batch_size=bs)
        results, entries, to_cache = {}, [], []
        for batch_results, out_np, dev_np, host in self._fused_pipe.run(
                self.state.params, self.state.batch_stats, loader, ths):
            assert 'keys0_b' in dev_np or len(host['scene']) == 1, (
                'host-maps layout (coords beyond the key packing range) '
                'supports fused eval only at batch size 1 — set '
                '--eval_batch_size 1 or a larger --voxel_size')
            results.update(batch_results)
            entries.append((None, None, host))
            self._collect_vox_sem(out_np, host)
            print(f'predicted {[s["name"] for s in host["scene"]]}')
            if cache:
                overflow = {}
                if bool(np.asarray(out_np.get('topk_overflow', False)).any()):
                    # keep the fallback-resolved results for overflow scenes:
                    # a cache reload cannot re-run the device fallback
                    for si, s in enumerate(host['scene']):
                        if bool(out_np['topk_overflow'][si]):
                            overflow[s['name']] = batch_results[s['name']]
                to_cache.append((out_np, host, overflow))
        if cache:
            with open(path, 'wb') as f:
                pickle.dump(to_cache, f)
        return results, entries

    def _collect_vox_sem(self, out_np, host):
        """Harvest the per-scene u8 per-vox semantics plane from a stacked
        fused readback (present iff the per-vox head is configured);
        s3dis_eval_fused consumes it."""
        if 'vox_sem' not in out_np:
            return
        for si, s in enumerate(host['scene']):
            self._vox_sem[s['name']] = np.asarray(out_np['vox_sem'][si])

    # ------------------------------------------------- sharded (spatial) eval
    def spatial_dataset_results(self, dataset):
        """Sharded evaluation: each scene's forward runs spatially sharded
        over the `space` mesh (parallel/spatial.SpatialSelectionNet — one
        scene's voxels split into contiguous key slabs with halo-exchanged
        convs), so scenes too large for one device's vox_bucket still
        evaluate at FULL resolution. The reference instead downsamples huge
        scenes for both train and eval
        (reference dataprocessing/arkitscenes.py:351-354).

        Post-processing consumes the REPLICATED pooled head outputs (one
        per-segment row set), so it runs unsharded: the vote->mask pipeline
        is per-segment, and voxel-level mask IoU is permutation-invariant, so
        the key-sorted voxel order of the spatial batch is fine. Returns
        (results, light_entries) like fused_dataset_results."""
        from box2mask_tpu.parallel import spatial as SP
        from box2mask_tpu.postprocess.device_post import make_device_postproc
        cfg = self.cfg
        D = cfg.spatial_shards
        devs = jax.devices()[:D]
        assert len(devs) == D, f'--spatial_shards {D} needs that many devices'
        mesh = jax.sharding.Mesh(np.array(devs), (SP.AXIS,))
        compute_dtype = {'bfloat16': jnp.bfloat16,
                         'float32': jnp.float32}[cfg.compute_dtype]
        model = SP.SpatialSelectionNet(
            num_classes=len(self.valid_class_ids),
            heads=tuple(cfg.network_heads), layers=cfg.layers,
            gather_level=cfg.spatial_gather_level,
            do_segment_pooling=cfg.do_segment_pooling,
            max_pool_segments=cfg.max_pool_segments_detection_net,
            mlp_bounds_relu=cfg.mlp_bounds_relu, compute_dtype=compute_dtype)
        if not hasattr(self, '_spatial_post'):
            self._spatial_post = make_device_postproc(
                cfg, self.valid_class_ids, self.is_foreground)
        ths = jnp.asarray(cfg.eval_ths, jnp.float32)
        loader = dataset.get_loader(shuffle=False, drop_last=False,
                                    batch_size=1)
        results, entries = {}, []
        fwds = {}
        for dev_np, host in loader:
            dev_j = {k: jnp.asarray(v) for k, v in dev_np.items()}
            if self.state is None or self._needs_restore:
                self._ensure_state_spatial(mesh, model, dev_np)
            if self.results_path is None:
                self.results_path = os.path.join(self.cfg.exp_path, 'results',
                                                 self.ckpt_name)
                os.makedirs(self.results_path, exist_ok=True)
            # the compiled fwd (and its shard_map in_specs) is specialized on
            # the batch's key set: scenes past the 10-bit key packing skip
            # sp_kc*/sp_ext* plan emission (parallel/spatial.py) and must not
            # reuse a fwd traced from a plan-carrying batch (advisor round 4)
            sig = tuple(sorted(dev_np))
            if sig not in fwds:
                fwds[sig] = SP.make_spatial_apply(mesh, model, dev_np,
                                                  train=False)
            fwd = fwds[sig]
            pred = fwd({'params': self.state.params,
                        'batch_stats': self.state.batch_stats}, dev_j)
            # pseudo single-scene flat batch over the PERMUTED voxel axis for
            # the standard per-segment postproc
            valid0 = dev_j['sp_valid0'].reshape(-1)
            flat = {
                'pooling_ids': dev_j['sp_pool'].reshape(-1),
                'valid0': valid0,
                'batch0': jnp.where(valid0, 0, -1).astype(jnp.int32),
                'input_location': dev_j['input_location'],
                'seg_valid': dev_j['seg_valid'],
                'batch_ids': dev_j['batch_ids'],
            }
            out = self._spatial_post(pred, flat, jnp.int32(0), ths)
            n = int(out['n_keep'])
            segm = np.asarray(out['seg_masks'])[:n]     # (n, S_pad) bool
            # seg-level masks -> per-point masks (original point order):
            # point's segment = seg2vox[vox2point]
            seg_of_point = np.asarray(host['seg2vox'][0])[
                np.asarray(host['vox2point'][0])]
            name = host['scene'][0]['name']
            label_id = np.asarray(self.valid_class_ids)[
                np.asarray(out['label_idx'])[:n]]
            results[name] = {
                'conf': np.asarray(out['conf'])[:n],
                'label_id': label_id.astype(np.int32),
                'mask': segm[:, seg_of_point] if n else
                        np.zeros((0, len(seg_of_point)), bool)}
            entries.append((None, None, host))
            print(f'predicted {name} (spatial x{D})')
        return results, entries

    def _ensure_state_spatial(self, mesh, model, sample_dev):
        from box2mask_tpu.parallel import spatial as SP
        if self.state is None:
            variables = SP.make_spatial_init(mesh, model, sample_dev,
                                             seed=self.cfg.fixed_seed or 0)
            tx = S.make_optimizer(self.cfg)
            self.state = S.TrainState(
                params=variables['params'],
                batch_stats=variables['batch_stats'],
                opt_state=tx.init(variables['params']), step=jnp.int32(0))
        if self._needs_restore:
            path = ckpt.find_checkpoint(self.cfg.checkpoint_path,
                                        self.cfg.checkpoint,
                                        self.cfg.load_ckpt_closest_to)
            if path is not None and os.path.exists(path):
                (self.state, _, _, _, self.ckpt_name) = ckpt.load_checkpoint(
                    path, self.state, strict=not self.cfg.loose_model_loading)
                print(f'Loaded checkpoint: {self.ckpt_name}')
            else:
                print(f'No checkpoint at {self.cfg.checkpoint_path}; '
                      'evaluating the untrained model')
            self._needs_restore = False
        if self.results_path is None:
            self.results_path = os.path.join(self.cfg.exp_path, 'results',
                                             self.ckpt_name)
            os.makedirs(self.results_path, exist_ok=True)

    def load_or_predict(self, dataset, batch_size=1):
        self._ensure_state_from_dataset(dataset)
        path = self._predictions_cache_path(batch_size, dataset)
        if os.path.exists(path):
            print(f'Reusing cached predictions: {path}')
            with open(path, 'rb') as f:
                return pickle.load(f)
        return self.dataset_prediction(dataset, batch_size)

    def _ensure_state_from_dataset(self, dataset):
        if self.state is not None and not self._needs_restore:
            if self.results_path is None:
                self.results_path = os.path.join(self.cfg.exp_path, 'results',
                                                 self.ckpt_name)
                os.makedirs(self.results_path, exist_ok=True)
            return
        dev_np, _ = next(iter(dataset.get_loader(
            shuffle=False, drop_last=False, batch_size=1)))
        self._ensure_state({k: jnp.asarray(v) for k, v in dev_np.items()})

    def pred_entries_to_results(self, entries, ths=None):
        """pred2mask over all batches (models/evaluation.py:94-98).

        On TPU the detection->masks pipeline runs on the chip
        (postprocess/device_post.py, ~0.05s vs ~0.8s/scene host NumPy); the
        thresholds are traced, so param_search re-runs it without recompiling.
        Falls back to the host oracle on other backends or for prediction
        caches written before the needed batch arrays were kept."""
        import jax
        need = ('pooling_ids', 'valid0', 'seg_valid', 'batch_ids',
                'input_location')
        use_device = (jax.default_backend() == 'tpu'
                      and all(all(k in dev for k in need)
                              for _, dev, _ in entries))
        results = {}
        if use_device:
            from box2mask_tpu.postprocess.device_post import (
                make_device_postproc, device_masks_to_results)
            if not hasattr(self, '_device_post'):
                self._device_post = make_device_postproc(
                    self.cfg, self.valid_class_ids, self.is_foreground)
            ths_arr = jnp.asarray(ths if ths is not None else
                                  self.cfg.eval_ths, jnp.float32)
            for pred, dev, host in entries:
                pred_j = {k: jnp.asarray(v) for k, v in pred.items()}
                dev_j = {k: jnp.asarray(v) for k, v in dev.items()}
                for si in range(len(host['scene'])):
                    out = self._device_post(pred_j, dev_j, jnp.int32(si),
                                            ths_arr)
                    results.update(device_masks_to_results(
                        out, dev, host, self.valid_class_ids, si,
                        mode='eval'))
            return results
        for pred, dev, host in entries:
            r = detection_to_masks(pred, dev, host, self.cfg,
                                   self.valid_class_ids, self.is_foreground,
                                   mode='eval', ths=ths)
            results.update(r)
        return results

    # ------------------------------------------------------------------ eval
    def eval(self, dataset, write_to_tb=None):
        if (getattr(self.cfg, 'spatial_shards', 0) > 1
                and self.cfg.dataset_name in ('scannet', 'synthetic',
                                              'arkitscenes')):
            # arkitscenes is the motivating huge-scene dataset for spatial
            # sharding: spatial_dataset_results returns the same
            # (results, light_entries) pair its protocol consumes
            # (advisor round 4)
            results, entries = self.spatial_dataset_results(dataset)
            if self.cfg.dataset_name == 'arkitscenes':
                return self.arkitscenes_eval(results, entries)
            return self.scannet_eval(results, entries,
                                     write_to_tb=write_to_tb)
        if self._use_fused(dataset):
            # THE product TPU path: identical pipeline to bench.py
            # (engine/infer.py — one fused dispatch + one stacked readback
            # per batch; round-3 verdict #1)
            results, entries = self.fused_dataset_results(dataset)
            if self.cfg.dataset_name == 'arkitscenes':
                return self.arkitscenes_eval(results, entries)
            if self.cfg.dataset_name == 's3dis':
                return self.s3dis_eval_fused(results, entries)
            return self.scannet_eval(results, entries,
                                     write_to_tb=write_to_tb)
        entries = self.load_or_predict(dataset)
        if self.cfg.dataset_name in ('scannet', 'synthetic'):
            results = self.pred_entries_to_results(entries)
            return self.scannet_eval(results, entries,
                                     write_to_tb=write_to_tb)
        if self.cfg.dataset_name == 'arkitscenes':
            results = self.pred_entries_to_results(entries)
            return self.arkitscenes_eval(results, entries)
        if self.cfg.dataset_name == 's3dis':
            return self.s3dis_eval(entries)
        raise ValueError(self.cfg.dataset_name)

    # ---------------------------------------------------------- ScanNet eval
    def gt_ids_for_entries(self, entries):
        """GT per-point ids: from gt_instance_data_txt when present (the
        reference's gt encoding, utils/gt2eval.py:15), else derived from labels."""
        gt_root = os.path.join(self.cfg.data_dir, 'gt_instance_data_txt')
        out = {}
        for _, _, host in entries:
            for scene, labels in zip(host['scene'], host['labels']):
                name = scene['name']
                txt = os.path.join(gt_root, f'{name}.txt')
                if os.path.exists(txt):
                    out[name] = np.loadtxt(txt, dtype=np.int64)
                else:
                    out[name] = scannet_ap.encode_gt_ids(
                        labels['semantics'], labels['instances'])
        return out

    def scannet_eval(self, results, entries, write_to_tb=None):
        gt_ids = self.gt_ids_for_entries(entries)
        avgs, ap, pr_curves = scannet_ap.evaluate_scannet(results, gt_ids)
        table = scannet_ap.format_results_table(avgs)
        print(table)

        folder = os.path.join(
            self.results_path,
            ('param_search/' if self.cfg.eval_specific_param else '')
            + f"mAP50_{avgs['all_ap_50%']:.3f}_eval_ths:"
            + '_'.join(str(t) for t in (self.cfg.eval_ths or []))
            + (f'_seed:{self.cfg.fixed_seed}' if self.cfg.fixed_seed
               else f'_rid:{str(uuid.uuid1())[:8]}'))
        os.makedirs(folder, exist_ok=True)
        with open(os.path.join(folder, 'table.txt'), 'w') as f:
            f.write(table + '\n')
        self._write_pr_curves(folder, pr_curves)
        if self.writer is not None and self.epoch is not None:
            self.writer.add_scalar('val/mAP', avgs['all_ap'], self.epoch)
            self.writer.add_scalar('val/mAP50', avgs['all_ap_50%'], self.epoch)
            self.writer.add_scalar('val/mAP25', avgs['all_ap_25%'], self.epoch)
        return avgs

    def _write_pr_curves(self, folder, pr_curves):
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            for th in (0.25, 0.5):
                if th not in pr_curves:
                    continue
                fig, ax = plt.subplots(figsize=(7, 6))
                for label, (prec, rec) in pr_curves[th].items():
                    ax.plot(rec, prec, label=label)
                ax.set_xlabel('recall')
                ax.set_ylabel('precision')
                ax.set_title(f'PR curves @ IoU {th}')
                ax.legend(fontsize=6)
                fig.savefig(os.path.join(folder, f'pr_curves_{th}.png'),
                            dpi=120)
                plt.close(fig)
        except Exception as e:
            print(f'PR curve plotting failed: {e}')

    # ------------------------------------------------------- ARKitScenes eval
    def arkitscenes_eval(self, results, entries, oriented_boxes=True,
                         iou_t=0.5):
        from scipy.spatial import ConvexHull
        pred_all, gt_all = {}, {}
        for _, _, host in entries:
            for scene, labels in zip(host['scene'], host['labels']):
                name = scene['name']
                result = results[name]
                gt_list = []
                for i in range(len(labels['per_instance_bb_centers'])):
                    rot = labels['per_instance_bb_rotations'][i].reshape(3, 3).T
                    corners = box3d.oriented_corners(
                        labels['per_instance_bb_bounds'][i], rot,
                        labels['per_instance_bb_centers'][i])
                    gt_list.append([int(labels['per_instance_semantics'][i]),
                                    corners])
                pred_list = []
                for i in range(len(result['label_id'])):
                    mask = np.asarray(result['mask'][i]) > 0
                    pts = scene['positions'][mask]
                    if len(pts) < 50:
                        continue
                    if oriented_boxes:
                        hull = ConvexHull(pts[:, :2])
                        v2 = pts[hull.vertices][:, :2]
                        zmin, zmax = pts[:, 2].min(), pts[:, 2].max()
                        bottom = np.concatenate(
                            [v2, np.full((len(v2), 1), zmin)], axis=1)
                        top = np.concatenate(
                            [v2, np.full((len(v2), 1), zmax)], axis=1)
                        bb = np.concatenate([bottom, top], axis=0)
                    else:
                        mn, mx = pts.min(0), pts.max(0)
                        bb = np.concatenate([(mn + mx) / 2, mx - mn])
                    pred_list.append([int(result['label_id'][i]), bb,
                                      float(result['conf'][i])])
                pred_all[name] = pred_list
                gt_all[name] = gt_list

        iou_func = (lambda a, b: box3d.hull_box_iou(a, b)[0]) \
            if oriented_boxes else box3d.aabb_iou_cs
        rec, prec, ap = detection_ap.eval_det(pred_all, gt_all,
                                              ovthresh=iou_t,
                                              get_iou_func=iou_func)
        from box2mask_tpu.datasets.tables import ARKITSCENES_ID2NAME
        for k, v in sorted(ap.items()):
            print(f'{ARKITSCENES_ID2NAME.get(k, k):>15}: \t {v:.3f}')
        vals = [v for v in ap.values() if not np.isnan(v)]
        mAP = float(np.mean(vals)) if vals else 0.0
        print('mAP:', mAP)
        return mAP

    # ------------------------------------------------------------ S3DIS eval
    def s3dis_eval(self, entries):
        """Legacy raw-pred entry point: per-vox semantics from the full head
        output. The fused path (s3dis_eval_fused) gets the argmax from the
        stacked readback instead."""
        per_scene = []
        for pred, dev, host in entries:
            results = detection_to_masks(pred, dev, host, self.cfg,
                                         self.valid_class_ids,
                                         self.is_foreground, mode='eval')
            for si, (scene, labels) in enumerate(zip(host['scene'],
                                                     host['labels'])):
                name = scene['name']
                vox_batch = np.asarray(dev['batch0']) == si
                vox_sem = np.argmax(
                    np.asarray(pred[self.cfg.mlp_per_vox_semantics]), 1)
                vox_sem = vox_sem[vox_batch]
                pred_sem = vox_sem[host['vox2point'][si]]
                per_scene.append((scene, labels, pred_sem,
                                  results[name]['mask'], name))
        return self._s3dis_protocol(per_scene)

    def s3dis_eval_fused(self, results, entries):
        """Fused product-path S3DIS eval (round-4 verdict #4): masks from the
        stacked readback results, per-vox semantics from the u8 `vox_sem`
        plane fused_dataset_results collected (reference consumes the same
        head, evaluation.py:145-164)."""
        per_scene = []
        for _, _, host in entries:
            for si, (scene, labels) in enumerate(zip(host['scene'],
                                                     host['labels'])):
                name = scene['name']
                vox_sem = self._vox_sem[name].astype(np.int64)
                pred_sem = vox_sem[host['vox2point'][si]]
                per_scene.append((scene, labels, pred_sem,
                                  results[name]['mask'], name))
        return self._s3dis_protocol(per_scene)

    def _s3dis_protocol(self, per_scene):
        from box2mask_tpu.postprocess.s3dis_background import (
            clustering_for_background, assign_semantics_to_proposals)
        gt_labels, pred_labels = [], []
        for scene, labels, pred_sem, masks, name in per_scene:
            bg_inst = clustering_for_background(
                pred_sem, scene['positions'], scene['normals'])
            prop_sem = assign_semantics_to_proposals(pred_sem, masks)

            pred_inst = np.full_like(labels['instances'], -1)
            final_sem = pred_sem.copy()
            for idx, mask in enumerate(masks):
                if prop_sem[idx] < 3:      # bg classes handled separately
                    continue
                mask = np.asarray(mask) > 0
                orig = mask.sum()
                mask = mask & (pred_inst < 0)
                kept = mask.sum()
                if orig == 0 or kept / orig < 0.6 or kept < 200:
                    continue
                pred_inst[mask] = idx + 1
                final_sem[mask] = prop_sem[idx]

            max_id = pred_inst.max()
            bg = bg_inst > 0
            pred_inst[bg] = bg_inst[bg] + max_id
            # suppress per-class small fragments (<200 points)
            for class_id in range(13):
                cm = pred_sem == class_id
                ids, cnts = np.unique(pred_inst[cm], return_counts=True)
                small = np.isin(pred_inst[cm], ids[cnts < 200])
                tmp = pred_inst[cm]
                tmp[small] = -1
                pred_inst[cm] = tmp

            if self.cfg.full_resolution:
                # upsample predictions to the full point cloud by 1-NN
                # against the sampled positions (reference
                # evaluation.py:151-154,216-222 get_sparse2dense)
                import copy as _copy
                from scipy.spatial import cKDTree
                from box2mask_tpu.datasets import s3dis as s3dis_reader
                full_cfg = _copy.copy(self.cfg)
                full_cfg.point_sampling_rate = None
                scene_full, labels_full = s3dis_reader.process_scene(
                    name, 'val', full_cfg, do_augmentations=False)
                tree = cKDTree(scene['positions'])
                _, sparse2dense = tree.query(scene_full['positions'], k=1)
                gt_labels.append({'semantics': labels_full['semantics'],
                                  'instances': labels_full['instances']})
                pred_labels.append(
                    {'semantics': pred_sem[sparse2dense],
                     'instances': pred_inst[sparse2dense]})
                continue
            gt_labels.append({'semantics': labels['semantics'],
                              'instances': labels['instances']})
            pred_labels.append({'semantics': pred_sem,
                                'instances': pred_inst})

        out = s3dis_metrics.evaluate_s3dis(pred_labels, gt_labels)
        print('mean Precision', out['mPrecision'])
        print('mean Recall', out['mRecall'])
        from box2mask_tpu.datasets.tables import S3DIS_CLASS_LABELS
        for name, p, r in zip(S3DIS_CLASS_LABELS, out['precision'],
                              out['recall']):
            print(f'{name:>15}: prec {p:.3f} rec {r:.3f}')
        return out

    # ----------------------------------------------------------- param search
    def param_search(self, dataset):
        """Grid over the 4 eval thresholds (reference spawns slurm jobs,
        evaluation.py:353-366; we sweep in-process on cached predictions)."""
        cfg = self.cfg
        entries = self.load_or_predict(dataset)
        grids = [np.linspace(float(a), float(b), int(c)) for a, b, c in
                 (cfg.cluster_th_search, cfg.score_th_search,
                  cfg.mask_bin_th_search, cfg.mask_nms_th_search)]
        best, table = None, []
        for c_th in grids[0]:
            for s_th in grids[1]:
                for b_th in grids[2]:
                    for n_th in grids[3]:
                        ths = (c_th, s_th, b_th, n_th)
                        results = self.pred_entries_to_results(entries, ths=ths)
                        gt_ids = self.gt_ids_for_entries(entries)
                        avgs, _, _ = scannet_ap.evaluate_scannet(results, gt_ids)
                        score = avgs['all_ap_50%']
                        table.append((ths, score))
                        print(f'ths={ths} mAP50={score:.4f}')
                        if best is None or score > best[1]:
                            best = (ths, score)
        out = os.path.join(self.results_path, 'param_search.txt')
        with open(out, 'w') as f:
            for ths, score in table:
                f.write(f'{ths} {score}\n')
            f.write(f'best {best}\n')
        print(f'Best: ths={best[0]} mAP50={best[1]:.4f}')
        return best

    # ------------------------------------------------------------ submission
    def submission_write_out(self, dataset, out_dir=None):
        """ScanNet benchmark format: <scene>.txt lines
        'predicted_masks/<scene>_<j>.txt label conf' + 0/1 mask files
        (reference evaluation.py:617-650)."""
        if self._use_fused(dataset):
            results, _ = self.fused_dataset_results(dataset)
        else:
            entries = self.load_or_predict(dataset)
            results = self.pred_entries_to_results(entries)
        out_dir = out_dir or os.path.join(self.results_path, 'submission')
        mask_dir = os.path.join(out_dir, 'predicted_masks')
        os.makedirs(mask_dir, exist_ok=True)
        for name, r in results.items():
            lines = []
            for j in range(len(r['conf'])):
                mask_file = f'predicted_masks/{name}_{j:03d}.txt'
                lines.append(f'{mask_file} {int(r["label_id"][j])} '
                             f'{float(r["conf"][j]):.4f}')
                np.savetxt(os.path.join(out_dir, mask_file),
                           np.asarray(r['mask'][j]).astype(np.int32), fmt='%d')
            with open(os.path.join(out_dir, f'{name}.txt'), 'w') as f:
                f.write('\n'.join(lines) + '\n')
        print(f'Submission written to {out_dir}')
        return out_dir
