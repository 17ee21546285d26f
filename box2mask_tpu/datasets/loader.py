"""Dataset classes + prefetching batch loader.

Surface-parity with the reference Dataset classes (models/dataloader.py:23-48
ScanNet.__init__ modes/overfit/dataset_size flags, :316-341 get_loader) — but the
loader is a thread-pool prefetcher feeding padded device batches instead of 16
fork-based worker processes: our per-scene work is vectorized NumPy (releases the
GIL), and batches overlap with device compute via a bounded queue.

Dataset names: scannet / arkitscenes / s3dis (real readers in datasets/{name}.py)
plus 'synthetic' (datasets/synthetic.py) for dataset-free runs, tests and bench.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from box2mask_tpu.datasets import synthetic, supervision
from box2mask_tpu.datasets.voxelize import voxelize_scene
from box2mask_tpu.datasets.batching import build_batch
from box2mask_tpu.datasets.tables import get_tables


def scene_rng(cfg, scene_name, epoch=0):
    """Per-scene RandomState stream: deterministic under --fixed_seed (varying
    with scene name + epoch so TTA eval and training epochs differ), fresh
    OS-entropy otherwise. Replaces the reference's per-worker process
    reseeding (models/dataloader.py:324-332) — with thread workers a global
    RNG would race, so every scene gets its own legacy-API stream."""
    if cfg.fixed_seed is None:
        return np.random.RandomState()
    h = np.uint32(cfg.fixed_seed)
    for c in f'{scene_name}|{epoch}':
        h = np.uint32(h * np.uint32(31) + np.uint32(ord(c)))
    return np.random.RandomState(int(h))


class SceneDataset:
    """Base: data_list + process_scene -> voxelized+supervised ret dict."""

    dataset_name = None

    def __init__(self, mode, cfg, do_augmentations=True):
        self.mode = mode
        self.cfg = cfg
        self.epoch = 0
        self.do_augmentations = do_augmentations
        self.data_list = self._build_data_list(mode, cfg)
        # debug/overfit harness (reference models/dataloader.py:41-48)
        if cfg.overfit_to_single_scene is not None:
            self.data_list = [self.data_list[cfg.overfit_to_single_scene]] * 100
        if cfg.overfit_to_single_scene_str is not None:
            self.data_list = [cfg.overfit_to_single_scene_str] * 100
        if cfg.dataset_size is not None:
            self.data_list = self.data_list[:cfg.dataset_size]
        _, self.sem_id2idx, _, _ = get_tables(self.table_name)

    @property
    def table_name(self):
        return self.dataset_name if self.dataset_name != 'synthetic' else 'scannet'

    def _build_data_list(self, mode, cfg):
        raise NotImplementedError

    def read_scene(self, scene_name, rng=np.random):
        """-> (scene, labels) dicts."""
        raise NotImplementedError

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, idx):
        scene_name = self.data_list[idx]
        rng = scene_rng(self.cfg, scene_name, self.epoch)
        scene, labels = self.read_scene(scene_name, rng=rng)
        ret = voxelize_scene(scene, self.cfg)
        if self.mode == 'test' or labels is None:
            return ret
        ret['labels'] = labels
        supervision.build_supervision(ret, labels, scene, self.cfg,
                                      self.dataset_name
                                      if self.dataset_name != 'synthetic'
                                      else 'scannet', self.mode)
        return ret

    def get_loader(self, shuffle=True, drop_last=True, batch_size=None,
                   num_shards=1, seed=None):
        return BatchLoader(self, self.cfg,
                           batch_size or self.cfg.batch_size, shuffle=shuffle,
                           drop_last=drop_last, num_shards=num_shards, seed=seed)


class Synthetic(SceneDataset):
    dataset_name = 'synthetic'
    SPLIT_SIZES = {'train': 64, 'val': 16, 'test': 8, 'train+val': 80}

    def _build_data_list(self, mode, cfg):
        if mode == 'predict_specific_scene':
            return [cfg.predict_specific_scene]
        n = self.SPLIT_SIZES.get(mode, 16)
        base = {'train': 0, 'val': 10000, 'test': 20000}.get(
            mode.split('+')[0], 0)
        return [f'synth{base + i:05d}_00' for i in range(n)]

    def read_scene(self, scene_name, rng=np.random):
        seed = int(scene_name[5:10])
        cfg = self.cfg
        scene, labels = synthetic.make_scene(
            seed=seed, name=scene_name,
            num_instances=cfg.synthetic_instances,
            points_per_instance=cfg.synthetic_points_per_instance,
            floor_points=cfg.synthetic_floor_points,
            wall_points=cfg.synthetic_wall_points)
        if self.do_augmentations and self.cfg.augmentation:
            from box2mask_tpu.datasets.augmentation import augment_scene
            scene = augment_scene(scene, self.cfg, rng=rng)
            # geometric augs move the GT boxes too: rederive from points
            labels = synthetic.derive_labels(
                scene['positions'], labels['semantics'], labels['instances'],
                scene['segments'])
        return scene, labels


class ScanNet(SceneDataset):
    dataset_name = 'scannet'

    def _build_data_list(self, mode, cfg):
        if mode == 'predict_specific_scene':
            return [cfg.predict_specific_scene]
        if mode == 'train+val':
            d = np.load(cfg.data_split, allow_pickle=True)
            return np.concatenate((d['train'], d['val']))
        return np.load(cfg.data_split, allow_pickle=True)[mode]

    def read_scene(self, scene_name, rng=np.random):
        from box2mask_tpu.datasets import scannet
        return scannet.process_scene(scene_name, self.mode, self.cfg,
                                     do_augmentations=self.do_augmentations,
                                     rng=rng)


class ARKitScenes(SceneDataset):
    dataset_name = 'arkitscenes'

    def _build_data_list(self, mode, cfg):
        if mode == 'predict_specific_scene':
            return [cfg.predict_specific_scene]
        sub = {'train': '3dod/Training', 'val': '3dod/Validation'}[mode]
        files = [f for f in os.listdir(os.path.join(cfg.data_dir, sub))
                 if f.startswith('4')]
        return np.array(files)

    def read_scene(self, scene_name, rng=np.random):
        from box2mask_tpu.datasets import arkitscenes
        return arkitscenes.process_scene(
            scene_name, self.mode, self.cfg,
            do_augmentations=self.do_augmentations,
            subsample_rate=self.cfg.subsample_rate, rng=rng)


class S3DIS(SceneDataset):
    dataset_name = 's3dis'

    def _build_data_list(self, mode, cfg):
        if mode == 'predict_specific_scene':
            return [cfg.predict_specific_scene]
        from box2mask_tpu.datasets import s3dis
        return s3dis.get_scene_names(mode, cfg)

    def read_scene(self, scene_name, rng=np.random):
        from box2mask_tpu.datasets import s3dis
        return s3dis.process_scene(scene_name, self.mode, self.cfg,
                                   do_augmentations=self.do_augmentations,
                                   rng=rng)


DATASETS = {'scannet': ScanNet, 'arkitscenes': ARKitScenes, 's3dis': S3DIS,
            'synthetic': Synthetic}


def get_dataset(cfg, mode, do_augmentations=True):
    return DATASETS[cfg.dataset_name](mode, cfg, do_augmentations)


class BatchLoader:
    """Iterates (device_batch, host_meta) with background prefetch.

    num_shards > 1 yields a LIST of per-device batches per step (stacked later by
    collate_device_batches) — the DistributedSampler analog
    (models/dataloader.py:334-341): the scene list is sharded round-robin."""

    def __init__(self, dataset, cfg, batch_size, shuffle=True, drop_last=True,
                 num_shards=1, seed=None):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.seed = seed
        self.epoch = 0
        # per-scene RandomState streams (scene_rng) make augmentation
        # deterministic under --fixed_seed regardless of worker count/order,
        # so data prep parallelizes even for seeded TTA eval
        workers = max(1, min(cfg.num_workers, batch_size * num_shards))
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def set_epoch(self, epoch):
        self.epoch = epoch
        self.dataset.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // (self.batch_size * self.num_shards)
        if not self.drop_last and len(self.dataset) % (
                self.batch_size * self.num_shards):
            n += 1
        return max(n, 0)

    def _order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            seed = (self.seed if self.seed is not None
                    else (self.cfg.fixed_seed or 0)) + self.epoch
            np.random.default_rng(seed).shuffle(idx)
        return idx

    def _build(self, indices):
        rets = list(self._pool.map(self.dataset.__getitem__, indices))
        if getattr(self.cfg, 'spatial_shards', 0) > 1:
            # one scene split across the mesh (parallel/spatial.py); the
            # host dict carries the standard per-scene metadata plus the
            # static shard plan in 'spatial_meta'
            from box2mask_tpu.parallel.spatial import build_spatial_unet_batch
            from box2mask_tpu.datasets.batching import _key_conv_backend_ok
            assert len(rets) == 1, 'spatial sharding trains one scene/step'
            kc = getattr(self.cfg, 'key_conv', 'off')
            use_kc = ((kc == 'on' or (kc == 'eval'
                                      and self.dataset.mode != 'train'))
                      and _key_conv_backend_ok(self.cfg))
            dev, meta = build_spatial_unet_batch(
                rets[0], self.cfg.spatial_shards,
                gather_level=self.cfg.spatial_gather_level,
                sem_id2idx=self.dataset.sem_id2idx, key_conv=use_kc)
            host = {'scene': [rets[0]['scene']],
                    'labels': [rets[0].get('labels')],
                    'num_voxels': [len(rets[0]['vox_coords'])],
                    'vox2point': [rets[0]['vox2point']],
                    'seg2vox': [rets[0].get('seg2vox')],
                    'input_location': [rets[0]['input_location']],
                    'spatial_meta': meta}
            return dev, host
        if self.num_shards == 1:
            return build_batch(rets, self.cfg, self.dataset.sem_id2idx,
                               mode=self.dataset.mode)
        per_shard = len(indices) // self.num_shards
        chunks = [rets[i * per_shard:(i + 1) * per_shard]
                  for i in range(self.num_shards)]
        from box2mask_tpu.datasets.batching import _device_maps_ok
        if _device_maps_ok(rets, self.cfg):
            # fast layout: all shards built at common pads so they stack
            # directly (collate_device_batches) with identical sentinels
            from box2mask_tpu.sparse.device_maps import level_pads_for_scenes
            from box2mask_tpu.sparse.coords import round_up
            level_pads = level_pads_for_scenes(
                [r['vox_coords'] for r in rets], vox_bucket=self.cfg.vox_bucket)
            seg_pad = None
            if self.cfg.do_segment_pooling:
                seg_pad = max(
                    max(round_up(sum(len(r['input_location']) for r in ch),
                                 self.cfg.seg_bucket) for ch in chunks),
                    self.cfg.seg_bucket)
            return [build_batch(ch, self.cfg, self.dataset.sem_id2idx,
                                mode=self.dataset.mode, device_maps=True,
                                level_pads=level_pads, seg_pad=seg_pad)
                    for ch in chunks]
        return [build_batch(ch, self.cfg, self.dataset.sem_id2idx,
                            mode=self.dataset.mode, device_maps=False)
                for ch in chunks]

    def __iter__(self):
        order = self._order()
        group = self.batch_size * self.num_shards
        steps = []
        for i in range(0, len(order), group):
            chunk = order[i:i + group]
            if len(chunk) < group and self.drop_last:
                break
            steps.append(chunk)

        prefetch = max(1, self.cfg.prefetch_batches)
        q = queue.Queue(maxsize=prefetch)
        stop = object()

        def producer():
            try:
                for chunk in steps:
                    q.put(self._build(chunk))
            except BaseException as e:   # surface worker errors to the consumer
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
