"""THE product TPU inference path, shared by evaluate.py and bench.py.

One pipeline per run: per batch it packs the numpy batch dict into a single
compact-wire buffer (engine/hostload.py), ships it in ONE H2D transfer,
dispatches ONE fused device program (coordinate handling + SelectionNet
forward + fully on-device vote->mask post-processing for every scene of the
batch, postprocess/device_post.py make_fused_infer), and reads the whole
batch's stacked compact output back in ONE jax.device_get. Dispatch and
upload are async; the only blocking operation is the readback, which runs in
a harvest thread at software-pipeline depth `depth` (default 2) so the fetch
plus host-side mask unpack hide behind two batches of device compute
(scripts/profile_pipeline.py breakdown, DESIGN.md round-3).

This module exists so the driver's bench measures EXACTLY what `evaluate.py`
ships (round-3 verdict #1): `bench.py` and `Evaluater.eval` both drive
`FusedInferencePipeline.run`. The reference's product path being replaced is
its eval loop (reference models/evaluation.py:63-122: per-batch torch forward
+ host pred2mask per scene); here forward and postproc are one device
program and the host only unpacks bitmaps.

Pack-time codec assertions (color grid, layout invariants) downgrade the
wire per batch-signature exactly like engine/hostload.BatchUploader:
compact+derive -> compact without u8 colors -> raw. Correctness never
depends on the fast wire.
"""

from __future__ import annotations

import collections
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from box2mask_tpu.postprocess.device_post import (
    make_fused_infer, stacked_masks_to_results)


def batch_signature(dev):
    return tuple(sorted((k, np.asarray(v).shape, str(np.asarray(v).dtype))
                        for k, v in dev.items()))


class FusedInferencePipeline:
    """Streaming fused inference over an iterator of (dev_np, host) batches.

    Compiled programs and wire packers are cached per batch signature
    (shapes vary across bucket sizes); `run` is a generator yielding
    per-batch `(results, out_np, dev_np, host)` IN ORDER, where `results`
    is the detection_to_masks-compatible dict {scene_name: {conf, label_id,
    mask}} (point-level masks in eval mode).
    """

    def __init__(self, cfg, valid_class_ids, is_foreground, model=None,
                 top_k=128, max_masks=256, depth=2, wire='compact',
                 mode='eval'):
        from box2mask_tpu.engine import state as S
        self.cfg = cfg
        self.valid_class_ids = valid_class_ids
        self.is_foreground = is_foreground
        self.model = model or S.build_model(cfg, len(valid_class_ids),
                                            remat=False)
        self.top_k = top_k
        self.max_masks = max_masks
        self.depth = depth
        self.mode = mode
        # (signature) -> [infer, u8_colors, wire]
        self._cache = {}
        self._wire0 = wire
        self._harvester = ThreadPoolExecutor(max_workers=3)
        # timing accounting for bench/verdicts: host-side pack seconds and
        # wire bytes actually shipped (per run() call; reset in run)
        self.pack_s = 0.0
        self.wire_bytes = 0
        self.n_scenes = 0

    # ------------------------------------------------------------- internals
    def _build(self, dev_np, u8_colors, wire):
        infer = make_fused_infer(
            self.cfg, self.model, self.valid_class_ids, self.is_foreground,
            max_masks=self.max_masks, top_k=self.top_k,
            packed_example=dev_np, wire=wire, u8_colors=u8_colors)
        return infer

    def _get_infer(self, dev_np):
        sig = batch_signature(dev_np)
        entry = self._cache.get(sig)
        if entry is None:
            entry = self._cache[sig] = [
                self._build(dev_np, True, self._wire0), True, self._wire0]
        return sig, entry

    def _pack(self, dev_np):
        """Pack with per-signature wire downgrade on codec assertion."""
        sig, entry = self._get_infer(dev_np)
        while True:
            infer, u8_colors, wire = entry
            try:
                t0 = time.perf_counter()
                buf = infer.pack(dev_np)
                self.pack_s += time.perf_counter() - t0
                return infer, buf
            except AssertionError:
                if u8_colors:          # augmented colors left the u8 grid
                    entry = self._cache[sig] = [
                        self._build(dev_np, False, wire), False, wire]
                elif wire != 'raw':    # layout invariant failed: ship raw
                    entry = self._cache[sig] = [
                        self._build(dev_np, False, 'raw'), False, 'raw']
                else:
                    raise

    def _harvest(self, infer, pred, out, buf_dev, dev_np, host, ths):
        out_np = jax.device_get(out)    # ONE transfer for the whole batch
        results = stacked_masks_to_results(
            out_np, dev_np, host, self.valid_class_ids, mode=self.mode,
            post_fallback=self._fallback(infer), pred=pred,
            dev_j=_LazyUnpack(infer, buf_dev), ths=ths)
        return results, out_np

    def _fallback(self, infer):
        return infer.post_full

    # ------------------------------------------------------------------ run
    def run(self, params, batch_stats, batches, ths):
        """Generator: yields (results, out_np, dev_np, host) per batch.

        `batches` is an iterable of (dev_np, host). Packing runs on the host
        between async dispatches (it overlaps device compute exactly as the
        loader's prefetch threads would in production); the upload is ONE
        device_put per batch and the only blocking op is the depth-deep
        harvest."""
        self.pack_s = 0.0
        self.wire_bytes = 0
        self.n_scenes = 0
        ths_j = jnp.asarray(ths, jnp.float32)
        pending = collections.deque()
        for dev_np, host in batches:
            infer, buf = self._pack(dev_np)
            self.wire_bytes += buf.nbytes
            self.n_scenes += len(host['scene'])
            buf_dev = jax.device_put(buf)            # one H2D, async
            pred, out = infer(params, batch_stats, buf_dev, ths_j)  # async
            fut = self._harvester.submit(self._harvest, infer, pred, out,
                                         buf_dev, dev_np, host, ths_j)
            pending.append((fut, dev_np, host))
            while len(pending) > self.depth:
                f, d, h = pending.popleft()
                results, out_np = f.result()
                yield results, out_np, d, h
        while pending:
            f, d, h = pending.popleft()
            results, out_np = f.result()
            yield results, out_np, d, h


class _LazyUnpack(collections.abc.Mapping):
    """Batch-dict view over the packed device buffer for the rare top_k
    overflow fallback: the full batch is re-materialized on device (one
    dispatch) ONLY if stacked_masks_to_results actually indexes it."""

    def __init__(self, infer, buf_dev):
        self._infer = infer
        self._buf = buf_dev
        self._full = None

    def _materialize(self):
        if self._full is None:
            self._full = self._infer.unpack_full(self._buf)
        return self._full

    def __getitem__(self, k):
        return self._materialize()[k]

    def __iter__(self):
        return iter(self._materialize())

    def __len__(self):
        return len(self._materialize())
