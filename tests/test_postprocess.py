import numpy as np
import jax.numpy as jnp

from box2mask_tpu.postprocess import iou as I
from box2mask_tpu.postprocess import nms


def random_boxes(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, spread, (n, 3))
    h = rng.uniform(0.2, 1.0, (n, 3))
    s = rng.uniform(0, 1, (n, 1))
    return np.concatenate([s, c - h, c + h], axis=1)


def test_set_ious_identity_and_disjoint():
    b = np.array([[0, 0, 0, 1, 1, 1], [2, 2, 2, 3, 3, 3.]])
    np.testing.assert_allclose(I.set_ious_np(b, b), [1, 1], atol=1e-5)
    a = np.array([[0, 0, 0, 1, 1, 1.]])
    c = np.array([[5, 5, 5, 6, 6, 6.]])
    assert I.set_ious_np(a, c)[0] == 0
    # half overlap: [0,1]x... vs [0.5, 1.5] on x only
    a = np.array([[0, 0, 0, 1, 1, 1.]])
    c = np.array([[0.5, 0, 0, 1.5, 1, 1.]])
    np.testing.assert_allclose(I.set_ious_np(a, c), [0.5 / 1.5], atol=1e-4)


def test_nms_clustering_greedy_semantics():
    # three boxes: A(score .9), B overlaps A heavily (score .8), C far (score .7)
    boxes = np.array([
        [0.9, 0, 0, 0, 1, 1, 1],
        [0.8, 0.1, 0, 0, 1.1, 1, 1],
        [0.7, 5, 5, 5, 6, 6, 6],
    ])
    reps, clusters, hm = nms.nms_clustering_np(boxes, cluster_th=0.3)
    assert list(reps) == [0, 2]
    # cluster contains the representative itself plus suppressed boxes
    assert sorted(clusters[0]) == [0, 1]
    assert hm.shape == (2, 3)
    assert hm[0, 0] == 1.0 and hm[1, 2] == 1.0
    assert hm[0, 1] > 0.3 and hm[0, 2] == 0.0


def test_nms_clustering_jax_matches_np():
    for seed in range(4):
        boxes = random_boxes(60, seed=seed)
        reps_np, _, hm_np = nms.nms_clustering_np(boxes, cluster_th=0.4)
        N = len(boxes)
        pad = np.concatenate([boxes, np.zeros((14, 7))], axis=0)
        valid = np.arange(N + 14) < N
        reps_j, hm_j, repv = nms.nms_clustering_jax(
            jnp.asarray(pad), jnp.asarray(valid), cluster_th=0.4, max_clusters=64)
        R = int(np.asarray(repv).sum())
        assert R == len(reps_np)
        np.testing.assert_array_equal(np.asarray(reps_j)[:R], reps_np)
        np.testing.assert_allclose(np.asarray(hm_j)[:R, :N], hm_np, atol=1e-5)


def test_mask_nms_np_and_jax_match():
    rng = np.random.default_rng(0)
    masks = rng.uniform(size=(20, 200)) < 0.3
    masks[3] = masks[0]          # duplicate of a higher-ranked mask
    kept_np, _ = nms.mask_nms_np(masks, 0.5, allow_empty=True)
    keep_j = nms.mask_nms_jax(jnp.asarray(masks), jnp.ones(20, bool), 0.5)
    got = np.nonzero(np.asarray(keep_j))[0]
    np.testing.assert_array_equal(np.sort(kept_np), got)
    assert 3 not in kept_np


def test_mask_nms_empty_and_singleton():
    masks = np.zeros((1, 10), bool)
    masks[0, :3] = True
    kept, _ = nms.mask_nms_np(masks, 0.5)
    assert list(kept) == [0]
