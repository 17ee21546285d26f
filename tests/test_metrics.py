import numpy as np

from box2mask_tpu.metrics import scannet_ap, box3d, detection_ap, s3dis_metrics


def make_gt(n=1000, inst_specs=((3, 1, 300), (5, 2, 300))):
    """gt ids array with instances (sem, inst, npts) + background rest."""
    ids = np.zeros(n, np.int64)
    pos = 0
    for sem, inst, cnt in inst_specs:
        ids[pos:pos + cnt] = sem * 1000 + inst
        pos += cnt
    return ids


def perfect_pred(gt_ids):
    uniq = [u for u in np.unique(gt_ids) if u >= 1000]
    masks = np.stack([gt_ids == u for u in uniq])
    return {'conf': np.ones(len(uniq)) * 0.9,
            'label_id': np.array([u // 1000 for u in uniq]),
            'mask': masks}


def test_scannet_ap_perfect():
    gt = make_gt()
    res = {'scene0000_00': perfect_pred(gt)}
    avgs, ap, _ = scannet_ap.evaluate_scannet(res, {'scene0000_00': gt})
    assert np.isclose(avgs['all_ap_50%'], 1.0)
    assert np.isclose(avgs['all_ap'], 1.0)
    assert np.isclose(avgs['classes']['cabinet']['ap50%'], 1.0)


def test_scannet_ap_missing_instance():
    gt = make_gt(inst_specs=((3, 1, 300), (3, 2, 300)))
    pred = perfect_pred(gt)
    pred = {'conf': pred['conf'][:1], 'label_id': pred['label_id'][:1],
            'mask': pred['mask'][:1]}
    avgs, _, _ = scannet_ap.evaluate_scannet(
        {'s': pred}, {'s': gt})
    # one of two cabinet instances found -> AP ~0.5
    assert 0.4 < avgs['classes']['cabinet']['ap50%'] < 0.6


def test_scannet_ap_false_positive_penalized():
    gt = make_gt(inst_specs=((3, 1, 300),))
    pred = perfect_pred(gt)
    fp_mask = np.zeros(len(gt), bool)
    fp_mask[600:800] = True   # pure background (void is sem 0 -> ignored!)
    # put the FP on a *valid-class but wrong* region: use floor sem? floor not
    # in instance ids -> void. Instead overlap a second scene region labeled
    # with another valid class as gt group-free area:
    gt2 = gt.copy()
    gt2[600:800] = 0  # background: void -> FP would be ignored
    pred_fp = {'conf': np.array([0.9, 0.95]),
               'label_id': np.array([3, 3]),
               'mask': np.stack([pred['mask'][0], fp_mask])}
    avgs, _, _ = scannet_ap.evaluate_scannet({'s': pred_fp}, {'s': gt2})
    # FP lands on void -> ignored entirely, AP stays 1
    assert np.isclose(avgs['classes']['cabinet']['ap50%'], 1.0)
    # now make that region non-void gt of another class (bed instance)
    gt3 = gt.copy()
    gt3[600:800] = 4 * 1000 + 7
    avgs3, _, _ = scannet_ap.evaluate_scannet({'s': pred_fp}, {'s': gt3})
    assert avgs3['classes']['cabinet']['ap50%'] < 1.0


def test_min_region_size_filter():
    gt = make_gt(inst_specs=((3, 1, 50),))  # below 100 verts
    pred = perfect_pred(gt)
    avgs, ap, _ = scannet_ap.evaluate_scannet({'s': pred}, {'s': gt})
    # no valid gt and the sub-100 pred is skipped -> nan classes
    assert np.isnan(avgs['all_ap_50%'])


def test_box3d_iou_identity_and_rotation():
    c1 = box3d.get_3d_box((2, 1, 1), 0.0, (0, 0, 0))
    iou, iou2d = box3d.box3d_iou(c1, c1)
    assert np.isclose(iou, 1.0, atol=1e-5) and np.isclose(iou2d, 1.0, atol=1e-5)
    # half-shift along x
    c2 = box3d.get_3d_box((2, 1, 1), 0.0, (1, 0, 0))
    iou, _ = box3d.box3d_iou(c1, c2)
    assert np.isclose(iou, 1 / 3, atol=1e-3)
    # rotation by pi/2 of a square box is identity
    c3 = box3d.get_3d_box((2, 2, 1), np.pi / 2, (0, 0, 0))
    c4 = box3d.get_3d_box((2, 2, 1), 0.0, (0, 0, 0))
    iou, _ = box3d.box3d_iou(c3, c4)
    assert np.isclose(iou, 1.0, atol=1e-3)


def test_corners_from_rotation_matches_get_3d_box():
    ang = 0.7
    R = box3d.rotz(ang)
    # corners_from_rotation uses rot.T @ local (rot maps world->local)
    c1 = box3d.corners_from_rotation((1, 2, 3), (0.5, 0.4, 0.3), R.T)
    c2 = box3d.get_3d_box((1.0, 0.8, 0.6), ang, (1, 2, 3))
    iou, _ = box3d.box3d_iou(c1, c2)
    assert np.isclose(iou, 1.0, atol=1e-3)


def test_voc_detection_ap():
    box = box3d.get_3d_box((1, 1, 1), 0.0, (0, 0, 0))
    pred = {'img0': [('chair', box, 0.9)]}
    gt = {'img0': [('chair', box)]}
    rec, prec, ap = detection_ap.eval_det(pred, gt, ovthresh=0.5)
    assert np.isclose(ap['chair'], 1.0)
    # add one false positive at lower confidence: AP@final recall still 1 then drop
    far = box3d.get_3d_box((1, 1, 1), 0.0, (10, 0, 0))
    pred2 = {'img0': [('chair', box, 0.9), ('chair', far, 0.5)]}
    _, _, ap2 = detection_ap.eval_det(pred2, gt, ovthresh=0.5)
    assert np.isclose(ap2['chair'], 1.0)  # FP after all TPs doesn't reduce VOC AP
    # FP with HIGHER confidence does
    pred3 = {'img0': [('chair', box, 0.5), ('chair', far, 0.9)]}
    _, _, ap3 = detection_ap.eval_det(pred3, gt, ovthresh=0.5)
    assert ap3['chair'] < 1.0


def test_s3dis_eval_perfect_and_half():
    n = 400
    sem = np.zeros(n, np.int64)
    sem[:200] = 7
    ins = np.zeros(n, np.int64)
    ins[:200] = 1
    room = {'instances': ins, 'semantics': sem}
    out = s3dis_metrics.evaluate_s3dis([room], [room])
    assert np.isclose(out['mPrecision'], 1.0)
    assert np.isclose(out['mRecall'], 1.0)
    assert np.isclose(out['semantic_acc'], 1.0)
    assert np.isclose(out['MUCov'], 1.0)
    # break the prediction unevenly (60/140 split: the 60-pt piece has IoU .3)
    pred_ins = ins.copy()
    pred_ins[:60] = 2
    pred = {'instances': pred_ins, 'semantics': sem}
    out2 = s3dis_metrics.evaluate_s3dis([pred], [room])
    assert out2['mPrecision'] < 1.0
