#!/usr/bin/env python
"""Write ScanNet ground-truth eval files: per-point ``instance + 1000*semantic``
(the encoding the ScanNet AP evaluator consumes; reference utils/gt2eval.py:15).

Usage: python scripts/gt2eval.py --config configs/scannet.txt [--split val]
Writes <data_dir>/gt_instance_data_txt/<scene>.txt for every split scene.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from box2mask_tpu.config import get_config
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument('--split', type=str, default='val')
    ns, rest = p.parse_known_args(argv)
    cfg = get_config(rest)

    from box2mask_tpu.datasets import scannet
    names = np.load(cfg.data_split, allow_pickle=True)[ns.split]
    out_dir = os.path.join(cfg.data_dir, 'gt_instance_data_txt')
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        _, labels = scannet.process_scene(name, ns.split, cfg,
                                          do_augmentations=False)
        gt = labels['instances'] + 1000 * labels['semantics']
        np.savetxt(os.path.join(out_dir, f'{name}.txt'), gt, fmt='%d')
        print('wrote', name)


if __name__ == '__main__':
    main(sys.argv[1:])
