#!/usr/bin/env python
"""Run the B2M_SLOW_TESTS-gated heavyweight suite and record the result as a
committed per-round artifact (SLOW_r{N}.json): test ids, pass/fail, duration,
git SHA. The shell wrapper scripts/run_slow_suite.sh remains for ad-hoc runs;
this is what each round's record should come from (round-3 verdict #5 —
per-round slow-suite results must be auditable, not a DESIGN.md sentence).

Usage: python scripts/run_slow_suite.py [--out SLOW_r04.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (test id, extra env). The e2e quality-value test drives the real CLIs,
# which run fine on the chip — on the 1-core forced-CPU mesh it takes >2h
# (measured round 4), so it keeps the real backend via B2M_TPU_TESTS=1
# (it uses no virtual mesh); everything else needs the 8-device CPU mesh.
TESTS = [
    ('tests/test_spatial_unet.py::test_spatial_key_conv_forward_matches_single_device', {}),
    ('tests/test_spatial_unet.py::test_spatial_key_conv_grads_match_single_device', {}),
    ('tests/test_spatial_unet.py::test_spatial_grads_match_single_device', {}),
    ('tests/test_spatial_unet.py::test_huge_scene_trains_sharded', {}),
    ('tests/test_parallel.py::test_shard_map_train_step_runs_and_syncs', {}),
    ('tests/test_trainer_multidevice.py::test_trainer_multidevice_epoch', {}),
    ('tests/test_device_maps.py::test_train_step_key_conv_path', {}),
    ('tests/test_e2e_cli.py::test_e2e_quality_value',
     {'B2M_TPU_TESTS': '1'}),
    ('tests/test_model_forward.py::test_remat_matches_plain', {}),
    # full-scale converter dry run (round-4 verdict #8): ScanNet-scale shapes
    # compile fastest on the real chip; no virtual mesh involved
    ('tests/test_ckpt_convert.py::test_converter_full_scale_drives_fused_eval',
     {'B2M_TPU_TESTS': '1', 'B2M_FUSED_EVAL': '1'}),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=None)
    a = ap.parse_args(argv)
    results = []
    ok_all = True
    t_total = time.time()
    for tid, extra_env in TESTS:
        env = dict(os.environ, B2M_SLOW_TESTS='1', **extra_env)
        t0 = time.time()
        p = subprocess.run([sys.executable, '-m', 'pytest', '-q', tid],
                           cwd=REPO, env=env, capture_output=True, text=True)
        dt = time.time() - t0
        ok = p.returncode == 0
        ok_all &= ok
        results.append({'test': tid, 'pass': ok, 'seconds': round(dt, 1)})
        print(f'{"PASS" if ok else "FAIL"} {tid} ({dt:.0f}s)')
        if not ok:
            print(p.stdout[-3000:])
            print(p.stderr[-2000:])
    rec = {
        'suite': 'B2M_SLOW_TESTS',
        'pass': ok_all,
        'total_seconds': round(time.time() - t_total, 1),
        'git_sha': subprocess.run(['git', 'rev-parse', 'HEAD'], cwd=REPO,
                                  capture_output=True, text=True
                                  ).stdout.strip(),
        'recorded': time.strftime('%Y-%m-%d %H:%M:%S'),
        'host_cores': os.cpu_count(),
        'tests': results,
    }
    if a.out:
        out = a.out if os.path.isabs(a.out) else os.path.join(REPO, a.out)
        with open(out, 'w') as f:
            json.dump(rec, f, indent=1)
            f.write('\n')
    print(json.dumps(rec))
    return 0 if ok_all else 1


if __name__ == '__main__':
    sys.exit(main())
