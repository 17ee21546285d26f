#!/bin/sh
# The B2M_SLOW_TESTS-gated tests: heavyweight multi-device integration runs
# (full U-Net fwd+bwd under shard_map, Trainer end-to-end with
# --spatial_shards, raw shard_map DP step, interpret-mode key_conv train
# step). Each takes minutes on the 1-core virtual-mesh host, so the default
# `pytest tests/` keeps them skipped to stay under the 10-minute suite
# budget; run THIS per round (results recorded in DESIGN.md). On a real TPU
# host add B2M_TPU_TESTS=1 tests/test_key_conv_tpu.py separately.
set -e
cd "$(dirname "$0")/.."
B2M_SLOW_TESTS=1 exec python -m pytest -q \
    tests/test_spatial_unet.py::test_spatial_grads_match_single_device \
    tests/test_spatial_unet.py::test_huge_scene_trains_sharded \
    tests/test_parallel.py::test_shard_map_train_step_runs_and_syncs \
    tests/test_trainer_multidevice.py::test_trainer_multidevice_epoch \
    tests/test_device_maps.py::test_train_step_key_conv_path \
    "$@"
