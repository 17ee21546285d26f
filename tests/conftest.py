"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding paths are
exercised without TPU hardware.

Note: the axon TPU plugin force-sets JAX_PLATFORMS=axon at interpreter start, so the
env var alone is not enough — we must override through jax.config before the backend
initializes.

Set B2M_TPU_TESTS=1 to keep the real TPU backend instead: only the *_tpu test
modules run real-chip work (they self-skip off-TPU); run them as
`B2M_TPU_TESTS=1 pytest tests/test_key_conv_tpu.py` on a chip host to catch
Mosaic/layout regressions the CPU interpret-mode tests cannot."""

import os

if os.environ.get('B2M_TPU_TESTS') != '1':
    if ('--xla_force_host_platform_device_count'
            not in os.environ.get('XLA_FLAGS', '')):
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + ' --xla_force_host_platform_device_count=8')
    os.environ['JAX_PLATFORMS'] = 'cpu'

    import jax  # noqa: E402

    jax.config.update('jax_platforms', 'cpu')
else:
    import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
