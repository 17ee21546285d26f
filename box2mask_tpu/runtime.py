"""Process-level JAX runtime bootstrap shared by every CLI.

Two concerns, both of which must run BEFORE the first jax device/backend
touch:

* platform override — the axon TPU plugin force-sets ``JAX_PLATFORMS`` at
  interpreter start, so a plain env var cannot select the CPU backend;
  ``BOX2MASK_PLATFORM=cpu`` goes through ``jax.config`` instead,
* persistent compilation cache — TPU first-compiles go through a remote
  compile service and cost minutes per shape; the on-disk cache makes every
  later process (trainer restarts, eval after train, the test-suite's CLI
  subprocesses) reuse them. Reference has no analog (torch eager); this is
  the XLA-native replacement for "warm starts".
"""

import os


def setup(platform_env='BOX2MASK_PLATFORM',
          cache_env='BOX2MASK_COMPILE_CACHE'):
    import jax
    plat = os.environ.get(platform_env)
    if plat:
        jax.config.update('jax_platforms', plat)
    cache_dir = os.environ.get(
        cache_env, os.path.join(os.path.expanduser('~'), '.cache',
                                'jax_b2m_compile'))
    if cache_dir and cache_dir != 'off':
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
