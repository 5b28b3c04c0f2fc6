"""Test harness: run the suite on CPU with 8 virtual devices so sharding
tests work without a TPU pod (analogue of the reference's CPU-backend CI,
mujoco_warp/conftest.py:21-52 + ci.yml).

Note: the ambient environment may pre-import jax pinned to a TPU tunnel
(sitecustomize); backends initialize lazily, so reconfiguring here —
before any array is created — still takes effect.
"""

import os

import jax

_platform = os.environ.get('MJWT_TEST_PLATFORM', 'cpu')
jax.config.update('jax_platforms', _platform)
if _platform == 'cpu':
  jax.config.update('jax_num_cpu_devices', 8)
