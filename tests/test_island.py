"""Island discovery tests (reference island_test.py strategy)."""

import numpy as np

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import island as island_mod

from fixtures import fixture

THREE_BALLS = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 0.30"><freejoint/>
      <geom type="sphere" size="0.1" mass="1"/></body>
    <body pos="0.05 0 0.47"><freejoint/>
      <geom type="sphere" size="0.1" mass="1"/></body>
    <body pos="5 0 0.5"><freejoint/>
      <geom type="sphere" size="0.1" mass="1"/></body>
  </worldbody>
</mujoco>
"""


def test_islands_split_and_merge():
  mjm, mjd, m, d = fixture(THREE_BALLS)
  d = mjwt.fwd_position(m, d)
  labels = np.asarray(island_mod.island(m, d))
  # balls 0 and 1 overlap -> same island; ball 2 far away -> own island
  assert labels[0] == labels[1]
  assert labels[2] != labels[0]
