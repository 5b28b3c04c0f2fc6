"""Elliptic friction-cone oracle tests (reference solver.py elliptic
paths; C values for efc_D/aref verified empirically)."""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import assert_close, fixture

SLIDE_SPHERE = """
<mujoco>
  <option timestep="0.002" cone="elliptic" impratio="{impratio}"/>
  <worldbody>
    <geom type="plane" size="3 3 1"/>
    <body pos="0 0 0.095"><freejoint/>
      <geom type="sphere" size="0.1" mass="1" friction="0.7 0.02 0.003"
            condim="{condim}"/>
    </body>
  </worldbody>
</mujoco>
"""

HOPPER_ELLIPTIC = """
<mujoco>
  <option timestep="0.002" cone="elliptic" impratio="2"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 1" friction="1 0.005 0.0001"/>
    <body pos="0 0 0.6">
      <freejoint/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0 0 0.25" mass="2.0"/>
      <body pos="0 0 0">
        <joint type="hinge" axis="0 1 0" range="-45 45" damping="0.5"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0 0 -0.3" mass="1.0"/>
        <body pos="0 0 -0.3">
          <joint type="hinge" axis="0 1 0" range="-60 10" damping="0.3"/>
          <geom type="sphere" size="0.06" mass="0.5"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize('impratio,condim', [(1, 3), (3, 3), (3, 6),
                                             (1, 4), (5, 6)])
def test_elliptic_sliding_sphere(impratio, condim):
  """Sphere sliding+spinning on a plane: qacc parity across zones."""
  xml = SLIDE_SPHERE.format(impratio=impratio, condim=condim)
  mjm, mjd, m, d = fixture(xml)
  mjd.qvel[:3] = [0.3, -0.2, 0.0]
  mjd.qvel[3:] = [0.1, 0.2, 0.3]
  mujoco.mj_forward(mjm, mjd)
  import jax.numpy as jnp
  d = d.replace(qvel=jnp.asarray(mjd.qvel, jnp.float32))
  d = mjwt.forward(m, d)
  scale = max(1.0, np.abs(mjd.qacc).max())
  err = np.abs(np.asarray(d.qacc) - mjd.qacc).max() / scale
  assert err < 2e-2, f'qacc rel err {err:.3e}\n{np.asarray(d.qacc)}\n{mjd.qacc}'


def test_elliptic_sticking():
  """At rest (sticking zone) the sphere should not accelerate."""
  xml = SLIDE_SPHERE.format(impratio=2, condim=3)
  mjm, mjd, m, d = fixture(xml, nstep=200)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'sticking qacc', tol=5e-2)


def test_elliptic_trajectory():
  """Contact-rich hopper trajectory stays close to the oracle."""
  mjm, mjd, m, d = fixture(HOPPER_ELLIPTIC)
  import jax
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  err = np.abs(q - mjd.qpos).max()
  assert err < 5e-3, f'trajectory err {err}\n{q}\n{mjd.qpos}'
