"""Fluid (inertia-box) passive force oracle tests
(reference passive_test.py strategy)."""

import numpy as np

import mujoco_warp_tpu as mjwt

from fixtures import assert_close, fixture

FLUID = """
<mujoco>
  <option timestep="0.002" density="1.2" viscosity="0.0002"
          wind="0.5 -0.3 0.1"/>
  <worldbody>
    <body pos="0 0 2">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.05" mass="0.8" contype="0"
            conaffinity="0"/>
      <body pos="0.2 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0"
              mass="0.2" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_fluid_forces():
  mjm, mjd, m, d = fixture(FLUID, qpos_noise=0.2, qvel_noise=0.5)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  assert np.abs(np.asarray(d.qfrc_fluid)).max() > 1e-6
  assert_close(d.qfrc_fluid, mjd.qfrc_fluid, 'qfrc_fluid', tol=1e-4)
  assert_close(d.qfrc_passive, mjd.qfrc_passive, 'qfrc_passive', tol=1e-4)


def test_fluid_dynamics():
  mjm, mjd, m, d = fixture(FLUID, qpos_noise=0.1, qvel_noise=0.8, nstep=5)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'qacc with fluid', tol=1e-3)


FLUID_ELLIPSOID = """
<mujoco>
  <option timestep="0.002" density="1.2" viscosity="0.0002"
          wind="0.4 -0.2 0.1"/>
  <worldbody>
    <body pos="0 0 2">
      <freejoint/>
      <geom type="ellipsoid" size="0.12 0.06 0.04" mass="0.5" contype="0"
            conaffinity="0" fluidshape="ellipsoid"
            fluidcoef="0.5 0.25 1.5 1.7 1.0"/>
      <body pos="0.2 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.01"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0"
              mass="0.2" contype="0" conaffinity="0"
              fluidshape="ellipsoid"/>
        <geom type="sphere" size="0.05" pos="0.25 0 0" mass="0.1"
              contype="0" conaffinity="0" fluidshape="ellipsoid"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_fluid_ellipsoid_forces():
  """Ellipsoid fluid model vs C mj_ellipsoidFluidModel (reference
  passive.py:276-455)."""
  mjm, mjd, m, d = fixture(FLUID_ELLIPSOID, qpos_noise=0.2,
                           qvel_noise=0.8)
  assert any(m.body_fluid_ellipsoid)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  assert np.abs(np.asarray(d.qfrc_fluid)).max() > 1e-6
  assert_close(d.qfrc_fluid, mjd.qfrc_fluid, 'qfrc_fluid', tol=1e-4)
  assert_close(d.qfrc_passive, mjd.qfrc_passive, 'qfrc_passive', tol=1e-4)


def test_fluid_ellipsoid_dynamics():
  mjm, mjd, m, d = fixture(FLUID_ELLIPSOID, qpos_noise=0.1,
                           qvel_noise=0.5, nstep=5)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'qacc ellipsoid fluid', tol=1e-3)
