"""Oracle-differential tests for tendons: fixed, spatial, wrapping,
limits, springs, actuation (reference smooth.py:3173-3627 test strategy).
"""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import assert_close, fixture

FIXED = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.3"/>
        <body pos="0.25 0 0">
          <joint name="s1" type="slide" axis="0 0 1" damping="0.05"/>
          <geom type="sphere" size="0.04" mass="0.2"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1" stiffness="3.0" damping="0.4" springlength="0.05 0.1"
           limited="true" range="-0.4 0.4">
      <joint joint="j1" coef="1.0"/>
      <joint joint="j2" coef="-0.7"/>
      <joint joint="s1" coef="2.0"/>
    </fixed>
    <fixed name="t2" frictionloss="0.2">
      <joint joint="j1" coef="0.5"/>
      <joint joint="j2" coef="0.5"/>
    </fixed>
  </tendon>
  <actuator>
    <motor tendon="t1" gear="1.2"/>
  </actuator>
</mujoco>
"""

SPATIAL = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <site name="anchor" pos="0 0 1.2"/>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <site name="mid" pos="0.15 0 0.03"/>
      <body pos="0.3 0 0">
        <joint name="j2" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.3"/>
        <site name="end" pos="0.2 0 0.02"/>
      </body>
    </body>
  </worldbody>
  <tendon>
    <spatial name="sp1" stiffness="10" damping="0.5" springlength="0.2 0.3"
             limited="true" range="0 0.8">
      <site site="anchor"/>
      <site site="mid"/>
      <site site="end"/>
    </spatial>
  </tendon>
  <actuator>
    <motor tendon="sp1" gear="2.0"/>
  </actuator>
</mujoco>
"""

WRAP_SPHERE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <site name="a" pos="-0.3 0 0.5"/>
    <geom name="ball" type="sphere" size="0.12" pos="0 0 0.45"
          contype="0" conaffinity="0"/>
    <site name="side" pos="0 0 0.62"/>
    <body pos="0.3 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
      <site name="b" pos="0.05 0 0"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="w1" stiffness="5" springlength="0 0.1">
      <site site="a"/>
      <geom geom="ball" sidesite="side"/>
      <site site="b"/>
    </spatial>
  </tendon>
</mujoco>
"""

WRAP_CYLINDER = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <site name="a" pos="-0.3 0.05 0.5"/>
    <geom name="cyl" type="cylinder" size="0.1 0.3" pos="0 0 0.45"
          euler="90 0 0" contype="0" conaffinity="0"/>
    <site name="side" pos="0 0 0.62"/>
    <body pos="0.3 0 0.5">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
      <site name="b" pos="0.05 -0.05 0"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="w1" stiffness="5" springlength="0 0.1">
      <site site="a"/>
      <geom geom="cyl" sidesite="side"/>
      <site site="b"/>
    </spatial>
  </tendon>
</mujoco>
"""


@pytest.mark.parametrize('xml,name', [(FIXED, 'fixed'), (SPATIAL, 'spatial')])
def test_tendon_length_jacobian(xml, name):
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.3, qvel_noise=0.3)
  d = mjwt.fwd_position(m, d)
  assert_close(d.ten_length, mjd.ten_length, f'{name} ten_length')
  # MjData.ten_J is stored sparse in this binding; verify J via its
  # action on the (randomized) qvel: ten_velocity = J @ qvel
  ten_vel = np.asarray(d.ten_J) @ np.asarray(d.qvel)
  assert_close(ten_vel, mjd.ten_velocity, f'{name} ten_J (via J@qvel)')


@pytest.mark.parametrize('xml,name', [(FIXED, 'fixed'), (SPATIAL, 'spatial')])
def test_tendon_dynamics(xml, name):
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.3, qvel_noise=0.3,
                           ctrl_noise=0.8)
  d = mjwt.forward(m, d)
  assert_close(d.ten_velocity, mjd.ten_velocity, f'{name} ten_velocity')
  assert_close(d.qfrc_passive, mjd.qfrc_passive, f'{name} qfrc_passive')
  assert_close(d.actuator_length, mjd.actuator_length,
               f'{name} actuator_length')
  assert_close(d.qfrc_actuator, mjd.qfrc_actuator, f'{name} qfrc_actuator')
  assert_close(d.qacc, mjd.qacc, f'{name} qacc', tol=1e-3)


@pytest.mark.parametrize('xml,name', [(WRAP_SPHERE, 'sphere'),
                                      (WRAP_CYLINDER, 'cylinder')])
def test_tendon_wrap(xml, name):
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.2)
  d = mjwt.fwd_position(m, d)
  assert_close(d.ten_length, mjd.ten_length, f'{name} wrap length',
               tol=1e-4)
  # randomize qvel on the oracle to probe J
  np.random.seed(7)
  mjd.qvel[:] = np.random.randn(mjm.nv) * 0.3
  mujoco.mj_forward(mjm, mjd)
  ten_vel = np.asarray(d.ten_J) @ mjd.qvel
  assert_close(ten_vel, mjd.ten_velocity, f'{name} wrap J (via J@qvel)',
               tol=1e-3)


def test_tendon_limit_rows():
  """Drive the fixed tendon outside its range; limit row becomes active
  and matches the oracle's constraint force direction."""
  mjm, mjd, m, d = fixture(FIXED)
  # crank j1 so tendon length 1.0*q1 exceeds 0.4
  mjd.qpos[0] = 0.55
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(qpos=d.qpos.at[0].set(0.55))
  d = mjwt.forward(m, d)
  assert int(d.nl) >= 1
  assert_close(d.qacc, mjd.qacc, 'limit qacc', tol=1e-3)


TENDON_ARMATURE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="aj1" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.4"/>
      <site name="as1" pos="0.3 0 0"/>
      <body pos="0.3 0 0">
        <joint name="aj2" type="hinge" axis="1 0 0" damping="0.01"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0 0.25 0"
              mass="0.3"/>
        <site name="as2" pos="0 0.25 0"/>
      </body>
    </body>
    <site name="as0" pos="0 0 1.4"/>
  </worldbody>
  <tendon>
    <spatial name="at1" armature="0.05" damping="0.2">
      <site site="as0"/><site site="as1"/><site site="as2"/>
    </spatial>
    <fixed name="at2" armature="0.02">
      <joint joint="aj1" coef="0.7"/><joint joint="aj2" coef="-0.4"/>
    </fixed>
  </tendon>
</mujoco>
"""


def test_tendon_armature_mass_matrix():
  """qM with tendon armature vs C mj_tendonArmature (reference
  smooth.py:984)."""
  mjm, mjd, m, d = fixture(TENDON_ARMATURE, qpos_noise=0.3,
                           qvel_noise=0.5)
  d = mjwt.fwd_position(m, d)
  qm_ref = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qm_ref)
  assert_close(d.qM, qm_ref, 'qM with tendon armature', tol=1e-5)


def test_tendon_armature_bias_and_dynamics():
  """qfrc_bias includes the tendon-armature bias (Jdot coupling) and
  qacc matches C end-to-end."""
  mjm, mjd, m, d = fixture(TENDON_ARMATURE, qpos_noise=0.2,
                           qvel_noise=0.8, nstep=3)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  assert_close(d.qfrc_bias, mjd.qfrc_bias, 'qfrc_bias w/ ten armature',
               tol=1e-4)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'qacc w/ tendon armature', tol=5e-4)


def test_tendon_damping_implicitfast():
  """implicitfast qDeriv includes tendon damping (reference
  derivative.py tendon block)."""
  xml = TENDON_ARMATURE.replace(
      '<option timestep="0.002"/>',
      '<option timestep="0.002" integrator="implicitfast"/>')
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.2, qvel_noise=0.8, nstep=3)
  d = mjwt.step(m, d)
  mujoco.mj_step(mjm, mjd)
  assert_close(d.qvel, mjd.qvel, 'implicitfast qvel w/ tendon damping',
               tol=1e-4)
  assert_close(d.qpos, mjd.qpos, 'implicitfast qpos', tol=1e-5)


WRAP_INSIDE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="wj1" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.4"/>
      <site name="ws1" pos="0.3 0 0.1"/>
    </body>
    <body pos="0.35 0 0.75">
      <geom name="wgeom" type="sphere" size="0.06" contype="0"
            conaffinity="0"/>
      <site name="wside" pos="0.01 0 0.02"/>
    </body>
    <body pos="0.4 0 0.5">
      <joint name="wj2" type="slide" axis="0 0 1" damping="0.05"/>
      <geom type="sphere" size="0.03" mass="0.2"/>
      <site name="ws2" pos="0 0 0.05"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="wt" stiffness="10" springlength="0.2">
      <site site="ws1"/>
      <geom geom="wgeom" sidesite="wside"/>
      <site site="ws2"/>
    </spatial>
  </tendon>
</mujoco>
"""


def test_wrap_inside():
  """Side site inside the wrap geom triggers the inside-wrap solver
  (reference util_misc.py:202 wrap_inside; C mju_wrapInside)."""
  mjm, mjd, m, d = fixture(WRAP_INSIDE, qpos_noise=0.1, qvel_noise=0.2)
  # sanity: the sidesite is inside the sphere in this configuration
  sid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_SITE, 'wside')
  gid = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'wgeom')
  assert np.linalg.norm(
      mjd.site_xpos[sid] - mjd.geom_xpos[gid]) < mjm.geom_size[gid, 0]
  d = mjwt.fwd_position(m, d)
  assert_close(d.ten_length, mjd.ten_length, 'ten_length inside wrap',
               tol=1e-5)
  assert_close(d.ten_J, mjd.ten_J, 'ten_J inside wrap', tol=1e-4)


def test_wrap_inside_dynamics():
  mjm, mjd, m, d = fixture(WRAP_INSIDE, qpos_noise=0.15, qvel_noise=0.4,
                           nstep=5)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'qacc inside wrap', tol=5e-4)
