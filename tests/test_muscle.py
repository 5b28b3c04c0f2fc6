"""Element-level parity of the muscle FLV model against the C bindings
(mju_muscleGain / mju_muscleBias / mju_muscleDynamics), plus a full
muscle-actuated model oracle test."""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import muscle

from fixtures import assert_close, fixture


def _rand_prm(rng):
  # (range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax)
  return np.array([
      rng.uniform(0.4, 0.9), rng.uniform(1.1, 1.8),
      rng.choice([-1.0, rng.uniform(50, 500)]), rng.uniform(100, 400),
      rng.uniform(0.3, 0.7), rng.uniform(1.2, 2.0), rng.uniform(0.8, 1.6),
      rng.uniform(0.8, 2.0), rng.uniform(1.05, 1.6)])


def test_muscle_gain_bias_parity():
  rng = np.random.default_rng(0)
  for _ in range(200):
    prm = _rand_prm(rng)
    lengthrange = np.sort(rng.uniform(0.2, 1.5, 2))
    acc0 = rng.uniform(5, 50)
    length = rng.uniform(0.0, 2.0)
    vel = rng.uniform(-2.0, 2.0)
    ref_gain = mujoco.mju_muscleGain(length, vel, lengthrange, acc0, prm)
    ref_bias = mujoco.mju_muscleBias(length, lengthrange, acc0, prm)
    ours_gain = float(muscle.muscle_gain(length, vel, lengthrange, acc0,
                                         prm))
    ours_bias = float(muscle.muscle_bias(length, lengthrange, acc0, prm))
    np.testing.assert_allclose(ours_gain, ref_gain, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours_bias, ref_bias, rtol=1e-5, atol=1e-5)


def test_muscle_dynamics_parity():
  rng = np.random.default_rng(1)
  for _ in range(200):
    prm = np.zeros(3)
    prm[0] = rng.uniform(0.005, 0.05)   # tau_act
    prm[1] = rng.uniform(0.02, 0.1)     # tau_deact
    prm[2] = rng.choice([0.0, rng.uniform(0.01, 0.5)])  # smoothing
    ctrl = rng.uniform(-0.2, 1.2)
    act = rng.uniform(-0.2, 1.2)
    ref = mujoco.mju_muscleDynamics(ctrl, act, prm)
    ours = float(muscle.muscle_dynamics(ctrl, act, prm))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


MUSCLE_MODEL = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1"
             range="-60 60" limited="true"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <site name="end" pos="0.3 0 0"/>
    </body>
    <site name="anchor" pos="0 0 1.3"/>
  </worldbody>
  <tendon>
    <spatial name="t1">
      <site site="anchor"/>
      <site site="end"/>
    </spatial>
  </tendon>
  <actuator>
    <muscle tendon="t1" timeconst="0.01 0.04"/>
  </actuator>
</mujoco>
"""


def test_muscle_actuated_model():
  mjm, mjd, m, d = fixture(MUSCLE_MODEL, qpos_noise=0.3, qvel_noise=0.3)
  mjd.ctrl[:] = 0.7
  mjd.act[:] = 0.3
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(ctrl=d.ctrl.at[:].set(0.7), act=d.act.at[:].set(0.3))
  d = mjwt.forward(m, d)
  assert_close(d.actuator_force, mjd.actuator_force, 'muscle force',
               tol=1e-3)
  assert_close(d.act_dot, mjd.act_dot, 'muscle act_dot', tol=1e-3)
  assert_close(d.qacc, mjd.qacc, 'muscle qacc', tol=1e-3)
