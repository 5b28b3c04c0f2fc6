"""Long-horizon integration tests (reference unroll_test.py: coarse
task outcomes catch slow numerical drift that single-step diffs miss)
+ user callback hooks."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import models

from fixtures import HOPPER, fixture


import pytest

pytestmark = pytest.mark.slow  # interpret-mode/long-horizon: excluded from -m 'not slow'

def test_arm_reaches_and_pushes_cube():
  """Position-controlled arm sweeps; the cube must be displaced in both
  engines by a comparable amount (coarse task outcome)."""
  mjm = mujoco.MjModel.from_xml_path(models.ARM)
  mjd = mujoco.MjData(mjm)
  ctrl = np.array([0.9, 1.25, 0.0, -1.3, 0.0, 0.6, 0.0])
  mjd.ctrl[:] = ctrl
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m)
  d = d.replace(ctrl=jnp.asarray(ctrl, jnp.float32))
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(800):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  # cube freejoint qpos: last 7 entries; displacement from (0.45, 0, .03)
  ref_disp = np.linalg.norm(mjd.qpos[-7:-5] - [0.45, 0.0])
  our_disp = np.linalg.norm(q[-7:-5] - [0.45, 0.0])
  # arm joints track the oracle closely
  np.testing.assert_allclose(q[:7], mjd.qpos[:7], atol=0.05)
  if ref_disp > 0.02:  # oracle actually pushed it
    assert our_disp > 0.5 * ref_disp, (our_disp, ref_disp)


def test_hopper_long_horizon_stability():
  """1500 steps with ctrl noise: no NaN, stays above ground."""
  mjm, mjd, m, d = fixture(HOPPER)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(1500):
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  assert q[2] > 0.0


def test_control_callback():
  """User control_fn injected at the reference's callback point."""
  mjm, mjd, m, d = fixture(HOPPER)

  def pd_control(mm, dd):
    # drive the hip joint toward 0.3 rad
    err = 0.3 - dd.qpos[7]
    return dd.replace(qfrc_applied=dd.qfrc_applied.at[6].set(20.0 * err))

  step = jax.jit(lambda dd: mjwt.step(m, dd, control_fn=pd_control))
  for _ in range(400):
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  assert abs(q[7] - 0.3) < 0.2  # roughly tracked


def test_passive_callback():
  mjm, mjd, m, d = fixture(HOPPER, qvel_noise=0.5)

  def extra_damping(mm, dd):
    return dd.replace(
        qfrc_passive=dd.qfrc_passive - 5.0 * dd.qvel)

  step = jax.jit(lambda dd: mjwt.step(m, dd, passive_fn=extra_damping))
  d2 = step(d)
  d1 = jax.jit(lambda dd: mjwt.step(m, dd))(d)
  # extra damping must change the dynamics
  assert not np.allclose(np.asarray(d1.qacc), np.asarray(d2.qacc))
