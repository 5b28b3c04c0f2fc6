"""Inverse dynamics + RL state-surface tests (reference
inverse_test.py / support_test.py strategy)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu.types import State

from fixtures import BALL_CHAIN, HOPPER, PENDULUM, assert_close, fixture


def test_inverse_matches_oracle():
  mjm, mjd, m, d = fixture(PENDULUM, qpos_noise=0.2, qvel_noise=0.3)
  mjd.qacc[:] = np.random.randn(mjm.nv) * 0.5
  mujoco.mj_inverse(mjm, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc, jnp.float32))
  d = mjwt.inverse(m, d)
  assert_close(d.qfrc_inverse, mjd.qfrc_inverse, 'qfrc_inverse', tol=1e-3)


def test_inverse_contacts():
  mjm, mjd, m, d = fixture(HOPPER, nstep=100)
  mjd.qacc[:] = np.random.randn(mjm.nv) * 0.1
  mujoco.mj_inverse(mjm, mjd)
  d = d.replace(qacc=jnp.asarray(mjd.qacc, jnp.float32))
  d = mjwt.inverse(m, d)
  assert_close(d.qfrc_inverse, mjd.qfrc_inverse, 'qfrc_inverse w/ contacts',
               tol=5e-3)


def test_fwdinv_consistency():
  """inverse(forward(d)) must recover actuation + applied forces."""
  mjm, mjd, m, d = fixture(PENDULUM, qpos_noise=0.2, qvel_noise=0.2,
                           ctrl_noise=0.5)
  d = mjwt.forward(m, d)
  d_inv = mjwt.inverse(m, d)
  expected = np.asarray(d.qfrc_actuator + d.qfrc_applied)
  assert_close(d_inv.qfrc_inverse, expected, 'fwd-inv identity', tol=1e-3)


def test_state_roundtrip():
  mjm, mjd, m, d = fixture(BALL_CHAIN, qpos_noise=0.2, qvel_noise=0.3)
  s = mjwt.get_state(m, d, State.INTEGRATION)
  assert s.shape[-1] == mjwt.state_size(m, State.INTEGRATION)
  d2 = mjwt.make_data(m)
  d2 = mjwt.set_state(m, d2, s, State.INTEGRATION)
  np.testing.assert_allclose(d2.qpos, d.qpos)
  np.testing.assert_allclose(d2.qvel, d.qvel)
  np.testing.assert_allclose(d2.time, d.time)


def test_state_size_matches_c():
  mjm, mjd, m, d = fixture(HOPPER)
  for spec in (State.PHYSICS, State.FULLPHYSICS, State.INTEGRATION):
    ref = mujoco.mj_stateSize(mjm, int(spec))
    assert mjwt.state_size(m, spec) == ref, spec


def test_state_batched():
  mjm, mjd, m, d = fixture(BALL_CHAIN)
  from mujoco_warp_tpu import parallel
  batch = parallel.make_batch(m, d, 4, qpos_noise=0.1)
  s = mjwt.get_state(m, batch, State.PHYSICS)
  assert s.shape == (4, mjwt.state_size(m, State.PHYSICS))
  batch2 = mjwt.set_state(m, batch, s, State.PHYSICS)
  np.testing.assert_allclose(batch2.qpos, batch.qpos)


def test_reset_data():
  mjm, mjd, m, d = fixture(HOPPER, qpos_noise=0.3)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(10):
    d = step(d)
  d = mjwt.reset_data(m, d)
  np.testing.assert_allclose(d.qpos, m.qpos0)
  assert float(d.time) == 0.0


def test_jac_dot_finite_difference():
  """J_dot @ qvel == d/dt (J @ qvel contribution): check via FD of the
  point jacobian along the current motion."""
  from mujoco_warp_tpu import support, smooth
  mjm, mjd, m, d = fixture(BALL_CHAIN, qpos_noise=0.2, qvel_noise=0.5)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  body = m.nbody - 1
  point_local = np.array([0.03, 0.01, 0.02], np.float32)

  def jac_at(dd):
    pt = dd.xpos[body] + dd.xmat[body] @ jnp.asarray(point_local)
    jp, jr = support.jac(m, dd, pt, body)
    return jp, jr, pt

  jp0, jr0, pt0 = jac_at(d)
  jpd, jrd = support.jac_dot(m, d, pt0, body)

  # FD: integrate qpos by qvel*h, recompute jacobian
  h = 1e-4
  from mujoco_warp_tpu.forward import _integrate_pos
  qpos1 = _integrate_pos(m, d.qpos, d.qvel, h)
  d1 = d.replace(qpos=qpos1)
  d1 = mjwt.fwd_position(m, d1)
  d1 = mjwt.fwd_velocity(m, d1)
  jp1, jr1, _ = jac_at(d1)
  fd_jp = (np.asarray(jp1) - np.asarray(jp0)) / h
  fd_jr = (np.asarray(jr1) - np.asarray(jr0)) / h
  # compare the action on qvel (the physically meaningful product)
  qv = np.asarray(d.qvel)
  np.testing.assert_allclose(np.asarray(jpd) @ qv, fd_jp @ qv,
                             rtol=2e-2, atol=2e-2)
  np.testing.assert_allclose(np.asarray(jrd) @ qv, fd_jr @ qv,
                             rtol=2e-2, atol=2e-2)
