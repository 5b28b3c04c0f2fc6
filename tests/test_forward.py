"""Oracle-differential tests for forward dynamics and stepping
(reference forward_test.py strategy)."""

import jax
import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt

from fixtures import BALL_CHAIN, HOPPER, PENDULUM, SPHERES, assert_close, fixture


def test_fwd_velocity_passive():
  mjm, mjd, m, d = fixture(PENDULUM, qpos_noise=0.2, qvel_noise=0.3,
                           ctrl_noise=0.5)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  assert_close(d.qfrc_passive, mjd.qfrc_passive, 'qfrc_passive')
  assert_close(d.qfrc_bias, mjd.qfrc_bias, 'qfrc_bias')
  assert_close(d.actuator_velocity, mjd.actuator_velocity,
               'actuator_velocity')


def test_fwd_actuation():
  mjm, mjd, m, d = fixture(PENDULUM, qpos_noise=0.2, qvel_noise=0.3,
                           ctrl_noise=0.5)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  d = mjwt.fwd_actuation(m, d)
  assert_close(d.actuator_force, mjd.actuator_force, 'actuator_force')
  assert_close(d.qfrc_actuator, mjd.qfrc_actuator, 'qfrc_actuator')


def test_qacc_smooth():
  mjm, mjd, m, d = fixture(BALL_CHAIN, qpos_noise=0.2, qvel_noise=0.3)
  d = mjwt.forward(m, d)
  assert_close(d.qfrc_smooth, mjd.qfrc_smooth, 'qfrc_smooth')
  assert_close(d.qacc_smooth, mjd.qacc_smooth, 'qacc_smooth', tol=1e-3)


def test_forward_no_contact():
  """Full forward qacc parity on a constraint-free model."""
  mjm, mjd, m, d = fixture(BALL_CHAIN, qpos_noise=0.2, qvel_noise=0.3)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'qacc', tol=1e-3)


@pytest.mark.parametrize('xml', [PENDULUM, BALL_CHAIN],
                         ids=['pendulum', 'ball_chain'])
def test_step_trajectory_no_contact(xml):
  """Multi-step trajectory parity without contacts."""
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.1, qvel_noise=0.1)
  step = jax.jit(mjwt.step, static_argnums=())
  for i in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  assert_close(d.qpos, mjd.qpos, 'qpos after 50 steps', tol=5e-4)
  assert_close(d.qvel, mjd.qvel, 'qvel after 50 steps', tol=5e-3)


def test_collision_spheres():
  mjm, mjd, m, d = fixture(SPHERES)
  d = mjwt.fwd_position(m, d)
  assert int(d.ncon) == mjd.ncon, f'ncon {int(d.ncon)} vs {mjd.ncon}'
  # match contacts by geom pair
  got = {(int(g1), int(g2)): k for k, (g1, g2) in
         enumerate(np.asarray(d.contact.geom)[:int(d.ncon)])}
  for c in range(mjd.ncon):
    key = (int(mjd.contact.geom[c][0]), int(mjd.contact.geom[c][1]))
    key2 = (key[1], key[0])
    k = got.get(key, got.get(key2))
    assert k is not None, f'missing contact {key}'
    assert_close(d.contact.dist[k], mjd.contact.dist[c], f'dist {key}',
                 tol=1e-4)
    assert_close(d.contact.pos[k], mjd.contact.pos[c], f'pos {key}',
                 tol=1e-4)


def test_efc_rows_contacts():
  """Contact efc row parity (J, D, aref) vs oracle on sphere stack."""
  mjm, mjd, m, d = fixture(SPHERES, qvel_noise=0.2)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  got_rows = {}
  J = np.asarray(d.efc_J)
  active = np.asarray(d.efc_active)
  for k in range(int(d.ncon)):
    g = tuple(int(x) for x in np.asarray(d.contact.geom)[k])
    got_rows[g] = k
  efc_J_oracle = np.zeros((mjd.nefc, mjm.nv))
  mujoco.mju_sparse2dense(efc_J_oracle, mjd.efc_J, mjd.efc_J_rownnz,
                          mjd.efc_J_rowadr, mjd.efc_J_colind)
  ne, nf, nl, stride, njmax = mjwt.io.efc_layout(
      m, d.contact.dist.shape[0])
  base = ne + nf + nl
  for c in range(mjd.ncon):
    key = (int(mjd.contact.geom[c][0]), int(mjd.contact.geom[c][1]))
    k = got_rows.get(key, got_rows.get((key[1], key[0])))
    assert k is not None
    oadr = mjd.contact.efc_address[c]
    dim = mjd.contact.dim[c]
    nrows = max(2 * (dim - 1), 1)
    for r in range(nrows):
      row = base + k * stride + r
      assert active[row], f'row {row} inactive'
      np.testing.assert_allclose(J[row], efc_J_oracle[oadr + r],
                                 rtol=1e-4, atol=1e-4,
                                 err_msg=f'J contact {key} row {r}')
      np.testing.assert_allclose(d.efc_D[row], mjd.efc_D[oadr + r],
                                 rtol=2e-4, atol=1e-4, err_msg='D')
      np.testing.assert_allclose(d.efc_aref[row], mjd.efc_aref[oadr + r],
                                 rtol=2e-4, atol=1e-4, err_msg='aref')


@pytest.mark.parametrize('xml', [SPHERES, HOPPER], ids=['spheres', 'hopper'])
def test_forward_with_contacts(xml):
  """qacc parity with the full solver in the loop."""
  mjm, mjd, m, d = fixture(xml, qvel_noise=0.2, nstep=10)
  d = mjwt.forward(m, d)
  assert_close(d.qacc, mjd.qacc, 'qacc', tol=2e-3)


@pytest.mark.parametrize('xml', [SPHERES, HOPPER], ids=['spheres', 'hopper'])
def test_step_trajectory_contacts(xml):
  mjm, mjd, m, d = fixture(xml, nstep=5)
  step = jax.jit(mjwt.step)
  for i in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(m, d)
  assert_close(d.qpos, mjd.qpos, 'qpos after 100 steps', tol=5e-3)
