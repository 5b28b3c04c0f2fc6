"""Oracle-differential tests for the smooth dynamics pipeline
(model: reference smooth_test.py strategy, SURVEY §4)."""

import mujoco
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import smooth

from fixtures import BALL_CHAIN, HOPPER, PENDULUM, assert_close, fixture

MODELS = {'pendulum': PENDULUM, 'ball_chain': BALL_CHAIN, 'hopper': HOPPER}


@pytest.fixture(params=list(MODELS))
def model_pair(request):
  return fixture(MODELS[request.param], qpos_noise=0.1, qvel_noise=0.1,
                 nstep=2)


def test_kinematics(model_pair):
  mjm, mjd, m, d = model_pair
  d = smooth.kinematics(m, d)
  assert_close(d.xpos, mjd.xpos, 'xpos')
  assert_close(d.xquat, mjd.xquat, 'xquat')
  assert_close(d.xipos, mjd.xipos, 'xipos')
  assert_close(d.xmat, mjd.xmat.reshape(-1, 3, 3), 'xmat')
  assert_close(d.xanchor, mjd.xanchor, 'xanchor')
  assert_close(d.xaxis, mjd.xaxis, 'xaxis')
  assert_close(d.geom_xpos, mjd.geom_xpos, 'geom_xpos')
  assert_close(d.geom_xmat, mjd.geom_xmat.reshape(-1, 3, 3), 'geom_xmat')
  if m.nsite:
    assert_close(d.site_xpos, mjd.site_xpos, 'site_xpos')


def test_com_pos(model_pair):
  mjm, mjd, m, d = model_pair
  d = smooth.com_pos(m, smooth.kinematics(m, d))
  assert_close(d.subtree_com, mjd.subtree_com, 'subtree_com')
  assert_close(d.cinert, mjd.cinert, 'cinert')
  assert_close(d.cdof, mjd.cdof, 'cdof')


def test_crb(model_pair):
  mjm, mjd, m, d = model_pair
  d = smooth.crb(m, smooth.com_pos(m, smooth.kinematics(m, d)))
  assert_close(d.crb, mjd.crb, 'crb')
  qm_oracle = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qm_oracle)
  assert_close(d.qM, qm_oracle, 'qM')


def test_factor_solve(model_pair):
  mjm, mjd, m, d = model_pair
  d = smooth.factor_m(
      m, smooth.crb(m, smooth.com_pos(m, smooth.kinematics(m, d))))
  rhs = np.random.RandomState(0).randn(mjm.nv)
  got = smooth.solve_m(m, d, rhs.astype(np.float32))
  want = rhs.copy()
  mujoco.mj_solveM(mjm, mjd, want.reshape(1, -1), rhs.reshape(1, -1))
  # f32 solve vs f64 oracle on poorly-conditioned free-body systems
  assert_close(got, want, 'solve_m', tol=1e-3)


def test_com_vel(model_pair):
  mjm, mjd, m, d = model_pair
  d = smooth.com_vel(m, smooth.com_pos(m, smooth.kinematics(m, d)))
  assert_close(d.cvel, mjd.cvel, 'cvel')
  assert_close(d.cdof_dot, mjd.cdof_dot, 'cdof_dot')


def test_rne(model_pair):
  mjm, mjd, m, d = model_pair
  d = smooth.kinematics(m, d)
  d = smooth.com_pos(m, d)
  d = smooth.com_vel(m, d)
  d = smooth.rne(m, d)
  assert_close(d.qfrc_bias, mjd.qfrc_bias, 'qfrc_bias')


def test_transmission():
  mjm, mjd, m, d = fixture(PENDULUM, qpos_noise=0.2)
  d = smooth.transmission(m, smooth.kinematics(m, d))
  assert_close(d.actuator_length, mjd.actuator_length, 'actuator_length')
  moment = np.zeros((mjm.nu, mjm.nv))
  mujoco.mju_sparse2dense(moment, mjd.actuator_moment, mjd.moment_rownnz,
                          mjd.moment_rowadr, mjd.moment_colind)
  assert_close(d.actuator_moment, moment, 'actuator_moment')
