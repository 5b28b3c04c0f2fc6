"""Sparse (packed tree-CSR) mass matrix: unit + oracle tests.

The sparse path is the flex/cloth-scale replacement for dense (nv, nv)
qM storage (reference CSR qM + level-scheduled LDL,
mujoco_warp/_src/smooth.py:1017-1104, io.py:575-635). Tests force the
mode on small models via MJWT_SPARSE_NV so the whole pipeline runs in
CI, and check unit-level algebra on random tree-sparse SPD systems.
"""

import os

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib

import mujoco_warp_tpu as mjwt
forward_mod = importlib.import_module('mujoco_warp_tpu.forward')
from mujoco_warp_tpu import parallel
from mujoco_warp_tpu import sparse
from mujoco_warp_tpu import support

from fixtures import assert_close


def _random_tree(nv, seed=0):
  rng = np.random.RandomState(seed)
  parent = np.full(nv, -1, np.int64)
  for i in range(1, nv):
    # mix of roots and chains to get multiple levels
    parent[i] = rng.randint(-1, i)
  return tuple(int(p) for p in parent)


def _random_spd_packed(meta, w, seed=0):
  rng = np.random.RandomState(seed)
  vals = rng.randn(w, meta.nM).astype(np.float32) * 0.3
  # diagonal dominance → SPD for any tree pattern
  vals[:, meta.diag_madr] = 3.0 + rng.rand(w, meta.nv).astype(np.float32)
  return jnp.asarray(vals)


@pytest.mark.parametrize('nv,seed', [(7, 0), (23, 1), (61, 2)])
def test_factor_solve_matches_dense(nv, seed):
  meta = sparse.QMMeta(_random_tree(nv, seed))
  w = 4
  vals = _random_spd_packed(meta, w, seed)
  b = jnp.asarray(np.random.RandomState(seed + 9).randn(w, nv),
                  jnp.float32)
  dense = np.asarray(sparse.to_dense(meta, vals), np.float64)
  x_ref = np.stack([np.linalg.solve(dense[i], np.asarray(b)[i].astype(
      np.float64)) for i in range(w)])
  x, ld = sparse.factor_solve(meta, vals, b)
  assert_close(np.asarray(x), x_ref, 'tree solve', tol=2e-4)
  # solve from cached factor agrees
  x2 = sparse.solve(meta, ld, b)
  assert_close(np.asarray(x2), np.asarray(x), 'factor reuse', tol=1e-6)


@pytest.mark.parametrize('nv', [13, 40])
def test_mul_and_diag(nv):
  meta = sparse.QMMeta(_random_tree(nv, 3))
  vals = _random_spd_packed(meta, 2, 3)
  x = jnp.asarray(np.random.RandomState(7).randn(2, nv), jnp.float32)
  dense = np.asarray(sparse.to_dense(meta, vals))
  y_ref = np.einsum('wij,wj->wi', dense, np.asarray(x))
  y = sparse.mul_m(meta, vals, x)
  assert_close(np.asarray(y), y_ref, 'mul_m', tol=1e-5)
  # extra diagonal preserved through factor
  diag = jnp.asarray(np.random.rand(nv), jnp.float32)
  x1, _ = sparse.factor_solve(meta, vals, x, diag=diag)
  d64 = dense.astype(np.float64) + np.diag(np.asarray(diag, np.float64))
  x1_ref = np.stack([np.linalg.solve(d64[i], np.asarray(x)[i])
                     for i in range(2)])
  assert_close(np.asarray(x1), x1_ref, 'diag solve', tol=2e-4)


_SPARSE_XML = """
<mujoco>
  <option solver="CG" timestep="0.004" iterations="30"/>
  <worldbody>
    <geom type="plane" size="5 5 1"/>
    <body pos="0 0 1.2">
      <joint type="hinge" axis="0 1 0" damping="0.3"/>
      <geom type="capsule" size="0.03" fromto="0 0 0 0.3 0 0" mass="0.4"/>
      <body pos="0.3 0 0">
        <joint type="hinge" axis="1 0 0" damping="0.1"/>
        <geom type="capsule" size="0.03" fromto="0 0 0 0 0.3 0" mass="0.3"/>
      </body>
    </body>
    <body pos="0.6 0.6 0.4"><freejoint/>
      <geom type="box" size="0.06 0.05 0.04" mass="0.5"/></body>
    <body pos="-0.6 0.6 0.4"><freejoint/>
      <geom type="sphere" size="0.06" mass="0.4"/></body>
    <body pos="0.0 -0.6 0.4"><freejoint/>
      <geom type="capsule" size="0.03 0.08" mass="0.3"/></body>
  </worldbody>
</mujoco>
"""


@pytest.fixture
def sparse_pair(monkeypatch):
  monkeypatch.setenv('MJWT_SPARSE_NV', '4')   # force sparse mode
  mjm = mujoco.MjModel.from_xml_string(_SPARSE_XML)
  mjd = mujoco.MjData(mjm)
  np.random.seed(11)
  mjd.qvel[:] = 0.2 * (np.random.rand(mjm.nv) - 0.5)
  for _ in range(5):
    mujoco.mj_step(mjm, mjd)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  assert m.qm_meta is not None
  d = mjwt.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def test_forward_oracle_sparse(sparse_pair):
  mjm, mjd, m, d = sparse_pair
  d = forward_mod.forward(m, d)
  dense = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, dense)
  ours = np.asarray(sparse.to_dense(m.qm_meta, d.qM))
  assert_close(ours, dense, 'qM packed vs mj_fullM', tol=1e-4)
  assert_close(np.asarray(d.qacc_smooth), mjd.qacc_smooth, 'qacc_smooth',
               tol=2e-4)
  assert_close(np.asarray(d.qacc), mjd.qacc, 'qacc', tol=5e-3)
  # mul_m against the oracle product
  vec = np.random.RandomState(3).randn(mjm.nv)
  res = np.zeros(mjm.nv)
  mujoco.mj_mulM(mjm, mjd, res, vec)
  ours_mul = np.asarray(support.mul_m(m, d, jnp.asarray(vec, jnp.float32)))
  assert_close(ours_mul, res, 'mul_m oracle', tol=1e-4)


def test_step_oracle_sparse(sparse_pair):
  mjm, mjd, m, d = sparse_pair
  step = jax.jit(lambda dd: forward_mod.step(m, dd))
  for _ in range(10):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert_close(np.asarray(d.qpos), mjd.qpos, 'qpos after 10 steps',
               tol=5e-3)


def test_batched_step_sparse(sparse_pair):
  mjm, mjd, m, d = sparse_pair
  batch = parallel.make_batch(m, d, 4)
  out = jax.jit(lambda dd: forward_mod.step_batched(m, dd))(batch)
  assert out.qpos.shape == (4,) + d.qpos.shape
  mujoco.mj_step(mjm, mjd)
  assert_close(np.asarray(out.qpos[0]), mjd.qpos, 'batched qpos step',
               tol=5e-3)
  assert bool(jnp.all(jnp.isfinite(out.qpos)))
