"""Chunked XLA solve (solver._chunked_solve): sorts worlds by
previous-step solver_niter and runs each chunk's Newton while_loop
independently, so a handful of slow worlds no longer drag the whole
batch to max-iterations (three_humanoids r4: 422 ms/step from exactly
this). Must be bit-equivalent to the single while_loop per world.
"""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import mujoco

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import models

fwd = importlib.import_module('mujoco_warp_tpu.forward')
solver = importlib.import_module('mujoco_warp_tpu.solver')


@pytest.fixture
def batch():
  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  W = 20
  rng = np.random.default_rng(0)
  q0 = np.asarray(jax.device_get(d.qpos))
  b = jax.vmap(lambda q, v: d.replace(qpos=q, qvel=v))(
      jnp.asarray(q0[None] + 0.03 * rng.standard_normal((W, q0.size)),
                  jnp.float32),
      jnp.asarray(0.1 * rng.standard_normal((W, m.nv)), jnp.float32))
  b = jax.jit(lambda dd: fwd.forward_batched(m, dd))(b)
  return m, b


def test_chunked_solve_matches_unchunked(batch, monkeypatch):
  m, b = batch
  ref = jax.jit(lambda dd: solver._solve_xla(m, dd))(b)
  monkeypatch.setenv('MJWT_SOLVER_CHUNK', '8')  # W=20 -> 3 chunks + pad
  out = solver._chunked_solve(m, b)
  assert out is not None
  for name in ('qacc', 'qfrc_constraint', 'efc_force', 'solver_niter'):
    np.testing.assert_array_equal(
        np.asarray(getattr(ref, name)), np.asarray(getattr(out, name)),
        err_msg=name)


def test_chunked_solve_gates(batch, monkeypatch):
  m, b = batch
  monkeypatch.setenv('MJWT_SOLVER_CHUNK', '0')
  assert solver._chunked_solve(m, b) is None
  monkeypatch.setenv('MJWT_SOLVER_CHUNK', '16')  # W=20 < 2*16
  assert solver._chunked_solve(m, b) is None
  # r5: chunking is independent of the (now opt-in) per-step world
  # sort — its internal argsort IS the mechanism, so it stays active
  # with MJWT_SORT_WORLDS unset/0
  monkeypatch.setenv('MJWT_SOLVER_CHUNK', '8')
  monkeypatch.setenv('MJWT_SORT_WORLDS', '0')
  assert solver._chunked_solve(m, b) is not None
