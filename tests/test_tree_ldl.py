"""Tree-sparse LDL kernel vs dense oracle (reference sparse path:
mujoco_warp/_src/smooth.py:1017-1104 level-scheduled CSR factor)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import HOPPER


def _model_qms(xml_path=None, xml_string=None, nworld=6, seed=0):
  """(W, nv, nv) dense mass matrices at randomized qpos + parentid."""
  if xml_path:
    mjm = mujoco.MjModel.from_xml_path(xml_path)
  else:
    mjm = mujoco.MjModel.from_xml_string(xml_string)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  qms = []
  for _ in range(nworld):
    mjd.qpos[:] = mjm.qpos0 + rng.normal(0, 0.1, mjm.nq)
    mujoco.mj_forward(mjm, mjd)
    full = np.zeros((mjm.nv, mjm.nv))
    mujoco.mj_fullM(mjm, mjd, full)
    qms.append(full)
  return (np.stack(qms).astype(np.float32),
          tuple(int(p) for p in mjm.dof_parentid))


@pytest.mark.parametrize('scene', [
    'hopper', 'humanoid',
    pytest.param('three_humanoids', marks=pytest.mark.slow)])
def test_tree_ldl_solve_matches_dense(scene):
  from mujoco_warp_tpu import models
  from mujoco_warp_tpu.pallas import batch_linalg

  if scene == 'hopper':
    qm, parentid = _model_qms(xml_string=HOPPER)
  else:
    qm, parentid = _model_qms(xml_path=getattr(models, scene.upper()))
  w, nv, _ = qm.shape
  rng = np.random.default_rng(1)
  b = rng.normal(0, 1, (w, nv)).astype(np.float32)

  x = batch_linalg.tree_ldl_solve_batched(
      jnp.asarray(qm), jnp.asarray(b), parentid, interpret=True)
  x_ref = np.linalg.solve(qm.astype(np.float64),
                          b.astype(np.float64)[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=2e-4)


def test_tree_ldl_extra_diag_and_factor_reuse():
  from mujoco_warp_tpu import models
  from mujoco_warp_tpu.pallas import batch_linalg

  qm, parentid = _model_qms(xml_path=models.HUMANOID, nworld=3)
  w, nv, _ = qm.shape
  rng = np.random.default_rng(2)
  b = rng.normal(0, 1, (w, nv)).astype(np.float32)
  damp = np.abs(rng.normal(0, 0.5, nv)).astype(np.float32)

  x, ld = batch_linalg.tree_ldl_solve_batched(
      jnp.asarray(qm), jnp.asarray(b), parentid, diag=jnp.asarray(damp),
      return_factor=True, interpret=True)
  a64 = qm.astype(np.float64) + np.eye(nv)[None] * damp.astype(np.float64)
  x_ref = np.linalg.solve(a64, b.astype(np.float64)[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-4, atol=2e-4)

  # second solve from the cached factor
  b2 = rng.normal(0, 1, (w, nv)).astype(np.float32)
  x2 = batch_linalg.tree_solve_from_factor_batched(
      ld, jnp.asarray(b2), parentid, interpret=True)
  x2_ref = np.linalg.solve(a64, b2.astype(np.float64)[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(x2), x2_ref, rtol=2e-4, atol=2e-4)


def test_tree_ldl_statement_count_three_humanoids():
  """The schedule must stay linear-ish in nv (the whole point): the
  three_humanoids factor schedule is ~100x smaller than dense nv^3/6."""
  import mujoco_warp_tpu
  from mujoco_warp_tpu import models
  from mujoco_warp_tpu.pallas import batch_linalg

  mjm = mujoco.MjModel.from_xml_path(models.THREE_HUMANOIDS)
  anc = batch_linalg.dof_ancestors(tuple(int(p) for p in mjm.dof_parentid))
  nv = mjm.nv
  n_fma = sum(len(a) for a in anc)
  assert nv == 81
  assert n_fma < 1000           # dense would be ~88k row-ops (nv^3/6)
