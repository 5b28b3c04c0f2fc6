"""Per-step bounding-sphere cull + compaction broadphase tests
(reference sap_broadphase role, collision_driver.py:554-643)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco
import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import collision_driver


def _grid_spheres(n=12, spacing=0.25):
  """n x n grid of free spheres; neighbors in one corner overlap."""
  bodies = []
  for i in range(n):
    for j in range(n):
      x, y = i * spacing, j * spacing
      # compress one corner so a handful of spheres intersect
      if i < 2 and j < 2:
        x, y = i * 0.08, j * 0.08
      bodies.append(f'<body pos="{x} {y} 1"><freejoint/>'
                    f'<geom type="sphere" size="0.05" mass="0.1"/></body>')
  return ('<mujoco><option timestep="0.002"/><worldbody>' +
          ''.join(bodies) + '</worldbody></mujoco>')


def _contact_set(d):
  dist = np.asarray(d.contact.dist)
  pos = np.asarray(d.contact.pos)
  keep = dist < 1e9
  order = np.lexsort((pos[keep][:, 0], pos[keep][:, 1]))
  return dist[keep][order], pos[keep][order]



def _put_model_nxn(mjm):
  """Pin the static NXN driver: these tests exercise its cull path,
  and the grid fixture's pair count now crosses the auto-SAP threshold."""
  os.environ['MJWT_SAP_THRESHOLD'] = str(10 ** 9)
  try:
    return mjwt.put_model(mjm)
  finally:
    del os.environ['MJWT_SAP_THRESHOLD']


def test_cull_matches_full():
  xml = _grid_spheres()
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = _put_model_nxn(mjm)
  assert any(len(gl) > collision_driver._CULL_THRESHOLD_CHEAP
             for _, _, gl in m.collision_pairs)
  d = mjwt.make_data(m, nconmax=16)

  d_cull = collision_driver.collision(m, mjwt.smooth.kinematics(m, d))

  orig = (collision_driver._CULL_THRESHOLD,
          collision_driver._CULL_THRESHOLD_CHEAP)
  collision_driver._CULL_THRESHOLD = 10 ** 9
  collision_driver._CULL_THRESHOLD_CHEAP = 10 ** 9
  try:
    d_full = collision_driver.collision(m, mjwt.smooth.kinematics(m, d))
  finally:
    (collision_driver._CULL_THRESHOLD,
     collision_driver._CULL_THRESHOLD_CHEAP) = orig

  dist_c, pos_c = _contact_set(d_cull)
  dist_f, pos_f = _contact_set(d_full)
  assert int(d_cull.ncon) == int(d_full.ncon)
  np.testing.assert_allclose(dist_c, dist_f, atol=1e-6)
  np.testing.assert_allclose(pos_c, pos_f, atol=1e-6)
  assert int(d_cull.ncollision) == int(d_full.ncollision)


def test_cull_overflow_counted():
  """With a tiny active-pair budget, dropped overlaps surface in
  ncollision (> ncon signals overflow)."""
  xml = _grid_spheres()
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = _put_model_nxn(mjm)
  d = mjwt.make_data(m, nconmax=16)
  os.environ['MJWT_CULL_K'] = '2'
  try:
    d_cull = collision_driver.collision(m, mjwt.smooth.kinematics(m, d))
  finally:
    del os.environ['MJWT_CULL_K']
  # the grid corner has more overlapping pairs than the budget of 2
  assert int(d_cull.ncollision) > int(d_cull.ncon)


def test_cull_dynamics_oracle():
  """Culled pipeline still tracks the C oracle on a falling cluster."""
  xml = _grid_spheres(n=9)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  m = _put_model_nxn(mjm)
  d = mjwt.make_data(m, nconmax=16)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  assert err < 5e-3, err
