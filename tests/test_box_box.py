"""Box-box multi-contact manifold oracle tests vs C mjc_BoxBox
(reference collision_primitive_core.py:648 box_box strategy)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt

from fixtures import assert_close

TWO_BOXES = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 0.1">
      <freejoint/>
      <geom type="box" size="0.12 0.1 0.08" mass="1.0"/>
    </body>
    <body pos="0 0 0.35">
      <freejoint/>
      <geom type="box" size="0.1 0.09 0.07" mass="0.7"/>
    </body>
  </worldbody>
</mujoco>
"""

STACK = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 0.1"/>
    <body pos="0 0 0.1">
      <freejoint/>
      <geom type="box" size="0.1 0.1 0.1" mass="1.0"/>
    </body>
    <body pos="0.02 0.01 0.31">
      <freejoint/>
      <geom type="box" size="0.08 0.08 0.08" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""


def _match_contacts(mjm, mjd, d, tol_pos=2e-2, tol_dist=2e-4):
  """Compare the box-box contact set (count, positions, dists) against
  the C oracle, order-independent. Depths must match tightly; positions
  at 2cm — the manifold enumeration differs from C in rare corner
  candidates (the reference's own box-box tests run at atol=0.1,
  collision_driver_test.py:540)."""
  ref = [(mjd.contact.dist[i], mjd.contact.pos[i].copy(),
          mjd.contact.frame[i, :3].copy())
         for i in range(mjd.ncon)]
  ours_dist = np.asarray(d.contact.dist)
  ours_pos = np.asarray(d.contact.pos)
  keep = ours_dist < 1e9
  ours = [(ours_dist[i], ours_pos[i]) for i in range(len(ours_dist))
          if keep[i]]
  # every C contact must be matched; extra manifold points are allowed
  # (same semantics as the reference's own box-box tests, which note
  # "different heuristics for generating multiple contacts",
  # collision_driver_test.py:567-576)
  assert len(ref) <= len(ours) <= 8, (len(ours), len(ref))
  used = set()
  for dist_r, pos_r, _ in ref:
    best, best_i = 1e9, -1
    for i, (dist_o, pos_o) in enumerate(ours):
      if i in used:
        continue
      err = np.linalg.norm(pos_o - pos_r)
      if err < best:
        best, best_i = err, i
    assert best < tol_pos, (best, pos_r)
    used.add(best_i)
    assert abs(ours[best_i][0] - dist_r) < tol_dist, (
        ours[best_i][0], dist_r)


@pytest.mark.parametrize('seed', range(8))
def test_box_box_contacts_random(seed):
  mjm = mujoco.MjModel.from_xml_string(TWO_BOXES)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  # random overlapping poses
  mjd.qpos[:3] = rng.uniform(-0.02, 0.02, 3)
  mjd.qpos[7:10] = mjd.qpos[:3] + np.array([
      rng.uniform(-0.08, 0.08), rng.uniform(-0.08, 0.08),
      rng.uniform(0.10, 0.16)])
  q1 = rng.normal(size=4)
  mjd.qpos[3:7] = q1 / np.linalg.norm(q1)
  q2 = np.array([1.0, *rng.uniform(-0.15, 0.15, 3)])
  mjd.qpos[10:14] = q2 / np.linalg.norm(q2)
  mujoco.mj_forward(mjm, mjd)

  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, jnp.float32))
  d = mjwt.fwd_position(m, d)
  _match_contacts(mjm, mjd, d)


def test_box_box_face_aligned():
  """Axis-aligned resting face contact: 4 corner contacts."""
  mjm = mujoco.MjModel.from_xml_string(TWO_BOXES)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[:] = 0
  mjd.qpos[3] = 1
  mjd.qpos[10] = 1
  mjd.qpos[9] = 0.08 + 0.07 - 0.001  # 1mm penetration
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon == 4

  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  d = d.replace(qpos=jnp.asarray(mjd.qpos, jnp.float32))
  d = mjwt.fwd_position(m, d)
  _match_contacts(mjm, mjd, d)


def test_stacked_boxes_dynamics():
  """Stacked boxes settle like the C oracle over 200 steps."""
  mjm = mujoco.MjModel.from_xml_string(STACK)
  mjd = mujoco.MjData(mjm)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=16)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  # both settle: top box rests on bottom box
  assert_close(d.qpos[2], mjd.qpos[2], 'bottom box z', tol=5e-3)
  assert_close(d.qpos[9], mjd.qpos[9], 'top box z', tol=5e-3)
  assert abs(float(d.qpos[9]) - 0.2 - float(d.qpos[2])) < 0.085
