"""Hfield collision oracle tests (reference's apollo hfield scenes)."""

import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt

from fixtures import fixture

HFIELD = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <hfield name="terrain" nrow="9" ncol="9" size="1 1 0.2 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="terrain"/>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="1"/>
    </body>
    <body pos="0.4 0.2 0.6">
      <freejoint/>
      <geom type="capsule" size="0.05 0.15" mass="0.5" euler="0 70 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _make(seed=0):
  np.random.seed(seed)
  mjm = mujoco.MjModel.from_xml_string(HFIELD)
  # deterministic bumpy terrain
  nr, nc = mjm.hfield_nrow[0], mjm.hfield_ncol[0]
  h = 0.5 + 0.5 * np.sin(np.linspace(0, 3, nr))[:, None] * np.cos(
      np.linspace(0, 4, nc))[None, :]
  mjm.hfield_data[:] = h.reshape(-1)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def test_hfield_resting_depth():
  """Drop the sphere; both engines settle at similar height."""
  mjm, mjd, m, d = _make()
  import jax
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(400):
    mujoco.mj_step(mjm, mjd)
  for _ in range(400):
    d = step(d)
  q = np.asarray(d.qpos)
  assert not np.any(np.isnan(q))
  # sphere z close to the C engine's resting height
  np.testing.assert_allclose(q[2], mjd.qpos[2], atol=0.02)
  # capsule also comes to rest on the terrain (not falling through)
  assert q[9] > 0.0
  assert abs(q[9] - mjd.qpos[9]) < 0.05


def test_hfield_contact_exists():
  mjm, mjd, m, d = _make()
  # place sphere just touching terrain under (0, 0)
  import jax.numpy as jnp
  # height at center of grid in world: base z in [0, sz]
  d = d.replace(qpos=d.qpos.at[2].set(0.15))
  mjd.qpos[2] = 0.15
  mujoco.mj_forward(mjm, mjd)
  d = mjwt.fwd_position(m, d)
  if mjd.ncon > 0:
    assert int(d.ncon) > 0
    ours = np.min(np.asarray(d.contact.dist)[:int(d.ncon)])
    ref = np.min(mjd.contact.dist)
    np.testing.assert_allclose(ours, ref, atol=3e-3)


BOX_HFIELD = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <hfield name="flat" nrow="9" ncol="9" size="1 1 0.2 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="flat"/>
    <body pos="0 0 0.35">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.06" mass="0.5"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_box_on_hfield_rest():
  """Box settles on the heightfield at the C oracle's rest height
  (corner-sampled narrowphase)."""
  import jax
  import jax.numpy as jnp
  mjm = mujoco.MjModel.from_xml_string(BOX_HFIELD)
  # flat plateau at mid height
  mjm.hfield_data[:] = 0.5
  mjd = mujoco.MjData(mjm)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(250):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  z = float(d.qpos[2])
  assert np.isfinite(np.asarray(d.qpos)).all()
  assert abs(z - mjd.qpos[2]) < 5e-3, (z, mjd.qpos[2])


PRISM_XML = """
<mujoco>
  <option timestep="0.002"/>
  <asset>
    <hfield name="terrain" nrow="9" ncol="9" size="1 1 0.2 0.1"/>
  </asset>
  <worldbody>
    <geom type="hfield" hfield="terrain"/>
    <body pos="0 0 {z}">
      <freejoint/>
      <geom type="{gtype}" size="{size}" mass="1" euler="5 10 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _make_prism(gtype, size, z, euler='5 10 0', bumpy=True):
  """Lower a convex geom into the terrain until C MuJoCo reports
  penetrating contacts, then compare narrowphase outputs there."""
  mjm = mujoco.MjModel.from_xml_string(
      PRISM_XML.format(gtype=gtype, size=size, z=z).replace(
          'euler="5 10 0"', f'euler="{euler}"'))
  nr, nc = mjm.hfield_nrow[0], mjm.hfield_ncol[0]
  if bumpy:
    h = 0.5 + 0.5 * np.sin(np.linspace(0, 3, nr))[:, None] * np.cos(
        np.linspace(0, 4, nc))[None, :]
  else:
    h = np.full((nr, nc), 0.5)         # flat plateau (still prisms)
  mjm.hfield_data[:] = h.reshape(-1)
  mjd = mujoco.MjData(mjm)
  for zz in np.arange(z, -0.1, -0.002):
    mjd.qpos[2] = zz
    mujoco.mj_forward(mjm, mjd)
    if mjd.ncon > 0 and mjd.contact.dist.min() < -2e-4:
      break
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m)
  return mjm, mjd, m, d


def _engine_contacts(m, d):
  import jax
  from mujoco_warp_tpu import collision_driver, smooth
  out = jax.jit(lambda dd: collision_driver.collision(
      m, smooth.kinematics(m, dd)))(d)
  dist = np.asarray(out.contact.dist)
  pos = np.asarray(out.contact.pos)
  act = np.asarray(out.contact.geom)[:, 0] >= 0
  return dist[act], pos[act]


def _contact_parity(gtype, size, z, euler, pos_tol, dist_tol):
  """Every penetrating C contact must have a matching engine contact.
  Flat terrain + tilted geom makes the witness set (corners) exact and
  unambiguous; on sloped triangles an edge witness can sit anywhere
  along the contact edge (C clips, MPR refines — both valid), so those
  configurations are covered by the behavioral rest tests instead."""
  mjm, mjd, m, d = _make_prism(gtype, size, z, euler, bumpy=False)
  assert mjd.ncon > 0, 'C must report contacts at rest'
  act_dist, act_pos = _engine_contacts(m, d)
  assert act_dist.size > 0, 'engine must report contacts'
  for ci in range(mjd.ncon):
    cdist = mjd.contact.dist[ci]
    cpos = mjd.contact.pos[ci]
    if cdist > -1e-5:
      continue  # grazing C contacts may legitimately fall outside MPR
    perr = np.linalg.norm(act_pos - cpos[None], axis=1)
    j = int(np.argmin(perr))
    assert perr[j] < pos_tol, (gtype, ci, cpos, act_pos, perr[j])
    assert abs(act_dist[j] - cdist) < dist_tol, (
        gtype, ci, cdist, act_dist[j])


def test_box_hfield_contact_parity_vs_c():
  # tilted box on a flat plateau: one corner, exact witness
  _contact_parity('box', '0.12 0.1 0.08', 0.8, '5 10 0',
                  pos_tol=2e-3, dist_tol=2e-4)


def test_cylinder_hfield_contact_parity_vs_c():
  # tilted cylinder rim on a flat plateau
  _contact_parity('cylinder', '0.1 0.08', 0.8, '5 0 0',
                  pos_tol=5e-3, dist_tol=3e-4)


def test_ellipsoid_hfield_contact_parity_vs_c():
  # smooth tangency: the MPR portal witness spreads a few mm across the
  # near-flat tangent region (depth + normal still exact)
  _contact_parity('ellipsoid', '0.12 0.1 0.08', 0.8, '5 10 0',
                  pos_tol=5e-3, dist_tol=2e-4)


def test_box_hfield_bumpy_depth_parity_vs_c():
  """On bumpy terrain witness position is edge-ambiguous, but the
  DEEPEST penetration the two engines see must agree closely."""
  mjm, mjd, m, d = _make_prism('box', '0.12 0.1 0.08', 0.8)
  assert mjd.ncon > 0
  act_dist, _ = _engine_contacts(m, d)
  assert act_dist.size > 0
  c_min = mjd.contact.dist.min()
  # engine may find a marginally deeper point along the same contact
  # edge; it must never report shallower than C's deepest
  assert act_dist.min() <= c_min + 2e-4
  assert act_dist.min() >= c_min - 2.5e-3
