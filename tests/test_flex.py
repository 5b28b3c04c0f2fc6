"""Flex (deformable) oracle-differential tests vs C MuJoCo
(reference flex stack: smooth.py:228-330, passive.py:567-746,
constraint.py:677-760)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt
from fixtures import assert_close

CLOTH_GRID = """
<mujoco>
  <option timestep="0.002" jacobian="dense" solver="CG" tolerance="1e-6"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 1"/>
    <flexcomp name="towel" type="grid" count="5 5 1" spacing="0.06 0.06 0.06"
              radius="0.01" dim="2" pos="0 0 0.6" mass="0.1">
      <edge equality="true"/>
      <elasticity young="2e3" poisson="0" thickness="1e-2"
                  damping="2e-3" elastic2d="bend"/>
      <contact contype="0" conaffinity="0"/>
    </flexcomp>
  </worldbody>
</mujoco>
"""

SOFT_BOX = """
<mujoco>
  <option timestep="0.002" jacobian="dense" solver="CG" tolerance="1e-6"/>
  <worldbody>
    <flexcomp name="soft" type="grid" count="3 3 3" spacing="0.07 0.07 0.07"
              radius="0.005" dim="3" pos="0 0 0.5" mass="0.2">
      <elasticity young="5e3" poisson="0.2" damping="1e-3"/>
      <contact contype="0" conaffinity="0"/>
    </flexcomp>
  </worldbody>
</mujoco>
"""


def _flex_fixture(xml, seed=0, qvel_noise=0.1):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(seed)
  mjd.qpos[:] = mjm.qpos0 + rng.normal(0, 0.01, mjm.nq)
  mjd.qvel[:] = rng.normal(0, qvel_noise, mjm.nv)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=1)
  d = d.replace(qpos=jnp.asarray(np.asarray(mjd.qpos), jnp.float32),
                qvel=jnp.asarray(np.asarray(mjd.qvel), jnp.float32))
  return mjm, mjd, m, d


@pytest.mark.parametrize('xml', [CLOTH_GRID, SOFT_BOX],
                         ids=['cloth2d', 'soft3d'])
def test_flex_kinematics(xml):
  mjm, mjd, m, d = _flex_fixture(xml)
  d = mjwt.fwd_position(m, d)
  assert_close(d.flexvert_xpos, mjd.flexvert_xpos, 'flexvert_xpos')
  assert_close(d.flexedge_length, mjd.flexedge_length, 'flexedge_length')
  assert_close(d.flexedge_velocity, mjd.flexedge_velocity,
               'flexedge_velocity', tol=5e-5)


@pytest.mark.parametrize('xml', [CLOTH_GRID, SOFT_BOX],
                         ids=['cloth2d', 'soft3d'])
def test_flex_passive_forces(xml):
  mjm, mjd, m, d = _flex_fixture(xml)
  d = mjwt.fwd_position(m, d)
  d = mjwt.fwd_velocity(m, d)
  scale = max(float(np.abs(mjd.qfrc_passive).max()), 1.0)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_passive) / scale,
      np.asarray(mjd.qfrc_passive) / scale, atol=2e-5,
      err_msg='qfrc_passive')


def test_flex_equality_rows():
  mjm, mjd, m, d = _flex_fixture(CLOTH_GRID)
  d = mjwt.fwd_position(m, d)
  ne = int(mjd.ne)
  assert ne > 0
  assert int(d.ne) == ne
  # C orders flex-equality rows per edge, same as our layout
  assert_close(d.efc_pos[:ne] - d.efc_margin[:ne],
               mjd.efc_pos[:ne], 'efc_pos', tol=5e-5)
  np.testing.assert_allclose(np.asarray(d.efc_J[:ne]), mjd.efc_J[:ne * m.nv]
                             .reshape(ne, m.nv), atol=5e-5,
                             err_msg='efc_J')
  scale = max(float(np.abs(mjd.efc_D[:ne]).max()), 1.0)
  np.testing.assert_allclose(np.asarray(d.efc_D[:ne]) / scale,
                             mjd.efc_D[:ne] / scale, atol=1e-4,
                             err_msg='efc_D')
  assert_close(d.efc_aref[:ne], mjd.efc_aref[:ne], 'efc_aref', tol=1e-3)


BALL_CLOTH = """
<mujoco>
  <option timestep="0.002" jacobian="dense"/>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 1"/>
    <body name="ball" pos="0.05 0.04 0.065">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.05" mass="0.1"/>
    </body>
    <flexcomp name="towel" type="grid" count="4 4 1" spacing="0.06 0.06 0.06"
              radius="0.01" dim="2" pos="0 0 0.009" mass="0.1">
      <elasticity young="2e3" poisson="0" thickness="1e-2" damping="2e-3"/>
    </flexcomp>
  </worldbody>
</mujoco>
"""


def test_flex_collision():
  """Plane-vertex + sphere-triangle flex contacts match C exactly
  (reference collision_flex.py:261,381)."""
  mjm = mujoco.MjModel.from_xml_string(BALL_CLOTH)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=32)
  d = d.replace(qpos=jnp.asarray(np.asarray(mjd.qpos), jnp.float32),
                qvel=jnp.asarray(np.asarray(mjd.qvel), jnp.float32))
  d = mjwt.fwd_position(m, d)
  ncon = int(d.ncon)
  assert ncon == int(mjd.ncon), (ncon, int(mjd.ncon))
  cpos = np.array([mjd.contact[i].pos for i in range(mjd.ncon)])
  cdist = np.array([mjd.contact[i].dist for i in range(mjd.ncon)])
  opos = np.asarray(d.contact.pos)[:ncon]
  odist = np.asarray(d.contact.dist)[:ncon]
  for i in range(ncon):
    j = int(np.argmin(np.linalg.norm(cpos - opos[i], axis=1)))
    assert np.linalg.norm(cpos[j] - opos[i]) < 1e-4, (i, opos[i])
    assert abs(cdist[j] - odist[i]) < 1e-5


def test_flex_contact_efc():
  """Flex contact constraint rows (vertex-weighted jacobian, D, aref)
  and resulting qacc match C (reference constraint.py:1690-1787)."""
  mjm = mujoco.MjModel.from_xml_string(BALL_CLOTH)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=32)
  d = d.replace(qpos=jnp.asarray(np.asarray(mjd.qpos), jnp.float32),
                qvel=jnp.asarray(np.asarray(mjd.qvel), jnp.float32))
  d = mjwt.forward(m, d)
  nv = m.nv
  cpos = np.array([mjd.contact[i].pos for i in range(mjd.ncon)])
  opos = np.asarray(d.contact.pos)[:int(d.ncon)]
  efc_J = np.asarray(d.efc_J)
  efc_D = np.asarray(d.efc_D)
  matched = 0
  for i in range(int(d.ncon)):
    j = int(np.argmin(np.linalg.norm(cpos - opos[i], axis=1)))
    if np.linalg.norm(cpos[j] - opos[i]) > 1e-4:
      continue
    if (np.linalg.norm(cpos - cpos[j], axis=1) < 1e-6).sum() > 1:
      continue  # duplicate positions make the match ambiguous
    ca = mjd.contact[j].efc_address
    oa = int(np.asarray(d.contact.efc_address)[i])
    nrows = max(1, 2 * (mjd.contact[j].dim - 1))
    cJ = mjd.efc_J.reshape(-1, nv)[ca:ca + nrows]
    np.testing.assert_allclose(efc_J[oa:oa + nrows], cJ, atol=5e-5)
    scale = max(np.abs(mjd.efc_D[ca:ca + nrows]).max(), 1.0)
    np.testing.assert_allclose(efc_D[oa:oa + nrows] / scale,
                               mjd.efc_D[ca:ca + nrows] / scale, atol=1e-4)
    matched += 1
  assert matched == int(mjd.ncon)
  scale = max(np.abs(mjd.qacc).max(), 1.0)
  np.testing.assert_allclose(np.asarray(d.qacc) / scale, mjd.qacc / scale,
                             atol=1e-4, err_msg='qacc')


@pytest.mark.slow
def test_flex_contact_trajectory():
  """Ball resting on a cloth on the floor stays finite and tracks C."""
  mjm = mujoco.MjModel.from_xml_string(BALL_CLOTH)
  mjd = mujoco.MjData(mjm)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=32)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert np.isfinite(np.asarray(d.qpos)).all()
  err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  assert err < 2e-2, f'qpos drift {err}'


@pytest.mark.slow
def test_flex_step_trajectory():
  """Full steps (passive + equality, no contacts) track C MuJoCo."""
  mjm, mjd, m, d = _flex_fixture(CLOTH_GRID, qvel_noise=0.0)
  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(50):
    d = step(d)
  err = np.abs(np.asarray(d.qpos) - mjd.qpos).max()
  assert err < 5e-3, f'qpos drift {err}'
  assert np.isfinite(np.asarray(d.qpos)).all()
