"""SDF narrowphase oracle tests (reference collision_sdf.py:492-933)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt

# watertight octahedron-ish convex mesh used as an SDF geom
_MESH = """
    <mesh name="octa" vertex="0.12 0 0  -0.12 0 0  0 0.12 0  0 -0.12 0
                              0 0 0.1  0 0 -0.1"/>
"""

XML = f"""
<mujoco>
  <option timestep="0.002" sdf_iterations="10" sdf_initpoints="20"/>
  <asset>{_MESH}</asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 0.1"/>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom name="sdfgeom" type="sdf" mesh="octa" mass="0.5"/>
    </body>
    <body pos="0.05 0.03 0.6">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.06" mass="0.3"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_sdf_model_loads():
  mjm = mujoco.MjModel.from_xml_string(XML)
  m = mjwt.put_model(mjm)
  assert any(8 in (t1, t2) for t1, t2, _ in m.collision_pairs)
  assert m.sdf_grids.ndim == 4


def test_sdf_contacts_floor():
  """SDF mesh on the plane: short-horizon trajectory parity from a
  penetrating start (long-horizon toppling of the octahedron is
  chaotic), then long-run stability: the body rests ON the floor."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  mjd.qpos[2] = 0.095  # slight penetration at the apex
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  d = d.replace(qpos=d.qpos.at[2].set(0.095))
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(25):
    mujoco.mj_step(mjm, mjd)
    d = step(d)
  assert abs(float(d.qpos[2]) - mjd.qpos[2]) < 5e-3, (
      float(d.qpos[2]), mjd.qpos[2])
  for _ in range(300):
    d = step(d)
  q = np.asarray(d.qpos)
  assert np.isfinite(q).all()
  # resting on the floor (any stable face/apex), not sunk or flying
  assert 0.04 < q[2] < 0.14, q[2]
  assert 0.05 < q[9] < 0.3, q[9]


def test_sdf_sphere_contact_geometry():
  """Static overlap: sphere pressed into the SDF mesh produces a
  contact whose depth matches the analytic interpenetration."""
  xml = f"""
  <mujoco>
    <option sdf_iterations="12" sdf_initpoints="16"/>
    <asset>{_MESH}</asset>
    <worldbody>
      <body pos="0 0 1"><freejoint/>
        <geom name="sdfgeom" type="sdf" mesh="octa" mass="0.5"/></body>
      <body pos="0 0 1.14"><freejoint/>
        <geom name="ball" type="sphere" size="0.06" mass="0.3"/></body>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  d = mjwt.fwd_position(m, d)
  dist = np.asarray(d.contact.dist)
  keep = dist < 1e9
  assert keep.any(), 'no sdf contact found'
  best = dist[keep].min()
  # apex gap: ball bottom at 1.08, octa apex at 1.10 -> depth ~ -0.02
  ref = mjd.contact.dist.min() if mjd.ncon else -0.02
  assert best < 0, best
  assert abs(best - ref) < 8e-3, (best, ref)
