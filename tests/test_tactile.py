"""Tactile sensor oracle tests vs C MuJoCo (reference
sensor.py:2085-2254 _preprocess_tactile_contacts/_sensor_tactile)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt

PLANE_XML = """
<mujoco>
  <asset><mesh name="sensor_mesh" builtin="sphere" params="0"/></asset>
  <worldbody>
    <geom name="floor" type="plane" size="3 3 1"/>
    <body name="sensor_body" pos="0 0 0.75"><freejoint/>
      <geom name="sensor_geom" type="mesh" mesh="sensor_mesh"/></body>
  </worldbody>
  <sensor><tactile geom="sensor_geom" mesh="sensor_mesh"/></sensor>
</mujoco>
"""

BOX_XML = """
<mujoco>
  <asset><mesh name="sensor_mesh" builtin="sphere" params="0"/></asset>
  <worldbody>
    <body name="sensor_body" pos="0 0 1.14"><freejoint/>
      <geom name="sensor_geom" type="mesh" mesh="sensor_mesh"/></body>
    <body><geom type="box" size=".7 .7 .3"/></body>
  </worldbody>
  <sensor><tactile geom="sensor_geom" mesh="sensor_mesh"/></sensor>
</mujoco>
"""


def _run(xml, nconmax=16):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=nconmax)
  d = d.replace(qpos=jnp.asarray(np.asarray(mjd.qpos), jnp.float32),
                qvel=jnp.asarray(np.asarray(mjd.qvel), jnp.float32))
  d = mjwt.forward(m, d)
  return mjm, mjd, m, d


def test_tactile_plane_exact():
  """Plane penetration depths match C exactly (analytic SDF both sides)."""
  mjm, mjd, m, d = _run(PLANE_XML)
  ours = np.asarray(d.sensordata)
  assert np.count_nonzero(mjd.sensordata) > 0
  np.testing.assert_allclose(ours, mjd.sensordata, atol=1e-6)


def test_tactile_box_shallow():
  """Box case matches C to ~2% at shallow depth (C evaluates an
  approximate discretized SDF; ours is analytic)."""
  mjm, mjd, m, d = _run(BOX_XML)
  ours = np.asarray(d.sensordata)
  ref = np.asarray(mjd.sensordata)
  nz = np.nonzero(ref)[0]
  assert len(nz) > 0
  assert set(np.nonzero(np.abs(ours) > 1e-9)[0]) == set(nz)
  np.testing.assert_allclose(ours[nz], ref[nz], rtol=0.02)


def test_tactile_requires_contact():
  """A collision-disabled overlapping geom produces no tactile output
  (C gates taxels on geoms in the active contact list)."""
  xml = PLANE_XML.replace('type="plane" size="3 3 1"',
                          'type="plane" size="3 3 1" contype="0" '
                          'conaffinity="0"')
  mjm, mjd, m, d = _run(xml)
  assert not np.any(mjd.sensordata)
  assert np.abs(np.asarray(d.sensordata)).max() < 1e-9


def test_tactile_dedup_multi_contact():
  """Multiple contacts with the same geom count once (the reference
  dedups its weld geom list; our per-geom flag is inherently deduped)."""
  mjm, mjd, m, d = _run(PLANE_XML)
  # the plane case yields 2+ contacts with the same plane geom; value
  # must equal the single-geom depth, not a multiple of it
  assert int(mjd.ncon) >= 2
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata,
                             atol=1e-6)


def test_user_sensor_callback():
  """mjSENS_USER sensordata is produced by the sensor_fn hook (the
  functional analogue of C mjcb_sensor); built-in stages skip it."""
  xml = """
  <mujoco>
    <worldbody>
      <body pos="0 0 1"><freejoint/>
        <geom type="sphere" size="0.1" mass="1"/></body>
    </worldbody>
    <sensor><user dim="2" needstage="pos"/></sensor>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m)

  def my_sensor(mm, dd):
    return dd.replace(sensordata=dd.sensordata.at[0].set(17.0)
                      .at[1].set(dd.qpos[2]))

  step = jax.jit(lambda dd: mjwt.step(m, dd, sensor_fn=my_sensor))
  d = step(d)
  sd = np.asarray(d.sensordata)
  assert sd[0] == 17.0
  # sensordata snapshots the pre-integration state (C convention)
  assert abs(sd[1] - 1.0) < 1e-6


def test_tactile_jit_step():
  """Tactile sensing composes with jit(step) and stays finite."""
  mjm = mujoco.MjModel.from_xml_string(PLANE_XML)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=16)
  step = jax.jit(lambda dd: mjwt.step(m, dd))
  for _ in range(10):
    d = step(d)
  assert np.isfinite(np.asarray(d.sensordata)).all()
