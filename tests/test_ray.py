"""Ray casting oracle tests against C mj_ray (reference ray_test.py)."""

import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import ray as ray_mod

import jax.numpy as jnp

from fixtures import fixture

SCENE = """
<mujoco>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 1"/>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.15" mass="1"/>
    </body>
    <body pos="1 0 0.4" euler="30 0 0">
      <freejoint/>
      <geom name="box" type="box" size="0.2 0.15 0.1" mass="1"/>
    </body>
    <body pos="-1 0 0.5" euler="0 40 0">
      <freejoint/>
      <geom name="cap" type="capsule" size="0.08 0.2" mass="1"/>
    </body>
    <body pos="0 1 0.5">
      <freejoint/>
      <geom name="cyl" type="cylinder" size="0.1 0.2" mass="1"/>
    </body>
    <body pos="0 -1 0.5" euler="20 30 0">
      <freejoint/>
      <geom name="ell" type="ellipsoid" size="0.1 0.15 0.2" mass="1"/>
    </body>
    <site name="rf" pos="0 0 2" euler="180 0 0"/>
  </worldbody>
  <sensor><rangefinder site="rf"/></sensor>
</mujoco>
"""


def test_rays_match_oracle():
  mjm, mjd, m, d = fixture(SCENE)
  d = mjwt.fwd_position(m, d)
  rng = np.random.default_rng(3)
  for _ in range(50):
    pnt = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2),
                    rng.uniform(0.3, 3)])
    tgt = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                    rng.uniform(0, 0.8)])
    vec = tgt - pnt
    vec /= np.linalg.norm(vec)
    geomid_ref = np.zeros(1, dtype=np.int32)
    t_ref = mujoco.mj_ray(mjm, mjd, pnt, vec, None, 1, -1, geomid_ref)
    gid, t = ray_mod.ray(m, d, pnt.astype(np.float32),
                         vec.astype(np.float32))
    if t_ref < 0:
      assert float(t) < 0, f'{pnt} {vec}: ref miss, we hit {float(t)}'
    else:
      np.testing.assert_allclose(float(t), t_ref, rtol=1e-4, atol=1e-4,
                                 err_msg=f'{pnt} {vec}')
      assert int(gid) == int(geomid_ref[0])


def test_rangefinder():
  mjm, mjd, m, d = fixture(SCENE)
  d = mjwt.forward(m, d)
  # site at z=2 looking down (-z): first hit = ball top at 0.65
  adr = mjm.sensor_adr[0]
  np.testing.assert_allclose(float(d.sensordata[adr]),
                             mjd.sensordata[adr], rtol=1e-4, atol=1e-4)


def test_ray_mesh():
  """Rangefinder/ray on a mesh geom vs C mj_ray (reference ray.py
  ray_mesh)."""
  xml = """
  <mujoco>
    <asset>
      <mesh name="octa" vertex="0.12 0 0  -0.12 0 0  0 0.12 0  0 -0.12 0
                                0 0 0.1  0 0 -0.1"/>
    </asset>
    <worldbody>
      <body pos="0 0 0.5"><freejoint/>
        <geom type="mesh" mesh="octa" mass="0.3"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m)
  d = mjwt.fwd_position(m, d)
  import numpy as np
  for pnt, vec in [((0.01, 0.005, 0.0), (0, 0, 1.0)),
                   ((0.5, 0.02, 0.45), (-1, 0, 0)),
                   ((0.015, -0.01, 2.0), (0, 0, -1.0))]:
    pnt = np.asarray(pnt, np.float64)
    vec = np.asarray(vec, np.float64)
    geomid_ref = np.zeros(1, np.int32)
    t_ref = mujoco.mj_ray(mjm, mjd, pnt, vec, None, 1, -1, geomid_ref)
    gid, t = ray_mod.ray(m, d, jnp.asarray(pnt, jnp.float32),
                         jnp.asarray(vec, jnp.float32))
    assert (int(gid) >= 0) == (geomid_ref[0] >= 0), (pnt, vec)
    if geomid_ref[0] >= 0:
      assert abs(float(t) - t_ref) < 1e-4, (float(t), t_ref)


def test_ray_hfield_oracle():
  """Hfield rays match C mj_ray over random rays (reference
  ray.py:452-620 ray_hfield; triangles + base box + side walls)."""
  rng = np.random.default_rng(3)
  xml = """
  <mujoco>
    <asset><hfield name="hf" nrow="9" ncol="11" size="1.0 0.8 0.3 0.1"/></asset>
    <worldbody>
      <geom type="hfield" hfield="hf" pos="0.1 -0.05 0.02" euler="0 0 15"/>
      <body pos="0 0 2"><freejoint/><geom type="sphere" size="0.05"/></body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.hfield_data[:] = rng.uniform(0, 1, mjm.hfield_data.shape)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=4)
  d = mjwt.fwd_position(m, d)
  geomid = np.zeros(1, np.int32)
  for _ in range(60):
    pnt = rng.uniform(-1.5, 1.5, 3)
    pnt[2] = rng.uniform(0.5, 2.0)
    vec = rng.normal(0, 1, 3)
    vec /= np.linalg.norm(vec)
    t_c = mujoco.mj_ray(mjm, mjd, pnt, vec, None, 1, -1, geomid)
    _, t_o = mjwt.ray.ray(m, d, jnp.asarray(pnt, jnp.float32),
                          jnp.asarray(vec, jnp.float32))
    t_o = float(t_o)
    assert (t_c < 0) == (t_o < 0), (pnt, vec, t_c, t_o)
    if t_c >= 0:
      assert abs(t_c - t_o) < 1e-4, (pnt, vec, t_c, t_o)
