"""Renderer tests: analytic depth, segmentation, batching
(reference render_test.py strategy, self-consistent oracle)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import render as render_mod

from fixtures import fixture

SCENE = """
<mujoco>
  <worldbody>
    <light pos="0 -3 3" dir="0 1 -1" directional="true" castshadow="true"/>
    <geom name="floor" type="plane" size="5 5 1" rgba="0.5 0.5 0.5 1"/>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.2" mass="1"
            rgba="1 0 0 1"/>
    </body>
    <camera name="front" pos="0 -2 0.5" euler="90 0 0" fovy="45"/>
  </worldbody>
</mujoco>
"""


def _setup(width=32, height=32):
  mjm, mjd, m, d = fixture(SCENE)
  d = mjwt.fwd_position(m, d)
  rc = render_mod.create_render_context(mjm, m, width, height)
  return mjm, m, d, rc


def test_depth_and_seg():
  mjm, m, d, rc = _setup()
  rgb, depth, seg = jax.jit(
      lambda dd: render_mod.render(m, dd, rc))(d)
  assert rgb.shape == (1, 32, 32, 3)
  # center pixel looks straight at the sphere: depth = 2 - 0.2 = 1.8
  cd = float(depth[0, 16, 16])
  assert abs(cd - 1.8) < 0.02, cd
  ball_id = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'ball')
  assert int(seg[0, 16, 16]) == ball_id
  # lower rows see the floor
  floor_id = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'floor')
  assert int(seg[0, 31, 16]) == floor_id
  # sphere pixels are red-dominant
  px = np.asarray(rgb[0, 16, 16])
  assert px[0] > px[1] and px[0] > px[2] and px[0] > 0.2


def test_render_batched():
  mjm, m, d, rc = _setup(16, 16)
  batch = jax.tree_util.tree_map(
      lambda x: jnp.broadcast_to(x, (3,) + x.shape), d)
  rgb, depth, seg = jax.jit(jax.vmap(
      lambda dd: render_mod.render(m, dd, rc)))(batch)
  assert rgb.shape == (3, 1, 16, 16, 3)
  assert not bool(jnp.any(jnp.isnan(rgb)))


def test_miss_is_background():
  mjm, m, d, rc = _setup()
  rgb, depth, seg = render_mod.render(m, d, rc)
  # top rows look above the horizon: plane is edge-on, sphere above
  assert int(seg[0, 0, 0]) == -1
  assert float(depth[0, 0, 0]) == -1.0


def test_shadow_darkens_floor():
  """A box under a directional light casts a visible shadow on the
  floor (reference render.py:472-512 shadow any-hit, 0.3 visibility)."""
  xml = """
  <mujoco>
    <worldbody>
      <light pos="0 0 5" dir="-0.6 0 -1" directional="true"
             castshadow="true"/>
      <geom name="floor" type="plane" size="5 5 1" rgba="0.8 0.8 0.8 1"/>
      <body pos="0 0 0.5"><freejoint/>
        <geom name="blocker" type="box" size="0.4 0.4 0.05" mass="1"/></body>
      <camera name="top" pos="0 0 4" fovy="70"/>
    </worldbody>
  </mujoco>
  """
  mjm, mjd, m, d = fixture(xml)
  d = mjwt.fwd_position(m, d)
  rc = render_mod.create_render_context(mjm, m, 48, 48)
  assert rc.use_shadows
  rgb, depth, seg = render_mod.render(m, d, rc)
  floor_id = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'floor')
  floor_px = np.asarray(seg[0]) == floor_id
  vals = np.asarray(rgb[0])[..., 0][floor_px]
  assert floor_px.sum() > 50
  # shadowed floor pixels are markedly darker than lit ones
  assert vals.min() < 0.55 * vals.max(), (vals.min(), vals.max())

  rc2 = render_mod.create_render_context(mjm, m, 48, 48,
                                         use_shadows=False)
  rgb2, _, _ = render_mod.render(m, d, rc2)
  vals2 = np.asarray(rgb2[0])[..., 0][floor_px]
  assert vals2.min() > 0.8 * vals2.max()  # no shadow without the flag


def test_plane_texture_checker():
  """Checker plane texture produces two distinct floor colors
  (reference render.py:65-84 sample_texture)."""
  xml = """
  <mujoco>
    <asset>
      <texture name="grid" type="2d" builtin="checker" rgb1="1 0 0"
               rgb2="0 0 1" width="32" height="32"/>
      <material name="gridmat" texture="grid" texrepeat="1 1"/>
    </asset>
    <worldbody>
      <light pos="0 0 5" dir="0 0 -1" directional="true"
             castshadow="false"/>
      <geom name="floor" type="plane" size="3 3 1" material="gridmat"/>
      <camera name="top" pos="0 0 4" fovy="60"/>
    </worldbody>
  </mujoco>
  """
  mjm, mjd, m, d = fixture(xml)
  d = mjwt.fwd_position(m, d)
  rc = render_mod.create_render_context(mjm, m, 48, 48)
  assert rc.use_textures
  rgb, _, seg = render_mod.render(m, d, rc)
  img = np.asarray(rgb[0])
  hit = np.asarray(seg[0]) >= 0
  red = (img[..., 0] > img[..., 2]) & hit
  blue = (img[..., 2] > img[..., 0]) & hit
  # both checker colors are visible in roughly comparable amounts
  assert red.sum() > 100 and blue.sum() > 100


def test_mesh_and_hfield_render():
  """Mesh and hfield geoms appear in depth/segmentation output."""
  hdata = ' '.join(['0.5'] * 25)
  xml = f"""
  <mujoco>
    <asset>
      <hfield name="hf" nrow="5" ncol="5" size="1 1 0.4 0.1"/>
      <mesh name="tet" vertex="0 0 0  0.3 0 0  0 0.3 0  0 0 0.3"/>
    </asset>
    <worldbody>
      <light pos="0 0 5" dir="0 0 -1" directional="true"/>
      <geom name="terrain" type="hfield" hfield="hf" contype="0"
            conaffinity="0"/>
      <body pos="0 0 1"><freejoint/>
        <geom name="blob" type="mesh" mesh="tet" mass="0.2" contype="0"
              conaffinity="0"/></body>
      <camera name="top" pos="0 0 3" fovy="70"/>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjm.hfield_data[:] = 0.5
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  d = mjwt.fwd_position(m, d)
  rc = render_mod.create_render_context(mjm, m, 32, 32)
  rgb, depth, seg = render_mod.render(m, d, rc)
  ids = set(np.unique(np.asarray(seg[0])))
  terrain = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'terrain')
  blob = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'blob')
  assert terrain in ids and blob in ids
  # hfield top surface at z = 0.5*0.4 = 0.2 -> depth from cam at z=3
  center = float(depth[0, 16, 16])
  assert abs(center - (3 - 0.2 - 1e-9)) < 0.35 or abs(center - 2.7) < 0.35


TWO_CAM_SCENE = """
<mujoco>
  <worldbody>
    <light pos="0 -3 3" dir="0 1 -1" directional="true"/>
    <geom name="floor" type="plane" size="5 5 1" rgba="0.5 0.5 0.5 1"/>
    <body pos="0 0 0.5">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.2" mass="1" rgba="1 0 0 1"/>
    </body>
    <camera name="front" pos="0 -2 0.5" euler="90 0 0" fovy="45"/>
    <camera name="side" pos="0 -3 0.5" euler="90 0 0" fovy="45"/>
  </worldbody>
</mujoco>
"""


def test_heterogeneous_camera_resolutions():
  """Per-camera resolutions in one packed ray batch (reference
  render.py:593-604 cumulative ray addressing)."""
  mjm, mjd, m, d = fixture(TWO_CAM_SCENE)
  d = mjwt.fwd_position(m, d)
  rc = render_mod.create_render_context(
      mjm, m, resolutions=[(32, 24), (16, 16)])
  rgbs, depths, segs = jax.jit(
      lambda dd: render_mod.render(m, dd, rc))(d)
  assert isinstance(rgbs, list) and len(rgbs) == 2
  assert rgbs[0].shape == (24, 32, 3)
  assert rgbs[1].shape == (16, 16, 3)
  assert depths[0].shape == (24, 32)
  assert segs[1].shape == (16, 16)
  ball = mujoco.mj_name2id(mjm, mujoco.mjtObj.mjOBJ_GEOM, 'ball')
  # both cameras look straight at the sphere from 2m: depth 1.8
  assert abs(float(depths[0][12, 16]) - 1.8) < 0.03
  assert abs(float(depths[1][8, 8]) - 2.8) < 0.06
  assert int(segs[0][12, 16]) == ball
  assert int(segs[1][8, 8]) == ball
  # packed-output parity vs a uniform-resolution render of camera 0
  rc_uni = render_mod.create_render_context(
      mjm, m, 32, 24, cam_ids=(0,))
  rgb_u, depth_u, seg_u = jax.jit(
      lambda dd: render_mod.render(m, dd, rc_uni))(d)
  np.testing.assert_allclose(np.asarray(rgbs[0]), np.asarray(rgb_u[0]),
                             rtol=1e-5, atol=1e-5)


def test_mesh_surface_texture():
  """A textured quad mesh (explicit texcoords): the rendered face must
  show the checker pattern varying ACROSS the face (mesh-surface
  texturing, reference render.py:44 sample_texture MESH branch), not
  the flat material color."""
  import jax
  import numpy as np
  xml = """
  <mujoco>
    <asset>
      <texture name="grid" type="2d" builtin="checker" rgb1="1 0 0"
               rgb2="0 0 1" width="64" height="64"/>
      <material name="mat" texture="grid" texrepeat="1 1"/>
      <mesh name="quad"
            vertex="-1 -1 0  1 -1 0  1 1 0  -1 1 0  0 0 -0.4"
            face="0 1 2  0 2 3  1 0 4  2 1 4  3 2 4  0 3 4"
            texcoord="0 0  1 0  1 1  0 1  0.5 0.5"/>
    </asset>
    <worldbody>
      <light pos="0 0 3" dir="0 0 -1" directional="true"/>
      <body pos="0 0 0">
        <geom type="mesh" mesh="quad" material="mat"/>
      </body>
      <camera name="top" pos="0 0 2.5" xyaxes="1 0 0 0 1 0"/>
    </worldbody>
  </mujoco>
  """
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import render as render_mod
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m)
  rc = render_mod.create_render_context(mjm, m, width=32, height=32)
  assert rc.mesh_has_uv[0], 'texcoords must be detected'
  from mujoco_warp_tpu import smooth
  rgb, depth, seg = jax.jit(lambda dd: render_mod.render(
      m, smooth.camlight(m, smooth.com_pos(m, smooth.kinematics(m, dd))),
      rc))(d)
  img = np.asarray(rgb)[0]
  hit = np.asarray(seg)[0] == 0
  assert hit.sum() > 200, 'quad must cover most of the view'
  # checker: red-dominant and blue-dominant texels both appear on the
  # mesh face
  r_dom = hit & (img[..., 0] > img[..., 2] * 2 + 0.05)
  b_dom = hit & (img[..., 2] > img[..., 0] * 2 + 0.05)
  assert r_dom.sum() > 30, (r_dom.sum(), img[16, :4])
  assert b_dom.sum() > 30, (b_dom.sum(),)


def test_flex_rendering():
  """Flex surfaces render: a cloth above the floor appears in rgb/seg
  with id ngeom + flexid and its flex_rgba color (reference
  bvh.py:608-1095 flex rendering; flat face normals here)."""
  import jax
  import numpy as np
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import render as render_mod, smooth
  from mujoco_warp_tpu import flex as flex_mod
  xml = """
  <mujoco>
    <option timestep="0.002" jacobian="dense" solver="CG"/>
    <worldbody>
      <light pos="0 0 3" dir="0 0 -1" directional="true"/>
      <flexcomp name="towel" type="grid" count="5 5 1"
                spacing="0.06 0.06 0.06" radius="0.01" dim="2"
                pos="0 0 0.6" mass="0.1" rgba="0.9 0.2 0.1 1">
        <edge equality="true"/>
        <elasticity young="2e3" poisson="0" thickness="1e-2"
                    damping="2e-3" elastic2d="bend"/>
        <contact contype="0" conaffinity="0"/>
      </flexcomp>
      <camera name="top" pos="0 0 1.6" xyaxes="1 0 0 0 1 0"/>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m)
  rc = render_mod.create_render_context(mjm, m, width=32, height=32)

  def scene(dd):
    dd = smooth.camlight(m, smooth.com_pos(m, smooth.kinematics(m, dd)))
    dd = flex_mod.kinematics(m, dd)
    return render_mod.render(m, dd, rc)
  rgb, depth, seg = jax.jit(scene)(d)
  seg = np.asarray(seg)[0]
  img = np.asarray(rgb)[0]
  flex_px = seg == m.ngeom  # flex 0
  assert flex_px.sum() > 50, (np.unique(seg), flex_px.sum())
  # flex rgba is red-dominant
  assert (img[flex_px][:, 0] > img[flex_px][:, 2]).mean() > 0.9
