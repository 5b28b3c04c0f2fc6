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
