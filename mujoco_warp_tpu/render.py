"""Batch raytracing renderer (reference: mujoco_warp/_src/render.py —
megakernel raytracer at 516; render_util.py buffers).

TPU-native formulation: rays for all (camera, pixel) pairs are one
vectorized closest-hit sweep over all geoms (the reference's `_ray`
world-parallel kernel pattern, ray.py:909) — no BVH; scenes in the
benchmark class have tens of geoms, so brute force vectorizes cleanly
on the VPU. Shading is a headlight Blinn-ish diffuse using analytic
surface normals per geom type; outputs float RGB [0,1], depth along the
ray, and int32 geom segmentation per pixel.

`vmap` over worlds renders every world's cameras in one program.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import math
from . import ray as ray_mod
from .types import Data, GeomType, Model, _pytree


@_pytree(meta=('width', 'height', 'cam_ids'))
class RenderContext:
  """Static camera setup + geom colors (reference types.py:1899)."""
  width: int
  height: int
  cam_ids: Tuple[int, ...]
  geom_rgba: jax.Array       # (ngeom, 4)
  fovy: jax.Array            # (ncam_sel,) degrees


def create_render_context(mjm, m: Model, width: int = 64,
                          height: int = 64, cam_ids=None) -> RenderContext:
  """Build a RenderContext (reference io.py:2649)."""
  if cam_ids is None:
    cam_ids = tuple(range(m.ncam))
  fovy = np.asarray([mjm.cam_fovy[c] for c in cam_ids], np.float32)
  return RenderContext(
      width=width, height=height, cam_ids=tuple(int(c) for c in cam_ids),
      geom_rgba=jnp.asarray(mjm.geom_rgba, jnp.float32),
      fovy=jnp.asarray(fovy))


def _normal_at(m: Model, d: Data, g: int, hit: jax.Array) -> jax.Array:
  """Outward surface normal of geom g at world point `hit` (analytic)."""
  gtype = GeomType(m.geom_type[g])
  p = d.geom_xpos[g]
  R = d.geom_xmat[g]
  s = m.geom_size[g]
  loc = R.T @ (hit - p)
  if gtype == GeomType.PLANE:
    return R[:, 2]
  if gtype == GeomType.SPHERE:
    return math.normalize(hit - p)
  if gtype == GeomType.CAPSULE:
    z = jnp.clip(loc[2], -s[1], s[1])
    return math.normalize(hit - (p + R[:, 2] * z))
  if gtype == GeomType.CYLINDER:
    side = math.normalize(
        R @ jnp.array([1.0, 1.0, 0.0], loc.dtype) * 0 +
        R @ jnp.concatenate([math.normalize(loc[:2]), jnp.zeros(1,
                                                                loc.dtype)]))
    cap = R[:, 2] * jnp.sign(loc[2])
    on_cap = jnp.abs(loc[2]) > s[1] - 1e-5
    return jnp.where(on_cap, cap, side)
  if gtype == GeomType.ELLIPSOID:
    n_loc = math.normalize(loc / jnp.maximum(s * s, 1e-12))
    return math.normalize(R @ n_loc)
  if gtype == GeomType.BOX:
    q = jnp.abs(loc) - s[:3]
    ax = jnp.argmax(q)
    n_loc = jnp.zeros(3, loc.dtype).at[ax].set(jnp.sign(loc[ax]))
    return R @ n_loc
  return math.normalize(hit - p)


def render(m: Model, d: Data, rc: RenderContext):
  """Render all context cameras for one world: returns
  (rgb (ncam, H, W, 3), depth (ncam, H, W), seg (ncam, H, W) int32)
  (reference render.py:516)."""
  H, W = rc.height, rc.width
  ncam = len(rc.cam_ids)
  dtype = d.qpos.dtype

  # pixel ray directions in camera frame: looking along -z, y up
  ys = (jnp.arange(H, dtype=dtype) + 0.5) / H - 0.5
  xs = (jnp.arange(W, dtype=dtype) + 0.5) / W - 0.5
  aspect = W / H

  rgbs, depths, segs = [], [], []
  for ci, cam in enumerate(rc.cam_ids):
    fovy = rc.fovy[ci] * jnp.pi / 180.0
    tan_y = jnp.tan(0.5 * fovy)
    dir_cam = jnp.stack(jnp.broadcast_arrays(
        xs[None, :] * 2.0 * tan_y * aspect,
        -ys[:, None] * 2.0 * tan_y,
        -jnp.ones((H, W), dtype)), axis=-1)            # (H, W, 3)
    Rc = d.cam_xmat[cam]
    pc = d.cam_xpos[cam]
    dirs = dir_cam.reshape(-1, 3) @ Rc.T               # (H*W, 3) world
    dirs = jax.vmap(math.normalize)(dirs)

    # closest hit over geoms (static unroll over geom ids)
    ts = []
    gids = []
    for g in range(m.ngeom):
      if GeomType(m.geom_type[g]) not in ray_mod.RAY_FN:
        continue
      fn = ray_mod.RAY_FN[GeomType(m.geom_type[g])]
      t_g = jax.vmap(lambda v, g=g, fn=fn: fn(
          d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g], pc, v))(dirs)
      ts.append(t_g)
      gids.append(g)
    if not ts:
      rgbs.append(jnp.zeros((H, W, 3), dtype))
      depths.append(jnp.full((H, W), -1.0, dtype))
      segs.append(jnp.full((H, W), -1, jnp.int32))
      continue
    tstack = jnp.stack(ts)                             # (G, H*W)
    gidx = jnp.argmin(tstack, axis=0)                  # (H*W,)
    tmin = jnp.take_along_axis(tstack, gidx[None], axis=0)[0]
    hit_mask = tmin < 1e9
    gid_arr = jnp.asarray(np.array(gids, np.int32))[gidx]

    hits = pc[None, :] + tmin[:, None] * dirs
    # normals: compute per present geom, select by hit id
    normals = jnp.zeros_like(hits)
    for k, g in enumerate(gids):
      n_g = jax.vmap(lambda h, g=g: _normal_at(m, d, g, h))(hits)
      normals = jnp.where((gidx == k)[:, None], n_g, normals)
    # headlight diffuse + ambient
    ndotl = jnp.abs(jnp.sum(normals * (-dirs), axis=-1))
    shade = 0.35 + 0.65 * ndotl
    base = rc.geom_rgba[gid_arr, :3]
    rgb = base * shade[:, None]
    rgb = jnp.where(hit_mask[:, None], rgb, 0.0)

    rgbs.append(rgb.reshape(H, W, 3))
    depths.append(jnp.where(hit_mask, tmin, -1.0).reshape(H, W))
    segs.append(jnp.where(hit_mask, gid_arr, -1).reshape(H, W))

  return (jnp.stack(rgbs), jnp.stack(depths),
          jnp.stack(segs).astype(jnp.int32))


def get_rgb(rgb: jax.Array) -> np.ndarray:
  """Float RGB -> uint8 (reference render_util.py:177)."""
  return np.asarray(jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8))


def get_depth(depth: jax.Array) -> np.ndarray:
  return np.asarray(depth)


def get_segmentation(seg: jax.Array) -> np.ndarray:
  return np.asarray(seg)


del dataclasses
