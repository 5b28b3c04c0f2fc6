"""Mesh-cluster ray acceleration (bvh.py) vs the dense sweep and the C
mj_ray oracle."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import bvh, ray as ray_mod

from fixtures import fixture


def _blob_xml(nlat=16, nlon=24, seed=3):
  """UV-sphere with explicit faces (~2*nlat*nlon triangles) and radial
  noise — enough faces for a multi-cluster structure."""
  rng = np.random.RandomState(seed)
  verts = [(0.0, 0.0, 0.1), (0.0, 0.0, -0.1)]
  for i in range(1, nlat):
    th = np.pi * i / nlat
    for j in range(nlon):
      ph = 2 * np.pi * j / nlon
      r = 0.1 * (1.0 + 0.15 * rng.rand())
      verts.append((r * np.sin(th) * np.cos(ph),
                    r * np.sin(th) * np.sin(ph), r * np.cos(th)))
  idx = lambda i, j: 2 + (i - 1) * nlon + (j % nlon)
  faces = []
  for j in range(nlon):                      # polar caps
    faces.append((0, idx(1, j), idx(1, j + 1)))
    faces.append((1, idx(nlat - 1, j + 1), idx(nlat - 1, j)))
  for i in range(1, nlat - 1):               # quad strips
    for j in range(nlon):
      a, b = idx(i, j), idx(i, j + 1)
      c, e = idx(i + 1, j), idx(i + 1, j + 1)
      faces.append((a, b, e))
      faces.append((a, e, c))
  vflat = ' '.join(f'{x:.5f}' for v in verts for x in v)
  fflat = ' '.join(str(k) for f in faces for k in f)
  return f"""
  <mujoco>
    <asset><mesh name="blob" vertex="{vflat}" face="{fflat}"/></asset>
    <worldbody>
      <body pos="0.02 -0.01 0.3" euler="20 35 10">
        <freejoint/><geom type="mesh" mesh="blob" mass="1"/>
      </body>
    </worldbody>
  </mujoco>
  """


def test_clustered_matches_dense_and_oracle():
  mjm, mjd, m, d = fixture(_blob_xml())
  assert m.mesh_cluster_aabb.shape[1] > 4, 'mesh too small for the test'
  d = mjwt.fwd_position(m, d)

  rng = np.random.RandomState(0)
  npnt = 64
  pnts = np.array([0.0, 0.0, 0.3]) + 0.5 * rng.randn(npnt, 3)
  dirs = np.array([0.02, -0.01, 0.3]) - pnts + 0.05 * rng.randn(npnt, 3)
  dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

  did = m.geom_dataid[0]
  fast = jax.jit(jax.vmap(lambda p, v: bvh.ray_mesh_clustered(
      m.mesh_faces[did], m.mesh_cluster_aabb[did],
      d.geom_xpos[0], d.geom_xmat[0], p, v)))
  dense = jax.jit(jax.vmap(lambda p, v: ray_mod.ray_mesh(
      m.mesh_faces[did], d.geom_xpos[0], d.geom_xmat[0], p, v)))
  tf = np.asarray(fast(jnp.asarray(pnts, jnp.float32),
                       jnp.asarray(dirs, jnp.float32)))
  td = np.asarray(dense(jnp.asarray(pnts, jnp.float32),
                        jnp.asarray(dirs, jnp.float32)))
  # exactness: the cluster march must agree with the full sweep
  np.testing.assert_allclose(tf, td, atol=1e-6, err_msg='fast vs dense')

  # oracle spot-check on the hitting subset
  geomid = np.zeros(1, np.int32)
  nhit = 0
  for i in range(npnt):
    t_ref = mujoco.mj_ray(mjm, mjd, pnts[i], dirs[i], None, 1, -1, geomid)
    if t_ref > 0 and tf[i] < 1e9:
      np.testing.assert_allclose(tf[i], t_ref, rtol=1e-3, atol=1e-4)
      nhit += 1
    else:
      assert (t_ref < 0) == (tf[i] >= 1e9), (i, t_ref, tf[i])
  assert nhit > 10, f'only {nhit} rays hit — test too weak'


def test_cluster_build_covers_all_faces():
  """Every input face lands in exactly one cluster slot; AABBs bound
  their cluster's vertices."""
  rng = np.random.RandomState(1)
  f = rng.rand(150, 3, 3).astype(np.float32)
  cmax = (150 + bvh.CLUSTER - 1) // bvh.CLUSTER
  out, aabb = bvh.build_clusters(f, cmax + 2)   # extra padding clusters
  # multiset of faces preserved (compare sorted flat values)
  np.testing.assert_allclose(
      np.sort(out.reshape(-1, 9).sum(axis=1))[-150:],
      np.sort(f.reshape(-1, 9).sum(axis=1)), rtol=1e-6)
  for c in range(cmax):
    blk = out[c * bvh.CLUSTER:(c + 1) * bvh.CLUSTER].reshape(-1, 3)
    nz = np.abs(blk).sum(axis=1) > 0
    if nz.any():
      assert (blk[nz] >= aabb[c, 0] - 1e-6).all()
      assert (blk[nz] <= aabb[c, 1] + 1e-6).all()
  # padding clusters must miss everything (inverted AABB)
  assert (aabb[cmax + 1, 0] > aabb[cmax + 1, 1]).all()
