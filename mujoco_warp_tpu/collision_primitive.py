"""Analytic primitive narrowphase colliders.

Each collider is a pure function
``(m, d, g1, g2) -> (dist[K], pos[K,3], frame[K,3,3])`` returning a FIXED
number K of candidate contacts (inactive candidates have dist > margin and
are masked out downstream). Fixed candidate counts replace the reference's
atomic contact-pool appends (mujoco_warp/_src/collision_core.py:160) with
static shapes + compaction, which is the XLA-native formulation.

Reference equivalents: mujoco_warp/_src/collision_primitive.py and
collision_primitive_core.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math
from .types import Data, GeomType, Model

# max candidate contacts per geom-type pair (keys sorted by type value)
MAX_CONTACTS: dict[tuple[int, int], int] = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
}


def _geom(m: Model, d: Data, g: int):
  """Collect a geom's world pose and size (static geom id)."""
  return d.geom_xpos[g], d.geom_xmat[g], m.geom_size[g]


def plane_sphere(m: Model, d: Data, g1: int, g2: int):
  ppos, pmat, _ = _geom(m, d, g1)
  spos, _, ssize = _geom(m, d, g2)
  n = pmat[:, 2]
  cdist = jnp.dot(spos - ppos, n)
  dist = cdist - ssize[0]
  pos = spos - n * (ssize[0] + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


def plane_capsule(m: Model, d: Data, g1: int, g2: int):
  ppos, pmat, _ = _geom(m, d, g1)
  cpos, cmat, csize = _geom(m, d, g2)
  n = pmat[:, 2]
  axis = cmat[:, 2]
  # both capsule ends against the plane
  ends = jnp.stack([cpos + axis * csize[1], cpos - axis * csize[1]])
  cdist = (ends - ppos[None, :]) @ n
  dist = cdist - csize[0]
  pos = ends - n[None, :] * (csize[0] + 0.5 * dist)[:, None]
  frame = jnp.broadcast_to(math.make_frame(n), (2, 3, 3))
  return dist, pos, frame


def sphere_sphere(m: Model, d: Data, g1: int, g2: int):
  p1, _, s1 = _geom(m, d, g1)
  p2, _, s2 = _geom(m, d, g2)
  delta = p2 - p1
  cdist = math.norm(delta)
  n = delta / jnp.where(cdist < 1e-12, 1.0, cdist)
  n = jnp.where(cdist < 1e-12, jnp.array([1.0, 0.0, 0.0], p1.dtype), n)
  dist = cdist - (s1[0] + s2[0])
  pos = p1 + n * (s1[0] + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


def sphere_capsule(m: Model, d: Data, g1: int, g2: int):
  p1, _, s1 = _geom(m, d, g1)
  p2, cmat, s2 = _geom(m, d, g2)
  axis = cmat[:, 2]
  seg = axis * s2[1]
  pt = math.closest_segment_point(p2 - seg, p2 + seg, p1)
  delta = pt - p1
  cdist = math.norm(delta)
  n = delta / jnp.where(cdist < 1e-12, 1.0, cdist)
  n = jnp.where(cdist < 1e-12, jnp.array([1.0, 0.0, 0.0], p1.dtype), n)
  dist = cdist - (s1[0] + s2[0])
  pos = p1 + n * (s1[0] + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


def capsule_capsule(m: Model, d: Data, g1: int, g2: int):
  p1, m1, s1 = _geom(m, d, g1)
  p2, m2, s2 = _geom(m, d, g2)
  seg1 = m1[:, 2] * s1[1]
  seg2 = m2[:, 2] * s2[1]
  pa, pb = math.closest_segment_segment(p1 - seg1, p1 + seg1,
                                        p2 - seg2, p2 + seg2)
  delta = pb - pa
  cdist = math.norm(delta)
  n = delta / jnp.where(cdist < 1e-12, 1.0, cdist)
  n = jnp.where(cdist < 1e-12, jnp.array([1.0, 0.0, 0.0], p1.dtype), n)
  dist = cdist - (s1[0] + s2[0])
  pos = pa + n * (s1[0] + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


COLLIDERS = {
    (GeomType.PLANE, GeomType.SPHERE): plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): plane_capsule,
    (GeomType.SPHERE, GeomType.SPHERE): sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): sphere_capsule,
    (GeomType.CAPSULE, GeomType.CAPSULE): capsule_capsule,
}
