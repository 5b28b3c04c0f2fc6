"""Analytic primitive narrowphase colliders.

Each collider is a pure function of raw geometry
``(pos1, mat1, size1, pos2, mat2, size2) -> (dist[K], pos[K,3],
frame[K,3,3])`` returning a FIXED number K of candidate contacts
(inactive candidates have dist > margin and are masked downstream).
The driver ``vmap``s each collider over all same-type pairs at once, so
a type-pair group costs ONE set of traced ops regardless of pair count —
the XLA analogue of the reference baking the present pair types into one
specialized kernel (mujoco_warp/_src/collision_primitive.py:1300-1490).

Fixed candidate counts replace the reference's atomic contact-pool
appends (collision_core.py:160) with static shapes + compaction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math
from .types import GeomType

# max candidate contacts per geom-type pair (keys sorted by type value)
MAX_CONTACTS: dict[tuple[int, int], int] = {
    (GeomType.PLANE, GeomType.SPHERE): 1,
    (GeomType.PLANE, GeomType.CAPSULE): 2,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
}


def _sphere_like(p1, n_raw, r1, r2, ref):
  """Shared tail for sphere-vs-point colliders: normal, dist, midpoint."""
  cdist = math.norm(n_raw)
  n = n_raw / jnp.where(cdist < 1e-12, 1.0, cdist)
  n = jnp.where(cdist < 1e-12, jnp.array([1.0, 0.0, 0.0], p1.dtype), n)
  dist = cdist - (r1 + r2)
  pos = ref + n * (r1 + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


def plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  cdist = jnp.dot(p2 - p1, n)
  dist = cdist - s2[0]
  pos = p2 - n * (s2[0] + 0.5 * dist)
  return dist[None], pos[None], math.make_frame(n)[None]


def plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  ends = jnp.stack([p2 + axis * s2[1], p2 - axis * s2[1]])
  cdist = (ends - p1[None, :]) @ n
  dist = cdist - s2[0]
  pos = ends - n[None, :] * (s2[0] + 0.5 * dist)[:, None]
  frame = jnp.broadcast_to(math.make_frame(n), (2, 3, 3))
  return dist, pos, frame


def sphere_sphere(p1, m1, s1, p2, m2, s2):
  return _sphere_like(p1, p2 - p1, s1[0], s2[0], p1)


def sphere_capsule(p1, m1, s1, p2, m2, s2):
  seg = m2[:, 2] * s2[1]
  pt = math.closest_segment_point(p2 - seg, p2 + seg, p1)
  return _sphere_like(p1, pt - p1, s1[0], s2[0], p1)


def capsule_capsule(p1, m1, s1, p2, m2, s2):
  seg1 = m1[:, 2] * s1[1]
  seg2 = m2[:, 2] * s2[1]
  pa, pb = math.closest_segment_segment(p1 - seg1, p1 + seg1,
                                        p2 - seg2, p2 + seg2)
  return _sphere_like(p1, pb - pa, s1[0], s2[0], pa)


COLLIDERS = {
    (GeomType.PLANE, GeomType.SPHERE): plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): plane_capsule,
    (GeomType.SPHERE, GeomType.SPHERE): sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): sphere_capsule,
    (GeomType.CAPSULE, GeomType.CAPSULE): capsule_capsule,
}
