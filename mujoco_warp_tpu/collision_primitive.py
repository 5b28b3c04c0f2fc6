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
    (GeomType.PLANE, GeomType.ELLIPSOID): 1,
    (GeomType.PLANE, GeomType.CYLINDER): 4,
    (GeomType.PLANE, GeomType.BOX): 4,
    (GeomType.SPHERE, GeomType.SPHERE): 1,
    (GeomType.SPHERE, GeomType.CAPSULE): 1,
    (GeomType.SPHERE, GeomType.CYLINDER): 1,
    (GeomType.SPHERE, GeomType.BOX): 1,
    (GeomType.CAPSULE, GeomType.CAPSULE): 1,
    (GeomType.CAPSULE, GeomType.BOX): 2,
    (GeomType.BOX, GeomType.BOX): 8,
    (GeomType.PLANE, GeomType.MESH): 4,
}

# colliders whose candidate acceptance needs the margin value
NEEDS_MARGIN: set[tuple[int, int]] = {(GeomType.BOX, GeomType.BOX)}


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


def plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  """Plane vs ellipsoid: support point in -n direction
  (reference collision_primitive_core.py plane_ellipsoid)."""
  n = m1[:, 2]
  dl = m2.T @ (-n)                       # plane normal in ellipsoid frame
  sd = s2 * dl
  denom = math.norm(sd)
  x_loc = (s2 * sd) / jnp.where(denom < 1e-12, 1.0, denom)
  support = p2 + m2 @ x_loc
  dist = jnp.dot(support - p1, n)
  pos = support - 0.5 * dist * n
  return dist[None], pos[None], math.make_frame(n)[None]


def plane_cylinder(p1, m1, s1, p2, m2, s2):
  """Plane vs cylinder, 4 candidates: deepest rim point on each end cap
  (covers tilted + side-lying) plus two near-cap rim points at +-120 deg
  (activate only when the cap face is nearly parallel, completing the
  3-point manifold the C collider produces)."""
  n = m1[:, 2]
  axis = m2[:, 2]
  r, h = s2[0], s2[1]
  ca = jnp.dot(n, axis)
  # radial direction of steepest descent on the plane normal
  perp = n - ca * axis
  pnorm = math.norm(perp)
  # degenerate (axis || n): any radial direction; use cylinder x-axis
  rd = jnp.where(pnorm < 1e-8, m2[:, 0], perp / jnp.where(
      pnorm < 1e-8, 1.0, pnorm))
  sgn = jnp.where(ca >= 0, 1.0, -1.0).astype(p1.dtype)
  cap_near = p2 - sgn * h * axis
  cap_far = p2 + sgn * h * axis
  # +-120deg rotations of rd about the cylinder axis
  rd2 = math.rot_vec_quat(rd, math.axis_angle_to_quat(
      axis, jnp.full((), 2.0 * jnp.pi / 3.0, p1.dtype)))
  rd3 = math.rot_vec_quat(rd, math.axis_angle_to_quat(
      axis, jnp.full((), -2.0 * jnp.pi / 3.0, p1.dtype)))
  pts = jnp.stack([cap_near - r * rd, cap_far - r * rd,
                   cap_near - r * rd2, cap_near - r * rd3])
  dist = (pts - p1[None, :]) @ n
  pos = pts - 0.5 * dist[:, None] * n[None, :]
  frame = jnp.broadcast_to(math.make_frame(n), (4, 3, 3))
  return dist, pos, frame


def plane_box(p1, m1, s1, p2, m2, s2):
  """Plane vs box: the 4 deepest corners (C mjc_PlaneBox manifold)."""
  n = m1[:, 2]
  signs = jnp.array([[sx, sy, sz] for sx in (-1., 1.) for sy in (-1., 1.)
                     for sz in (-1., 1.)], dtype=p1.dtype)   # (8, 3)
  corners = p2[None, :] + (signs * s2[None, :3]) @ m2.T       # (8, 3)
  dist8 = (corners - p1[None, :]) @ n
  _, idx = jax.lax.top_k(-dist8, 4)
  dist = dist8[idx]
  pts = corners[idx]
  pos = pts - 0.5 * dist[:, None] * n[None, :]
  frame = jnp.broadcast_to(math.make_frame(n), (4, 3, 3))
  return dist, pos, frame


def _point_box(c, half):
  """Closest point on a box (local frame, half-sizes `half`) to point c,
  and outward normal; handles interior points via deepest-face pushout.
  Returns (closest, normal_from_box_to_c, signed_dist_from_surface)."""
  clamped = jnp.clip(c, -half, half)
  inside = jnp.all(jnp.abs(c) < half)
  # outside: vector from surface point to c
  dvec = c - clamped
  dn = math.norm(dvec)
  n_out = dvec / jnp.where(dn < 1e-12, 1.0, dn)
  # inside: push out along the face with minimum clearance
  clearance = half - jnp.abs(c)
  ax = jnp.argmin(clearance)
  sign = jnp.where(c[ax] >= 0, 1.0, -1.0).astype(c.dtype)
  n_in = jnp.zeros(3, c.dtype).at[ax].set(sign)
  surf_in = c.at[ax].set(sign * half[ax])
  closest = jnp.where(inside, surf_in, clamped)
  normal = jnp.where(inside, n_in, n_out)
  sdist = jnp.where(inside, -clearance[ax], dn)
  return closest, normal, sdist


def sphere_box(p1, m1, s1, p2, m2, s2):
  c = m2.T @ (p1 - p2)
  closest, normal, sdist = _point_box(c, s2[:3])
  dist = sdist - s1[0]
  n_world = m2 @ normal  # from box surface toward sphere center
  # midpoint between box surface and deepest sphere point
  pos = p2 + m2 @ closest + 0.5 * dist * n_world
  return dist[None], pos[None], math.make_frame(-n_world)[None]


def sphere_cylinder(p1, m1, s1, p2, m2, s2):
  """Sphere vs cylinder: closest point on the (solid) cylinder to the
  sphere center, branch-free over side/cap/edge/interior cases."""
  c = m2.T @ (p1 - p2)
  r, h = s2[0], s2[1]
  rho = jnp.sqrt(c[0] * c[0] + c[1] * c[1])
  rsafe = jnp.where(rho < 1e-12, 1.0, rho)
  raddir = jnp.stack([c[0] / rsafe, c[1] / rsafe, jnp.zeros((), c.dtype)])
  raddir = jnp.where(rho < 1e-12, jnp.array([1.0, 0, 0], c.dtype), raddir)
  # exterior closest point: clamp radially and axially
  ext = raddir * jnp.minimum(rho, r)
  ext = ext.at[2].set(jnp.clip(c[2], -h, h))
  inside = (rho < r) & (jnp.abs(c[2]) < h)
  # interior: push to nearest of side wall vs near cap
  side_clear = r - rho
  cap_clear = h - jnp.abs(c[2])
  zsign = jnp.where(c[2] >= 0, 1.0, -1.0).astype(c.dtype)
  side_pt = raddir * r + jnp.array([0., 0., 1.], c.dtype) * c[2]
  cap_pt = c.at[2].set(zsign * h)
  int_pt = jnp.where(side_clear < cap_clear, side_pt, cap_pt)
  int_n = jnp.where(side_clear < cap_clear, raddir,
                    jnp.array([0., 0., 1.], c.dtype) * zsign)
  closest = jnp.where(inside, int_pt, ext)
  dvec = c - closest
  dn = math.norm(dvec)
  n_loc = jnp.where(inside, -int_n, -dvec / jnp.where(dn < 1e-12, 1., dn))
  sdist = jnp.where(inside, -jnp.minimum(side_clear, cap_clear), dn)
  dist = sdist - s1[0]
  n_world = m2 @ n_loc  # from sphere toward cylinder
  pos = p2 + m2 @ closest - 0.5 * dist * n_world
  return dist[None], pos[None], math.make_frame(n_world)[None]


def capsule_box(p1, m1, s1, p2, m2, s2):
  """Capsule vs box: 2 candidates, the minimum of the signed
  segment-point-to-box distance over each segment half (sampled argmin +
  ternary refinement — branch-free, robust in penetration where
  alternating projection is not). Gives a 2-point manifold when the
  capsule lies on a face, one deep point for end/edge contact
  (C mjc_CapsuleBox manifold)."""
  half = s2[:3]
  a_loc = m2.T @ (p1 + m1[:, 2] * s1[1] - p2)
  b_loc = m2.T @ (p1 - m1[:, 2] * s1[1] - p2)
  seg = b_loc - a_loc

  def sdist_at(t):
    _, _, sd = _point_box(a_loc + t * seg, half)
    return sd

  # sample the segment; the two candidates are the FIRST and LAST t
  # attaining (approximately) the minimum — for face-lying capsules the
  # minimum is a flat interval and its endpoints form the manifold
  # exact power-of-two grid (bitwise-identical to the Pallas
  # contact kernel's iota-derived grid)
  ts = jnp.arange(33, dtype=p1.dtype) * (1.0 / 32.0)
  sds = jax.vmap(sdist_at)(ts)
  sdmin = jnp.min(sds)
  tol = 1e-4 * (1.0 + jnp.abs(sdmin))
  at_min = sds <= sdmin + tol
  t_first = jnp.min(jnp.where(at_min, ts, 2.0))
  t_last = jnp.max(jnp.where(at_min, ts, -1.0))

  def local_refine(t0):
    # shrinking-window argmin with a tie-break toward the current point,
    # so flat (face-contact) regions don't drift inward
    t = t0
    delta = jnp.full((), 1.0 / 32.0, p1.dtype)
    offs = (jnp.arange(9, dtype=p1.dtype) - 4.0) * 0.25
    for _ in range(5):
      cand = jnp.clip(t + offs * delta, 0.0, 1.0)
      vals = jax.vmap(sdist_at)(cand) + 1e-6 * jnp.abs(cand - t)
      t = cand[jnp.argmin(vals)]
      delta = delta * 0.25
    return t

  dists, poss, frames = [], [], []
  for t in (local_refine(t_first), local_refine(t_last)):
    pt = a_loc + t * seg
    cp, normal, sdist = _point_box(pt, half)
    dist = sdist - s1[0]
    n_world = m2 @ normal  # from box surface toward capsule axis
    pos = p2 + m2 @ cp + 0.5 * dist * n_world
    dists.append(dist)
    poss.append(pos)
    frames.append(math.make_frame(-n_world))
  return jnp.stack(dists), jnp.stack(poss), jnp.stack(frames)


def plane_mesh(p1, m1, s1, p2, m2, s2, v1, v2):
  """Plane vs convex mesh hull: the 4 deepest hull vertices
  (reference's plane-convex path, collision_primitive.py)."""
  n = m1[:, 2]
  world = p2[None, :] + v2[:, :3] @ m2.T          # (V, 3)
  dists = (world - p1[None, :]) @ n
  dists = jnp.where(v2[:, 3] > 0, dists, 1e10)
  _, idx = jax.lax.top_k(-dists, 4)
  dist = dists[idx]
  pts = world[idx]
  pos = pts - 0.5 * dist[:, None] * n[None, :]
  frame = jnp.broadcast_to(math.make_frame(n), (4, 3, 3))
  return dist, pos, frame


def _box_box_entry(p1, m1, s1, p2, m2, s2, margin=0.0):
  """SAT multi-contact manifold (collision_box.box_box; C mjc_BoxBox;
  reference collision_primitive_core.py:648)."""
  from . import collision_box
  return collision_box.box_box(p1, m1, s1, p2, m2, s2, margin)


COLLIDERS = {
    (GeomType.PLANE, GeomType.SPHERE): plane_sphere,
    (GeomType.PLANE, GeomType.CAPSULE): plane_capsule,
    (GeomType.PLANE, GeomType.ELLIPSOID): plane_ellipsoid,
    (GeomType.PLANE, GeomType.CYLINDER): plane_cylinder,
    (GeomType.PLANE, GeomType.BOX): plane_box,
    (GeomType.SPHERE, GeomType.SPHERE): sphere_sphere,
    (GeomType.SPHERE, GeomType.CAPSULE): sphere_capsule,
    (GeomType.SPHERE, GeomType.CYLINDER): sphere_cylinder,
    (GeomType.SPHERE, GeomType.BOX): sphere_box,
    (GeomType.CAPSULE, GeomType.CAPSULE): capsule_capsule,
    (GeomType.CAPSULE, GeomType.BOX): capsule_box,
    (GeomType.BOX, GeomType.BOX): _box_box_entry,
    (GeomType.PLANE, GeomType.MESH): plane_mesh,
}
