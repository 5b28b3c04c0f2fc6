"""Tendon wrap geometry: geodesic wrapping of a tendon path segment
around sphere / (infinite) cylinder obstacles.

Branch-free reformulation of the reference's scalar wrap routines
(mujoco_warp/_src/util_misc.py:104-327 — wrap_circle / wrap_inside /
wrap): every case (no wrap, wrap, forced side) is computed and selected
with masks, so the functions vectorize under vmap over worlds.

Convention matches C MuJoCo mju_wrap: returns (wlen, w0, w1) where wlen
is the arc length on the obstacle surface (< 0 means "no wrap" and the
path is the straight segment), w0/w1 the surface entry/exit points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math

_EPS = 1e-9


def _tangent_points(p: jax.Array, r):
  """2D: both tangent-touch points on circle (origin, r) from outside
  point p. Returns (t_plus, t_minus), each (2,)."""
  d2 = jnp.dot(p, p)
  d = jnp.sqrt(jnp.maximum(d2, _EPS))
  base = jnp.arctan2(p[1], p[0])
  dang = jnp.arccos(jnp.clip(r / d, -1.0, 1.0))
  a_plus = base + dang
  a_minus = base - dang
  tp = r * jnp.stack([jnp.cos(a_plus), jnp.sin(a_plus)])
  tm = r * jnp.stack([jnp.cos(a_minus), jnp.sin(a_minus)])
  return tp, tm


def wrap_circle_2d(a: jax.Array, b: jax.Array, r, side_sign):
  """Geodesic wrap of the 2D segment a->b around circle (origin, r).

  side_sign: +1 / -1 forces the wrap side (sign of the cross product of
  the touch points); 0 picks the shorter arc. Returns (wlen, w0, w1);
  wlen < 0 iff the straight segment clears the circle (no wrap).
  """
  dtype = a.dtype
  # touch-point candidates from each endpoint
  ap, am = _tangent_points(a, r)
  bp, bm = _tangent_points(b, r)
  # consistent-side pairing: path a -> am -> arc -> bp (one orientation)
  # or a -> ap -> arc -> bm (other orientation)
  def arc_len(t0, t1):
    a0 = jnp.arctan2(t0[1], t0[0])
    a1 = jnp.arctan2(t1[1], t1[0])
    da = a1 - a0
    da = jnp.mod(da + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return jnp.abs(da) * r, da

  len1, da1 = arc_len(am, bp)   # counterclockwise side
  len2, da2 = arc_len(ap, bm)   # clockwise side
  # choose side: forced by side_sign, else shorter arc
  use1_free = len1 <= len2
  use1 = jnp.where(side_sign == 0, use1_free, side_sign > 0)
  w0 = jnp.where(use1, am, ap)
  w1 = jnp.where(use1, bp, bm)
  wlen = jnp.where(use1, len1, len2)

  # no-wrap test: segment a-b clears the circle
  ab = b - a
  denom = jnp.maximum(jnp.dot(ab, ab), _EPS)
  t = jnp.clip(-jnp.dot(a, ab) / denom, 0.0, 1.0)
  closest = a + t * ab
  clears = jnp.dot(closest, closest) >= r * r
  # wrap is also invalid when the geodesic "arc" actually bends away
  # (touch points ordered so the arc is on the segment side); MuJoCo
  # detects this by the arc angle exceeding pi
  da = jnp.where(use1, da1, da2)
  valid = ~clears & (jnp.abs(da) < jnp.pi)
  # endpoints inside the circle: treat as no wrap (mju_wrap returns -1)
  inside = (jnp.dot(a, a) < r * r) | (jnp.dot(b, b) < r * r)
  valid = valid & ~inside
  wlen = jnp.where(valid, wlen, jnp.full((), -1.0, dtype))
  return wlen, w0, w1


def wrap_inside_2d(a: jax.Array, b: jax.Array, r, maxiter: int = 20,
                   zinit: float = 1.0 - 1.0e-7, tol: float = 1.0e-6):
  """Inside wrap: the tendon hugs a single point on the circle when the
  side site lies inside the geom (reference util_misc.py:202
  wrap_inside; C mju_wrapInside). Newton-solves
  asin(A z) + asin(B z) - 2 asin(z) + G = 0, branch-free with masks.

  Returns (wlen, pnt): wlen 0.0 on wrap (arc length is zero — single
  touch point), -1.0 for no wrap; pnt the touch point (used for both
  surface points)."""
  dtype = a.dtype
  len0 = math.norm(a)
  len1 = math.norm(b)
  dif = b - a
  dd = jnp.dot(dif, dif)

  invalid = (len0 <= r) | (len1 <= r) | (r < _EPS) | (len0 < _EPS) | (
      len1 < _EPS)
  # segment-circle intersection: no wrap
  t = -jnp.dot(dif, a) / jnp.maximum(dd, _EPS)
  closest = a + t * dif
  invalid = invalid | ((dd > _EPS) & (t > 0.0) & (t < 1.0) &
                       (math.norm(closest) <= r))

  pnt_default = math.normalize(0.5 * (a + b)) * r

  A = r / jnp.maximum(len0, _EPS)
  B = r / jnp.maximum(len1, _EPS)
  cosG = (len0 * len0 + len1 * len1 - dd) / jnp.maximum(
      2.0 * len0 * len1, _EPS)
  invalid = invalid | (cosG < -1.0 + 1e-12)
  # endpoints colinear with center on same side: wrap at default point
  use_default = cosG > 1.0 - 1e-12
  G = jnp.arccos(jnp.clip(cosG, -1.0, 1.0))

  def f(z):
    return (jnp.arcsin(jnp.clip(A * z, -1.0, 1.0)) +
            jnp.arcsin(jnp.clip(B * z, -1.0, 1.0)) -
            2.0 * jnp.arcsin(jnp.clip(z, -1.0, 1.0)) + G)

  z = jnp.full((), zinit, dtype)
  fz = f(z)
  use_default = use_default | (fz > 0.0)

  def body(_, carry):
    z, fz, frozen = carry
    sq_z = z * z
    df = (A / jnp.maximum(_EPS, jnp.sqrt(jnp.maximum(
        1.0 - sq_z * A * A, 0.0))) +
          B / jnp.maximum(_EPS, jnp.sqrt(jnp.maximum(
              1.0 - sq_z * B * B, 0.0))) -
          2.0 / jnp.maximum(_EPS, jnp.sqrt(jnp.maximum(1.0 - sq_z,
                                                       0.0))))
    bad = df > -_EPS
    z1 = z - fz / jnp.where(bad, -1.0, df)
    bad = bad | (z1 > z)
    fz1 = f(z1)
    bad = bad | (fz1 > tol)
    done = jnp.abs(fz) <= tol
    step_ok = ~frozen & ~done & ~bad
    z_new = jnp.where(step_ok, z1, z)
    fz_new = jnp.where(step_ok, fz1, fz)
    return z_new, fz_new, frozen | bad
  z, fz, frozen = jax.lax.fori_loop(0, maxiter, body,
                                    (z, fz, jnp.zeros((), bool)))
  # non-converged or any SHOULD-NOT-OCCUR branch: default point
  use_default = use_default | frozen | (jnp.abs(fz) > tol)

  # finalize: rotate from the endpoint on the wrap side
  zc = jnp.clip(z, -1.0, 1.0)
  cross_ab = a[0] * b[1] - a[1] * b[0]
  use_a = cross_ab > 0.0
  vec = math.normalize(jnp.where(use_a, a, b))
  ang = jnp.where(use_a,
                  jnp.arcsin(zc) - jnp.arcsin(jnp.clip(A * zc, -1, 1)),
                  jnp.arcsin(zc) - jnp.arcsin(jnp.clip(B * zc, -1, 1)))
  c, s = jnp.cos(ang), jnp.sin(ang)
  pnt = r * jnp.stack([c * vec[0] - s * vec[1], s * vec[0] + c * vec[1]])
  pnt = jnp.where(use_default, pnt_default, pnt)
  wlen = jnp.where(invalid, jnp.full((), -1.0, dtype),
                   jnp.zeros((), dtype))
  return wlen, pnt


def wrap_sphere(x0: jax.Array, x1: jax.Array, pos: jax.Array,
                mat: jax.Array, radius, side: jax.Array | None):
  """Wrap segment x0->x1 (world) around a sphere at pos. Returns
  (wlen, w0_world, w1_world). side: optional world-frame side-site point
  forcing the wrap side."""
  a3 = x0 - pos
  b3 = x1 - pos
  # wrap plane: contains a3, b3 (and the center); basis (e1, e2)
  e1, n1 = math.normalize_with_norm(a3)
  b_perp = b3 - e1 * jnp.dot(b3, e1)
  e2, n2 = math.normalize_with_norm(b_perp)
  # degenerate (colinear through center): pick any perpendicular
  alt = math.normalize(jnp.cross(e1, jnp.array([0.57, 0.62, 0.53],
                                               x0.dtype)))
  e2 = jnp.where(n2 < 1e-10, alt, e2)
  a2 = jnp.stack([jnp.dot(a3, e1), jnp.dot(a3, e2)])
  b2 = jnp.stack([jnp.dot(b3, e1), jnp.dot(b3, e2)])
  if side is None:
    side_sign = jnp.zeros((), jnp.int32)
  else:
    s3 = side - pos
    s2 = jnp.stack([jnp.dot(s3, e1), jnp.dot(s3, e2)])
    # sign of the side-site's angular position: which side of line a-b
    cross_ab = (b2[0] - a2[0]) * (s2[1] - a2[1]) - (
        b2[1] - a2[1]) * (s2[0] - a2[0])
    # map to arc orientation sign used by wrap_circle_2d
    side_sign = jnp.where(cross_ab >= 0, 1, -1)
  wlen, w0, w1 = wrap_circle_2d(a2, b2, radius, side_sign)
  if side is not None:
    # side site INSIDE the geom -> inside wrap (C mju_wrap; reference
    # util_misc.py:421 `norm(sidepnt) < radius` gate)
    inside = math.norm(side - pos) < radius
    wl_i, p_i = wrap_inside_2d(a2, b2, radius)
    wlen = jnp.where(inside, wl_i, wlen)
    w0 = jnp.where(inside, p_i, w0)
    w1 = jnp.where(inside, p_i, w1)
  w0_3 = pos + w0[0] * e1 + w0[1] * e2
  w1_3 = pos + w1[0] * e1 + w1[1] * e2
  return wlen, w0_3, w1_3


def wrap_cylinder(x0: jax.Array, x1: jax.Array, pos: jax.Array,
                  mat: jax.Array, radius, side: jax.Array | None):
  """Wrap segment around an infinite cylinder along mat[:, 2]. The 2D
  wrap happens in the cross-section plane; the axial coordinate of the
  touch points is interpolated by path length (C mju_wrap behavior)."""
  axis = mat[:, 2]
  e1 = mat[:, 0]
  e2 = mat[:, 1]
  r0 = x0 - pos
  r1 = x1 - pos
  a2 = jnp.stack([jnp.dot(r0, e1), jnp.dot(r0, e2)])
  b2 = jnp.stack([jnp.dot(r1, e1), jnp.dot(r1, e2)])
  z0 = jnp.dot(r0, axis)
  z1 = jnp.dot(r1, axis)
  if side is None:
    side_sign = jnp.zeros((), jnp.int32)
  else:
    s3 = side - pos
    s2 = jnp.stack([jnp.dot(s3, e1), jnp.dot(s3, e2)])
    cross_ab = (b2[0] - a2[0]) * (s2[1] - a2[1]) - (
        b2[1] - a2[1]) * (s2[0] - a2[0])
    side_sign = jnp.where(cross_ab >= 0, 1, -1)
  wlen, w0, w1 = wrap_circle_2d(a2, b2, radius, side_sign)
  if side is not None:
    inside = math.norm(side - pos) < radius
    wl_i, p_i = wrap_inside_2d(a2, b2, radius)
    wlen = jnp.where(inside, wl_i, wlen)
    w0 = jnp.where(inside, p_i, w0)
    w1 = jnp.where(inside, p_i, w1)
  # distribute axial travel proportionally to 2D path length
  l0 = math.norm(w0 - a2)
  l1 = math.norm(w1 - b2)
  ltot = l0 + jnp.abs(wlen) + l1
  lsafe = jnp.where(ltot < _EPS, 1.0, ltot)
  zw0 = z0 + (z1 - z0) * l0 / lsafe
  zw1 = z1 - (z1 - z0) * l1 / lsafe
  # wrap segment length in 3D includes axial component
  dz = jnp.abs(zw1 - zw0)
  wlen3 = jnp.where(wlen >= 0, jnp.sqrt(wlen * wlen + dz * dz), wlen)
  w0_3 = pos + w0[0] * e1 + w0[1] * e2 + zw0 * axis
  w1_3 = pos + w1[0] * e1 + w1[1] * e2 + zw1 * axis
  return wlen3, w0_3, w1_3
