"""Generic convex narrowphase: support functions + MPR (Minkowski
Portal Refinement) with fixed iteration counts and mask-based control
flow.

Replaces the reference's GJK/EPA kernels (mujoco_warp/_src/
collision_gjk.py, collision_convex.py) with a TPU-native formulation:
MPR handles the penetrating case directly (no polytope bookkeeping — a
3-vertex portal refined toward the origin ray), and a fixed-iteration
GJK gives separation distance for margin-positive models. All loops are
``lax.fori_loop`` with per-lane masks, so the collider vmaps over pair
batches exactly like the analytic primitives.

Contact convention matches the analytic colliders: returns (dist, pos,
frame) with frame[0] = contact normal pointing from geom1 into geom2,
pos = midpoint between the two surface points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import math
from .types import GeomType

_MPR_ITERATIONS = 24
_TOL = 1e-6


# ---------------------------------------------------------------------------
# Support functions. Each takes (pos, mat, size, vert, d_world) where
# `vert` is the (padded) convex-hull vertex buffer for mesh geoms (None
# otherwise) and returns the world support point in direction d.
# ---------------------------------------------------------------------------


def _supp_sphere(p, R, s, vert, d):
  return p + s[0] * math.normalize(d)


def _supp_capsule(p, R, s, vert, d):
  dn = math.normalize(d)
  axis = R[:, 2]
  return p + axis * (s[1] * jnp.sign(jnp.dot(dn, axis))) + s[0] * dn


def _supp_ellipsoid(p, R, s, vert, d):
  dl = R.T @ d
  sd = s * dl
  denom = math.norm(sd)
  x = (s * sd) / jnp.where(denom < 1e-12, 1.0, denom)
  return p + R @ x


def _supp_cylinder(p, R, s, vert, d):
  dl = R.T @ d
  rho = jnp.sqrt(dl[0] * dl[0] + dl[1] * dl[1])
  rsafe = jnp.where(rho < 1e-12, 1.0, rho)
  x = jnp.stack([s[0] * dl[0] / rsafe, s[0] * dl[1] / rsafe,
                 s[1] * jnp.sign(dl[2])])
  x = jnp.where(rho < 1e-12, jnp.stack([0.0 * dl[0], 0.0 * dl[1],
                                        s[1] * jnp.sign(dl[2])]), x)
  return p + R @ x


def _supp_box(p, R, s, vert, d):
  dl = R.T @ d
  return p + R @ (s[:3] * jnp.sign(dl))


def _supp_mesh(p, R, s, vert, d):
  """vert: (V, 4) — xyz + validity mask (padded hull vertices, local)."""
  dl = R.T @ d
  dots = vert[:, :3] @ dl
  dots = jnp.where(vert[:, 3] > 0, dots, -jnp.inf)
  i = jnp.argmax(dots)
  return p + R @ vert[i, :3]


SUPPORT = {
    GeomType.SPHERE: _supp_sphere,
    GeomType.CAPSULE: _supp_capsule,
    GeomType.ELLIPSOID: _supp_ellipsoid,
    GeomType.CYLINDER: _supp_cylinder,
    GeomType.BOX: _supp_box,
    GeomType.MESH: _supp_mesh,
}

# geom types with a smooth surface: 1-contact manifolds suffice
_CENTER = {
    GeomType.SPHERE: lambda p, R, s, v: p,
    GeomType.CAPSULE: lambda p, R, s, v: p,
    GeomType.ELLIPSOID: lambda p, R, s, v: p,
    GeomType.CYLINDER: lambda p, R, s, v: p,
    GeomType.BOX: lambda p, R, s, v: p,
    GeomType.MESH: lambda p, R, s, v: p + R @ (
        jnp.sum(v[:, :3] * (v[:, 3:] > 0), axis=0) /
        jnp.maximum(jnp.sum(v[:, 3] > 0), 1)),
}


def mpr(t1: int, t2: int):
  """Build an MPR collider for a static geom-type pair. The returned
  function maps raw pair geometry (+ optional hull verts) to
  (dist[1], pos[1, 3], frame[1, 3, 3])."""
  supp1 = SUPPORT[GeomType(t1)]
  supp2 = SUPPORT[GeomType(t2)]
  c1fn = _CENTER[GeomType(t1)]
  c2fn = _CENTER[GeomType(t2)]

  def collide(p1, m1, s1, p2, m2, s2, v1=None, v2=None, margin=0.0):
    """margin expands geom2's support by `margin` along the query
    direction: the expanded penetration depth p maps to the true
    distance as dist = margin - p, giving separation distances within
    the margin band from the same portal refinement (the reference
    inflates geoms for margin the same way, collision_gjk.py)."""
    dtype = p1.dtype
    margin = jnp.asarray(margin, dtype)

    def S(d):
      """Minkowski-difference support: supp2(d) - supp1(-d); also
      returns the witness points on both geoms."""
      dn = math.normalize(d)
      a = supp1(p1, m1, s1, v1, -d)
      b = supp2(p2, m2, s2, v2, d) + margin * dn
      return b - a, a, b

    # phase 1: interior point of the difference (center2 - center1)
    c1 = c1fn(p1, m1, s1, v1)
    c2 = c2fn(p2, m2, s2, v2)
    v0 = c2 - c1
    v0 = jnp.where(math.norm(v0) < 1e-10,
                   jnp.array([1e-5, 0, 0], dtype), v0)

    # phase 2: initial portal (3 supports)
    d1 = -v0
    w1, a1, b1 = S(math.normalize(d1))
    d2 = jnp.cross(v0, w1)
    d2n = math.norm(d2)
    # v0 through origin colinear with w1 -> any perpendicular
    d2 = jnp.where(d2n < 1e-10, math.normalize(
        jnp.cross(v0, jnp.array([0.57, 0.62, 0.53], dtype))),
        d2 / jnp.where(d2n < 1e-10, 1.0, d2n))
    w2, a2, b2 = S(d2)
    d3 = jnp.cross(w1 - v0, w2 - v0)
    d3 = math.normalize(d3)
    # orient portal normal away from v0
    flip = jnp.dot(d3, v0) > 0
    d3 = jnp.where(flip, -d3, d3)
    w3, a3, b3 = S(d3)

    # portal candidate discovery loop: ensure origin ray (from v0 toward
    # origin) passes through portal triangle (w1, w2, w3); swap supports
    # until it does (fixed iterations, masked)
    def disc_body(_, state):
      w1, a1, b1, w2, a2, b2, w3, a3, b3 = state
      # does ray v0->origin pass inside plane (v0, w1, w2) etc.
      n12 = jnp.cross(w1 - v0, w2 - v0)
      n23 = jnp.cross(w2 - v0, w3 - v0)
      n31 = jnp.cross(w3 - v0, w1 - v0)
      out12 = jnp.dot(n12, -v0) < 0
      out23 = jnp.dot(n23, -v0) < 0
      out31 = jnp.dot(n31, -v0) < 0
      # replace the vertex opposite the violated plane with a fresh
      # support in that plane's (corrected) normal
      def repl(n, wo, ao, bo):
        d = math.normalize(n)
        w, a, b = S(d)
        return w, a, b
      w3n, a3n, b3n = repl(-n12, w3, a3, b3)
      w1n, a1n, b1n = repl(-n23, w1, a1, b1)
      w2n, a2n, b2n = repl(-n31, w2, a2, b2)
      sel = lambda c, x, y: jnp.where(c, x, y)
      # at most one swap per iteration (priority 12 > 23 > 31)
      u12 = out12
      u23 = out23 & ~out12
      u31 = out31 & ~out12 & ~out23
      w3 = sel(u12, w3n, w3); a3 = sel(u12, a3n, a3); b3 = sel(u12, b3n, b3)
      w1 = sel(u23, w1n, w1); a1 = sel(u23, a1n, a1); b1 = sel(u23, b1n, b1)
      w2 = sel(u31, w2n, w2); a2 = sel(u31, a2n, a2); b2 = sel(u31, b2n, b2)
      return (w1, a1, b1, w2, a2, b2, w3, a3, b3)

    state = (w1, a1, b1, w2, a2, b2, w3, a3, b3)
    state = jax.lax.fori_loop(0, 8, disc_body, state)
    w1, a1, b1, w2, a2, b2, w3, a3, b3 = state

    # phase 3: portal refinement toward the origin
    def ref_body(_, state):
      w1, a1, b1, w2, a2, b2, w3, a3, b3, done = state
      n = jnp.cross(w2 - w1, w3 - w1)
      n = math.normalize(n)
      n = jnp.where(jnp.dot(n, v0) > 0, -n, n)  # outward (away from v0)
      w4, a4, b4 = S(n)
      # convergence: new support barely past the portal plane
      prog = jnp.dot(n, w4 - w1)
      new_done = done | (prog < _TOL)
      # canonical XenoCollide portal update: pick the sub-portal that
      # still contains the v0->origin ray, replacing one vertex with w4
      c41 = jnp.dot(jnp.cross(w4, w1), v0)
      c42 = jnp.dot(jnp.cross(w4, w2), v0)
      c43 = jnp.dot(jnp.cross(w4, w3), v0)
      repl1 = ((c41 < 0) & (c42 < 0)) | ((c41 >= 0) & (c43 >= 0))
      repl3 = (c41 < 0) & (c42 >= 0)
      repl2 = (c41 >= 0) & (c43 < 0)
      sel = lambda c, x, y: jnp.where(c & ~done, x, y)
      w1n = sel(repl1, w4, w1); a1n = sel(repl1, a4, a1)
      b1n = sel(repl1, b4, b1)
      w2n = sel(repl2, w4, w2); a2n = sel(repl2, a4, a2)
      b2n = sel(repl2, b4, b2)
      w3n = sel(repl3, w4, w3); a3n = sel(repl3, a4, a3)
      b3n = sel(repl3, b4, b3)
      return (w1n, a1n, b1n, w2n, a2n, b2n, w3n, a3n, b3n, new_done)

    done0 = jnp.zeros((), bool)
    state = (w1, a1, b1, w2, a2, b2, w3, a3, b3, done0)
    state = jax.lax.fori_loop(0, _MPR_ITERATIONS, ref_body, state)
    w1, a1, b1, w2, a2, b2, w3, a3, b3, _ = state

    # final portal plane
    n = jnp.cross(w2 - w1, w3 - w1)
    n = math.normalize(n)
    n = jnp.where(jnp.dot(n, v0) > 0, -n, n)
    plane_d = jnp.dot(n, w1)        # signed dist of portal plane from O
    # penetration iff origin is inside the portal plane (plane_d >= 0
    # with outward normal) — depth = distance from origin to the plane
    penetrating = plane_d >= 0
    depth = plane_d                  # >= 0 when penetrating

    # witness points: barycentric coords of the origin ray hit on the
    # portal, applied to the per-geom support points
    # project origin onto portal plane along n
    q = -n * (-plane_d)
    # barycentric of q in (w1, w2, w3)
    e1 = w2 - w1
    e2 = w3 - w1
    qp = q - w1
    d11 = jnp.dot(e1, e1)
    d12 = jnp.dot(e1, e2)
    d22 = jnp.dot(e2, e2)
    dq1 = jnp.dot(qp, e1)
    dq2 = jnp.dot(qp, e2)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-12)
    l2 = (d22 * dq1 - d12 * dq2) / det
    l3 = (d11 * dq2 - d12 * dq1) / det
    l1 = 1.0 - l2 - l3
    l1, l2, l3 = [jnp.clip(x, 0.0, 1.0) for x in (l1, l2, l3)]
    lsum = jnp.maximum(l1 + l2 + l3, 1e-12)
    l1, l2, l3 = l1 / lsum, l2 / lsum, l3 / lsum
    pa = l1 * a1 + l2 * a2 + l3 * a3   # witness on geom1
    pb = l1 * b1 + l2 * b2 + l3 * b3   # witness on geom2

    # contact normal from geom1 into geom2 = -n (portal normal points
    # from origin outward = direction of deepest translation of B)
    normal = -n
    # undo the margin expansion: depth is of the INFLATED pair
    dist = jnp.where(penetrating, margin - depth, 1e10)
    pos = 0.5 * (pa + pb) - 0.5 * margin * n
    return dist[None], pos[None], math.make_frame(normal)[None]

  return collide
