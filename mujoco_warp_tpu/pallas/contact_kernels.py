"""Worlds-in-lanes contact megakernel: narrowphase + contact compaction
+ efc row assembly (limits + pyramidal contacts) in ONE Pallas kernel.

Replaces the XLA-level `collision_driver.collision` +
`constraint.make_constraint` pair for primitive-only scenes (the
humanoid/three_humanoids benchmark regime): those stages measured
~113 + ~118 small fusions each at 8192 worlds (~18 ms apiece) — pure
dispatch + HBM round-trip cost. Here every candidate collider unrolls
statically into VPU lane ops, compaction is an iterative in-VMEM argmax
(the XLA path's order-preserving top_k semantics), and per-slot static
parameters arrive via ONE (P, ncand) x (ncand, L) MXU matmul per slot.

Mirrors (cite): collision_primitive.{plane_sphere,plane_capsule,
sphere_sphere,sphere_capsule,capsule_capsule}, collision_driver's
active/top_k compaction, constraint._kbi/_row and
constraint._contact_rows_all's pyramidal branch, reference
mujoco_warp/_src/{collision_driver.py:698,constraint.py:1669}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import (ConstraintType, DisableBit, EqType, GeomType,
                     JointType, Model)
from .smooth_kernels import _qmul, _qrot

LANES = 128
_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999
_BIG = 1e10

_SUPPORTED = {
    (GeomType.PLANE, GeomType.SPHERE), (GeomType.PLANE, GeomType.CAPSULE),
    (GeomType.PLANE, GeomType.BOX),
    (GeomType.SPHERE, GeomType.SPHERE),
    (GeomType.SPHERE, GeomType.CAPSULE),
    (GeomType.SPHERE, GeomType.BOX),
    (GeomType.CAPSULE, GeomType.CAPSULE),
    (GeomType.CAPSULE, GeomType.BOX),
    (GeomType.BOX, GeomType.BOX),
}


def supports(m: Model, d) -> bool:
  """Whether the contact megakernel covers this model (primitive-only
  pairs, pyramidal cone, no equality/friction rows, slide/hinge limits
  only, no tendons)."""
  from ..types import ConeType, EqType
  if m.opt.cone != ConeType.PYRAMIDAL:
    return False
  if m.ntendon:
    return False
  for i in range(m.neq):
    if m.eq_type[i] not in (EqType.CONNECT, EqType.WELD, EqType.JOINT):
      return False
  if m.flex_meta.nflex:
    return False
  if m.sap_meta:  # dynamic-pair SAP models use the XLA driver
    return False
  for j in range(m.njnt):
    if m.jnt_limited[j] and m.jnt_type[j] not in (JointType.SLIDE,
                                                  JointType.HINGE):
      return False
  for t1, t2, _ in m.collision_pairs:
    if (t1, t2) not in _SUPPORTED:
      return False
  # Mosaic compile time scales with the unrolled candidate x slot work;
  # past this budget the XLA path compiles faster than the kernel
  from .. import collision_primitive
  ncand = sum(
      len(gl) * collision_primitive.MAX_CONTACTS.get((t1, t2), 1)
      for t1, t2, gl in m.collision_pairs)
  nconmax = d.contact.dist.shape[-1]
  if ncand > 512 or nconmax > 48 or m.nv > 64:
    return False
  return True


# ---------------------------------------------------------------------------
# lane-form geometry helpers ((k, L) blocks)
# ---------------------------------------------------------------------------


def _norm3(v):
  return jnp.sqrt(jnp.maximum(
      v[0:1] * v[0:1] + v[1:2] * v[1:2] + v[2:3] * v[2:3], 1e-30))


def _cross(a, b):
  return jnp.concatenate([
      a[1:2] * b[2:3] - a[2:3] * b[1:2],
      a[2:3] * b[0:1] - a[0:1] * b[2:3],
      a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)


def _dot3(a, b):
  return a[0:1] * b[0:1] + a[1:2] * b[1:2] + a[2:3] * b[2:3]


def _make_frame(a):
  """math.make_frame in lane form: rows (9, L), first row = normal."""
  L = a.shape[-1]
  dt = a.dtype
  n = a / _norm3(a)
  near_vert = jnp.abs(n[2:3]) >= 0.5
  helper = jnp.concatenate([
      jnp.zeros((1, L), dt),
      jnp.where(near_vert, jnp.ones((1, L), dt), jnp.zeros((1, L), dt)),
      jnp.where(near_vert, jnp.zeros((1, L), dt), jnp.ones((1, L), dt)),
  ], axis=0)
  b = helper - n * _dot3(n, helper)
  b = b / _norm3(b)
  c = _cross(n, b)
  return jnp.concatenate([n, b, c], axis=0)


def _closest_seg_point(a, b, pt):
  ab = b - a
  denom = jnp.maximum(_dot3(ab, ab), 1e-14)
  t = jnp.clip(_dot3(pt - a, ab) / denom, 0.0, 1.0)
  return a + t * ab


def _closest_seg_seg(a0, a1, b0, b1):
  """math.closest_segment_segment in lane form."""
  d1 = a1 - a0
  d2 = b1 - b0
  r = a0 - b0
  a = _dot3(d1, d1)
  e = _dot3(d2, d2)
  f = _dot3(d2, r)
  c = _dot3(d1, r)
  b = _dot3(d1, d2)
  denom = a * e - b * b
  s = jnp.where(denom > 1e-14,
                jnp.clip((b * f - c * e) / jnp.where(denom > 1e-14, denom,
                                                     1.0), 0.0, 1.0), 0.0)
  e_safe = jnp.where(e > 1e-14, e, 1.0)
  t = (b * s + f) / e_safe
  t_cl = jnp.clip(t, 0.0, 1.0)
  a_safe = jnp.where(a > 1e-14, a, 1.0)
  s = jnp.where(t != t_cl, jnp.clip((b * t_cl - c) / a_safe, 0.0, 1.0), s)
  return a0 + d1 * s, b0 + d2 * t_cl


def _sphere_like(n_raw, r1, r2, ref):
  cdist = _norm3(n_raw)
  L = n_raw.shape[-1]
  dt = n_raw.dtype
  n = n_raw / jnp.where(cdist < 1e-12, 1.0, cdist)
  ex = jnp.concatenate([jnp.ones((1, L), dt), jnp.zeros((2, L), dt)],
                       axis=0)
  n = jnp.where(cdist < 1e-12, ex, n)
  dist = cdist - (r1 + r2)
  pos = ref + n * (r1 + 0.5 * dist)
  return [(dist, pos, _make_frame(n))]


def _rcol(R, j):
  """Column j of a (9, L) row-major rotation block -> (3, L)."""
  return jnp.concatenate([R[j:j + 1], R[3 + j:4 + j], R[6 + j:7 + j]],
                         axis=0)


def _rtvec(R, v):
  """R^T @ v in lane form: R (9, L) row-major, v (3, L) -> (3, L)."""
  return jnp.concatenate([
      R[0:1] * v[0:1] + R[3:4] * v[1:2] + R[6:7] * v[2:3],
      R[1:2] * v[0:1] + R[4:5] * v[1:2] + R[7:8] * v[2:3],
      R[2:3] * v[0:1] + R[5:6] * v[1:2] + R[8:9] * v[2:3]], axis=0)


def _rvec(R, v):
  """R @ v in lane form."""
  return jnp.concatenate([
      R[0:1] * v[0:1] + R[1:2] * v[1:2] + R[2:3] * v[2:3],
      R[3:4] * v[0:1] + R[4:5] * v[1:2] + R[5:6] * v[2:3],
      R[6:7] * v[0:1] + R[7:8] * v[1:2] + R[8:9] * v[2:3]], axis=0)


def _stable_ranks(keys):
  """Descending-by-key stable ranks (ties -> lower index wins), the
  lane-form equivalent of jax.lax.top_k selection order. keys: list of
  (1, L); returns list of (1, L) float ranks."""
  n = len(keys)
  ranks = [jnp.zeros_like(keys[0]) for _ in range(n)]
  for i in range(n):
    for j in range(i + 1, n):
      gt_ij = (keys[i] > keys[j]) | ((keys[i] == keys[j]))
      # key_i >= key_j (tie favors i, the lower index): j ranks after i
      ranks[j] = ranks[j] + gt_ij.astype(keys[0].dtype)
      ranks[i] = ranks[i] + 1.0 - gt_ij.astype(keys[0].dtype)
  return ranks


def _point_box_sd(cx, cy, cz, hx, hy, hz):
  """collision_primitive._point_box in lane/elementwise form. Inputs
  (N, L); returns (closest xyz, outward normal xyz, signed dist)."""
  clx = jnp.clip(cx, -hx, hx)
  cly = jnp.clip(cy, -hy, hy)
  clz = jnp.clip(cz, -hz, hz)
  inside = ((jnp.abs(cx) < hx) & (jnp.abs(cy) < hy) & (jnp.abs(cz) < hz))
  dvx, dvy, dvz = cx - clx, cy - cly, cz - clz
  dn = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)
  dns = jnp.where(dn < 1e-12, 1.0, dn)
  nox, noy, noz = dvx / dns, dvy / dns, dvz / dns
  crx, cry, crz = hx - jnp.abs(cx), hy - jnp.abs(cy), hz - jnp.abs(cz)
  is_x = (crx <= cry) & (crx <= crz)
  is_y = ~is_x & (cry <= crz)
  is_z = ~is_x & ~is_y
  sx = jnp.where(cx >= 0, 1.0, -1.0)
  sy = jnp.where(cy >= 0, 1.0, -1.0)
  sz = jnp.where(cz >= 0, 1.0, -1.0)
  fx = is_x.astype(cx.dtype)
  fy = is_y.astype(cx.dtype)
  fz = is_z.astype(cx.dtype)
  nix, niy, niz = fx * sx, fy * sy, fz * sz
  six = jnp.where(is_x, sx * hx, cx)
  siy = jnp.where(is_y, sy * hy, cy)
  siz = jnp.where(is_z, sz * hz, cz)
  mcl = jnp.minimum(jnp.minimum(crx, cry), crz)
  ox = jnp.where(inside, six, clx)
  oy = jnp.where(inside, siy, cly)
  oz = jnp.where(inside, siz, clz)
  nx = jnp.where(inside, nix, nox)
  ny = jnp.where(inside, niy, noy)
  nz = jnp.where(inside, niz, noz)
  sd = jnp.where(inside, -mcl, dn)
  return ox, oy, oz, nx, ny, nz, sd


def _make_frame_elem(nx, ny, nz):
  """_make_frame with separated coordinates (N, L): returns 9 arrays
  (normal, tangent1, tangent2 rows)."""
  nn = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
  nx, ny, nz = nx / nn, ny / nn, nz / nn
  near_vert = jnp.abs(nz) >= 0.5
  hy = jnp.where(near_vert, 1.0, 0.0)
  hz = jnp.where(near_vert, 0.0, 1.0)
  dd = ny * hy + nz * hz
  bx = -nx * dd
  by = hy - ny * dd
  bz = hz - nz * dd
  bn = jnp.sqrt(jnp.maximum(bx * bx + by * by + bz * bz, 1e-30))
  bx, by, bz = bx / bn, by / bn, bz / bn
  cx = ny * bz - nz * by
  cy = nz * bx - nx * bz
  cz = nx * by - ny * bx
  return nx, ny, nz, bx, by, bz, cx, cy, cz


def _capsule_box_batch(pairs, gx_ref, gm_ref, geom_size_np):
  """collision_primitive.capsule_box ported lane-for-lane, with ALL
  capsule-box pairs batched in the sublane axis (pair-major blocks) so
  the Mosaic instruction count is ~one pair's worth. Returns
  {(g1, g2): [2 x (dist (1,L), pos (3,L), frame (9,L))]}."""
  P = len(pairs)
  L = gx_ref.shape[-1]
  dt = jnp.float32
  T = 33

  # per-pair segment endpoints in box-local frame + per-pair constants
  a3, seg3, r1s, h3 = [], [], [], []
  for (g1, g2) in pairs:
    R1, R2 = gm_ref[g1], gm_ref[g2]
    p1, p2 = gx_ref[g1], gx_ref[g2]
    s1 = geom_size_np[g1]
    z1 = _rcol(R1, 2)
    a = _rtvec(R2, p1 + z1 * float(s1[1]) - p2)
    b = _rtvec(R2, p1 - z1 * float(s1[1]) - p2)
    a3.append(a)
    seg3.append(b - a)
    r1s.append(float(s1[0]))
    h3.append([float(x) for x in geom_size_np[g2][:3]])

  def rep(rows, n):
    """concat([broadcast(row_p, (n, L)) for p]) -> (n*P, L)."""
    return jnp.concatenate(
        [jnp.broadcast_to(r, (n, L)) for r in rows], axis=0)

  # Mosaic requires integer iota (tpu.iota); build int32 then cast.
  t_pat = jax.lax.broadcasted_iota(jnp.int32, (T, L), 0).astype(dt) * (
      1.0 / 32.0)
  t_all = jnp.concatenate([t_pat] * P, axis=0)          # (T*P, L)
  ax = rep([a[0:1] for a in a3], T)
  ay = rep([a[1:2] for a in a3], T)
  az = rep([a[2:3] for a in a3], T)
  sx = rep([s[0:1] for s in seg3], T)
  sy = rep([s[1:2] for s in seg3], T)
  sz = rep([s[2:3] for s in seg3], T)
  hx = rep([jnp.full((1, L), h[0], dt) for h in h3], T)
  hy = rep([jnp.full((1, L), h[1], dt) for h in h3], T)
  hz = rep([jnp.full((1, L), h[2], dt) for h in h3], T)
  _, _, _, _, _, _, sd = _point_box_sd(
      ax + t_all * sx, ay + t_all * sy, az + t_all * sz, hx, hy, hz)

  # per-pair first/last t attaining ~the min
  t_ends = []                                            # 2P x (1, L)
  for p in range(P):
    sds = sd[p * T:(p + 1) * T]
    sdmin = jnp.min(sds, axis=0, keepdims=True)
    tol = 1e-4 * (1.0 + jnp.abs(sdmin))
    at_min = sds <= sdmin + tol
    t_first = jnp.min(jnp.where(at_min, t_pat, 2.0), axis=0,
                      keepdims=True)
    t_last = jnp.max(jnp.where(at_min, t_pat, -1.0), axis=0,
                     keepdims=True)
    t_ends.append(t_first)
    t_ends.append(t_last)

  # shrinking-window refinement, both endpoints of all pairs batched:
  # rows are (9 offsets) x (2P candidates)
  NC = 2 * P
  offs = (jax.lax.broadcasted_iota(jnp.int32, (9, L), 0).astype(dt)
          - 4.0) * 0.25
  offs_all = jnp.concatenate([offs] * NC, axis=0)        # (9*NC, L)
  ax9 = rep([a3[p // 2][0:1] for p in range(NC)], 9)
  ay9 = rep([a3[p // 2][1:2] for p in range(NC)], 9)
  az9 = rep([a3[p // 2][2:3] for p in range(NC)], 9)
  sx9 = rep([seg3[p // 2][0:1] for p in range(NC)], 9)
  sy9 = rep([seg3[p // 2][1:2] for p in range(NC)], 9)
  sz9 = rep([seg3[p // 2][2:3] for p in range(NC)], 9)
  hx9 = rep([jnp.full((1, L), h3[p // 2][0], dt) for p in range(NC)], 9)
  hy9 = rep([jnp.full((1, L), h3[p // 2][1], dt) for p in range(NC)], 9)
  hz9 = rep([jnp.full((1, L), h3[p // 2][2], dt) for p in range(NC)], 9)
  delta = 1.0 / 32.0
  for _ in range(5):
    t9 = rep(t_ends, 9)                                  # (9*NC, L)
    cand = jnp.clip(t9 + offs_all * delta, 0.0, 1.0)
    _, _, _, _, _, _, sd9 = _point_box_sd(
        ax9 + cand * sx9, ay9 + cand * sy9, az9 + cand * sz9,
        hx9, hy9, hz9)
    vals = sd9 + 1e-6 * jnp.abs(cand - t9)
    new_ends = []
    for c in range(NC):
      v = vals[c * 9:(c + 1) * 9]
      cc = cand[c * 9:(c + 1) * 9]
      minv = jnp.min(v, axis=0, keepdims=True)
      pick = v == minv
      new_ends.append(jnp.min(jnp.where(pick, cc, 2.0), axis=0,
                              keepdims=True))
    t_ends = new_ends
    delta = delta * 0.25

  # final contact quantities for the 2P candidates, batched
  t2r = jnp.concatenate(t_ends, axis=0)                  # (NC, L)
  axc = rep([a3[p // 2][0:1] for p in range(NC)], 1)
  ayc = rep([a3[p // 2][1:2] for p in range(NC)], 1)
  azc = rep([a3[p // 2][2:3] for p in range(NC)], 1)
  sxc = rep([seg3[p // 2][0:1] for p in range(NC)], 1)
  syc = rep([seg3[p // 2][1:2] for p in range(NC)], 1)
  szc = rep([seg3[p // 2][2:3] for p in range(NC)], 1)
  hxc = rep([jnp.full((1, L), h3[p // 2][0], dt) for p in range(NC)], 1)
  hyc = rep([jnp.full((1, L), h3[p // 2][1], dt) for p in range(NC)], 1)
  hzc = rep([jnp.full((1, L), h3[p // 2][2], dt) for p in range(NC)], 1)
  ox, oy, oz, nx, ny, nz, sdc = _point_box_sd(
      axc + t2r * sxc, ayc + t2r * syc, azc + t2r * szc, hxc, hyc, hzc)
  rad = jnp.concatenate(
      [jnp.full((1, L), r1s[p // 2], dt) for p in range(NC)], axis=0)
  dist = sdc - rad
  # world-frame normal/pos: per-pair rotation rows stacked over NC
  R2rows = [jnp.concatenate([gm_ref[pairs[p // 2][1]][i:i + 1]
                             for p in range(NC)], axis=0)
            for i in range(9)]
  p2rows = [jnp.concatenate([gx_ref[pairs[p // 2][1]][i:i + 1]
                             for p in range(NC)], axis=0)
            for i in range(3)]
  nwx = R2rows[0] * nx + R2rows[1] * ny + R2rows[2] * nz
  nwy = R2rows[3] * nx + R2rows[4] * ny + R2rows[5] * nz
  nwz = R2rows[6] * nx + R2rows[7] * ny + R2rows[8] * nz
  px = p2rows[0] + R2rows[0] * ox + R2rows[1] * oy + R2rows[2] * oz + (
      0.5 * dist * nwx)
  py = p2rows[1] + R2rows[3] * ox + R2rows[4] * oy + R2rows[5] * oz + (
      0.5 * dist * nwy)
  pz = p2rows[2] + R2rows[6] * ox + R2rows[7] * oy + R2rows[8] * oz + (
      0.5 * dist * nwz)
  fr9 = _make_frame_elem(-nwx, -nwy, -nwz)

  out = {}
  for p, (g1, g2) in enumerate(pairs):
    entries = []
    for c in (2 * p, 2 * p + 1):
      dist_c = dist[c:c + 1]
      pos_c = jnp.concatenate([px[c:c + 1], py[c:c + 1], pz[c:c + 1]],
                              axis=0)
      frame_c = jnp.concatenate([f[c:c + 1] for f in fr9], axis=0)
      entries.append((dist_c, pos_c, frame_c))
    out[(g1, g2)] = entries
  return out


# _ROTMORE permutations (collision_box._ROTMORE): rotate face k to +z
_ROTMORE_NP = np.zeros((6, 3, 3), dtype=np.float32)
_ROTMORE_NP[0, 0, 2], _ROTMORE_NP[0, 1, 1], _ROTMORE_NP[0, 2, 0] = -1, 1, 1
_ROTMORE_NP[1, 0, 0], _ROTMORE_NP[1, 1, 2], _ROTMORE_NP[1, 2, 1] = 1, -1, 1
_ROTMORE_NP[2, 0, 0], _ROTMORE_NP[2, 1, 1], _ROTMORE_NP[2, 2, 2] = 1, 1, 1
_ROTMORE_NP[3, 0, 2], _ROTMORE_NP[3, 1, 1], _ROTMORE_NP[3, 2, 0] = 1, 1, -1
_ROTMORE_NP[4, 0, 0], _ROTMORE_NP[4, 1, 2], _ROTMORE_NP[4, 2, 1] = 1, 1, -1
_ROTMORE_NP[5, 0, 0], _ROTMORE_NP[5, 1, 1], _ROTMORE_NP[5, 2, 2] = -1, 1, -1


def _box_box_batch(pairs, margins, gx_ref, gm_ref, geom_size_np):
  """collision_box.box_box (C mjc_BoxBox SAT + manifold) ported
  lane-for-lane with all box-box pairs batched in the sublane axis.
  Vectors are coordinate tuples of (P, L) arrays; 3x3 matrices are
  9-lists (row-major). Returns {(g1, g2): [8 x (dist, pos, frame)]}."""
  P = len(pairs)
  L = gx_ref.shape[-1]
  dt = jnp.float32
  f = lambda v: v.astype(dt)
  B = lambda b: b.astype(dt)

  def crow(vals):
    """per-pair static floats -> (P, L)."""
    return jnp.concatenate([jnp.full((1, L), float(v), dt) for v in vals],
                           axis=0)

  def stk(rows):
    return jnp.concatenate(rows, axis=0)                 # P x (1,L)

  # stacked inputs
  M1 = [stk([gm_ref[g1][i:i + 1] for (g1, g2) in pairs])
        for i in range(9)]
  M2 = [stk([gm_ref[g2][i:i + 1] for (g1, g2) in pairs])
        for i in range(9)]
  P1 = [stk([gx_ref[g1][i:i + 1] for (g1, g2) in pairs])
        for i in range(3)]
  P2 = [stk([gx_ref[g2][i:i + 1] for (g1, g2) in pairs])
        for i in range(3)]
  S1 = [crow([geom_size_np[g1][i] for (g1, g2) in pairs])
        for i in range(3)]
  S2 = [crow([geom_size_np[g2][i] for (g1, g2) in pairs])
        for i in range(3)]
  marg = crow(margins)
  sepsum = crow([3.0 * float(sum(geom_size_np[g1][:3]) +
                             sum(geom_size_np[g2][:3]))
                 for (g1, g2) in pairs])

  def mtv(M, v):                                         # M^T @ v
    return [M[0 + i] * v[0] + M[3 + i] * v[1] + M[6 + i] * v[2]
            for i in range(3)]

  def mv(M, v):                                          # M @ v
    return [M[3 * i] * v[0] + M[3 * i + 1] * v[1] + M[3 * i + 2] * v[2]
            for i in range(3)]

  dp = [P2[i] - P1[i] for i in range(3)]
  pos21 = mtv(M1, dp)
  pos12 = mtv(M2, [-d for d in dp])
  # rot21[i][j] = sum_k M1[k][i] * M2[k][j]
  R21 = [M1[3 * 0 + i] * M2[3 * 0 + j] + M1[3 * 1 + i] * M2[3 * 1 + j] +
         M1[3 * 2 + i] * M2[3 * 2 + j]
         for i in range(3) for j in range(3)]
  A21 = [jnp.abs(r) for r in R21]
  # rot12 = rot21.T ; plen2 = rot21abs @ s2 ; plen1 = rot12abs @ s1
  plen2 = [A21[3 * i] * S2[0] + A21[3 * i + 1] * S2[1] +
           A21[3 * i + 2] * S2[2] for i in range(3)]
  plen1 = [A21[i] * S1[0] + A21[3 + i] * S1[1] + A21[6 + i] * S1[2]
           for i in range(3)]

  # ---- SAT (collision_box._sat, C-exact candidate order) ----
  sep = marg + sepsum
  axis_code = jnp.full((P, L), -1.0, dt)
  fail = jnp.zeros((P, L), jnp.bool_)
  for i in range(3):
    c1 = -jnp.abs(pos21[i]) + S1[i] + plen2[i]
    c2 = -jnp.abs(pos12[i]) + S2[i] + plen1[i]
    fail = fail | (c1 < -marg) | (c2 < -marg)
    upd = c1 < sep
    axis_code = jnp.where(upd, float(i) + 3.0 * B(pos21[i] < 0),
                          axis_code)
    sep = jnp.where(upd, c1, sep)
    upd = c2 < sep
    axis_code = jnp.where(upd, float(i) + 3.0 * B(pos12[i] < 0) + 6.0,
                          axis_code)
    sep = jnp.where(upd, c2, sep)

  zero = jnp.zeros((P, L), dt)
  clnorm = [zero, zero, zero]
  inv = jnp.zeros((P, L), jnp.bool_)
  cle1b = [zero, zero, zero]                             # bit arrays
  cle2b = [zero, zero, zero]
  for i in range(3):
    for j in range(3):
      # cross(e_i axis of box1, rot12[j]) in box1 frame
      r12j = [R21[3 * 0 + j], R21[3 * 1 + j], R21[3 * 2 + j]]
      if i == 0:
        cross = [zero, -r12j[2], r12j[1]]
      elif i == 1:
        cross = [r12j[2], zero, -r12j[0]]
      else:
        cross = [-r12j[1], r12j[0], zero]
      clen = jnp.sqrt(jnp.maximum(
          cross[0] ** 2 + cross[1] ** 2 + cross[2] ** 2, 0.0))
      ok = clen >= 1e-9
      clen_s = jnp.where(ok, clen, 1.0)
      axis = [c / clen_s for c in cross]
      box_dist = (pos21[0] * axis[0] + pos21[1] * axis[1] +
                  pos21[2] * axis[2])
      c3 = -jnp.abs(box_dist)
      for k in range(3):
        if k != i:
          c3 = c3 + S1[k] * jnp.abs(axis[k])
        if k != j:
          c3 = c3 + S2[k] * A21[3 * i + (3 - k - j)] / clen_s
      fail = fail | (ok & (c3 < -marg))
      upd = ok & (c3 < sep * (1.0 - 1e-12))
      nb1 = [zero, zero, zero]
      nb2 = [zero, zero, zero]
      for k in range(3):
        if k != i:
          nb1[k] = B((axis[k] > 0) ^ (box_dist < 0))
        if k != j:
          nb2[k] = B((R21[3 * i + (3 - k - j)] > 0) ^ (box_dist < 0) ^
                     (((k - j + 3) % 3) == 1))
      sep = jnp.where(upd, c3, sep)
      axis_code = jnp.where(upd, float(12 + i * 3 + j), axis_code)
      clnorm = [jnp.where(upd, axis[k], clnorm[k]) for k in range(3)]
      inv = jnp.where(upd, box_dist < 0, inv)
      cle1b = [jnp.where(upd, nb1[k], cle1b[k]) for k in range(3)]
      cle2b = [jnp.where(upd, nb2[k], cle2b[k]) for k in range(3)]
  fail = fail | (axis_code < 0)

  def sel3(idx, a, b, c):
    return jnp.where(idx == 0, a, jnp.where(idx == 1, b, c))

  def rotmore_of(sel_idx):
    """(P, L) index in [0, 6) -> 9 masked-sum (P, L) entries."""
    out = []
    for i in range(3):
      for j in range(3):
        acc = zero
        for k in range(6):
          v = float(_ROTMORE_NP[k, i, j])
          if v != 0.0:
            acc = acc + B(sel_idx == k) * v
        out.append(acc)
    return out

  def m_mul(A, Bm):                                      # A @ B
    return [sum(A[3 * i + k] * Bm[3 * k + j] for k in range(3))
            for i in range(3) for j in range(3)]

  # ---- face case (collision_box._face_case) ----
  fc = jnp.clip(axis_code, 0.0, 11.0)
  box_idx = jnp.floor(fc / 6.0)
  face_idx = fc - 6.0 * box_idx
  bi = box_idx > 0.5
  rotmore = rotmore_of(face_idx)
  R12 = [R21[3 * j + i] for i in range(3) for j in range(3)]
  rsel = [jnp.where(bi, R12[k], R21[k]) for k in range(9)]
  r = m_mul(rotmore, rsel)
  psel = [jnp.where(bi, pos12[k], pos21[k]) for k in range(3)]
  p = mv(rotmore, psel)
  ssel = [jnp.where(bi, S2[k], S1[k]) for k in range(3)]
  ss = [jnp.abs(v) for v in mv(rotmore, ssel)]
  s_o = [jnp.where(bi, S1[k], S2[k]) for k in range(3)]
  rt = [r[3 * j + i] for i in range(3) for j in range(3)]  # r.T
  lx, ly, hz = ss[0], ss[1], ss[2]
  p = [p[0], p[1], p[2] - hz]

  clc = [r[3 * 2 + i] < 0 for i in range(3)]
  lp = list(p)
  for i in range(3):
    sgn_i = jnp.where(clc[i], 1.0, -1.0)
    for k in range(3):
      lp[k] = lp[k] + rt[3 * i + k] * s_o[i] * sgn_i

  w = [jnp.abs(r[3 * 2 + i]) < 0.5 for i in range(3)]
  wf = [B(x) for x in w]
  dirs = wf[0] + wf[1] + wf[2]
  cns = []
  for i in range(3):
    sgn_i = jnp.where(clc[i], -2.0, 2.0)
    cns.append([rt[3 * i + k] * s_o[i] * sgn_i for k in range(3)])
  # stable argsort(-wf): cn1 = first lateral dir, cn2 = second
  m0 = wf[0]
  m1_ = (1.0 - wf[0]) * wf[1]
  m2_ = (1.0 - wf[0]) * (1.0 - wf[1]) * wf[2]
  cn1 = [m0 * cns[0][k] + m1_ * cns[1][k] + m2_ * cns[2][k]
         for k in range(3)]
  n1_ = wf[0] * wf[1]
  n2_ = wf[2] * jnp.clip(wf[0] + wf[1], 0.0, 1.0) * (1.0 - wf[0] * wf[1])
  cn2 = [n1_ * cns[1][k] + n2_ * cns[2][k] for k in range(3)]
  dirs2 = dirs == 2.0

  f_pts = []
  f_valid = []
  # (a) incident-edge lines clipped against rect edges: 16 slots
  lines = [(lp, cn1, dirs >= 1.0), (lp, cn2, dirs2),
           ([lp[k] + cn1[k] for k in range(3)], cn2, dirs2),
           ([lp[k] + cn2[k] for k in range(3)], cn1, dirs2)]
  for la, lb, lex in lines:
    for q in (0, 1):
      denom_ok = jnp.abs(lb[q]) > 1e-9
      br = 1.0 / jnp.where(denom_ok, lb[q], 1.0)
      for j in (-1.0, 1.0):
        l_ = ss[q] * j
        c1_ = (l_ - la[q]) * br
        c2_ = la[1 - q] + lb[1 - q] * c1_
        valid = (lex & denom_ok & (c1_ >= 0) & (c1_ <= 1) &
                 (jnp.abs(c2_) <= ss[1 - q]))
        f_pts.append([la[k] + c1_ * lb[k] for k in range(3)])
        f_valid.append(valid)
  # (b) rect corners inside the incident face parallelogram: 4 slots
  ax_, bx_ = cn1[0], cn2[0]
  ay_, by_ = cn1[1], cn2[1]
  det = ax_ * by_ - bx_ * ay_
  cdet = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
  for i in range(4):
    llx = lx if i // 2 else -lx
    lly = ly if i % 2 else -ly
    x = llx - lp[0]
    y = lly - lp[1]
    u = (x * by_ - y * bx_) * cdet
    v = (y * ax_ - x * ay_) * cdet
    valid = dirs2 & (u > 0) & (v > 0) & (u < 1) & (v < 1)
    f_pts.append([llx, lly, lp[2] + u * cn1[2] + v * cn2[2]])
    f_valid.append(valid)
  # (c) incident-face corners inside the rect: 4 slots
  for i in range(4):
    exist = dirs2 | (i < 2)
    tmpv = [lp[k] + (i & 1) * cn1[k] + (1.0 if i & 2 else 0.0) * cn2[k]
            for k in range(3)]
    valid = exist & (tmpv[0] > -lx) & (tmpv[0] < lx) & (
        tmpv[1] > -ly) & (tmpv[1] < ly)
    f_pts.append(tmpv)
    f_valid.append(valid)

  f_depth = [pt[2] for pt in f_pts]
  f_valid = [v & (pt[2] <= marg) for v, pt in zip(f_valid, f_pts)]
  # world transform: rw = (bi ? m2 : m1) @ rotmore.T
  msel = [jnp.where(bi, M2[k], M1[k]) for k in range(9)]
  rmT = [rotmore[3 * j + i] for i in range(3) for j in range(3)]
  rw_f = m_mul(msel, rmT)
  pw = [jnp.where(bi, P2[k], P1[k]) for k in range(3)]
  fsign = jnp.where(bi, -1.0, 1.0)
  f_normal = [fsign * rw_f[3 * k + 2] for k in range(3)]
  f_world = []
  for pt in f_pts:
    loc = [pt[0], pt[1], pt[2] * 0.5 + hz]
    f_world.append([rw_f[3 * k] * loc[0] + rw_f[3 * k + 1] * loc[1] +
                    rw_f[3 * k + 2] * loc[2] + pw[k] for k in range(3)])

  # ---- edge case (collision_box._edge_case) ----
  code = jnp.clip(axis_code - 12.0, 0.0, 8.0)
  edge1 = jnp.floor(code / 3.0)
  edge2 = code - 3.0 * edge1
  e2b1 = jnp.floor(edge2 / 2.0)            # edge2 bit1 (edge2 & 2)/2
  e2b0 = edge2 - 2.0 * e2b1                # edge2 & 1
  ax1 = 1.0 - e2b0
  ax2 = 2.0 - 2.0 * e2b1
  # rot21abs row edge1
  r21_e1 = [sel3(edge1, A21[0 + k], A21[3 + k], A21[6 + k])
            for k in range(3)]
  swap2 = (sel3(ax1, r21_e1[0], r21_e1[1], r21_e1[2]) <
           sel3(ax2, r21_e1[0], r21_e1[1], r21_e1[2]))
  ax1, ax2 = (jnp.where(swap2, ax2, ax1), jnp.where(swap2, ax1, ax2))
  e1b1 = jnp.floor(edge1 / 2.0)
  e1b0 = edge1 - 2.0 * e1b1
  pax1 = 1.0 - e1b0
  pax2 = 2.0 - 2.0 * e1b1
  # rot12abs row edge2 = rot21abs column edge2
  r12_e2 = [sel3(edge2, A21[3 * k + 0], A21[3 * k + 1], A21[3 * k + 2])
            for k in range(3)]
  swap1 = (sel3(pax1, r12_e2[0], r12_e2[1], r12_e2[2]) <
           sel3(pax2, r12_e2[0], r12_e2[1], r12_e2[2]))
  pax1, pax2 = (jnp.where(swap1, pax2, pax1),
                jnp.where(swap1, pax1, pax2))

  bit1 = sel3(pax2, cle1b[0], cle1b[1], cle1b[2])
  rm_idx = jnp.where(bit1 > 0.5, pax2, pax2 + 3.0)
  rotmore_e = rotmore_of(rm_idx)
  p_e = mv(rotmore_e, pos21)
  rnorm = mv(rotmore_e, clnorm)
  r_e = m_mul(rotmore_e, R21)
  rt_e = [r_e[3 * j + i] for i in range(3) for j in range(3)]
  rmT_e = [rotmore_e[3 * j + i] for i in range(3) for j in range(3)]
  s_e = [jnp.abs(v) for v in mv(rmT_e, S1)]
  lx_e, ly_e, hz_e = s_e[0], s_e[1], s_e[2]
  p_e = [p_e[0], p_e[1], p_e[2] - hz_e]

  def sgn_bits(bits, a):
    bit = sel3(a, bits[0], bits[1], bits[2])
    return jnp.where(bit > 0.5, 1.0, -1.0)

  rt_ax1 = [sel3(ax1, rt_e[0 + k], rt_e[3 + k], rt_e[6 + k])
            for k in range(3)]
  rt_ax2 = [sel3(ax2, rt_e[0 + k], rt_e[3 + k], rt_e[6 + k])
            for k in range(3)]
  rt_ee2 = [sel3(edge2, rt_e[0 + k], rt_e[3 + k], rt_e[6 + k])
            for k in range(3)]
  s2_ax1 = sel3(ax1, S2[0], S2[1], S2[2])
  s2_ax2 = sel3(ax2, S2[0], S2[1], S2[2])
  s2_e2 = sel3(edge2, S2[0], S2[1], S2[2])

  sc1 = sgn_bits(cle2b, ax1)
  sc2 = sgn_bits(cle2b, ax2)
  pt0 = [p_e[k] + rt_ax1[k] * s2_ax1 * sc1 + rt_ax2[k] * s2_ax2 * sc2
         for k in range(3)]
  pt1 = [pt0[k] - rt_ee2[k] * s2_e2 for k in range(3)]
  pt0 = [pt0[k] + rt_ee2[k] * s2_e2 for k in range(3)]
  pt2 = [p_e[k] - rt_ax1[k] * s2_ax1 * sc1 + rt_ax2[k] * s2_ax2 * sc2
         for k in range(3)]
  pt3 = [pt2[k] - rt_ee2[k] * s2_e2 for k in range(3)]
  pt2 = [pt2[k] + rt_ee2[k] * s2_e2 for k in range(3)]
  quad = [pt0, pt1, pt2, pt3]

  axi_lp = quad[0]
  axi_cn1 = [quad[1][k] - quad[0][k] for k in range(3)]
  axi_cn2 = [quad[2][k] - quad[0][k] for k in range(3)]

  norm_ok = jnp.abs(rnorm[2]) >= 1e-9
  isign = jnp.where(inv, -1.0, 1.0)
  innorm = isign / jnp.where(norm_ok, rnorm[2], 1.0)

  proj = []
  for ptq in quad:
    c_scl = ptq[2] * isign * innorm
    proj.append([ptq[k] - rnorm[k] * c_scl for k in range(3)])
  pts_lp = proj[0]
  pts_cn1 = [proj[1][k] - proj[0][k] for k in range(3)]
  pts_cn2 = [proj[2][k] - proj[0][k] for k in range(3)]

  e_pts = []
  e_depth = []
  e_valid = []
  lines2 = [(pts_lp, pts_cn1, axi_lp, axi_cn1),
            (pts_lp, pts_cn2, axi_lp, axi_cn2),
            ([pts_lp[k] + pts_cn1[k] for k in range(3)], pts_cn2,
             [axi_lp[k] + axi_cn1[k] for k in range(3)], axi_cn2),
            ([pts_lp[k] + pts_cn2[k] for k in range(3)], pts_cn1,
             [axi_lp[k] + axi_cn2[k] for k in range(3)], axi_cn1)]
  for la2, lb2, lua, lub in lines2:
    for q in (0, 1):
      lb_q = lb2[q]
      denom_ok = jnp.abs(lb_q) > 1e-9
      br = 1.0 / jnp.where(denom_ok, lb_q, 1.0)
      for j in (-1.0, 1.0):
        l_ = s_e[q] * j
        c1_ = (l_ - la2[q]) * br
        c2_ = la2[1 - q] + lb2[1 - q] * c1_
        zval = (lua[2] + lub[2] * c1_) * innorm
        valid = (denom_ok & (c1_ >= 0) & (c1_ <= 1) &
                 (jnp.abs(c2_) <= s_e[1 - q]) & (zval <= marg))
        pt = [lua[k] * 0.5 + c1_ * lub[k] * 0.5 for k in range(3)]
        pt[q] = pt[q] + 0.5 * l_
        pt[1 - q] = pt[1 - q] + 0.5 * c2_
        e_pts.append(pt)
        e_depth.append(pt[2] * innorm * 2.0)
        e_valid.append(valid)
  nl_cnt = sum(B(v) for v in e_valid)

  # (b) rect corners against the projected quad: 4 slots
  ax_, bx_ = pts_cn1[0], pts_cn2[0]
  ay_, by_ = pts_cn1[1], pts_cn2[1]
  det = ax_ * by_ - bx_ * ay_
  cdet = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
  nf_cnt = zero
  corner_accepts = []
  corner_data = []
  for i in range(4):
    llx = lx_e if i // 2 else -lx_e
    lly = ly_e if i % 2 else -ly_e
    x = llx - pts_lp[0]
    y = lly - pts_lp[1]
    u = (x * by_ - y * bx_) * cdet
    v = (y * ax_ - x * ay_) * cdet
    inside_loose = ~(((u < 0) | (u > 1)) & ((v < 0) | (v > 1)))
    inside_strict = (u >= 0) & (v >= 0) & (u <= 1) & (v <= 1)
    accept = jnp.where(nl_cnt == 0, inside_loose, inside_strict)
    uc = jnp.clip(u, 0.0, 1.0)
    vc = jnp.clip(v, 0.0, 1.0)
    wc = 1.0 - uc - vc
    vtmp = [quad[0][k] * wc + quad[1][k] * uc + quad[2][k] * vc
            for k in range(3)]
    ptc = [llx, lly, zero]
    dvec = [ptc[k] - vtmp[k] for k in range(3)]
    tc1 = dvec[0] ** 2 + dvec[1] ** 2 + dvec[2] ** 2
    accept = accept & ~((vtmp[2] > 0) & (tc1 > marg * marg))
    corner_accepts.append(accept)
    corner_data.append((ptc, vtmp, tc1))
  nf_cnt = sum(B(a) for a in corner_accepts)
  for accept, (ptc, vtmp, tc1) in zip(corner_accepts, corner_data):
    e_pts.append([0.5 * (ptc[k] + vtmp[k]) for k in range(3)])
    e_depth.append(jnp.sqrt(jnp.maximum(tc1, 0.0)) *
                   jnp.where(vtmp[2] < 0, -1.0, 1.0))
    e_valid.append(accept)

  # (c) projected box2-face corners against the rect: 4 slots
  for i in range(4):
    pui = quad[i]
    x, y = pui[0], pui[1]
    inside_loose = ~(((x < -lx_e) | (x > lx_e)) &
                     ((y < -ly_e) | (y > ly_e)))
    inside_strict = (x >= -lx_e) & (x <= lx_e) & (y >= -ly_e) & (
        y <= ly_e)
    accept = jnp.where((nl_cnt == 0) & (nf_cnt != 0), inside_loose,
                       inside_strict)
    c1v = zero
    tmp_p = [x, y, zero]
    for jq in range(2):
      below = pui[jq] < -s_e[jq]
      above = pui[jq] > s_e[jq]
      c1v = c1v + jnp.where(below, (pui[jq] + s_e[jq]) ** 2,
                            jnp.where(above, (pui[jq] - s_e[jq]) ** 2,
                                      0.0))
      tmp_p[jq] = jnp.where(below, -s_e[jq] * 0.5,
                            jnp.where(above, s_e[jq] * 0.5, tmp_p[jq]))
    c1v = c1v + (pui[2] * innorm) ** 2
    accept = accept & ~((pui[2] > 0) & (c1v > marg * marg))
    e_pts.append([(tmp_p[k] + pui[k]) * 0.5 for k in range(3)])
    e_depth.append(jnp.sqrt(jnp.maximum(c1v, 0.0)) *
                   jnp.where(pui[2] < 0, -1.0, 1.0))
    e_valid.append(accept)

  e_valid = [v & norm_ok for v in e_valid]
  rw_e = m_mul(M1, rmT_e)
  e_normal_loc = mv(rw_e, rnorm)
  e_normal = [isign * e_normal_loc[k] for k in range(3)]
  e_world = []
  for pt in e_pts:
    loc = [pt[0], pt[1], pt[2] + hz_e]
    e_world.append([rw_e[3 * k] * loc[0] + rw_e[3 * k + 1] * loc[1] +
                    rw_e[3 * k + 2] * loc[2] + P1[k] for k in range(3)])

  # ---- combine + top-8 (collision_box.box_box tail) ----
  is_face = axis_code < 12.0
  depth24 = [jnp.where(is_face, f_depth[i], e_depth[i]) for i in range(24)]
  world24 = [[jnp.where(is_face, f_world[i][k], e_world[i][k])
              for k in range(3)] for i in range(24)]
  valid24 = [jnp.where(is_face, f_valid[i], e_valid[i]) & ~fail
             for i in range(24)]
  normal = [jnp.where(is_face, f_normal[k], e_normal[k])
            for k in range(3)]
  fr9 = _make_frame_elem(normal[0], normal[1], normal[2])

  keys = [jnp.where(valid24[i], -depth24[i], -3e38) for i in range(24)]
  # stable descending ranks over the 24 candidates (top_k order)
  ranks = [zero for _ in range(24)]
  for i in range(24):
    for j in range(i + 1, 24):
      ge = B((keys[i] > keys[j]) | (keys[i] == keys[j]))
      ranks[j] = ranks[j] + ge
      ranks[i] = ranks[i] + 1.0 - ge

  # slot selection batched over all pairs, then sliced per pair
  slots = []
  for s in range(8):
    dist_s = zero
    pos_s = [zero, zero, zero]
    val_s = zero
    for i in range(24):
      pick = B(ranks[i] == float(s))
      dist_s = dist_s + pick * depth24[i]
      pos_s = [pos_s[k] + pick * world24[i][k] for k in range(3)]
      val_s = val_s + pick * B(valid24[i])
    ok_s = val_s > 0.5
    slots.append((jnp.where(ok_s, dist_s, _BIG),
                  [v * ok_s for v in pos_s]))
  out = {}
  for p, (g1, g2) in enumerate(pairs):
    frame_p = jnp.concatenate([fv[p:p + 1] for fv in fr9], axis=0)
    entries = []
    for s in range(8):
      dist_c = slots[s][0][p:p + 1]
      pos_c = jnp.concatenate([v[p:p + 1] for v in slots[s][1]], axis=0)
      entries.append((dist_c, pos_c, frame_p))
    out[(g1, g2)] = entries
  return out


def _collide(t1, t2, p1, R1, p2, R2, s1, s2):
  """Lane-form primitive colliders; returns list of (dist, pos, frame9)
  — one entry per contact candidate of the pair. R* are (9, L)
  row-major rotation blocks. Mirrors collision_primitive.* lane for
  lane (identical candidate order and math)."""
  z1 = _rcol(R1, 2)
  z2 = _rcol(R2, 2)
  if (t1, t2) == (GeomType.PLANE, GeomType.BOX):
    # collision_primitive.plane_box: the 4 deepest of the 8 corners,
    # top_k order (depth-sorted, stable)
    n = z1
    dists, poss = [], []
    for sx in (-1.0, 1.0):
      for sy in (-1.0, 1.0):
        for sz in (-1.0, 1.0):
          loc = jnp.concatenate([
              jnp.full((1, p1.shape[-1]), sx * s2[0], p1.dtype),
              jnp.full((1, p1.shape[-1]), sy * s2[1], p1.dtype),
              jnp.full((1, p1.shape[-1]), sz * s2[2], p1.dtype)], axis=0)
          corner = p2 + _rvec(R2, loc)
          dd = _dot3(corner - p1, n)
          dists.append(dd)
          poss.append(corner)
    ranks = _stable_ranks([-dd for dd in dists])
    frame = _make_frame(n)
    out = []
    for s in range(4):
      dist_s = jnp.zeros_like(dists[0])
      pos_s = jnp.zeros_like(poss[0])
      for i in range(8):
        pick = (ranks[i] == float(s)).astype(dists[0].dtype)
        dist_s = dist_s + pick * dists[i]
        pos_s = pos_s + pick * poss[i]
      pos_s = pos_s - 0.5 * dist_s * n
      out.append((dist_s, pos_s, frame))
    return out
  if (t1, t2) == (GeomType.SPHERE, GeomType.BOX):
    # collision_primitive.sphere_box
    c = _rtvec(R2, p1 - p2)
    hx = jnp.full_like(c[0:1], s2[0])
    hy = jnp.full_like(c[0:1], s2[1])
    hz = jnp.full_like(c[0:1], s2[2])
    ox, oy, oz, nx, ny, nz, sd = _point_box_sd(
        c[0:1], c[1:2], c[2:3], hx, hy, hz)
    dist = sd - s1[0]
    n_world = _rvec(R2, jnp.concatenate([nx, ny, nz], axis=0))
    closest = jnp.concatenate([ox, oy, oz], axis=0)
    pos = p2 + _rvec(R2, closest) + 0.5 * dist * n_world
    return [(dist, pos, _make_frame(-n_world))]
  if (t1, t2) == (GeomType.PLANE, GeomType.SPHERE):
    n = z1
    cdist = _dot3(p2 - p1, n)
    dist = cdist - s2[0]
    pos = p2 - n * (s2[0] + 0.5 * dist)
    return [(dist, pos, _make_frame(n))]
  if (t1, t2) == (GeomType.PLANE, GeomType.CAPSULE):
    n = z1
    out = []
    for e in (1.0, -1.0):
      end = p2 + z2 * (e * s2[1])
      cdist = _dot3(end - p1, n)
      dist = cdist - s2[0]
      pos = end - n * (s2[0] + 0.5 * dist)
      out.append((dist, pos, _make_frame(n)))
    return out
  if (t1, t2) == (GeomType.SPHERE, GeomType.SPHERE):
    return _sphere_like(p2 - p1, s1[0], s2[0], p1)
  if (t1, t2) == (GeomType.SPHERE, GeomType.CAPSULE):
    seg = z2 * s2[1]
    pt = _closest_seg_point(p2 - seg, p2 + seg, p1)
    return _sphere_like(pt - p1, s1[0], s2[0], p1)
  if (t1, t2) == (GeomType.CAPSULE, GeomType.CAPSULE):
    seg1 = z1 * s1[1]
    seg2 = z2 * s2[1]
    pa, pb = _closest_seg_seg(p1 - seg1, p1 + seg1, p2 - seg2, p2 + seg2)
    return _sphere_like(pb - pa, s1[0], s2[0], pa)
  raise NotImplementedError((t1, t2))


def _kbi(solref, solimp, pos_imp, timestep, refsafe):
  """constraint._kbi in lane form; solref (2,L), solimp (5,L)."""
  timeconst = solref[0:1]
  dampratio = solref[1:2]
  dmin = jnp.clip(solimp[0:1], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[1:2], _MINIMP, _MAXIMP)
  width = jnp.maximum(solimp[2:3], _MINVAL)
  mid = jnp.clip(solimp[3:4], _MINIMP, _MAXIMP)
  power = jnp.maximum(solimp[4:5], 1.0)
  if refsafe:
    timeconst = jnp.maximum(timeconst, 2.0 * timestep)
  dmax_sq = dmax * dmax
  k = 1.0 / jnp.maximum(dmax_sq * timeconst * timeconst * dampratio *
                        dampratio, _MINVAL)
  b = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k = jnp.where(solref[0:1] <= 0, -solref[0:1] / dmax_sq, k)
  b = jnp.where(solref[1:2] <= 0, -solref[1:2] / dmax, b)
  imp_x = jnp.abs(pos_imp) / width
  imp_a = (1.0 / mid ** (power - 1.0)) * imp_x ** power
  imp_b = 1.0 - (1.0 / (1.0 - mid) ** (power - 1.0)) * (
      1.0 - imp_x) ** power
  imp_y = jnp.where(imp_x < mid, imp_a, imp_b)
  imp = jnp.clip(dmin + imp_y * (dmax - dmin), dmin, dmax)
  imp = jnp.where(imp_x > 1.0, dmax, imp)
  return k, b, imp


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _build_static(m: Model, nconmax: int):
  """Static candidate metadata (python lists) + layout."""
  from .. import io as io_mod
  cands = []  # (t1, t2, g1, g2, sub_k_index, pid)
  for t1, t2, glist in m.collision_pairs:
    from .. import collision_primitive
    k = collision_primitive.MAX_CONTACTS.get((t1, t2), 1)
    for (g1, g2, pid) in glist:
      for kk in range(k):
        cands.append((t1, t2, g1, g2, kk, pid))
  ne, nf, nl, stride, njmax = io_mod.efc_layout(m, nconmax)
  fr_dofs = [i for i in range(m.nv) if m.dof_hasfrictionloss[i]]
  assert nf == len(fr_dofs)          # tendon friction gated by supports()
  limits = [j for j in range(m.njnt) if m.jnt_limited[j]]
  return cands, fr_dofs, limits, ne, nf, nl, stride, njmax


def _eq_static(m: Model):
  """Numpy-only static equality metadata (reference constraint.py:125:
  connect/weld/joint; tendon/flex gated out by supports())."""
  from ..types import EqType
  if not m.neq:
    return []
  data_np = np.asarray(jax.device_get(m.eq_data))  # pallas-lint: ok(kernel-build time)
  sr_np = np.asarray(jax.device_get(m.eq_solref))  # pallas-lint: ok(kernel-build time)
  si_np = np.asarray(jax.device_get(m.eq_solimp))  # pallas-lint: ok(kernel-build time)
  binvw = np.asarray(jax.device_get(m.body_invweight0))  # pallas-lint: ok(kernel-build time)
  dinvw = np.asarray(jax.device_get(m.dof_invweight0))  # pallas-lint: ok(kernel-build time)
  qpos0_np = np.asarray(jax.device_get(m.qpos0))  # pallas-lint: ok(kernel-build time)
  rootid = [int(r) for r in m.body_rootid]
  out = []
  for i in range(m.neq):
    etype = m.eq_type[i]
    o1, o2 = int(m.eq_obj1id[i]), int(m.eq_obj2id[i])
    em = dict(type=int(etype), i=i, o1=o1, o2=o2,
              data=tuple(float(x) for x in data_np[i]),
              solref=tuple(float(x) for x in sr_np[i]),
              solimp=tuple(float(x) for x in si_np[i]))
    if etype in (EqType.CONNECT, EqType.WELD):
      em['root1'], em['root2'] = rootid[o1], rootid[o2]
      em['invw_t'] = float(binvw[o1, 0] + binvw[o2, 0])
      em['invw_r'] = float(binvw[o1, 1] + binvw[o2, 1])
      em['nrow'] = 3 if etype == EqType.CONNECT else 6
    else:  # JOINT
      d1, q1 = int(m.jnt_dofadr[o1]), int(m.jnt_qposadr[o1])
      em['d1'], em['q1'] = d1, q1
      em['qpos0_1'] = float(qpos0_np[q1])
      if o2 > -1:
        d2, q2 = int(m.jnt_dofadr[o2]), int(m.jnt_qposadr[o2])
        em['d2'], em['q2'] = d2, q2
        em['qpos0_2'] = float(qpos0_np[q2])
        em['invw'] = float(dinvw[d1] + dinvw[d2])
      else:
        em['d2'] = -1
        em['invw'] = float(dinvw[d1])
      em['nrow'] = 1
    out.append(em)
  return out


# Kernel closures are expensive to build (static unroll over the pair
# list) and MUST be built from numpy-only statics: make_contact_kernel is
# called from inside the jit trace of step_batched, where any jnp op —
# even on concrete closed-over Model arrays — stages out to a tracer
# (round-2 bench crash, BENCH_r02.json). The cache also stops per-retrace
# rebuilds. Values keep a strong ref to the Model so ids can't be reused.
_KERNEL_CACHE: dict = {}


def make_contact_kernel(m: Model, nconmax: int):
  """Builds (kernel_fn, wrapper_meta) for this model's static pair
  list. Returns a jitted callable:
  (qpos, qvel, geom_xpos, geom_xmat, subtree_com, cdof, ptab, scal)
  -> dict of contact-pool + efc outputs (batch-first).

  All statics are computed with numpy (never jnp): this function runs
  inside jit traces, where jnp ops on concrete arrays become tracers."""
  key = (id(m), nconmax)
  hit = _KERNEL_CACHE.get(key)
  if hit is not None and hit[0] is m:
    return hit[1], hit[2]
  cands, fr_dofs, limits, ne, nf, nl, stride, njmax = _build_static(
      m, nconmax)
  eq_meta = _eq_static(m)
  eq_disabled = bool(m.opt.disableflags & DisableBit.EQUALITY)
  ncand = len(cands)
  K = nconmax
  nv, nb, ng = m.nv, m.nbody, max(m.ngeom, 1)
  nq = m.nq
  dof_anc = np.asarray(jax.device_get(m.body_dof_ancestor_mask),
                       np.float32)                      # (nb, nv) static
  rootid = [int(r) for r in m.body_rootid]
  geom_bodyid = [int(b) for b in m.geom_bodyid]
  refsafe = not (m.opt.disableflags & DisableBit.REFSAFE)
  condim_max = m.condim_max
  geom_size_np = np.asarray(jax.device_get(m.geom_size))
  jnt_range_np = np.asarray(jax.device_get(m.jnt_range))
  jnt_margin_np = np.asarray(jax.device_get(m.jnt_margin))
  # static per-candidate margins (box-box SAT needs them in-kernel) —
  # pure numpy, mirroring _candidate_params' margin mixing (max of geom
  # margins; explicit <pair> candidates take pair_margin)
  _g1s = np.array([c[2] for c in cands], np.int64)
  _g2s = np.array([c[3] for c in cands], np.int64)
  _pids = np.array([c[5] for c in cands], np.int64)
  geom_margin_np = np.asarray(jax.device_get(m.geom_margin))
  cand_margin_np = np.maximum(geom_margin_np[_g1s], geom_margin_np[_g2s])
  if (_pids >= 0).any():
    pair_margin_np = np.asarray(jax.device_get(m.pair_margin))
    cand_margin_np = np.where(
        _pids >= 0, pair_margin_np[np.maximum(_pids, 0)], cand_margin_np)

  # per-candidate static rows used inside the kernel
  b1s = [geom_bodyid[c[2]] for c in cands]
  b2s = [geom_bodyid[c[3]] for c in cands]
  root1 = [rootid[b] for b in b1s]
  root2 = [rootid[b] for b in b2s]
  distinct_roots = sorted(set(root1) | set(root2))

  # P-table row layout (built traced in the wrapper)
  # 0:5 friction5 | 5:7 solref | 7:12 solimp | 12 margin
  # | 13 includemargin | 14 condim | 15 invw | 16 invw_pyr
  # | 17:17+nv maskdiff | +nv mask1 | 2 slots g1,g2 | 3 com-root group
  P_FR = 0
  P_SOLREF = 5
  P_SOLIMP = 7
  P_MARGIN = 12
  P_INCL = 13
  P_CONDIM = 14
  P_INVW = 15
  P_INVWP = 16
  P_MD = 17
  P_M1 = 17 + nv
  P_G1 = 17 + 2 * nv
  P_G2 = P_G1 + 1
  P_ROOT1 = P_G2 + 1                     # len(distinct_roots) one-hot rows
  P_ROOT2 = P_ROOT1 + len(distinct_roots)
  P = P_ROOT2 + len(distinct_roots)

  lim_meta = []
  for j in limits:
    lim_meta.append((int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j]),
                     float(jnt_range_np[j][0]), float(jnt_range_np[j][1]),
                     float(jnt_margin_np[j]), j))
  fr_disabled = bool(m.opt.disableflags & DisableBit.FRICTIONLOSS)

  def kernel(scal_ref, qpos_ref, qvel_ref, gx_ref, gm_ref, com_ref,
             cdof_ref, xpos_ref, xquat_ref, eqact_ref, eqm_ref,
             ptab_ref, lim_ref, dinv_ref,
             cd_out, cp_out, cf_out, cfr_out, csr_out, csrf_out,
             csi_out, cim_out, cdim_out, cg_out, efcj_out, efcd_out,
             efcaref_out, efcpos_out, efcmargin_out, efcvel_out,
             efcfl_out, efctype_out, efcid_out, efcact_out, ncon_out,
             ncoll_out, dist_scr, pos_scr, frame_scr, key_scr):
    L = qpos_ref.shape[-1]
    dt = jnp.float32
    timestep = scal_ref[0, 0]
    impratio = scal_ref[1, 0]
    ptab_hi = ptab_ref[...].astype(jnp.bfloat16).astype(jnp.float32)
    ptab_lo = ptab_ref[...] - ptab_hi

    # ---- narrowphase: all candidates, statically unrolled ----
    cb_pairs = []
    bb_pairs, bb_margins = [], []
    for idx, (t1, t2, g1, g2, kk, pid) in enumerate(cands):
      if kk > 0:
        continue
      if (t1, t2) == (GeomType.CAPSULE, GeomType.BOX):
        cb_pairs.append((g1, g2))
      elif (t1, t2) == (GeomType.BOX, GeomType.BOX):
        bb_pairs.append((g1, g2))
        bb_margins.append(float(cand_margin_np[idx]))
    cb_results = (_capsule_box_batch(cb_pairs, gx_ref, gm_ref,
                                     geom_size_np) if cb_pairs else {})
    bb_results = (_box_box_batch(bb_pairs, bb_margins, gx_ref, gm_ref,
                                 geom_size_np) if bb_pairs else {})

    # NOTE(r4): a per-candidate pl.when skip gate (bounding-sphere test,
    # write-miss-then-conditionally-overwrite) was tried here and made
    # the kernel ~85% SLOWER on humanoid@8192 (step.1 1239 -> 2289 us):
    # Mosaic's scheduler loses software pipelining across scf.if
    # regions, which costs more than the skipped collider math. Keep
    # the straight-line unroll.
    ci = 0
    for (t1, t2, g1, g2, kk, pid) in cands:
      if kk > 0:
        continue  # slots kk>0 are filled by the kk==0 expansion below
      p1 = gx_ref[g1]
      p2 = gx_ref[g2]
      s1 = [float(x) for x in geom_size_np[g1]]
      s2 = [float(x) for x in geom_size_np[g2]]
      if (t1, t2) == (GeomType.CAPSULE, GeomType.BOX):
        outs = cb_results[(g1, g2)]
      elif (t1, t2) == (GeomType.BOX, GeomType.BOX):
        outs = bb_results[(g1, g2)]
      else:
        outs = _collide(t1, t2, p1, gm_ref[g1], p2, gm_ref[g2], s1, s2)
      for (dist, pos, fr) in outs:
        dist_scr[ci] = dist[0]
        pos_scr[ci] = pos
        # store the NORMAL only: every collider's frame is
        # _make_frame(normal), so the K-slot loop reconstructs the
        # tangents from the selected normal (~35 (1,L) VPU ops) instead
        # of selecting 9 rows with (ncand, L) masked reductions — 6 of
        # 13 per-slot payload reductions gone
        frame_scr[ci] = fr[0:3]
        ci += 1
    assert ci == ncand

    # ---- activity + slot ranks (order-preserving compaction: the
    # XLA path's "active candidates keep original order" top_k) ----
    nactive = jnp.zeros((1, L), dt)
    for c in range(ncand):
      marg = ptab_ref[P_MARGIN, c]
      active = (dist_scr[c] < marg).astype(dt)
      # inactive sentinel must never equal a slot index in [0, K)
      key_scr[c] = jnp.where(active > 0.5, nactive[0], -1.0)
      nactive = nactive + active[None]
    ncoll_out[...] = nactive.astype(jnp.int32)

    # ---- dof-friction rows (rows 0..nf-1; layout: ne|nf|nl|contacts,
    # reference constraint row order — constraint.py friction group) ----
    zero_nv = jnp.zeros((nv, L), dt)
    one_l = jnp.ones((1, L), dt)
    for fi, dadr in enumerate(fr_dofs):
      row_f = ne + fi
      sr = lim_ref[fi, 0:2][:, None] * one_l
      si = lim_ref[fi, 2:7][:, None] * one_l
      invw = lim_ref[fi, 7:8][:, None] * one_l
      flv = lim_ref[fi, 8:9][:, None] * one_l
      k, b, imp = _kbi(sr, si, jnp.zeros((1, L), dt), timestep, refsafe)
      act = 0.0 if fr_disabled else 1.0
      dval = 1.0 / jnp.maximum(invw * (1.0 - imp) / imp, _MINVAL) * act
      vel = qvel_ref[dadr:dadr + 1]
      aref = (-b * vel) * act
      parts = []
      if dadr > 0:
        parts.append(jnp.zeros((dadr, L), dt))
      parts.append(one_l * act)
      if dadr < nv - 1:
        parts.append(jnp.zeros((nv - dadr - 1, L), dt))
      efcj_out[row_f] = jnp.concatenate(parts, axis=0)
      efcd_out[row_f] = dval[0]
      efcaref_out[row_f] = aref[0]
      efcpos_out[row_f] = jnp.zeros((L,), dt)
      efcmargin_out[row_f] = jnp.zeros((L,), dt)
      efcvel_out[row_f] = vel[0]
      efcfl_out[row_f] = flv[0] * act
      efctype_out[row_f] = jnp.full((L,), ConstraintType.FRICTION_DOF,
                                    jnp.int32)
      efcid_out[row_f] = jnp.full((L,), dadr, jnp.int32)
      efcact_out[row_f] = jnp.full((L,), 0 if fr_disabled else 1,
                                   jnp.int32)

    # ---- limit rows (rows ne+nf..ne+nf+nl-1; lim_ref table has no
    # equality rows, so table reads keep the nf+li0 index) ----
    for li0, (qadr, dadr, lo, hi, lmargin, jid) in enumerate(lim_meta):
      li = ne + nf + li0
      lt = nf + li0
      q = qpos_ref[qadr:qadr + 1]
      dist_min = q - lo
      dist_max = hi - q
      posv = jnp.minimum(dist_min, dist_max) - lmargin
      active = posv < 0
      sign = jnp.where(dist_min < dist_max, 1.0, -1.0)
      parts = []
      if dadr > 0:
        parts.append(jnp.zeros((dadr, L), dt))
      parts.append(sign)
      if dadr < nv - 1:
        parts.append(jnp.zeros((nv - dadr - 1, L), dt))
      jrow = jnp.concatenate(parts, axis=0)
      one_l = jnp.ones((1, L), dt)
      sr = lim_ref[lt, 0:2][:, None] * one_l
      si = lim_ref[lt, 2:7][:, None] * one_l
      invw = lim_ref[lt, 7:8][:, None] * one_l
      k, b, imp = _kbi(sr, si, posv, timestep, refsafe)
      act = active.astype(dt)
      dval = 1.0 / jnp.maximum(invw * (1.0 - imp) / imp, _MINVAL) * act
      vel = sign * qvel_ref[dadr:dadr + 1]
      aref = (-k * imp * posv - b * vel) * act
      efcj_out[li] = jrow
      efcd_out[li] = dval[0]
      efcaref_out[li] = aref[0]
      efcpos_out[li] = (posv + lmargin)[0]
      efcmargin_out[li] = jnp.full((L,), lmargin, dt)
      efcvel_out[li] = vel[0]
      efcfl_out[li] = jnp.zeros((L,), dt)
      efctype_out[li] = jnp.full((L,), ConstraintType.LIMIT_JOINT,
                                 jnp.int32)
      efcid_out[li] = jnp.full((L,), jid, jnp.int32)
      efcact_out[li] = active[0].astype(jnp.int32)

    # cdof/pos/frame split views, hoisted OUT of the K-slot loop: these
    # strided middle-dim reads happen once here instead of per slot
    # (tools/pallas_lint.py PL004)
    CDang = [cdof_ref[:, i, :] for i in range(3)]  # pallas-lint: ok(once)
    CDlin = [cdof_ref[:, 3 + i, :] for i in range(3)]  # pallas-lint: ok(once)
    POSv = [pos_scr[:, i, :] for i in range(3)]  # pallas-lint: ok(once)
    FRv = [frame_scr[:, i, :] for i in range(3)]  # pallas-lint: ok(once)

    # ---- equality rows (rows 0..ne-1; reference constraint.py:125-215,
    # connect/weld/joint — tendon/flex eq gated by supports()) ----
    if eq_meta:
      qvel_all = qvel_ref[...]

      def cvec(vals):                                  # floats -> (k, L)
        return jnp.concatenate(
            [jnp.full((1, L), float(v), dt) for v in vals], axis=0)

      def jacp_dif(off1, off2, m1, m2, r):
        r1, r2 = (r + 1) % 3, (r + 2) % 3
        cr1 = off1[r1:r1 + 1] * CDang[r2] - off1[r2:r2 + 1] * CDang[r1]
        cr2 = off2[r1:r1 + 1] * CDang[r2] - off2[r2:r2 + 1] * CDang[r1]
        return m1 * (CDlin[r] - cr1) - m2 * (CDlin[r] - cr2)

      def eq_row(row, jrow, posr, pos_imp, invw, sr, si, act, eid):
        kk, bb, imp = _kbi(sr, si, pos_imp, timestep, refsafe)
        dval = (1.0 / jnp.maximum(invw * (1.0 - imp) / imp, _MINVAL)
                ) * act
        vel = jnp.sum(jrow * qvel_all, axis=0, keepdims=True)
        aref = (-kk * imp * posr - bb * vel) * act
        efcj_out[row] = jrow
        efcd_out[row] = dval[0]
        efcaref_out[row] = aref[0]
        efcpos_out[row] = posr[0]
        efcmargin_out[row] = jnp.zeros((L,), dt)
        efcvel_out[row] = vel[0]
        efcfl_out[row] = jnp.zeros((L,), dt)
        efctype_out[row] = jnp.full((L,), ConstraintType.EQUALITY,
                                    jnp.int32)
        efcid_out[row] = jnp.full((L,), eid, jnp.int32)
        efcact_out[row] = (act[0] > 0.5).astype(jnp.int32)

    erow = 0
    for e_idx, em in enumerate(eq_meta):
      act = eqact_ref[e_idx:e_idx + 1] * (0.0 if eq_disabled else 1.0)
      sr = cvec(em['solref'])
      si = cvec(em['solimp'])
      if em['type'] in (int(EqType.CONNECT), int(EqType.WELD)):
        b1, b2 = em['o1'], em['o2']
        x1, q1 = xpos_ref[b1], xquat_ref[b1]
        x2, q2 = xpos_ref[b2], xquat_ref[b2]
        m1 = eqm_ref[2 * e_idx][:, None]               # (nv, 1)
        m2 = eqm_ref[2 * e_idx + 1][:, None]
        a1, a2 = em['data'][0:3], em['data'][3:6]
        if em['type'] == int(EqType.CONNECT):
          pos1 = x1 + _qrot(cvec(a1), q1)
          pos2 = x2 + _qrot(cvec(a2), q2)
        else:                                          # WELD anchor swap
          pos1 = x1 + _qrot(cvec(a2), q1)
          pos2 = x2 + _qrot(cvec(a1), q2)
        cpos = pos1 - pos2
        off1 = pos1 - com_ref[em['root1']]
        off2 = pos2 - com_ref[em['root2']]
        if em['type'] == int(EqType.CONNECT):
          pos_imp = jnp.sqrt(jnp.sum(cpos * cpos, axis=0, keepdims=True))
          for r in range(3):
            eq_row(erow + r, jacp_dif(off1, off2, m1, m2, r),
                   cpos[r:r + 1], pos_imp, em['invw_t'], sr, si, act,
                   em['i'])
          erow += 3
        else:
          relpose, ts = em['data'][6:10], em['data'][10]
          quat = _qmul(q1, cvec(relpose))
          quat1 = jnp.concatenate([q2[0:1], -q2[1:4]], axis=0)  # inv
          crotq = _qmul(quat1, quat)
          crot = crotq[1:4] * ts
          pos_imp = jnp.sqrt(
              jnp.sum(cpos * cpos, axis=0, keepdims=True) +
              jnp.sum(crot * crot, axis=0, keepdims=True))
          # linear map col -> 0.5*(quat1 x (0,col) x quat)_vec, built
          # from its action on the basis (3 quaternion products)
          zero1 = jnp.zeros((1, L), dt)
          one1 = jnp.ones((1, L), dt)
          Mcols = []
          for k in range(3):
            ek = [zero1] * 4
            ek[0] = zero1
            ek[1 + k] = one1
            qk = _qmul(quat1, _qmul(jnp.concatenate(ek, axis=0), quat))
            Mcols.append(0.5 * qk[1:4])                # (3, L)
          jacdifr = [ts * (m1 - m2) * CDang[r] for r in range(3)]
          for r in range(3):
            eq_row(erow + r, jacp_dif(off1, off2, m1, m2, r),
                   cpos[r:r + 1], pos_imp, em['invw_t'], sr, si, act,
                   em['i'])
          for r in range(3):
            jdifr = (Mcols[0][r:r + 1] * jacdifr[0] +
                     Mcols[1][r:r + 1] * jacdifr[1] +
                     Mcols[2][r:r + 1] * jacdifr[2])
            eq_row(erow + 3 + r, jdifr, crot[r:r + 1], pos_imp,
                   em['invw_r'], sr, si, act, em['i'])
          erow += 6
      else:                                            # JOINT
        d1 = em['d1']
        q1v = qpos_ref[em['q1']:em['q1'] + 1] - em['qpos0_1']
        if em['d2'] > -1:
          dif = qpos_ref[em['q2']:em['q2'] + 1] - em['qpos0_2']
          c0, c1, c2, c3, c4 = em['data'][0:5]
          rhs = c0 + dif * (c1 + dif * (c2 + dif * (c3 + dif * c4)))
          deriv = c1 + dif * (2 * c2 + dif * (3 * c3 + dif * 4 * c4))
          posr = q1v - rhs
          parts = []
          lo_d, hi_d = min(d1, em['d2']), max(d1, em['d2'])
          row1 = jnp.ones((1, L), dt)
          rowd = -deriv
          first, second = ((row1, rowd) if d1 < em['d2'] else
                           (rowd, row1))
          if lo_d > 0:
            parts.append(jnp.zeros((lo_d, L), dt))
          parts.append(first)
          if hi_d - lo_d > 1:
            parts.append(jnp.zeros((hi_d - lo_d - 1, L), dt))
          parts.append(second)
          if hi_d < nv - 1:
            parts.append(jnp.zeros((nv - hi_d - 1, L), dt))
          jrow = jnp.concatenate(parts, axis=0)
        else:
          posr = q1v - em['data'][0]
          parts = []
          if d1 > 0:
            parts.append(jnp.zeros((d1, L), dt))
          parts.append(jnp.ones((1, L), dt))
          if d1 < nv - 1:
            parts.append(jnp.zeros((nv - d1 - 1, L), dt))
          jrow = jnp.concatenate(parts, axis=0)
        eq_row(erow, jrow, posr, posr, em['invw'], sr, si, act, em['i'])
        erow += 1
    assert erow == ne, (erow, ne)

    ncon = jnp.zeros((1, L), dt)
    ranks = key_scr[...]                                 # (ncand, L)
    # ---- K compaction slots ----
    for s in range(K):
      onehot = (ranks == float(s)).astype(dt)            # (ncand, L)
      slot_valid = jnp.sum(onehot, axis=0, keepdims=True) > 0.5
      ncon = ncon + slot_valid.astype(dt)

      # static params for the selected candidate: ONE MXU matmul
      # bf16-split matmul: the MXU rounds f32 inputs to bf16; with the
      # table split into exact-bf16 high + residual parts, selection by
      # a 0/1 onehot is exact to ~6e-8 relative
      dot = lambda t: jax.lax.dot_general(
          t, onehot, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
      pvals = dot(ptab_hi) + dot(ptab_lo)                # (P, L)

      # dynamic payload via masked reductions
      dist_s = jnp.sum(onehot * dist_scr[...], axis=0, keepdims=True)
      pos_s = jnp.concatenate([
          jnp.sum(onehot * POSv[i], axis=0, keepdims=True)
          for i in range(3)], axis=0)
      fr_s = [jnp.sum(onehot * FRv[i], axis=0, keepdims=True)
              for i in range(3)]

      # com of each side's root (grouped by distinct static root ids)
      com1_s = jnp.zeros((3, L), dt)
      com2_s = jnp.zeros((3, L), dt)
      for ri, r in enumerate(distinct_roots):
        w1 = pvals[P_ROOT1 + ri:P_ROOT1 + ri + 1]
        w2 = pvals[P_ROOT2 + ri:P_ROOT2 + ri + 1]
        com1_s = com1_s + w1 * com_ref[r]
        com2_s = com2_s + w2 * com_ref[r]

      off1 = pos_s - com1_s
      off2 = pos_s - com2_s
      mask_d = pvals[P_MD:P_MD + nv]                     # (nv, L)
      mask_1 = pvals[P_M1:P_M1 + nv]

      def jp_row(f):                                     # f (3, L)
        fl = (f[0:1] * CDlin[0] + f[1:2] * CDlin[1] + f[2:3] * CDlin[2])
        q1 = _cross(f, off1)
        q2 = _cross(f, off2)
        qa1 = (q1[0:1] * CDang[0] + q1[1:2] * CDang[1] +
               q1[2:3] * CDang[2])
        qa2 = (q2[0:1] * CDang[0] + q2[1:2] * CDang[1] +
               q2[2:3] * CDang[2])
        # mask2*(FL - QA2) - mask1*(FL - QA1)
        #   = maskdiff*(FL - QA2) + mask1*(QA1 - QA2)
        return mask_d * (fl - qa2) + mask_1 * (qa1 - qa2)

      def jr_row(f):
        fa = (f[0:1] * CDang[0] + f[1:2] * CDang[1] + f[2:3] * CDang[2])
        return mask_d * fa

      f_n = jnp.concatenate(fr_s[0:3], axis=0)
      # tangents reconstructed from the selected (already-unit) normal:
      # bit-equal to the collider's own _make_frame up to one extra
      # renormalize. Inactive slots have a zero normal; _make_frame's
      # 1e-30 norm guards keep it finite and slot_valid zeroes it out.
      fr9full = _make_frame(f_n)
      f_t1 = fr9full[3:6]
      f_t2 = fr9full[6:9]
      jn = jp_row(f_n)
      jdirs = [jp_row(f_t1), jp_row(f_t2)]
      if condim_max > 3:
        jdirs += [jr_row(f_n), jr_row(f_t1), jr_row(f_t2)]

      dim = pvals[P_CONDIM:P_CONDIM + 1]
      incl = pvals[P_INCL:P_INCL + 1]
      posv = dist_s - incl
      act_con = slot_valid.astype(dt) * (posv < 0).astype(dt)
      fri = pvals[P_FR:P_FR + 5]
      invw = pvals[P_INVW:P_INVW + 1]
      invw_pyr = pvals[P_INVWP:P_INVWP + 1] / jnp.maximum(
          impratio, _MINVAL)
      sr = pvals[P_SOLREF:P_SOLREF + 2]
      si = pvals[P_SOLIMP:P_SOLIMP + 5]
      k, b, imp = _kbi(sr, si, posv, timestep, refsafe)

      base = ne + nf + nl + s * stride
      for r in range(stride):
        kidx = r // 2 + 1
        sign = 1.0 if r % 2 == 0 else -1.0
        frik = fri[kidx - 1:kidx]
        if r == 0:
          is_fl = (dim == 1)
        else:
          is_fl = jnp.zeros_like(dim, bool)
        pyr_exists = (dim > 1) & (r < 2 * (dim - 1))
        exists = act_con * (is_fl | pyr_exists).astype(dt)
        jrow = jnp.where((dim == 1), jn, jn + sign * frik * jdirs[kidx - 1])
        iw = jnp.where(dim == 1, invw, invw_pyr)
        dval = 1.0 / jnp.maximum(iw * (1.0 - imp) / imp, _MINVAL) * exists
        vel = jnp.sum(jrow * qvel_ref[...], axis=0, keepdims=True)
        aref = (-k * imp * posv - b * vel) * exists
        row = base + r
        efcj_out[row] = jrow * exists
        efcd_out[row] = dval[0]
        efcaref_out[row] = aref[0]
        efcpos_out[row] = posv[0] + incl[0]
        efcmargin_out[row] = incl[0]
        efcvel_out[row] = vel[0]
        efcfl_out[row] = jnp.zeros((L,), dt)
        efctype_out[row] = jnp.where(
            dim[0] == 1,
            jnp.full((L,), ConstraintType.CONTACT_FRICTIONLESS,
                     jnp.int32),
            jnp.full((L,), ConstraintType.CONTACT_PYRAMIDAL, jnp.int32))
        efcid_out[row] = jnp.full((L,), s, jnp.int32)
        efcact_out[row] = (exists[0] > 0.5).astype(jnp.int32)

      # contact pool slot outputs
      cd_out[s] = jnp.where(slot_valid, dist_s, _BIG)[0]
      cp_out[s] = pos_s * slot_valid.astype(dt)
      cf_out[s] = jnp.concatenate([f_n, f_t1, f_t2],
                                  axis=0) * slot_valid.astype(dt)
      cfr_out[s] = jnp.where(slot_valid, fri, 1.0)
      csr_out[s] = jnp.where(slot_valid, sr, 0.02)
      csrf_out[s] = pvals[P_SOLREF:P_SOLREF + 2] * 0.0  # solreffriction
      csi_out[s] = jnp.where(slot_valid, si, 0.9)
      cim_out[s] = jnp.where(slot_valid, incl, 0.0)[0]
      cdim_out[s] = jnp.where(slot_valid[0], dim[0], 1.0).astype(
          jnp.int32)
      g1v = jnp.where(slot_valid[0], pvals[P_G1], -1.0)
      g2v = jnp.where(slot_valid[0], pvals[P_G2], -1.0)
      cg_out[s] = jnp.concatenate([g1v[None], g2v[None]],
                                  axis=0).astype(jnp.int32)

    ncon_out[...] = jnp.minimum(ncon, float(K)).astype(jnp.int32)
    # pad rows beyond layout with zeros
    for row in range(ne + nf + nl + K * stride, njmax):
      efcj_out[row] = zero_nv
      efcd_out[row] = jnp.zeros((L,), dt)
      efcaref_out[row] = jnp.zeros((L,), dt)
      efcpos_out[row] = jnp.zeros((L,), dt)
      efcmargin_out[row] = jnp.zeros((L,), dt)
      efcvel_out[row] = jnp.zeros((L,), dt)
      efcfl_out[row] = jnp.zeros((L,), dt)
      efctype_out[row] = jnp.zeros((L,), jnp.int32)
      efcid_out[row] = jnp.zeros((L,), jnp.int32)
      efcact_out[row] = jnp.zeros((L,), jnp.int32)

  eqmask = np.zeros((max(2 * len(eq_meta), 1), nv), np.float32)
  for e_idx, em in enumerate(eq_meta):
    if em['type'] in (int(EqType.CONNECT), int(EqType.WELD)):
      eqmask[2 * e_idx] = dof_anc[em['o1']]
      eqmask[2 * e_idx + 1] = dof_anc[em['o2']]
  meta = dict(cands=cands, limits=limits, lim_meta=lim_meta,
              fr_dofs=fr_dofs, ne=ne, eq_meta=eq_meta, eqmask=eqmask,
              nf=nf, nl=nl,
              stride=stride, njmax=njmax, ncand=ncand, K=K, P=P,
              P_FR=P_FR, P_SOLREF=P_SOLREF, P_SOLIMP=P_SOLIMP,
              P_MARGIN=P_MARGIN, P_INCL=P_INCL, P_CONDIM=P_CONDIM,
              P_INVW=P_INVW, P_INVWP=P_INVWP, P_MD=P_MD, P_M1=P_M1,
              P_G1=P_G1, P_G2=P_G2, P_ROOT1=P_ROOT1, P_ROOT2=P_ROOT2,
              distinct_roots=distinct_roots, b1s=b1s, b2s=b2s,
              root1=root1, root2=root2, dof_anc=dof_anc)
  if len(_KERNEL_CACHE) > 16:
    _KERNEL_CACHE.clear()
  _KERNEL_CACHE[key] = (m, kernel, meta)
  return kernel, meta


def _ptab(m: Model, meta) -> jax.Array:
  """(P, ncand) traced parameter table."""
  from .. import collision_driver as cdrv
  cands = meta['cands']
  g1s = np.array([c[2] for c in cands])
  g2s = np.array([c[3] for c in cands])
  pids = np.array([c[5] for c in cands])
  condims = np.array([cdrv._static_condim(m, c[2], c[3], c[5])
                      for c in cands])
  (friction, solref, solreffriction, solimp, margin, includemargin,
   condim) = cdrv._candidate_params(m, g1s, g2s, condims, pids)
  b1s = np.asarray(meta['b1s'])
  b2s = np.asarray(meta['b2s'])
  invw = m.body_invweight0[b1s, 0] + m.body_invweight0[b2s, 0]
  fri0 = friction[:, 0]
  # pyramid invweight WITHOUT the impratio factor (applied in-kernel
  # from the runtime scalar): constraint._contact_rows_all:402
  invw_pyr = (invw + fri0 * fri0 * invw) * 2.0 * fri0 * fri0
  dof_anc = meta['dof_anc']
  mask1 = jnp.asarray(dof_anc[b1s])                  # (ncand, nv)
  mask2 = jnp.asarray(dof_anc[b2s])
  maskdiff = mask2 - mask1
  roots = meta['distinct_roots']
  r1oh = np.zeros((len(cands), len(roots)), np.float32)
  r2oh = np.zeros((len(cands), len(roots)), np.float32)
  for i, (a, b) in enumerate(zip(meta['root1'], meta['root2'])):
    r1oh[i, roots.index(a)] = 1.0
    r2oh[i, roots.index(b)] = 1.0
  cols = jnp.concatenate([
      friction, solref, solimp, margin[:, None], includemargin[:, None],
      condim.astype(jnp.float32)[:, None], invw[:, None],
      invw_pyr[:, None], maskdiff, mask1,
      jnp.asarray(g1s, jnp.float32)[:, None],
      jnp.asarray(g2s, jnp.float32)[:, None],
      jnp.asarray(r1oh), jnp.asarray(r2oh)], axis=1)  # (ncand, P)
  return cols.T


def _lim_tab(m: Model, meta) -> jax.Array:
  """(nf + nlim, 9) per-row params: friction rows first (solref2,
  solimp5, invweight, frictionloss), then limit rows (frictionloss
  column zero)."""
  rows = []
  for dadr in meta['fr_dofs']:
    rows.append(jnp.concatenate([
        m.dof_solref[dadr], m.dof_solimp[dadr],
        m.dof_invweight0[dadr][None], m.dof_frictionloss[dadr][None]]))
  for (qadr, dadr, lo, hi, lmargin, j) in meta['lim_meta']:
    rows.append(jnp.concatenate([
        m.jnt_solref[j], m.jnt_solimp[j],
        m.dof_invweight0[dadr][None],
        jnp.zeros((1,), jnp.float32)]))
  if not rows:
    return jnp.zeros((1, 9), jnp.float32)
  return jnp.stack(rows)


def contact_efc(m: Model, d, kernel, meta, interpret=False):
  """Run the contact megakernel over the batch; returns updated Data."""
  W = d.qpos.shape[0]
  wpad = -(-W // LANES) * LANES
  dt = d.qpos.dtype
  nv, nb = max(m.nv, 1), m.nbody
  ng = max(m.ngeom, 1)
  nq = m.nq
  ncand, K = meta['ncand'], meta['K']
  nl, njmax, stride = meta['nl'], meta['njmax'], meta['stride']
  nfl = max(meta['nf'] + len(meta['lim_meta']), 1)

  bl = lambda x: jnp.moveaxis(x, 0, -1)
  pad = lambda x: (jnp.pad(x, ((0, 0),) * (x.ndim - 1) +
                           ((0, wpad - W),)) if wpad != W else x)
  gm9 = d.geom_xmat.reshape(W, ng, 9) if m.ngeom else jnp.zeros(
      (W, 1, 9), dt)
  neqr = max(m.neq, 1)
  eq_active = (d.eq_active.astype(dt) if m.neq else
               jnp.zeros((W, 1), dt))
  inputs = [
      jnp.stack([m.opt.timestep.astype(dt).reshape(()),
                 m.opt.impratio.astype(dt).reshape(())])[:, None],
      pad(bl(d.qpos)), pad(bl(d.qvel)),
      pad(bl(d.geom_xpos if m.ngeom else jnp.zeros((W, 1, 3), dt))),
      pad(bl(gm9)), pad(bl(d.subtree_com)), pad(bl(d.cdof)),
      pad(bl(d.xpos)), pad(bl(d.xquat)), pad(bl(eq_active)),
      jnp.asarray(meta['eqmask']),
      _ptab(m, meta), _lim_tab(m, meta),
      jnp.zeros((1, 1), dt),
  ]

  from . import probe as _probe
  _probe.vmem_ok(  # PL006 static estimate of the dominant windows
      f'contact_efc ncand{ncand} njmax{njmax}',
      (ncand, 14, LANES), (njmax, nv + 8, LANES), (ng, 12, LANES),
      (nv, 6, LANES))
  vm = pltpu.VMEM
  const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=vm)
  lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                 memory_space=vm)
  lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                    memory_space=vm)
  in_specs = [const((2, 1)), lane2(nq), lane2(nv), lane3(ng, 3),
              lane3(ng, 9), lane3(nb, 3), lane3(nv, 6),
              lane3(nb, 3), lane3(nb, 4), lane2(neqr),
              const((meta['eqmask'].shape[0], nv)),
              const((meta['P'], ncand)), const((nfl, 9)), const((1, 1))]
  out_meta = [
      ('con_dist', (K,), dt), ('con_pos', (K, 3), dt),
      ('con_frame', (K, 9), dt), ('con_friction', (K, 5), dt),
      ('con_solref', (K, 2), dt), ('con_solreffriction', (K, 2), dt),
      ('con_solimp', (K, 5), dt), ('con_includemargin', (K,), dt),
      ('con_dim', (K,), jnp.int32), ('con_geom', (K, 2), jnp.int32),
      ('efc_J', (njmax, nv), dt), ('efc_D', (njmax,), dt),
      ('efc_aref', (njmax,), dt), ('efc_pos', (njmax,), dt),
      ('efc_margin', (njmax,), dt), ('efc_vel', (njmax,), dt),
      ('efc_frictionloss', (njmax,), dt),
      ('efc_type', (njmax,), jnp.int32), ('efc_id', (njmax,), jnp.int32),
      ('efc_active', (njmax,), jnp.int32),
      ('ncon', (1,), jnp.int32), ('ncollision', (1,), jnp.int32),
  ]
  out_specs = []
  out_shape = []
  for name, shape, odt in out_meta:
    if len(shape) == 1:
      out_specs.append(lane2(shape[0]))
      out_shape.append(jax.ShapeDtypeStruct((shape[0], wpad), odt))
    else:
      out_specs.append(lane3(shape[0], shape[1]))
      out_shape.append(jax.ShapeDtypeStruct(shape + (wpad,), odt))

  outs = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      interpret=interpret,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shape,
      scratch_shapes=[pltpu.VMEM((ncand, LANES), jnp.float32),
                      pltpu.VMEM((ncand, 3, LANES), jnp.float32),
                      pltpu.VMEM((ncand, 3, LANES), jnp.float32),
                      pltpu.VMEM((ncand, LANES), jnp.float32)],
  )(*inputs)

  t2 = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  o = {name: t2(v) for (name, _, _), v in zip(out_meta, outs)}
  nf, ne = meta['nf'], meta['ne']
  efc_address = ne + nf + nl + stride * jnp.arange(K, dtype=jnp.int32)
  valid = o['con_geom'][:, :, 0] >= 0
  con = d.contact.replace(
      dist=o['con_dist'], pos=o['con_pos'],
      frame=o['con_frame'].reshape(W, K, 3, 3),
      friction=o['con_friction'], solref=o['con_solref'],
      solreffriction=o['con_solreffriction'], solimp=o['con_solimp'],
      includemargin=o['con_includemargin'], dim=o['con_dim'],
      geom=o['con_geom'],
      efc_address=jnp.where(valid, efc_address[None, :], -1))
  ne_count = jnp.sum(o['efc_active'][:, :ne], axis=-1)
  nf_count = jnp.sum(o['efc_active'][:, ne:ne + nf], axis=-1)
  nl_count = jnp.sum(o['efc_active'][:, ne + nf:ne + nf + nl], axis=-1)
  return d.replace(
      contact=con, ncon=o['ncon'][:, 0], ncollision=o['ncollision'][:, 0],
      efc_J=o['efc_J'], efc_D=o['efc_D'], efc_aref=o['efc_aref'],
      efc_pos=o['efc_pos'], efc_margin=o['efc_margin'],
      efc_vel=o['efc_vel'], efc_frictionloss=o['efc_frictionloss'],
      efc_type=o['efc_type'], efc_id=o['efc_id'],
      efc_active=o['efc_active'].astype(bool), ne=ne_count, nf=nf_count,
      nl=nl_count,
      nefc=jnp.sum(o['efc_active'], axis=-1))
