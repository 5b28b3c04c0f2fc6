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

from ..types import ConstraintType, GeomType, JointType, Model

LANES = 128
_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999
_BIG = 1e10

_SUPPORTED = {
    (GeomType.PLANE, GeomType.SPHERE), (GeomType.PLANE, GeomType.CAPSULE),
    (GeomType.SPHERE, GeomType.SPHERE),
    (GeomType.SPHERE, GeomType.CAPSULE),
    (GeomType.CAPSULE, GeomType.CAPSULE),
}


def supports(m: Model, d) -> bool:
  """Whether the contact megakernel covers this model (primitive-only
  pairs, pyramidal cone, no equality/friction rows, slide/hinge limits
  only, no tendons)."""
  from ..types import ConeType
  if m.opt.cone != ConeType.PYRAMIDAL:
    return False
  if m.neq or m.ntendon or any(m.dof_hasfrictionloss):
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
  ncand = sum(len(gl) * 2 for _, _, gl in m.collision_pairs)
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


def _collide(t1, t2, p1, z1, p2, z2, s1, s2):
  """Lane-form primitive colliders; returns list of (dist, pos, frame9)
  — one entry per contact candidate of the pair. z* are the frames'
  third columns (the only orientation data these colliders need)."""
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
  assert ne == 0 and nf == 0
  limits = [j for j in range(m.njnt) if m.jnt_limited[j]]
  return cands, limits, nl, stride, njmax


def make_contact_kernel(m: Model, nconmax: int):
  """Builds (kernel_fn, wrapper_meta) for this model's static pair
  list. Returns a jitted callable:
  (qpos, qvel, geom_xpos, geom_xmat, subtree_com, cdof, ptab, scal)
  -> dict of contact-pool + efc outputs (batch-first)."""
  cands, limits, nl, stride, njmax = _build_static(m, nconmax)
  ncand = len(cands)
  K = nconmax
  nv, nb, ng = m.nv, m.nbody, max(m.ngeom, 1)
  nq = m.nq
  dof_anc = np.asarray(jax.device_get(m.body_dof_ancestor_mask),
                       np.float32)                      # (nb, nv) static
  rootid = [int(r) for r in m.body_rootid]
  geom_bodyid = [int(b) for b in m.geom_bodyid]
  from ..types import DisableBit
  refsafe = not (m.opt.disableflags & DisableBit.REFSAFE)
  condim_max = m.condim_max
  geom_size_np = np.asarray(jax.device_get(m.geom_size))
  jnt_range_np = np.asarray(jax.device_get(m.jnt_range))
  jnt_margin_np = np.asarray(jax.device_get(m.jnt_margin))

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

  def kernel(scal_ref, qpos_ref, qvel_ref, gx_ref, gm_ref, com_ref,
             cdof_ref, ptab_ref, lim_ref, dinv_ref,
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
    ci = 0
    for (t1, t2, g1, g2, kk, pid) in cands:
      if kk > 0:
        continue  # slots kk>0 are filled by the kk==0 expansion below
      p1 = gx_ref[g1]
      p2 = gx_ref[g2]
      z1 = jnp.concatenate([gm_ref[g1][2:3], gm_ref[g1][5:6],
                            gm_ref[g1][8:9]], axis=0)
      z2 = jnp.concatenate([gm_ref[g2][2:3], gm_ref[g2][5:6],
                            gm_ref[g2][8:9]], axis=0)
      s1 = [float(x) for x in geom_size_np[g1]]
      s2 = [float(x) for x in geom_size_np[g2]]
      outs = _collide(t1, t2, p1, z1, p2, z2, s1, s2)
      for (dist, pos, fr) in outs:
        dist_scr[ci] = dist[0]
        pos_scr[ci] = pos
        frame_scr[ci] = fr
        ci += 1
    assert ci == ncand

    # ---- activity + slot ranks (order-preserving compaction: the
    # XLA path's "active candidates keep original order" top_k) ----
    nactive = jnp.zeros((1, L), dt)
    for c in range(ncand):
      marg = ptab_ref[P_MARGIN, c]
      active = (dist_scr[c] < marg).astype(dt)
      key_scr[c] = jnp.where(active > 0.5, nactive[0], float(ncand + 1))
      nactive = nactive + active[None]
    ncoll_out[...] = nactive.astype(jnp.int32)

    # ---- limit rows (rows 0..nl-1) ----
    zero_nv = jnp.zeros((nv, L), dt)
    for li, (qadr, dadr, lo, hi, lmargin, jid) in enumerate(lim_meta):
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
      sr = lim_ref[li, 0:2][:, None] * one_l
      si = lim_ref[li, 2:7][:, None] * one_l
      invw = lim_ref[li, 7:8][:, None] * one_l
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

    # cdof split views (contiguous copies once)
    CDang = [cdof_ref[:, i, :] for i in range(3)]       # 3 x (nv, L)
    CDlin = [cdof_ref[:, 3 + i, :] for i in range(3)]

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
          jnp.sum(onehot * pos_scr[:, i, :], axis=0, keepdims=True)
          for i in range(3)], axis=0)
      fr_s = [jnp.sum(onehot * frame_scr[:, i, :], axis=0, keepdims=True)
              for i in range(9)]

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
      f_t1 = jnp.concatenate(fr_s[3:6], axis=0)
      f_t2 = jnp.concatenate(fr_s[6:9], axis=0)
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

      base = nl + s * stride
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
      cf_out[s] = jnp.concatenate(fr_s, axis=0) * slot_valid.astype(dt)
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
    for row in range(nl + K * stride, njmax):
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

  meta = dict(cands=cands, limits=limits, lim_meta=lim_meta, nl=nl,
              stride=stride, njmax=njmax, ncand=ncand, K=K, P=P,
              P_FR=P_FR, P_SOLREF=P_SOLREF, P_SOLIMP=P_SOLIMP,
              P_MARGIN=P_MARGIN, P_INCL=P_INCL, P_CONDIM=P_CONDIM,
              P_INVW=P_INVW, P_INVWP=P_INVWP, P_MD=P_MD, P_M1=P_M1,
              P_G1=P_G1, P_G2=P_G2, P_ROOT1=P_ROOT1, P_ROOT2=P_ROOT2,
              distinct_roots=distinct_roots, b1s=b1s, b2s=b2s,
              root1=root1, root2=root2, dof_anc=dof_anc)
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
  """(nlim, 8) per-limit params: solref2, solimp5, invweight."""
  rows = []
  for (qadr, dadr, lo, hi, lmargin, j) in meta['lim_meta']:
    rows.append(jnp.concatenate([
        m.jnt_solref[j], m.jnt_solimp[j],
        m.dof_invweight0[dadr][None]]))
  if not rows:
    return jnp.zeros((1, 8), jnp.float32)
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
  nlim = max(len(meta['lim_meta']), 1)

  bl = lambda x: jnp.moveaxis(x, 0, -1)
  pad = lambda x: (jnp.pad(x, ((0, 0),) * (x.ndim - 1) +
                           ((0, wpad - W),)) if wpad != W else x)
  gm9 = d.geom_xmat.reshape(W, ng, 9) if m.ngeom else jnp.zeros(
      (W, 1, 9), dt)
  inputs = [
      jnp.stack([m.opt.timestep.astype(dt).reshape(()),
                 m.opt.impratio.astype(dt).reshape(())])[:, None],
      pad(bl(d.qpos)), pad(bl(d.qvel)),
      pad(bl(d.geom_xpos if m.ngeom else jnp.zeros((W, 1, 3), dt))),
      pad(bl(gm9)), pad(bl(d.subtree_com)), pad(bl(d.cdof)),
      _ptab(m, meta), _lim_tab(m, meta),
      jnp.zeros((1, 1), dt),
  ]

  vm = pltpu.VMEM
  const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=vm)
  lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                 memory_space=vm)
  lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                    memory_space=vm)
  in_specs = [const((2, 1)), lane2(nq), lane2(nv), lane3(ng, 3),
              lane3(ng, 9), lane3(nb, 3), lane3(nv, 6),
              const((meta['P'], ncand)), const((nlim, 8)), const((1, 1))]
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
                      pltpu.VMEM((ncand, 9, LANES), jnp.float32),
                      pltpu.VMEM((ncand, LANES), jnp.float32)],
  )(*inputs)

  t2 = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  o = {name: t2(v) for (name, _, _), v in zip(out_meta, outs)}
  efc_address = nl + stride * jnp.arange(K, dtype=jnp.int32)
  valid = o['con_geom'][:, :, 0] >= 0
  con = d.contact.replace(
      dist=o['con_dist'], pos=o['con_pos'],
      frame=o['con_frame'].reshape(W, K, 3, 3),
      friction=o['con_friction'], solref=o['con_solref'],
      solreffriction=o['con_solreffriction'], solimp=o['con_solimp'],
      includemargin=o['con_includemargin'], dim=o['con_dim'],
      geom=o['con_geom'],
      efc_address=jnp.where(valid, efc_address[None, :], -1))
  zero = jnp.zeros((W,), jnp.int32)
  nl_count = jnp.sum(o['efc_active'][:, :nl], axis=-1)
  return d.replace(
      contact=con, ncon=o['ncon'][:, 0], ncollision=o['ncollision'][:, 0],
      efc_J=o['efc_J'], efc_D=o['efc_D'], efc_aref=o['efc_aref'],
      efc_pos=o['efc_pos'], efc_margin=o['efc_margin'],
      efc_vel=o['efc_vel'], efc_frictionloss=o['efc_frictionloss'],
      efc_type=o['efc_type'], efc_id=o['efc_id'],
      efc_active=o['efc_active'].astype(bool), ne=zero, nf=zero,
      nl=nl_count,
      nefc=jnp.sum(o['efc_active'], axis=-1))
