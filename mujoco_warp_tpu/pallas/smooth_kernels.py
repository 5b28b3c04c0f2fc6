"""Worlds-in-lanes Pallas megakernels for the smooth pipeline.

The XLA-level stages pay ~17us dispatch + HBM round trips per fusion and
are gather-bound (single-element lane gathers). Inside one Pallas kernel
the tree structure unrolls at trace time into STATIC VMEM indexing —
zero gather cost — and each quaternion/spatial op is one VPU op over a
128-world lane block. This is the architecture that closes the gap to
the reference's fused-kernel step (see memory/megakernel-plan).

Round-1 scope: forward kinematics (the reference's branch-parallel
kernel, mujoco_warp/_src/smooth.py:44-358) as a standalone, parity-
tested kernel. The remaining stages (com/crb/rne) compose in the same
style in round 2.

Layout: batch-LAST. qpos (nq, W); outputs xpos (nbody, 3, W),
xquat (nbody, 4, W), xanchor/xaxis (njnt, 3, W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import DisableBit, JointType, Model

LANES = 128


def _qmul(u, v):
  """Hamilton product for (4, L) blocks."""
  w = u[0:1] * v[0:1] - u[1:2] * v[1:2] - u[2:3] * v[2:3] - u[3:4] * v[3:4]
  x = u[0:1] * v[1:2] + u[1:2] * v[0:1] + u[2:3] * v[3:4] - u[3:4] * v[2:3]
  y = u[0:1] * v[2:3] - u[1:2] * v[3:4] + u[2:3] * v[0:1] + u[3:4] * v[1:2]
  z = u[0:1] * v[3:4] + u[1:2] * v[2:3] - u[2:3] * v[1:2] + u[3:4] * v[0:1]
  return jnp.concatenate([w, x, y, z], axis=0)


def _qrot(vec, q):
  """Rotate (3, L) vec by quaternion (4, L): v + 2w(qv x v) + 2qv x (qv x v)."""
  qv = q[1:4]
  w = q[0:1]

  def cross(a, b):
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

  t = 2.0 * cross(qv, vec)
  return vec + w * t + cross(qv, t)


def _qnormalize(q):
  n2 = jnp.sum(q * q, axis=0, keepdims=True)
  inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-28))
  return q * inv


def _kinematics_kernel(m: Model, qpos_ref, bp_ref, bq_ref, jp_ref, ja_ref,
                       q0_ref, mp_ref, mq_ref,
                       xpos_ref, xquat_ref, xanchor_ref, xaxis_ref):
  """One lane block: full FK tree walk, statically unrolled."""
  L = qpos_ref.shape[-1]
  dt = qpos_ref.dtype
  one = jnp.ones((1, L), dt)
  zero3 = jnp.zeros((3, L), dt)

  # world body
  xpos_ref[0] = zero3
  xquat_ref[0] = jnp.concatenate([one, jnp.zeros((3, L), dt)], axis=0)

  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    pq = xquat_ref[p]                      # (4, L)
    pp = xpos_ref[p]
    bpos = bp_ref[:, b:b + 1] * one        # (3, L) broadcast model param
    bquat = bq_ref[:, b:b + 1] * one
    xq = _qmul(pq, bquat)
    xp = pp + _qrot(bpos, pq)

    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    mid = m.body_mocapid[b]
    if mid >= 0 and jnum == 0:
      xp = mp_ref[mid]
      xq = _qnormalize(mq_ref[mid])
    for k in range(jnum):
      j = jadr + k
      jt = m.jnt_type[j]
      qadr = m.jnt_qposadr[j]
      if jt == JointType.FREE:
        xp = qpos_ref[qadr:qadr + 3]
        xq = qpos_ref[qadr + 3:qadr + 7]
        xanchor_ref[j] = xp
        xaxis_ref[j] = ja_ref[:, j:j + 1] * one
        continue
      jpos = jp_ref[:, j:j + 1] * one
      jaxis_l = ja_ref[:, j:j + 1] * one
      anchor = xp + _qrot(jpos, xq)
      axis = _qrot(jaxis_l, xq)
      if jt == JointType.SLIDE:
        qs = qpos_ref[qadr:qadr + 1] - q0_ref[qadr:qadr + 1]
        xp = xp + axis * qs
      elif jt == JointType.HINGE:
        qs = qpos_ref[qadr:qadr + 1] - q0_ref[qadr:qadr + 1]
        half = 0.5 * qs
        qloc = jnp.concatenate([jnp.cos(half), jnp.sin(half) * jaxis_l],
                               axis=0)
        xq = _qmul(xq, qloc)
        xp = anchor - _qrot(jpos, xq)
      else:  # BALL
        qloc = _qnormalize(qpos_ref[qadr:qadr + 4])
        xq = _qmul(xq, qloc)
        xp = anchor - _qrot(jpos, xq)
      xanchor_ref[j] = anchor
      xaxis_ref[j] = axis
    xq = _qnormalize(xq)
    xpos_ref[b] = xp
    xquat_ref[b] = xq


def _cross(a, b):
  return jnp.concatenate([
      a[1:2] * b[2:3] - a[2:3] * b[1:2],
      a[2:3] * b[0:1] - a[0:1] * b[2:3],
      a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)


def _quat2mat_cols(q):
  """Quaternion (4, L) -> rotation matrix columns (list of 3 (3, L))."""
  w, x, y, z = q[0:1], q[1:2], q[2:3], q[3:4]
  c0 = jnp.concatenate([1 - 2 * (y * y + z * z),
                        2 * (x * y + w * z),
                        2 * (x * z - w * y)], axis=0)
  c1 = jnp.concatenate([2 * (x * y - w * z),
                        1 - 2 * (x * x + z * z),
                        2 * (y * z + w * x)], axis=0)
  c2 = jnp.concatenate([2 * (x * z + w * y),
                        2 * (y * z - w * x),
                        1 - 2 * (x * x + y * y)], axis=0)
  return c0, c1, c2


def _com_pos_kernel(m: Model, xpos_ref, xquat_ref, xanchor_ref, xaxis_ref,
                    ipos_ref, iquat_ref, mass_ref, inert_ref, stm_ref,
                    com_ref, cinert_ref, cdof_ref, acc_ref):
  """Subtree COM + com-frame inertia + dof axes for one lane block
  (reference smooth.py:602; C mj_comPos). Tree accumulations are static
  unrolled reverse walks in VMEM — no masked matmuls, no gathers."""
  L = xpos_ref.shape[-1]
  dt = jnp.float32
  one = jnp.ones((1, L), dt)

  # xipos + mass-weighted accumulation (acc holds weighted sums)
  for b in range(m.nbody):
    q = xquat_ref[b]
    ipos = ipos_ref[:, b:b + 1] * one
    xipos = xpos_ref[b] + _qrot(ipos, q)
    acc_ref[b] = xipos * mass_ref[0, b]
  for b in range(m.nbody - 1, 0, -1):
    p = m.body_parentid[b]
    acc_ref[p] = acc_ref[p] + acc_ref[b]
  for b in range(m.nbody):
    com_ref[b] = acc_ref[b] / jnp.maximum(stm_ref[0, b], 1e-12)

  # cinert: spatial inertia about the root subtree com
  for b in range(m.nbody):
    if b == 0:
      cinert_ref[b] = jnp.zeros((10, L), dt)
      continue
    q = xquat_ref[b]
    iq = iquat_ref[:, b:b + 1] * one
    ximat_q = _qmul(q, iq)
    c0, c1, c2 = _quat2mat_cols(ximat_q)
    ipos = ipos_ref[:, b:b + 1] * one
    xipos = xpos_ref[b] + _qrot(ipos, q)
    root = m.body_rootid[b]
    off = xipos - com_ref[root]
    ii = inert_ref[:, b:b + 1]              # (3, 1) diag inertia
    # I_world = R diag(i) R^T, columns c_k scaled by i_k
    m00 = ii[0:1] * c0[0:1] * c0[0:1] + ii[1:2] * c1[0:1] * c1[0:1] + \
        ii[2:3] * c2[0:1] * c2[0:1]
    m11 = ii[0:1] * c0[1:2] * c0[1:2] + ii[1:2] * c1[1:2] * c1[1:2] + \
        ii[2:3] * c2[1:2] * c2[1:2]
    m22 = ii[0:1] * c0[2:3] * c0[2:3] + ii[1:2] * c1[2:3] * c1[2:3] + \
        ii[2:3] * c2[2:3] * c2[2:3]
    m01 = ii[0:1] * c0[0:1] * c0[1:2] + ii[1:2] * c1[0:1] * c1[1:2] + \
        ii[2:3] * c2[0:1] * c2[1:2]
    m02 = ii[0:1] * c0[0:1] * c0[2:3] + ii[1:2] * c1[0:1] * c1[2:3] + \
        ii[2:3] * c2[0:1] * c2[2:3]
    m12 = ii[0:1] * c0[1:2] * c0[2:3] + ii[1:2] * c1[1:2] * c1[2:3] + \
        ii[2:3] * c2[1:2] * c2[2:3]
    mb = mass_ref[0, b]
    d2 = off[0:1] ** 2 + off[1:2] ** 2 + off[2:3] ** 2
    # parallel axis
    m00 = m00 + mb * (d2 - off[0:1] * off[0:1])
    m11 = m11 + mb * (d2 - off[1:2] * off[1:2])
    m22 = m22 + mb * (d2 - off[2:3] * off[2:3])
    m01 = m01 - mb * off[0:1] * off[1:2]
    m02 = m02 - mb * off[0:1] * off[2:3]
    m12 = m12 - mb * off[1:2] * off[2:3]
    mc = mb * off
    cinert_ref[b] = jnp.concatenate(
        [m00, m11, m22, m01, m02, m12, mc, mb * one], axis=0)

  # cdof
  for j in range(m.njnt):
    b = m.jnt_bodyid[j]
    jt = m.jnt_type[j]
    dadr = m.jnt_dofadr[j]
    root = m.body_rootid[b]
    off = xanchor_ref[j] - com_ref[root]
    if jt == JointType.FREE:
      zeros = jnp.zeros((3, L), dt)
      z1 = jnp.zeros((1, L), dt)
      o1 = jnp.ones((1, L), dt)
      for i in range(3):
        rows = [z1, z1, z1]
        rows[i] = o1
        e = jnp.concatenate(rows, axis=0)
        cdof_ref[dadr + i] = jnp.concatenate([zeros, e], axis=0)
      c0, c1, c2 = _quat2mat_cols(xquat_ref[b])
      for i, ax in enumerate((c0, c1, c2)):
        cdof_ref[dadr + 3 + i] = jnp.concatenate(
            [ax, _cross(ax, -off)], axis=0)
    elif jt == JointType.BALL:
      c0, c1, c2 = _quat2mat_cols(xquat_ref[b])
      for i, ax in enumerate((c0, c1, c2)):
        cdof_ref[dadr + i] = jnp.concatenate([ax, _cross(ax, -off)],
                                             axis=0)
    elif jt == JointType.SLIDE:
      cdof_ref[dadr] = jnp.concatenate(
          [jnp.zeros((3, L), dt), xaxis_ref[j]], axis=0)
    else:  # hinge
      ax = xaxis_ref[j]
      cdof_ref[dadr] = jnp.concatenate([ax, _cross(ax, -off)], axis=0)


@jax.jit
def com_pos_batched(m: Model, xpos: jax.Array, xquat: jax.Array,
                    xanchor: jax.Array, xaxis: jax.Array):
  """(W, nbody/njnt, ...) inputs -> (subtree_com (W, nbody, 3),
  cinert (W, nbody, 10), cdof (W, nv, 6))."""
  W = xpos.shape[0]
  wpad = -(-W // LANES) * LANES
  bl = lambda x: jnp.moveaxis(x, 0, -1)  # batch-last
  pad = lambda x: (jnp.pad(x, ((0, 0),) * (x.ndim - 1) +
                           ((0, wpad - W),)) if wpad != W else x)
  xpos_t, xquat_t = pad(bl(xpos)), pad(bl(xquat))
  xanchor_t, xaxis_t = pad(bl(xanchor)), pad(bl(xaxis))
  nb, nj, nv = m.nbody, max(m.njnt, 1), max(m.nv, 1)

  from . import probe as _probe
  _probe.vmem_ok('com_pos_batched',  # PL006 static estimate
                 (nb, 17, LANES), (nj, 7, LANES), (nv, 6, LANES))
  kernel = functools.partial(_com_pos_kernel, m)
  vm = pltpu.VMEM
  outs = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      in_specs=[
          pl.BlockSpec((nb, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nb, 4, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nj, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nj, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((4, nb), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((1, nb), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((1, nb), lambda i: (0, 0), memory_space=vm),
      ],
      out_specs=[
          pl.BlockSpec((nb, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nb, 10, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nv, 6, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((nb, 3, wpad), xpos.dtype),
          jax.ShapeDtypeStruct((nb, 10, wpad), xpos.dtype),
          jax.ShapeDtypeStruct((nv, 6, wpad), xpos.dtype),
      ],
      scratch_shapes=[pltpu.VMEM((nb, 3, LANES), jnp.float32)],
  )(xpos_t, xquat_t, xanchor_t, xaxis_t,
    m.body_ipos.T, m.body_iquat.T, m.body_mass[None],
    m.body_inertia.T, m.body_subtreemass[None])
  com, cinert, cdof = outs
  t = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  return t(com), t(cinert), t(cdof)


def _inert_mul(i10, v):
  """(10, L) spatial inertia x (6, L) motion -> (6, L) force."""
  ang, lin = v[0:3], v[3:6]
  ixx, iyy, izz = i10[0:1], i10[1:2], i10[2:3]
  ixy, ixz, iyz = i10[3:4], i10[4:5], i10[5:6]
  mc = i10[6:9]
  mm = i10[9:10]
  oa = jnp.concatenate([
      ixx * ang[0:1] + ixy * ang[1:2] + ixz * ang[2:3],
      ixy * ang[0:1] + iyy * ang[1:2] + iyz * ang[2:3],
      ixz * ang[0:1] + iyz * ang[1:2] + izz * ang[2:3]], axis=0)
  oa = oa + _cross(mc, lin)
  ol = mm * lin - _cross(mc, ang)
  return jnp.concatenate([oa, ol], axis=0)


def _crb_kernel(m: Model, cinert_ref, cdof_ref, arm_ref,
                crb_ref, qm_ref):
  """Composite rigid body + dense qM for one lane block (reference
  smooth.py:889; C mj_crb). Reverse tree accumulation + static
  ancestor-chain walks in VMEM — no masked matmuls or gathers."""
  L = cinert_ref.shape[-1]
  dt = jnp.float32
  # crb = subtree sum of cinert
  for b in range(m.nbody):
    crb_ref[b] = cinert_ref[b]
  for b in range(m.nbody - 1, 0, -1):
    p = m.body_parentid[b]
    if p != 0:
      crb_ref[p] = crb_ref[p] + crb_ref[b]

  # dense qM: compute ancestor-chain entries as values, then ONE
  # contiguous (nv, L) write per row (per-element strided writes were
  # the kernel's hot spot — 784 of them per block at nv=28)
  vals = {}
  for i in range(m.nv):
    buf = _inert_mul(crb_ref[m.dof_bodyid[i]], cdof_ref[i])  # (6, L)
    for j in m.dof_ancestor_rows[i]:
      val = jnp.sum(buf * cdof_ref[j], axis=0, keepdims=True)
      if j == i:
        val = val + arm_ref[0, i]
      vals[(i, j)] = val
  zrow = jnp.zeros((1, L), dt)
  for i in range(m.nv):
    pieces = []
    for j in range(m.nv):
      v = vals.get((i, j)) if j <= i else vals.get((j, i))
      pieces.append(v if v is not None else zrow)
    qm_ref[i] = jnp.concatenate(pieces, axis=0)


@jax.jit
def crb_batched(m: Model, cinert: jax.Array, cdof: jax.Array):
  """(W, nbody, 10), (W, nv, 6) -> (crb (W, nbody, 10), qM (W, nv, nv))."""
  W = cinert.shape[0]
  wpad = -(-W // LANES) * LANES
  bl = lambda x: jnp.moveaxis(x, 0, -1)
  pad = lambda x: (jnp.pad(x, ((0, 0),) * (x.ndim - 1) +
                           ((0, wpad - W),)) if wpad != W else x)
  ci_t = pad(bl(cinert))
  cd_t = pad(bl(cdof))
  nb, nv = m.nbody, max(m.nv, 1)

  from . import probe as _probe
  _probe.vmem_ok('crb_batched',  # PL006 static estimate
                 (nb, 20, LANES), (nv, 6, LANES), (nv, nv, LANES))
  kernel = functools.partial(_crb_kernel, m)
  vm = pltpu.VMEM
  crb, qm = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      in_specs=[
          pl.BlockSpec((nb, 10, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nv, 6, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((1, nv), lambda i: (0, 0), memory_space=vm),
      ],
      out_specs=[
          pl.BlockSpec((nb, 10, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nv, nv, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((nb, 10, wpad), cinert.dtype),
          jax.ShapeDtypeStruct((nv, nv, wpad), cinert.dtype),
      ],
  )(ci_t, cd_t, m.dof_armature[None])
  t = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  return t(crb), t(qm)


def _mocap_lanes(m: Model, mocap, wpad: int, dtype):
  """Runtime mocap state in (nmocap, 3/4, wpad) lane layout; identity
  defaults from the model when no runtime state is given."""
  nm = max(m.nmocap, 1)
  if m.nmocap and mocap is not None:
    mocap_pos, mocap_quat = mocap
    pad3 = lambda x: (jnp.pad(x, ((0, 0), (0, 0),
                                  (0, wpad - x.shape[-1])))
                      if wpad != x.shape[-1] else x)
    return (pad3(jnp.moveaxis(mocap_pos, 0, -1)),
            pad3(jnp.moveaxis(mocap_quat, 0, -1)))
  if m.nmocap:
    return (jnp.broadcast_to(m.mocap_pos0[..., None], (nm, 3, wpad)),
            jnp.broadcast_to(m.mocap_quat0[..., None], (nm, 4, wpad)))
  return (jnp.zeros((nm, 3, wpad), dtype),
          jnp.zeros((nm, 4, wpad), dtype).at[:, 0].set(1.0))


def _rows9(q):
  """Quaternion (4, L) -> row-major 3x3 rotation matrix rows (9, L)."""
  c0, c1, c2 = _quat2mat_cols(q)
  return jnp.concatenate([
      c0[0:1], c1[0:1], c2[0:1],
      c0[1:2], c1[1:2], c2[1:2],
      c0[2:3], c1[2:3], c2[2:3]], axis=0)


def _frames_block(m: Model, xpos_ref, xquat_ref, ip_ref, iq_ref, gp_ref,
                  gq_ref, sp_ref, sq_ref, xmat_ref, xipos_ref, ximat_ref,
                  gxp_ref, gxm_ref, sxp_ref, sxm_ref):
  """Derived frames: body xmat/inertial, geom and site frames — all
  static unrolled elementwise quaternion math (reference
  smooth.py:358 kinematics tail; C mj_kinematics geom/site loop)."""
  L = xpos_ref.shape[-1]
  one = jnp.ones((1, L), jnp.float32)
  for b in range(m.nbody):
    q = xquat_ref[b]
    xmat_ref[b] = _rows9(q)
    xipos_ref[b] = xpos_ref[b] + _qrot(ip_ref[:, b:b + 1] * one, q)
    ximat_ref[b] = _rows9(_qmul(q, iq_ref[:, b:b + 1] * one))
  for g in range(m.ngeom):
    b = m.geom_bodyid[g]
    q = xquat_ref[b]
    gxp_ref[g] = xpos_ref[b] + _qrot(gp_ref[:, g:g + 1] * one, q)
    gxm_ref[g] = _rows9(_qmul(q, gq_ref[:, g:g + 1] * one))
  for s in range(m.nsite):
    b = m.site_bodyid[s]
    q = xquat_ref[b]
    sxp_ref[s] = xpos_ref[b] + _qrot(sp_ref[:, s:s + 1] * one, q)
    sxm_ref[s] = _rows9(_qmul(q, sq_ref[:, s:s + 1] * one))


def _motion_cross_l(u, v):
  """Spatial motion cross product on (6, L) blocks."""
  ang = _cross(u[0:3], v[0:3])
  lin = _cross(u[0:3], v[3:6]) + _cross(u[3:6], v[0:3])
  return jnp.concatenate([ang, lin], axis=0)


def _motion_cross_force_l(u, f):
  ang = _cross(u[0:3], f[0:3]) + _cross(u[3:6], f[3:6])
  lin = _cross(u[0:3], f[3:6])
  return jnp.concatenate([ang, lin], axis=0)


def _com_vel_rne_block(m: Model, qvel_ref, cdof_ref, cinert_ref, grav_ref,
                       cvel_ref, cdofdot_ref, cacc_ref, qfrc_ref, cfrc_scr):
  """com_vel + rne fused for one lane block (reference smooth.py:2015,
  1259; C mj_comVel + mj_rne(qacc=0)). Forward velocity walk follows
  C's exact per-joint accumulation order (free/ball dofs share v_pre)."""
  L = qvel_ref.shape[-1]
  dt = jnp.float32
  zero6 = jnp.zeros((6, L), dt)
  one = jnp.ones((1, L), dt)
  cvel_ref[0] = zero6

  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    v = cvel_ref[p]
    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    for k in range(jnum):
      j = jadr + k
      jt = m.jnt_type[j]
      dadr = m.jnt_dofadr[j]
      if jt == JointType.FREE:
        for i in range(3):
          cdofdot_ref[dadr + i] = zero6
          v = v + cdof_ref[dadr + i] * qvel_ref[dadr + i:dadr + i + 1]
        vpre = v
        for i in range(3, 6):
          cdofdot_ref[dadr + i] = _motion_cross_l(vpre, cdof_ref[dadr + i])
        for i in range(3, 6):
          v = v + cdof_ref[dadr + i] * qvel_ref[dadr + i:dadr + i + 1]
      elif jt == JointType.BALL:
        vpre = v
        for i in range(3):
          cdofdot_ref[dadr + i] = _motion_cross_l(vpre, cdof_ref[dadr + i])
        for i in range(3):
          v = v + cdof_ref[dadr + i] * qvel_ref[dadr + i:dadr + i + 1]
      else:  # slide / hinge
        cdofdot_ref[dadr] = _motion_cross_l(v, cdof_ref[dadr])
        v = v + cdof_ref[dadr] * qvel_ref[dadr:dadr + 1]
    cvel_ref[b] = v

  # rne forward pass: cacc with qacc = 0, gravity at the base
  if not (m.opt.disableflags & DisableBit.GRAVITY):
    grav = jnp.concatenate([jnp.zeros((3, L), dt),
                            -grav_ref[:, 0:1] * one], axis=0)
  else:
    grav = zero6
  cacc_ref[0] = grav
  for b in range(1, m.nbody):
    p = m.body_parentid[b]
    a = cacc_ref[p]
    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    for k in range(jnum):
      j = jadr + k
      dadr = m.jnt_dofadr[j]
      ndof = {JointType.FREE: 6, JointType.BALL: 3}.get(
          int(m.jnt_type[j]), 1)
      for i in range(ndof):
        a = a + cdofdot_ref[dadr + i] * qvel_ref[dadr + i:dadr + i + 1]
    cacc_ref[b] = a

  # per-body net force, then backward subtree accumulation
  for b in range(m.nbody):
    ci = cinert_ref[b]
    cv = cvel_ref[b]
    cfrc_scr[b] = (_inert_mul(ci, cacc_ref[b]) +
                   _motion_cross_force_l(cv, _inert_mul(ci, cv)))
  for b in range(m.nbody - 1, 0, -1):
    p = m.body_parentid[b]
    cfrc_scr[p] = cfrc_scr[p] + cfrc_scr[b]
  for i in range(m.nv):
    qfrc_ref[i] = jnp.sum(cdof_ref[i] * cfrc_scr[m.dof_bodyid[i]], axis=0)


def _smooth_mega_kernel(m: Model, qpos_ref, qvel_ref, bp_ref, bq_ref,
                        jp_ref, ja_ref, q0_ref, mp_ref, mq_ref, ipos_ref,
                        iquat_ref, mass_ref, inert_ref, stm_ref, arm_ref,
                        gp_ref, gq_ref, sp_ref, sq_ref, grav_ref,
                        xpos_ref, xquat_ref, xanchor_ref, xaxis_ref,
                        com_ref, cinert_ref, cdof_ref, crb_ref, qm_ref,
                        xmat_ref, xipos_ref, ximat_ref, gxp_ref, gxm_ref,
                        sxp_ref, sxm_ref, cvel_ref, cdofdot_ref, cacc_ref,
                        qfrc_ref, acc_scr, cfrc_scr):
  """The whole smooth pipeline (minus tendons) in ONE kernel per lane
  block: kinematics -> frames -> com_pos -> crb -> com_vel -> rne.
  Replaces ~40 XLA fusions (each paying dispatch + HBM) with one."""
  _kinematics_kernel(m, qpos_ref, bp_ref, bq_ref, jp_ref, ja_ref, q0_ref,
                     mp_ref, mq_ref, xpos_ref, xquat_ref, xanchor_ref,
                     xaxis_ref)
  _frames_block(m, xpos_ref, xquat_ref, ipos_ref, iquat_ref, gp_ref,
                gq_ref, sp_ref, sq_ref, xmat_ref, xipos_ref, ximat_ref,
                gxp_ref, gxm_ref, sxp_ref, sxm_ref)
  _com_pos_kernel(m, xpos_ref, xquat_ref, xanchor_ref, xaxis_ref,
                  ipos_ref, iquat_ref, mass_ref, inert_ref, stm_ref,
                  com_ref, cinert_ref, cdof_ref, acc_scr)
  _crb_kernel(m, cinert_ref, cdof_ref, arm_ref, crb_ref, qm_ref)
  _com_vel_rne_block(m, qvel_ref, cdof_ref, cinert_ref, grav_ref,
                     cvel_ref, cdofdot_ref, cacc_ref, qfrc_ref, cfrc_scr)


def smooth_mega_batched(m: Model, qpos: jax.Array, qvel: jax.Array,
                        mocap_pos=None, mocap_quat=None,
                        interpret: bool = False):
  """qpos (W, nq), qvel (W, nv) -> dict of every smooth-stage product:
  position stage (xpos..qM, all frames) AND velocity stage (cvel,
  cdof_dot, cacc, qfrc_bias). One pallas_call, worlds in lanes."""
  W, nq = qpos.shape
  wpad = -(-W // LANES) * LANES
  dt = qpos.dtype
  pad2 = lambda x: (jnp.pad(x, ((0, 0), (0, wpad - W)))
                    if wpad != W else x)
  pad3 = lambda x: (jnp.pad(x, ((0, 0), (0, 0), (0, wpad - W)))
                    if wpad != W else x)
  bl = lambda x: jnp.moveaxis(x, 0, -1)
  qt = pad2(qpos.T)
  vt = pad2(qvel.T)
  nb, nj, nv = m.nbody, max(m.njnt, 1), max(m.nv, 1)
  ng, ns, nm = max(m.ngeom, 1), max(m.nsite, 1), max(m.nmocap, 1)
  mocap = ((mocap_pos, mocap_quat)
           if (m.nmocap and mocap_pos is not None) else None)
  mp, mq = _mocap_lanes(m, mocap, wpad, dt)
  del bl, pad3

  from . import probe as _probe
  _probe.vmem_ok('smooth_mega_batched',  # PL006 static estimate of the
                 # dominant windows (bodies/joints/geoms/sites + qM)
                 (nb, 63, LANES), (nj, 6, LANES), (nv, 18, LANES),
                 (ng, 12, LANES), (ns, 12, LANES), (nv, nv, LANES))
  kernel = functools.partial(_smooth_mega_kernel, m)
  vm = pltpu.VMEM
  const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=vm)
  lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                 memory_space=vm)
  lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                    memory_space=vm)
  z31 = jnp.zeros((3, 1), dt)
  z41 = jnp.zeros((4, 1), dt)
  out_dims = [(nb, 3), (nb, 4), (nj, 3), (nj, 3), (nb, 3), (nb, 10),
              (nv, 6), (nb, 10), (nv, nv), (nb, 9), (nb, 3), (nb, 9),
              (ng, 3), (ng, 9), (ns, 3), (ns, 9), (nb, 6), (nv, 6),
              (nb, 6)]
  outs = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      interpret=interpret,
      in_specs=[
          lane2(nq), lane2(nv), const((3, nb)), const((4, nb)),
          const((3, nj)), const((3, nj)), const((nq, 1)),
          lane3(nm, 3), lane3(nm, 4),
          const((3, nb)), const((4, nb)), const((1, nb)), const((3, nb)),
          const((1, nb)), const((1, nv)),
          const((3, ng)), const((4, ng)), const((3, ns)), const((4, ns)),
          const((3, 1)),
      ],
      out_specs=[lane3(a, b) for a, b in out_dims] + [lane2(nv)],
      out_shape=[jax.ShapeDtypeStruct(s + (wpad,), dt) for s in out_dims]
      + [jax.ShapeDtypeStruct((nv, wpad), dt)],
      scratch_shapes=[pltpu.VMEM((nb, 3, LANES), jnp.float32),
                      pltpu.VMEM((nb, 6, LANES), jnp.float32)],
  )(qt, vt, m.body_pos.T, m.body_quat.T,
    (m.jnt_pos.T if m.njnt else z31),
    (m.jnt_axis.T if m.njnt else z31),
    m.qpos0[:, None], mp, mq,
    m.body_ipos.T, m.body_iquat.T, m.body_mass[None], m.body_inertia.T,
    m.body_subtreemass[None], m.dof_armature[None],
    (m.geom_pos.T if m.ngeom else z31),
    (m.geom_quat.T if m.ngeom else z41),
    (m.site_pos.T if m.nsite else z31),
    (m.site_quat.T if m.nsite else z41),
    m.opt.gravity[:, None])
  t = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  names = ('xpos', 'xquat', 'xanchor', 'xaxis', 'subtree_com', 'cinert',
           'cdof', 'crb', 'qM', 'xmat', 'xipos', 'ximat', 'geom_xpos',
           'geom_xmat', 'site_xpos', 'site_xmat', 'cvel', 'cdof_dot',
           'cacc', 'qfrc_bias')
  out = {k: t(v) for k, v in zip(names, outs)}
  # row-major 9-vectors -> (3, 3) matrices; drop padded geom/site slots
  for k in ('xmat', 'ximat', 'geom_xmat', 'site_xmat'):
    out[k] = out[k].reshape(out[k].shape[:-1] + (3, 3))
  out['geom_xpos'] = out['geom_xpos'][:, :m.ngeom]
  out['geom_xmat'] = out['geom_xmat'][:, :m.ngeom]
  out['site_xpos'] = out['site_xpos'][:, :m.nsite]
  out['site_xmat'] = out['site_xmat'][:, :m.nsite]
  out['xanchor'] = out['xanchor'][:, :m.njnt]
  out['xaxis'] = out['xaxis'][:, :m.njnt]
  return out


def _smooth_front_kernel(m: Model, qpos_ref, bp_ref, bq_ref, jp_ref,
                         ja_ref, q0_ref, mp_ref, mq_ref, ipos_ref,
                         iquat_ref, mass_ref, inert_ref, stm_ref, arm_ref,
                         xpos_ref, xquat_ref, xanchor_ref, xaxis_ref,
                         com_ref, cinert_ref, cdof_ref, crb_ref, qm_ref,
                         acc_ref):
  """Fused kinematics -> com_pos -> crb: the whole position-stage smooth
  front in ONE kernel per lane block — zero HBM round trips or
  transposes between stages (the r2 megakernel pattern)."""
  _kinematics_kernel(m, qpos_ref, bp_ref, bq_ref, jp_ref, ja_ref, q0_ref,
                     mp_ref, mq_ref, xpos_ref, xquat_ref, xanchor_ref,
                     xaxis_ref)
  _com_pos_kernel(m, xpos_ref, xquat_ref, xanchor_ref, xaxis_ref,
                  ipos_ref, iquat_ref, mass_ref, inert_ref, stm_ref,
                  com_ref, cinert_ref, cdof_ref, acc_ref)
  _crb_kernel(m, cinert_ref, cdof_ref, arm_ref, crb_ref, qm_ref)


@jax.jit
def smooth_front_batched(m: Model, qpos: jax.Array):
  """qpos (W, nq) -> dict of position-stage products (xpos, xquat,
  xanchor, xaxis, subtree_com, cinert, cdof, crb, qM), all (W, ...)."""
  W, nq = qpos.shape
  wpad = -(-W // LANES) * LANES
  qt = qpos.T
  if wpad != W:
    qt = jnp.pad(qt, ((0, 0), (0, wpad - W)))
  nb, nj, nv = m.nbody, max(m.njnt, 1), max(m.nv, 1)

  from . import probe as _probe
  _probe.vmem_ok('smooth_front_batched',  # PL006 static estimate
                 (nb, 33, LANES), (nj, 6, LANES), (nv, 7, LANES),
                 (nv, nv, LANES))
  kernel = functools.partial(_smooth_front_kernel, m)
  vm = pltpu.VMEM
  const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=vm)
  lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                 memory_space=vm)
  lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                    memory_space=vm)
  nm = max(m.nmocap, 1)
  outs = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      in_specs=[
          lane2(nq), const((3, nb)), const((4, nb)), const((3, nj)),
          const((3, nj)), const((nq, 1)), lane3(nm, 3), lane3(nm, 4),
          const((3, nb)), const((4, nb)), const((1, nb)), const((3, nb)),
          const((1, nb)), const((1, nv)),
      ],
      out_specs=[
          lane3(nb, 3), lane3(nb, 4), lane3(nj, 3), lane3(nj, 3),
          lane3(nb, 3), lane3(nb, 10), lane3(nv, 6), lane3(nb, 10),
          lane3(nv, nv),
      ],
      out_shape=[
          jax.ShapeDtypeStruct(s + (wpad,), qpos.dtype) for s in
          [(nb, 3), (nb, 4), (nj, 3), (nj, 3), (nb, 3), (nb, 10),
           (nv, 6), (nb, 10), (nv, nv)]
      ],
      scratch_shapes=[pltpu.VMEM((nb, 3, LANES), jnp.float32)],
  )(qt, m.body_pos.T, m.body_quat.T,
    (m.jnt_pos.T if m.njnt else jnp.zeros((3, 1), qpos.dtype)),
    (m.jnt_axis.T if m.njnt else jnp.zeros((3, 1), qpos.dtype)),
    m.qpos0[:, None],
    *_mocap_lanes(m, None, wpad, qpos.dtype),
    m.body_ipos.T, m.body_iquat.T, m.body_mass[None], m.body_inertia.T,
    m.body_subtreemass[None], m.dof_armature[None])
  t = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  names = ('xpos', 'xquat', 'xanchor', 'xaxis', 'subtree_com', 'cinert',
           'cdof', 'crb', 'qM')
  return {k: t(v) for k, v in zip(names, outs)}


@functools.partial(jax.jit, static_argnames=())
def kinematics_batched(m: Model, qpos: jax.Array):
  """FK for a (W, nq) batch in one Pallas sweep. Returns
  (xpos (W, nbody, 3), xquat (W, nbody, 4), xanchor, xaxis (W, njnt, 3)).
  Quaternion states in qpos must be pre-normalized (the jnp pipeline's
  _normalize_qpos does this before calling)."""
  W, nq = qpos.shape
  wpad = -(-W // LANES) * LANES
  qt = qpos.T
  if wpad != W:
    qt = jnp.pad(qt, ((0, 0), (0, wpad - W)))
  nb, nj = m.nbody, max(m.njnt, 1)

  from . import probe as _probe
  _probe.vmem_ok('kinematics_batched',  # PL006 static estimate
                 (nb, 7, LANES), (nj, 6, LANES), (nq, 1, LANES))
  kernel = functools.partial(_kinematics_kernel, m)
  grid = (wpad // LANES,)
  vm = pltpu.VMEM
  outs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec((nq, LANES), lambda i: (0, i), memory_space=vm),
          pl.BlockSpec((3, nb), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((4, nb), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((3, nj), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((3, nj), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((nq, 1), lambda i: (0, 0), memory_space=vm),
          pl.BlockSpec((max(m.nmocap, 1), 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((max(m.nmocap, 1), 4, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
      ],
      out_specs=[
          pl.BlockSpec((nb, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nb, 4, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nj, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
          pl.BlockSpec((nj, 3, LANES), lambda i: (0, 0, i),
                       memory_space=vm),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((nb, 3, wpad), qpos.dtype),
          jax.ShapeDtypeStruct((nb, 4, wpad), qpos.dtype),
          jax.ShapeDtypeStruct((nj, 3, wpad), qpos.dtype),
          jax.ShapeDtypeStruct((nj, 3, wpad), qpos.dtype),
      ],
  )(qt, m.body_pos.T, m.body_quat.T,
    (m.jnt_pos.T if m.njnt else jnp.zeros((3, 1), qpos.dtype)),
    (m.jnt_axis.T if m.njnt else jnp.zeros((3, 1), qpos.dtype)),
    m.qpos0[:, None],
    _mocap_lanes(m, None, wpad, qpos.dtype)[0],
    _mocap_lanes(m, None, wpad, qpos.dtype)[1])
  xpos, xquat, xanchor, xaxis = outs
  t = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  return t(xpos), t(xquat), t(xanchor), t(xaxis)
