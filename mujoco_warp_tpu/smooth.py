"""Smooth (unconstrained) dynamics: kinematics, COM frames, CRB mass
matrix, factorization, RNE bias forces, actuator transmission.

TPU-native restructuring of the reference's kernels
(mujoco_warp/_src/smooth.py):

* Forward kinematics unrolls a static Python loop over bodies at trace
  time (bodies are topologically sorted); after ``vmap`` each step is a
  fused (nworld,)-wide VPU op. The reference instead launches a
  branch-parallel CUDA kernel per root->leaf chain (smooth.py:44-358).

* All tree *accumulations* (subtree COM, composite inertia, force
  backward pass, velocity forward pass) are masked matmuls against
  precomputed 0/1 ancestry/subtree masks — sums along tree paths commute,
  so a level-order scan (reference smooth.py:463-509,807-826) is just a
  matrix product the MXU executes directly.

* The mass matrix is assembled densely in one masked einsum:
  qM[i,j] = cdof[j] . (crb[body(i)] * cdof[i]) masked by dof ancestry
  (reference scatters per-dof-pair, smooth.py:826-886). Dense-only for
  now, matching the reference's own nv<=60 dense regime (io.py:142-144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import linalg
from . import math
from .types import Data, DisableBit, JointType, Model, TrnType

# einsum precision: physics needs f32 accumulation; on TPU the default
# bf16 matmul path loses contact-scale precision.
_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)


def _normalize_qpos(m: Model, qpos: jax.Array) -> jax.Array:
  """Normalize ball/free quaternions in qpos (mj_kinematics does this),
  vectorized over all quaternion joints at once."""
  import numpy as np
  qadrs = [m.jnt_qposadr[j] + (3 if m.jnt_type[j] == JointType.FREE else 0)
           for j in range(m.njnt)
           if m.jnt_type[j] in (JointType.FREE, JointType.BALL)]
  if not qadrs:
    return qpos
  idx = np.asarray(qadrs)[:, None] + np.arange(4)[None, :]
  quats = jax.vmap(math.quat_normalize)(qpos[idx])
  return qpos.at[idx.reshape(-1)].set(quats.reshape(-1))


def kinematics(m: Model, d: Data) -> Data:
  """Forward kinematics, level-synchronous: all bodies at one tree depth
  advance together with per-joint-type masks. The per-level batching
  replaces the reference's branch-parallel per-chain kernel
  (smooth.py:44-358) and keeps the traced op count ~O(depth), not
  O(nbody) — important for XLA compile time and kernel count."""
  import numpy as np
  qpos = _normalize_qpos(m, d.qpos)
  dtype = qpos.dtype

  xpos = jnp.zeros((m.nbody, 3), dtype)
  xquat = jnp.zeros((m.nbody, 4), dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((max(m.njnt, 1), 3), dtype)
  xaxis = jnp.zeros((max(m.njnt, 1), 3), dtype)

  jnt_type = np.asarray(m.jnt_type)
  jnt_qposadr = np.asarray(m.jnt_qposadr)

  for level in m.body_levels:
    B = np.asarray(level)
    pids = np.asarray([m.body_parentid[b] for b in level])
    jadr = np.asarray([m.body_jntadr[b] for b in level])
    jnum = np.asarray([m.body_jntnum[b] for b in level])
    nb = len(B)

    pq = xquat[pids]
    xq = jax.vmap(math.mul_quat)(pq, m.body_quat[B])
    xp = xpos[pids] + jax.vmap(math.rot_vec_quat)(m.body_pos[B], pq)

    # mocap bodies (jointless): override from mocap state
    mocapids = np.asarray([m.body_mocapid[b] for b in level])
    if (mocapids >= 0).any():
      mids = np.where(mocapids >= 0, mocapids, 0)
      is_mocap = jnp.asarray((mocapids >= 0) & (jnum == 0))[:, None]
      xp = jnp.where(is_mocap, d.mocap_pos[mids], xp)
      xq = jnp.where(is_mocap, jax.vmap(math.quat_normalize)(
          d.mocap_quat[mids]), xq)

    # free joints: pose straight from qpos
    is_free = np.asarray([
        jnum[i] == 1 and jnt_type[jadr[i]] == JointType.FREE
        for i in range(nb)])
    if is_free.any():
      qadr = np.where(is_free, jnt_qposadr[jadr], 0)
      fidx = qadr[:, None] + np.arange(7)[None, :]
      q7 = qpos[fidx]
      mfree = jnp.asarray(is_free)[:, None]
      xp = jnp.where(mfree, q7[:, :3], xp)
      xq = jnp.where(mfree, q7[:, 3:], xq)
      # free-joint anchor/axis convention: xanchor = xpos, xaxis = local
      jidx = np.where(is_free, jadr, m.njnt)  # drop where not free
      xanchor = xanchor.at[jidx].set(q7[:, :3], mode='drop')
      xaxis = xaxis.at[jidx].set(m.jnt_axis[np.where(is_free, jadr, 0)],
                                 mode='drop')

    # non-free joints, one slot at a time (bodies with multiple joints
    # apply them sequentially, as in C MuJoCo)
    for k in range(int(jnum.max()) if nb else 0):
      has = (jnum > k) & ~is_free
      if not has.any():
        continue
      jids = np.where(has, jadr + k, 0)
      jt = jnt_type[jids]
      qadr = jnt_qposadr[jids]
      is_slide = jnp.asarray(has & (jt == JointType.SLIDE))
      is_ball = jnp.asarray(has & (jt == JointType.BALL))
      is_hinge = jnp.asarray(has & (jt == JointType.HINGE))
      mhas = jnp.asarray(has)

      jpos = m.jnt_pos[jids]
      jaxis_loc = m.jnt_axis[jids]
      anchor = xp + jax.vmap(math.rot_vec_quat)(jpos, xq)
      axis = jax.vmap(math.rot_vec_quat)(jaxis_loc, xq)

      # scalar joint coordinate (slide/hinge)
      qs = qpos[qadr] - m.qpos0[qadr]
      # ball quaternion
      bidx = qadr[:, None] + np.arange(4)[None, :]
      qball = qpos[bidx]
      qhinge = jax.vmap(math.axis_angle_to_quat)(jaxis_loc, qs)
      qloc = jnp.where(is_ball[:, None], qball,
                       jnp.where(is_hinge[:, None], qhinge,
                                 jnp.zeros_like(qball).at[:, 0].set(1.0)))
      xq_rot = jax.vmap(math.mul_quat)(xq, qloc)
      rot = is_ball | is_hinge
      xq = jnp.where(rot[:, None], xq_rot, xq)
      xp_rot = anchor - jax.vmap(math.rot_vec_quat)(jpos, xq)
      xp_slide = xp + axis * qs[:, None]
      xp = jnp.where(rot[:, None], xp_rot,
                     jnp.where(is_slide[:, None], xp_slide, xp))

      sidx = np.where(has, jids, m.njnt)
      xanchor = xanchor.at[sidx].set(
          jnp.where(mhas[:, None], anchor, 0.0), mode='drop')
      xaxis = xaxis.at[sidx].set(
          jnp.where(mhas[:, None], axis, 0.0), mode='drop')

    xq = jax.vmap(math.quat_normalize)(xq)
    xpos = xpos.at[B].set(xp)
    xquat = xquat.at[B].set(xq)

  xmat = jax.vmap(math.quat_to_mat)(xquat)
  xanchor = xanchor[:m.njnt]
  xaxis = xaxis[:m.njnt]

  # inertial, geom, site frames: pure gathers + batched quaternion math
  iquat = jax.vmap(math.mul_quat)(xquat, m.body_iquat)
  xipos = xpos + jax.vmap(math.rot_vec_quat)(m.body_ipos, xquat)
  ximat = jax.vmap(math.quat_to_mat)(iquat)

  def frames(bodyid, pos, quat, n):
    if n == 0:
      return jnp.zeros((0, 3), dtype), jnp.zeros((0, 3, 3), dtype)
    bodyid = list(bodyid)
    bq = xquat[bodyid, :]
    p = xpos[bodyid, :] + jax.vmap(math.rot_vec_quat)(pos, bq)
    q = jax.vmap(math.mul_quat)(bq, quat)
    return p, jax.vmap(math.quat_to_mat)(q)

  geom_xpos, geom_xmat = frames(m.geom_bodyid, m.geom_pos, m.geom_quat,
                                m.ngeom)
  site_xpos, site_xmat = frames(m.site_bodyid, m.site_pos, m.site_quat,
                                m.nsite)

  return d.replace(qpos=qpos, xpos=xpos, xquat=xquat, xmat=xmat,
                   xipos=xipos, ximat=ximat, xanchor=xanchor, xaxis=xaxis,
                   geom_xpos=geom_xpos, geom_xmat=geom_xmat,
                   site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
  """Subtree COM, COM-frame inertia, and dof motion axes
  (reference smooth.py:602; C mj_comPos)."""
  # subtree com: one matmul against the subtree mask
  mass = m.body_mass
  weighted = d.xipos * mass[:, None]
  subtree_sum = jnp.einsum('bc,ci->bi', m.body_subtree_mask, weighted,
                           **_EINSUM)
  subtreemass = jnp.maximum(m.body_subtreemass, 1e-12)
  subtree_com = subtree_sum / subtreemass[:, None]
  # world body: MuJoCo leaves subtree_com[0] as total-mass com
  # (mass[0] = 0 so formula above already handles it when nbody>1)

  # cinert: spatial inertia of each body about subtree_com of its root
  root_com = subtree_com[list(m.body_rootid), :]
  offset = d.xipos - root_com
  cinert = jax.vmap(math.inert_from_body)(mass, m.body_inertia, offset,
                                          d.ximat)
  cinert = cinert.at[0].set(0.0)

  # cdof: per-dof spatial motion axes about the root subtree com
  dtype = d.qpos.dtype
  cdofs = []
  for j in range(m.njnt):
    b = m.jnt_bodyid[j]
    jtype = m.jnt_type[j]
    off = d.xanchor[j] - subtree_com[m.body_rootid[b]]
    if jtype == JointType.FREE:
      for i in range(3):
        e = jnp.zeros(3, dtype).at[i].set(1.0)
        cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), e]))
      for i in range(3):
        ax = d.xmat[b, :, i]
        cdofs.append(jnp.concatenate([ax, jnp.cross(ax, -off)]))
    elif jtype == JointType.BALL:
      for i in range(3):
        ax = d.xmat[b, :, i]
        cdofs.append(jnp.concatenate([ax, jnp.cross(ax, -off)]))
    elif jtype == JointType.SLIDE:
      cdofs.append(jnp.concatenate([jnp.zeros(3, dtype), d.xaxis[j]]))
    else:  # hinge
      ax = d.xaxis[j]
      cdofs.append(jnp.concatenate([ax, jnp.cross(ax, -off)]))
  cdof = jnp.stack(cdofs) if cdofs else jnp.zeros((0, 6), dtype)

  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def camlight(m: Model, d: Data) -> Data:
  """Camera/light frames (reference smooth.py:762). Fixed-mode only for
  now; tracking modes to follow."""
  if m.ncam == 0 and m.nlight == 0:
    return d
  if m.ncam:
    bodyid = list(m.cam_bodyid)
    bq = d.xquat[bodyid, :]
    cam_xpos = d.xpos[bodyid, :] + jax.vmap(math.rot_vec_quat)(m.cam_pos, bq)
    cam_xmat = jax.vmap(math.quat_to_mat)(
        jax.vmap(math.mul_quat)(bq, m.cam_quat))
    d = d.replace(cam_xpos=cam_xpos, cam_xmat=cam_xmat)
  if m.nlight:
    bodyid = list(m.light_bodyid)
    bq = d.xquat[bodyid, :]
    light_xpos = d.xpos[bodyid, :] + jax.vmap(math.rot_vec_quat)(
        m.light_pos, bq)
    light_xdir = jax.vmap(math.rot_vec_quat)(m.light_dir, bq)
    d = d.replace(light_xpos=light_xpos,
                  light_xdir=jax.vmap(math.normalize)(light_xdir))
  return d


def crb(m: Model, d: Data) -> Data:
  """Composite rigid body inertia + dense mass matrix
  (reference smooth.py:889; C mj_crb). qM assembly is one masked einsum."""
  crb_ = jnp.einsum('bc,ci->bi', m.body_subtree_mask, d.cinert, **_EINSUM)
  crb_ = crb_.at[0].set(0.0)  # MuJoCo never accumulates into the world body

  if m.nv == 0:
    return d.replace(crb=crb_)

  crb_dof = crb_[list(m.dof_bodyid), :]             # (nv, 10)
  buf = jax.vmap(math.inert_mul)(crb_dof, d.cdof)   # (nv, 6)
  qm_full = jnp.einsum('ik,jk->ij', buf, d.cdof, **_EINSUM)
  # mask[i, j] = dof j ancestor-or-self of i → strictly lower + diag
  qm = qm_full * m.dof_ancestor_mask
  qm = qm + jnp.tril(qm, -1).T                      # symmetrize
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(crb=crb_, qM=qm)


def factor_m(m: Model, d: Data) -> Data:
  """Dense Cholesky of qM (reference uses tiled wp.tile_cholesky /
  level-scheduled sparse LDL, smooth.py:1017-1104)."""
  return d.replace(qLD=linalg.cholesky(d.qM))


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
  """qM^-1 x via the cached Cholesky factor (reference smooth.py:2848)."""
  return linalg.cho_solve(d.qLD, x)


def com_vel(m: Model, d: Data) -> Data:
  """Spatial velocities + cdof time derivatives
  (reference smooth.py:2015; C mj_comVel)."""
  dtype = d.qpos.dtype
  cvel = [jnp.zeros(6, dtype)] * m.nbody
  cdof_dot = [jnp.zeros(6, dtype)] * max(m.nv, 1)

  for b in range(1, m.nbody):
    v = cvel[m.body_parentid[b]]
    jadr, jnum = m.body_jntadr[b], m.body_jntnum[b]
    for k in range(jnum):
      j = jadr + k
      jtype = m.jnt_type[j]
      dadr = m.jnt_dofadr[j]
      if jtype == JointType.FREE:
        # linear dofs: cdof_dot = 0; accumulate velocity first
        for i in range(3):
          v = v + d.cdof[dadr + i] * d.qvel[dadr + i]
        # rotational dofs: cdof_dot uses cvel incl. linear part
        for i in range(3, 6):
          cdof_dot[dadr + i] = math.motion_cross(v, d.cdof[dadr + i])
        for i in range(3, 6):
          v = v + d.cdof[dadr + i] * d.qvel[dadr + i]
      elif jtype == JointType.BALL:
        for i in range(3):
          cdof_dot[dadr + i] = math.motion_cross(v, d.cdof[dadr + i])
        for i in range(3):
          v = v + d.cdof[dadr + i] * d.qvel[dadr + i]
      else:
        cdof_dot[dadr] = math.motion_cross(v, d.cdof[dadr])
        v = v + d.cdof[dadr] * d.qvel[dadr]
    cvel[b] = v

  cvel = jnp.stack(cvel)
  cdof_dot = jnp.stack(cdof_dot)[:m.nv]
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


def rne(m: Model, d: Data) -> Data:
  """Recursive Newton-Euler bias forces with qacc = 0
  (reference smooth.py:1259; C mj_rne). Forward/backward passes are
  masked matmuls."""
  dtype = d.qpos.dtype
  if m.nv == 0:
    return d.replace(qfrc_bias=jnp.zeros(0, dtype))

  # cacc[b] = -gravity_at_root + sum over ancestor dofs of cdof_dot*qvel
  dof_contrib = d.cdof_dot * d.qvel[:, None]            # (nv, 6)
  cacc = jnp.einsum('bj,ji->bi', m.body_dof_ancestor_mask, dof_contrib,
                    **_EINSUM)
  if not m.opt.disableflags & DisableBit.GRAVITY:
    grav = jnp.concatenate([jnp.zeros(3, dtype), -m.opt.gravity])
    cacc = cacc + grav[None, :]
    cacc = cacc.at[0].set(grav)  # world body included for completeness

  # per-body net force: cinert*cacc + cvel x* (cinert*cvel)
  icacc = jax.vmap(math.inert_mul)(d.cinert, cacc)
  icvel = jax.vmap(math.inert_mul)(d.cinert, d.cvel)
  cfrc = icacc + jax.vmap(math.motion_cross_force)(d.cvel, icvel)

  # backward: subtree force sums, then project on dof axes
  cfrc_sub = jnp.einsum('bc,ci->bi', m.body_subtree_mask, cfrc, **_EINSUM)
  qfrc_bias = jnp.einsum(
      'ji,ji->j', d.cdof, cfrc_sub[list(m.dof_bodyid), :], **_EINSUM)
  return d.replace(qfrc_bias=qfrc_bias, cacc=cacc)


def transmission(m: Model, d: Data) -> Data:
  """Actuator lengths and moment arms (reference smooth.py:2042-2605).
  JOINT transmission on 1-dof joints + free/ball; others to follow."""
  if m.nu == 0:
    return d
  dtype = d.qpos.dtype
  lengths = []
  moment = jnp.zeros((m.nu, m.nv), dtype)
  for u in range(m.nu):
    trntype = m.actuator_trntype[u]
    if trntype in (TrnType.JOINT, TrnType.JOINTINPARENT):
      j = m.actuator_trnid[u][0]
      jtype = m.jnt_type[j]
      qadr, dadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
      gear = m.actuator_gear[u]
      if jtype in (JointType.SLIDE, JointType.HINGE):
        lengths.append(d.qpos[qadr] * gear[0])
        moment = moment.at[u, dadr].set(gear[0])
      elif jtype == JointType.BALL:
        q = d.qpos[qadr:qadr + 4]
        axis = math.quat_to_vel(q)
        if trntype == TrnType.JOINTINPARENT:
          axis = math.rot_vec_quat(axis, math.quat_inv(q))
        lengths.append(jnp.dot(axis, gear[:3]))
        g = gear[:3]
        if trntype == TrnType.JOINTINPARENT:
          g = math.rot_vec_quat(g, math.quat_inv(q))
        moment = moment.at[u, dadr:dadr + 3].set(g)
      elif jtype == JointType.FREE:
        lengths.append(jnp.zeros((), dtype))
        g = gear
        if trntype == TrnType.JOINTINPARENT:
          q = d.qpos[qadr + 3:qadr + 7]
          gl = math.rot_vec_quat(gear[:3], q)
          ga = math.rot_vec_quat(gear[3:], q)
          g = jnp.concatenate([gl, ga])
        moment = moment.at[u, dadr:dadr + 6].set(g)
      else:
        raise NotImplementedError(f'joint transmission on {jtype}')
    else:
      raise NotImplementedError(f'transmission type {trntype}')
  return d.replace(actuator_length=jnp.stack(lengths),
                   actuator_moment=moment)


def subtree_vel(m: Model, d: Data) -> Data:
  """Subtree linear velocity and angular momentum (reference
  smooth.py:3044; C mj_subtreeVel). Needed by subtree sensors."""
  # linear velocity of each body com in world frame
  offset = d.xipos - d.subtree_com[list(m.body_rootid), :]
  lin = d.cvel[:, 3:] - jnp.cross(offset, d.cvel[:, :3])
  ang = d.cvel[:, :3]
  mass = m.body_mass[:, None]
  mom = jnp.einsum('bc,ci->bi', m.body_subtree_mask, lin * mass, **_EINSUM)
  subtreemass = jnp.maximum(m.body_subtreemass, 1e-12)[:, None]
  subtree_linvel = mom / subtreemass
  # subtree com position
  subtree_compos = jnp.einsum('bc,ci->bi', m.body_subtree_mask,
                              d.xipos * mass, **_EINSUM) / subtreemass
  # angular momentum about subtree com
  dcom = d.xipos - subtree_compos[list(m.body_rootid), :]  # placeholder
  # per-body inertia in world frame: ximat diag(inertia) ximatT
  ri = d.ximat * m.body_inertia[:, None, :]
  iworld = jnp.einsum('bij,bkj->bik', ri, d.ximat, **_EINSUM)
  amom_body = jnp.einsum('bij,bj->bi', iworld, ang, **_EINSUM)

  def accumulate(b):
    rel = d.xipos - subtree_compos[b][None, :]
    vrel = lin - subtree_linvel[b][None, :]
    contrib = amom_body + mass * jnp.cross(rel, vrel)
    return jnp.einsum('c,ci->i', m.body_subtree_mask[b], contrib, **_EINSUM)

  subtree_angmom = jax.vmap(accumulate)(jnp.arange(m.nbody))
  del dcom
  return d.replace(subtree_linvel=subtree_linvel,
                   subtree_angmom=subtree_angmom)
