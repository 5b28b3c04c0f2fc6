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

from ..types import JointType, Model

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
      xp = mp_ref[:, mid:mid + 1] * one
      xq = _qnormalize(mq_ref[:, mid:mid + 1] * one)
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
          pl.BlockSpec((3, max(m.nmocap, 1)), lambda i: (0, 0),
                       memory_space=vm),
          pl.BlockSpec((4, max(m.nmocap, 1)), lambda i: (0, 0),
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
    (m.mocap_pos0.T if m.nmocap else jnp.zeros((3, 1), qpos.dtype)),
    (m.mocap_quat0.T if m.nmocap else jnp.zeros((4, 1), qpos.dtype)))
  xpos, xquat, xanchor, xaxis = outs
  t = lambda x: jnp.moveaxis(x[..., :W], -1, 0)
  return t(xpos), t(xquat), t(xanchor), t(xaxis)
