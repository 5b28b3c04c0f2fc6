"""Support operations: mass-matrix products, Cartesian force mapping,
Jacobians (reference: mujoco_warp/_src/support.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math
from .types import Data, Model

_EINSUM = dict(precision=jax.lax.Precision.HIGHEST)


def mul_m(m: Model, d: Data, vec: jax.Array) -> jax.Array:
  """qM @ vec (reference support.py:133). Dense."""
  return jnp.einsum('ij,j->i', d.qM, vec, **_EINSUM)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
  """Map Cartesian wrenches d.xfrc_applied (applied at body com, world
  frame) to generalized forces (reference support.py:229)."""
  force = d.xfrc_applied[:, :3]
  torque = d.xfrc_applied[:, 3:]
  offset = d.xipos - d.subtree_com[list(m.body_rootid), :]
  cfrc = jnp.concatenate([torque + jnp.cross(offset, force), force], axis=1)
  csub = jnp.einsum('bc,ci->bi', m.body_subtree_mask, cfrc, **_EINSUM)
  return jnp.einsum('ji,ji->j', d.cdof, csub[list(m.dof_bodyid), :],
                    **_EINSUM)


def jac(m: Model, d: Data, point: jax.Array, bodyid: int
        ) -> tuple[jax.Array, jax.Array]:
  """Dense translation/rotation Jacobians (3, nv) of a world-frame point
  on a body (reference support.py:473; C mj_jac)."""
  mask = m.body_dof_ancestor_mask[bodyid]  # (nv,)
  offset = point - d.subtree_com[m.body_rootid[bodyid]]
  jacr = d.cdof[:, :3] * mask[:, None]
  jacp = (d.cdof[:, 3:] - jnp.cross(
      jnp.broadcast_to(offset, (m.nv, 3)), d.cdof[:, :3])) * mask[:, None]
  return jacp.T, jacr.T


def jac_dyn(m: Model, d: Data, point: jax.Array, bodyid: jax.Array
            ) -> tuple[jax.Array, jax.Array]:
  """jac() with a traced body id: masks/gathers instead of static index.
  Used by contact constraint assembly where the geom pair (hence body)
  varies per contact slot."""
  mask = m.body_dof_ancestor_mask[bodyid]  # (nv,) gather on traced id
  offset = point - d.subtree_com[jnp.asarray(m.body_rootid)[bodyid]]
  jacr = d.cdof[:, :3] * mask[:, None]
  jacp = (d.cdof[:, 3:] - jnp.cross(
      jnp.broadcast_to(offset, (m.nv, 3)), d.cdof[:, :3])) * mask[:, None]
  return jacp.T, jacr.T


def apply_ft(m: Model, d: Data, force: jax.Array, torque: jax.Array,
             point: jax.Array, bodyid: int) -> jax.Array:
  """Generalized force from a wrench at a world point on a body
  (reference support.py:219; C mj_applyFT)."""
  jacp, jacr = jac(m, d, point, bodyid)
  return jnp.einsum('ij,i->j', jacp, force, **_EINSUM) + jnp.einsum(
      'ij,i->j', jacr, torque, **_EINSUM)
