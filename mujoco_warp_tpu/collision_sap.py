"""Large-scene broadphase: static filtered pair arrays + per-step
world-AABB cull + top-K compaction, with dynamic-pair narrowphase.

Role of the reference SAP broadphase (reference collision_driver.py:
554-643 sap_broadphase, auto-selected over NXN at io.py:349-354), with
a deliberately different algorithm. The reference sorts geoms along a
fixed axis per world and sweeps, because its NXN kernel enumerates all
ngeom^2 thread pairs. Here the admissible pair list is precomputed
(io._sap_precompute, vectorized contype/conaffinity/weld/parent/
exclude filters), so the per-step work is already only ~|admissible|
AABB tests — measured 9% of ngeom^2 on the kitchen scene — all as one
vectorized gather+compare. A sort-based sweep was prototyped and
REJECTED: on furniture-dominated scenes every sweep axis degenerates
(room-spanning boxes overlap everything; the kitchen needs a rank
window of 414-1607 of 1608 geoms on the best axis, i.e. the sweep
re-derives the dense test while paying a sort per world per step).

Differences from the static-NXN driver (collision_driver.py):
- candidate pair identity is runtime data (top-K gather over the pair
  array), so contact params mix dynamically (C mj_contactParam) and
  condim is carried per contact;
- overlap tests use world-frame AABBs (mjModel geom_aabb rotated per
  step) — bounding spheres are useless for elongated furniture boxes;
- overflow beyond each family's top-K budget is counted into
  ncollision (same observability convention as cull drops).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import collision_convex
from . import collision_driver
from . import collision_primitive
from .types import Data, GeomType, Model


class SapMeta(NamedTuple):
  """Static structure (hashable — lives in Model meta)."""
  # (type1, type2, start, count) slices into the sap_pairs leaf
  families: Tuple[Tuple[int, int, int, int], ...] = ()
  # plane pairs (a plane has no AABB): (PLANE, type2, ((g1, g2, pid)..))
  plane_groups: Tuple[Tuple[int, int, tuple], ...] = ()


def _dyn_params(m: Model, g1j, g2j, pidj, dtype):
  """Contact-parameter mixing for runtime pair ids — the dynamic-gather
  version of collision_driver._candidate_params (C mj_contactParam)."""
  pr = jnp.asarray(np.asarray(m.geom_priority), jnp.int32)
  cd = jnp.asarray(np.asarray(m.geom_condim), jnp.int32)
  p1 = pr[g1j]
  p2 = pr[g2j]
  use1 = p1 > p2
  eq = p1 == p2

  f1 = m.geom_friction[g1j]
  f2 = m.geom_friction[g2j]
  fmax = jnp.maximum(f1, f2)
  fr3 = jnp.where(eq[:, None], fmax, jnp.where(use1[:, None], f1, f2))
  friction = jnp.stack([fr3[:, 0], fr3[:, 0], fr3[:, 1], fr3[:, 2],
                        fr3[:, 2]], axis=1)

  s1 = m.geom_solmix[g1j]
  s2 = m.geom_solmix[g2j]
  denom = s1 + s2
  mix = jnp.where(denom > 1e-12, s1 / jnp.where(denom > 1e-12, denom, 1.0),
                  0.5)
  mix = jnp.where((s1 < 1e-12) & (s2 < 1e-12), 0.5, mix)
  mix = jnp.where((s1 < 1e-12) & (s2 >= 1e-12), 0.0, mix)
  mix = jnp.where((s2 < 1e-12) & (s1 >= 1e-12), 1.0, mix)
  mix = jnp.where(eq, mix, jnp.where(use1, 1.0, 0.0))

  sr1, sr2 = m.geom_solref[g1j], m.geom_solref[g2j]
  standard = (sr1[:, 0] > 0) & (sr2[:, 0] > 0)
  solref = jnp.where(standard[:, None], mix[:, None] * sr1 +
                     (1 - mix)[:, None] * sr2, jnp.minimum(sr1, sr2))
  si1, si2 = m.geom_solimp[g1j], m.geom_solimp[g2j]
  solimp = mix[:, None] * si1 + (1 - mix)[:, None] * si2
  margin = jnp.maximum(m.geom_margin[g1j], m.geom_margin[g2j])
  gap = jnp.maximum(m.geom_gap[g1j], m.geom_gap[g2j])
  condim = jnp.where(eq, jnp.maximum(cd[g1j], cd[g2j]),
                     jnp.where(use1, cd[g1j], cd[g2j]))
  solreffriction = jnp.zeros_like(solref)

  if m.npair:
    is_pair = pidj >= 0
    pid = jnp.maximum(pidj, 0)
    friction = jnp.where(is_pair[:, None], m.pair_friction[pid], friction)
    solref = jnp.where(is_pair[:, None], m.pair_solref[pid], solref)
    solreffriction = jnp.where(is_pair[:, None],
                               m.pair_solreffriction[pid], solreffriction)
    solimp = jnp.where(is_pair[:, None], m.pair_solimp[pid], solimp)
    margin = jnp.where(is_pair, m.pair_margin[pid], margin)
    gap = jnp.where(is_pair, m.pair_gap[pid], gap)
    pair_dim = jnp.asarray(np.asarray(m.pair_dim), jnp.int32)
    condim = jnp.where(is_pair, pair_dim[pid], condim)

  includemargin = margin - gap
  return (friction.astype(dtype), solref.astype(dtype),
          solreffriction.astype(dtype), solimp.astype(dtype),
          margin.astype(dtype), includemargin.astype(dtype), condim)


def _family_slots(count: int, nconmax: int) -> int:
  """Active-candidate budget per family: enough to fill the contact
  pool with headroom (env MJWT_SAP_K overrides)."""
  import os
  k = int(os.environ.get('MJWT_SAP_K', max(2 * nconmax, 64)))
  return max(8, min(count, k))


def _run_family(m, d, pack, t1, t2, g1j, g2j, pidj, valid, dtype,
                geom_dataid):
  """Dispatch one family's gathered candidates to its collider."""
  params = _dyn_params(m, g1j, g2j, pidj, dtype)
  fn = collision_primitive.COLLIDERS.get((t1, t2))
  kcon = collision_primitive.MAX_CONTACTS.get((t1, t2), 1)
  needs_verts = GeomType.MESH in (t1, t2)
  is_mpr = fn is None
  if is_mpr:
    fn, kcon = collision_convex.collider(t1, t2, int(m.opt.disableflags))
  needs_margin = is_mpr or (t1, t2) in collision_primitive.NEEDS_MARGIN
  args = [d.geom_xpos[g1j], d.geom_xmat[g1j], m.geom_size[g1j],
          d.geom_xpos[g2j], d.geom_xmat[g2j], m.geom_size[g2j]]
  if needs_verts or is_mpr:
    def hull_dyn(gj, t):
      if t != GeomType.MESH:
        return jnp.zeros((gj.shape[0], 1, 4), m.mesh_hullvert_small.dtype)
      did = jnp.take(jnp.asarray(geom_dataid, jnp.int32), gj)
      return m.mesh_hullvert_small[did]
    args += [hull_dyn(g1j, t1), hull_dyn(g2j, t2)]
  if needs_margin:
    args.append(params[4])
  dist_k, pos_k, frame_k = jax.vmap(fn)(*args)
  pack(dist_k, pos_k, frame_k, params, g1j, g2j, kcon, valid=valid)


def collision(m: Model, d: Data) -> Data:
  """Large-scene driver entry (dispatched from collision_driver)."""
  from . import collision_flex
  meta: SapMeta = m.sap_meta
  dtype = d.qpos.dtype
  nconmax = d.contact.dist.shape[0]
  geom_dataid = np.asarray(m.geom_dataid)

  # world AABBs, computed once per step
  ac = m.geom_aabb[:, 0]
  ah = m.geom_aabb[:, 1]
  cw = d.geom_xpos + jnp.einsum('nij,nj->ni', d.geom_xmat, ac)
  hw = (jnp.einsum('nij,nj->ni', jnp.abs(d.geom_xmat), ah) +
        m.geom_margin[:, None])                     # (n, 3)

  parts = []
  pack = collision_driver.make_pack(parts, dtype)
  ncull_dropped = jnp.zeros((), jnp.int32)

  for (t1, t2, start, count) in meta.families:
    ga = m.sap_pairs[start:start + count, 0]
    gb = m.sap_pairs[start:start + count, 1]
    slack = jnp.min(hw[ga] + hw[gb] - jnp.abs(cw[ga] - cw[gb]), axis=-1)
    mask = slack >= 0
    kk = _family_slots(count, nconmax)
    if kk < count:
      key = jnp.where(mask, slack, -jnp.inf)
      _, sel = jax.lax.top_k(key, kk)
      valid = mask[sel]
      ncull_dropped = ncull_dropped + jnp.maximum(
          0, jnp.sum(mask.astype(jnp.int32)) - kk)
      g1j = ga[sel]
      g2j = gb[sel]
      pidj = jnp.where(valid, m.sap_pairid[start:start + count][sel], -1)
    else:
      g1j, g2j = ga, gb
      pidj = m.sap_pairid[start:start + count]
      valid = mask
    _run_family(m, d, pack, t1, t2, g1j, g2j, pidj, valid, dtype,
                geom_dataid)

  # plane groups: signed-distance cull (planes have no AABB)
  for (t1, t2, glist) in meta.plane_groups:
    g1s = np.array([g for g, _, _ in glist], np.int32)
    g2s = np.array([g for _, g, _ in glist], np.int32)
    pids = np.array([p for _, _, p in glist], np.int32)
    nrm = d.geom_xmat[g1s][..., :, 2]
    sdist = jnp.sum((d.geom_xpos[g2s] - d.geom_xpos[g1s]) * nrm, -1)
    reach = m.geom_rbound[g2s] + m.geom_margin[g2s] + m.geom_margin[g1s]
    overlap = sdist <= reach
    kk = _family_slots(len(glist), nconmax)
    if kk < len(glist):
      key = jnp.where(overlap, -sdist, -jnp.inf)
      _, sel = jax.lax.top_k(key, kk)
      valid = overlap[sel]
      ncull_dropped = ncull_dropped + jnp.maximum(
          0, jnp.sum(overlap.astype(jnp.int32)) - kk)
      g1j = jnp.take(jnp.asarray(g1s), sel)
      g2j = jnp.take(jnp.asarray(g2s), sel)
      pidj = jnp.where(valid, jnp.take(jnp.asarray(pids), sel), -1)
    else:
      g1j, g2j = jnp.asarray(g1s), jnp.asarray(g2s)
      pidj = jnp.asarray(pids)
      valid = overlap
    _run_family(m, d, pack, t1, t2, g1j, g2j, pidj, valid, dtype,
                geom_dataid)

  if collision_flex.n_candidates(m):
    parts.extend(collision_flex.candidate_parts(m, d, dtype))

  return collision_driver.finalize(d, parts, ncull_dropped, dtype)
