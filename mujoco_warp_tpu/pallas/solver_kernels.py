"""Worlds-in-lanes Pallas Newton solver: the ENTIRE constraint solve —
init, linesearch, constraint update, Hessian assembly, Cholesky,
convergence — in ONE kernel per 128-world block.

Why: the XLA-level solver pays ~15-20 fused-kernel dispatches per
iteration plus a full HBM round trip of efc_J (~77 MB at 8192 worlds),
and its `lax.while_loop` iterates until the SLOWEST world of the whole
batch converges. Here each 128-world block iterates only until its own
worlds are done (the TPU analogue of the reference's per-world early
outs + conditional CUDA graph, mujoco_warp/_src/solver.py:3151-3343),
and every per-iteration quantity lives in VMEM.

Scope: Newton, both friction cones — pyramidal and elliptic (zones,
cone-surface forces, JTCJ Hessian block corrections, cone linesearch
terms; reference solver.py elliptic branch). The in-kernel linesearch
(bracket + secant + Newton polish on the convex phi') serves both the
ls_parallel and iterative-LS configurations. CG falls back to the XLA
solver.

As a bonus the kernel also computes qacc_smooth = qM^-1 qfrc_smooth and
the qM Cholesky factor (the fwd_acceleration products, reference
smooth.py:2907 factor_solve_i) since qM must be resident anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .smooth_kernels import _qmul, _qnormalize

LANES = 128
_MINVAL = 1e-15


def _chol_cols(nv, row_read):
  """Cholesky of a symmetric A given contiguous row reads (row j ==
  column j). Columns are kept as live values (no strided ref traffic),
  the pattern proven in batch_linalg._cholesky_solve_body_values."""
  cols = []
  for j in range(nv):
    s = row_read(j)                       # (nv, L)
    for k in range(j):
      s = s - cols[k] * cols[k][j][None, :]
    inv = jax.lax.rsqrt(jnp.maximum(s[j], _MINVAL))[None, :]
    cols.append(s * inv)
  return cols


def _chol_solve(nv, cols, b):
  """Solve L L^T x = b from value columns; b (nv, L) -> x (nv, L)."""
  ys = []
  for j in range(nv):
    yj = b[j]
    for k in range(j):
      yj = yj - cols[k][j] * ys[k]
    ys.append(yj / cols[j][j])
  xs = [None] * nv
  for j in range(nv - 1, -1, -1):
    xj = ys[j]
    for k in range(j + 1, nv):
      xj = xj - cols[j][k] * xs[k]
    xs[j] = xj / cols[j][j]
  return jnp.stack(xs, axis=0)


def _newton_kernel(cfg, p_ref, qm_ref, j_ref, d_ref, aref_ref, fl_ref,
                   qfs_ref, ws_ref, hb_ref, qacc_ref, qfc_ref, force_ref,
                   niter_ref, qaccs_ref, qld_ref, qacce_ref, h_scr,
                   jd_scr, ma_scr, jaref_scr, search_scr, cost_scr,
                   done_scr, jt_scr):
  # J arrives in the contact megakernel's native (nj, nv, L) layout; one
  # in-VMEM transpose (~83us at humanoid size) replaces the ~500us XLA
  # relayout copies between the two custom calls (round-4 HLO profile)
  jt_scr[...] = jnp.swapaxes(j_ref[...], 0, 1)
  _newton_core(cfg, p_ref, qm_ref, jt_scr, d_ref, aref_ref, fl_ref,
               qfs_ref[...], ws_ref[...], hb_ref[...], None, qacc_ref,
               qfc_ref, force_ref, niter_ref, qaccs_ref, qld_ref,
               qacce_ref, h_scr, jd_scr, ma_scr, jaref_scr, search_scr,
               cost_scr, done_scr)


def _newton_ell_kernel(cfg, p_ref, qm_ref, j_ref, d_ref, aref_ref,
                       fl_ref, qfs_ref, ws_ref, hb_ref, fr_ref, dim_ref,
                       qacc_ref, qfc_ref, force_ref, niter_ref,
                       qaccs_ref, qld_ref, qacce_ref, h_scr, jd_scr,
                       ma_scr, jaref_scr, search_scr, cost_scr,
                       done_scr, jt_scr):
  jt_scr[...] = jnp.swapaxes(j_ref[...], 0, 1)
  _newton_core(cfg, p_ref, qm_ref, jt_scr, d_ref, aref_ref, fl_ref,
               qfs_ref[...], ws_ref[...], hb_ref[...],
               (fr_ref[...], dim_ref[...]), qacc_ref, qfc_ref,
               force_ref, niter_ref, qaccs_ref, qld_ref, qacce_ref,
               h_scr, jd_scr, ma_scr, jaref_scr, search_scr, cost_scr,
               done_scr)


def _newton_core(cfg, p_ref, qm_ref, j_ref, d_ref, aref_ref, fl_ref,
                 qfs, ws, hb, con, qacc_ref, qfc_ref, force_ref,
                 niter_ref, qaccs_ref, qld_ref, qacce_ref, h_scr,
                 jd_scr, ma_scr, jaref_scr, search_scr, cost_scr,
                 done_scr):
  """J layout is (nv, nj, L): every hot read — J rows, qM rows, H rows —
  is a contiguous leading-dim slice. Strided middle-dim indexing and
  per-element writes measured ~100x slower in Mosaic. `qfs` (qfrc_smooth)
  and `ws` (warmstart qacc) come in as VALUES so the glue kernel can
  assemble qfrc_smooth in its preamble. `con` = (friction (C, 5, L),
  dim (C, L)) values for the elliptic cone (None for pyramidal).
  cfg may carry a 10th element `hcover`: a static (nv, nv) bool
  tuple-of-tuples marking dof pairs some constraint row can co-touch —
  H[i, j] reductions outside it are statically zero and skipped
  (e.g. humanoid: left-leg x right-arm dofs never share a row)."""
  hcover = cfg[9] if len(cfg) > 9 else None
  (nv, nj, ne, nf, iterations, ls_k, use_ws, euler_damp, ell) = cfg[:9]
  L = qfs.shape[-1]
  dt = jnp.float32

  tol = p_ref[0, 0]
  meaninertia = p_ref[1, 0]
  rescale_den = jnp.maximum(meaninertia, _MINVAL) * max(1, nv)

  # static row-class masks from the fixed efc layout (rows [0,ne) are
  # equality, [ne,ne+nf) friction, the rest one-sided limits/contacts);
  # built with iota in-kernel (captured jnp constants are not allowed)
  r = jax.lax.broadcasted_iota(jnp.int32, (nj, 1), 0)
  is_eq = r < ne
  is_fr = (r >= ne) & (r < ne + nf)
  is_one = r >= ne + nf

  D = d_ref[...]
  fl = fl_ref[...]
  rf = fl / jnp.maximum(D, _MINVAL)

  # ---- elliptic cone precompute (reference solver.py elliptic branch;
  # mirrors the XLA _elliptic_quantities/_elliptic_zones in solver.py) --
  if ell is not None:
    base, S, C = ell
    assert base + C * S == nj, 'contact rows must be the efc tail'
    impratio = p_ref[3, 0]
    fr_c, dim_c = con                     # (C, 5, L), (C, L)
    mu_c = fr_c[:, 0, :] / jnp.sqrt(jnp.maximum(impratio, _MINVAL))
    s_rows = [mu_c[:, None, :]]
    valid_rows = [(dim_c >= 1.0)[:, None, :]]
    for rr in range(1, S):
      s_rows.append(fr_c[:, min(rr - 1, 4), :][:, None, :])
      valid_rows.append((dim_c > float(rr))[:, None, :])
    s_c = jnp.concatenate(s_rows, axis=1)            # (C, S, L)
    rowvalid = jnp.concatenate(valid_rows, axis=1)   # (C, S, L) bool
    # frictionless (dim == 1) contacts keep the one-sided row handling
    is_ell_c = dim_c > 1.0                           # (C, L)
    ell_rows = jnp.repeat(is_ell_c, S, axis=0)       # (C*S, L)
    rv_f = rowvalid.astype(dt)
    d_blk = D[base:].reshape(C, S, L)
    d0_c = d_blk[:, 0, :]
    mu2_c = mu_c * mu_c
    dm_c = d0_c / jnp.maximum(mu2_c * (1.0 + mu2_c), _MINVAL)

    def cone_xu(vec):
      """Contact tail of a (nj, L) row vector -> (x, u, N, T) blocks."""
      x = vec[base:].reshape(C, S, L) * rv_f
      u = x * s_c
      n_c = u[:, 0, :]
      t_c = jnp.sqrt(jnp.maximum(
          jnp.sum(u[:, 1:, :] ** 2, axis=1), 0.0))
      return x, u, n_c, t_c

    def cone_zones(n_c, t_c):
      top = n_c >= mu_c * t_c
      bottom = ~top & (mu_c * n_c + t_c <= 0.0)
      middle = (~top & ~bottom) & is_ell_c
      return top, bottom & is_ell_c, middle
  else:
    ell_rows = None

  def matvec_qm(x):
    rows = [jnp.sum(qm_ref[i] * x, axis=0, keepdims=True)
            for i in range(nv)]
    return jnp.concatenate(rows, axis=0)

  def matvec_j(x):                         # (nv, L) -> (nj, L)
    acc = j_ref[0] * x[0:1]
    for n in range(1, nv):
      acc = acc + j_ref[n] * x[n:n + 1]
    return acc

  def matvec_jt(y):                        # (nj, L) -> (nv, L)
    rows = [jnp.sum(j_ref[n] * y, axis=0, keepdims=True)
            for n in range(nv)]
    return jnp.concatenate(rows, axis=0)

  # ---- qM factor + qacc_smooth (fwd_acceleration fold-in) ----
  qm_cols = _chol_cols(nv, lambda j: qm_ref[j])
  for j in range(nv):
    qld_ref[:, j, :] = qm_cols[j]
  qacc_smooth = _chol_solve(nv, qm_cols, qfs)
  qaccs_ref[...] = qacc_smooth

  def update_constraint(jaref):
    lin_neg = is_fr & (jaref <= -rf)
    lin_pos = is_fr & (jaref >= rf)
    quad = is_eq | (is_fr & ~lin_neg & ~lin_pos) | (is_one & (jaref < 0.0))
    force = jnp.where(quad, -D * jaref, 0.0)
    force = jnp.where(lin_neg, fl, force)
    force = jnp.where(lin_pos, -fl, force)
    cost_rows = jnp.where(quad, 0.5 * D * jaref * jaref, 0.0)
    cost_rows = jnp.where(lin_neg, -fl * (0.5 * rf + jaref), cost_rows)
    cost_rows = jnp.where(lin_pos, -fl * (0.5 * rf - jaref), cost_rows)
    if ell is not None:
      # cone zones per contact block (reference update_constraint_efc
      # elliptic branch; XLA mirror solver._update_constraint)
      x, u, n_c, t_c = cone_xu(jaref)
      top, bottom, middle = cone_zones(n_c, t_c)
      nmt = n_c - mu_c * t_c
      f_norm = -dm_c * nmt * mu_c                      # (C, L)
      t_safe = jnp.maximum(t_c, _MINVAL)
      f_fric = -(f_norm / t_safe)[:, None, :] * (u * s_c)
      f_mid = jnp.concatenate([f_norm[:, None, :], f_fric[:, 1:, :]],
                              axis=1)
      f_bot = -d_blk * x
      f_blk = (jnp.where(middle[:, None, :], f_mid,
                         jnp.where(bottom[:, None, :], f_bot, 0.0)) *
               rv_f).reshape(C * S, L)
      force = jnp.concatenate([
          force[:base],
          jnp.where(ell_rows, f_blk, force[base:])], axis=0)
      c_mid = 0.5 * dm_c * nmt * nmt
      c_bot = jnp.sum(0.5 * d_blk * x * x * rv_f, axis=1)
      c_blk = jnp.where(middle, c_mid, jnp.where(bottom, c_bot, 0.0))
      cost_rows = jnp.concatenate([
          cost_rows[:base],
          jnp.where(ell_rows, 0.0, cost_rows[base:])], axis=0)
      cost = (jnp.sum(cost_rows, axis=0, keepdims=True) +
              jnp.sum(c_blk, axis=0, keepdims=True))
      quad_blk = (bottom[:, None, :] & rowvalid).reshape(C * S, L)
      quad = jnp.concatenate([
          quad[:base], jnp.where(ell_rows, quad_blk, quad[base:])],
          axis=0)
      return force, cost, quad
    cost = jnp.sum(cost_rows, axis=0, keepdims=True)
    return force, cost, quad

  def gauss_cost(qacc, ma):
    return 0.5 * jnp.sum((ma - qfs) * (qacc - qacc_smooth), axis=0,
                         keepdims=True)

  def _h_rows_from_jd(read_jd):
    """Assemble symmetric H rows: only the lower triangle is reduced
    (sum over nj), the upper mirrors it — halves the dominant
    O(nv^2 nj) Hessian cost (H = M + J^T diag(dh) J is symmetric) —
    and statically-uncovered (i, j) pairs (hcover) skip the reduction
    entirely (their J^T D J entry is exactly zero for every world)."""
    zrow = jnp.zeros((1, L), dt)
    low = [[None] * nv for _ in range(nv)]
    for i in range(nv):
      jd_i = read_jd(i)
      for j in range(i + 1):
        if hcover is not None and not hcover[i][j]:
          low[i][j] = zrow
          continue
        low[i][j] = jnp.sum(jd_i * j_ref[j], axis=0, keepdims=True)
    rows = []
    for i in range(nv):
      vals = [low[i][j] if j <= i else low[j][i] for j in range(nv)]
      rows.append(qm_ref[i] + jnp.concatenate(vals, axis=0))
    return rows

  def newton_mgrad(grad, quad, jaref=None):
    dh = D * quad.astype(dt)               # (nj, L)
    if ell is None:
      for i in range(nv):
        jd_scr[i] = j_ref[i] * dh
      rows = _h_rows_from_jd(lambda i: jd_scr[i])
      for i in range(nv):
        h_scr[i] = rows[i]
      cols = _chol_cols(nv, lambda j: h_scr[j])
      return _chol_solve(nv, cols, grad)

    # elliptic: H = M + J^T (diag(dh) + blockdiag(Cc)) J with the
    # cone-surface correction Cc per middle-zone contact (reference
    # update_gradient_JTCJ; XLA mirror solver._update_gradient)
    x, u, n_c, t_c = cone_xu(jaref)
    top, bottom, middle = cone_zones(n_c, t_c)
    t_safe = jnp.maximum(t_c, _MINVAL)
    t3 = jnp.maximum(t_c * t_safe * t_safe, _MINVAL)
    mu_over_t = mu_c / t_safe
    mnt3 = mu_c * n_c / t3
    diag_add = mu2_c - mu_c * n_c / t_safe
    mid_f = middle.astype(dt)
    # Cc[r, s] as (C, L) values in scaled coordinates x scale factors
    cc = {}
    for rr in range(S):
      for ss in range(rr, S):
        if rr == 0 and ss == 0:
          hc = jnp.ones((C, L), dt)
        elif rr == 0:
          hc = -mu_over_t * u[:, ss, :]
        else:
          hc = mnt3 * u[:, rr, :] * u[:, ss, :]
          if rr == ss:
            hc = hc + diag_add
        scale = dm_c * s_c[:, rr, :] * s_c[:, ss, :]
        mask = mid_f * rv_f[:, rr, :] * rv_f[:, ss, :]
        cc[(rr, ss)] = hc * scale * mask
    # weighted J rows: jd[i] = dh*J[i] + cone-mixed contact tail
    h_rows = []
    for i in range(nv):
      ji = j_ref[i]
      jd_i = ji * dh
      blk = ji[base:].reshape(C, S, L)
      mix_rows = []
      for rr in range(S):
        acc = cc[(rr, rr)] * blk[:, rr, :]
        for ss in range(S):
          if ss == rr:
            continue
          key = (rr, ss) if rr < ss else (ss, rr)
          acc = acc + cc[key] * blk[:, ss, :]
        mix_rows.append(acc[:, None, :])
      mix = jnp.concatenate(mix_rows, axis=1).reshape(C * S, L)
      jd_i = jnp.concatenate([jd_i[:base], jd_i[base:] + mix], axis=0)
      jd_scr[i] = jd_i
    # symmetric: J^T (diag(dh) + blockdiag(Cc)) J with Cc symmetric —
    # lower-triangle reductions only (see _h_rows_from_jd)
    h_rows = _h_rows_from_jd(lambda i: jd_scr[i])
    # f32 guard: relative Tikhonov floor keeps the cone-corrected H
    # factorizable (same guard as the XLA path)
    tr = h_rows[0][0:1] * 0.0
    for i in range(nv):
      tr = tr + h_rows[i][i:i + 1] * (1.0 / nv)
    eps = 1e-7 * tr                                   # (1, L)
    for i in range(nv):
      row = h_rows[i]
      parts = []
      if i > 0:
        parts.append(row[:i])
      parts.append(row[i:i + 1] + eps)
      if i < nv - 1:
        parts.append(row[i + 1:])
      h_scr[i] = jnp.concatenate(parts, axis=0)
    cols = _chol_cols(nv, lambda j: h_scr[j])
    return _chol_solve(nv, cols, grad)

  def linesearch(jaref, search, ma, jv, mv):
    g0 = jnp.sum(search * (ma - qfs), axis=0, keepdims=True)
    h0 = jnp.sum(search * mv, axis=0, keepdims=True)
    if ell is not None:
      jv_blk = jv[base:].reshape(C, S, L) * rv_f
      v_blk = jv_blk * s_c
      v1 = v_blk[:, 0, :]
      vfr2 = jnp.sum(v_blk[:, 1:, :] ** 2, axis=1)

    def phi_d(alpha):                      # alpha (1, L)
      x = jaref + alpha * jv
      lin_neg = is_fr & (x <= -rf)
      lin_pos = is_fr & (x >= rf)
      quad = is_eq | (is_fr & ~lin_neg & ~lin_pos) | (is_one & (x < 0.0))
      d1_rows = jnp.where(quad, D * x * jv, 0.0)
      d1_rows = d1_rows + jnp.where(lin_neg, -fl * jv, 0.0)
      d1_rows = d1_rows + jnp.where(lin_pos, fl * jv, 0.0)
      d2_rows = jnp.where(quad, D * jv * jv, 0.0)
      if ell is not None:
        # replace cone rows' one-sided terms with the per-contact cone
        # derivative (reference _eval_elliptic; XLA solver._linesearch)
        d1_rows = jnp.concatenate([
            d1_rows[:base], jnp.where(ell_rows, 0.0, d1_rows[base:])],
            axis=0)
        d2_rows = jnp.concatenate([
            d2_rows[:base], jnp.where(ell_rows, 0.0, d2_rows[base:])],
            axis=0)
      d1 = g0 + alpha * h0 + jnp.sum(d1_rows, axis=0, keepdims=True)
      d2 = h0 + jnp.sum(d2_rows, axis=0, keepdims=True)
      if ell is not None:
        xb = x[base:].reshape(C, S, L) * rv_f
        ub = xb * s_c
        n_a = ub[:, 0, :]
        t_a = jnp.sqrt(jnp.maximum(
            jnp.sum(ub[:, 1:, :] ** 2, axis=1), _MINVAL))
        t1 = jnp.sum(ub[:, 1:, :] * v_blk[:, 1:, :], axis=1) / t_a
        t2 = (vfr2 - t1 * t1) / t_a
        top, bottom, middle = cone_zones(n_a, t_a)
        nmt = n_a - mu_c * t_a
        n1mt1 = v1 - mu_c * t1
        d1_mid = dm_c * nmt * n1mt1
        d2_mid = dm_c * (n1mt1 * n1mt1 - nmt * mu_c * t2)
        d1_bot = jnp.sum(d_blk * xb * jv_blk, axis=1)
        d2_bot = jnp.sum(d_blk * jv_blk * jv_blk, axis=1)
        d1c = jnp.where(middle, d1_mid, jnp.where(bottom, d1_bot, 0.0))
        d2c = jnp.where(middle, d2_mid, jnp.where(bottom, d2_bot, 0.0))
        d1 = d1 + jnp.sum(d1c, axis=0, keepdims=True)
        d2 = d2 + jnp.sum(d2c, axis=0, keepdims=True)
      return d1, d2

    zero = jnp.zeros((1, L), dt)
    p1_0, p2_0 = phi_d(zero)
    alpha0 = jnp.maximum(-p1_0 / jnp.maximum(p2_0, _MINVAL), 0.0)

    scales = np.logspace(-3.0, 0.7, ls_k)
    # bracket the root of the piecewise-linear monotone phi'
    lo = jnp.zeros((1, L), dt)
    p1_lo = p1_0
    hi = jnp.full((1, L), jnp.inf, dt)
    p1_hi = jnp.full((1, L), jnp.inf, dt)
    for s in scales:
      a = alpha0 * np.float32(s)
      p1_a, _ = phi_d(a)
      neg = p1_a < 0
      lo = jnp.where(neg, a, lo)
      p1_lo = jnp.where(neg, p1_a, p1_lo)
      first_pos = (~neg) & (~jnp.isfinite(hi))
      hi = jnp.where(first_pos, a, hi)
      p1_hi = jnp.where(first_pos, p1_a, p1_hi)
    any_hi = jnp.isfinite(hi)
    denom = jnp.where(jnp.abs(p1_hi - p1_lo) < _MINVAL, 1.0, p1_hi - p1_lo)
    secant = lo - p1_lo * (hi - lo) / denom
    a_max = alpha0 * np.float32(scales[-1])
    p1_m, p2_m = phi_d(a_max)
    newton_tail = a_max - p1_m / jnp.maximum(p2_m, _MINVAL)
    alpha = jnp.where(any_hi, secant, jnp.maximum(newton_tail, a_max))
    alpha_cap = 10.0 * a_max
    # safeguarded Newton-bisection polish: phi' is only piecewise
    # smooth (cone zone transitions put kinks in it) and a raw Newton
    # step can oscillate across a kink forever — keep the bracket
    # [lo, hi] live and fall back to its midpoint whenever the Newton
    # step leaves it. (Cutting these to 2 for the pyramidal cone was
    # tried: alpha error ~1e-2 trajectory divergence in 15 steps — the
    # bracket can span multiple kinks, so keep 4.)
    for _ in range(4):
      p1_a, p2_a = phi_d(alpha)
      neg = p1_a < 0
      lo = jnp.where(neg, jnp.maximum(lo, alpha), lo)
      hi = jnp.where(neg, hi, jnp.minimum(hi, alpha))
      has_hi = jnp.isfinite(hi)
      step = alpha - p1_a / jnp.maximum(p2_a, _MINVAL)
      inside = (step > lo) & (step < hi)
      alpha = jnp.where(inside, step,
                        jnp.where(has_hi, 0.5 * (lo + hi),
                                  jnp.maximum(step, lo)))
      alpha = jnp.clip(alpha, 0.0, alpha_cap)
    return jnp.where(p1_0 >= 0, 0.0, alpha)

  # ---- init (reference solver.py:3257) ----
  qacc = ws if use_ws else qacc_smooth
  ma = matvec_qm(qacc)
  jaref = matvec_j(qacc) - aref_ref[...]
  force, cost_c, quad = update_constraint(jaref)
  cost = cost_c + gauss_cost(qacc, ma)
  grad = ma - qfs - matvec_jt(force)
  mgrad = newton_mgrad(grad, quad, jaref)
  gradnorm = jnp.sqrt(jnp.sum(grad * grad, axis=0, keepdims=True))
  done = gradnorm / rescale_den < tol

  # loop state lives in VMEM refs; the while carry is ONE scalar —
  # Mosaic legalizes scalar carries + ref mutation, not big value
  # carries with layout changes across iterations
  qacc_ref[...] = qacc
  ma_scr[...] = ma
  jaref_scr[...] = jaref
  search_scr[...] = -mgrad
  cost_scr[...] = cost
  done_scr[...] = done.astype(dt)
  niter_ref[...] = jnp.zeros((1, L), jnp.int32)

  def body(_):
    qacc = qacc_ref[...]
    ma = ma_scr[...]
    jaref = jaref_scr[...]
    search = search_scr[...]
    cost = cost_scr[...]
    done = done_scr[...] > 0.5
    niter = niter_ref[...]

    jv = matvec_j(search)
    mv = matvec_qm(search)
    alpha = linesearch(jaref, search, ma, jv, mv)
    alpha = jnp.where(done, 0.0, alpha)
    qacc = qacc + alpha * search
    ma = ma + alpha * mv
    jaref = jaref + alpha * jv
    force, cost_c, quad = update_constraint(jaref)
    newcost = cost_c + gauss_cost(qacc, ma)
    grad = ma - qfs - matvec_jt(force)
    mgrad = newton_mgrad(grad, quad, jaref)
    improvement = (cost - newcost) / rescale_den
    gradnorm = jnp.sqrt(jnp.sum(grad * grad, axis=0,
                                keepdims=True)) / rescale_den
    niter = niter + jnp.where(done, 0, 1)
    newdone = done | (improvement < tol) | (gradnorm < tol) | (
        niter >= iterations)

    qacc_ref[...] = qacc
    ma_scr[...] = ma
    jaref_scr[...] = jaref
    search_scr[...] = jnp.where(done, search, -mgrad)
    cost_scr[...] = jnp.where(done, cost, newcost)
    done_scr[...] = newdone.astype(dt)
    niter_ref[...] = niter
    return ~jnp.all(newdone)

  jax.lax.while_loop(lambda go: go, body, ~jnp.all(done))

  force, _, _ = update_constraint(jaref_scr[...])
  qfc = matvec_jt(force)
  qfc_ref[...] = qfc
  force_ref[...] = force

  if euler_damp:
    # semi-implicit Euler damping solve folded in (reference
    # forward.py:327 mj_Euler): (qM + h diag(B)) qacc' = qfrc_smooth +
    # qfrc_constraint, reusing the resident qM rows
    def row_with_diag(i):
      row = qm_ref[i]
      parts = []
      if i > 0:
        parts.append(row[:i])
      parts.append(row[i:i + 1] + hb[i:i + 1])
      if i < nv - 1:
        parts.append(row[i + 1:])
      return jnp.concatenate(parts, axis=0)
    cols_e = _chol_cols(nv, row_with_diag)
    qacce_ref[...] = _chol_solve(nv, cols_e, qfs + qfc)
  else:
    qacce_ref[...] = qacc_ref[...]


@functools.partial(jax.jit, static_argnames=('ne', 'nf', 'iterations',
                                             'ls_k', 'use_ws',
                                             'interpret', 'euler_damp',
                                             'ell', 'hcover'))
def newton_solve_batched(qm, efc_j, efc_d, efc_aref, efc_fl, qfrc_smooth,
                         warmstart, tolerance, meaninertia, hb=None,
                         con_friction=None, con_dim=None, impratio=None,
                         perm=None, inv_perm=None,
                         *, ne, nf, iterations, ls_k=10, use_ws=True,
                         interpret=False, euler_damp=False, ell=None,
                         hcover=None):
  """Batched Newton solve. All inputs (W, ...) batch-first; returns
  (qacc, qfrc_constraint, efc_force, niter, qacc_smooth, qLD).
  ell = (base, S, C) static contact-block layout for the elliptic cone
  (con_friction (W, C, 5), con_dim (W, C) and impratio required).
  perm/inv_perm: optional world permutation grouping similar-difficulty
  worlds into the same 128-lane block (see make_glue_kernel.run)."""
  W, nj, nv = efc_j.shape
  wpad = -(-W // LANES) * LANES
  dt = qm.dtype
  from . import probe as _probe
  _probe.vmem_ok(f'newton_solve nv{nv} nj{nj}',  # PL006 static estimate
                 (nv, nv, LANES), (nj, nv, LANES), (nv, nj, LANES),
                 (nv, nj, LANES), (nv, nv, LANES), (nv, nv, LANES))

  def bl(x):
    if perm is not None:
      x = jnp.take(x, perm, axis=0)
    x = jnp.moveaxis(x, 0, -1)
    if wpad != W:
      x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, wpad - W),))
    return x

  qm_t = bl(qm)
  if wpad != W:  # keep padded-lane factorization finite
    eye = jnp.eye(nv, dtype=dt)[:, :, None]
    pad_mask = jnp.arange(wpad) >= W
    qm_t = jnp.where(pad_mask[None, None, :], eye, qm_t)
  if impratio is None:
    impratio = jnp.ones((), dt)
  params = jnp.stack([tolerance.astype(dt).reshape(()),
                      meaninertia.astype(dt).reshape(()),
                      jnp.zeros((), dt),
                      impratio.astype(dt).reshape(())])[:, None]

  cfg = (nv, nj, ne, nf, iterations, ls_k, use_ws, euler_damp, ell,
         hcover)
  if hb is None:
    hb = jnp.zeros((nv,), dt)
  vm = pltpu.VMEM
  lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                 memory_space=vm)
  lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                    memory_space=vm)
  in_specs = [
      pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=vm),
      lane3(nv, nv), lane3(nj, nv), lane2(nj), lane2(nj), lane2(nj),
      lane2(nv), lane2(nv),
      pl.BlockSpec((nv, 1), lambda i: (0, 0), memory_space=vm),
  ]
  inputs = [params, qm_t, bl(efc_j), bl(efc_d),
            bl(efc_aref), bl(efc_fl), bl(qfrc_smooth), bl(warmstart),
            hb.astype(dt)[:, None]]
  if ell is None:
    kernel = functools.partial(_newton_kernel, cfg)
  else:
    _, S, C = ell
    kernel = functools.partial(_newton_ell_kernel, cfg)
    in_specs += [lane3(C, 5), lane2(C)]
    inputs += [bl(con_friction.astype(dt)), bl(con_dim.astype(dt))]
  outs = pl.pallas_call(
      kernel,
      grid=(wpad // LANES,),
      interpret=interpret,
      in_specs=in_specs,
      out_specs=[lane2(nv), lane2(nv), lane2(nj),
                 pl.BlockSpec((1, LANES), lambda i: (0, i),
                              memory_space=vm),
                 lane2(nv), lane3(nv, nv), lane2(nv)],
      out_shape=[
          jax.ShapeDtypeStruct((nv, wpad), dt),
          jax.ShapeDtypeStruct((nv, wpad), dt),
          jax.ShapeDtypeStruct((nj, wpad), dt),
          jax.ShapeDtypeStruct((1, wpad), jnp.int32),
          jax.ShapeDtypeStruct((nv, wpad), dt),
          jax.ShapeDtypeStruct((nv, nv, wpad), dt),
          jax.ShapeDtypeStruct((nv, wpad), dt),
      ],
      scratch_shapes=[pltpu.VMEM((nv, nv, LANES), jnp.float32),
                      pltpu.VMEM((nv, nj, LANES), jnp.float32),
                      pltpu.VMEM((nv, LANES), jnp.float32),
                      pltpu.VMEM((nj, LANES), jnp.float32),
                      pltpu.VMEM((nv, LANES), jnp.float32),
                      pltpu.VMEM((1, LANES), jnp.float32),
                      pltpu.VMEM((1, LANES), jnp.float32),
                      pltpu.VMEM((nv, nj, LANES), jnp.float32)],
  )(*inputs)
  def t2(x):
    x = jnp.moveaxis(x[..., :W], -1, 0)
    if inv_perm is not None:
      x = jnp.take(x, inv_perm, axis=0)
    return x
  qacc, qfc, force, niter, qacc_smooth, qld, qacc_euler = outs
  return (t2(qacc), t2(qfc), t2(force), t2(niter)[:, 0], t2(qacc_smooth),
          t2(qld), t2(qacc_euler))


# ---------------------------------------------------------------------------
# Glue-folded step back half: actuation + passive + qfrc_smooth assembly
# + Newton solve + semi-implicit Euler advance in ONE kernel.
#
# The XLA glue between the three megakernels (transmission, passive,
# fwd_actuation, fwd_acceleration's force sum, euler/_advance) costs
# ~25-30 small fusions per step at ~17us dispatch each plus full-Data
# HBM round trips — ~1-1.5 ms of the 4.4 ms humanoid@8192 step. All of
# it is (n<=nv, L) lane math on values the solver kernel already holds,
# so it folds in at near-zero cost (reference equivalents:
# forward.py:837 fwd_actuation, passive.py:71, forward.py:950
# fwd_acceleration, forward.py:213 _advance).
# ---------------------------------------------------------------------------

_BIG = 1e30


def _np_leaf(x):
  return np.asarray(jax.device_get(x))  # pallas-lint: ok(concrete Model leaf at kernel-build time)


def hessian_cover(m):
  """Static (nv, nv) bool cover of the Newton Hessian's J^T D J term:
  (i, j) is covered iff SOME possible constraint row has nonzero
  jacobian at both dofs — the union over collision candidates /
  equalities of (chain(b1) | chain(b2))^2, plus limit/friction
  diagonals. Uncovered entries are zero in every world, so their
  in-kernel reductions are skipped (humanoid: 55% covered).
  Returns None when the cover is dense enough to be pointless."""
  from ..types import EqType
  if m.ntendon or m.sap_meta:
    # tendon limit/friction rows span arbitrary dofs; SAP models have
    # dynamic pairs not enumerated in collision_pairs — no static cover
    return None
  mask = np.asarray(
      jax.device_get(m.body_dof_ancestor_mask)) > 0  # pallas-lint: ok(concrete Model leaf at kernel-build time)
  nv = m.nv
  cover = np.zeros((nv, nv), bool)

  def add_bodies(bs):
    dofs = np.zeros(nv, bool)
    for b in bs:
      dofs |= mask[int(b)]
    idx = np.nonzero(dofs)[0]
    cover[np.ix_(idx, idx)] = True

  for _t1, _t2, gl in m.collision_pairs:
    for (g1, g2, _pid) in gl:
      add_bodies([m.geom_bodyid[g1], m.geom_bodyid[g2]])
  for e in range(m.neq):
    et = m.eq_type[e]
    o1, o2 = m.eq_obj1id[e], m.eq_obj2id[e]
    if et in (EqType.CONNECT, EqType.WELD):
      add_bodies([o1, o2])
    elif et == EqType.JOINT:
      d1 = m.jnt_dofadr[o1]
      d2 = m.jnt_dofadr[o2] if o2 >= 0 else d1
      for a in (d1, d2):
        for b in (d1, d2):
          cover[a, b] = True
    else:  # unknown row shape: be conservative
      cover[:, :] = True
  for j in range(m.njnt):
    if m.jnt_limited[j]:
      d0 = m.jnt_dofadr[j]
      nd = 1  # slide/hinge limits (ball handled by XLA path)
      cover[d0:d0 + nd, d0:d0 + nd] = True
  for v in range(nv):
    if m.dof_hasfrictionloss[v]:
      cover[v, v] = True
  if cover.mean() > 0.9:
    return None
  return tuple(tuple(bool(x) for x in row) for row in cover)


def glue_supported(m) -> bool:
  """Static model-feature check for the folded back half. Covered:
  affine actuators on scalar joints; tendon transmission (fixed or
  spatial, ten_J/ten_length as kernel inputs); muscle FLV gain/bias +
  activation dynamics (NONE/INTEGRATOR/FILTER/MUSCLE, one state per
  actuator); scalar joint + tendon springs/dampers. Anything richer
  (flex, gravcomp, fluid, FILTEREXACT, slider-crank...) uses the XLA
  glue stages. Tendons/activation states fold only under EULER — their
  implicitfast qDeriv terms are not in-kernel."""
  from ..types import (BiasType, DisableBit, DynType, GainType,
                       IntegratorType, JointType, TrnType)
  if m.opt.integrator not in (IntegratorType.EULER,
                              IntegratorType.IMPLICITFAST):
    return False
  if m.flex_meta.nflex:
    return False
  if ((m.na or m.ntendon) and
      m.opt.integrator != IntegratorType.EULER):
    return False
  if m.ngravcomp or m.fluid_active:
    return False
  for u in range(m.nu):
    if m.actuator_trntype[u] == TrnType.JOINT:
      if m.jnt_type[m.actuator_trnid[u][0]] not in (JointType.SLIDE,
                                                    JointType.HINGE):
        return False
    elif m.actuator_trntype[u] == TrnType.TENDON:
      pass  # ten_length/ten_J arrive as kernel inputs
    else:
      return False
    if m.actuator_gaintype[u] not in (GainType.FIXED, GainType.AFFINE,
                                      GainType.MUSCLE):
      return False
    if m.actuator_biastype[u] not in (BiasType.NONE, BiasType.AFFINE,
                                      BiasType.MUSCLE):
      return False
    if m.actuator_dyntype[u] not in (DynType.NONE, DynType.INTEGRATOR,
                                     DynType.FILTER, DynType.MUSCLE):
      return False
    if (m.actuator_dyntype[u] != DynType.NONE and
        m.actuator_actnum[u] != 1):
      return False
  # batched ("*"-leading) or traced Model leaves can't bake into the
  # kernel's static tables — fall back to the XLA glue stages
  try:
    if np.asarray(jax.device_get(m.actuator_gear)).ndim not in (1, 2):  # pallas-lint: ok(tracer-guarded)
      return False
    if np.asarray(jax.device_get(m.dof_damping)).ndim > 1:  # pallas-lint: ok(tracer-guarded)
      return False
  except Exception:
    return False
  # springs on free/ball joints need quaternion differences — XLA path
  stiff = _np_leaf(m.jnt_stiffness)
  for j in range(m.njnt):
    if stiff[j] != 0.0 and m.jnt_type[j] not in (JointType.SLIDE,
                                                 JointType.HINGE):
      return False
  del DisableBit
  return True


def _glue_static(m):
  """Numpy-only static tables for the glue preamble/tail (the factory
  runs inside jit traces where jnp ops stage out — round-2 lesson)."""
  from ..types import DisableBit, JointType
  nu, nv, nq = m.nu, m.nv, m.nq
  dis = int(m.opt.disableflags)
  actuation_on = not (dis & DisableBit.ACTUATION) and nu > 0
  clampctrl = not (dis & DisableBit.CLAMPCTRL)
  spring_on = not (dis & DisableBit.SPRING)
  damper_on = not (dis & DisableBit.DAMPER)

  from ..types import TrnType
  gear = _np_leaf(m.actuator_gear)[:, 0] if nu else np.zeros((0,))
  is_tendon = tuple(
      int(m.actuator_trntype[u]) == TrnType.TENDON for u in range(nu))
  # joint-transmission address tables (tendon actuators get -1 slots;
  # their length/moment come from the ten_length/ten_J kernel inputs)
  jids = [(-1 if is_tendon[u] else int(m.actuator_trnid[u][0]))
          for u in range(nu)]
  act_qadr = tuple(
      0 if j < 0 else int(m.jnt_qposadr[j]) for j in jids)
  act_dadr = tuple(
      -1 if j < 0 else int(m.jnt_dofadr[j]) for j in jids)
  act_tid = tuple(
      int(m.actuator_trnid[u][0]) if is_tendon[u] else -1
      for u in range(nu))

  ctrlrange = _np_leaf(m.actuator_ctrlrange) if nu else np.zeros((0, 2))
  climited = _np_leaf(m.actuator_ctrllimited).astype(bool) if nu else []
  ctrl_lo = np.where(clampctrl & np.asarray(climited, bool),
                     ctrlrange[:, 0], -_BIG) if nu else np.zeros((0,))
  ctrl_hi = np.where(clampctrl & np.asarray(climited, bool),
                     ctrlrange[:, 1], _BIG) if nu else np.zeros((0,))

  from ..types import BiasType, DynType, GainType
  gp = _np_leaf(m.actuator_gainprm) if nu else np.zeros((0, 10))
  bp = _np_leaf(m.actuator_biasprm) if nu else np.zeros((0, 10))
  gts = np.asarray([int(t) for t in m.actuator_gaintype], np.int64)
  bts = np.asarray([int(t) for t in m.actuator_biastype], np.int64)
  gain3 = np.where((gts == GainType.AFFINE)[:, None], gp[:, :3],
                   np.concatenate([gp[:, :1],
                                   np.zeros((nu, 2))], axis=1)) if nu else gp[:, :3]
  bias3 = np.where((bts == BiasType.AFFINE)[:, None], bp[:, :3],
                   0.0) if nu else bp[:, :3]
  # muscle FLV + activation-dynamics statics
  gain_muscle = tuple(int(t) == GainType.MUSCLE for t in gts)
  bias_muscle = tuple(int(t) == BiasType.MUSCLE for t in bts)
  gain9 = tuple(tuple(float(x) for x in gp[u, :9]) for u in range(nu))
  bias9 = tuple(tuple(float(x) for x in bp[u, :9]) for u in range(nu))
  dyntypes = tuple(int(t) for t in m.actuator_dyntype) if nu else ()
  dynprm = _np_leaf(m.actuator_dynprm) if nu else np.zeros((0, 3))
  dynprm3 = tuple(tuple(float(x) for x in dynprm[u, :3])
                  for u in range(nu))
  aadrs = tuple(
      int(m.actuator_actadr[u]) + max(int(m.actuator_actnum[u]), 1) - 1
      if dyntypes and dyntypes[u] != DynType.NONE else -1
      for u in range(nu))
  actearly = tuple(bool(m.actuator_actearly[u]) for u in range(nu))
  lr = _np_leaf(m.actuator_lengthrange) if nu else np.zeros((0, 2))
  lengthrange = tuple(tuple(float(x) for x in lr[u]) for u in range(nu))
  acc0 = _np_leaf(m.actuator_acc0) if nu else np.zeros((0,))
  acc0 = tuple(float(x) for x in acc0)
  actrange = _np_leaf(m.actuator_actrange) if nu else np.zeros((0, 2))
  act_lo = tuple(
      float(actrange[u, 0]) if m.actuator_actlimited[u] else -_BIG
      for u in range(nu))
  act_hi = tuple(
      float(actrange[u, 1]) if m.actuator_actlimited[u] else _BIG
      for u in range(nu))
  frange = _np_leaf(m.actuator_forcerange) if nu else np.zeros((0, 2))
  flim = _np_leaf(m.actuator_forcelimited).astype(bool) if nu else []
  frc_lo = np.where(flim, frange[:, 0], -_BIG) if nu else np.zeros((0,))
  frc_hi = np.where(flim, frange[:, 1], _BIG) if nu else np.zeros((0,))

  # per-dof tables
  damping = (_np_leaf(m.dof_damping) if damper_on else np.zeros(nv))
  stiff = _np_leaf(m.jnt_stiffness)
  qspring = _np_leaf(m.qpos_spring)
  spring_k = np.zeros(nv)
  spring_qadr = np.zeros(nv, np.int64)
  spring_ref = np.zeros(nv)
  if spring_on:
    for j in range(m.njnt):
      if m.jnt_type[j] in (JointType.SLIDE, JointType.HINGE) and stiff[j]:
        v, q = int(m.jnt_dofadr[j]), int(m.jnt_qposadr[j])
        spring_k[v] = stiff[j]
        spring_qadr[v] = q
        spring_ref[v] = qspring[q]

  af_lo = np.full(nv, -_BIG)
  af_hi = np.full(nv, _BIG)
  if any(m.jnt_actfrclimited):
    afr = _np_leaf(m.jnt_actfrcrange)
    for v in range(nv):
      j = int(m.dof_jntid[v])
      if m.jnt_actfrclimited[j]:
        af_lo[v], af_hi[v] = afr[j, 0], afr[j, 1]

  # integration tables (forward._integrate_pos)
  lin_q, lin_d, quat_q, quat_d = [], [], [], []
  for j in range(m.njnt):
    jtype = m.jnt_type[j]
    qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    if jtype == JointType.FREE:
      lin_q += [qadr, qadr + 1, qadr + 2]
      lin_d += [dadr, dadr + 1, dadr + 2]
      quat_q.append(qadr + 3)
      quat_d.append(dadr + 3)
    elif jtype == JointType.BALL:
      quat_q.append(qadr)
      quat_d.append(dadr)
    else:
      lin_q.append(qadr)
      lin_d.append(dadr)

  # per-dof actuator groups for the moment^T force scatter (joint
  # transmission only; tendon actuators scatter through ten_J)
  dof_acts = tuple(tuple(u for u in range(nu)
                         if act_dadr[u] == v and not is_tendon[u])
                   for v in range(nv))

  # tendon passive statics (deadband spring + damper, passive.py:83-97)
  nt = m.ntendon
  if nt:
    ten_k = tuple(float(x) for x in _np_leaf(m.tendon_stiffness))
    ten_c = tuple(float(x) for x in _np_leaf(m.tendon_damping))
    tls = _np_leaf(m.tendon_lengthspring)
    ten_lo = tuple(float(x) for x in tls[:, 0])
    ten_hi = tuple(float(x) for x in tls[:, 1])
  else:
    ten_k = ten_c = ten_lo = ten_hi = ()

  return dict(
      nu=nu, nv=nv, nq=nq, actuation_on=actuation_on,
      act_qadr=act_qadr, act_dadr=act_dadr,
      is_tendon=is_tendon, act_tid=act_tid,
      gear0=tuple(float(g) for g in gear),
      ctrl_lo=tuple(float(x) for x in ctrl_lo),
      ctrl_hi=tuple(float(x) for x in ctrl_hi),
      gain3=tuple(tuple(float(y) for y in x) for x in gain3),
      bias3=tuple(tuple(float(y) for y in x) for x in bias3),
      gain_muscle=gain_muscle, bias_muscle=bias_muscle,
      gain9=gain9, bias9=bias9, dyntypes=dyntypes, dynprm3=dynprm3,
      aadrs=aadrs, actearly=actearly, lengthrange=lengthrange,
      acc0=acc0, act_lo=act_lo, act_hi=act_hi,
      na=int(m.na), nt=int(nt),
      ten_k=ten_k, ten_c=ten_c, ten_lo=ten_lo, ten_hi=ten_hi,
      spring_on=spring_on, damper_on=damper_on,
      frc_lo=tuple(float(x) for x in frc_lo),
      frc_hi=tuple(float(x) for x in frc_hi),
      damping=tuple(float(x) for x in damping),
      spring_k=tuple(float(x) for x in spring_k),
      spring_qadr=tuple(int(x) for x in spring_qadr),
      spring_ref=tuple(float(x) for x in spring_ref),
      af_lo=tuple(float(x) for x in af_lo),
      af_hi=tuple(float(x) for x in af_hi),
      dof_acts=dof_acts,
      lin_q=tuple(lin_q), lin_d=tuple(lin_d),
      quat_q=tuple(quat_q), quat_d=tuple(quat_d))


def _n_ext(gs) -> int:
  """Extra input-ref count: act (na>0) + ten_length/ten_J (nt>0)."""
  return (1 if gs['na'] else 0) + (2 if gs['nt'] else 0)


def _glue_kernel(cfg, gs, p_ref, qm_ref, j_ref, d_ref, aref_ref, fl_ref,
                 qpos_ref, qvel_ref, ctrl_ref, qfx_ref, ws_ref,
                 *refs):
  # J arrives (nj, nv, L) — the contact megakernel's native layout; the
  # final scratch is the in-VMEM (nv, nj, L) transpose (see
  # _newton_kernel note)
  nin = _n_ext(gs)
  ext, refs = refs[:nin], refs[nin:]
  jt_scr = refs[-1]
  jt_scr[...] = jnp.swapaxes(j_ref[...], 0, 1)
  _glue_core(cfg, gs, p_ref, qm_ref, jt_scr, d_ref, aref_ref, fl_ref,
             qpos_ref, qvel_ref, ctrl_ref, qfx_ref, ws_ref, None, ext,
             *refs[:-1])


def _glue_ell_kernel(cfg, gs, p_ref, qm_ref, j_ref, d_ref, aref_ref,
                     fl_ref, qpos_ref, qvel_ref, ctrl_ref, qfx_ref,
                     ws_ref, fr_ref, dim_ref, *refs):
  nin = _n_ext(gs)
  ext, refs = refs[:nin], refs[nin:]
  jt_scr = refs[-1]
  jt_scr[...] = jnp.swapaxes(j_ref[...], 0, 1)
  _glue_core(cfg, gs, p_ref, qm_ref, jt_scr, d_ref, aref_ref, fl_ref,
             qpos_ref, qvel_ref, ctrl_ref, qfx_ref, ws_ref,
             (fr_ref[...], dim_ref[...]), ext, *refs[:-1])


def _glue_core(cfg, gs, p_ref, qm_ref, j_ref, d_ref, aref_ref, fl_ref,
               qpos_ref, qvel_ref, ctrl_ref, qfx_ref, ws_ref, con, ext,
               *refs):
  """Preamble: actuation (affine/muscle, joint/tendon transmission,
  activation dynamics) + passive (joint + tendon springs/dampers) +
  qfrc_smooth; core: Newton solve (+ qM factor, qacc_smooth,
  Euler-damped re-solve); tail: semi-implicit Euler advance of
  qpos/qvel (+ act)."""
  nv, nq, nu = gs['nv'], gs['nq'], gs['nu']
  na, nt = gs['na'], gs['nt']
  # slice the positional refs: ext inputs already split by the wrapper;
  # outputs = 15 core + (act, act_dot) when na; then 7 scratches
  nout = 15 + (2 if na else 0)
  outs, scr = refs[:nout], refs[nout:]
  (qacc_ref, qfc_ref, force_ref, niter_ref, qaccs_ref, qld_ref,
   qacce_ref, afrc_ref, qfa_ref, qfsp_ref, qfdp_ref, qfp_ref, qfs_ref,
   qpos_out_ref, qvel_out_ref) = outs[:15]
  act_out_ref, actdot_out_ref = (outs[15:17] if na else (None, None))
  (h_scr, jd_scr, ma_scr, jaref_scr, search_scr, cost_scr,
   done_scr) = scr
  ei = 0
  act_in = ext[ei][...] if na else None
  ei += 1 if na else 0
  tenlen = ext[ei][...] if nt else None        # (nt, L)
  tenj_ref = ext[ei + 1] if nt else None       # (nt, nv, L)
  L = qvel_ref.shape[-1]
  dt = jnp.float32
  qpos = qpos_ref[...]
  qvel = qvel_ref[...]
  h = p_ref[2, 0]
  zrow = jnp.zeros((1, L), dt)

  def ten_row_dot(t, vec):                     # ten_J[t] . vec -> (1, L)
    return jnp.sum(tenj_ref[t] * vec, axis=0, keepdims=True)

  # ---- actuation (fwd_actuation: affine/muscle gain+bias, joint or
  # tendon transmission, activation dynamics) ----
  act_dot_rows = [zrow] * na
  if gs['actuation_on']:
    from ..types import DynType as _Dyn
    from .. import muscle as _muscle
    ctrl = ctrl_ref[...]
    gf = []                                  # gear-scaled forces (1, L)
    ten_f = [zrow] * nt                      # tendon-space forces
    forces = []
    for u in range(nu):
      g0 = gs['gear0'][u]
      if gs['is_tendon'][u]:
        tid = gs['act_tid'][u]
        length = tenlen[tid][None, :] * g0
        velocity = ten_row_dot(tid, qvel) * g0
      else:
        length = qpos[gs['act_qadr'][u]][None, :] * g0
        velocity = qvel[gs['act_dadr'][u]][None, :] * g0
      c = jnp.clip(ctrl[u][None, :], gs['ctrl_lo'][u], gs['ctrl_hi'][u])
      # activation dynamics -> actuator input (reference
      # forward.py:616-735; forward.fwd_actuation)
      dyn = gs['dyntypes'][u] if gs['dyntypes'] else _Dyn.NONE
      if dyn == _Dyn.NONE:
        inp = c
      else:
        aadr = gs['aadrs'][u]
        a_u = act_in[aadr][None, :]
        if dyn == _Dyn.INTEGRATOR:
          adot = c
        elif dyn == _Dyn.FILTER:
          tau = max(gs['dynprm3'][u][0], 1e-8)
          adot = (c - a_u) / tau
        else:                                # MUSCLE
          adot = _muscle.muscle_dynamics(
              c, a_u, tuple(gs['dynprm3'][u]))
        act_dot_rows[aadr] = adot
        inp = a_u + h * adot if gs['actearly'][u] else a_u
      if gs['gain_muscle'][u]:
        gain = _muscle.muscle_gain(length, velocity,
                                   gs['lengthrange'][u], gs['acc0'][u],
                                   gs['gain9'][u])
      else:
        ga, gb, gc = gs['gain3'][u]
        gain = ga + gb * length + gc * velocity
      if gs['bias_muscle'][u]:
        bias = _muscle.muscle_bias(length, gs['lengthrange'][u],
                                   gs['acc0'][u], gs['bias9'][u])
      else:
        ba, bb, bc = gs['bias3'][u]
        bias = ba + bb * length + bc * velocity
      f = jnp.clip(gain * inp + bias, gs['frc_lo'][u], gs['frc_hi'][u])
      forces.append(f)
      gf.append(f * g0)
      if gs['is_tendon'][u]:
        tid = gs['act_tid'][u]
        ten_f[tid] = ten_f[tid] + f * g0
    afrc_ref[...] = (jnp.concatenate(forces, axis=0) if nu else
                     jnp.zeros((max(nu, 1), L), dt))
    qfa_rows = []
    for v in range(nv):
      acts = gs['dof_acts'][v]
      if acts:
        row = gf[acts[0]]
        for u in acts[1:]:
          row = row + gf[u]
      else:
        row = zrow
      qfa_rows.append(row)
    qfa = jnp.concatenate(qfa_rows, axis=0)
    # tendon-transmitted forces scatter through ten_J rows
    for t in range(nt):
      if any(gs['is_tendon'][u] and gs['act_tid'][u] == t
             for u in range(nu)):
        qfa = qfa + tenj_ref[t] * ten_f[t]
    if any(lo > -_BIG or hi < _BIG
           for lo, hi in zip(gs['af_lo'], gs['af_hi'])):
      qfa = jnp.concatenate(
          [jnp.clip(qfa[v:v + 1], gs['af_lo'][v], gs['af_hi'][v])
           for v in range(nv)], axis=0)
  else:
    afrc_ref[...] = jnp.zeros((max(nu, 1), L), dt)
    qfa = jnp.zeros((nv, L), dt)
  qfa_ref[...] = qfa
  if na:
    actdot_out_ref[...] = jnp.concatenate(act_dot_rows, axis=0)
    act_new_rows = [None] * na
    for u in range(nu):
      aadr = gs['aadrs'][u]
      if aadr >= 0:
        act_new_rows[aadr] = jnp.clip(
            act_in[aadr][None, :] + h * act_dot_rows[aadr],
            gs['act_lo'][u], gs['act_hi'][u])
    act_out_ref[...] = jnp.concatenate(
        [r if r is not None else act_in[i][None, :]
         for i, r in enumerate(act_new_rows)], axis=0)

  # ---- passive (scalar joint springs/dampers + tendon deadband
  # springs/dampers, passive.py) ----
  sp_rows = []
  for v in range(nv):
    k = gs['spring_k'][v]
    if k:
      sp_rows.append(-k * (qpos[gs['spring_qadr'][v]][None, :]
                           - gs['spring_ref'][v]))
    else:
      sp_rows.append(zrow)
  qfsp = jnp.concatenate(sp_rows, axis=0)
  damping = np.asarray(gs['damping'], np.float32)
  if damping.any():
    dmp_rows = [(-gs['damping'][v]) * qvel[v][None, :] for v in range(nv)]
    qfdp = jnp.concatenate(dmp_rows, axis=0)
  else:
    qfdp = jnp.zeros((nv, L), dt)
  for t in range(nt):
    if gs['ten_k'][t] and gs['spring_on']:
      Lt = tenlen[t][None, :]
      lo, hi = gs['ten_lo'][t], gs['ten_hi'][t]
      disp = jnp.where(Lt > hi, hi - Lt,
                       jnp.where(Lt < lo, lo - Lt, 0.0))
      qfsp = qfsp + tenj_ref[t] * (gs['ten_k'][t] * disp)
    if gs['ten_c'][t] and gs['damper_on']:
      tvel = ten_row_dot(t, qvel)
      qfdp = qfdp + tenj_ref[t] * (-gs['ten_c'][t] * tvel)
  qfp = qfsp + qfdp
  qfsp_ref[...] = qfsp
  qfdp_ref[...] = qfdp
  qfp_ref[...] = qfp

  # qfrc_smooth = passive + actuator + (applied + xfrc - bias) [qfx]
  qfs = qfp + qfa + qfx_ref[...]
  qfs_ref[...] = qfs

  # integration-diagonal for the final solve (mode 0: none; 1: Euler
  # implicit damping h*diag(B), forward.euler; 2: implicitfast
  # mh = qM - h*qDeriv with the diag qDeriv of derivative.py:19 —
  # -damping + moment^T diag(b2 + g2*ctrl) moment, scalar joints)
  mode = gs['mode']
  if mode == 0:
    hb = jnp.zeros((nv, 1), dt)
  else:
    dmp_col = jnp.concatenate(
        [jnp.full((1, 1), gs['damping'][v], dt) for v in range(nv)],
        axis=0)
    hb = h * dmp_col
    if mode == 2 and gs['actuation_on']:
      ctrl_raw = ctrl_ref[...]
      actd_rows = []
      for v in range(nv):
        acts = gs['dof_acts'][v]
        row = zrow
        for u in acts:
          g0 = gs['gear0'][u]
          g2 = gs['gain3'][u][2]
          b2 = gs['bias3'][u][2]
          row = row + (g0 * g0) * (b2 + g2 * ctrl_raw[u][None, :])
        actd_rows.append(row)
      hb = hb - h * jnp.concatenate(actd_rows, axis=0)

  # ---- Newton solve + integration-diagonal re-solve ----
  _newton_core(cfg, p_ref, qm_ref, j_ref, d_ref, aref_ref, fl_ref,
               qfs, ws_ref[...], hb, con, qacc_ref, qfc_ref, force_ref,
               niter_ref, qaccs_ref, qld_ref, qacce_ref, h_scr, jd_scr,
               ma_scr, jaref_scr, search_scr, cost_scr, done_scr)

  # ---- advance (forward._advance, semi-implicit) ----
  qvel_new = qvel + h * qacce_ref[...]
  qvel_out_ref[...] = qvel_new
  for q, v in zip(gs['lin_q'], gs['lin_d']):
    qpos_out_ref[q:q + 1] = qpos[q][None, :] + h * qvel_new[v][None, :]
  for q, v in zip(gs['quat_q'], gs['quat_d']):
    w = qvel_new[v:v + 3]                   # (3, L)
    n2 = jnp.sum(w * w, axis=0, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(n2, 1e-30))
    angle = norm * h
    axis = w / norm
    half = 0.5 * angle
    s = jnp.sin(half)
    dq = jnp.concatenate([jnp.cos(half), axis * s], axis=0)
    qn = _qnormalize(_qmul(qpos[q:q + 4], dq))
    qpos_out_ref[q:q + 4] = qn


def world_sort_perm(solver_niter):
  """(perm, inv_perm) grouping worlds by previous-step Newton iteration
  count, or (None, None) when disabled (the default) or the batch fits
  one lane block. Sorting makes each 128-lane block's max-iter
  approximately its mean instead of the batch max — but permuting every
  kernel input/output through XLA gathers costs ~2x the step time it
  saves (TPU-measured r5: humanoid 4125us -> 7989us), so the per-step
  sort is OFF unless MJWT_SORT_WORLDS=1. The win without the gathers is
  PERSISTENT sorting: utils.benchmark re-sorts the whole Data pytree
  every K steps (difficulty is temporally coherent), see
  benchmark.sort_worlds."""
  import os as _os
  W = solver_niter.shape[0]
  if _os.environ.get('MJWT_SORT_WORLDS', '0') != '1' or W <= LANES:
    return None, None
  perm = jnp.argsort(solver_niter)
  inv = jnp.argsort(perm)
  return perm, inv


_GLUE_CACHE: dict = {}


def make_glue_kernel(m, nj: int, ne: int, nf: int, use_ws: bool,
                     mode: int, ell=None):
  """Factory for the folded back-half kernel, memoized per Model id
  (built from numpy statics only — safe inside jit traces). mode:
  0 = plain Euler, 1 = Euler implicit joint damping, 2 = implicitfast.
  ell = (base, S, C) static contact-block layout for the elliptic
  cone (the run callable then requires con_friction/con_dim/impratio)."""
  key = (id(m), nj, ne, nf, use_ws, mode, ell)
  hit = _GLUE_CACHE.get(key)
  if hit is not None and hit[0] is m:
    return hit[1]
  gs = _glue_static(m)
  gs['mode'] = mode
  nv, nq, nu = gs['nv'], gs['nq'], gs['nu']
  iterations = int(m.opt.iterations)
  ls_k = 10
  cfg = (nv, nj, ne, nf, iterations, ls_k, use_ws, mode > 0, ell,
         hessian_cover(m))
  kernel = functools.partial(
      _glue_ell_kernel if ell is not None else _glue_kernel, cfg, gs)
  num = max(nu, 1)

  na, nt = gs['na'], gs['nt']

  @jax.jit
  def run(qm, efc_j, efc_d, efc_aref, efc_fl, qpos, qvel, ctrl, qfx,
          warmstart, tolerance, meaninertia, timestep,
          con_friction=None, con_dim=None, impratio=None,
          perm=None, inv_perm=None, act=None, ten_length=None,
          ten_j=None):
    """perm/inv_perm: optional (W,) world permutation applied to every
    input (and inverted on every output). The Newton loop runs each
    128-lane block until ITS worlds converge, so grouping worlds by
    expected iteration count (previous-step solver_niter) makes
    block-max ~= block-mean instead of batch-max (round-4 profile:
    block-max 6.5 vs mean 2.8 — pure loss from random grouping). The
    gather fuses into the world->lane relayout bl() already pays for."""
    W = qm.shape[0]
    wpad = -(-W // LANES) * LANES
    dt = qm.dtype
    from . import probe as _probe
    _probe.vmem_ok(f'glue nv{nv} nj{nj}',  # PL006 static estimate
                   (nv, nv, LANES), (nj, nv, LANES), (nv, nj, LANES),
                   (nv, nj, LANES), (nv, nv, LANES), (nv, nv, LANES))

    def bl(x):
      if perm is not None:
        x = jnp.take(x, perm, axis=0)
      x = jnp.moveaxis(x, 0, -1)
      if wpad != W:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, wpad - W),))
      return x

    qm_t = bl(qm)
    if wpad != W:  # keep padded-lane factorization finite
      eye = jnp.eye(nv, dtype=dt)[:, :, None]
      pad_mask = jnp.arange(wpad) >= W
      qm_t = jnp.where(pad_mask[None, None, :], eye, qm_t)
    ipr = (jnp.ones((), dt) if impratio is None else
           impratio.astype(dt).reshape(()))
    params = jnp.stack([tolerance.astype(dt).reshape(()),
                        meaninertia.astype(dt).reshape(()),
                        timestep.astype(dt).reshape(()),
                        ipr])[:, None]
    if ctrl is None or ctrl.shape[-1] == 0:
      ctrl = jnp.zeros((W, num), dt)
    vm = pltpu.VMEM
    lane2 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                   memory_space=vm)
    lane3 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                      memory_space=vm)
    import os as _os
    interp = (jax.default_backend() != 'tpu' and
              _os.environ.get('MJWT_FORCE_MEGA', '0') == '1')
    in_specs = [
        pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=vm),
        lane3(nv, nv), lane3(nj, nv), lane2(nj), lane2(nj),
        lane2(nj), lane2(nq), lane2(nv), lane2(num), lane2(nv),
        lane2(nv),
    ]
    inputs = [params, qm_t, bl(efc_j), bl(efc_d),
              bl(efc_aref), bl(efc_fl), bl(qpos), bl(qvel), bl(ctrl),
              bl(qfx), bl(warmstart)]
    if ell is not None:
      _, _S, _C = ell
      in_specs += [lane3(_C, 5), lane2(_C)]
      inputs += [bl(con_friction.astype(dt)), bl(con_dim.astype(dt))]
    if na:
      in_specs += [lane2(na)]
      inputs += [bl(act.astype(dt))]
    if nt:
      in_specs += [lane2(nt), lane3(nt, nv)]
      inputs += [bl(ten_length.astype(dt)), bl(ten_j.astype(dt))]
    outs = pl.pallas_call(
        kernel,
        grid=(wpad // LANES,),
        interpret=interp,
        in_specs=in_specs,
        out_specs=[lane2(nv), lane2(nv), lane2(nj),
                   pl.BlockSpec((1, LANES), lambda i: (0, i),
                                memory_space=vm),
                   lane2(nv), lane3(nv, nv), lane2(nv), lane2(num),
                   lane2(nv), lane2(nv), lane2(nv), lane2(nv), lane2(nv),
                   lane2(nq), lane2(nv)] +
                  ([lane2(na), lane2(na)] if na else []),
        out_shape=[
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nj, wpad), dt),
            jax.ShapeDtypeStruct((1, wpad), jnp.int32),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((num, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
            jax.ShapeDtypeStruct((nq, wpad), dt),
            jax.ShapeDtypeStruct((nv, wpad), dt),
        ] + ([jax.ShapeDtypeStruct((na, wpad), dt),
              jax.ShapeDtypeStruct((na, wpad), dt)] if na else []),
        scratch_shapes=[pltpu.VMEM((nv, nv, LANES), jnp.float32),
                        pltpu.VMEM((nv, nj, LANES), jnp.float32),
                        pltpu.VMEM((nv, LANES), jnp.float32),
                        pltpu.VMEM((nj, LANES), jnp.float32),
                        pltpu.VMEM((nv, LANES), jnp.float32),
                        pltpu.VMEM((1, LANES), jnp.float32),
                        pltpu.VMEM((1, LANES), jnp.float32),
                        pltpu.VMEM((nv, nj, LANES), jnp.float32)],
    )(*inputs)
    def t2(x):
      x = jnp.moveaxis(x[..., :W], -1, 0)
      if inv_perm is not None:
        x = jnp.take(x, inv_perm, axis=0)
      return x
    (qacc, qfc, force, niter, qaccs, qld, qacce, afrc, qfa, qfsp, qfdp,
     qfp, qfs, qpos_out, qvel_out) = outs[:15]
    res = dict(
        qacc=t2(qacc), qfrc_constraint=t2(qfc), efc_force=t2(force),
        solver_niter=t2(niter)[:, 0], qacc_smooth=t2(qaccs), qLD=t2(qld),
        qacc_euler=t2(qacce), actuator_force=t2(afrc)[:, :nu],
        qfrc_actuator=t2(qfa), qfrc_spring=t2(qfsp),
        qfrc_damper=t2(qfdp), qfrc_passive=t2(qfp), qfrc_smooth=t2(qfs),
        qpos=t2(qpos_out), qvel=t2(qvel_out))
    if na:
      res['act'] = t2(outs[15])
      res['act_dot'] = t2(outs[16])
    return res

  _GLUE_CACHE[key] = (m, run)
  return run
