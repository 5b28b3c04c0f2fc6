"""Muscle force-length-velocity model and activation dynamics
(reference: mujoco_warp/_src/util_misc.py:478-640; C mju_muscleGain /
mju_muscleBias / mju_muscleDynamics). Branch-free jnp formulation,
validated element-for-element against the C bindings in
tests/test_muscle.py.

prm layout (actuator_gainprm / dynprm, MuJoCo convention):
  gain/bias prm: (range0, range1, force, scale, lmin, lmax, vmax, fpmax,
                  fvmax)
  dyn prm: (tau_act, tau_deact, smooth_width)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MINVAL = 1e-15


def _normalized_length_vel(length, vel, lengthrange, prm):
  r0, r1 = prm[0], prm[1]
  vmax = prm[6]
  L0 = (lengthrange[1] - lengthrange[0]) / jnp.maximum(r1 - r0, _MINVAL)
  L = r0 + (length - lengthrange[0]) / jnp.maximum(L0, _MINVAL)
  V = vel / jnp.maximum(L0 * vmax, _MINVAL)
  return L, V


def _effective_force(prm, acc0):
  force, scale = prm[2], prm[3]
  return jnp.where(force < 0, scale / jnp.maximum(acc0, _MINVAL), force)


def _bump(L, A, mid, B):
  """Skewed piecewise-quadratic bump: 0 at A and B, 1 at mid."""
  left = 0.5 * (A + mid)
  right = 0.5 * (mid + B)

  xl = (L - A) / jnp.maximum(left - A, _MINVAL)
  yl = 0.5 * xl * xl
  xm_l = (mid - L) / jnp.maximum(mid - left, _MINVAL)
  ym_l = 1.0 - 0.5 * xm_l * xm_l
  xm_r = (L - mid) / jnp.maximum(right - mid, _MINVAL)
  ym_r = 1.0 - 0.5 * xm_r * xm_r
  xr = (B - L) / jnp.maximum(B - right, _MINVAL)
  yr = 0.5 * xr * xr

  out = jnp.where(L < left, yl,
                  jnp.where(L < mid, ym_l,
                            jnp.where(L < right, ym_r, yr)))
  return jnp.where((L <= A) | (L >= B), 0.0, out)


def muscle_gain(length, vel, lengthrange, acc0, prm):
  """Active muscle force gain: -force * FL(L) * FV(V)."""
  lmin, lmax, fvmax = prm[4], prm[5], prm[8]
  L, V = _normalized_length_vel(length, vel, lengthrange, prm)
  force = _effective_force(prm, acc0)

  FL = _bump(L, lmin, 1.0, lmax)

  y = fvmax - 1.0
  FV = jnp.where(
      V <= -1.0, 0.0,
      jnp.where(V <= 0.0, (V + 1.0) * (V + 1.0),
                jnp.where(V <= y,
                          fvmax - (y - V) * (y - V) / jnp.maximum(
                              y, _MINVAL),
                          fvmax)))
  return -force * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
  """Passive muscle force (parallel elasticity)."""
  lmax, fpmax = prm[5], prm[7]
  L, _ = _normalized_length_vel(length, jnp.zeros_like(length),
                                lengthrange, prm)
  force = _effective_force(prm, acc0)
  b = 0.5 * (1.0 + lmax)
  x_mid = (L - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
  y_mid = 0.5 * x_mid * x_mid
  x_hi = (L - b) / jnp.maximum(b - 1.0, _MINVAL)
  y_hi = 0.5 + x_hi
  out = jnp.where(L <= 1.0, 0.0, jnp.where(L <= b, y_mid, y_hi))
  return -force * fpmax * out


def _sigmoid(x):
  """Quintic smoothstep on [0, 1] (C mju_sigmoid)."""
  y = x * x * x * (3.0 * x * (2.0 * x - 5.0) + 10.0)
  return jnp.where(x <= 0.0, 0.0, jnp.where(x >= 1.0, 1.0, y))


def muscle_dynamics(ctrl, act, prm):
  """First-order activation dynamics with activation-dependent time
  constants and optional smooth blending."""
  tau_act, tau_deact, width = prm[0], prm[1], prm[2]
  ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
  actclamp = jnp.clip(act, 0.0, 1.0)
  t_act = tau_act * (0.5 + 1.5 * actclamp)
  t_deact = tau_deact / (0.5 + 1.5 * actclamp)
  hard = jnp.where(ctrlclamp > act, t_act, t_deact)
  blend = _sigmoid((ctrlclamp - act) / jnp.maximum(width, _MINVAL) + 0.5)
  smooth = t_deact + (t_act - t_deact) * blend
  tau = jnp.where(width < _MINVAL, hard, smooth)
  return (ctrlclamp - act) / jnp.maximum(tau, _MINVAL)
