"""Benchmark harness (reference: mujoco_warp/_src/benchmark.py).

The reference captures one CUDA graph and replays it nstep times; the
TPU-native equivalent is one jitted ``lax.scan`` over steps (XLA compiles
the whole rollout once, then the device runs it without host round
trips), with the same Ornstein-Uhlenbeck Halton control noise protocol
(benchmark.py:41-83) so numbers are comparable.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Data, Model


def halton(index: jax.Array, base: int | jax.Array) -> jax.Array:
  """Radical-inverse Halton sequence (reference util_misc.py:60),
  fixed 32-digit unroll (covers indices beyond 4e9 in base 2)."""
  index = index.astype(jnp.int32)
  base = jnp.asarray(base, jnp.int32)
  basef = base.astype(jnp.float32)

  def body(_, carry):
    idx, f, r = carry
    f = f / basef
    r = r + f * (idx % base).astype(jnp.float32)
    return idx // base, f, r

  _, _, r = jax.lax.fori_loop(
      0, 32, body, (index, jnp.float32(1.0), jnp.float32(0.0)))
  return r


def ctrl_noise(m: Model, ctrl: jax.Array, worldid: jax.Array,
               step: jax.Array, std: float = 0.01,
               rate_s: float = 0.1) -> jax.Array:
  """OU control noise with Halton quasirandomness (deterministic across
  runs, like the reference)."""
  nu = ctrl.shape[-1]
  rate = jnp.exp(-m.opt.timestep / rate_s)
  scale = std * jnp.sqrt(1.0 - rate * rate)
  limited = jnp.array(m.actuator_ctrllimited, dtype=bool)
  lo, hi = m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1]
  midpoint = jnp.where(limited, 0.5 * (lo + hi), 0.0)
  halfrange = jnp.where(limited, 0.5 * (hi - lo), 1.0)
  actids = jnp.arange(nu, dtype=jnp.int32)
  h = jax.vmap(lambda a: halton((step + 1) * (worldid + 1), a + 2))(actids)
  new = rate * ctrl + (1.0 - rate) * midpoint
  new = new + scale * halfrange * (2.0 * h - 1.0)
  return jnp.where(limited, jnp.clip(new, lo, hi), new)


def benchmark(step_fn: Callable[[Model, Data], Data], m: Model,
              batch: Data, nstep: int, ctrlnoise_std: float = 0.01,
              ctrlnoise_rate: float = 0.1,
              chunk: int = 100) -> dict:
  """Run nstep batched steps with ctrl noise; return the reference's
  metric dict shape (steps/s, jit time, convergence)."""
  nworld = batch.qpos.shape[0]
  worldids = jnp.arange(nworld, dtype=jnp.int32)

  from ..forward import step_batched

  def one_step(d, step_i):
    noisy = jax.vmap(
        lambda c, w: ctrl_noise(m, c, w, step_i, ctrlnoise_std,
                                ctrlnoise_rate))(d.ctrl, worldids)
    d = d.replace(ctrl=noisy)
    if step_fn is None:
      d = step_batched(m, d)
    else:
      d = jax.vmap(step_fn, in_axes=(None, 0))(m, d)
    return d, step_i + 1

  # python-loop dispatch with donated buffers beats lax.scan here: the
  # scan carry copies the full Data pytree every step, while donation
  # reuses it in place (the analogue of the reference replaying one
  # CUDA graph on fixed buffers, benchmark.py:128-157)
  run_step = jax.jit(one_step, donate_argnums=(0,))

  t0 = time.perf_counter()
  d, step_i = run_step(batch, jnp.zeros((), jnp.int32))
  jax.block_until_ready(d.qpos)
  jit_time = time.perf_counter() - t0

  warmup = min(20, nstep)
  for _ in range(warmup):
    d, step_i = run_step(d, step_i)
  jax.block_until_ready(d.qpos)
  t0 = time.perf_counter()
  steps_done = max(nstep - warmup - 1, 1)
  for _ in range(steps_done):
    d, step_i = run_step(d, step_i)
  jax.block_until_ready(d.qpos)
  run_time = time.perf_counter() - t0
  del chunk

  nan_worlds = int(jnp.sum(jnp.any(jnp.isnan(d.qpos), axis=-1)))
  return dict(
      nworld=nworld,
      nstep=steps_done,
      jit_time=jit_time,
      run_time=run_time,
      steps_per_sec=steps_done * nworld / max(run_time, 1e-9),
      step_time_us=1e6 * run_time / max(steps_done, 1),
      converged_worlds=nworld - nan_worlds,
      ncon_mean=float(jnp.mean(d.ncon)),
      nefc_mean=float(jnp.mean(d.nefc)),
      solver_niter_mean=float(jnp.mean(d.solver_niter)),
      final=d,
  )


def benchmark_replay(m: Model, batch: Data, traj: jax.Array,
                     nstep: int) -> dict:
  """Replay a keyframe ctrl trajectory (reference testspeed --replay:
  ctrl comes from recorded keyframes, clamped to the last frame, instead
  of noise)."""
  nworld = batch.qpos.shape[0]
  nkey = traj.shape[0]

  from ..forward import step_batched

  def one_step(d, step_i):
    idx = jnp.minimum(step_i, nkey - 1)
    ctrl = jnp.broadcast_to(traj[idx], (nworld, traj.shape[1]))
    d = d.replace(ctrl=ctrl)
    d = step_batched(m, d)
    return d, step_i + 1

  run_step = jax.jit(one_step, donate_argnums=(0,))
  t0 = time.perf_counter()
  d, step_i = run_step(batch, jnp.zeros((), jnp.int32))
  jax.block_until_ready(d.qpos)
  jit_time = time.perf_counter() - t0

  warmup = min(20, nstep)
  for _ in range(warmup):
    d, step_i = run_step(d, step_i)
  jax.block_until_ready(d.qpos)
  t0 = time.perf_counter()
  steps_done = max(nstep - warmup - 1, 1)
  for _ in range(steps_done):
    d, step_i = run_step(d, step_i)
  jax.block_until_ready(d.qpos)
  run_time = time.perf_counter() - t0

  nan_worlds = int(jnp.sum(jnp.any(jnp.isnan(d.qpos), axis=-1)))
  return dict(
      nworld=nworld,
      nstep=steps_done,
      jit_time=jit_time,
      run_time=run_time,
      steps_per_sec=steps_done * nworld / max(run_time, 1e-9),
      step_time_us=1e6 * run_time / max(steps_done, 1),
      converged_worlds=nworld - nan_worlds,
      ncon_mean=float(jnp.mean(d.ncon)),
      nefc_mean=float(jnp.mean(d.nefc)),
      solver_niter_mean=float(jnp.mean(d.solver_niter)),
      final=d,
  )
