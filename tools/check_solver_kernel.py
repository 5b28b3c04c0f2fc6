"""Parity check: fused Pallas Newton solver vs the XLA-level solver on a
warm humanoid batch (contacts active). Run on the TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import mujoco

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import models, parallel
from mujoco_warp_tpu import solver as solver_mod

NW = 512


def main():
  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  batch = parallel.make_batch(m, d, NW, qpos_noise=0.01)
  step = jax.jit(lambda b: mjwt.step_batched(m, b))
  for _ in range(40):
    batch = step(batch)
  jax.block_until_ready(batch.qpos)

  import importlib
  fwd = importlib.import_module('mujoco_warp_tpu.forward')

  # rebuild the pre-solve state (all stages up to solve)
  def pre_solve(b):
    vm = lambda fn: jax.vmap(lambda dd: fn(m, dd))
    from mujoco_warp_tpu import collision_driver, constraint, smooth
    b = fwd._smooth_mega_batched(m, b)
    b = vm(collision_driver.collision)(b)
    b = vm(constraint.make_constraint)(b)
    b = vm(smooth.transmission)(b)
    if m.nu:
      b = b.replace(actuator_velocity=jnp.einsum(
          'wun,wn->wu', b.actuator_moment, b.qvel))
    from mujoco_warp_tpu import passive
    b = vm(passive.passive)(b)
    b = vm(fwd.fwd_actuation)(b)
    qfrc_smooth = jax.vmap(
        lambda dd: (dd.qfrc_passive - dd.qfrc_bias + dd.qfrc_applied +
                    dd.qfrc_actuator))(b)
    from mujoco_warp_tpu import solver as sv
    qacc_smooth, qld = sv.spd_solve_factor(m, b.qM, qfrc_smooth)
    return b.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth,
                     qLD=qld)

  pre = jax.jit(pre_solve)(batch)
  jax.block_until_ready(pre.qpos)

  # XLA solver (force the non-fused path by lying about the backend gate)
  import mujoco_warp_tpu.solver as S
  orig = S.uses_fused_kernel
  S.uses_fused_kernel = lambda *_: False
  xla = jax.jit(lambda b: S.solve(m, b))(pre)
  jax.block_until_ready(xla.qacc)
  S.uses_fused_kernel = orig

  fused = jax.jit(lambda b: S.solve(m, b))(pre)
  jax.block_until_ready(fused.qacc)

  for k in ('qacc', 'qfrc_constraint', 'efc_force', 'qacc_smooth'):
    a = np.asarray(getattr(fused, k))
    b = np.asarray(getattr(xla, k))
    err = np.abs(a - b).max()
    scale = max(np.abs(b).max(), 1.0)
    print(f'{k:16s} maxabs={err:.3e} rel={err / scale:.3e}')
  na = np.asarray(fused.solver_niter)
  nb = np.asarray(xla.solver_niter)
  print('niter fused mean/max', na.mean(), na.max(),
        '| xla mean/max', nb.mean(), nb.max())

  # timing
  f = jax.jit(lambda b: S.solve(m, b))
  t0 = time.perf_counter()
  for _ in range(20):
    o = f(pre)
  jax.block_until_ready(o.qacc)
  print(f'fused solve {((time.perf_counter() - t0) / 20) * 1e3:.3f} ms '
        f'@ {NW} worlds')


if __name__ == '__main__':
  main()
