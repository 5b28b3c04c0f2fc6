"""Fused Pallas Newton solver parity vs the XLA-level solver
(TPU-only; interpret-mode coverage for CPU CI)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TPU = jax.default_backend() == 'tpu'


def test_solver_kernel_interpret_smoke():
  """Interpret-mode solve on a random SPD problem terminates and solves
  the unconstrained part exactly."""
  from mujoco_warp_tpu.pallas import solver_kernels
  W, nv, nj = 8, 5, 9
  rng = np.random.default_rng(0)
  q = rng.normal(size=(W, nv, nv)).astype(np.float32)
  qm = jnp.asarray(q @ np.swapaxes(q, 1, 2) +
                   4 * np.eye(nv, dtype=np.float32))
  J = jnp.asarray(rng.normal(size=(W, nj, nv)).astype(np.float32))
  D = jnp.abs(jnp.asarray(rng.normal(size=(W, nj)).astype(np.float32)))
  aref = jnp.asarray(rng.normal(size=(W, nj)).astype(np.float32))
  fl = jnp.zeros((W, nj), jnp.float32)
  qfs = jnp.asarray(rng.normal(size=(W, nv)).astype(np.float32))
  ws = jnp.zeros((W, nv), jnp.float32)
  out = solver_kernels.newton_solve_batched(
      qm, J, D, aref, fl, qfs, ws, jnp.float32(1e-8), jnp.float32(1.0),
      ne=0, nf=0, iterations=30, interpret=True)
  qacc, qfc, force, niter, qacc_smooth, qld, qacc_euler = out
  ref = np.linalg.solve(np.asarray(qm), np.asarray(qfs)[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(qacc_smooth), ref, atol=2e-5)
  assert np.isfinite(np.asarray(qacc)).all()
  assert (np.asarray(niter) <= 30).all()


@pytest.mark.skipif(not TPU, reason='Mosaic kernels need a TPU')
def test_solver_kernel_humanoid_parity():
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import models, parallel
  import mujoco_warp_tpu.solver as S

  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  batch = parallel.make_batch(m, d, 256, qpos_noise=0.01)
  os.environ['MJWT_FUSED_SOLVER'] = '0'
  step = jax.jit(lambda b: mjwt.step_batched(m, b))
  for _ in range(30):
    batch = step(batch)
  jax.block_until_ready(batch.qpos)

  # pre-solve state
  import importlib
  fwd = importlib.import_module('mujoco_warp_tpu.forward')
  from mujoco_warp_tpu import collision_driver, constraint, smooth, passive
  vm = lambda fn: jax.vmap(lambda dd: fn(m, dd))

  def pre_solve(b):
    b = fwd._smooth_mega_batched(m, b)
    b = vm(collision_driver.collision)(b)
    b = vm(constraint.make_constraint)(b)
    b = vm(smooth.transmission)(b)
    b = b.replace(actuator_velocity=jnp.einsum(
        'wun,wn->wu', b.actuator_moment, b.qvel))
    b = vm(passive.passive)(b)
    b = vm(fwd.fwd_actuation)(b)
    qfrc_smooth = jax.vmap(
        lambda dd: (dd.qfrc_passive - dd.qfrc_bias + dd.qfrc_applied +
                    dd.qfrc_actuator))(b)
    qacc_smooth, qld = S.spd_solve_factor(m, b.qM, qfrc_smooth)
    return b.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth,
                     qLD=qld)

  pre = jax.jit(pre_solve)(batch)
  xla = jax.jit(lambda b: S.solve(m, b))(pre)
  os.environ['MJWT_FUSED_SOLVER'] = '1'
  try:
    fused = jax.jit(lambda b: S.solve(m, b))(pre)
  finally:
    os.environ['MJWT_FUSED_SOLVER'] = '0'
  for k in ('qacc', 'qfrc_constraint', 'efc_force'):
    a = np.asarray(getattr(fused, k))
    b = np.asarray(getattr(xla, k))
    scale = max(np.abs(b).max(), 1.0)
    assert np.abs(a - b).max() / scale < 1e-4, k
  assert abs(float(jnp.mean(fused.solver_niter)) -
             float(jnp.mean(xla.solver_niter))) < 0.05


def test_solver_kernel_interpret_frictionloss_parity():
  """Friction rows (nf>0): interpret-mode fused solve matches the XLA
  Newton solver on a frictionloss scene (apollo-class row layout)."""
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import parallel, io as io_mod
  import mujoco_warp_tpu.solver as S
  from mujoco_warp_tpu.pallas import solver_kernels
  import importlib
  fwd = importlib.import_module('mujoco_warp_tpu.forward')
  from mujoco_warp_tpu import collision_driver, constraint, smooth, passive

  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.0999">
        <joint type="slide" axis="0 0 1" range="-1 1" limited="true"
               frictionloss="0.4" damping="0.1"/>
        <joint type="slide" axis="1 0 0" frictionloss="0.6"/>
        <geom type="sphere" size="0.1" mass="1.0"/>
      </body>
      <body pos="0.5 0 0.18">
        <joint type="hinge" axis="0 1 0" frictionloss="0.7"/>
        <geom type="capsule" size="0.05 0.1" mass="0.5"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=6)
  W = 8
  batch = parallel.make_batch(m, d, W, qpos_noise=0.003)
  batch = batch.replace(qvel=batch.qvel.at[:, 1].set(
      jnp.asarray(np.linspace(-0.4, 0.4, W), jnp.float32)))
  vm = lambda fn: jax.vmap(lambda dd: fn(m, dd))

  def pre_solve(b):
    b = vm(smooth.kinematics)(b)
    b = vm(smooth.com_pos)(b)
    b = vm(smooth.crb)(b)
    b = vm(collision_driver.collision)(b)
    b = vm(constraint.make_constraint)(b)
    b = vm(smooth.rne)(b)
    b = vm(passive.passive)(b)
    qfrc_smooth = jax.vmap(
        lambda dd: (dd.qfrc_passive - dd.qfrc_bias + dd.qfrc_applied +
                    dd.qfrc_actuator))(b)
    qacc_smooth, qld = S.spd_solve_factor(m, b.qM, qfrc_smooth)
    return b.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth,
                     qLD=qld)

  pre = jax.jit(pre_solve)(batch)
  xla = jax.jit(lambda b: S.solve(m, b))(pre)

  ne, nf, nl, stride, _ = io_mod.efc_layout(m, 6)
  assert nf == 3
  out = solver_kernels.newton_solve_batched(
      pre.qM, pre.efc_J, pre.efc_D, pre.efc_aref, pre.efc_frictionloss,
      pre.qfrc_smooth, pre.qacc_warmstart, m.opt.tolerance,
      m.stat.meaninertia, None, ne=ne, nf=nf,
      iterations=int(m.opt.iterations), use_ws=True, euler_damp=False,
      interpret=True)
  qacc, qfc, force, niter, _, _, _ = out
  a, b = np.asarray(qacc), np.asarray(xla.qacc)
  scale = max(np.abs(b).max(), 1.0)
  assert np.abs(a - b).max() / scale < 2e-4, (a, b)
  a, b = np.asarray(force), np.asarray(xla.efc_force)
  scale = max(np.abs(b).max(), 1.0)
  assert np.abs(a - b).max() / scale < 2e-3, 'efc_force'
