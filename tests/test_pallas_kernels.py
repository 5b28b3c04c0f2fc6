"""Pallas kernel parity tests. The worlds-in-lanes kernels are
TPU-only (Mosaic); on the CPU CI they run in interpreter mode where
cheap, else skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mujoco_warp_tpu as mjwt
from mujoco_warp_tpu import smooth

from fixtures import BALL_CHAIN, HOPPER, PENDULUM, fixture

TPU = jax.default_backend() == 'tpu'


@pytest.mark.skipif(not TPU, reason='Mosaic kernels need a TPU')
@pytest.mark.parametrize('xml', [PENDULUM, BALL_CHAIN, HOPPER])
def test_pallas_kinematics_parity(xml):
  from mujoco_warp_tpu.pallas import smooth_kernels
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.3)
  W = 256
  rng = np.random.default_rng(0)
  qpos = jnp.asarray(
      np.tile(np.asarray(d.qpos), (W, 1)) +
      0.1 * rng.standard_normal((W, m.nq)), jnp.float32)
  qn = jax.jit(jax.vmap(lambda q: smooth._normalize_qpos(m, q)))(qpos)
  xp, xq, xa, xx = jax.jit(
      lambda q: smooth_kernels.kinematics_batched(m, q))(qn)
  ref = jax.jit(jax.vmap(
      lambda q: smooth.kinematics(m, d.replace(qpos=q))))(qn)
  np.testing.assert_allclose(np.asarray(xp), np.asarray(ref.xpos),
                             atol=1e-5)
  np.testing.assert_allclose(np.abs(np.asarray(xq)),
                             np.abs(np.asarray(ref.xquat)), atol=1e-5)
  np.testing.assert_allclose(np.asarray(xa), np.asarray(ref.xanchor),
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(xx), np.asarray(ref.xaxis),
                             atol=1e-5)


def test_pallas_spd_solve_cpu_fallback():
  """The solver dispatch must fall back cleanly off-TPU."""
  from mujoco_warp_tpu import solver
  mjm, mjd, m, d = fixture(PENDULUM)
  rng = np.random.default_rng(0)
  q = rng.normal(size=(8, 5, 5)).astype(np.float32)
  a = jnp.asarray(q @ np.swapaxes(q, 1, 2) + 3 * np.eye(5,
                                                        dtype=np.float32))
  b = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
  x = solver.spd_solve(m, a, b)
  ref = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
  np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not TPU, reason='Mosaic kernels need a TPU')
@pytest.mark.parametrize('xml', [PENDULUM, BALL_CHAIN, HOPPER])
def test_pallas_com_pos_parity(xml):
  from mujoco_warp_tpu.pallas import smooth_kernels
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.3)
  W = 256
  rng = np.random.default_rng(1)
  qpos = jnp.asarray(
      np.tile(np.asarray(d.qpos), (W, 1)) +
      0.1 * rng.standard_normal((W, m.nq)), jnp.float32)
  qn = jax.jit(jax.vmap(lambda q: smooth._normalize_qpos(m, q)))(qpos)
  xp, xq, xa, xx = jax.jit(
      lambda q: smooth_kernels.kinematics_batched(m, q))(qn)
  com, cinert, cdof = jax.jit(
      lambda a, b, c, e: smooth_kernels.com_pos_batched(m, a, b, c, e))(
      xp, xq, xa, xx)
  ref = jax.jit(jax.vmap(lambda q: smooth.com_pos(
      m, smooth.kinematics(m, d.replace(qpos=q)))))(qn)
  np.testing.assert_allclose(np.asarray(com), np.asarray(ref.subtree_com),
                             atol=2e-5)
  np.testing.assert_allclose(np.asarray(cdof), np.asarray(ref.cdof),
                             atol=2e-5)
  # cinert: f32 accumulation-order noise scales with mass*inertia
  np.testing.assert_allclose(np.asarray(cinert), np.asarray(ref.cinert),
                             atol=2e-3)


@pytest.mark.skipif(not TPU, reason='Mosaic kernels need a TPU')
@pytest.mark.parametrize('xml', [PENDULUM, BALL_CHAIN, HOPPER])
def test_pallas_smooth_front_parity(xml):
  """Fused kinematics+com_pos+crb kernel matches the jnp pipeline."""
  from mujoco_warp_tpu.pallas import smooth_kernels
  mjm, mjd, m, d = fixture(xml, qpos_noise=0.3)
  W = 256
  rng = np.random.default_rng(2)
  qpos = jnp.asarray(
      np.tile(np.asarray(d.qpos), (W, 1)) +
      0.1 * rng.standard_normal((W, m.nq)), jnp.float32)
  qn = jax.jit(jax.vmap(lambda q: smooth._normalize_qpos(m, q)))(qpos)
  out = jax.jit(lambda q: smooth_kernels.smooth_front_batched(m, q))(qn)
  ref = jax.jit(jax.vmap(lambda q: smooth.crb(m, smooth.com_pos(
      m, smooth.kinematics(m, d.replace(qpos=q))))))(qn)
  np.testing.assert_allclose(np.asarray(out['xpos']),
                             np.asarray(ref.xpos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(out['subtree_com']),
                             np.asarray(ref.subtree_com), atol=2e-5)
  np.testing.assert_allclose(np.asarray(out['cdof']),
                             np.asarray(ref.cdof), atol=2e-5)
  scale = float(np.abs(np.asarray(ref.qM)).max())
  np.testing.assert_allclose(np.asarray(out['qM']) / scale,
                             np.asarray(ref.qM) / scale, atol=1e-4)
