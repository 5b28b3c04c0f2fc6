"""Parity test for the glue-folded step (forward._glue_stages):
actuation + passive + qfrc_smooth + Newton solve + Euler advance in one
Pallas kernel (pallas/solver_kernels._glue_kernel) vs the per-world XLA
reference path, on the headline humanoid model.
"""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import mujoco

pytestmark = pytest.mark.slow  # interpret-mode: excluded from -m 'not slow'


@pytest.fixture
def force_mega(monkeypatch):
  monkeypatch.setenv('MJWT_FORCE_MEGA', '1')


def test_glue_step_matches_xla(force_mega):
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import models
  fwd = importlib.import_module('mujoco_warp_tpu.forward')

  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  W = 2
  rng = np.random.default_rng(0)
  q0 = np.asarray(jax.device_get(d.qpos))
  qb = jnp.asarray(q0[None] + 0.05 * rng.standard_normal((W, q0.size)),
                   jnp.float32)
  vb = jnp.asarray(0.1 * rng.standard_normal((W, m.nv)), jnp.float32)
  cb = jnp.asarray(0.2 * rng.standard_normal((W, m.nu)), jnp.float32)
  batch = jax.vmap(lambda q, v, c: d.replace(qpos=q, qvel=v, ctrl=c))(
      qb, vb, cb)

  assert fwd._glue_gates(m, batch), 'glue fold must cover humanoid'
  step_glue = jax.jit(lambda dd: fwd.step_batched(m, dd))
  step_ref = jax.jit(jax.vmap(lambda dd: mjwt.step(m, dd)))

  bg = br = batch
  for _ in range(3):
    bg = step_glue(bg)
    br = step_ref(br)

  # the kernel's safeguarded Newton-bisection linesearch and the XLA
  # parallel linesearch take slightly different alphas, so iteration
  # counts differ by a few; converged VALUES are asserted below
  assert np.abs(np.asarray(bg.solver_niter, np.int64) -
                np.asarray(br.solver_niter, np.int64)).max() <= 4
  for name, tol in (('qpos', 5e-6), ('qvel', 5e-5), ('qacc', 5e-5),
                    ('qfrc_smooth', 5e-5), ('qfrc_actuator', 5e-5),
                    ('qfrc_passive', 5e-5), ('actuator_force', 5e-5),
                    ('qfrc_constraint', 5e-4), ('time', 0.0),
                    ('actuator_length', 5e-6),
                    ('actuator_velocity', 5e-5), ('actuator_moment', 0.0)):
    a = np.asarray(jax.device_get(getattr(bg, name)))
    b = np.asarray(jax.device_get(getattr(br, name)))
    scale = max(1.0, float(np.abs(b).max())) if b.size else 1.0
    np.testing.assert_allclose(a, b, rtol=0, atol=tol * scale,
                               err_msg=name)
