"""Elliptic-cone fused Newton kernel vs the XLA solver (reference
solver.py elliptic branch: zones, cone forces, JTCJ Hessian, cone
linesearch)."""

import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import mujoco

pytestmark = pytest.mark.slow  # interpret-mode: excluded from -m 'not slow'

# penetrating start + tangential velocity: contacts are firmly active
# and the cone middle zone (sliding) is exercised from step one
ELL_XML = """
<mujoco>
  <option timestep="0.002" cone="elliptic" impratio="3"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 1" friction="1 0.01 0.002"/>
    <body pos="0 0 0.098">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.5" condim="4"
            friction="0.8 0.02 0.002"/>
    </body>
    <body pos="0.5 0 0.078">
      <freejoint/>
      <geom type="box" size="0.08 0.08 0.08" mass="0.4" condim="3"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture
def force_mega(monkeypatch):
  monkeypatch.setenv('MJWT_FORCE_MEGA', '1')


def test_elliptic_solver_kernel_matches_xla(force_mega):
  """Same efc inputs -> kernel solve vs XLA solve."""
  import mujoco_warp_tpu as mjwt
  fwd = importlib.import_module('mujoco_warp_tpu.forward')
  sol = importlib.import_module('mujoco_warp_tpu.solver')

  mjm = mujoco.MjModel.from_xml_string(ELL_XML)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=12)
  q0 = np.asarray(jax.device_get(d.qpos))
  qb = jnp.asarray(np.stack([q0, q0]), jnp.float32)
  vb = jnp.asarray(np.stack(
      [np.r_[0.3, 0, 0, 0, 0, 1, 0.2, 0, 0, 0, 0, 0],
       np.r_[0, 0, -0.5, 0, 0, 0, 0, 0.2, 0, 0, 0.5, 0]]), jnp.float32)
  batch = jax.vmap(lambda q, v: d.replace(qpos=q, qvel=v))(qb, vb)

  def fwd_nosolve(dd):
    dd = fwd.fwd_position(m, dd)
    dd = fwd.fwd_velocity(m, dd)
    dd = fwd.fwd_actuation(m, dd)
    dd = fwd.fwd_acceleration(m, dd)
    return dd

  pre = jax.jit(jax.vmap(fwd_nosolve))(batch)
  assert int(np.asarray(pre.ncon).min()) > 0
  assert sol.uses_fused_kernel(m, batch)
  post_k = jax.jit(lambda dd: sol.solve(m, dd))(pre)          # kernel
  post_r = jax.jit(jax.vmap(lambda dd: sol.solve(m, dd)))(pre)  # XLA
  for name, tol in (('qacc', 1e-4), ('qfrc_constraint', 1e-4),
                    ('efc_force', 1e-4)):
    a = np.asarray(jax.device_get(getattr(post_k, name)))
    b = np.asarray(jax.device_get(getattr(post_r, name)))
    scale = max(1.0, float(np.abs(b).max()))
    np.testing.assert_allclose(a, b, rtol=0, atol=tol * scale,
                               err_msg=name)


def test_elliptic_glue_step_trajectory(force_mega):
  """Full glue-folded elliptic step vs the per-world XLA step over a
  short sliding trajectory (robust quantities: qpos/qvel)."""
  import mujoco_warp_tpu as mjwt
  fwd = importlib.import_module('mujoco_warp_tpu.forward')

  mjm = mujoco.MjModel.from_xml_string(ELL_XML)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=12)
  q0 = np.asarray(jax.device_get(d.qpos))
  qb = jnp.asarray(q0[None], jnp.float32)
  vb = jnp.asarray(np.r_[0.3, 0, 0, 0, 0, 1, 0.2, 0, 0, 0, 0, 0][None],
                   jnp.float32)
  batch = jax.vmap(lambda q, v: d.replace(qpos=q, qvel=v))(qb, vb)

  assert fwd._glue_gates(m, batch)
  step_k = jax.jit(lambda dd: fwd.step_batched(m, dd))
  step_r = jax.jit(jax.vmap(lambda dd: mjwt.step(m, dd)))
  bk = br = batch
  for _ in range(10):
    bk = step_k(bk)
    br = step_r(br)
  # the kernel's bracket+secant linesearch and the XLA parallel
  # linesearch take slightly different paths through the stick-slip
  # de-penetration transient; trajectories agree to the mm envelope
  # (the solver-level test above checks tight parity on equal inputs)
  for name, tol in (('qpos', 5e-3), ('qvel', 5e-2)):
    a = np.asarray(jax.device_get(getattr(bk, name)))
    b = np.asarray(jax.device_get(getattr(br, name)))
    np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)
  assert np.isfinite(np.asarray(bk.qpos)).all()
