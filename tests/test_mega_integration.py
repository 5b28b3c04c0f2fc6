"""Regression tests for the integrated megakernel step path.

Round 2 shipped a bench that crashed at trace time: make_contact_kernel
was building static kernel metadata with jnp ops inside the jit trace of
step_batched (BENCH_r02.json, TracerArrayConversionError). These tests
run the EXACT bench path — jax.jit(step_batched) with the mega gates
forced on (MJWT_FORCE_MEGA=1 -> Pallas interpret mode on CPU) — so a
trace-time or numerical break in the hot path fails CPU CI instead of
the driver's TPU bench.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import mujoco

from fixtures import HOPPER

pytestmark = pytest.mark.slow  # interpret-mode/long-horizon: excluded from -m 'not slow'


@pytest.fixture
def force_mega(monkeypatch):
  monkeypatch.setenv('MJWT_FORCE_MEGA', '1')


def test_jit_step_batched_mega_interpret(force_mega):
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import parallel
  from mujoco_warp_tpu.pallas import contact_kernels
  from mujoco_warp_tpu.utils.benchmark import ctrl_noise

  mjm = mujoco.MjModel.from_xml_string(HOPPER)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  assert contact_kernels.supports(m, d)
  nworld = 8
  batch = parallel.make_batch(m, d, nworld, qpos_noise=0.01)

  # mirror bench.py's one_step exactly: ctrl noise + step_batched under
  # one jit with donated buffers (utils/benchmark.benchmark)
  worldids = jnp.arange(nworld, dtype=jnp.int32)

  def one_step(b, step_i):
    noisy = jax.vmap(
        lambda c, w: ctrl_noise(m, c, w, step_i))(b.ctrl, worldids)
    b = b.replace(ctrl=noisy)
    return mjwt.step_batched(m, b), step_i + 1

  run_step = jax.jit(one_step, donate_argnums=(0,))
  b, i = run_step(batch, jnp.zeros((), jnp.int32))
  b, i = run_step(b, i)
  jax.block_until_ready(b.qpos)
  qpos = np.asarray(b.qpos)
  assert np.isfinite(qpos).all()
  # worlds actually moved (gravity), not a zeroed output
  assert np.abs(qpos - np.asarray(jax.device_get(d.qpos))[None]).max() > 0


def test_mega_matches_xla_path(force_mega, monkeypatch):
  """Steps through the forced-mega interpret path must match the plain
  XLA path at float tolerance (contact-making steps included)."""
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import parallel

  mjm = mujoco.MjModel.from_xml_string(HOPPER)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=8)
  batch = parallel.make_batch(m, d, 4, qpos_noise=0.01)

  step = jax.jit(lambda b: mjwt.step_batched(m, b))
  b_mega = batch
  for _ in range(5):
    b_mega = step(b_mega)

  monkeypatch.setenv('MJWT_FORCE_MEGA', '0')
  monkeypatch.setenv('MJWT_FUSED_SOLVER', '0')
  step_xla = jax.jit(lambda b: mjwt.step_batched(m, b))
  b_xla = batch
  for _ in range(5):
    b_xla = step_xla(b_xla)

  np.testing.assert_allclose(np.asarray(b_mega.qpos),
                             np.asarray(b_xla.qpos), atol=5e-5)
  np.testing.assert_allclose(np.asarray(b_mega.qvel),
                             np.asarray(b_xla.qvel), atol=5e-4)
  np.testing.assert_array_equal(np.asarray(b_mega.ncon),
                                np.asarray(b_xla.ncon))


@pytest.mark.slow
def test_jit_step_batched_mega_traces_humanoid(force_mega):
  """The humanoid bench model must trace+lower through the forced mega
  path (this is exactly where BENCH_r02 crashed)."""
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import models, parallel

  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=16)
  batch = parallel.make_batch(m, d, 8, qpos_noise=0.01)
  jax.jit(lambda b: mjwt.step_batched(m, b)).lower(batch)
