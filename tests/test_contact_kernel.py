"""Contact megakernel parity vs the XLA collision+constraint path
(TPU-only; the kernel is gated to the TPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

TPU = jax.default_backend() == 'tpu'


@pytest.mark.skipif(not TPU, reason='Mosaic kernels need a TPU')
def test_contact_kernel_parity_humanoid():
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import (models, parallel, collision_driver,
                               constraint)
  from mujoco_warp_tpu.pallas import contact_kernels
  import importlib
  fwd = importlib.import_module('mujoco_warp_tpu.forward')

  mjm = mujoco.MjModel.from_xml_path(models.HUMANOID)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=24)
  assert contact_kernels.supports(m, d)
  batch = parallel.make_batch(m, d, 256, qpos_noise=0.01)
  # warm through the OLD path so the comparison state is identical
  orig = contact_kernels.supports
  contact_kernels.supports = lambda *_: False
  try:
    step = jax.jit(lambda b: mjwt.step_batched(m, b))
    for _ in range(30):
      batch = step(batch)
    jax.block_until_ready(batch.qpos)
  finally:
    contact_kernels.supports = orig

  pre = jax.jit(lambda b: fwd._smooth_mega_batched(m, b))(batch)
  vm = lambda fn: jax.jit(lambda b: jax.vmap(lambda dd: fn(m, dd))(b))
  ref = vm(constraint.make_constraint)(vm(collision_driver.collision)(pre))
  kernel, meta = contact_kernels.make_contact_kernel(m, 24)
  new = jax.jit(
      lambda b: contact_kernels.contact_efc(m, b, kernel, meta))(pre)

  np.testing.assert_array_equal(np.asarray(new.ncon),
                                np.asarray(ref.ncon))
  np.testing.assert_array_equal(np.asarray(new.contact.geom),
                                np.asarray(ref.contact.geom))
  np.testing.assert_allclose(np.asarray(new.contact.dist),
                             np.asarray(ref.contact.dist), atol=1e-6)
  np.testing.assert_allclose(np.asarray(new.efc_J),
                             np.asarray(ref.efc_J), atol=1e-5)
  scale = max(float(jnp.abs(ref.efc_D).max()), 1.0)
  np.testing.assert_allclose(np.asarray(new.efc_D) / scale,
                             np.asarray(ref.efc_D) / scale, atol=1e-4)
  np.testing.assert_allclose(np.asarray(new.efc_aref),
                             np.asarray(ref.efc_aref), atol=1e-3)
  np.testing.assert_array_equal(np.asarray(new.efc_active),
                                np.asarray(ref.efc_active))
  np.testing.assert_array_equal(np.asarray(new.nefc),
                                np.asarray(ref.nefc))


def test_contact_kernel_interpret_tiny():
  """Interpret-mode run of the contact kernel on a minimal scene so the
  CPU CI covers the kernel logic: sphere resting on a plane."""
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import parallel
  from mujoco_warp_tpu.pallas import contact_kernels
  import importlib
  fwd = importlib.import_module('mujoco_warp_tpu.forward')

  xml = """
  <mujoco>
    <worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.09">
        <joint type="slide" axis="0 0 1" range="-1 1" limited="true"/>
        <geom type="sphere" size="0.1" mass="1.0"/>
      </body>
    </worldbody>
  </mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=2)
  assert contact_kernels.supports(m, d)
  batch = parallel.make_batch(m, d, 4)
  vm = lambda fn: jax.vmap(lambda dd: fn(m, dd))
  from mujoco_warp_tpu import smooth
  b = vm(smooth.kinematics)(batch)
  b = vm(smooth.com_pos)(b)
  b = vm(smooth.crb)(b)
  kernel, meta = contact_kernels.make_contact_kernel(m, 2)
  out = contact_kernels.contact_efc(m, b, kernel, meta, interpret=True)
  # penetrating by 1cm: one active contact, dist ~ -0.01
  assert int(out.ncon[0]) == 1
  d0 = float(out.contact.dist[0, 0])
  assert abs(d0 + 0.01) < 1e-5, d0
  assert int(out.nefc[0]) == 4  # pyramidal rows for one condim-3 contact
