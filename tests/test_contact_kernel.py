"""Contact megakernel parity vs the XLA collision+constraint path
(TPU-only; the kernel is gated to the TPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # interpret-mode/long-horizon: excluded from -m 'not slow'

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


def _run_interpret(xml, nconmax, W=4, noise=0.005, qvel0=None):
  """Build scene, run both the XLA collision+constraint path and the
  contact kernel (interpret mode), return (new, ref)."""
  import mujoco
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import (parallel, collision_driver, constraint,
                               smooth)
  from mujoco_warp_tpu.pallas import contact_kernels
  import numpy as _np

  mjm = mujoco.MjModel.from_xml_string(xml)
  m = mjwt.put_model(mjm)
  d = mjwt.make_data(m, nconmax=nconmax)
  assert contact_kernels.supports(m, d)
  batch = parallel.make_batch(m, d, W, qpos_noise=noise)
  if qvel0 is not None:
    batch = batch.replace(qvel=batch.qvel.at[:, 0].set(
        jnp.asarray(qvel0)))
  vm = lambda fn: jax.vmap(lambda dd: fn(m, dd))
  b = vm(smooth.kinematics)(batch)
  b = vm(smooth.com_pos)(b)
  b = vm(smooth.crb)(b)
  ref = vm(constraint.make_constraint)(vm(collision_driver.collision)(b))
  kernel, meta = contact_kernels.make_contact_kernel(m, nconmax)
  new = contact_kernels.contact_efc(m, b, kernel, meta, interpret=True)
  return new, ref


def _compare(new, ref, tag, atol=2e-5, j_atol=None):
  for name in ['ncon', 'ncollision', 'nefc', 'ne', 'nf', 'nl']:
    a, r = np.asarray(getattr(new, name)), np.asarray(getattr(ref, name))
    assert np.array_equal(a, r), (tag, name, a, r)
  assert np.array_equal(np.asarray(new.contact.geom),
                        np.asarray(ref.contact.geom)), tag
  np.testing.assert_allclose(np.asarray(new.contact.dist),
                             np.asarray(ref.contact.dist), atol=atol,
                             err_msg=f'{tag} dist')
  act = np.asarray(ref.efc_active)
  for name, tol in [('efc_J', j_atol or atol), ('efc_D', atol),
                    ('efc_aref', atol), ('efc_vel', atol),
                    ('efc_frictionloss', atol)]:
    a, r = np.asarray(getattr(new, name)), np.asarray(getattr(ref, name))
    scale = max(1.0, float(np.abs(r[act]).max()) if act.any() else 1.0)
    np.testing.assert_allclose(a[act] / scale, r[act] / scale, atol=tol,
                               err_msg=f'{tag} {name}')


_BOX_SCENE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 0.1"/>
    <body pos="0 0 0.099">
      <freejoint/>
      <geom type="box" size="0.1 0.15 0.1" mass="1.0" euler="3 2 0"/>
    </body>
    <body pos="0.02 0.03 0.247">
      <freejoint/>
      <geom type="sphere" size="0.05" mass="0.3"/>
    </body>
    <body pos="-0.02 0.0 0.238" euler="0 0 20">
      <freejoint/>
      <geom type="capsule" size="0.04 0.09" mass="0.3" euler="0 88 0"/>
    </body>
  </worldbody>
</mujoco>"""

_BOXBOX_SCENE = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="3 3 0.1"/>
    <body pos="0 0 0.099">
      <freejoint/>
      <geom type="box" size="0.12 0.15 0.1" mass="1.0"/>
    </body>
    <body pos="0.03 -0.02 0.247" euler="4 3 25">
      <freejoint/>
      <geom type="box" size="0.05 0.04 0.05" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>"""


def test_contact_kernel_interpret_boxes():
  """plane-box, sphere-box, capsule-box lane colliders vs the XLA
  path (collision_primitive.{plane_box,sphere_box,capsule_box})."""
  new, ref = _run_interpret(_BOX_SCENE, 12)
  assert int(np.asarray(ref.ncon).sum()) > 8  # scene produces contacts
  # capsule-box refinement is iterative: ULP-level divergence between
  # the batched and per-sample evaluation rotates the near-edge normal
  # by ~1e-3 — physically identical, so J gets a looser tolerance
  _compare(new, ref, 'boxes', j_atol=5e-4)


def test_contact_kernel_interpret_box_box():
  """box-box SAT manifold (collision_box.box_box) in lane form."""
  new, ref = _run_interpret(_BOXBOX_SCENE, 14)
  assert int(np.asarray(ref.ncon).sum()) > 8
  _compare(new, ref, 'box_box', j_atol=5e-4)


def test_contact_kernel_interpret_frictionloss():
  """dof-friction efc rows (constraint.py friction group) in-kernel."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <geom type="plane" size="2 2 0.1"/>
      <body pos="0 0 0.09">
        <joint type="slide" axis="0 0 1" range="-1 1" limited="true"
               frictionloss="0.3" damping="0.1"/>
        <geom type="sphere" size="0.1" mass="1.0"/>
      </body>
      <body pos="0.5 0 0.2">
        <joint type="hinge" axis="0 1 0" frictionloss="0.7"/>
        <geom type="capsule" size="0.05 0.1" mass="0.5"/>
      </body>
    </worldbody>
  </mujoco>"""
  new, ref = _run_interpret(xml, 4, qvel0=[0.0, 0.5, -0.5, 0.1])
  assert int(np.asarray(ref.nf).sum()) == 8  # 2 per world
  _compare(new, ref, 'frictionloss')


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
