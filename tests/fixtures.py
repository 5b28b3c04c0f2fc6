"""Oracle-differential test fixtures (reference test strategy: SURVEY §4).

Builds a C MuJoCo (mjModel, mjData) pair and our (Model, Data) from the
same MJCF, with optional state randomization and warm-up steps, so tests
can assert field-level parity at ~5e-5 (the reference's own tolerance,
mujoco_warp/_src/forward_test.py:33-40).

All MJCF here is authored for this project (not copied from the
reference's test_data), exercising the same feature axes.
"""

from __future__ import annotations

import mujoco
import numpy as np

import mujoco_warp_tpu as mjwt

# A 3-link pendulum with hinge/slide mix, sphere+capsule geoms, site.
PENDULUM = """
<mujoco>
  <option timestep="0.005" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="h1" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <body pos="0.3 0 0">
        <joint name="h2" type="hinge" axis="1 0 0" damping="0.05"
               stiffness="2.0" springref="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0 0.25 0" mass="0.3"/>
        <site name="tip" pos="0 0.25 0"/>
        <body pos="0 0.25 0">
          <joint name="s1" type="slide" axis="0 0 1" damping="0.2"/>
          <geom type="sphere" size="0.04" mass="0.2"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="h1" gear="1.5"/>
    <motor joint="h2" gear="2.0"/>
  </actuator>
</mujoco>
"""

# Free body + ball joint chain: exercises quaternion joints, no contacts.
BALL_CHAIN = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 2">
      <freejoint/>
      <geom type="box" size="0.1 0.08 0.06" mass="1.0" contype="0"
            conaffinity="0"/>
      <body pos="0.15 0 0">
        <joint type="ball" damping="0.1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.2"
              contype="0" conaffinity="0"/>
        <body pos="0.2 0 0">
          <joint type="hinge" axis="0 0 1" damping="0.02"/>
          <geom type="sphere" size="0.03" mass="0.1" contype="0"
                conaffinity="0"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

# A simple hopper-like model on a plane: floating base + contacts.
HOPPER = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 1" friction="1 0.005 0.0001"/>
    <body pos="0 0 0.6">
      <freejoint/>
      <geom type="capsule" size="0.05" fromto="0 0 0 0 0 0.25" mass="2.0"/>
      <body pos="0 0 0">
        <joint type="hinge" axis="0 1 0" range="-45 45" damping="0.5"/>
        <geom type="capsule" size="0.04" fromto="0 0 0 0 0 -0.3" mass="1.0"/>
        <body pos="0 0 -0.3">
          <joint type="hinge" axis="0 1 0" range="-60 10" damping="0.3"/>
          <geom type="sphere" size="0.06" mass="0.5"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

# Two spheres and a capsule colliding over a plane.
SPHERES = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 1"/>
    <body pos="0 0 0.12">
      <freejoint/>
      <geom type="sphere" size="0.1" mass="0.3"/>
    </body>
    <body pos="0.15 0 0.35">
      <freejoint/>
      <geom type="sphere" size="0.12" mass="0.4"/>
    </body>
    <body pos="0 0.3 0.1">
      <freejoint/>
      <geom type="capsule" size="0.05" fromto="-0.1 0 0 0.1 0 0" mass="0.2"/>
    </body>
  </worldbody>
</mujoco>
"""


def fixture(xml: str, keyframe: int | None = None, qpos_noise: float = 0.0,
            qvel_noise: float = 0.0, ctrl_noise: float = 0.0,
            nstep: int = 0, seed: int = 42, nconmax: int | None = None,
            forward: bool = True):
  """Build oracle + device pair from one MJCF string."""
  np.random.seed(seed)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if keyframe is not None:
    mujoco.mj_resetDataKeyframe(mjm, mjd, keyframe)
  if qpos_noise:
    mjd.qpos[:] += qpos_noise * (np.random.rand(mjm.nq) - 0.5)
  if qvel_noise:
    mjd.qvel[:] += qvel_noise * (np.random.rand(mjm.nv) - 0.5)
  if ctrl_noise:
    mjd.ctrl[:] = ctrl_noise * (np.random.rand(mjm.nu) - 0.5)
  for _ in range(nstep):
    mujoco.mj_step(mjm, mjd)
  if forward:
    mujoco.mj_forward(mjm, mjd)
  m = mjwt.put_model(mjm)
  d = mjwt.put_data(mjm, mjd, m, nconmax=nconmax)
  return mjm, mjd, m, d


def assert_close(a, b, name, tol=5e-5):
  a, b = np.asarray(a), np.asarray(b)
  np.testing.assert_allclose(
      a.reshape(b.shape), b, rtol=tol, atol=tol, err_msg=name)
