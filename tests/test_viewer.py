"""Viewer bridge smoke (headless: exercises the build / opt-change
recapture path without GLFW — the loop body's device side)."""

import numpy as np

import mujoco

from fixtures import PENDULUM


def test_viewer_build_and_opt_recapture():
  import mujoco_warp_tpu as mjwt
  from mujoco_warp_tpu import viewer

  mjm = mujoco.MjModel.from_xml_string(PENDULUM)
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  m, d, step = viewer.build(mjm, mjd)
  sig0 = viewer.opt_sig(mjm)
  d = step(d)
  mjwt.get_data_into(mjd, m, d)
  assert np.isfinite(mjd.qpos).all()
  t_before = float(np.asarray(d.time))

  # UI option change -> signature changes -> rebuild carries state
  mjm.opt.timestep = 0.004
  assert viewer.opt_sig(mjm) != sig0
  m2, d2, step2 = viewer.build(mjm, mjd, prev_d=d)
  assert abs(float(m2.opt.timestep) - 0.004) < 1e-6
  # carried dynamic state, then stepped once more by build's compile
  assert float(np.asarray(d2.time)) >= t_before
  d2 = step2(d2)
  assert np.isfinite(np.asarray(d2.qpos)).all()
