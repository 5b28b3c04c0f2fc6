"""World-difficulty sorting for the lane-blocked Newton kernels.

Each 128-lane block of the fused solver iterates until ITS worlds
converge, so grouping worlds by previous-step solver_niter makes
block-max iterations ~= block-mean (round-4 profile: block max 6.5 vs
mean 2.8 on humanoid@8192). The permutation is applied to every kernel
input and inverted on every output — results must be exactly
order-preserving.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_warp_tpu.pallas import solver_kernels as sk


def test_world_sort_perm_roundtrip(monkeypatch):
  monkeypatch.setenv('MJWT_SORT_WORLDS', '1')  # per-step sort is opt-in
  niter = jnp.asarray(np.random.default_rng(0).integers(0, 9, 300),
                      jnp.int32)
  perm, inv = sk.world_sort_perm(niter)
  assert perm is not None
  x = jnp.arange(300)
  np.testing.assert_array_equal(np.asarray(x[perm][inv]), np.asarray(x))
  # sorted grouping: niter non-decreasing along the permuted order
  sorted_n = np.asarray(niter[perm])
  assert (np.diff(sorted_n) >= 0).all()


def test_world_sort_perm_disabled_small_batch():
  niter = jnp.zeros(64, jnp.int32)
  perm, inv = sk.world_sort_perm(niter)
  assert perm is None and inv is None


def test_world_sort_perm_env_off(monkeypatch):
  monkeypatch.setenv('MJWT_SORT_WORLDS', '0')
  niter = jnp.zeros(300, jnp.int32)
  perm, inv = sk.world_sort_perm(niter)
  assert perm is None and inv is None


def test_newton_solve_perm_invariance():
  """Fused Newton solve with a world permutation returns results in the
  ORIGINAL world order (perm is applied to inputs, inverted on
  outputs)."""
  rng = np.random.default_rng(1)
  W, nv, nj = 260, 2, 3
  a = rng.standard_normal((W, nv, nv)).astype(np.float32)
  qm = a @ np.swapaxes(a, 1, 2) + 2.0 * np.eye(nv, dtype=np.float32)
  efc_j = rng.standard_normal((W, nj, nv)).astype(np.float32)
  efc_d = np.abs(rng.standard_normal((W, nj))).astype(np.float32) + 0.5
  aref = rng.standard_normal((W, nj)).astype(np.float32)
  fl = np.zeros((W, nj), np.float32)
  qfs = rng.standard_normal((W, nv)).astype(np.float32)
  ws = np.zeros((W, nv), np.float32)
  tol = jnp.float32(1e-8)
  mi = jnp.float32(1.0)

  args = tuple(jnp.asarray(x) for x in
               (qm, efc_j, efc_d, aref, fl, qfs, ws))
  static = dict(ne=0, nf=0, iterations=10, interpret=True)

  base = sk.newton_solve_batched(*args, tol, mi, **static)
  perm = jnp.asarray(rng.permutation(W), jnp.int32)
  inv = jnp.argsort(perm)
  permed = sk.newton_solve_batched(*args, tol, mi, None, None, None,
                                   None, perm, inv, **static)
  for b, p in zip(base, permed):
    np.testing.assert_allclose(np.asarray(b), np.asarray(p),
                               rtol=0, atol=1e-6)


def test_sort_worlds_persistent_permutation():
  """benchmark.sort_worlds permutes every per-world leaf by ascending
  solver_niter, consistently across leaves (a world's row moves as one
  unit), and leaves non-batch leaves alone."""
  import dataclasses
  import importlib

  bm = importlib.import_module('mujoco_warp_tpu.utils.benchmark')

  @jax.tree_util.register_dataclass
  @dataclasses.dataclass(frozen=True)
  class FakeData:
    solver_niter: jax.Array
    qpos: jax.Array
    big: jax.Array
    scalar: jax.Array

  rng = np.random.default_rng(1)
  W = 300
  niter = jnp.asarray(rng.integers(0, 7, W), jnp.int32)
  d = FakeData(
      solver_niter=niter,
      qpos=jnp.arange(W * 3, dtype=jnp.float32).reshape(W, 3),
      big=jnp.arange(W * 4, dtype=jnp.float32).reshape(W, 2, 2),
      scalar=jnp.float32(3.5))
  out = bm.sort_worlds(d)
  perm = np.asarray(jnp.argsort(niter))  # the exact perm applied
  srt = np.asarray(out.solver_niter)
  assert (np.diff(srt) >= 0).all()
  # rows travel together: every leaf permuted by the same perm
  np.testing.assert_array_equal(np.asarray(out.qpos),
                                np.asarray(d.qpos)[perm])
  np.testing.assert_array_equal(np.asarray(out.big),
                                np.asarray(d.big)[perm])
  assert float(out.scalar) == 3.5


def test_mjwt_pallas_kill_switch(monkeypatch):
  """MJWT_PALLAS=0 makes every probe refuse, forcing the pure-XLA path
  (the escape hatch for scenes whose Mosaic compile crashes the remote
  compile helper itself — aloha_pot)."""
  from mujoco_warp_tpu.pallas import probe

  monkeypatch.setenv('MJWT_PALLAS', '0')
  called = []
  assert probe.probe('kill_switch_test', lambda: called.append(1)) is False
  assert not called  # build must never run
