"""Correctness + timing of the Pallas batched Cholesky vs the unrolled
jnp version, on whatever backend is ambient (TPU under axon)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_warp_tpu import linalg
from mujoco_warp_tpu.pallas import batch_linalg


def main():
  for (w, nv) in [(2048, 27), (8192, 27), (2048, 17)]:
    rng = np.random.default_rng(0)
    q = rng.normal(size=(w, nv, nv)).astype(np.float32)
    a = q @ np.swapaxes(q, 1, 2) + 3 * np.eye(nv, dtype=np.float32)
    b = rng.normal(size=(w, nv)).astype(np.float32)
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)

    x_ref = np.linalg.solve(a.astype(np.float64),
                            b.astype(np.float64)[..., None])[..., 0]

    f_pallas = jax.jit(batch_linalg.spd_solve_batched)
    f_jnp = jax.jit(jax.vmap(linalg.spd_solve))

    x_p = f_pallas(a_j, b_j)
    x_u = f_jnp(a_j, b_j)
    jax.block_until_ready((x_p, x_u))
    err_p = np.abs(np.asarray(x_p) - x_ref).max() / max(1, np.abs(x_ref).max())
    err_u = np.abs(np.asarray(x_u) - x_ref).max() / max(1, np.abs(x_ref).max())

    def t(f):
      t0 = time.perf_counter()
      for _ in range(20):
        out = f(a_j, b_j)
      jax.block_until_ready(out)
      return (time.perf_counter() - t0) / 20 * 1e3

    print(f'W={w} nv={nv}: pallas {t(f_pallas):7.3f} ms (err {err_p:.2e})'
          f' | unrolled {t(f_jnp):7.3f} ms (err {err_u:.2e})')


if __name__ == '__main__':
  main()
