"""mujoco_warp_tpu — a TPU-native batched MuJoCo-class physics engine.

Same capabilities as the GPU reference (mujoco_warp), re-designed for
JAX/XLA/Pallas: single-world pure-functional pipeline, vmap over worlds,
pjit/shard_map over a device mesh. See SURVEY.md for the layer map.
"""

import os as _os


def default_cache_dir() -> str:
  """Cache location for compiled executables + probe memos. Defaults to
  a directory INSIDE the repo/package checkout so a warmed cache ships
  with the source (fresh containers keep the checkout but not ~/.cache
  — the round-4 cold-jit regression was every fresh process paying the
  full compile because ~/.cache never survived). Falls back to ~/.cache
  when the checkout is not writable (installed site-packages)."""
  env = _os.environ.get('MJWT_CACHE_DIR')
  if env:
    return env
  repo_cache = _os.path.join(
      _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
      '.mjwt_cache')
  parent = _os.path.dirname(repo_cache)
  if _os.path.isdir(repo_cache) or _os.access(parent, _os.W_OK):
    return repo_cache
  return _os.path.join(_os.path.expanduser('~'), '.cache', 'mjwt_xla')


def _enable_compilation_cache() -> None:
  """Persistent XLA/Mosaic compilation cache (reference analogue: Warp's
  kernel cache makes its graph capture 0.3s; without this every fresh
  process pays the full 30-400s jit). MJWT_NO_CACHE=1 disables,
  MJWT_CACHE_DIR overrides the location."""
  if _os.environ.get('MJWT_NO_CACHE', '0') == '1':
    return
  import jax
  cache_dir = default_cache_dir()
  try:
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
  except Exception:  # old jax without these flags: soft-fail
    pass


_enable_compilation_cache()

from .io import (
    find_keys,
    get_data_into,
    make_data,
    make_trajectory,
    override_model,
    put_data,
    put_model,
    reset_data,
    reset_data_masked,
    set_const,
)
from .types import (
    BiasType,
    ConeType,
    ConstraintType,
    Contact,
    Data,
    DisableBit,
    DynType,
    EnableBit,
    EqType,
    GainType,
    GeomType,
    IntegratorType,
    JointType,
    Model,
    ObjType,
    Option,
    SensorType,
    SolverType,
    State,
    Statistic,
    TrnType,
)
from .inverse import inverse
from .support import (
    contact_force,
    get_state,
    jac,
    mul_m,
    set_state,
    state_size,
    xfrc_accumulate,
)
from .forward import (
    euler,
    forward,
    forward_batched,
    fwd_acceleration,
    fwd_actuation,
    fwd_position,
    fwd_velocity,
    implicit,
    rungekutta4,
    step,
    step1,
    step2,
    step_batched,
)
from .solver import solve
from .collision_driver import collision
from .constraint import make_constraint
from . import collision_driver
from . import collision_primitive
from . import constraint
from . import derivative
from . import math
from . import passive
from . import sensor
from . import ray
from . import render
from . import smooth
from . import solver
from . import support

__version__ = '0.1.0'
