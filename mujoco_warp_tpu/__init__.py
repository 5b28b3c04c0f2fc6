"""mujoco_warp_tpu — a TPU-native batched MuJoCo-class physics engine.

Same capabilities as the GPU reference (mujoco_warp), re-designed for
JAX/XLA/Pallas: single-world pure-functional pipeline, vmap over worlds,
pjit/shard_map over a device mesh. See SURVEY.md for the layer map.
"""

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
