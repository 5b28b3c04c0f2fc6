"""mujoco_warp_tpu — a TPU-native batched MuJoCo-class physics engine.

Same capabilities as the GPU reference (mujoco_warp), re-designed for
JAX/XLA/Pallas: single-world pure-functional pipeline, vmap over worlds,
pjit/shard_map over a device mesh. See SURVEY.md for the layer map.
"""

from .io import (
    get_data_into,
    make_data,
    put_data,
    put_model,
    reset_data,
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
    Statistic,
    TrnType,
)
from . import math
from . import smooth

__version__ = '0.1.0'
