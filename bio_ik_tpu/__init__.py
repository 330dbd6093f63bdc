"""bio_ik_tpu — TPU-native generalized inverse kinematics.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
TAMS-Group/bio_ik (memetic-evolutionary IK with ~20 weighted goal types),
re-designed TPU-first: batched frame algebra, trace-time-specialized FK,
a matmul-shaped tip-frame linearizer, fully on-device population solvers,
and island/scenario parallelism over device meshes.
"""

from .robot import RobotModel, load_urdf, parse_urdf  # noqa: F401
from .math import Frame  # noqa: F401
from .config import SolverConfig  # noqa: F401
from .api import IKSolver, IKResult  # noqa: F401
from .problem import Problem  # noqa: F401
from . import goals  # noqa: F401
from .params import (  # noqa: F401
    config_from_dict,
    goal_from_dict,
    goals_from_dict,
    load_yaml,
    solver_from_spec,
)

__version__ = "0.1.0"


def asset_path(name: str) -> str:
    """Path to a bundled test/benchmark URDF (pr2_arm, ur5, snake, ...)."""
    import os

    return os.path.join(os.path.dirname(__file__), "assets", name)
