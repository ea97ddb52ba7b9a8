"""Robot dynamics models (parity: mpc_local_planner/systems + cbr:systems)."""

from mpc_local_planner_tpu.systems.base import BaseRobotSE2  # noqa: F401
from mpc_local_planner_tpu.systems.models import (  # noqa: F401
    UnicycleModel,
    SimpleCarModel,
    SimpleCarFrontWheelDrivingModel,
    KinematicBicycleModelVelocityInput,
    make_robot_dynamics,
    ROBOT_TYPES,
)
