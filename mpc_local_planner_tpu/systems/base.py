"""SE(2) robot dynamics base.

Parity: ``systems/robot_dynamics_interface.h`` (RobotDynamicsInterface:
getPositionFromState, getPoseSE2FromState, getSteadyStateFromPoseSE2,
getTwistFromControl, mergeStateFeedbackAndOdomFeedback) and
``systems/base_robot_se2.h`` (BaseRobotSE2: state dim fixed to 3,
continuous-time, pose<->state conversions), both over
cbr:systems ``system_dynamics_interface.h``.

TPU-first design: a model is a frozen pytree dataclass whose ``f(x, u)`` is a
pure, batch-polymorphic continuous-time dynamics function. Jacobians come
from jax AD (jacfwd), replacing the reference's numeric finite differences
(cbr:numerics/finite_differences.h); linearization helpers are provided here
(parity: SystemDynamicsInterface::getLinearA/getLinearB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class BaseRobotSE2:
    """Mixin for SE(2) models: state x = (px, py, theta) IS the pose."""

    state_dim: int = 3
    continuous_time: bool = True

    # --- pose/state conversions (trivial for SE(2) state = pose) ---
    def position_from_state(self, x):
        return x[..., :2]

    def pose_from_state(self, x):
        return x

    def steady_state_from_pose(self, pose):
        return pose

    def merge_state_feedback_and_odom(self, x_feedback, x_odom, prefer_feedback: bool):
        """Parity: RobotDynamicsInterface::mergeStateFeedbackAndOdomFeedback.

        For 3-dim SE(2) models the two sources are the same quantity; the
        reference simply prefers one wholesale (prefer_x_feedback param).
        """
        return x_feedback if prefer_feedback else x_odom

    # --- linearization (replaces corbo FD getLinearA/getLinearB) ---
    def jac_x(self, x, u):
        return jax.jacfwd(self.f, argnums=0)(x, u)

    def jac_u(self, x, u):
        return jax.jacfwd(self.f, argnums=1)(x, u)

    def linearize(self, x, u):
        """(A, B) of the continuous-time dynamics at (x, u); single sample."""
        return self.jac_x(x, u), self.jac_u(x, u)

    # --- control bounds hook: models expose their natural input box ---
    def control_bounds(self, limits):
        """Map a RobotLimits config to (u_min, u_max) arrays of control_dim."""
        raise NotImplementedError

    def equilibrium_control(self):
        """Control that holds a steady state (zeros for kinematic models)."""
        return jnp.zeros((self.control_dim,))
