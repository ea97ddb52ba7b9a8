"""Explicit ODE integrators.

Parity: cbr:numerics/explicit_integrators.h — IntegratorExplicitEuler,
IntegratorExplicitRungeKutta{2..7} family used for shooting grids and plant
simulation (SURVEY.md §3.2). Fixed-step, jit/vmap-safe, batch-polymorphic:
``f(x, u) -> xdot`` with arbitrary leading batch dims; controls are held
(ZOH) across the step like the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _euler(f, x, u, dt):
    return x + dt * f(x, u)


def _rk2_midpoint(f, x, u, dt):
    k1 = f(x, u)
    return x + dt * f(x + 0.5 * dt * k1, u)


def _rk2_heun(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + dt * k1, u)
    return x + 0.5 * dt * (k1 + k2)


def _rk3(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x - dt * k1 + 2.0 * dt * k2, u)
    return x + dt / 6.0 * (k1 + 4.0 * k2 + k3)


def _rk4(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def _rk5_fehlberg(f, x, u, dt):
    """5th-order stage of the RKF45 tableau (fixed step)."""
    k1 = f(x, u)
    k2 = f(x + dt * (1 / 4) * k1, u)
    k3 = f(x + dt * ((3 / 32) * k1 + (9 / 32) * k2), u)
    k4 = f(x + dt * ((1932 / 2197) * k1 - (7200 / 2197) * k2 + (7296 / 2197) * k3), u)
    k5 = f(x + dt * ((439 / 216) * k1 - 8 * k2 + (3680 / 513) * k3 - (845 / 4104) * k4), u)
    k6 = f(
        x
        + dt
        * (
            -(8 / 27) * k1
            + 2 * k2
            - (3544 / 2565) * k3
            + (1859 / 4104) * k4
            - (11 / 40) * k5
        ),
        u,
    )
    return x + dt * (
        (16 / 135) * k1
        + (6656 / 12825) * k3
        + (28561 / 56430) * k4
        - (9 / 50) * k5
        + (2 / 55) * k6
    )


INTEGRATORS = {
    "explicit_euler": _euler,
    "rk2_midpoint": _rk2_midpoint,
    "rk2_heun": _rk2_heun,
    "rk3": _rk3,
    "rk4": _rk4,
    "rk5": _rk5_fehlberg,
}


def make_integrator(name: str):
    """Factory (parity: corbo integrator registry)."""
    try:
        return INTEGRATORS[name]
    except KeyError:
        raise ValueError(
            f"unknown integrator {name!r}; options: {sorted(INTEGRATORS)}"
        ) from None


def integrate(f, x, u, dt, method: str = "rk4", substeps: int = 1):
    """Propagate x over dt with ZOH control, optionally in substeps."""
    step = make_integrator(method)
    h = dt / substeps
    if substeps == 1:
        return step(f, x, u, h)

    def body(carry, _):
        return step(f, carry, u, h), None

    out, _ = jax.lax.scan(body, x, None, length=substeps)
    return out


def rollout(f, x0, us, dt, method: str = "rk4", substeps: int = 1):
    """Integrate a control sequence: x0 (..., nx), us (..., N, nu) → (..., N+1, nx)."""
    step = make_integrator(method)
    h = jnp.asarray(dt) / substeps

    def body(x, u):
        for _ in range(substeps):
            x = step(f, x, u, h)
        return x, x

    _, xs = jax.lax.scan(body, x0, jnp.moveaxis(us, -2, 0))
    xs = jnp.moveaxis(xs, 0, -2)
    return jnp.concatenate([x0[..., None, :], xs], axis=-2)
