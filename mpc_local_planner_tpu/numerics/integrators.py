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


# --------------------------------------------------------------------------- #
# Butcher tableaus (a-matrix rows for stages 2..S, b weights). Single source
# of truth shared with the fused kernel's generic tableau walker
# (ops/fused_al_sqp_pallas._RK_TABLEAUS). The euler..rk5 entries are the
# tableaus of the closed-form steppers above (kept closed-form — they predate
# the walker and are golden-tested); rk6/rk7 are tableau-driven only.
# Parity: cbr:numerics/explicit_integrators.h ::
# IntegratorExplicitRungeKutta{...6,...7} (the reference family's top orders).
# --------------------------------------------------------------------------- #
RK_TABLEAUS = {
    "explicit_euler": ((), (1.0,)),
    "rk2_midpoint": (((0.5,),), (0.0, 1.0)),
    "rk2_heun": (((1.0,),), (0.5, 0.5)),
    "rk3": (((0.5,), (-1.0, 2.0)), (1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0)),
    "rk4": (
        ((0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
        (1.0 / 6.0, 2.0 / 6.0, 2.0 / 6.0, 1.0 / 6.0),
    ),
    "rk5": (
        (
            (1.0 / 4.0,),
            (3.0 / 32.0, 9.0 / 32.0),
            (1932.0 / 2197.0, -7200.0 / 2197.0, 7296.0 / 2197.0),
            (439.0 / 216.0, -8.0, 3680.0 / 513.0, -845.0 / 4104.0),
            (-8.0 / 27.0, 2.0, -3544.0 / 2565.0, 1859.0 / 4104.0, -11.0 / 40.0),
        ),
        (
            16.0 / 135.0, 0.0, 6656.0 / 12825.0, 28561.0 / 56430.0,
            -9.0 / 50.0, 2.0 / 55.0,
        ),
    ),
    # Butcher's 7-stage 6th-order method (Butcher 1964). Row sums equal the
    # c nodes (1/3, 2/3, 1/3, 1/2, 1/2, 1) and Σb = 1 (checked in tests).
    "rk6": (
        (
            (1.0 / 3.0,),
            (0.0, 2.0 / 3.0),
            (1.0 / 12.0, 1.0 / 3.0, -1.0 / 12.0),
            (-1.0 / 16.0, 9.0 / 8.0, -3.0 / 16.0, -3.0 / 8.0),
            (0.0, 9.0 / 8.0, -3.0 / 8.0, -3.0 / 4.0, 1.0 / 2.0),
            (9.0 / 44.0, -9.0 / 11.0, 63.0 / 44.0, 18.0 / 11.0, 0.0,
             -16.0 / 11.0),
        ),
        (
            11.0 / 120.0, 0.0, 27.0 / 40.0, 27.0 / 40.0, -4.0 / 15.0,
            -4.0 / 15.0, 11.0 / 120.0,
        ),
    ),
    # Fehlberg RK7(8), truncated to the 11 stages the 7th-order solution
    # actually uses: the full tableau's stages 12-13 exist only for the
    # (unused) embedded 8th-order error estimate — their b weights are zero
    # and no kept stage depends on them, so dropping them is bit-identical
    # and saves 2 dynamics evals per substep (review r4).
    "rk7": (
        (
            (2.0 / 27.0,),
            (1.0 / 36.0, 1.0 / 12.0),
            (1.0 / 24.0, 0.0, 1.0 / 8.0),
            (5.0 / 12.0, 0.0, -25.0 / 16.0, 25.0 / 16.0),
            (1.0 / 20.0, 0.0, 0.0, 1.0 / 4.0, 1.0 / 5.0),
            (-25.0 / 108.0, 0.0, 0.0, 125.0 / 108.0, -65.0 / 27.0,
             125.0 / 54.0),
            (31.0 / 300.0, 0.0, 0.0, 0.0, 61.0 / 225.0, -2.0 / 9.0,
             13.0 / 900.0),
            (2.0, 0.0, 0.0, -53.0 / 6.0, 704.0 / 45.0, -107.0 / 9.0,
             67.0 / 90.0, 3.0),
            (-91.0 / 108.0, 0.0, 0.0, 23.0 / 108.0, -976.0 / 135.0,
             311.0 / 54.0, -19.0 / 60.0, 17.0 / 6.0, -1.0 / 12.0),
            (2383.0 / 4100.0, 0.0, 0.0, -341.0 / 164.0, 4496.0 / 1025.0,
             -301.0 / 82.0, 2133.0 / 4100.0, 45.0 / 82.0, 45.0 / 164.0,
             18.0 / 41.0),
        ),
        (
            41.0 / 840.0, 0.0, 0.0, 0.0, 0.0, 34.0 / 105.0, 9.0 / 35.0,
            9.0 / 35.0, 9.0 / 280.0, 9.0 / 280.0, 41.0 / 840.0,
        ),
    ),
}


def _from_tableau(name):
    """Generic explicit-RK stepper from a Butcher tableau (unrolled)."""
    a_rows, b = RK_TABLEAUS[name]

    def step(f, x, u, dt):
        ks = [f(x, u)]
        for row in a_rows:
            xs = x
            for aij, kj in zip(row, ks):
                if aij != 0.0:
                    xs = xs + dt * aij * kj
            ks.append(f(xs, u))
        out = x
        for bi, ki in zip(b, ks):
            if bi != 0.0:
                out = out + dt * bi * ki
        return out

    return step


INTEGRATORS = {
    "explicit_euler": _euler,
    "rk2_midpoint": _rk2_midpoint,
    "rk2_heun": _rk2_heun,
    "rk3": _rk3,
    "rk4": _rk4,
    "rk5": _rk5_fehlberg,
    "rk6": _from_tableau("rk6"),
    "rk7": _from_tableau("rk7"),
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
