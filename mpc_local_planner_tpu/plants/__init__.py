"""Plants: simulation targets for closed-loop control.

Parity: cbr:plants (corbo-plants) — plant_interface.h, simulated_plant.h
(SimulatedPlant: integrates dynamics with optional disturbances and input
dead time; SURVEY.md §3.2). Functional pytree state machines.
"""

from mpc_local_planner_tpu.plants.simulated_plant import (
    SimulatedPlant,
    PlantState,
)

__all__ = ["SimulatedPlant", "PlantState"]
