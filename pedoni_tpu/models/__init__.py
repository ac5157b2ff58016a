from .sfm import (
    AgentState,
    SimState,
    StepConfig,
    StepMetrics,
    make_initial_state,
    make_step,
)

__all__ = [
    "AgentState",
    "SimState",
    "StepConfig",
    "StepMetrics",
    "make_initial_state",
    "make_step",
]
