"""Checkpoint / resume (the reference has none — SURVEY.md section 5).

Simulation state is a handful of SoA arrays plus the PRNG key and step
counter, so a checkpoint is a plain ``.npz`` dump.  Useful for long
million-agent runs and for exact-resume determinism tests.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .models.sfm import AgentState, SimState

FORMAT_VERSION = 1


def save_state(state: SimState, path: str | Path, step_count: int = 0) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    a = state.agents
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        pos=np.asarray(a.pos),
        vel=np.asarray(a.vel),
        speed=np.asarray(a.speed),
        dest=np.asarray(a.dest),
        active=np.asarray(a.active),
        key=np.asarray(state.key),
        step=np.asarray(state.step),
        step_count=step_count,
    )


def load_state(path: str | Path) -> tuple[SimState, int]:
    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        agents = AgentState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            speed=jnp.asarray(z["speed"]),
            dest=jnp.asarray(z["dest"]),
            active=jnp.asarray(z["active"]),
        )
        state = SimState(
            agents=agents,
            key=jnp.asarray(z["key"]),
            step=jnp.asarray(z["step"]),
        )
        return state, int(z["step_count"])


def save(sim, path: str | Path) -> None:
    """Checkpoint a Simulator.  Always stored as flat agent arrays, so a
    checkpoint written by any backend / device count restores on any
    other (grid states are unbinned on save, re-binned on restore)."""
    save_state(sim._to_flat_state(), path, step_count=sim.step_count)


def restore(sim, path: str | Path) -> None:
    """Restore a Simulator in place.  The checkpoint capacity must not
    exceed the simulator's configured capacity; smaller checkpoints are
    padded with inactive slots."""
    state, step_count = load_state(path)
    n = state.agents.pos.shape[0]
    if n > sim.cfg.capacity:
        sim._build(n)  # rebuild at the checkpoint's (larger) capacity —
        #                capacity is only a static array length, any n works
    cap = sim.cfg.capacity
    if n < cap:
        pad = cap - n
        a = state.agents
        state = state._replace(
            agents=AgentState(
                pos=jnp.concatenate([a.pos, jnp.zeros((pad, 2), jnp.float32)]),
                vel=jnp.concatenate([a.vel, jnp.zeros((pad, 2), jnp.float32)]),
                speed=jnp.concatenate([a.speed, jnp.ones((pad,), jnp.float32)]),
                dest=jnp.concatenate([a.dest, jnp.zeros((pad,), jnp.int32)]),
                active=jnp.concatenate([a.active, jnp.zeros((pad,), bool)]),
            )
        )
    sim.state = sim._from_flat_state(state)
    sim.step_count = step_count
