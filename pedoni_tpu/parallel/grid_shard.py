"""Row-strip sharding of the grid backend — the cols=1 case of tile2d.

The round-1 sharded path (parallel/spatial.py) moves *agents* between
devices — variable-size packages, compaction, adoption, package-capacity
loss modes.  With cell-resident state (models/sfm_grid.py) all of that
machinery collapses: shard the grid ``D`` on its cell-ROW axis and the
entire communication pattern becomes two fixed-size one-row ghost
exchanges per step over ``lax.ppermute`` (ICI neighbor traffic);
migration is the rebin picking movers out of a ghost row — agents are
never packed, shipped, or re-homed, and there is no package capacity to
overflow.  The reference has no multi-device support at all (SURVEY.md
section 2); this is the scaling axis it lacks.

The implementation lives in parallel/tile2d.py: row strips are exactly
its (rows=N, cols=1) configuration (``exchange_cols`` degenerates to a
no-op, lane offsets to zero), so this module is a thin naming shim kept
for the row-strip vocabulary and its callers.  See tile2d's module
docstring for the exchange-order/correctness story.
"""

from __future__ import annotations

from ..models.sfm import StepConfig
from .tile2d import (  # noqa: F401  (re-exports)
    ROW_AXIS as AXIS,
    Tile2DConfig,
    device_inputs_on_mesh,
    make_mesh,
    make_sharded_grid_state,
    make_sharded_step,
    shard_device_inputs,
    unbin_sharded,
)


class GridShardConfig:
    """Compat constructor: row strips = Tile2DConfig(rows=N, cols=1)."""

    @staticmethod
    def build(cfg: StepConfig, n_devices: int,
              row_block: int = 2) -> Tile2DConfig:
        return Tile2DConfig.build(cfg, n_devices, 1, row_block=row_block)


def dryrun(n_devices: int) -> None:
    """Driver hook: n-device row-strip mesh (tile2d rows x 1)."""
    from .tile2d import dryrun as dryrun_2d

    dryrun_2d(n_devices, 1)
