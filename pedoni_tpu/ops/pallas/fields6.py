"""Stride-6 field-plane layout for in-kernel sampling.

With ``neighbor_grid_unit = 1.5`` m and ``field_unit = 0.25`` m, every
neighbor cell spans exactly 6 field cells.  An agent in cell (r, x) has its
bilinear taps inside the fixed 8x8 patch

    padded-map rows [6r + 3, 6r + 10],  cols [6x + 3, 6x + 10]

(the +3 = PAD(4) - half-cell - 0.5 rounding; see the derivation in
step_kernel.py).  We re-layout each padded map so the kernel can reach any
patch entry with *static* slices and lane shifts:

    F6[f, c, ch, l]  =  map[f - 6, 6 * (l - 1) + c]

- rows carry a 6-row zero prologue so the topmost halo cell row (-1) is
  addressable: block i DMAs F6 rows [6 * i * rb + 3, + 6(rb+2)+2);
- the lane axis is aligned with the slot grid D (cell x at lane x + 1);
- patch column p of cell x is F6[.., (3+p) % 6, ch, lane + (3+p)//6].

Channel stacking: ``wp [n_wp, R, 6, 4, NXL]`` holds (pot, sobel_gx,
sobel_gy, 0) per waypoint; ``obs [R, 6, 4, NXL]`` holds (dist, gx, gy, 0)
— the channel dim pads to 4 for DMA tile alignment.
Zero fill everywhere unreachable (beyond-map rows/cols are only touched by
positions that are already outside the simulated field).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ...field import FieldMaps

STRIDE = 6  # field cells per neighbor cell (1.5 m / 0.25 m)
PATCH = 8  # bilinear patch extent per cell, rows and cols
ROW0 = 3  # patch offset: first patch row/col of cell 0 in the padded map
F_OFF = STRIDE  # zero prologue rows (makes halo cell row -1 addressable)
N_CH = 4  # channels per plane (3 used + 1 pad for DMA tile alignment)


class Fields6(NamedTuple):
    wp: np.ndarray  # [n_wp, R, 6, 4, NXL] f32
    obs: np.ndarray  # [R, 6, 4, NXL] f32
    rows: int
    nxl: int
    nx_cells: int

    @classmethod
    def build(cls, maps: FieldMaps, nx_cells: int, ny_pad: int,
              lane_align: int = 128) -> "Fields6":
        n_wp, hp, wpc = maps.pot.shape

        rows = STRIDE * ny_pad + F_OFF + ROW0 + PATCH + STRIDE  # safe bound
        cols6 = STRIDE * (nx_cells + 2)
        nxl = -(-(nx_cells + 3) // lane_align) * lane_align

        def layout(chs: list[np.ndarray]) -> np.ndarray:
            out = np.zeros((rows, STRIDE, N_CH, nxl), np.float32)
            for ci, m in enumerate(chs):
                buf = np.zeros((rows, cols6), np.float32)
                r = min(rows - F_OFF, hp)
                c = min(cols6, wpc)
                buf[F_OFF : F_OFF + r, :c] = m[:r, :c]
                v = buf.reshape(rows, nx_cells + 2, STRIDE)
                # lane l holds cell l - 1, matching the slot grid D.
                out[:, :, ci, 1 : nx_cells + 3] = np.transpose(v, (0, 2, 1))
            return out

        wp = np.stack([
            layout([maps.pot[w], maps.pot_gx[w], maps.pot_gy[w]])
            for w in range(n_wp)
        ])
        obs = layout([maps.dist, maps.dist_gx, maps.dist_gy])
        return cls(wp=wp, obs=obs, rows=rows, nxl=nxl, nx_cells=nx_cells)
