#!/usr/bin/env python
"""A/B the bench domain's lane-tile count on hardware.

The 896-lane rule in bench.py came from a sweep that tested 640/768/896/
1280 lanes at 8M and 512/896 at 1M (PLAN.md round-3 analyses) — 1024
(8 tiles) and 1152 (9) were never measured.  This builds the FULL grid
step (same area/density/physics, bench contract shapes) at each
requested tile count and times them with alternating windows so tunnel
drift hits all arms equally.

Usage: python scripts/ab_lanes.py --tiles 7 8 9 [--agents 1000000]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=1_000_000)
    ap.add_argument("--tiles", type=int, nargs="+", default=[7, 8, 9])
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from bench import build

    arms = []
    for t in args.tiles:
        step, state, cfg = build(args.agents, 2.5, 0, "grid", 14, 16384, 2,
                                 domain=f"tiles:{t}")
        # settle into steady state + compile
        for _ in range(5):
            state, m = step(state)
        n = int(m.n_active)
        print(f"tiles:{t} ({t * 128} lanes, {cfg.grid.ny} cell rows): "
              f"built, active={n}")
        arms.append((f"tiles:{t}", step, state, n))

    best = {name: float("inf") for name, *_ in arms}
    for w in range(args.windows):
        for name, step, state, _n in arms:
            s = state
            for _ in range(3):
                s, m = step(s)
            int(m.n_active)  # hard sync (block_until_ready lies on the tunnel)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s, m = step(s)
            int(m.n_active)
            ms = (time.perf_counter() - t0) / args.steps * 1000
            best[name] = min(best[name], ms)
            print(f"  w{w} {name}: {ms:7.2f} ms/step")
    print("best of windows:")
    for name, *_ in arms:
        print(f"  {name}: {best[name]:7.2f} ms/step")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
