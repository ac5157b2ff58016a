#!/usr/bin/env python
"""Analyze a diagnostic log (the JSON the headless runner exports, same
schema as the reference's logs/<ts>_log.json).

    python scripts/analyze_log.py logs/2026-*.json [--plot out.png]

Prints evacuation/throughput statistics; optionally renders the population
and step-time curves.
"""

from __future__ import annotations

import argparse
import json
import sys


def analyze(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    sm = d["step_metrics"]
    counts = sm["active_ped_count"]
    times = sm["time_calc_state"]
    total = d["total_steps"]

    out = {
        "path": path,
        "model": d.get("model", ""),
        "scenario": d.get("scenario", ""),
        "total_steps": total,
        "time_calc_field_s": d.get("preprocess_metrics", {}).get("time_calc_field"),
        "peak_agents": max(counts) if counts else 0,
        "final_agents": counts[-1] if counts else 0,
        "mean_step_ms": 1e3 * sum(times) / max(len(times), 1),
        "agent_steps_per_sec": (
            sum(counts) / sum(times) if times and sum(times) > 0 else 0.0
        ),
    }
    # --profile runs populate the kernel/spawn slots every 100 steps
    # (Simulator.measure_kernel_time / measure_spawn_time); report the
    # sampled means when present.
    kern = [t for t in sm.get("time_calc_state_kernel") or [] if t]
    if kern:
        out["mean_kernel_ms"] = 1e3 * sum(kern) / len(kern)
    spawn = [t for t in sm.get("time_spawn") or [] if t]
    if spawn:
        out["mean_spawn_ms"] = 1e3 * sum(spawn) / len(spawn)
    # Evacuation time: first step where the population hits zero after its peak.
    if counts and max(counts) > 0:
        peak_i = counts.index(max(counts))
        for i in range(peak_i, len(counts)):
            if counts[i] == 0:
                out["evacuation_step"] = i + 1
                break
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--plot", default=None, help="write population/step-time plot")
    args = ap.parse_args()

    results = [analyze(p) for p in args.logs]
    for r in results:
        print(json.dumps(r))

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 6), sharex=True)
        for p in args.logs:
            with open(p) as f:
                d = json.load(f)
            sm = d["step_metrics"]
            ax1.plot(sm["active_ped_count"], label=p.rsplit("/", 1)[-1])
            ax2.plot([1e3 * t for t in sm["time_calc_state"]])
        ax1.set_ylabel("active agents")
        ax1.legend(fontsize=7)
        ax2.set_ylabel("step time (ms)")
        ax2.set_xlabel("step")
        fig.savefig(args.plot, dpi=110, bbox_inches="tight")
        print(f"# wrote {args.plot}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
