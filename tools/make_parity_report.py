"""Generate the per-round parity artifact (PARITY_r{N}.json).

Runs the reference-asset parity harness (tools/parity_reference.py) at a
heavier setting than the test suite and records max/mean cmd_vel deltas vs
the C++-math oracle plus global-field parity — the committed evidence for
BASELINE.md's behavior-parity row.

Usage: python tools/make_parity_report.py [--round 2] [--ticks 10]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--ticks", type=int, default=10)
    ap.add_argument("--obstacles", type=int, default=64)
    ap.add_argument("--dynamic-phase-len", type=int, default=35,
                    help="ticks per toggling-wall phase (0 = skip)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from tools import parity_reference as pr

    if not pr.assets_available():
        print(json.dumps({"error": "reference assets not mounted"}))
        return 1

    ctx = pr.load_context()
    pairs = pr.pick_start_goal_pairs(ctx, args.pairs, seed=0)

    field = []
    all_rows = []
    plans_ok = 0
    for start, goal in pairs:
        r = pr.global_field_parity(ctx, goal)
        field.append({"goal": goal, "max_abs_diff": r["max_abs_diff"],
                      "same_support": r["same_support"],
                      "reachable": r["reachable"], "iters": r["iters"]})
        pq = pr.plan_real_path(ctx, start, goal)
        if pq is None:
            continue
        plans_ok += 1
        rows = pr.cmdvel_parity(ctx, pq[0], pq[1], n_ticks=args.ticks,
                                n_obstacles=args.obstacles)
        all_rows.extend(rows)

    d_vx = np.array([r["d_vx"] for r in all_rows]) if all_rows else np.zeros(1)
    d_wz = np.array([r["d_wz"] for r in all_rows]) if all_rows else np.zeros(1)
    d_cost = np.array([r["d_cost"] for r in all_rows]) if all_rows else np.zeros(1)
    report = {
        "round": args.round,
        "assets": {
            "ground_pcd": pr.GROUND_PCD, "map_pcd": pr.MAP_PCD,
            "config": pr.CANON_YAML,
            "ground_points": int(len(ctx.ground)),
            "map_points": int(len(ctx.map_pts)),
        },
        "global_field_parity": field,
        "cmdvel_parity": {
            "pairs_planned": plans_ok,
            "ticks": len(all_rows),
            "found_all": bool(all(r["found"] for r in all_rows)),
            "max_d_vx": float(d_vx.max()),
            "mean_d_vx": float(d_vx.mean()),
            "max_d_wz": float(d_wz.max()),
            "mean_d_wz": float(d_wz.mean()),
            "max_d_cost": float(d_cost.max()),
        },
    }
    if args.dynamic_phase_len > 0:
        dyn = pr.dynamic_wall_parity(ctx, phase_len=args.dynamic_phase_len)
        dyn.pop("rows")
        report["dynamic_scene_parity"] = {
            "description": ("toggling-wall + forced-recovery sequence on "
                            "the real map: per-phase max deltas vs the "
                            "C++-math marking/local-planner/FSM oracles"),
            **dyn,
        }
    out = f"PARITY_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["cmdvel_parity"]))
    print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
