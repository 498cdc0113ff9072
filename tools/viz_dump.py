"""Render navigation debug dumps to PNGs — the observability surface the
reference provides through rviz visualization topics (SURVEY.md §5:
per-layer dGraph clouds, trajectory PoseArrays, weighted ground,
particles; `dddmr_rviz_tools` panels render them interactively).

Headless equivalent: `DebugDumper` npz rings (`runtime/tracing.py`) plus
any (ground, dgraph, plan, rollouts, particles) arrays render to a
top-down map figure.

Usage:
  python tools/viz_dump.py DUMP_DIR [-o out_dir]     # render a dump ring
  python tools/viz_dump.py --demo [-o out_dir]       # self-test figure
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_frame(out_path: str, *, ground=None, dgraph=None, plan=None,
                 prune=None, rollouts=None, best_rollout=None, robot=None,
                 obstacles=None, particles=None, lethal=None,
                 inscribed_radius: float = 0.5, title: str = ""):
    """Top-down rendering of one navigation tick's state."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 7))
    if ground is not None:
        ground = np.asarray(ground)
        if dgraph is not None:
            dg = np.clip(np.asarray(dgraph), 0.0, 3.0)
            sc = ax.scatter(ground[:, 0], ground[:, 1], c=dg, s=3,
                            cmap="RdYlGn", vmin=0.0, vmax=3.0)
            fig.colorbar(sc, ax=ax, label="dGraph distance-to-lethal (m)")
        else:
            ax.scatter(ground[:, 0], ground[:, 1], c="0.85", s=3)
    if lethal is not None and len(lethal):
        lethal = np.asarray(lethal)
        ax.scatter(lethal[:, 0], lethal[:, 1], c="k", marker="x", s=14,
                   label="lethal")
    if obstacles is not None and len(obstacles):
        obstacles = np.asarray(obstacles)
        ax.scatter(obstacles[:, 0], obstacles[:, 1], c="tab:red", s=5,
                   label="observation")
    if rollouts is not None:
        r = np.asarray(rollouts)        # (S, T, 3) rollout positions
        step = max(1, len(r) // 40)
        for tr in r[::step]:
            ax.plot(tr[:, 0], tr[:, 1], color="tab:blue", alpha=0.15, lw=0.7)
    if best_rollout is not None:
        br = np.asarray(best_rollout)
        ax.plot(br[:, 0], br[:, 1], color="tab:blue", lw=2.2,
                label="best rollout")
    if plan is not None and len(plan):
        plan = np.asarray(plan)
        ax.plot(plan[:, 0], plan[:, 1], color="tab:purple", lw=1.6,
                label="global plan")
    if prune is not None and len(prune):
        prune = np.asarray(prune)
        ax.plot(prune[:, 0], prune[:, 1], color="tab:orange", lw=2.0,
                label="prune plan")
    if particles is not None and len(particles):
        particles = np.asarray(particles)
        ax.scatter(particles[:, 0], particles[:, 1], c="tab:cyan", s=4,
                   alpha=0.5, label="particles")
    if robot is not None:
        robot = np.asarray(robot)
        ax.add_patch(plt.Circle((robot[0], robot[1]), inscribed_radius,
                                fill=False, color="k", lw=1.5))
        ax.plot([robot[0]], [robot[1]], "k^", ms=8, label="robot")
    ax.set_aspect("equal")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    if title:
        ax.set_title(title)
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def render_dump_dir(dump_dir: str, out_dir: str) -> list:
    """Render every DebugDumper npz in a ring directory. Arrays are
    matched by name to render_frame kwargs; unknown names are ignored."""
    os.makedirs(out_dir, exist_ok=True)
    known = {"ground", "dgraph", "plan", "prune", "rollouts", "best_rollout",
             "robot", "obstacles", "particles", "lethal"}
    outs = []
    for path in sorted(glob.glob(os.path.join(dump_dir, "tick_*.npz"))):
        with np.load(path) as data:
            kw = {k: data[k] for k in data.files if k in known}
        name = os.path.splitext(os.path.basename(path))[0]
        outs.append(render_frame(
            os.path.join(out_dir, name + ".png"), title=name, **kw))
    return outs


def _demo(out_dir: str):
    from dddmr_navigation_tpu.io import flat_ground_map
    ground = flat_ground_map(10, 6, 0.25)
    d = np.linalg.norm(ground[:, :2] - [1.0, 0.5], axis=1)
    dgraph = np.where(d < 1.5, d, 9999.0)
    xs = np.linspace(-4, 4, 60)
    plan = np.stack([xs, 0.5 * np.sin(xs), np.zeros_like(xs)], 1)
    os.makedirs(out_dir, exist_ok=True)
    p = render_frame(os.path.join(out_dir, "demo.png"), ground=ground,
                     dgraph=dgraph, plan=plan, robot=[-3.0, 0.2, 0.0],
                     title="viz_dump demo")
    print(f"wrote {p}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump_dir", nargs="?")
    ap.add_argument("-o", "--out", default="/tmp/dddmr_viz")
    ap.add_argument("--demo", action="store_true")
    args = ap.parse_args()
    if args.demo or not args.dump_dir:
        _demo(args.out)
        return 0
    outs = render_dump_dir(args.dump_dir, args.out)
    print(f"rendered {len(outs)} frames into {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
