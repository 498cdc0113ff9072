"""2D occupancy → synthetic 3D map clouds — the TPU framework's
equivalent of `global_planner/utils/occupancy2ground.cpp:60-250`, which
lets the 3D stack run on plain 2D maps (e.g. `data/warehouse.pgm`).

Free cells become ground points on z=0; occupied cells become extruded
wall columns. Includes a minimal PGM (P2/P5) reader for ROS map_server
artifacts.
"""
from __future__ import annotations

import numpy as np


def read_pgm(path: str):
    """Read a P2/P5 PGM → (H, W) uint8."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic not in (b"P2", b"P5"):
            raise ValueError(f"not a PGM: {magic!r}")

        def next_token():
            tok = b""
            while True:
                c = f.read(1)
                if not c:
                    raise ValueError("truncated PGM header")
                if c.isspace():
                    if tok:
                        return tok
                    continue
                if c == b"#":
                    f.readline()
                    continue
                tok += c

        w = int(next_token())
        h = int(next_token())
        maxval = int(next_token())
        if magic == b"P5":
            data = np.frombuffer(f.read(w * h), np.uint8, count=w * h)
        else:
            data = np.loadtxt(f, dtype=np.int64).reshape(-1)[: w * h]
        img = data.reshape(h, w).astype(np.float32) / maxval * 255
        return img.astype(np.uint8)


def occupancy_to_clouds(grid: np.ndarray, resolution: float = 0.05,
                        origin=(0.0, 0.0), occupied_thresh: float = 0.65,
                        free_thresh: float = 0.196, wall_height: float = 1.5,
                        wall_step: float = 0.25, negate: bool = False):
    """Occupancy image (map_server convention: white=free, black=occupied)
    → (ground_pts (Gf, 3), wall_pts (W, 3)).

    Matches the reference util's output contract: `mapground` = one point
    per free cell at z=0, `mapcloud` = occupied cells extruded into
    columns so the 3D perception/planner stack treats walls as lethal.
    """
    img = grid.astype(np.float32) / 255.0
    occ_p = img if negate else 1.0 - img        # occupancy probability
    h, w = occ_p.shape
    ys, xs = np.mgrid[0:h, 0:w]
    # map_server: row 0 is the TOP of the map; world y grows upward
    wx = origin[0] + (xs + 0.5) * resolution
    wy = origin[1] + (h - 1 - ys + 0.5) * resolution

    free = occ_p < free_thresh
    occ = occ_p > occupied_thresh
    ground = np.stack([wx[free], wy[free], np.zeros(int(free.sum()))],
                      axis=1).astype(np.float32)
    zs = np.arange(0.0, wall_height + 1e-6, wall_step, dtype=np.float32)
    ox, oy = wx[occ], wy[occ]
    wall = np.concatenate([
        np.stack([ox, oy, np.full_like(ox, z)], axis=1) for z in zs
    ]).astype(np.float32) if len(ox) else np.zeros((0, 3), np.float32)
    return ground, wall
