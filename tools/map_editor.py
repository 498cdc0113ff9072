"""Map-cloud editor: region selection, delete/keep, undo, save.

The reference's rviz map-editor vertical — the selection tools in
`dddmr_rviz_default_plugins` publishing into
`/point_cloud_selection/panel_command` and the Qt panel's
clear/last-step/save buttons (`map_editor_panel.cpp:16-101`) — lets an
operator strip dynamic artifacts from a mapped cloud and save the result.
This is the ROS-free equivalent: a selection set over the cloud with an
undo stack, box/radius/z-band selectors, delete/keep operations, and
reference-format PCD export. Scriptable, and usable from a notebook
alongside the live viewer.

CLI:  python tools/map_editor.py in.pcd out.pcd --delete-box x0 y0 z0 x1 y1 z1
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class MapEditor:
    """Edit an (N, F) point cloud with selection + undo semantics."""

    def __init__(self, points: np.ndarray):
        self.points = np.asarray(points, np.float32)
        self.selected = np.zeros(len(self.points), bool)
        self._undo: list = []

    # -- selection (the rviz selection tools' role) ----------------------
    def select_box(self, lo, hi, add: bool = True):
        lo = np.asarray(lo, np.float32)
        hi = np.asarray(hi, np.float32)
        m = np.all((self.points[:, :3] >= lo) & (self.points[:, :3] <= hi),
                   axis=1)
        self.selected = (self.selected | m) if add else (self.selected & ~m)
        return int(m.sum())

    def select_radius(self, center, radius: float, add: bool = True):
        d = np.linalg.norm(self.points[:, :3] - np.asarray(center,
                                                          np.float32), axis=1)
        m = d <= radius
        self.selected = (self.selected | m) if add else (self.selected & ~m)
        return int(m.sum())

    def select_z_band(self, z_min: float, z_max: float, add: bool = True):
        m = (self.points[:, 2] >= z_min) & (self.points[:, 2] <= z_max)
        self.selected = (self.selected | m) if add else (self.selected & ~m)
        return int(m.sum())

    def clear_selection(self):
        """panel 'Clear selection'."""
        self.selected[:] = False

    # -- operations (undoable) -------------------------------------------
    def _push(self):
        self._undo.append((self.points.copy(), self.selected.copy()))
        if len(self._undo) > 20:
            self._undo.pop(0)

    def delete_selected(self) -> int:
        """Remove the selected points (strip dynamic artifacts)."""
        self._push()
        n = int(self.selected.sum())
        keep = ~self.selected
        self.points = self.points[keep]
        self.selected = np.zeros(len(self.points), bool)
        return n

    def keep_only_selected(self) -> int:
        """panel 'save selected' semantics: crop to the selection."""
        self._push()
        n = int(self.selected.sum())
        self.points = self.points[self.selected]
        self.selected = np.zeros(len(self.points), bool)
        return n

    def undo(self) -> bool:
        """panel 'Last step'."""
        if not self._undo:
            return False
        self.points, self.selected = self._undo.pop()
        return True

    # -- IO ----------------------------------------------------------------
    def save(self, path: str, compressed: bool = False):
        from dddmr_navigation_tpu.io.pcd import write_pcd
        fields = ("x", "y", "z", "intensity")[: self.points.shape[1]]
        write_pcd(path, self.points, fields=fields, compressed=compressed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--delete-box", nargs=6, type=float, action="append",
                    default=[], metavar=("X0", "Y0", "Z0", "X1", "Y1", "Z1"))
    ap.add_argument("--delete-radius", nargs=4, type=float, action="append",
                    default=[], metavar=("X", "Y", "Z", "R"))
    ap.add_argument("--compressed", action="store_true")
    args = ap.parse_args()

    from dddmr_navigation_tpu.io.pcd import read_pcd
    ed = MapEditor(read_pcd(args.input))
    n0 = len(ed.points)
    for box in args.delete_box:
        ed.select_box(box[:3], box[3:])
        ed.delete_selected()
    for cx, cy, cz, r in args.delete_radius:
        ed.select_radius([cx, cy, cz], r)
        ed.delete_selected()
    ed.save(args.output, compressed=args.compressed)
    print(f"{args.input}: {n0} -> {len(ed.points)} points -> {args.output}")


if __name__ == "__main__":
    main()
