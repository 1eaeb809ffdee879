"""``tpuconvert`` — trajectory/pose format conversions and evaluation,
covering the reference converter binaries (frames2pose, pose2frames,
frames2kitti, kitti2pose, frames2tum, trajectoryLength,
match_with_ground_truth; SURVEY §2.1)."""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpuconvert")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("frames2pose")
    s.add_argument("dir")
    s.add_argument("-o", "--out", default=None)

    s = sub.add_parser("pose2frames")
    s.add_argument("dir")
    s.add_argument("-o", "--out", default=None)

    s = sub.add_parser("frames2kitti")
    s.add_argument("dir")
    s.add_argument("-o", "--out", default="trajectory.kitti")

    s = sub.add_parser("kitti2pose")
    s.add_argument("kitti_file")
    s.add_argument("-o", "--out", default=".")

    s = sub.add_parser("frames2tum")
    s.add_argument("dir")
    s.add_argument("-o", "--out", default="trajectory.tum")

    s = sub.add_parser("trajectorylength")
    s.add_argument("dir")

    s = sub.add_parser("ate", help="absolute trajectory error between two .frames dirs")
    s.add_argument("dir_a")
    s.add_argument("dir_b")
    s.add_argument("--no-align", action="store_true")

    args = p.parse_args(argv)
    from ..io import converters as cv

    if args.cmd == "frames2pose":
        print(f"{cv.frames_to_pose(args.dir, args.out)} pose files written")
    elif args.cmd == "pose2frames":
        print(f"{cv.pose_to_frames(args.dir, args.out)} frames files written")
    elif args.cmd == "frames2kitti":
        print(f"{cv.frames_to_kitti(args.dir, args.out)} poses -> {args.out}")
    elif args.cmd == "kitti2pose":
        print(f"{cv.kitti_to_poses(args.kitti_file, args.out)} pose files -> {args.out}")
    elif args.cmd == "frames2tum":
        print(f"{cv.frames_to_tum(args.dir, args.out)} poses -> {args.out}")
    elif args.cmd == "trajectorylength":
        print(f"trajectory length: {cv.trajectory_length(args.dir):.2f} cm")
    elif args.cmd == "ate":
        print(json.dumps(cv.ate(args.dir_a, args.dir_b, align=not args.no_align)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
