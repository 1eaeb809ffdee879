"""Golden determinism — the reference's md5-comparison style
(testing/peopleremover/CMakeLists.txt:1-33 runs the full binary and
md5-compares every output file against committed hashes.txt).

The reference itself is not bit-stable across machines (OpenMP
scheduling + rand() reductions, SURVEY §7 hard-part 4), and XLA codegen
differs across backends, so the portable contract is: the SAME pipeline
run twice in the same environment must produce BYTE-IDENTICAL outputs
(.frames + exported points).  Fixed seeds everywhere; any
nondeterministic reduction or unseeded RNG in the stack breaks this.
"""

import hashlib
import os

import numpy as np

from tpu3dtk.core.scan import TPUScan
from tpu3dtk.io import frames as frames_io
from tpu3dtk.io.writer import write_uos
from tpu3dtk.models.graphslam import LumParams, do_graph_slam
from tpu3dtk.models.icp import IcpParams
from tpu3dtk.models.sequence import SequenceRegistration


def _md5(path):
    return hashlib.md5(open(path, "rb").read()).hexdigest()


def _run_once(dat_dir, out_dir, seed_subsample):
    from tpu3dtk.io.scandir import PointFilter, read_scan_dir

    scans = []
    for raw in read_scan_dir(
        dat_dir, format="uos", point_filter=PointFilter(range_max=500.0)
    ):
        s = TPUScan.from_raw(raw)
        s.set_reduction(10.2, 1)
        scans.append(s)
    reg = SequenceRegistration(
        params=IcpParams(
            max_dist_match2=625.0,
            max_iterations=30,
            epsilon=1e-6,
            subsample=seed_subsample,
        ),
        metascan=True,
    )
    reg.run(scans)
    links = np.array([(0, 1), (1, 2), (0, 2)], np.int32)
    do_graph_slam(
        scans, links, LumParams(max_dist_match2=625.0, iterations=10, epsilon=1e-4)
    )
    os.makedirs(out_dir, exist_ok=True)
    hashes = {}
    for s in scans:
        fp = frames_io.frames_path(out_dir, s.identifier)
        mats = np.stack([m for m, _ in s.frames])
        frames_io.write_frames(fp, mats, [t for _, t in s.frames])
        hashes[os.path.basename(fp)] = _md5(fp)
    # exported registered points (exportPoints role)
    pts_path = os.path.join(out_dir, "points.pts")
    allpts = np.concatenate(
        [
            np.asarray(s.reduced_local()) @ s.transMat[:3, :3].T.astype(np.float32)
            + s.transMat[:3, 3].astype(np.float32)
            for s in scans
        ]
    )
    write_uos(pts_path, allpts)
    hashes["points.pts"] = _md5(pts_path)
    return hashes


def test_pipeline_bit_determinism(dat_dir, tmp_path):
    h1 = _run_once(dat_dir, str(tmp_path / "run1"), seed_subsample=2)
    h2 = _run_once(dat_dir, str(tmp_path / "run2"), seed_subsample=2)
    assert h1 == h2, f"outputs differ between identical runs:\n{h1}\n{h2}"
    assert len(h1) == 4  # 3 frames + points
