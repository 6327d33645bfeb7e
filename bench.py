"""Headline benchmark — the upstream TEASER++ bunny-demo problem shape:
1889 correspondences, 90% outliers (the reference's only published perf
anchor: 0.949 s solve, TEASER-plusplus/README.md:121-123; see BASELINE.md).

Runs the fused single-dispatch PSULVSB solver on the real TPU chip, checks
the solution is actually correct (RE < 5 deg, TE < 0.3 — the 3DMatch recall
criteria), and prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}

Outage resilience (the r3 lesson — one tunnel outage nulled the whole
round's artifact):
  - the backend probe RETRIES (default 10 attempts x ~150 s probe + 60 s
    sleep ~= 35 min) instead of failing on one attempt;
  - every measured section is flushed incrementally to BENCH_PARTIAL
    (default /tmp/bench_partial.json) the moment it lands;
  - each section is error-isolated — a tunnel abort mid-section records
    an `error_<section>` field and the bench continues;
  - protocol sections retry once after a 90 s backoff (observed tunnel
    aborts clear in ~90 s);
  - SIGTERM/SIGINT and fatal exceptions still emit the final JSON line
    with every completed field.

Extra fields:
  - batch{8,16,32,64}_pairs_per_s: one-chip batched throughput scaling
    (lax.map of fused solves per dispatch — the per-device shape of the
    sharded dataset sweep).
  - solve_5000corr_s / rot_err_5000_deg: the BASELINE.md north-star size.
  - realdata_{3dmatch,3dlomatch,kitti}_*: the real-data protocol at
    reference scale — 8 scenes x 30 pairs x best-of-ddtime=10 per dataset
    (240 pairs each, the reference's per-dataset scene count and retry
    count, teaser_cpp_ply_main.cc:244-795) — through the BATCHED harness
    (eval/batch_harness.py). 3DMatch runs the reference's real pair
    cardinality: mixed sizes around ~5000 corrs/pair (BASELINE.md: "~5k
    FPFH matches"), spanning three pad buckets (4096/6144/8192).
  - whu_tls_*: the WHU-TLS regime (noise bound 0.15, building scale —
    registration.cc:35), full scale (8 x 30 x ddtime 10).
  - realdata_3dmatch_unkscale_*: the reference's unknownScale mode
    (teaser_cpp_ply_main.cc:319) — random test scale in [1, 5) per pair,
    estimate_scaling=True, success additionally needs scale err <= 0.1 —
    full scale (8 x 30 x ddtime 10).
  - realscan_*: the reference's shipped REAL indoor scan pair
    (examples/teaser_python_fpfh_icp/data/cloud_bin_{0,4}.ply) through the
    native voxel->normals->FPFH->matcher->PSULVSB->ICP pipeline.
  - stage_wall_s_*: HOST-WALL per-stage attribution of the staged solver
    (relative attribution only — syncs serialize host and device).
  - device_ms_*: scan-amortized DEVICE time (K reps inside one jitted
    lax.scan with a carry data dependency, divided by K) — tunnel-RTT-free.
  - stage_bytes_*: XLA cost-analysis bytes-accessed per stage, with the
    implied per-stage HBM-bandwidth utilization — distinguishes
    bandwidth-bound stages from dispatch/overhead-bound ones.
  - flops_1889 / mxu_util_pct_1889: XLA cost-analysis FLOPs — a roofline
    position, not an achievement claim: the workload is top-k/sort/gather
    heavy, so low MXU share is expected.
"""

import json
import os
import shutil
import signal
import sys
import time

import jax

# Persistent compilation cache: the fused solver takes minutes to compile
# through the remote-compile tunnel; cache hits make repeat runs start fast.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from psulvsb_tpu.solver.config import SolverParams
from psulvsb_tpu.solver.fused import psulvsb_register
from psulvsb_tpu.solver.psulvsb import psulvsb_solve
from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair
from psulvsb_tpu.core.metrics import angular_error_deg

BASELINE_S = 0.949  # reference bunny demo solve time (BASELINE.md)
N_CORRS = 1889
OUTLIER_RATE = 0.9
# TPU v5e (v5 lite) peak: ~197 TFLOP/s bf16 / ~98.5 TFLOP/s fp32 MXU.
PEAK_FLOPS_BF16 = 197e12
# TPU v5e HBM bandwidth ~819 GB/s — the relevant roofline for this
# sort/top-k/gather-heavy workload (MXU share is structurally low).
PEAK_HBM_BPS = 819e9

# Caps last re-swept on-device 2026-08-19 (r5, after the triangle clique
# seed + per-retry time gate changed the round structure): (2048, 256, 4)
# still wins — hypothesis_batch 8/16 lose 15-45% on the hostile fixture
# even with the fused GNC kernel, basic_cap=512 loses ~20%, pool_cap is
# flat across 8k-32k. Full grid + interpretation: docs/CAP_SWEEP.md.
# Smaller basic sets + hypothesis batches shrink the per-round local-stage
# footprint; the lazy clique seed (clique_init="auto") covers the hostile
# tail that larger batches used to buy.
CAPS = dict(sampled_cap=2048, basic_cap=256, hypothesis_batch=4)
REALDATA_CAPS = dict(sampled_cap=2048, basic_cap=256, hypothesis_batch=4)

# The reference's 3DMatch pairs carry ~5k FPFH correspondences with
# pair-to-pair variance (BASELINE.md eval configs; SURVEY §2.3's C=5k).
# Mixed sizes on purpose: they exercise three pad buckets (4096/6144/8192,
# utils/padding.DEFAULT_PAD_BUCKETS) inside every scene sweep, mean 5000.
THREEDMATCH_CORRS = (3500, 5000, 6500)

PARTIAL_PATH = os.environ.get("BENCH_PARTIAL", "/tmp/bench_partial.json")

OUT: dict = {"metric": "bunny_1889corr_90pct_outliers_solve_time",
             "value": None, "unit": "s", "vs_baseline": None}


def _flush() -> None:
    """Persist the artifact-so-far. A crash/abort after this point cannot
    lose the fields already measured (VERDICT r3 #1: one tunnel outage
    wiped the whole round's evidence)."""
    try:
        with open(PARTIAL_PATH + ".tmp", "w") as f:
            # default=str: a stray numpy scalar in OUT must degrade to a
            # string, not raise out of the flush and kill the bench.
            json.dump(OUT, f, default=str)
        os.replace(PARTIAL_PATH + ".tmp", PARTIAL_PATH)
    except Exception:  # noqa: BLE001 — flushing must never take down main
        pass


def _emit_and_exit(signum=None, _frame=None):
    """Emit the final JSON line with whatever completed. Exit 0 iff the
    headline number landed (partial artifacts with a headline are still
    evidence; a missing headline is a failed capture)."""
    if signum is not None:
        OUT.setdefault("error", f"terminated by signal {signum}")
    _flush()
    print(json.dumps(OUT, default=str))
    sys.stdout.flush()
    sys.exit(0 if OUT.get("value") is not None else 1)


def section(name):
    """Run a section function; on failure record error_<name> and keep
    going. Every section flushes on completion."""

    def deco(fn):
        def run(*a, **kw):
            try:
                r = fn(*a, **kw)
                _flush()
                return r
            except Exception as e:  # noqa: BLE001 — diagnostic capture
                OUT[f"error_{name}"] = f"{type(e).__name__}: {e}"[:300]
                print(f"[bench] section {name} failed: {e}", file=sys.stderr)
                _flush()
                return None
        return run

    return deco


def measure_batched_throughput(params, n_pairs: int = 8) -> float:
    """Pairs/s for a batch of fused solves on one chip (lax.map inside one
    dispatch — the per-device shape of the sharded dataset sweep; no
    host/tunnel round-trips between pairs)."""
    from psulvsb_tpu.parallel.pairs import register_batch

    srcs, dsts = [], []
    base = jnp.asarray(synthetic_cloud(N_CORRS, seed=0))
    for i in range(n_pairs):
        p = make_synthetic_pair(
            jax.random.PRNGKey(i), base, noise_bound=0.05, outlier_rate=OUTLIER_RATE
        )
        srcs.append(p.src)
        dsts.append(p.dst)
    src_b = jnp.stack(srcs)
    dst_b = jnp.stack(dsts)
    keep_b = jnp.ones((n_pairs, N_CORRS), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), n_pairs)

    sols = register_batch(src_b, dst_b, keep_b, keys, params)
    _ = float(sols.scale[0])  # compile + sync
    best = float("inf")
    for i in range(3):
        keys = jax.random.split(jax.random.PRNGKey(100 + i), n_pairs)
        t0 = time.perf_counter()
        sols = register_batch(src_b, dst_b, keep_b, keys, params)
        _ = float(jnp.sum(sols.scale))
        best = min(best, time.perf_counter() - t0)
    return n_pairs / best


def stage_breakdown(pair, keep, params) -> dict:
    """Host-wall per-stage attribution via the staged solver with profile
    syncs. The syncs serialize host and device, so these are RELATIVE
    attribution numbers, not device time (see device_ms_* for that).
    Per-stage min over two runs drops tunnel hiccups."""
    psulvsb_solve(pair.src, pair.dst, keep, params, jax.random.PRNGKey(3),
                  profile=True)
    out: dict = {}
    for seed in (4, 5):
        _, info = psulvsb_solve(pair.src, pair.dst, keep, params,
                                jax.random.PRNGKey(seed), profile=True)
        for k, v in info["stage_s"].items():
            out[k] = min(out.get(k, v), v)
    return {k: round(v, 4) for k, v in out.items()}


def device_ms_fused(pair, keep, params, k: int = 48) -> float:
    """Scan-amortized device time of one fused solve (ms): K solves inside
    ONE jitted lax.scan with a carry data dependency (carry perturbs the
    input by 1e-9, each solve's scale feeds the carry), synced by a scalar
    readback, divided by K. Removes the ~25 ms/dispatch tunnel RTT that
    dominates wall-clock timings of single dispatches. K sets the
    measurement floor: the one RTT the dispatch still pays shows up as
    ~RTT/K per solve (measured directly as device_ms_noop) — r3 ran K=12
    (floor 2.2 ms, as large as most stages); K=48 puts the floor ~0.5 ms."""

    @jax.jit
    def scan_solve(src, dst, keep, key):
        def body(carry, i):
            s = psulvsb_register(
                src + carry * 1e-9, dst, keep, jax.random.fold_in(key, i), params
            )
            return carry + s.scale * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return c

    import numpy as np

    _ = np.asarray(scan_solve(pair.src, pair.dst, keep, jax.random.PRNGKey(0)))
    best = float("inf")
    for i in (1, 2):
        t0 = time.perf_counter()
        _ = np.asarray(scan_solve(pair.src, pair.dst, keep, jax.random.PRNGKey(i)))
        best = min(best, time.perf_counter() - t0)
    return round(best / k * 1000.0, 2)


def _stage_fns(pair, keep, params):
    """Bind the staged solver's five stages to representative inputs from
    one real staged pass; returns {name: (fn(src, key), out_leaf)}."""
    from psulvsb_tpu.solver.basic import WarmState
    from psulvsb_tpu.solver.config import RATE_SCHEDULE
    from psulvsb_tpu.solver.psulvsb import (
        HostState,
        _finalize_stage,
        _host_stage,
        _init_stage,
        _local_stage,
        _sample_stage,
    )

    src, dst = pair.src, pair.dst
    c = src.shape[1]
    dtype = src.dtype
    key = jax.random.PRNGKey(0)
    l_rate, b_rate = RATE_SCHEDULE[0]

    red_i, red_j, red_count, pool = _init_stage(src, dst, keep, params, key)
    n_red = int(jnp.sum(keep == 1))
    thr = jnp.asarray(params.pr_noise * (1.0 + n_red / c), dtype)
    s_i, s_j, s_ok, s_count, s_pts = _sample_stage(
        red_i, red_j, red_count, pool, jnp.asarray(l_rate, dtype), params, key, c
    )
    hs = HostState.initial(c, keep, dtype)
    warm = WarmState.initial(dtype)
    local = _local_stage(
        src, dst, s_i, s_j, s_ok, s_count, s_pts, jnp.asarray(b_rate, dtype),
        jnp.asarray(False), hs.host_r, warm, thr, params, key,
    )
    hs2, _nc, _tk = _host_stage(
        src, dst, hs, local.best, local.local_r, jnp.asarray(False), thr,
        params, key,
    )

    return {
        # Output leaves must consume EVERY expensive output: r3's init leaf
        # read only red_count, so XLA dead-code-eliminated the compaction
        # top-k (>half the stage) and init measured at the scan floor.
        "init": (
            lambda s, kk: _init_stage(s, dst, keep, params, kk),
            lambda o: (
                o[2].astype(jnp.float32)
                + jnp.sum(o[0]).astype(jnp.float32) * 1e-9
                + jnp.sum(o[1]).astype(jnp.float32) * 1e-9
                + o[3].astype(jnp.float32)
            ),
        ),
        "sample": (
            lambda s, kk: _sample_stage(
                red_i, red_j, red_count, pool,
                jnp.asarray(l_rate, dtype) + s[0, 0] * 1e-12, params, kk, c,
            ),
            lambda o: (
                o[3].astype(jnp.float32)
                + jnp.sum(o[0]).astype(jnp.float32) * 1e-9
                + jnp.sum(o[1]).astype(jnp.float32) * 1e-9
                + jnp.sum(o[4]).astype(jnp.float32)
            ),
        ),
        "local": (
            lambda s, kk: _local_stage(
                s, dst, s_i, s_j, s_ok, s_count, s_pts,
                jnp.asarray(b_rate, dtype), jnp.asarray(False), hs.host_r,
                warm, thr, params, kk,
            ),
            lambda o: o.best.scale,
        ),
        "host": (
            lambda s, kk: _host_stage(
                s, dst, hs, local.best, local.local_r, jnp.asarray(False),
                thr, params, kk,
            ),
            lambda o: o[0].best.scale,
        ),
        "finalize": (
            lambda s, kk: _finalize_stage(s, dst, hs2, local.best, params),
            lambda o: o[0][0, 0],
        ),
    }


def device_ms_stages(pair, stage_fns, k: int = 48) -> dict:
    """Scan-amortized device time per solver stage (ms): each stage is
    scanned K times with a carry perturbation on a float input and a
    carry contribution from its output, so XLA cannot hoist or elide the
    repeated work. Inputs are the stage's actual inputs from one real
    staged solve pass (stage_fns = _stage_fns(...), computed once by the
    caller — binding it runs the eager staged pass, which is device work
    worth not duplicating across consumers)."""
    import numpy as np

    src = pair.src
    key = jax.random.PRNGKey(0)

    def scan_of(fn, out_leaf):
        @jax.jit
        def scanned(src_in, key_in):
            def body(carry, i):
                out = fn(src_in + carry * 1e-9, jax.random.fold_in(key_in, i))
                return carry + out_leaf(out) * 1e-20, None

            cc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return cc

        _ = np.asarray(scanned(src, key))  # compile + warm
        best = float("inf")
        for i in (1, 2):
            t0 = time.perf_counter()
            _ = np.asarray(scanned(src, jax.random.PRNGKey(i)))
            best = min(best, time.perf_counter() - t0)
        return round(best / k * 1000.0, 2)

    return {name: scan_of(fn, leaf) for name, (fn, leaf) in stage_fns.items()}


def stage_bytes_accessed(pair, stage_fns) -> dict:
    """XLA cost-analysis bytes-accessed per solver stage (one compiled
    stage program each). Combined with device_ms_stage_* this separates
    bandwidth-bound stages (bytes/time near the HBM roofline) from
    dispatch/overhead-bound ones (VERDICT r3 #5)."""
    out = {}
    for name, (fn, _leaf) in stage_fns.items():
        try:
            compiled = (
                jax.jit(fn).lower(pair.src, jax.random.PRNGKey(0)).compile()
            )
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            out[name] = float(ca.get("bytes accessed", 0.0))
        except Exception:  # noqa: BLE001 — per-stage isolation
            out[name] = None
    return out


def _ensure_dataset(root, scenes, dataset, n_pairs, n_corr, seed,
                    outlier_mode="mismatch") -> None:
    """Generate the benchmark tree only when the existing one's recorded
    generation config doesn't match (generation is deterministic in these
    inputs). Keeping matching data across protocol retries is what lets
    run_benchmark_batched(resume=True) resume at the completed-scene
    boundary instead of re-running hours of solves after a tunnel abort;
    a config mismatch wipes root (results live under it too — stale data
    must not back resumed stats)."""
    from psulvsb_tpu.eval.make_dataset import write_benchmark

    cfg = {
        "dataset": dataset, "scenes": list(scenes),
        "n_pairs": n_pairs,
        "n_corr": list(n_corr) if isinstance(n_corr, tuple) else n_corr,
        "seed": seed,
        "outlier_mode": outlier_mode,
    }
    cfg_path = os.path.join(root, "gen_config.json")
    try:
        with open(cfg_path) as f:
            if json.load(f) == cfg:
                return
    except (OSError, ValueError):
        pass
    shutil.rmtree(root, ignore_errors=True)
    write_benchmark(
        root, scenes, dataset=dataset, n_pairs=n_pairs, n_corr=n_corr,
        seed=seed, outlier_mode=outlier_mode,
    )
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)


def realdata_benchmark(
    dataset: str,
    n_scenes: int = 8,
    n_pairs: int = 30,
    n_corr=1500,
    ddtime: int = 10,
    unknown_scale: bool = False,
    outlier_mode: str = "mismatch",
    certify: bool = False,
) -> dict:
    """Reference-scale real-data protocol through the batched harness:
    n_scenes x n_pairs pairs, best-of-ddtime, per-dataset success criteria
    (teaser_cpp_ply_main.cc:424, :714). No fallback retries of any kind —
    every solve is the plain fused PSULVSB program. Returns aggregate
    fields weighted over all scenes.

    unknown_scale=True is the reference's `unknownScale` mode
    (teaser_cpp_ply_main.cc:319): each pair's dst is stretched by a random
    test scale in [1, 5), estimate_scaling=True, and success additionally
    requires scale error <= 0.1 (criteria include max_scale_err)."""
    from psulvsb_tpu.eval.batch_harness import run_benchmark_batched

    root = (f"/tmp/psulvsb_bench_{dataset}_r5"
            + ("_us" if unknown_scale else "")
            + ("" if outlier_mode == "mismatch" else f"_{outlier_mode}"))
    out_dir = os.path.join(root, "_results")
    scenes = [f"scene{i}" for i in range(n_scenes)]
    _ensure_dataset(root, scenes, dataset, n_pairs, n_corr, seed=11,
                    outlier_mode=outlier_mode)

    es = dict(estimate_scaling=unknown_scale, **REALDATA_CAPS)
    if dataset == "kitti":
        params = SolverParams.preset_kitti(**es)
    elif dataset == "whu_tls":
        params = SolverParams.preset_whu_tls(**es)
    else:
        params = SolverParams.preset_3dmatch(**es)

    # Prime the chunk-shaped program before the timed sweep (the C++
    # reference has no compile step; the harness dedups warm keys, so this
    # costs nothing when an earlier dataset already compiled the program).
    from psulvsb_tpu.eval.batch_harness import warm_scene

    warm_scene(os.path.join(root, scenes[0]), params)

    # resume=True: within one bench run, a protocol retried after a tunnel
    # abort resumes at the completed-scene boundary (sidecar fingerprints
    # gate staleness; the timed wall then covers only the re-swept tail,
    # and resumed stats keep their own recorded timing).
    t0 = time.monotonic()
    summary = run_benchmark_batched(
        root, out_dir, dataset=dataset, scenes=scenes, params=params,
        ddtime=ddtime, unknown_scale=unknown_scale, resume=True,
        certify=certify,
    )
    wall = time.monotonic() - t0
    total = sum(s["pairs"] for s in summary.values())
    succ = sum(round(s["recall"] * s["pairs"]) for s in summary.values())
    # Throughput must cover only the scenes actually swept THIS call —
    # resumed scenes contribute stored stats but no wall time, so counting
    # them would inflate pairs/s arbitrarily.
    swept_pairs = sum(
        s["pairs"] for s in summary.values() if s.get("timing") != "resumed"
    )
    # Success-count-weighted error/time means: per-scene averages are over
    # that scene's successes only (0.0 when none), so a zero-success scene
    # must carry zero weight, not dilute the aggregate.
    w = [round(s["recall"] * s["pairs"]) for s in summary.values()]
    wsum = max(sum(w), 1)
    out = {
        "pairs": total,
        "ddtime": ddtime,
        "recall": round(succ / max(total, 1), 4),
        "avg_time_s": round(
            sum(wi * s["avg_time_s"] for wi, s in zip(w, summary.values()))
            / wsum, 4
        ),
        "avg_rot_err_deg": round(
            sum(
                wi * s["avg_angle_error_deg"]
                for wi, s in zip(w, summary.values())
            )
            / wsum, 4
        ),
        # Distinct conventions, both reported: pairs/s is end-to-end pair
        # throughput; solves/s counts every best-of-ddtime retry dispatched.
        "sweep_pairs_per_s": (
            round(swept_pairs / wall, 2) if wall > 0 and swept_pairs else None
        ),
        "sweep_solves_per_s": (
            round(swept_pairs * ddtime / wall, 2)
            if wall > 0 and swept_pairs else None
        ),
        "sweep_wall_s": round(wall, 1),
        "resumed_pairs": total - swept_pairs,
    }
    if certify:
        # Success-weighted certified fraction + mean gap (per-scene
        # certified_frac is over that scene's successes).
        out["certified_frac"] = round(
            sum(wi * s.get("certified_frac", 0.0)
                for wi, s in zip(w, summary.values())) / wsum, 4
        )
        gaps = [s["avg_cert_gap"] for s in summary.values()
                if s.get("avg_cert_gap") is not None]
        out["avg_cert_gap"] = (
            round(sum(gaps) / len(gaps), 8) if gaps else None
        )
    return out


def frontend_benchmark(n_scenes: int = 2, n_pairs: int = 60,
                       ddtime: int = 10) -> dict:
    """End-to-end front-end protocol (VERDICT r4 #3): raw structured scenes
    -> voxel/FPFH/mutual-NN (eval/frontend_protocol.py, the
    teaser_cpp_ply.cc:179-329 generator chain) -> batched harness under the
    KITTI success criteria. Every correspondence the solver sees was
    produced by the real descriptor front-end — wrong matches are spatially
    structured, not synthetic permutations. Measured regime: C ~ 1200-1700
    per pair, 97-98% outliers (33-67 true inliers)."""
    import json as _json

    from psulvsb_tpu.eval.batch_harness import (
        run_benchmark_batched, warm_scene,
    )
    from psulvsb_tpu.eval.frontend_protocol import (
        frontend_solver_params, write_frontend_benchmark,
    )

    root = "/tmp/psulvsb_bench_frontend_r5"
    out_dir = os.path.join(root, "_results")
    scenes = [f"scene{i}" for i in range(n_scenes)]
    cfg = {"scenes": scenes, "n_pairs": n_pairs, "seed": 11,
           "gen": "frontend-v1"}
    cfg_path = os.path.join(root, "gen_config.json")
    try:
        with open(cfg_path) as f:
            have = _json.load(f)
    except (OSError, ValueError):
        have = None
    if have != cfg:
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.monotonic()
        write_frontend_benchmark(root, scenes, n_pairs=n_pairs, seed=11)
        os.makedirs(root, exist_ok=True)
        with open(cfg_path, "w") as f:
            _json.dump(cfg, f)
        print(f"[bench] frontend dataset generated in "
              f"{time.monotonic() - t0:.0f} s", file=sys.stderr)

    params = frontend_solver_params(**REALDATA_CAPS)
    warm_scene(os.path.join(root, scenes[0]), params)
    t0 = time.monotonic()
    summary = run_benchmark_batched(
        root, out_dir, dataset="kitti", scenes=scenes, params=params,
        ddtime=ddtime, resume=True,
    )
    wall = time.monotonic() - t0
    total = sum(s["pairs"] for s in summary.values())
    succ = sum(round(s["recall"] * s["pairs"]) for s in summary.values())
    swept_pairs = sum(
        s["pairs"] for s in summary.values() if s.get("timing") != "resumed"
    )
    return {
        "pairs": total,
        "ddtime": ddtime,
        "recall": round(succ / max(total, 1), 4),
        "sweep_pairs_per_s": (
            round(swept_pairs / wall, 2) if wall > 0 and swept_pairs else None
        ),
        "sweep_wall_s": round(wall, 1),
        "resumed_pairs": total - swept_pairs,
    }


def realscan_benchmark(voxel: float = 0.05) -> dict:
    """The reference's shipped REAL indoor scan pair (3DMatch cloud_bin_0 /
    cloud_bin_4, examples/teaser_python_fpfh_icp/example.py) through the
    native pipeline: voxel -> normals -> FPFH -> mutual-NN match ->
    PSULVSB -> ICP. No ground-truth matrix ships with the pair; the
    reference example's own success signal is ICP convergence from the
    TEASER pose, reported here as icp_rmse / icp_fitness."""
    import numpy as np

    from psulvsb_tpu.eval.realscan import REALSCAN_PLYS, register_realscan

    t0 = time.monotonic()
    res = register_realscan(
        *REALSCAN_PLYS, voxel=voxel, caps=REALDATA_CAPS
    )
    wall = time.monotonic() - t0
    return {
        "n_down_src": res["n_down_src"],
        "n_down_dst": res["n_down_dst"],
        "n_corr": res["n_corr"],
        "solve_s": round(res["solve_s"], 4),
        "icp_rmse": round(res["icp_rmse"], 5),
        "icp_fitness": round(res["icp_fitness"], 4),
        "icp_iters": res["icp_iters"],
        "rot_vs_icp_deg": round(res["rot_vs_icp_deg"], 3),
        "pipeline_wall_s": round(wall, 1),
    }


def _probe_backend_once(timeout_s: int = 150) -> bool:
    """One probe attempt in a subprocess so a hang cannot leak into this
    process (the remote-TPU tunnel can go fully down — observed 1 h+
    outages where even jax.devices() hangs)."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jnp.ones((64,64)) @ jnp.ones((64,64)))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _probe_backend_retry() -> bool:
    """Probe with retries (VERDICT r3 #1a): outages observed in r3 lasted
    from ~90 s (aborts) to hours (tunnel fully down). Default budget:
    10 attempts x (150 s probe + 60 s sleep) ~= 35 min. Tunable via
    BENCH_PROBE_ATTEMPTS / BENCH_PROBE_SLEEP_S."""
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "10"))
    sleep_s = float(os.environ.get("BENCH_PROBE_SLEEP_S", "60"))
    for i in range(attempts):
        t0 = time.monotonic()
        if _probe_backend_once():
            print(f"[bench] backend up (probe attempt {i + 1})",
                  file=sys.stderr)
            return True
        print(
            f"[bench] probe attempt {i + 1}/{attempts} failed "
            f"({time.monotonic() - t0:.0f} s); retrying in {sleep_s:.0f} s",
            file=sys.stderr,
        )
        if i + 1 < attempts:
            time.sleep(sleep_s)
    return False


def main():
    n_repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    if not _probe_backend_retry():
        OUT["error"] = (
            "device backend unreachable (tunnel down?) — probe matmul did "
            "not complete within the retry budget"
        )
        _emit_and_exit()

    params = SolverParams.preset_artificial(**CAPS)
    src = jnp.asarray(synthetic_cloud(N_CORRS, seed=0))
    pair = make_synthetic_pair(
        jax.random.PRNGKey(1), src, noise_bound=0.05, outlier_rate=OUTLIER_RATE
    )
    keep = jnp.ones((N_CORRS,), jnp.int32)

    @section("headline")
    def s_headline():
        # Compile + correctness gate.
        sol = psulvsb_register(
            pair.src, pair.dst, keep, jax.random.PRNGKey(0), params
        )
        jax.block_until_ready(sol)
        re = float(angular_error_deg(pair.transform.rotation, sol.rotation))
        te = float(jnp.linalg.norm(sol.translation - pair.transform.translation))
        ok = bool(sol.valid) and re < 5.0 and te < 0.3

        times = []
        for i in range(n_repeat):
            k = jax.random.PRNGKey(100 + i)
            t0 = time.perf_counter()
            s = psulvsb_register(pair.src, pair.dst, keep, k, params)
            # Force a host readback: on the axon tunnel block_until_ready
            # alone does not reliably wait for remote completion.
            _ = float(s.translation[0]) + float(s.scale)
            times.append(time.perf_counter() - t0)
        times.sort()
        # Best-of: repeats differ only by tunnel/host jitter (same device
        # program); the baseline number is likewise a single clean run.
        OUT["value"] = round(times[0], 4)
        OUT["vs_baseline"] = round(BASELINE_S / times[0], 2)
        OUT["median_s"] = round(times[len(times) // 2], 4)
        OUT["correct"] = ok
        OUT["rot_err_deg"] = round(re, 4)
        OUT["trans_err"] = round(te, 4)
        OUT["device"] = str(jax.devices()[0])

    s_headline()

    @section("batch_scaling")
    def s_batch():
        # Single-chip batch scaling (VERDICT r3 #7, r4 #7): pairs/s at
        # 8..256 pairs per dispatch — the per-device shape of the sharded
        # sweep; 128/256 probe whether throughput is still rising past the
        # harness CHUNK of 64.
        for n in (8, 16, 32, 64, 128, 256):
            OUT[f"batch{n}_pairs_per_s"] = round(
                measure_batched_throughput(params, n_pairs=n), 2
            )
            _flush()

    s_batch()

    @section("north_star")
    def s_5000():
        # North-star size (BASELINE.md): 5000 correspondences, 90% outliers
        # — informational; no published reference number exists at this size
        # (the C++ implementation scales O(C^2)+ from 0.949 s at 1889).
        src5 = jnp.asarray(synthetic_cloud(5000, seed=0))
        pair5 = make_synthetic_pair(
            jax.random.PRNGKey(1), src5, noise_bound=0.01,
            outlier_rate=OUTLIER_RATE,
        )
        keep5 = jnp.ones((5000,), jnp.int32)
        s5 = psulvsb_register(
            pair5.src, pair5.dst, keep5, jax.random.PRNGKey(0), params
        )
        _ = float(s5.scale)
        t5 = []
        for i in range(3):
            t0 = time.perf_counter()
            s5 = psulvsb_register(
                pair5.src, pair5.dst, keep5, jax.random.PRNGKey(50 + i), params
            )
            _ = float(s5.translation[0])
            t5.append(time.perf_counter() - t0)
        OUT["solve_5000corr_s"] = round(min(t5), 4)
        OUT["rot_err_5000_deg"] = round(
            float(angular_error_deg(pair5.transform.rotation, s5.rotation)), 4
        )
        return pair5, keep5

    ns = s_5000()

    # Bind the staged solver's stages to representative inputs ONCE (the
    # binding itself runs an eager staged pass on the device); both the
    # device-time and the bytes-accessed sections consume the same dict.
    try:
        stage_fns = _stage_fns(pair, keep, params)
    except Exception as e:  # noqa: BLE001 — diagnostic capture
        stage_fns = None
        OUT["error_stage_bind"] = f"{type(e).__name__}: {e}"[:300]

    @section("device_time")
    def s_device():
        # Measurement floor of the scan-amortization methodology itself: a
        # near-trivial body (one multiply + reduction on the (3, C) input)
        # under the same scan/carry/fold_in harness. Per-stage numbers are
        # only meaningful above this floor — r3's suspiciously uniform
        # ~2.2-2.9 ms stages motivated recording it; measured 2.22 ms at
        # K=12 (= the one remaining tunnel RTT / K), hence K=48 here.
        import numpy as np

        k = 48

        @jax.jit
        def scan_noop(src_in, key_in):
            def body(carry, i):
                x = src_in + carry * 1e-9
                return carry + jnp.sum(x) * 1e-20, None

            cc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
            return cc

        _ = np.asarray(scan_noop(pair.src, jax.random.PRNGKey(0)))
        best = float("inf")
        for i in (1, 2):
            t0 = time.perf_counter()
            _ = np.asarray(scan_noop(pair.src, jax.random.PRNGKey(i)))
            best = min(best, time.perf_counter() - t0)
        OUT["device_ms_noop"] = round(best / k * 1000.0, 3)

        # Device-time attribution (scan-amortized; VERDICT r2 #6).
        OUT["device_ms_solve_1889"] = device_ms_fused(pair, keep, params)
        _flush()
        if ns is not None:
            pair5, keep5 = ns
            OUT["device_ms_solve_5000"] = device_ms_fused(pair5, keep5, params)
            _flush()
        if stage_fns is not None:
            OUT["device_ms_stage_1889"] = device_ms_stages(pair, stage_fns)

    s_device()

    @section("stage_roofline")
    def s_stage_roofline():
        # Per-stage bytes accessed + implied HBM-BW utilization (VERDICT r3
        # #5): which stages sit near the bandwidth roofline vs which are
        # overhead-bound and therefore fusable/shrinkable.
        if stage_fns is None:
            return
        sb = stage_bytes_accessed(pair, stage_fns)
        OUT["stage_bytes_1889"] = sb
        dms = OUT.get("device_ms_stage_1889") or {}
        OUT["stage_hbm_bw_util_pct_1889"] = {
            k: (
                round(100.0 * b / (dms[k] / 1e3) / PEAK_HBM_BPS, 1)
                if b and dms.get(k) else None
            )
            for k, b in sb.items()
        }

    s_stage_roofline()

    @section("host_wall_stages")
    def s_wall():
        OUT["stage_wall_s_1889"] = stage_breakdown(pair, keep, params)
        if ns is not None:
            pair5, keep5 = ns
            OUT["stage_wall_s_5000"] = stage_breakdown(pair5, keep5, params)

    s_wall()

    @section("cost_analysis")
    def s_cost():
        # Roofline position of the fused program. MXU utilization uses
        # FLOPs; HBM-bandwidth utilization uses XLA's "bytes accessed" over
        # the scan-amortized device time (the honest denominator — wall
        # time includes ~25 ms tunnel RTT).
        #
        # XLA cost analysis counts BOTH sides of every lax.cond — including
        # the lazy clique-seed branch AND the escalated-round clique stage,
        # whose diag(A^3) triangle ordering is two (C, C) matmuls
        # (~13.5 GFLOP at 1889) that the easy anchor never executes (it
        # converges in round 1 without escalating; its measured device time
        # is unchanged with the branches compiled in). The headline
        # roofline fields therefore use the program with both clique
        # branches structurally absent (clique_init="off" +
        # InlierSelectionMode.NONE) — the anchor's EXECUTED path — and the
        # with-branch statics are reported alongside.
        from psulvsb_tpu.solver.config import InlierSelectionMode

        def cost(p):
            compiled = (
                jax.jit(psulvsb_register, static_argnames=("params",))
                .lower(pair.src, pair.dst, keep, jax.random.PRNGKey(0), p)
                .compile()
            )
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return (float(ca.get("flops", 0.0)) or None,
                    float(ca.get("bytes accessed", 0.0)) or None)

        import dataclasses as _dc
        flops, bytes_acc = cost(_dc.replace(
            params, clique_init="off",
            inlier_selection_mode=InlierSelectionMode.NONE,
        ))
        flops_b, bytes_b = cost(params)
        dev_ms = OUT.get("device_ms_solve_1889")
        OUT["fused_flops_1889"] = flops
        OUT["fused_bytes_accessed_1889"] = bytes_acc
        OUT["fused_flops_1889_with_seed_branch"] = flops_b
        OUT["fused_bytes_accessed_1889_with_seed_branch"] = bytes_b
        OUT["mxu_util_pct_1889"] = (
            round(100.0 * flops / (dev_ms / 1e3) / PEAK_FLOPS_BF16, 3)
            if flops and dev_ms else None
        )
        OUT["hbm_bw_util_pct_1889"] = (
            round(100.0 * bytes_acc / (dev_ms / 1e3) / PEAK_HBM_BPS, 2)
            if bytes_acc and dev_ms else None
        )

    s_cost()

    @section("realscan")
    def s_realscan():
        rs = realscan_benchmark()
        for k2, v in rs.items():
            OUT[f"realscan_{k2}"] = v

    s_realscan()

    # Reference-scale real-data protocols (VERDICT r2 #1, r3 #4/#6): 240
    # pairs/dataset, best-of-10, batched harness, no fallback retries.
    # Each protocol is error-isolated AND retried once after a 90 s backoff
    # (observed tunnel aborts clear in ~90 s); results flush as they land.
    def protocol(name, *args, **kw):
        last_err = None
        for attempt in range(2):
            try:
                rd = realdata_benchmark(*args, **kw)
                for k2, v in rd.items():
                    OUT[f"realdata_{name}_{k2}"] = v
                _flush()
                return
            except Exception as e:  # noqa: BLE001 — diagnostic capture
                last_err = f"{type(e).__name__}: {e}"[:300]
                print(
                    f"[bench] protocol {name} attempt {attempt + 1} failed:"
                    f" {last_err}", file=sys.stderr,
                )
                if attempt == 0:
                    time.sleep(90)
        OUT[f"realdata_{name}_error"] = last_err
        _flush()

    # 3DMatch at the reference's real pair cardinality (~5k, mixed sizes
    # across three pad buckets — VERDICT r3 #4). certify=True: every
    # winning solve is DRS-certified (certification.cc:20-190 as a
    # first-class post-solve step, VERDICT r4 #5) — the protocol reports
    # certified_frac + avg_cert_gap.
    protocol("3dmatch", "3dmatch", n_corr=THREEDMATCH_CORRS, certify=True)
    protocol("3dlomatch", "3dlomatch")
    protocol("kitti", "kitti")
    # WHU-TLS regime at FULL scale (VERDICT r3 #6): 8 x 30 x ddtime 10.
    protocol("whu_tls", "whu_tls")
    # unknownScale mode (teaser_cpp_ply_main.cc:319) at FULL scale.
    protocol("3dmatch_unkscale", "3dmatch", unknown_scale=True)
    # Colluding clustered outliers (VERDICT r4 #3): repeated-geometry style
    # decoy-rigid outlier groups that uniform mismatch can never produce.
    protocol("3dmatch_clustered", "3dmatch", n_corr=THREEDMATCH_CORRS,
             outlier_mode="clustered")

    # End-to-end front-end protocol (VERDICT r4 #3): real FPFH matches.
    def s_frontend():
        last_err = None
        for attempt in range(2):
            try:
                fe = frontend_benchmark()
                for k2, v in fe.items():
                    OUT[f"frontend_e2e_{k2}"] = v
                _flush()
                return
            except Exception as e:  # noqa: BLE001 — diagnostic capture
                last_err = f"{type(e).__name__}: {e}"[:300]
                print(f"[bench] frontend_e2e attempt {attempt + 1} failed:"
                      f" {last_err}", file=sys.stderr)
                if attempt == 0:
                    time.sleep(90)
        OUT["frontend_e2e_error"] = last_err
        _flush()

    s_frontend()

    _emit_and_exit()


if __name__ == "__main__":
    main()
