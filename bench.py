"""Headline benchmark — the upstream TEASER++ bunny-demo problem shape:
1889 correspondences, 90% outliers (the reference's only published perf
anchor: 0.949 s solve, TEASER-plusplus/README.md:121-123; see BASELINE.md).

Runs the fused single-dispatch PSULVSB solver on the real TPU chip, checks
the solution is actually correct (RE < 5 deg, TE < 0.3 — the 3DMatch recall
criteria), and prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup, ...}

Extra fields:
  - batch8_pairs_per_s: one-chip batched throughput (lax.map of fused solves)
  - solve_5000corr_s / rot_err_5000_deg: the BASELINE.md north-star size
  - realdata_{3dmatch,kitti}_recall/avg_time_s: the real-data harness
    (eval/realdata.py, success criteria of teaser_cpp_ply_main.cc:424,714)
    run end-to-end on generated reference-format scenes (eval/make_dataset.py:
    1500-corr pairs, mismatch outliers 60-95%, hostile rotations)
  - stage_s_1889 / stage_s_5000: per-stage wall-clock attribution of the
    staged solver (init / sample / local / host / self_update / finalize),
    profiled with per-stage device syncs
  - flops_1889 / mxu_util_pct_1889: XLA cost-analysis FLOPs of the fused
    program and measured FLOP/s as a % of the chip's bf16 peak — a roofline
    position, not an achievement claim: the workload is top-k/sort/gather
    heavy, so low MXU share is expected and the latency numbers are the
    real story.
"""

import json
import os
import shutil
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
    """Per-stage attribution via the staged solver with profile syncs.
    First call warms per-stage compiles; per-stage min over two measured
    runs drops stray lazily-compiled branches and tunnel hiccups."""
    psulvsb_solve(pair.src, pair.dst, keep, params, jax.random.PRNGKey(3),
                  profile=True)
    out: dict = {}
    for seed in (4, 5):
        _, info = psulvsb_solve(pair.src, pair.dst, keep, params,
                                jax.random.PRNGKey(seed), profile=True)
        for k, v in info["stage_s"].items():
            out[k] = min(out.get(k, v), v)
    return {k: round(v, 4) for k, v in out.items()}


def fused_cost_analysis(pair, keep, params):
    """XLA-estimated FLOPs of the fused program (None if unavailable)."""
    try:
        compiled = (
            jax.jit(psulvsb_register, static_argnames=("params",))
            .lower(pair.src, pair.dst, keep, jax.random.PRNGKey(0), params)
            .compile()
        )
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def realdata_recall(dataset: str, n_pairs: int, n_corr: int, ddtime: int) -> dict:
    """Generate a reference-format scene and run the real-data harness on
    it end-to-end (evaluate_pair best-of-ddtime, success criteria, recall)."""
    from psulvsb_tpu.eval.make_dataset import write_scene
    from psulvsb_tpu.eval.realdata import run_scene, SuccessCriteria

    root = f"/tmp/psulvsb_bench_{dataset}"
    shutil.rmtree(root, ignore_errors=True)
    if dataset == "kitti":
        write_scene(root, n_pairs=n_pairs, n_corr=n_corr, seed=1,
                    noise_bound=0.1, scene_scale=20.0, max_translation=10.0)
        params = SolverParams.preset_kitti(
            sampled_cap=2048, basic_cap=1024, hypothesis_batch=16
        )
        criteria = SuccessCriteria.kitti()
    elif dataset == "3dlomatch":
        # Low-overlap regime: 85-98% mismatch outliers (the 3DLoMatch
        # protocol's hostile end; the reference uses the same solver +
        # criteria for both 3DMatch splits, teaser_cpp_ply_main.cc:424).
        write_scene(root, n_pairs=n_pairs, n_corr=n_corr, seed=2,
                    outlier_rates=(0.85, 0.9, 0.93, 0.95, 0.97, 0.98))
        params = SolverParams.preset_3dmatch(
            sampled_cap=2048, basic_cap=1024, hypothesis_batch=16
        )
        criteria = SuccessCriteria.threedmatch()
    else:
        write_scene(root, n_pairs=n_pairs, n_corr=n_corr, seed=0)
        params = SolverParams.preset_3dmatch(
            sampled_cap=2048, basic_cap=1024, hypothesis_batch=16
        )
        criteria = SuccessCriteria.threedmatch()
    return run_scene(
        root, os.path.join(root, "pairs.txt"), params, criteria,
        os.path.join(root, "out.csv"), ddtime=ddtime, resume=False,
        decoupled_fallback=(dataset == "3dlomatch"),
    )


def main():
    n_repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    # Caps swept on-device (2026-08-17): (4096, 1024, 16) dominates
    # (4096, 2048, 32) at both 1889 and 5000 corrs (47.6/50.4 ms vs
    # 69.2/110.3 ms wall, identical accuracy) — basic_cap 1024 engages the
    # whole-GNC Pallas kernel and avoids padding the ~600-900-TIM basic
    # sets, and batch 16 ends local rounds sooner than 32 at equal quality.
    params = SolverParams.preset_artificial(
        sampled_cap=4096, basic_cap=1024, hypothesis_batch=16
    )
    src = jnp.asarray(synthetic_cloud(N_CORRS, seed=0))
    pair = make_synthetic_pair(
        jax.random.PRNGKey(1), src, noise_bound=0.05, outlier_rate=OUTLIER_RATE
    )
    keep = jnp.ones((N_CORRS,), jnp.int32)

    # Compile + correctness gate.
    sol = psulvsb_register(pair.src, pair.dst, keep, jax.random.PRNGKey(0), params)
    jax.block_until_ready(sol)
    re = float(angular_error_deg(pair.transform.rotation, sol.rotation))
    te = float(jnp.linalg.norm(sol.translation - pair.transform.translation))
    ok = bool(sol.valid) and re < 5.0 and te < 0.3

    times = []
    for i in range(n_repeat):
        k = jax.random.PRNGKey(100 + i)
        t0 = time.perf_counter()
        s = psulvsb_register(pair.src, pair.dst, keep, k, params)
        # Force a host readback: on the axon tunnel block_until_ready alone
        # does not reliably wait for remote completion.
        _ = float(s.translation[0]) + float(s.scale)
        times.append(time.perf_counter() - t0)
    times.sort()
    # Best-of: repeats differ only by tunnel/host jitter (same device
    # program); the baseline number is likewise a single clean run.
    best = times[0]

    throughput = measure_batched_throughput(params)

    # North-star size (BASELINE.md): 5000 correspondences, 90% outliers —
    # informational field; no published reference number exists at this
    # size (the C++ implementation scales O(C^2)+ from 0.949 s at 1889).
    src5 = jnp.asarray(synthetic_cloud(5000, seed=0))
    pair5 = make_synthetic_pair(
        jax.random.PRNGKey(1), src5, noise_bound=0.01, outlier_rate=OUTLIER_RATE
    )
    keep5 = jnp.ones((5000,), jnp.int32)
    s5 = psulvsb_register(pair5.src, pair5.dst, keep5, jax.random.PRNGKey(0), params)
    _ = float(s5.scale)
    t5 = []
    for i in range(3):
        t0 = time.perf_counter()
        s5 = psulvsb_register(
            pair5.src, pair5.dst, keep5, jax.random.PRNGKey(50 + i), params
        )
        _ = float(s5.translation[0])
        t5.append(time.perf_counter() - t0)
    re5 = float(angular_error_deg(pair5.transform.rotation, s5.rotation))

    # Per-stage attribution (VERDICT r1 #5) at both sizes.
    stage_1889 = stage_breakdown(pair, keep, params)
    stage_5000 = stage_breakdown(pair5, keep5, params)

    # Roofline position of the fused program.
    flops = fused_cost_analysis(pair, keep, params)
    mxu_util = (
        round(100.0 * flops / best / PEAK_FLOPS_BF16, 3) if flops else None
    )

    # Real-data harness recall (VERDICT r1 #4) — the reference's benchmark
    # protocol end-to-end on generated reference-format scenes.
    rd3 = realdata_recall("3dmatch", n_pairs=6, n_corr=1500, ddtime=3)
    rdl = realdata_recall("3dlomatch", n_pairs=6, n_corr=1500, ddtime=3)
    rdk = realdata_recall("kitti", n_pairs=4, n_corr=1500, ddtime=3)

    print(
        json.dumps(
            {
                "metric": "bunny_1889corr_90pct_outliers_solve_time",
                "value": round(best, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / best, 2),
                "median_s": round(times[len(times) // 2], 4),
                "batch8_pairs_per_s": round(throughput, 2),
                "solve_5000corr_s": round(min(t5), 4),
                "rot_err_5000_deg": round(re5, 4),
                "correct": ok,
                "rot_err_deg": round(re, 4),
                "trans_err": round(te, 4),
                "realdata_3dmatch_recall": round(rd3["recall"], 4),
                "realdata_3dmatch_avg_time_s": round(rd3["avg_time_s"], 4),
                "realdata_3dmatch_avg_rot_err_deg": round(
                    rd3["avg_angle_error_deg"], 4
                ),
                "realdata_3dlomatch_recall": round(rdl["recall"], 4),
                "realdata_3dlomatch_avg_time_s": round(rdl["avg_time_s"], 4),
                "realdata_kitti_recall": round(rdk["recall"], 4),
                "realdata_kitti_avg_time_s": round(rdk["avg_time_s"], 4),
                "stage_s_1889": stage_1889,
                "stage_s_5000": stage_5000,
                "fused_flops_1889": flops,
                "mxu_util_pct_1889": mxu_util,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
