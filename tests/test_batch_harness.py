"""Batched/sharded dataset-sweep harness (eval/batch_harness.py) and the
clique-seeded warm start (solver/psulvsb.py::_clique_seed_stage)."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psulvsb_tpu.core.metrics import angular_error_deg
from psulvsb_tpu.eval.batch_harness import run_benchmark_batched, run_scene_batched
from psulvsb_tpu.eval.make_dataset import write_scene
from psulvsb_tpu.eval.realdata import SuccessCriteria, run_scene
from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair
from psulvsb_tpu.solver.config import SolverParams
from psulvsb_tpu.solver.fused import psulvsb_register
from psulvsb_tpu.solver.psulvsb import _clique_seed_stage, _init_stage


PARAMS = SolverParams.preset_3dmatch(
    estimate_scaling=False, sampled_cap=1024, basic_cap=512, hypothesis_batch=8
)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bh_scene"))
    write_scene(root, n_pairs=3, n_corr=500, outlier_rates=(0.7, 0.85, 0.9), seed=3)
    return root


class TestBatchedScene:
    @pytest.mark.slow
    def test_recall_and_stats(self, scene):
        stats = run_scene_batched(
            scene, os.path.join(scene, "pairs.txt"), PARAMS,
            SuccessCriteria.threedmatch(), os.path.join(scene, "o.csv"),
            ddtime=2,
        )
        assert stats["pairs"] == 3
        assert stats["recall"] == 1.0
        assert stats["timing"] == "amortized-batch"
        assert stats["pairs_per_s"] > 0
        assert os.path.exists(os.path.join(scene, "o.csv"))

    @pytest.mark.slow
    def test_unknown_scale_recall(self, scene):
        """The reference's unknownScale mode through the batched harness
        (teaser_cpp_ply_main.cc:319): dst stretched by a random test scale
        in [1, 5), estimate_scaling=True, scale error in the criteria."""
        params = PARAMS.replace(estimate_scaling=True)
        stats = run_scene_batched(
            scene, os.path.join(scene, "pairs.txt"), params,
            SuccessCriteria.threedmatch(), os.path.join(scene, "u.csv"),
            ddtime=2, unknown_scale=True,
        )
        assert stats["pairs"] == 3
        assert stats["recall"] == 1.0
        # Tighter than the 0.1 success gate (which recall==1.0 already
        # implies): scale recovered to well under the criterion, and
        # translation accurate — the regression guard for the scale-aware
        # finalize (the scale-blind refine produced trans errors of 0.09-5.7
        # on these pairs).
        assert stats["avg_scale_error"] < 0.05
        assert stats["avg_trans_error"] < 0.05

    @pytest.mark.slow
    def test_sharded_matches_serial_path(self, scene):
        """The sharded mesh path must produce the same per-pair successes as
        the single-device batch (identical keys -> identical programs)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs the virtual multi-device CPU mesh")
        a = run_scene_batched(
            scene, os.path.join(scene, "pairs.txt"), PARAMS,
            SuccessCriteria.threedmatch(), os.path.join(scene, "a.csv"),
            ddtime=2, sharded=False,
        )
        b = run_scene_batched(
            scene, os.path.join(scene, "pairs.txt"), PARAMS,
            SuccessCriteria.threedmatch(), os.path.join(scene, "b.csv"),
            ddtime=2, sharded=True,
        )
        assert b["sharded"] is True
        assert a["recall"] == b["recall"]
        assert a["avg_angle_error_deg"] == pytest.approx(
            b["avg_angle_error_deg"], abs=1e-5
        )

    def test_agrees_with_serial_harness(self, scene):
        """Batched best-of-ddtime reaches the serial harness's recall on the
        same scene (same success criteria; keys differ only through the
        shared fold_in schedule)."""
        serial = run_scene(
            scene, os.path.join(scene, "pairs.txt"), PARAMS,
            SuccessCriteria.threedmatch(), os.path.join(scene, "s.csv"),
            ddtime=2, resume=False,
        )
        batched = run_scene_batched(
            scene, os.path.join(scene, "pairs.txt"), PARAMS,
            SuccessCriteria.threedmatch(), os.path.join(scene, "t.csv"),
            ddtime=2,
        )
        assert batched["recall"] == serial["recall"] == 1.0

    def test_benchmark_batched_writes_average_csv(self, tmp_path):
        root = tmp_path / "bench"
        for s in ("sceneA", "sceneB"):
            write_scene(
                str(root / s), n_pairs=2, n_corr=400,
                outlier_rates=(0.7, 0.8), seed=5,
            )
        out = tmp_path / "out"
        summary = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch",
            scenes=["sceneA", "sceneB"], params=PARAMS, ddtime=1,
        )
        assert set(summary) == {"sceneA", "sceneB"}
        assert all(v["recall"] == 1.0 for v in summary.values())
        assert (out / "Average_3dmatch_fpfh.csv").exists()

    def test_resume_skips_completed_scenes(self, tmp_path):
        """resume=True reuses the sidecar stats of a completed scene without
        re-solving (CSV mtime unchanged; stats identical) — but ONLY when
        the protocol fingerprint matches: a different ddtime re-runs
        (review r3: a bare CSV cannot prove which protocol produced it)."""
        root = tmp_path / "bench"
        write_scene(
            str(root / "sceneA"), n_pairs=2, n_corr=400,
            outlier_rates=(0.7, 0.8), seed=5,
        )
        out = tmp_path / "out"
        first = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["sceneA"],
            params=PARAMS, ddtime=1,
        )
        csv_path = out / "sceneA_fpfh_0.csv"
        mtime = os.path.getmtime(csv_path)
        second = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["sceneA"],
            params=PARAMS, ddtime=1, resume=True,
        )
        assert os.path.getmtime(csv_path) == mtime
        assert second["sceneA"]["timing"] == "resumed"
        assert second["sceneA"]["recall"] == first["sceneA"]["recall"]
        assert second["sceneA"]["pairs"] == first["sceneA"]["pairs"]
        assert abs(
            second["sceneA"]["avg_rmse"] - first["sceneA"]["avg_rmse"]
        ) < 1e-9
        # Fingerprint mismatch (ddtime=2) must NOT reuse the stale scene.
        third = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["sceneA"],
            params=PARAMS, ddtime=2, resume=True,
        )
        assert third["sceneA"]["timing"] == "amortized-batch"
        assert os.path.getmtime(csv_path) != mtime
        # Criteria mismatch must also re-run: the same solves scored under
        # another dataset's success gates are a different result (review r3:
        # dataset='kitti' previously resumed 3DMatch-criteria stats as-is).
        mtime3 = os.path.getmtime(csv_path)
        fourth = run_benchmark_batched(
            str(root), str(out), dataset="kitti", scenes=["sceneA"],
            params=PARAMS, ddtime=2, resume=True,
        )
        assert fourth["sceneA"]["timing"] == "amortized-batch"
        assert os.path.getmtime(csv_path) != mtime3

    @pytest.mark.slow
    def test_whu_tls_default_params_match_regime(self, tmp_path):
        """dataset='whu_tls' with params=None must solve with the WHU-TLS
        preset (noise bound 0.15, registration.cc:35), not 3DMatch's 0.01
        (review r3: criteria and params branches disagreed). Building-scale
        noise makes 0.01-bound solves fail, so recall 1.0 here proves the
        preset was picked up."""
        from psulvsb_tpu.eval.make_dataset import write_scene as ws

        root = tmp_path / "whu"
        ws(
            str(root / "s0"), n_pairs=2, n_corr=400, noise_bound=0.15,
            scene_scale=30.0, max_translation=15.0,
            outlier_rates=(0.6, 0.7), seed=6,
        )
        summary = run_benchmark_batched(
            str(root), str(tmp_path / "whu_out"), dataset="whu_tls",
            scenes=["s0"], ddtime=1,
        )
        assert summary["s0"]["recall"] == 1.0


class TestRealisticShapes:
    """Reference-cardinality coverage (VERDICT r4): FCGF descriptor files,
    mixed per-pair sizes spanning several pad buckets, and sharded parity
    at a realistic scene shape."""

    def test_fcgf_descriptor_path(self, tmp_path):
        """descriptor='fcgf' reads @corr_fcgf.txt/@GTmat_fcgf.txt files
        (teaser_cpp_ply_main.cc:30-34 sweeps both descriptors) with the
        same bookkeeping as the fpfh path — including distinct output CSV
        names so both descriptors of one scene can coexist."""
        root = tmp_path / "fcgf"
        write_scene(
            str(root / "s0"), n_pairs=2, n_corr=400,
            outlier_rates=(0.7, 0.8), seed=5, descriptor="fcgf",
        )
        assert os.path.exists(
            str(root / "s0" / "cloud_bin_0+cloud_bin_1@corr_fcgf.txt")
        )
        out = tmp_path / "out"
        summary = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["s0"],
            params=PARAMS, ddtime=1, descriptor="fcgf",
        )
        assert summary["s0"]["pairs"] == 2
        assert summary["s0"]["recall"] == 1.0
        assert (out / "s0_fcgf_0.csv").exists()
        assert (out / "Average_3dmatch_fcgf.csv").exists()

    @pytest.mark.slow
    def test_mixed_cardinality_buckets(self, tmp_path):
        """A scene with per-pair sizes straddling a pad-bucket boundary
        (400 -> bucket 512, 700 -> bucket 1024) solves every pair in its
        own bucket group with recall 1.0 — the shape the ~5k-corr 3DMatch
        protocol runs at (sizes 3500/5000/6500 across three buckets)."""
        from psulvsb_tpu.utils.padding import pad_to_bucket

        assert pad_to_bucket(400) != pad_to_bucket(700)
        root = tmp_path / "mix"
        write_scene(
            str(root / "s0"), n_pairs=4, n_corr=(400, 700),
            outlier_rates=(0.7, 0.8), seed=7,
        )
        # Pair i carries n_corr[i % 2] correspondences.
        for i, expect in ((0, 400), (1, 700)):
            arr = np.loadtxt(
                str(root / "s0" / f"cloud_bin_{i}+cloud_bin_{i + 1}@corr.txt")
            )
            assert arr.shape == (expect, 6)
        stats = run_scene_batched(
            str(root / "s0"), str(root / "s0" / "pairs.txt"), PARAMS,
            SuccessCriteria.threedmatch(), str(tmp_path / "mix.csv"),
            ddtime=2,
        )
        assert stats["pairs"] == 4
        assert stats["recall"] == 1.0

    @pytest.mark.slow
    def test_sharded_full_scene_parity(self, tmp_path):
        """Sharded vs unsharded at a REALISTIC shape (VERDICT r3 weak #6):
        a full 30-pair scene, ddtime 5, n_corr 1500 (bucket 2048) on the
        8-device CPU mesh — per-pair rows must match the single-device
        batch exactly (identical keys -> identical device programs)."""
        if len(jax.devices()) < 2:
            pytest.skip("needs the virtual multi-device CPU mesh")
        import csv

        params = SolverParams.preset_3dmatch(
            estimate_scaling=False, sampled_cap=2048, basic_cap=256,
            hypothesis_batch=4,
        )
        root = tmp_path / "big"
        write_scene(str(root / "s0"), n_pairs=30, n_corr=1500, seed=13)
        stats = {}
        rows = {}
        for name, sharded in (("serial", False), ("sharded", True)):
            out_csv = str(tmp_path / f"{name}.csv")
            stats[name] = run_scene_batched(
                str(root / "s0"), str(root / "s0" / "pairs.txt"), params,
                SuccessCriteria.threedmatch(), out_csv,
                ddtime=5, sharded=sharded,
            )
            with open(out_csv) as f:
                rows[name] = {r[0]: r[1:] for r in list(csv.reader(f))[1:]}
        assert stats["sharded"]["sharded"] is True
        assert stats["serial"]["pairs"] == 30
        assert stats["serial"]["recall"] == stats["sharded"]["recall"] == 1.0
        assert rows["serial"].keys() == rows["sharded"].keys()
        for tag, r in rows["serial"].items():
            # Same errors per pair; Time (col 5) is wall-clock and differs.
            for a, b in zip(r[:4], rows["sharded"][tag][:4]):
                assert float(a) == pytest.approx(float(b), abs=1e-5), tag


class TestCliqueSeed:
    def _pair(self, n=500, rate=0.9):
        base = jnp.asarray(synthetic_cloud(n, seed=1))
        return make_synthetic_pair(
            jax.random.PRNGKey(2), base, noise_bound=0.01, outlier_rate=rate,
            outlier_mode="mismatch",
        )

    def test_seed_recovers_transform_known_scale(self):
        """The greedy clique over the beta-window reduced set + chain-TIM
        solve lands near the true transform at 90% mismatch outliers."""
        pair = self._pair()
        c = pair.src.shape[1]
        keep = jnp.ones((c,), jnp.int32)
        params = PARAMS.replace(clique_init=True)
        red_i, red_j, _cnt, pool = _init_stage(
            pair.src, pair.dst, keep, params, jax.random.PRNGKey(0)
        )
        warm, ok = _clique_seed_stage(
            pair.src, pair.dst, red_i, red_j, pool, params, jax.random.PRNGKey(1)
        )
        assert bool(ok)
        assert not bool(warm.first_time)
        assert float(angular_error_deg(pair.transform.rotation, warm.rotation)) < 2.0
        assert float(
            jnp.linalg.norm(warm.translation - pair.transform.translation)
        ) < 0.1

    def test_fused_solve_with_clique_init(self):
        pair = self._pair()
        keep = jnp.ones((pair.src.shape[1],), jnp.int32)
        sol = psulvsb_register(
            pair.src, pair.dst, keep, jax.random.PRNGKey(0),
            PARAMS.replace(clique_init=True),
        )
        assert bool(sol.valid)
        assert float(angular_error_deg(pair.transform.rotation, sol.rotation)) < 5.0

    def test_seed_recovers_transform_unknown_scale(self):
        """r4: the seed fires under estimate_scaling too — adjacency from
        the peak+-1 ratio-bin window over the exact (C, C) grid, peak from
        the pool-member median (config.py rationale; measured recall
        0.967 -> 1.0 on the full-scale unknownScale protocol)."""
        pair = self._pair(n=600, rate=0.9)
        ts = 2.7  # the unknownScale protocol's random test stretch
        dst = pair.dst * ts
        c = pair.src.shape[1]
        keep = jnp.ones((c,), jnp.int32)
        params = PARAMS.replace(clique_init=True, estimate_scaling=True)
        red_i, red_j, _cnt, pool = _init_stage(
            pair.src, dst, keep, params, jax.random.PRNGKey(0)
        )
        warm, ok = _clique_seed_stage(
            pair.src, dst, red_i, red_j, pool, params, jax.random.PRNGKey(1),
            keep == 1,
        )
        assert bool(ok)
        assert float(angular_error_deg(pair.transform.rotation, warm.rotation)) < 2.0
        assert abs(float(warm.scale) - ts) < 0.1

    def test_seed_exact_graph_beats_thinned_pool(self):
        """The dense seed-graph rebuild must not depend on pool thinning:
        with a pool capacity far below the reduced-set size, the seed still
        recovers the transform (pool-edge adjacency alone loses cliqueness
        — measured 3DLoMatch recall 1.0 -> 0.967 from exactly this)."""
        pair = self._pair(n=500, rate=0.9)
        c = pair.src.shape[1]
        keep = jnp.ones((c,), jnp.int32)
        params = PARAMS.replace(clique_init=True, pool_cap=512, pool_reserve=64)
        red_i, red_j, _cnt, pool = _init_stage(
            pair.src, pair.dst, keep, params, jax.random.PRNGKey(0)
        )
        assert red_i.shape[0] == 512  # thinned pool slots
        warm, ok = _clique_seed_stage(
            pair.src, pair.dst, red_i, red_j, pool, params, jax.random.PRNGKey(1),
            keep == 1,
        )
        assert bool(ok)
        assert float(angular_error_deg(pair.transform.rotation, warm.rotation)) < 2.0

    def test_lazy_seed_rescues_hostile_pair(self):
        """clique_init="auto" (default) rescues a 97%-mismatch known-scale
        pair via the in-loop escalation-triggered seed (the 3DLoMatch
        0.98-outlier failure mode; measured recall 0.975 -> 1.0 on the
        240-pair protocol)."""
        pair = self._pair(n=600, rate=0.97)
        keep = jnp.ones((pair.src.shape[1],), jnp.int32)
        sol = psulvsb_register(
            pair.src, pair.dst, keep, jax.random.PRNGKey(0),
            PARAMS.replace(clique_init="auto"),
        )
        assert bool(sol.valid)
        assert float(angular_error_deg(pair.transform.rotation, sol.rotation)) < 5.0

    @pytest.mark.slow
    def test_lazy_matches_off_when_no_escalation(self):
        """On an easy pair the lazy seed never fires: "auto" and "off" give
        bit-identical solutions for the same key (the no-tax property)."""
        pair = self._pair(n=400, rate=0.7)
        keep = jnp.ones((pair.src.shape[1],), jnp.int32)
        s_auto = psulvsb_register(
            pair.src, pair.dst, keep, jax.random.PRNGKey(0),
            PARAMS.replace(clique_init="auto"),
        )
        s_off = psulvsb_register(
            pair.src, pair.dst, keep, jax.random.PRNGKey(0),
            PARAMS.replace(clique_init="off"),
        )
        np.testing.assert_array_equal(
            np.asarray(s_auto.rotation), np.asarray(s_off.rotation)
        )
        np.testing.assert_array_equal(
            np.asarray(s_auto.translation), np.asarray(s_off.translation)
        )

    def test_lazy_staged_fused_parity(self):
        """The staged solver mirrors the fused in-scan seed (same derived
        key) — identical rotations on a hostile escalating pair."""
        from psulvsb_tpu.solver.psulvsb import psulvsb_solve

        pair = self._pair(n=600, rate=0.97)
        keep = jnp.ones((pair.src.shape[1],), jnp.int32)
        p = PARAMS.replace(clique_init="auto")
        s_f = psulvsb_register(pair.src, pair.dst, keep, jax.random.PRNGKey(5), p)
        s_s, _ = psulvsb_solve(pair.src, pair.dst, keep, p, jax.random.PRNGKey(5))
        np.testing.assert_allclose(
            np.asarray(s_f.rotation), np.asarray(s_s.rotation), atol=1e-5
        )

    @pytest.mark.slow
    def test_eager_seed_with_gror_staged_fused_parity(self):
        """Eager clique + GROR compose identically in both drivers: the
        seed wins over GROR when it lands and the key split is
        unconditional (review r3: the staged driver used to skip the seed
        — and its key split — whenever GROR succeeded)."""
        from psulvsb_tpu.solver.psulvsb import psulvsb_solve

        pair = self._pair(n=400, rate=0.85)
        keep = jnp.ones((pair.src.shape[1],), jnp.int32)
        p = PARAMS.replace(clique_init="eager", gror_init=True)
        s_f = psulvsb_register(pair.src, pair.dst, keep, jax.random.PRNGKey(9), p)
        s_s, _ = psulvsb_solve(pair.src, pair.dst, keep, p, jax.random.PRNGKey(9))
        np.testing.assert_allclose(
            np.asarray(s_f.rotation), np.asarray(s_s.rotation), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_f.translation), np.asarray(s_s.translation), atol=1e-5
        )

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError):
            psulvsb_register(
                jnp.zeros((3, 8)), jnp.zeros((3, 8)), jnp.ones((8,), jnp.int32),
                jax.random.PRNGKey(0), PARAMS.replace(clique_init="sometimes"),
            )

    def test_tiny_clique_not_adopted(self):
        """Fewer than clique_seed_min_size members -> seed discarded
        (first_time stays True)."""
        pair = self._pair()
        params = PARAMS.replace(clique_init=True, clique_seed_min_size=4)
        # An empty reduced set yields no clique.
        r = jnp.zeros((64,), jnp.int32)
        warm, ok = _clique_seed_stage(
            pair.src, pair.dst, r, r, jnp.int32(0), params, jax.random.PRNGKey(1)
        )
        assert not bool(ok)
        assert bool(warm.first_time)


class TestRetryRule:
    """The shared filtered/raw retry allocation (eval/realdata.
    retry_uses_prefilter) — the r5 fix for prefilter-collapse pairs."""

    def test_alternates_even_filtered_odd_raw(self):
        from psulvsb_tpu.eval.realdata import retry_uses_prefilter

        got = [retry_uses_prefilter(t, 10, True) for t in range(10)]
        assert got == [True, False] * 5

    def test_single_retry_keeps_reference_filtered_solve(self):
        from psulvsb_tpu.eval.realdata import retry_uses_prefilter

        assert retry_uses_prefilter(0, 1, True) is True

    def test_prefilter_off_disables_all(self):
        from psulvsb_tpu.eval.realdata import retry_uses_prefilter

        assert not any(retry_uses_prefilter(t, 10, False) for t in range(10))


class TestProtocolScaleRule:
    def test_estimate_scaling_tied_to_unknown_scale(self, tmp_path):
        """The reference ties estimate_scaling to the protocol
        (main.cc:319) — caller-supplied params must NOT re-enable scale
        estimation on a known-scale sweep (the r4 full-scale failure:
        explicit cap-override params carried the default
        estimate_scaling=True past the preset-only replace)."""
        import json

        root = tmp_path / "bench"
        write_scene(
            str(root / "s0"), n_pairs=2, n_corr=400,
            outlier_rates=(0.7, 0.8), seed=5,
        )
        out = tmp_path / "out"
        explicit = SolverParams.preset_3dmatch(
            sampled_cap=1024, basic_cap=512, hypothesis_batch=8,
        )
        assert explicit.estimate_scaling is True  # the hazardous default
        run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["s0"],
            params=explicit, ddtime=1, unknown_scale=False,
        )
        with open(out / "s0_fpfh_0.csv.meta.json") as f:
            meta = json.load(f)
        assert "estimate_scaling=False" in meta["fingerprint"]["params"]


class TestCertifiedProtocol:
    def test_certify_reports_fraction_and_gap(self, tmp_path):
        """certify=True DRS-certifies each winning solve
        (certification.cc:20-190 as the reference's first-class post-solve
        step): an easy scene must certify every success with a tiny gap."""
        root = tmp_path / "cert"
        write_scene(
            str(root / "s0"), n_pairs=2, n_corr=400,
            outlier_rates=(0.6, 0.75), seed=9,
        )
        out = tmp_path / "out"
        summary = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["s0"],
            params=PARAMS, ddtime=1, certify=True,
        )
        s = summary["s0"]
        assert s["recall"] == 1.0
        assert s["certified_frac"] == 1.0
        assert s["avg_cert_gap"] is not None and s["avg_cert_gap"] < 1e-3
        # certify is part of the resume fingerprint: a non-certified
        # sidecar must not serve a certify=True request and vice versa.
        second = run_benchmark_batched(
            str(root), str(out), dataset="3dmatch", scenes=["s0"],
            params=PARAMS, ddtime=1, certify=False, resume=True,
        )
        assert second["s0"]["timing"] == "amortized-batch"


class TestClusteredOutliers:
    def test_clustered_pair_properties(self):
        """Clustered mode: inliers still satisfy the GT transform; outlier
        groups are internally rigid (colluding) yet each group stays
        smaller than the inlier count (well-posedness)."""
        base = jnp.asarray(synthetic_cloud(1200, seed=4))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(8), base, noise_bound=0.01,
            outlier_rate=0.9, max_translation=2.0, outlier_mode="clustered",
        )
        m = np.asarray(pair.outlier_mask)
        assert m.sum() == 1080
        gt_pts = (
            np.asarray(pair.transform.rotation) @ np.asarray(pair.src)
            + np.asarray(pair.transform.translation)[:, None]
        )
        err = np.linalg.norm(gt_pts - np.asarray(pair.dst), axis=0)
        assert err[~m].max() <= 0.01 * np.sqrt(3) * 1.01
        # outliers are genuinely displaced
        assert np.median(err[m]) > 0.05

    def test_solver_survives_clustered_collusion(self):
        """The consensus machinery must reject decoy-rigid groups: recall
        on a clustered 90%-outlier pair (rival groups of up to 0.6x the
        inlier count each)."""
        base = jnp.asarray(synthetic_cloud(1000, seed=2))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(9), base, noise_bound=0.01,
            outlier_rate=0.9, max_translation=2.0, outlier_mode="clustered",
        )
        params = SolverParams.preset_3dmatch(
            estimate_scaling=False, sampled_cap=1024, basic_cap=256,
            hypothesis_batch=4,
        )
        sol = psulvsb_register(
            pair.src, pair.dst,
            jnp.ones((pair.src.shape[1],), jnp.int32),
            jax.random.PRNGKey(0), params,
        )
        ang = float(angular_error_deg(pair.transform.rotation, sol.rotation))
        tr = float(
            jnp.linalg.norm(sol.translation - pair.transform.translation)
        )
        assert bool(sol.valid) and ang < 15.0 and tr < 0.3


class TestFusedBudgetProjection:
    """The fused solver's trace-time projection of the reference's 60 s
    budget (registration.cc:1475; VERDICT r4 weak #5): the lax.scan length
    is min(max_host_rounds, time_budget_s / fused_round_ceiling_s)."""

    def test_never_binds_at_reference_caps(self):
        from psulvsb_tpu.solver.fused import fused_scan_rounds
        p = SolverParams.preset_3dmatch()
        assert fused_scan_rounds(p) == p.max_host_rounds == 5

    def test_caps_grown_rounds(self):
        from psulvsb_tpu.solver.fused import fused_scan_rounds
        p = SolverParams.preset_3dmatch(
            max_host_rounds=10**6, time_budget_s=1.0,
            fused_round_ceiling_s=0.02,
        )
        assert fused_scan_rounds(p) == 50

    def test_disabled_ceiling_keeps_round_cap(self):
        from psulvsb_tpu.solver.fused import fused_scan_rounds
        p = SolverParams.preset_3dmatch(
            max_host_rounds=17, fused_round_ceiling_s=0.0
        )
        assert fused_scan_rounds(p) == 17

    def test_truncated_solve_still_valid(self):
        """A budget tight enough to force a single compiled round still
        returns a usable solution on an easy pair (the first round's
        confidence pass dominates at moderate outlier rates)."""
        from psulvsb_tpu.solver.fused import fused_scan_rounds
        base = jnp.asarray(synthetic_cloud(400, seed=5))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(3), base, noise_bound=0.01,
            outlier_rate=0.6, max_translation=2.0,
        )
        params = PARAMS.replace(time_budget_s=0.02, fused_round_ceiling_s=0.02)
        assert fused_scan_rounds(params) == 1
        sol = psulvsb_register(
            pair.src, pair.dst,
            jnp.ones((pair.src.shape[1],), jnp.int32),
            jax.random.PRNGKey(0), params,
        )
        assert bool(sol.valid)
        assert float(angular_error_deg(pair.transform.rotation, sol.rotation)) < 15.0

    @pytest.mark.slow
    def test_projection_equals_explicit_round_cap(self):
        """Budget truncation IS a scan-length cap: a fused solve whose
        budget projects to k rounds must match a fused solve with
        max_host_rounds=k bit-for-bit (guards any future reimplementation
        of the truncation drifting from the cap semantics)."""
        from psulvsb_tpu.solver.fused import fused_scan_rounds
        base = jnp.asarray(synthetic_cloud(400, seed=5))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(3), base, noise_bound=0.01,
            outlier_rate=0.8,
        )
        keep = jnp.ones((pair.src.shape[1],), jnp.int32)
        p_budget = PARAMS.replace(time_budget_s=0.05, fused_round_ceiling_s=0.02)
        p_cap = PARAMS.replace(max_host_rounds=2)
        assert fused_scan_rounds(p_budget) == 2
        s_b = psulvsb_register(pair.src, pair.dst, keep,
                               jax.random.PRNGKey(1), p_budget)
        s_c = psulvsb_register(pair.src, pair.dst, keep,
                               jax.random.PRNGKey(1), p_cap)
        for a, b in zip(s_b, s_c):
            assert np.array_equal(np.asarray(a), np.asarray(b))
