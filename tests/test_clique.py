"""Clique/graph tests — parity target: graph-test.cc (Graph ops, PMC max
clique on crafted graphs, solver modes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psulvsb_tpu.clique.kcore import core_numbers, greedy_clique, max_kcore_mask
from psulvsb_tpu.clique.graph import Graph, MaxCliqueSolver, MaxCliqueSolverParams, CliqueSolverMode
from psulvsb_tpu.clique.pmc import exact_max_clique, native_available


def planted_clique_adj(rng, n=60, k=12, p=0.08):
    """Random graph with a planted k-clique."""
    adj = rng.random((n, n)) < p
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    members = rng.choice(n, size=k, replace=False)
    for a in members:
        for b in members:
            if a != b:
                adj[a, b] = True
    np.fill_diagonal(adj, False)
    return adj, set(members.tolist())


class TestGraphClass:
    def test_basic_ops(self):
        g = Graph()
        g.populateVertices(5)
        g.addEdge(0, 1)
        g.addEdge(1, 2)
        assert g.numVertices() == 5
        assert g.numEdges() == 2
        assert g.hasEdge(0, 1) and g.hasEdge(1, 0)
        g.removeEdge(0, 1)
        assert not g.hasEdge(0, 1)
        assert g.getEdges(1) == [2]
        m = g.getAdjMatrix()
        assert m[1, 2] and m[2, 1] and not m[0, 1]


class TestDeviceKernels:
    def test_core_numbers_triangle_plus_tail(self):
        # Triangle 0-1-2 with a tail 2-3: cores = [2, 2, 2, 1].
        adj = np.zeros((4, 4), bool)
        for a, b in [(0, 1), (1, 2), (0, 2), (2, 3)]:
            adj[a, b] = adj[b, a] = True
        cores = np.asarray(core_numbers(jnp.asarray(adj)))
        np.testing.assert_array_equal(cores, [2, 2, 2, 1])

    def test_greedy_finds_planted_clique(self, rng):
        adj, members = planted_clique_adj(rng)
        mask = np.asarray(greedy_clique(jnp.asarray(adj)))
        found = set(np.where(mask)[0].tolist())
        # Greedy must find a clique at least 75% of the planted size...
        assert len(found) >= 9
        # ...and it must actually be a clique.
        for a in found:
            for b in found:
                if a != b:
                    assert adj[a, b]

    def test_max_kcore_contains_planted(self, rng):
        adj, members = planted_clique_adj(rng)
        mask = np.asarray(max_kcore_mask(jnp.asarray(adj)))
        assert members <= set(np.where(mask)[0].tolist())


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
class TestNativeExact:
    def test_exact_on_crafted_graph(self):
        # graph-test style crafted case: two overlapping triangles + max
        # clique {1, 2, 3, 4} (4-clique).
        adj = np.zeros((6, 6), bool)
        edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 4), (0, 5)]
        for a, b in edges:
            adj[a, b] = adj[b, a] = True
        got = exact_max_clique(adj)
        assert got == [1, 2, 3, 4]

    def test_exact_recovers_planted_clique(self, rng):
        adj, members = planted_clique_adj(rng, n=80, k=14, p=0.1)
        got = exact_max_clique(adj)
        assert set(got) == members

    def test_solver_facade_modes(self, rng):
        adj, members = planted_clique_adj(rng, n=50, k=10, p=0.05)
        g = Graph()
        g.populateVertices(50)
        for a in range(50):
            for b in range(a + 1, 50):
                if adj[a, b]:
                    g.addEdge(a, b)
        exact = MaxCliqueSolver(
            MaxCliqueSolverParams(solver_mode=CliqueSolverMode.PMC_EXACT)
        ).findMaxClique(g)
        assert set(exact) == members
        heu = MaxCliqueSolver(
            MaxCliqueSolverParams(solver_mode=CliqueSolverMode.PMC_HEU)
        ).findMaxClique(g)
        # Heuristic result is a clique.
        for a in heu:
            for b in heu:
                if a != b:
                    assert adj[a, b]

    def test_empty_graph(self):
        g = Graph()
        assert MaxCliqueSolver().findMaxClique(g) == []

    def test_timeout_returns_best_so_far(self, rng):
        adj, members = planted_clique_adj(rng, n=70, k=12, p=0.3)
        got = exact_max_clique(adj, time_limit_s=1e-9)
        # Even on instant timeout the greedy lower bound is returned.
        assert len(got) >= 3

    def test_exact_clique_callback_in_solver(self, monkeypatch):
        """PMC_EXACT + exact_clique_callback=True routes the escalated
        b_rate == 1.0 round through the native exact solver via
        jax.pure_callback (ADVICE r1: EXACT was silently greedy). An
        all-outlier fixture stagnates every round, walking the rate ladder
        to 1.0 within the 5-round cap."""
        import jax
        from psulvsb_tpu.clique import pmc
        from psulvsb_tpu.solver.config import SolverParams
        from psulvsb_tpu.solver.psulvsb import psulvsb_solve

        calls = []
        real = pmc.exact_max_clique

        def spy(adj, time_limit_s=3600.0, n_threads=12):
            calls.append(np.asarray(adj).shape)
            return real(adj, time_limit_s, n_threads)

        monkeypatch.setattr(pmc, "exact_max_clique", spy)

        rng = np.random.default_rng(0)
        s = rng.normal(size=(3, 64)).astype(np.float32)
        src = jnp.asarray(s)
        # Permuted same cloud: TIM lengths stay plausible (non-empty reduced
        # set under the known-scale beta test) while the geometry is
        # inconsistent. A near-zero scoring threshold (noise_bound_dataset)
        # keeps counts at 0 so pro never reaches confidence and every round
        # stagnates -> the rate ladder reaches b_rate == 1.0.
        dst = jnp.asarray(s[:, rng.permutation(64)])
        params = SolverParams.preset_artificial(
            sampled_cap=256, basic_cap=128, hypothesis_batch=4,
            exact_clique_callback=True, time_budget_s=10_000.0,
            # Disable the early-accept similarity cut so every round walks
            # the stagnation -> escalation path deterministically.
            rotation_similar=0.0, noise_bound_dataset=1e-4,
        )
        sol, info = psulvsb_solve(
            src, dst, jnp.ones((64,), jnp.int32), params, jax.random.PRNGKey(0)
        )
        assert len(calls) > 0, "exact-clique host callback never invoked"
        assert all(shape == (64, 64) for shape in calls)


class TestGreedyVsExact:
    """Data backing the 'greedy ~= exact on scale-consistency graphs' claim
    (VERDICT r2 #7; the jitted solver's default replaces the reference's
    exact PMC call at the escalated round, graph.cc:84-124): sweep hostile
    synthetic pairs, compare clique sizes and the downstream rotation."""

    def _consistency_graph(self, seed, n=300, rate=0.9):
        import numpy as np

        from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair

        base = jnp.asarray(synthetic_cloud(n, seed=seed))
        pair = make_synthetic_pair(
            jax.random.PRNGKey(seed), base, noise_bound=0.01,
            outlier_rate=rate, outlier_mode="mismatch",
        )
        src = np.asarray(pair.src)
        dst = np.asarray(pair.dst)
        iu, ju = np.triu_indices(n, 1)
        v1 = np.linalg.norm(src[:, ju] - src[:, iu], axis=0)
        v2 = np.linalg.norm(dst[:, ju] - dst[:, iu], axis=0)
        edge = np.abs(v1 - v2) <= 0.02  # beta at user noise bound
        adj = np.zeros((n, n), bool)
        adj[iu[edge], ju[edge]] = True
        adj[ju[edge], iu[edge]] = True
        return adj, pair

    def test_greedy_close_to_exact_on_hostile_pairs(self):
        """Across seeds x outlier rates: the greedy clique reaches >= 90% of
        the exact clique size, and the rotation solved over greedy-clique
        chain TIMs matches the exact-clique rotation within 1 degree.
        (Observed on this sweep: size ratios 0.96-1.0.)"""
        import numpy as np

        from psulvsb_tpu.clique.kcore import greedy_clique
        from psulvsb_tpu.clique.pmc import exact_max_clique, native_available
        from psulvsb_tpu.core.metrics import angular_error_deg
        from psulvsb_tpu.rotation.gnc import gnc_tls_rotation

        if not native_available():
            pytest.skip("native exact clique unavailable")

        ratios = []
        for seed, rate in [(1, 0.9), (2, 0.93), (3, 0.95), (4, 0.97)]:
            adj, pair = self._consistency_graph(seed, rate=rate)
            exact = exact_max_clique(adj, time_limit_s=30.0)
            greedy = np.nonzero(np.asarray(greedy_clique(jnp.asarray(adj))))[0]
            assert len(exact) >= 4, "fixture degenerate"
            ratio = len(greedy) / len(exact)
            ratios.append(ratio)
            assert ratio >= 0.9, (seed, rate, len(greedy), len(exact))

            def chain_rot(members):
                m = np.asarray(sorted(members))
                nxt = m[(np.arange(len(m)) + 1) % len(m)]
                s_t = pair.src[:, nxt] - pair.src[:, m]
                d_t = pair.dst[:, nxt] - pair.dst[:, m]
                return gnc_tls_rotation(s_t, d_t, 0.02).rotation

            err = float(
                angular_error_deg(chain_rot(exact), chain_rot(list(greedy)))
            )
            assert err < 1.0, (seed, rate, err)
        # The sweep's aggregate: greedy is a near-exact stand-in here.
        assert sum(ratios) / len(ratios) >= 0.95


class TestGreedyVsExactAtScale:
    """Reference-scale clique evidence (VERDICT r4 #4): the audit regime of
    docs/CLIQUE_AUDIT.md, asserted in CI at C=2048. The known collapse case
    (scale-estimation ratio-histogram window, 93% mismatch): core-number
    ordering bottoms out (measured 5 vs exact 121 at C=2000) while triangle
    ordering — the solver's ordering since r5 — matches exact."""

    @pytest.mark.slow
    @pytest.mark.skipif(not native_available(), reason="native lib unavailable")
    def test_triangle_greedy_matches_exact_on_ratio_window(self):
        import jax
        import jax.numpy as jnp

        from psulvsb_tpu.clique.kcore import greedy_clique, triangle_scores
        from psulvsb_tpu.eval.synthetic import synthetic_cloud, make_synthetic_pair
        from psulvsb_tpu.solver.config import SolverParams
        from psulvsb_tpu.solver.psulvsb import dense_consistency_adjacency

        c = 2048
        base = jnp.asarray(synthetic_cloud(c, seed=2093), jnp.float32)
        pair = make_synthetic_pair(
            jax.random.PRNGKey(2093 * 7919 + 13), base, noise_bound=0.01,
            outlier_rate=0.93, max_translation=2.0, outlier_mode="mismatch",
        )
        params = SolverParams.preset_3dmatch(
            estimate_scaling=True, sampled_cap=2048, basic_cap=256,
            hypothesis_batch=4,
        )
        inl = np.where(~np.asarray(pair.outlier_mask))[0]
        adj = dense_consistency_adjacency(
            pair.src, pair.dst,
            jnp.asarray(inl[:-1], jnp.int32), jnp.asarray(inl[1:], jnp.int32),
            jnp.asarray(inl.size - 1, jnp.int32), params,
            jnp.ones((c,), bool),
        )
        tri = int(np.asarray(
            greedy_clique(adj, order_scores=triangle_scores(adj))
        ).sum())
        exact = len(exact_max_clique(np.asarray(adj), time_limit_s=600.0))
        assert exact > 0
        assert tri / exact >= 0.95, (tri, exact)
