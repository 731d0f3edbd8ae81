"""Unit tests for the session-6 additions: shipping_priority /
promo_revenue / rollup_revenue / gini_by_key / spearman_by_key /
max_concurrent_sessions (ops/relational.py) and hits_scores
(ops/graph.py).  DuckDB value parity for all seven lives in
test_oracle.py; these cover the semantic edges the oracle fixture
can't reach (ties, guards, empty/degenerate graphs)."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(rows):
    import ray.data

    return ray.data.from_items(rows)


class TestHitsScores:
    def _edges(self, pairs):
        return _ds([{"src": a, "dst": b} for a, b in pairs])

    def test_empty_edges_returns_empty(self, ray_session):
        # regression: used to die in broadcast_join("empty small side")
        import ray.data

        from marginalia_ray.ops.graph import hits_scores

        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        out = hits_scores(empty).take_all()
        assert out == []

    def test_tiny_graph_hand_computed(self, ray_session):
        from marginalia_ray.ops.graph import hits_scores

        # 1->3, 2->3, 3->4:  in-deg: 3:2, 4:1 (auth_1)
        # hub_1: 1:2, 2:2, 3:1;  auth_2: 3:4, 4:1;  hub_2: 1:4, 2:4, 3:1
        out = {
            r["node"]: (r["hub"], r["auth"])
            for r in hits_scores(self._edges([(1, 3), (2, 3), (3, 4)])).take_all()
        }
        assert out == {1: (4, 0), 2: (4, 0), 3: (1, 4), 4: (0, 1)}

    def test_duplicate_edges_collapse(self, ray_session):
        from marginalia_ray.ops.graph import hits_scores

        once = hits_scores(self._edges([(1, 2), (2, 3)])).take_all()
        dup = hits_scores(
            self._edges([(1, 2), (1, 2), (2, 3), (2, 3), (2, 3)])
        ).take_all()
        key = lambda rows: sorted((r["node"], r["hub"], r["auth"]) for r in rows)
        assert key(once) == key(dup)

    def test_iterations_one_is_indegree_auth(self, ray_session):
        from marginalia_ray.ops.graph import hits_scores

        out = {
            r["node"]: (r["hub"], r["auth"])
            for r in hits_scores(
                self._edges([(1, 3), (2, 3)]), iterations=1
            ).take_all()
        }
        # auth_1 = in_deg, hub_1 = sum of successor auth_1
        assert out == {1: (2, 0), 2: (2, 0), 3: (0, 2)}

    def test_overflow_guard_raises(self, ray_session):
        from marginalia_ray.ops.graph import hits_scores

        # star both ways: d_in = d_out = 2^16 would need a huge graph, so
        # fake the bound with many iterations on a small complete-ish graph
        edges = [(i, j) for i in range(40) for j in range(100, 140)]
        with pytest.raises(Exception, match="overflow|bound"):
            hits_scores(self._edges(edges), iterations=12).take_all()


class TestGiniByKey:
    def test_uniform_values_zero(self, ray_session):
        from marginalia_ray.ops.relational import gini_by_key

        rows = [{"source": "a", "n_chars": 7} for _ in range(5)]
        (r,) = gini_by_key(_ds(rows)).take_all()
        assert r["gini_num"] == 0 and r["gini"] == 0.0 and r["n"] == 5

    def test_max_inequality_approaches_one(self, ray_session):
        from marginalia_ray.ops.relational import gini_by_key

        rows = [{"source": "a", "n_chars": 0} for _ in range(99)]
        rows.append({"source": "a", "n_chars": 1000})
        (r,) = gini_by_key(_ds(rows)).take_all()
        # G = (n-1)/n for one holder of everything
        assert r["gini"] == round(99 / 100, 6)

    def test_tie_permutation_invariant(self, ray_session):
        from marginalia_ray.ops.relational import gini_by_key

        a = [{"source": "k", "n_chars": v} for v in [3, 1, 3, 2, 3]]
        b = [{"source": "k", "n_chars": v} for v in [3, 3, 1, 3, 2]]
        (ra,) = gini_by_key(_ds(a)).take_all()
        (rb,) = gini_by_key(_ds(b)).take_all()
        assert (ra["gini_num"], ra["gini_den"]) == (rb["gini_num"], rb["gini_den"])

    def test_negative_values_raise(self, ray_session):
        from marginalia_ray.ops.relational import gini_by_key

        with pytest.raises(Exception, match="negative"):
            gini_by_key(_ds([{"source": "a", "n_chars": -1}])).take_all()


class TestSpearmanByKey:
    def _ev(self, vals, uid=1):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        return _ds(
            [
                {
                    "user_id": uid,
                    "ts": base + datetime.timedelta(minutes=i),
                    "value": float(v),
                }
                for i, v in enumerate(vals)
            ]
        )

    def test_monotone_is_one(self, ray_session):
        from marginalia_ray.ops.relational import spearman_by_key

        (r,) = spearman_by_key(self._ev([1, 2, 5, 9])).take_all()
        assert r["rho"] == 1.0

    def test_reversed_is_minus_one(self, ray_session):
        from marginalia_ray.ops.relational import spearman_by_key

        (r,) = spearman_by_key(self._ev([9, 5, 2, 1])).take_all()
        assert r["rho"] == -1.0

    def test_constant_value_dropped(self, ray_session):
        from marginalia_ray.ops.relational import spearman_by_key

        assert spearman_by_key(self._ev([4, 4, 4])).take_all() == []

    def test_ties_use_average_ranks(self, ray_session):
        from marginalia_ray.ops.relational import spearman_by_key

        # values [1, 2, 2, 3]: doubled avg ranks w = [2, 5, 5, 8];
        # ts ranks u = [2, 4, 6, 8]; Pearson on those is the exact rho
        (r,) = spearman_by_key(self._ev([1, 2, 2, 3])).take_all()
        u = np.array([2, 4, 6, 8], dtype=float)
        w = np.array([2, 5, 5, 8], dtype=float)
        expected = round(
            float(
                ((len(u) * (u * w).sum() - u.sum() * w.sum())
                 / np.sqrt(
                     (len(u) * (u * u).sum() - u.sum() ** 2)
                     * (len(u) * (w * w).sum() - w.sum() ** 2)
                 ))
            ),
            6,
        )
        assert r["rho"] == expected

    def test_group_cap_raises(self, ray_session):
        from marginalia_ray.ops.relational import spearman_by_key

        with pytest.raises(Exception, match="exceeds"):
            spearman_by_key(self._ev(range(20)), max_group_rows=10).take_all()


class TestMaxConcurrentSessions:
    def _ev(self, rows):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        return _ds(
            [
                {"user_id": u, "ts": base + datetime.timedelta(minutes=m)}
                for u, m in rows
            ]
        )

    def test_overlapping_sessions_counted(self, ray_session):
        from marginalia_ray.ops.relational import max_concurrent_sessions

        # three users, sessions [0,10], [5,15], [40,50] minutes
        ev = self._ev(
            [(1, 0), (1, 10), (2, 5), (2, 15), (3, 40), (3, 50)]
        )
        (r,) = max_concurrent_sessions(ev).take_all()
        assert r["peak_concurrency"] == 2
        # first instant both 1 and 2 are active = minute 5
        assert r["peak_ts_us"] == int(
            np.datetime64("2024-01-01T00:05:00", "us").astype(np.int64)
        )

    def test_gap_splits_sessions(self, ray_session):
        from marginalia_ray.ops.relational import max_concurrent_sessions

        # one user, two sessions far apart: peak 1
        ev = self._ev([(1, 0), (1, 120)])
        (r,) = max_concurrent_sessions(ev).take_all()
        assert r["peak_concurrency"] == 1

    def test_closed_interval_endpoint_overlap(self, ray_session):
        from marginalia_ray.ops.relational import max_concurrent_sessions

        # u2 starts exactly when u1 ends -> both active at that instant
        ev = self._ev([(1, 0), (1, 10), (2, 10), (2, 20)])
        (r,) = max_concurrent_sessions(ev).take_all()
        assert r["peak_concurrency"] == 2


class TestRollupRevenue:
    def test_levels_are_consistent(self, ray_session):
        import ray.data

        from marginalia_ray.ops.relational import rollup_revenue

        sf = "/root/testdata/sf0.001"
        orders = ray.data.read_parquet(
            f"{sf}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"],
        )
        cust = ray.data.read_parquet(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        nat = ray.data.read_parquet(
            f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        rows = rollup_revenue(orders, cust, nat).take_all()
        fine = [r for r in rows if r["n_name"] != "ALL" and r["o_year"] != "ALL"]
        mid = {
            r["n_name"]: r["revenue_cents"]
            for r in rows
            if r["n_name"] != "ALL" and r["o_year"] == "ALL"
        }
        (top,) = [r for r in rows if r["n_name"] == "ALL"]
        assert top["o_year"] == "ALL"
        by_nation = {}
        for r in fine:
            by_nation[r["n_name"]] = by_nation.get(r["n_name"], 0) + r["revenue_cents"]
        assert by_nation == mid
        assert sum(mid.values()) == top["revenue_cents"]
