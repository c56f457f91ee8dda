"""Tests for the round-5 session-2 operators: deterministic k-means +
SemDeDup (l22), gaps-and-islands streaks (w7), curriculum sampling (l23).

The catalog queries themselves are hash-oracled by tools/oracle_check.py
(and the driver's t2 gate); these tests pin the operator-level contracts
the oracle can't see: determinism, empty-cluster carry-forward, planted
duplicates, and the shuffle-count scale claims.
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import Row, functions as F


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


class TestKmeans:
    def test_fit_deterministic(self, spark, sf_dir):
        from finporter_spark.operators.similarity import kmeans_fit

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        c1 = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=2)
        c2 = kmeans_fit(emb, "vec_id", "embedding", k=4, iters=2)
        assert c1 == c2  # bit-identical across runs, not just close

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        from finporter_spark.operators.similarity import kmeans_fit

        # all points identical: every point lands in cluster 0 after the
        # first assignment, clusters 1..2 must carry their init centroid
        rows = [Row(id=i, v=[1.0, 1.0]) for i in range(3, 9)]
        rows += [Row(id=0, v=[1.0, 1.0]), Row(id=1, v=[5.0, 5.0]),
                 Row(id=2, v=[9.0, 9.0])]
        df = spark.createDataFrame(rows)
        c = kmeans_fit(df, "id", "v", k=3, iters=2)
        # cluster 0 pulls toward the mass at (1,1); 1 and 2 keep only
        # their own init point (or go empty and carry forward) — either
        # way the centroids stay finite and deterministic
        assert len(c) == 3 and all(len(x) == 2 for x in c)
        assert c[2] == [9.0, 9.0]  # only member is itself, mean = itself

    def test_assignment_is_map_only(self, spark, sf_dir):
        from finporter_spark.operators.similarity import (
            kmeans_assign,
            kmeans_fit,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("_ed"),
        )
        cents = kmeans_fit(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            "vec_id", "embedding", k=4, iters=1,
        )
        # the 100 TB claim: assignment is a projection over the scan —
        # zero exchanges, zero Python
        assert _n_exchanges(kmeans_assign(emb, cents)) == 0


class TestKmeansAssignFlat:
    """kmeans_assign_flat is the large-k drop-in for kmeans_assign: the
    contract is EXACT decision parity (cluster AND 6 dp-rounded dist2),
    not closeness — both fold the same doubles left-to-right."""

    def _emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("_ed"),
        )

    @pytest.mark.parametrize("k", [16, 96])
    def test_exact_parity_with_literal_path(self, spark, sf_dir, k):
        import random

        from finporter_spark.operators.similarity import (
            kmeans_assign,
            kmeans_assign_flat,
        )

        rng = random.Random(7)
        cents = [
            [round(rng.uniform(-1, 1), 6) for _ in range(64)]
            for _ in range(k)
        ]
        emb = self._emb(spark, sf_dir)
        a = kmeans_assign(emb, cents).select("vec_id", "cluster", "dist2")
        b = kmeans_assign_flat(emb, cents).select(
            "vec_id", "cluster", "dist2"
        )
        mismatches = (
            a.alias("a")
            .join(b.alias("b"), "vec_id")
            .where(
                (F.col("a.cluster") != F.col("b.cluster"))
                | (F.col("a.dist2") != F.col("b.dist2"))
            )
            .count()
        )
        assert mismatches == 0

    def test_flat_assignment_is_map_only(self, spark, sf_dir):
        import random

        from finporter_spark.operators.similarity import kmeans_assign_flat

        rng = random.Random(11)
        cents = [
            [round(rng.uniform(-1, 1), 6) for _ in range(64)]
            for _ in range(512)
        ]
        # 512 centroids: past the literal path's comfortable ceiling,
        # still zero exchanges and zero Python for the flat path
        assert _n_exchanges(
            kmeans_assign_flat(self._emb(spark, sf_dir), cents)
        ) == 0


class TestSemanticDedup:
    def test_planted_duplicate_dropped(self, spark):
        from finporter_spark.operators.similarity import semantic_dedup

        # two identical vectors (ids 10 < 11) plus isolated others
        rows = [
            Row(id=0, v=[1.0, 0.0, 0.0]),
            Row(id=1, v=[0.0, 1.0, 0.0]),
            Row(id=2, v=[0.0, 0.0, 1.0]),
            Row(id=3, v=[-1.0, 0.5, 0.0]),
            Row(id=10, v=[0.6, 0.8, 0.0]),
            Row(id=11, v=[0.6, 0.8, 0.0]),
        ]
        df = spark.createDataFrame(rows)
        out = {
            r["id"]: (r["cluster"], r["kept"])
            for r in semantic_dedup(
                df, "id", "v", k=2, iters=1, threshold=0.9
            ).collect()
        }
        assert len(out) == 6
        # identical vectors always share a cluster and the higher id loses
        assert out[10][0] == out[11][0]
        assert out[10][1] is True and out[11][1] is False

    def test_kept_iff_no_smaller_neighbor(self, spark, sf_dir):
        from finporter_spark.operators.similarity import semantic_dedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        res = semantic_dedup(emb, "vec_id", "embedding", k=8, iters=2)
        rows = res.collect()
        assert len(rows) == emb.count()
        # every cluster's smallest id is always kept
        smallest = {}
        for r in rows:
            c = r["cluster"]
            if c not in smallest or r["vec_id"] < smallest[c]["vec_id"]:
                smallest[c] = r
        assert all(r["kept"] for r in smallest.values())


class TestStreaks:
    def test_hand_built_streaks(self, spark, sf_dir):
        from finporter_spark.queries.catalog import CATALOG

        q = CATALOG["w7_streaks"][0]
        # hand-check against a tiny frame through the same plan shape
        days = [(1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-03"),
                (1, "2024-01-05"), (2, "2024-01-01"), (2, "2024-01-03")]
        df = spark.createDataFrame(
            [(u, datetime.datetime.fromisoformat(d + "T12:00:00"), 0.0)
             for u, d in days] * 2,  # duplicated events must not matter
            "user_id long, ts timestamp, value double",
        )
        from pyspark.sql import Window

        d = df.select("user_id", F.to_date("ts").alias("day")).distinct()
        w = Window.partitionBy("user_id").orderBy("day")
        grp = F.date_sub(F.col("day"), F.row_number().over(w))
        got = sorted(
            d.withColumn("_g", grp)
            .groupBy("user_id", "_g")
            .agg(F.count("*").alias("n"), F.min("day").alias("s"))
            .select("user_id", "n", F.col("s").cast("string"))
            .collect()
        )
        assert [tuple(r) for r in got] == [
            (1, 1, "2024-01-05"),
            (1, 3, "2024-01-01"),
            (2, 1, "2024-01-01"),
            (2, 1, "2024-01-03"),
        ]
        # and the catalog query runs with exactly two exchanges
        # (distinct + window; the groupBy reuses the window partitioning)
        res = q(spark, sf_dir)
        assert res.count() > 0
        assert _n_exchanges(res) <= 3

    def test_streaks_cover_all_days(self, spark, sf_dir):
        from finporter_spark.queries.catalog import CATALOG

        res = CATALOG["w7_streaks"][0](spark, sf_dir)
        total = res.agg(F.sum("streak_days")).collect()[0][0]
        days = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", F.to_date("ts").alias("d"))
            .distinct()
            .count()
        )
        assert total == days  # islands partition the distinct days


class TestCurriculumSample:
    def test_map_only_plan(self, spark, sf_dir):
        from finporter_spark.queries.catalog import CATALOG

        res = CATALOG["l23_curriculum_sample"][0](spark, sf_dir)
        # no keyed shuffle at any scale: the only allowed exchange is the
        # round-robin scoring spread (needed because the test file is one
        # row group); specifically no hashpartitioning / aggregate
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert _n_exchanges(res) <= 1
        assert "hashpartitioning" not in plan
        assert "Aggregate" not in plan

    def test_bins_and_rates(self, spark, sf_dir):
        from finporter_spark.queries.catalog import CATALOG

        res = CATALOG["l23_curriculum_sample"][0](spark, sf_dir)
        rows = res.collect()
        assert rows, "sample must be non-empty"
        assert set(r["bin"] for r in rows) <= {"high", "mid", "low"}
        # acceptance is keyed on doc_id only: rerunning gives the same set
        again = CATALOG["l23_curriculum_sample"][0](spark, sf_dir).collect()
        assert sorted(r["doc_id"] for r in rows) == sorted(
            r["doc_id"] for r in again
        )
