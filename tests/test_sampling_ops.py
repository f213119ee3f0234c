"""Behavioral tests for ``functions/sampling.per_group_topk`` — the
skew-proof two-phase per-group top-K.

The load-bearing claim is EXACT equality: under a total order, the
salted two-phase form returns the identical row set (and identical
ranks) as the single-phase window, for any salt bucket count. The
corpus is planted mega-source-skewed (one group holds ~90% of rows)
because that is the regime the salted path exists for."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.functions import sampling as SMP


@pytest.fixture(scope="module")
def skewed(spark):
    """5,000 rows, 5 sources; source 's0' holds ~90% of them. Scores
    are hash-derived (collision-rich across the int range is fine —
    doc_id tie-breaks), ids dense and unique."""
    n = 5_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("s0"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 4 + 1).cast("string")))
        .alias("source"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(97))).alias("__q"),
    )
    return df.persist()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_per_group_topk_salted_equals_single_phase(skewed):
    order = [F.desc("__q"), F.asc("doc_id")]
    single = SMP.per_group_topk(
        skewed, "source", order, 15, key_col="doc_id", salt_buckets=0
    )
    for buckets in (2, 7, 32):
        salted = SMP.per_group_topk(
            skewed, "source", order, 15, key_col="doc_id", salt_buckets=buckets
        )
        assert _rows(salted) == _rows(single), f"buckets={buckets}"


def test_per_group_topk_k_exceeds_group(skewed):
    """k larger than the smallest groups: every row of those groups
    survives with a dense 1..n rank, in both forms."""
    order = [F.desc("__q"), F.asc("doc_id")]
    small_total = skewed.filter(F.col("source") != "s0").count()
    for buckets in (0, 8):
        out = SMP.per_group_topk(
            skewed, "source", order, 10_000, key_col="doc_id", salt_buckets=buckets
        )
        assert out.filter(F.col("source") != "s0").count() == small_total
        ranks = (
            out.filter(F.col("source") == "s1")
            .select("__rk")
            .orderBy("__rk")
            .collect()
        )
        assert [r["__rk"] for r in ranks] == list(range(1, len(ranks) + 1))


def test_per_group_topk_salted_plan_splits_mega_group(skewed):
    """The point of the salted form: phase 1 partitions by
    (group, salt), so the physical plan carries a window keyed on the
    salt column — the mega-group's sort is spread across buckets
    instead of one task. The single-phase plan must NOT pay that
    extra exchange."""
    order = [F.desc("__q"), F.asc("doc_id")]
    salted_plan = (
        SMP.per_group_topk(
            skewed, "source", order, 15, key_col="doc_id", salt_buckets=16
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    single_plan = (
        SMP.per_group_topk(
            skewed, "source", order, 15, key_col="doc_id", salt_buckets=0
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in salted_plan and "__salt" not in single_plan
    assert salted_plan.count("Window") == 2 * single_plan.count("Window")


def test_auto_salt_buckets_gate():
    """OFF at and below the attested-scale threshold (every attested
    plan keeps its measured single-window shape), on beyond — the
    same gating convention as dedup.bucket_cap / auto_sign_bits."""
    assert SMP.auto_salt_buckets(5_000) == 0
    assert SMP.auto_salt_buckets(500_000) == 0
    assert SMP.auto_salt_buckets(500_001) == 32
    assert SMP.auto_salt_buckets(5_000_000) == 32


def test_ml2_scaler_fits_on_train_only(spark, sf_oracle):
    """Leakage discipline: the train split's scaled features read
    exactly (mean 0, std 1) — the statistics were fit there — while
    the test split reads merely NEAR (0, 1): equality there too would
    mean the scaler saw test rows. Group-awareness: the split is by
    l_orderkey, so no order straddles the boundary."""
    from aws_csp_datapipeline_spark.plans.registry import queries

    rows = {
        r["split"]: r
        for r in queries()["ml2_leakage_safe_scaler"](spark, sf_oracle).collect()
    }
    tr, te = rows["train"], rows["test"]
    assert (tr["mean_z_qty"], tr["std_z_qty"]) == (0.0, 1.0)
    assert (tr["mean_z_price"], tr["std_z_price"]) == (0.0, 1.0)
    # test is near-standard but NOT fit: at least one moment differs
    assert (te["mean_z_qty"], te["std_z_qty"], te["mean_z_price"],
            te["std_z_price"]) != (0.0, 1.0, 0.0, 1.0)
    # group-aware split: no l_orderkey on both sides
    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.functions.sampling import hash_split
    import pyspark.sql.functions as F

    s = hash_split(
        load_table(spark, sf_oracle, "lineitem").select("l_orderkey"),
        "l_orderkey", 0.75,
    )
    straddle = (
        s.groupBy("l_orderkey")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0


def test_moore_lewis_prefers_indomain_text(spark, tmp_path):
    """Cross-entropy DIFFERENCE must rank a pool document that copies
    the in-domain reference's phrasing below (better than) generic
    pool text — the Moore-Lewis selection property — and the selected
    flag must mark exactly the bottom quartile."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_csp_datapipeline_spark.plans.registry import queries

    ref_phrase = "the supply chain ledger reconciles every shipment line"
    rows = []
    for i in range(4):  # in-domain reference corpus (src0)
        rows.append((i, f"{ref_phrase} batch {i}", "src0"))
    rows.append((10, ref_phrase + " again and again", "crawl"))  # in-domain-like
    rows.extend(
        (20 + j, f"random noise tokens {j} zz qq xx yy vv ww kk jj", "crawl")
        for j in range(7)
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "source": [r[2] for r in rows],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = {
        r["doc_id"]: r
        for r in queries()["tt16_moore_lewis"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {10} | {20 + j for j in range(7)}  # src0 never scored
    indomain = out[10]["ce_diff"]
    assert all(indomain < out[20 + j]["ce_diff"] for j in range(7))
    assert out[10]["selected"]
    assert sum(1 for r in out.values() if r["selected"]) == 2  # NTILE(4) of 8


class TestPurgedTimeSplit:
    """purged_time_split: planted calendar where every boundary is
    hand-checkable. Dates span day 0..100 -> test starts at
    floor(100*0.8)=80, embargo at 80-10=70 (embargo_days=10)."""

    def _fixture(self, spark):
        import datetime as dt

        d0 = dt.date(2020, 1, 1)
        rows = [
            # entity A: only early rows -> clean train
            ("A", 0), ("A", 50),
            # entity B: early row AND a test-window row -> early row purged
            ("B", 10), ("B", 90),
            # entity C: embargo-zone row (day 75) -> embargo, NOT purged
            # even though C never reaches test
            ("C", 75),
            # entity D: test-only
            ("D", 100),
        ]
        return spark.createDataFrame(
            [(e, d0 + dt.timedelta(days=k)) for e, k in rows],
            "entity string, ts date",
        )

    def test_labels(self, spark):
        from aws_csp_datapipeline_spark.functions.sampling import (
            purged_time_split,
        )

        out = purged_time_split(
            self._fixture(spark), "ts", "entity", test_frac=0.2, embargo_days=10
        )
        got = {(r["entity"], r["day"]): r["split"] for r in out.collect()}
        assert got == {
            ("A", 0): "train",
            ("A", 50): "train",
            ("B", 10): "purged",
            ("B", 90): "test",
            ("C", 75): "embargo",
            ("D", 100): "test",
        }

    def test_boundary_days_inclusive(self, spark):
        import datetime as dt

        from aws_csp_datapipeline_spark.functions.sampling import (
            purged_time_split,
        )

        d0 = dt.date(2020, 1, 1)
        df = spark.createDataFrame(
            [("x", d0), ("y", d0 + dt.timedelta(days=80)),
             ("z", d0 + dt.timedelta(days=70)),
             ("w", d0 + dt.timedelta(days=69)),
             ("t", d0 + dt.timedelta(days=100))],
            "entity string, ts date",
        )
        got = {r["entity"]: r["split"] for r in purged_time_split(
            df, "ts", "entity", test_frac=0.2, embargo_days=10
        ).collect()}
        # day 80 = first test day (>=), day 70 = first embargo day,
        # day 69 = last train day
        assert got["y"] == "test" and got["z"] == "embargo"
        assert got["w"] == "train" and got["x"] == "train"

    def test_no_entity_overlap_between_train_and_test(self, spark):
        from aws_csp_datapipeline_spark.functions.sampling import (
            purged_time_split,
        )

        out = purged_time_split(
            self._fixture(spark), "ts", "entity", test_frac=0.2, embargo_days=10
        ).collect()
        train = {r["entity"] for r in out if r["split"] == "train"}
        test = {r["entity"] for r in out if r["split"] == "test"}
        assert not train & test

    def test_validation(self, spark):
        import pytest

        from aws_csp_datapipeline_spark.functions.sampling import (
            purged_time_split,
        )

        df = self._fixture(spark)
        with pytest.raises(ValueError, match="test_frac"):
            purged_time_split(df, "ts", "entity", test_frac=1.0)
        with pytest.raises(ValueError, match="embargo_days"):
            purged_time_split(df, "ts", "entity", embargo_days=-1)


class TestEpochExpand:
    """epoch_expand: hand-computable weights -> exact copy counts,
    reproduced against a python md5-coin reference."""

    def _fixture(self, spark):
        # source A: 2 docs x weight 100 (ws=200); B: 8 docs x 100
        # (ws=800). total=1000, ns=2 -> e_A=2.5, e_B=0.625.
        rows = [(f"A", i, 100) for i in range(2)] + [
            ("B", 10 + i, 100) for i in range(8)
        ]
        return spark.createDataFrame(
            rows, "source string, doc_id long, w long"
        )

    @staticmethod
    def _ref_k(doc_id, e):
        import hashlib
        import math

        coin = int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16
        )
        frac_gate = math.floor((e - math.floor(e)) * 16777216.0)
        return int(math.floor(e)) + (1 if coin < frac_gate else 0)

    def test_exact_copy_counts(self, spark):
        from aws_csp_datapipeline_spark.functions.sampling import epoch_expand

        out = epoch_expand(
            self._fixture(spark), "source", "doc_id", "w"
        ).collect()
        got = {}
        for r in out:
            got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
            assert 1 <= r["copy_idx"] <= got[r["doc_id"]] + 3
        for d in range(2):
            assert got.get(d, 0) == self._ref_k(d, 2.5)
        for d in range(10, 18):
            assert got.get(d, 0) == self._ref_k(d, 0.625)
        # copy_idx is dense 1..k per doc
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
        assert all(
            sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values()
        )

    def test_max_epochs_cap_is_exact(self, spark):
        from aws_csp_datapipeline_spark.functions.sampling import epoch_expand

        # tiny source: 1 doc weight 1 vs 99 -> uncapped e = 100/2 = 50
        df = spark.createDataFrame(
            [("tiny", 1, 1), ("big", 2, 99)],
            "source string, doc_id long, w long",
        )
        out = epoch_expand(df, "source", "doc_id", "w", max_epochs=4.0).collect()
        tiny = [r for r in out if r["source"] == "tiny"]
        # e capped at exactly 4.0 -> frac 0 -> exactly 4 copies, no coin
        assert len(tiny) == 4

    def test_validation(self, spark):
        import pytest

        from aws_csp_datapipeline_spark.functions.sampling import epoch_expand

        with pytest.raises(ValueError, match="max_epochs"):
            epoch_expand(
                self._fixture(spark), "source", "doc_id", "w", max_epochs=0
            )


def test_epoch_expand_zero_weight_source_gets_cap(spark):
    """A source whose docs are all zero-weight has an undefined share;
    repeating it is free, so it gets max_epochs exactly (and the
    guard keeps ANSI mode from erroring on the division)."""
    from aws_csp_datapipeline_spark.functions.sampling import epoch_expand

    df = spark.createDataFrame(
        [("empty", 1, 0), ("empty", 2, 0), ("real", 3, 100)],
        "source string, doc_id long, w long",
    )
    out = epoch_expand(df, "source", "doc_id", "w", max_epochs=3.0).collect()
    empty = [r for r in out if r["source"] == "empty"]
    assert len(empty) == 6  # 2 docs x exactly 3 copies, no coin


class TestScalingLawSubsets:
    def test_labels_match_python_coin_and_nesting(self, spark):
        import hashlib

        from aws_csp_datapipeline_spark.functions.sampling import (
            scaling_law_subsets,
        )

        df = spark.createDataFrame(
            [(i,) for i in range(2000)], "doc_id long"
        )
        rows = scaling_law_subsets(df, "doc_id").collect()
        gates = [int((1.0 / 64) * 2**i * 16777216) for i in range(6)]
        n_in = [0] * 6
        for r in rows:
            coin = int(
                hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:6], 16
            )
            want = next((i for i, g in enumerate(gates) if coin < g), None)
            assert r["subset_id"] == want
            if want is not None:
                for i in range(want, 6):
                    n_in[i] += 1
        # nested sizes roughly geometric: each subset about double the
        # previous (coin uniformity over 2000 keys)
        assert n_in[5] > n_in[0] > 0
        assert abs(n_in[5] / 2000 - 0.5) < 0.06

    def test_validation(self, spark):
        import pytest

        from aws_csp_datapipeline_spark.functions.sampling import (
            scaling_law_subsets,
        )

        df = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="base_frac"):
            scaling_law_subsets(df, "doc_id", base_frac=0.0)
        with pytest.raises(ValueError, match="k must"):
            scaling_law_subsets(df, "doc_id", k=0)
        with pytest.raises(ValueError, match="exceeds"):
            scaling_law_subsets(df, "doc_id", base_frac=0.5, k=3)


class TestWeightedTopkSample:
    def test_matches_python_reference_with_safe_margins(self, spark):
        """The E-S selection reproduced independently: same md5 coin,
        same key formula in python floats. Cross-engine log() can
        differ in the last ulp, so also assert every adjacent key gap
        around the k-boundary is astronomically larger than ulp scale
        — the honest precondition for the selection being stable."""
        import hashlib
        import math

        from aws_csp_datapipeline_spark.functions.sampling import (
            weighted_topk_sample,
        )

        rows = [(i, 10 + (i * 37) % 490) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = sorted(
            r["doc_id"]
            for r in weighted_topk_sample(df, "doc_id", "w", k=25).collect()
        )

        def key(i, w):
            u = (
                int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) + 1
            ) / 16777217.0
            return math.log(u) / float(w)

        ranked = sorted(rows, key=lambda r: (-key(*r), r[0]))
        want = sorted(i for i, _ in ranked[:25])
        assert got == want
        ks = sorted((key(*r) for r in rows), reverse=True)
        boundary_gap = ks[24] - ks[25]
        assert boundary_gap > 1e-9  # >> 1 ulp (~1e-17 at this scale)

    def test_excludes_nonpositive_weights_and_validates(self, spark):
        import pytest

        from aws_csp_datapipeline_spark.functions.sampling import (
            weighted_topk_sample,
        )

        df = spark.createDataFrame(
            [(1, 5), (2, 0), (3, None), (4, 7)],
            "doc_id long, w long",
        )
        got = {r["doc_id"] for r in weighted_topk_sample(df, "doc_id", "w", 10).collect()}
        assert got == {1, 4}
        with pytest.raises(ValueError, match="k must"):
            weighted_topk_sample(df, "doc_id", "w", 0)

    def test_heavier_rows_selected_more_often(self, spark):
        """Statistical sanity over disjoint key salts: a 10x-weight
        row family should dominate the selection."""
        from aws_csp_datapipeline_spark.functions.sampling import (
            weighted_topk_sample,
        )

        rows = [(i, 100 if i < 100 else 10) for i in range(1100)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = [r["doc_id"] for r in weighted_topk_sample(df, "doc_id", "w", 100).collect()]
        n_heavy = sum(1 for i in got if i < 100)
        # heavy family is 100 of 1100 rows but 10x weight each: expect
        # roughly half the sample; require a clear majority effect
        assert n_heavy > 30
