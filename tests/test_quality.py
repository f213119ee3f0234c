"""Data-quality operators: fixture truths for snapshot diff, profile,
duplicate audit, and an error bound for the approximate percentiles
(which are rows-only in the registry)."""

from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators import quality as Q
from aws_csp_datapipeline_spark.plans.registry import queries


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, "D")],
        "k long, price double, st string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 21.0, "B"), (3, 30.0, "C"), (5, 50.0, "E")],
        "k long, price double, st string",
    )
    out = {
        r["k"]: r["diff_status"]
        for r in Q.snapshot_diff(old, new, ["k"], ["price", "st"]).collect()
    }
    # NULL -> 30.0 must register as changed (null-safe compare).
    assert out == {
        1: "unchanged",
        2: "changed",
        3: "changed",
        4: "removed",
        5: "added",
    }


def test_profile_columns_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", 2), (None, 2)],
        "s string, x int",
    )
    out = {
        r["column_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in Q.profile_columns(df, ["s", "x"]).collect()
    }
    assert out == {"s": (4, 1, 2), "x": (4, 1, 2)}


def test_duplicate_key_audit(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (2, 2)], "a int, b int"
    )
    row = Q.duplicate_key_audit(df, ["a", "b"]).collect()[0]
    assert (row["n_dup_keys"], row["max_multiplicity"]) == (1, 3)
    clean = Q.duplicate_key_audit(df.distinct(), ["a", "b"]).collect()[0]
    assert (clean["n_dup_keys"], clean["max_multiplicity"]) == (0, 1)


def test_approx_percentile_error_bound(spark, sf_oracle):
    """Sketch percentiles must sit within 1% relative error of the
    exact order statistics at accuracy=10000."""
    approx = {
        r["o_orderpriority"]: (r["p25"], r["p50"], r["p75"], r["p95"])
        for r in queries()["a15_approx_percentile"](spark, sf_oracle).collect()
    }
    o = load_table(spark, sf_oracle, "orders")
    exact_rows = o.groupBy("o_orderpriority").agg(
        *[
            F.expr(
                f"percentile(o_totalprice, {p})"
            ).alias(f"e{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.95)
        ]
    ).collect()
    for r in exact_rows:
        got = approx[r["o_orderpriority"]]
        for g, e in zip(got, (r["e25"], r["e50"], r["e75"], r["e95"])):
            assert abs(g - e) / e < 0.01, (r["o_orderpriority"], g, e)


def test_file_manifest_matches_pyarrow(spark, sf_smoke):
    """dq14's per-file manifest must agree with pyarrow's per-file
    ground truth (row count and key min/max)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from aws_csp_datapipeline_spark.plans.q_quality import dq14_file_manifest

    got = {
        r["file"]: (r["n_rows"], r["min_orderkey"], r["max_orderkey"])
        for r in dq14_file_manifest(spark, sf_smoke).collect()
    }
    path = f"{sf_smoke}/lineitem.parquet"
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(f"{path}/*.parquet")
    )
    want = {}
    for f in files:
        col = pq.read_table(f, columns=["l_orderkey"])["l_orderkey"]
        import pyarrow.compute as pc

        want[os.path.basename(f)] = (
            len(col),
            pc.min(col).as_py(),
            pc.max(col).as_py(),
        )
    assert got == want


def test_join_cardinality_estimate_is_exact(spark, sf_smoke):
    """dq13's histogram-product estimate must equal the true join
    cardinality for an equi-join — the estimator is exact, only
    cheaper."""
    from aws_csp_datapipeline_spark.catalog import load_table
    from aws_csp_datapipeline_spark.plans.q_quality import (
        dq13_join_cardinality,
    )

    est = dq13_join_cardinality(spark, sf_smoke).collect()[0]
    o = load_table(spark, sf_smoke, "orders")
    c = load_table(spark, sf_smoke, "customer")
    actual = o.join(c, o.o_custkey == c.c_custkey).count()
    # est_join_rows is a stringified DECIMAL(38,0) since the r9
    # type-parity fix (beyond-int64 exactness, hash-stable type)
    assert int(est["est_join_rows"]) == actual


def test_corpus_report_tool(tmp_path):
    """The governance-report CLI runs end-to-end and emits every
    section."""
    import os
    import subprocess
    import sys

    from tests.conftest import SF_SMOKE

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    out = tmp_path / "report.md"
    r = subprocess.run(
        [sys.executable, "tools/corpus_report.py", SF_SMOKE, str(out)],
        cwd=repo_root,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    text = out.read_text()
    for section in (
        "Corpus profile",
        "Language mix",
        "Vocabulary health",
        "Duplication",
        "Passage duplication",
        "Near-dup banding",
        "Scorer evaluation",
        "Scaling-law subsets",
        "Pre-flight diagnostics",
    ):
        assert section in text


def test_fd_violation_counts_shared_scan(spark):
    """One-pass multi-FD audit (dq19's operator): exact counts per
    dependency, zero-violation FDs still emit a row, mixed-type slots
    fall back to string injectively, and the table is scanned ONCE
    (one FileScan in the physical plan vs one per FD in the k-pass
    form)."""
    from aws_csp_datapipeline_spark.operators.quality import (
        FunctionalDependency as FD,
        fd_violation_counts,
    )

    rows = [
        # k -> v holds; k -> w violated for k=1; (k,g) -> v holds
        (1, "a", 10, "x"),
        (1, "a", 10, "y"),
        (2, "b", 20, "z"),
        (2, "b", 20, "z"),
        (3, None, 30, None),   # NULL dependent: never a violation
        (3, None, 30, None),
    ]
    df = spark.createDataFrame(rows, "k int, g string, v int, w string")
    out = {
        r["dependency"]: r["violating_keys"]
        for r in fd_violation_counts(
            df,
            [
                FD("k->v", ("k",), "v"),
                FD("k->w", ("k",), "w"),
                FD("k,g->v", ("k", "g"), "v"),
                # mixed-type slot: det int vs string in position 0
                FD("g->v", ("g",), "v"),
            ],
        ).collect()
    }
    assert out == {"k->v": 0, "k->w": 1, "k,g->v": 0, "g->v": 0}

    plan = fd_violation_counts(df, [FD("k->v", ("k",), "v"),
                                    FD("k->w", ("k",), "w")])
    # shared scan: the input relation appears once in the plan
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert phys.count("LocalTableScan") + phys.count("Scan ") <= 2


def test_dq19_single_lineitem_scan(spark, sf_oracle):
    """The registered dq19 plan reads lineitem ONCE (dq15's per-FD
    form scans it once per dependency)."""
    from aws_csp_datapipeline_spark.plans.registry import queries

    df = queries()["dq19_fd_multi_audit"](spark, sf_oracle)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("lineitem.parquet") <= 1 or phys.count("Scan parquet") == 1


def test_k_anonymity_flags_under_k_classes(spark, tmp_path):
    """Planted quasi-identifier classes: a 2-member class must be
    reported with its size, a 6-member class must not (k=5), and the
    balance generalization must bucket by floor(x/1000)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_csp_datapipeline_spark.plans.registry import queries

    rows = []
    for i in range(6):  # safe class: 6 members
        rows.append((i, 1, "AUTO", 1500.0 + i))
    for i in range(2):  # leaky class: 2 members
        rows.append((100 + i, 2, "HOUSE", -250.0))
    pq.write_table(
        pa.table(
            {
                "c_custkey": [r[0] for r in rows],
                "c_nationkey": [r[1] for r in rows],
                "c_mktsegment": [r[2] for r in rows],
                "c_acctbal": [r[3] for r in rows],
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    got = queries()["dq20_k_anonymity"](spark, str(tmp_path)).collect()
    assert len(got) == 1
    (r,) = got
    assert (r["c_nationkey"], r["c_mktsegment"], r["bal_bucket"],
            r["group_size"]) == (2, "HOUSE", -1, 2)
