"""Bucketed co-located joins: correctness + the no-Exchange plan property."""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.operators.bucketing import (
    co_located_join,
    write_bucketed,
)

from .conftest import SF_SMALL


def _explain(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_is_exchange_free_and_correct(spark, tmp_path):
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_totalprice"
    )
    write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "l"), ["l_orderkey"], 8
    )
    write_bucketed(orders, "b_orders", str(tmp_path / "o"), ["l_orderkey"], 8)
    try:
        # force a merge join (small fixture would auto-broadcast, which
        # makes the planner skip bucketed scans entirely); at real scale
        # SMJ is what the planner picks on its own for big-big
        joined = (
            spark.table("b_lineitem")
            .hint("merge")
            .join(spark.table("b_orders"), "l_orderkey")
        )
        plan = _explain(joined)
        # both sides co-bucketed on the join key: no shuffle anywhere
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # correctness vs the plain (shuffling) join
        plain = lineitem.join(orders, "l_orderkey")
        assert joined.count() == plain.count()
        assert joined.exceptAll(plain).count() == 0

        # aggregation on the bucket key also skips its exchange
        agg = (
            spark.table("b_lineitem")
            .groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert "Exchange hashpartitioning" not in _explain(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_mismatched_buckets_fall_back_to_shuffle(spark, tmp_path):
    a = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    b = a.select(F.col("o_orderkey"), F.col("o_totalprice").alias("p2"))
    write_bucketed(a, "bm_a", str(tmp_path / "a"), ["o_orderkey"], 8)
    write_bucketed(b, "bm_b", str(tmp_path / "b"), ["o_orderkey"], 4)
    try:
        joined = co_located_join(spark, "bm_a", "bm_b", "o_orderkey")
        # different bucket counts: at least one side must exchange (or the
        # planner repartitions one side to match) — plan still correct
        assert joined.count() == a.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bm_a")
        spark.sql("DROP TABLE IF EXISTS bm_b")


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned layout: a date predicate prunes to one partition
    directory — the 100 TB answer to q2-style day slices."""
    from global_market_index_etl_spark.sources.tables import load_table

    events = load_table(spark, SF_SMALL, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_date")
    events.write.partitionBy("event_date").mode("overwrite").parquet(path)

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("event_date") == "2024-01-02")
    plan = one_day._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the predicate lands in PartitionFilters (directory pruning), not as a
    # row-level data filter — the scan never lists the other days' files
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "event_date" in pf and "2024-01-02" in pf, pf
    assert one_day.count() == events.filter(
        F.col("event_date") == "2024-01-02"
    ).count()
    assert events.select("event_date").distinct().count() > 1


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from global_market_index_etl_spark.operators.compaction import (
        compact_parquet,
        planned_file_count,
    )

    src = str(tmp_path / "fragmented")
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    # simulate months of incremental ticks: 40 tiny appended files
    events.repartition(40).write.mode("overwrite").parquet(src)
    frag = spark.read.parquet(src)
    assert len(frag.inputFiles()) >= 40

    out = str(tmp_path / "compacted")
    compacted = compact_parquet(spark, src, out, target_bytes=10 * 1024 * 1024)
    assert len(compacted.inputFiles()) == planned_file_count(
        spark, src, 10 * 1024 * 1024
    )
    assert len(compacted.inputFiles()) < len(frag.inputFiles())
    # content identical row-for-row
    assert compacted.count() == events.count()
    assert compacted.exceptAll(frag).count() == 0
    assert frag.exceptAll(compacted).count() == 0


def test_zorder_write_tightens_file_ranges_on_both_dims(spark, tmp_path):
    """Z-order clustering must make each output file cover a small
    rectangle of the two-column value space: the mean per-file range
    fraction on BOTH columns drops far below a single-column sort's
    layout, which leaves the second column at ~full range per file.
    Verified from parquet footer stats — the same stats the reader's
    file/row-group pruning uses."""
    import glob

    import pyarrow.parquet as pq

    from global_market_index_etl_spark.operators.storage import (
        write_zordered,
    )
    from global_market_index_etl_spark.sources.tables import load_table

    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )

    def mean_range_fraction(path, col):
        spans, glob_lo, glob_hi = [], None, None
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            names = [
                md.row_group(0).column(i).path_in_schema
                for i in range(md.num_columns)
            ]
            idx = names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            lo, hi = min(los), max(his)
            spans.append((lo, hi))
            glob_lo = lo if glob_lo is None else min(glob_lo, lo)
            glob_hi = hi if glob_hi is None else max(glob_hi, hi)
        width = float(glob_hi - glob_lo) or 1.0
        return sum((hi - lo) / width for lo, hi in spans) / len(spans)

    z_path = str(tmp_path / "z")
    write_zordered(events, z_path, ["user_id", "value"], n_files=16)
    s_path = str(tmp_path / "s")
    (
        events.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    # single-column sort: user_id tight, value near-full range everywhere
    # (the 62-row files of the tiny fixture undershoot the full span a bit)
    assert mean_range_fraction(s_path, "user_id") < 0.2
    assert mean_range_fraction(s_path, "value") > 0.6
    # z-order: BOTH dimensions tight enough to prune most files
    zu = mean_range_fraction(z_path, "user_id")
    zv = mean_range_fraction(z_path, "value")
    assert zu < 0.35 and zv < 0.35, (zu, zv)

    # rows survive the layout intact
    back = spark.read.parquet(z_path)
    assert back.count() == events.count()
    assert back.agg(F.sum("event_id")).first()[0] == events.agg(
        F.sum("event_id")
    ).first()[0]


def test_zorder_quantile_method_tightens_skewed_column(spark, tmp_path):
    """method='quantile' rank-buckets the grid (operators.zorder) so a
    heavily skewed column still spreads across all cells: per-file
    POPULATION coverage stays tight where linear min/max scaling
    collapses most rows into a few cells. Measured as the mean per-file
    fraction of distinct skewed-key population (the quantity row-group
    pruning actually saves), not value-range."""
    import glob

    from global_market_index_etl_spark.operators.storage import (
        write_zordered,
    )
    from global_market_index_etl_spark.sources.tables import load_table

    # exponential skew: 24 equal-population key values spanning 1..2^23,
    # so a linear min/max grid collapses ~2/3 of the population into its
    # bottom cell while rank buckets keep one value per cell
    events = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value")
        .withColumn(
            "skew_key",
            F.pow(F.lit(2.0), (F.col("user_id") % 24)).cast("long"),
        )
    )

    def mean_pop_fraction(path, col):
        """Mean over files of: fraction of the global population of
        `col` values falling inside the file's [min, max] stats."""
        import pyarrow.parquet as pq

        vals = sorted(
            r[0] for r in events.select(col).distinct().collect()
        )
        fracs = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            names = [
                md.row_group(0).column(i).path_in_schema
                for i in range(md.num_columns)
            ]
            idx = names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            lo, hi = min(los), max(his)
            inside = sum(1 for v in vals if lo <= v <= hi)
            fracs.append(inside / len(vals))
        return sum(fracs) / len(fracs)

    lin = str(tmp_path / "lin")
    write_zordered(events, lin, ["skew_key", "value"], n_files=16)
    qnt = str(tmp_path / "qnt")
    write_zordered(
        events, qnt, ["skew_key", "value"], n_files=16, method="quantile"
    )

    lin_f = mean_pop_fraction(lin, "skew_key")
    qnt_f = mean_pop_fraction(qnt, "skew_key")
    # quantile cells are equal-population: strictly better coverage on
    # the skewed dimension (the core claim), and each file still covers
    # only a sub-rectangle — not the whole dimension
    assert qnt_f < lin_f, (qnt_f, lin_f)
    assert qnt_f < 0.6, qnt_f

    # rows survive both layouts intact
    back = spark.read.parquet(qnt)
    assert back.count() == events.count()
    assert back.agg(F.sum("event_id")).first()[0] == events.agg(
        F.sum("event_id")
    ).first()[0]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        write_zordered(events, str(tmp_path / "x"), ["value"], method="nope")


def test_zorder_key_must_fit_signed_long(spark, tmp_path):
    """bits × columns > 63 silently scrambles the curve (sign bit, JVM
    shift wrap) — zorder_value must refuse it; write_zordered clamps bits
    instead so default params keep working at any column count."""
    import pytest as _pytest

    from global_market_index_etl_spark.operators.storage import (
        write_zordered,
        zorder_value,
    )
    from global_market_index_etl_spark.sources.tables import load_table

    mins = {c: 0 for c in "abcd"}
    maxs = {c: 100 for c in "abcd"}
    with _pytest.raises(ValueError, match="63"):
        zorder_value(list("abcd"), mins, maxs, bits=16)
    with _pytest.raises(ValueError, match="at least one column"):
        zorder_value([], {}, {})
    # 15 bits × 4 columns = 60 ≤ 63: fine
    zorder_value(list("abcd"), mins, maxs, bits=15)

    # the writer clamps: 4 columns at the default 16 bits must succeed
    events = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value", "ts"
    ).withColumn("ts", F.col("ts").cast("timestamp").cast("long"))
    path = str(tmp_path / "z4")
    write_zordered(
        events, path, ["event_id", "user_id", "value", "ts"], n_files=4
    )
    assert spark.read.parquet(path).count() == events.count()


# --------------------------------------------------------------------- #
# manifest-level data skipping (round 8)
# --------------------------------------------------------------------- #


def test_manifest_stats_prune_files_and_preserve_answers(spark, tmp_path):
    """A stats-tracked, cluster_by-written table must (a) return the same
    rows pruned or not, and (b) actually plan fewer files when pruned."""
    from global_market_index_etl_spark.operators.storage import (
        _prune_manifest_files,
        _read_manifest,
        read_table,
        write_bucketed_table,
    )
    from global_market_index_etl_spark.sources.tables import load_table

    path = str(tmp_path / "tbl")
    events = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value")
    )
    write_bucketed_table(
        events,
        path,
        ["event_id"],
        n_buckets=4,
        stats_columns=["value"],
        cluster_by=["value"],
        max_records_per_file=60,
    )
    _, manifest = _read_manifest(spark, path)
    assert manifest.get("stats")  # footer stats landed in the manifest
    n_files = sum(len(v) for v in manifest["buckets"].values())
    assert n_files > 4  # maxRecordsPerFile split each bucket

    lo, hi = 40.0, 45.0
    full = sorted(
        map(
            tuple,
            read_table(spark, path)
            .filter((F.col("value") >= lo) & (F.col("value") <= hi))
            .collect(),
        )
    )
    pruned_df = read_table(spark, path, prune={"value": (lo, hi)}).filter(
        (F.col("value") >= lo) & (F.col("value") <= hi)
    )
    assert sorted(map(tuple, pruned_df.collect())) == full

    _, total, kept = _prune_manifest_files(manifest, {"value": (lo, hi)})
    assert kept < total, f"no files pruned ({kept}/{total})"
    # the planned scan really shrinks, not just the bookkeeping
    assert len(pruned_df.inputFiles()) == kept


def test_manifest_stats_survive_merge(spark, tmp_path):
    """MERGE keeps the stats map coherent: replaced files drop out, staged
    files gain footer stats, and pruned reads stay exact afterwards."""
    from global_market_index_etl_spark.operators.storage import (
        _read_manifest,
        merge_into_parquet,
        read_table,
        write_bucketed_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "k long, value double"
    )
    write_bucketed_table(
        base, path, ["k"], n_buckets=4, stats_columns=["value"],
        cluster_by=["value"],
    )
    batch = spark.createDataFrame(
        [(5, 1000.0), (300, 2000.0)], "k long, value double"
    )
    merge_into_parquet(spark, path, batch, key_columns=["k"], n_buckets=4)
    _, manifest = _read_manifest(spark, path)
    live = {f for files in manifest["buckets"].values() for f in files}
    assert set(manifest["stats"]) <= live  # no stats for dead files
    assert set(manifest["stats"]) == live  # merged files re-statted

    got = sorted(
        map(
            tuple,
            read_table(spark, path, prune={"value": (900.0, None)})
            .filter(F.col("value") >= 900.0)
            .collect(),
        )
    )
    assert got == [(5, 1000.0), (300, 2000.0)]


def test_prune_is_conservative_without_stats(spark, tmp_path):
    """A table written WITHOUT stats_columns ignores prune (all files
    kept) — pruning can never turn into a wrong filter."""
    from global_market_index_etl_spark.operators.storage import (
        read_table,
        write_bucketed_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, value double"
    )
    write_bucketed_table(base, path, ["k"], n_buckets=4)
    full = read_table(spark, path).count()
    assert read_table(spark, path, prune={"value": (5.0, 6.0)}).count() == full


def test_optimize_table_compacts_and_restores_pruning(spark, tmp_path):
    """OPTIMIZE after fragmenting merges: fewer files, identical rows,
    refreshed stats that prune again, and time travel to the pre-optimize
    layout still works under retain_versions."""
    from global_market_index_etl_spark.operators.storage import (
        _prune_manifest_files,
        _read_manifest,
        merge_into_parquet,
        optimize_table,
        read_table,
        write_bucketed_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(400)], "k long, value double"
    )
    write_bucketed_table(
        base, path, ["k"], n_buckets=4, stats_columns=["value"],
        cluster_by=["value"],
    )
    # fragment every bucket with several merges (each moves in new files
    # with WIDE value ranges — pruning decays)
    for lo in (0, 100, 200, 300):
        batch = spark.createDataFrame(
            [(i, float(i) + 0.5) for i in range(lo, lo + 100, 7)],
            "k long, value double",
        )
        merge_into_parquet(
            spark, path, batch, key_columns=["k"], n_buckets=4,
            retain_versions=5,
        )
    pre_version, pre_manifest = _read_manifest(spark, path)
    pre_rows = sorted(map(tuple, read_table(spark, path).collect()))

    n = optimize_table(
        spark, path, cluster_by=["value"], max_records_per_file=60,
        retain_versions=5,
    )
    assert n == 4
    post_version, post_manifest = _read_manifest(spark, path)
    assert post_version == pre_version + 1

    # identical content
    assert sorted(map(tuple, read_table(spark, path).collect())) == pre_rows
    # pruning effective again (tight per-file ranges from the re-sort)
    band = {"value": (40.0, 60.0)}
    _, tot_pre, kept_pre = _prune_manifest_files(pre_manifest, band)
    _, tot_post, kept_post = _prune_manifest_files(post_manifest, band)
    assert kept_post / tot_post < kept_pre / max(tot_pre, 1)
    got = sorted(
        map(
            tuple,
            read_table(spark, path, prune=band)
            .filter((F.col("value") >= 40.0) & (F.col("value") <= 60.0))
            .collect(),
        )
    )
    expect = [t for t in pre_rows if 40.0 <= t[1] <= 60.0]
    assert got == expect
    # time travel to the pre-optimize snapshot still reads (files retained)
    assert (
        sorted(
            map(tuple, read_table(spark, path, version=pre_version).collect())
        )
        == pre_rows
    )


def test_optimize_zorder_prunes_both_dimensions(spark, tmp_path):
    """OPTIMIZE ZORDER (round 13): after the Morton re-layout a 2-D band
    prunes files on BOTH columns, where the linear cluster_by layout only
    serves its first column — and content stays row-identical. Also pins
    the cluster_by/zorder_by mutual exclusion."""
    import pytest as _pytest

    from global_market_index_etl_spark.operators.storage import (
        _prune_manifest_files,
        _read_manifest,
        optimize_table,
        read_table,
        write_bucketed_table,
    )

    # two independent uniform dimensions: (i % 100, i // 100 scattered)
    rows = [
        (i, float(i % 100), float((i * 37) % 100)) for i in range(4000)
    ]
    base = spark.createDataFrame(rows, "k long, x double, y double")

    def build(path, **optimize_kwargs):
        write_bucketed_table(
            base, path, ["k"], n_buckets=4, max_records_per_file=250
        )
        optimize_table(
            spark, path, max_records_per_file=250, **optimize_kwargs
        )
        _, manifest = _read_manifest(spark, path)
        return manifest

    z_path = str(tmp_path / "z")
    z_manifest = build(
        z_path, zorder_by=["x", "y"], stats_columns=["x", "y"]
    )
    l_path = str(tmp_path / "l")
    l_manifest = build(
        l_path, cluster_by=["x"], stats_columns=["x", "y"]
    )

    band = {"x": (20.0, 30.0), "y": (20.0, 30.0)}
    _, z_tot, z_kept = _prune_manifest_files(z_manifest, band)
    _, l_tot, l_kept = _prune_manifest_files(l_manifest, band)
    # both layouts prune on x; only zorder also prunes on y
    assert z_kept < z_tot
    assert z_kept / z_tot < l_kept / max(l_tot, 1), (
        f"zorder kept {z_kept}/{z_tot}, linear kept {l_kept}/{l_tot}"
    )

    # identical content through the re-layout, pruned read exact
    expect = sorted(
        t for t in rows if 20.0 <= t[1] <= 30.0 and 20.0 <= t[2] <= 30.0
    )
    got = sorted(
        map(
            tuple,
            read_table(spark, z_path, prune=band)
            .filter(
                (F.col("x") >= 20.0) & (F.col("x") <= 30.0)
                & (F.col("y") >= 20.0) & (F.col("y") <= 30.0)
            )
            .collect(),
        )
    )
    assert got == expect

    with _pytest.raises(ValueError, match="mutually exclusive"):
        optimize_table(
            spark, z_path, cluster_by=["x"], zorder_by=["x", "y"]
        )
    with _pytest.raises(ValueError, match="zorder_method"):
        optimize_table(
            spark, z_path, zorder_by=["x", "y"], zorder_method="hilbert"
        )


def test_optimize_zorder_quantile_tightens_skewed_column(spark, tmp_path):
    """zorder_method='quantile' (the write_zordered dial, on OPTIMIZE):
    with an exponentially skewed column a linear grid collapses the dense
    region into one cell (the Morton key carries no information there),
    while rank buckets keep equal-population cells — a band inside the
    dense region prunes files only under the quantile grid."""
    from global_market_index_etl_spark.operators.storage import (
        _prune_manifest_files,
        _read_manifest,
        optimize_table,
        write_bucketed_table,
    )

    # x uniform; y exponentially skewed: 90% of rows in [0, 10), a tail
    # out to ~1e6 — the linear grid's bottom cell swallows the dense mass
    rows = [
        (
            i,
            float(i % 100),
            float(i % 10) if i % 10 < 9 else float(2 ** (10 + i % 10)),
        )
        for i in range(4000)
    ]
    base = spark.createDataFrame(rows, "k long, x double, y double")

    def kept_fraction(method):
        path = str(tmp_path / method)
        write_bucketed_table(
            base, path, ["k"], n_buckets=4, max_records_per_file=250
        )
        optimize_table(
            spark, path, zorder_by=["x", "y"],
            stats_columns=["x", "y"], max_records_per_file=250,
            zorder_method=method,
        )
        _, manifest = _read_manifest(spark, path)
        # a band at the TOP of the dense region: rank-bucketed files
        # segregate the dense values (ranges like [0,3] / [0,6] miss it),
        # while the linear grid's collapsed cell leaves every dense file
        # spanning [0,8] — nothing prunes
        _, tot, kept = _prune_manifest_files(
            manifest, {"y": (7.0, 8.0)}
        )
        return kept / tot

    assert kept_fraction("quantile") < kept_fraction("linear")


def test_optimize_table_noop_below_threshold(spark, tmp_path):
    from global_market_index_etl_spark.operators.storage import (
        optimize_table,
        write_bucketed_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "k long, value double"
    )
    write_bucketed_table(base, path, ["k"], n_buckets=4)
    # one file per bucket, no cluster_by: nothing to do
    assert optimize_table(spark, path) == 0


def test_optimize_table_retrofits_stats(spark, tmp_path):
    """stats_columns on OPTIMIZE adds skipping to a table written without
    it — every live file gains stats and pruned reads work afterwards."""
    from global_market_index_etl_spark.operators.storage import (
        _read_manifest,
        optimize_table,
        read_table,
        write_bucketed_table,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(300)], "k long, value double"
    )
    write_bucketed_table(base, path, ["k"], n_buckets=4)  # NO stats
    optimize_table(
        spark, path, cluster_by=["value"], max_records_per_file=40,
        stats_columns=["value"],
    )
    _, manifest = _read_manifest(spark, path)
    live = {f for files in manifest["buckets"].values() for f in files}
    assert set(manifest.get("stats", {})) == live
    got = sorted(
        r.k
        for r in read_table(spark, path, prune={"value": (10.0, 20.0)})
        .filter((F.col("value") >= 10.0) & (F.col("value") <= 20.0))
        .collect()
    )
    assert got == list(range(10, 21))


def test_write_zordered_survives_empty_and_all_null(spark, tmp_path):
    """Code-review fix: the empty/all-NULL calibration guard lives in the
    SHARED sort-key helper now, so write_zordered writes a plain layout
    instead of crashing on float(None)."""
    from global_market_index_etl_spark.operators.storage import (
        write_zordered,
    )

    empty = spark.createDataFrame([], "a double, b double")
    p1 = str(tmp_path / "empty")
    write_zordered(empty, p1, ["a", "b"], n_files=4)
    assert spark.read.parquet(p1).count() == 0

    nulls = spark.createDataFrame(
        [(float(i), None) for i in range(10)], "a double, b double"
    )
    p2 = str(tmp_path / "nulls")
    write_zordered(nulls, p2, ["a", "b"], n_files=4)
    assert spark.read.parquet(p2).count() == 10
