"""Analytic queries — the query surface the reference's stored data is
*designed for* but never computes (SURVEY.md §2.11: window functions, grouped
aggregation, top-k) plus TPC-H-style multi-join aggregates that serve as the
engine's benchmark headliners (bench.py).

Determinism: every multi-row float SUM uses the integer-scaled exact form
(functions/exact.py); every ranking window carries a total-order tie-break.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..functions.exact import cents, exact_money_sum, sql_exact_money_sum
from ..sources import load_table
from .registry import query

REVENUE = "l_extendedprice * (1.0 - l_discount)"


@query(
    "flagship_regional_revenue",
    """
    SELECT r_name, n_name,
           {rev} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """.format(rev=sql_exact_money_sum(REVENUE, 10_000)),
    doc="Flagship (TPC-H Q5 shape) — discounted revenue by region/nation. "
    "Physical plan at scale: one shuffle join lineitem⨝orders on orderkey "
    "(the two big tables), every dimension broadcast, partial aggregation "
    "down to 25 output rows. AQE handles orderkey skew.",
)
def flagship_regional_revenue(spark, sf):
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            exact_money_sum(revenue, 10_000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           {sum_base} AS sum_base_price,
           {sum_disc} AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
             / CAST(count(*) AS BIGINT) AS avg_qty,
           {sum_base} / CAST(count(*) AS BIGINT) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-09-02'
    GROUP BY l_returnflag, l_linestatus
    """.format(
        sum_base=sql_exact_money_sum("l_extendedprice"),
        sum_disc=sql_exact_money_sum(REVENUE, 10_000),
    ),
    doc="TPC-H Q1 shape — grouped pricing summary. Map-side partial "
    "aggregation reduces the shuffle to |groups| rows per task; quantities "
    "sum as exact integers, money as exact cents.",
)
def tpch_q1_pricing_summary(spark, sf):
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-09-02").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    qty_sum = F.sum(F.col("l_quantity").cast("long"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        qty_sum.alias("sum_qty"),
        exact_money_sum("l_extendedprice").alias("sum_base_price"),
        exact_money_sum(revenue, 10_000).alias("sum_disc_price"),
        (qty_sum / n).alias("avg_qty"),
        (exact_money_sum("l_extendedprice") / n).alias("avg_price"),
        n.alias("count_order"),
    )


@query(
    "tpch_q3_top_revenue_orders",
    """
    SELECT l_orderkey, {rev} AS revenue, o_orderdate, o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'F'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """.format(rev=sql_exact_money_sum(REVENUE, 10_000)),
    doc="TPC-H Q3 shape — top-10 orders by revenue: join + group + top-k. "
    "TakeOrderedAndProject keeps only 10 rows per task after the aggregate.",
)
def tpch_q3_top_revenue_orders(spark, sf):
    lineitem = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") != "F")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(exact_money_sum(revenue, 10_000).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "w_moving_avg",
    """
    SELECT event_id, user_id, ts,
           (CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
              / 100.0)
             / (COUNT(value) OVER w) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling mean over a row frame — the moving-average query the "
    "reference's README positions the data for (§2.11). Window sums use "
    "exact integer cents so frame-accumulation order is irrelevant.",
)
def w_moving_avg(spark, sf):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        (
            (F.sum(cents("value")).over(w) / F.lit(100.0))
            / F.count("value").over(w)
        ).alias("moving_avg"),
    )


@query(
    "w_lag_pct_change",
    """
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           (value - lag(value) OVER w) / nullif(lag(value) OVER w, 0)
             AS pct_change
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lag/pct_change — per-key return series (§2.11). Per-row arithmetic "
    "on identical doubles is bit-deterministic; nullif guards zero "
    "denominators identically in both engines.",
)
def w_lag_pct_change(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        ((F.col("value") - prev) / F.nullif(prev, F.lit(0.0))).alias("pct_change"),
    )


@query(
    "w_rank_in_group",
    """
    SELECT n_name, c_custkey, spend, rnk FROM (
      SELECT n_name, c_custkey,
             {spend} AS spend,
             CAST(rank() OVER (PARTITION BY n_name
                               ORDER BY {spend} DESC, c_custkey) AS INTEGER)
               AS rnk
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, c_custkey)
    WHERE rnk <= 3
    """.format(spend=sql_exact_money_sum("o_totalprice")),
    doc="rank() over grouped aggregate — top spenders per nation. Aggregate "
    "shuffle on (nation, customer), then a window shuffle on nation only; "
    "tie-broken on the key for determinism.",
)
def w_rank_in_group(spark, sf):
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    spend = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(exact_money_sum("o_totalprice").alias("spend"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("spend"), F.asc("c_custkey"))
    return (
        spend.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "spend", "rnk")
    )


@query(
    "w_sessionize",
    """
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
      FROM events
    ), flags AS (
      SELECT user_id, event_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM t)
    SELECT user_id, event_id,
           CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_id
    FROM flags
    """,
    doc="Gap-based sessionization (30-min inactivity) via lag + running sum "
    "— the batch twin of Structured Streaming session windows "
    "(streaming/incremental.py). Single shuffle on user_id shared by both "
    "windows; integer microsecond math, no float drift.",
)
def w_sessionize(spark, sf):
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tie-break: same-timestamp events otherwise make the running
    # sum (and thus session_id) order-ambiguous run-to-run
    cum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load_table(spark, sf, "events")
        .select("user_id", "event_id", us.alias("us"), F.lag(us).over(w).alias("prev_us"))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_us").isNull()
                | ((F.col("us") - F.col("prev_us")) > 1_800_000_000),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("new_sess").over(cum).alias("session_id"),
        )
    )


@query(
    "g_rollup_priority",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {total} AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """.format(total=sql_exact_money_sum("o_totalprice")),
    doc="ROLLUP grouping sets — subtotal/grand-total lattice in one pass "
    "(Expand + single aggregate exchange), beyond the reference's surface "
    "(§2.11).",
)
def g_rollup_priority(spark, sf):
    return (
        load_table(spark, sf, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_money_sum("o_totalprice").alias("total_value"),
        )
    )


@query(
    "set_ops_high_value",
    """
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="Set operation (INTERSECT) — §2.11 gap filled; Spark plans it as a "
    "left-semi join over distinct inputs.",
)
def set_ops_high_value(spark, sf):
    orders = load_table(spark, sf, "orders")
    high = orders.filter(F.col("o_totalprice") > 300_000).select("o_custkey")
    open_ = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return high.intersect(open_)


@query(
    "skew_salted_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_value_cents,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events GROUP BY event_type
    """,
    doc="Skew mitigation — two-stage salted aggregation "
    "(operators/skew.py): 5 event types over the whole fact would hash to "
    "≤5 reducers; pre-aggregating on (key, salt16) fans partials across "
    "16×5 reducers, final combine touches ≤16 rows/key. Integer partials "
    "⇒ result bit-identical to the plain GROUP BY oracle.",
)
def skew_salted_agg(spark, sf):
    from ..operators.skew import salted_sum_count

    events = load_table(spark, sf, "events")
    return salted_sum_count(
        events,
        ["event_type"],
        {"sum_value_cents": cents("value")},
        n_salts=16,
    )


@query(
    "skew_salted_join",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, o_orderdate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    doc="Skew mitigation — salted equi-join (operators/skew.py): big side "
    "salted with a deterministic row hash mod 16, small side exploded 16 "
    "ways, join on (key, salt) splits any hot orderkey across 16 tasks. "
    "Result-identical to the plain join (each big row meets exactly its "
    "one small-side replica); the unsalted form is preferred until the "
    "key histogram says otherwise — this is the explicit fallback when "
    "AQE's runtime skew split cannot help (e.g. aggregation-free "
    "pipelines with downstream key partitioning requirements).",
)
def skew_salted_join(spark, sf):
    from ..operators.skew import salted_join

    lineitem = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    return salted_join(lineitem, orders, "l_orderkey", n_salts=16)


@query(
    "stream_windowed_counts",
    """
    SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start,
           CAST(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS TIMESTAMP)
             AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2, 3
    """,
    doc="Watermarked tumbling-window aggregation "
    "(streaming/incremental.py:windowed_event_counts) — the identical plan "
    "runs under Structured Streaming with late-data state eviction "
    "(withWatermark bounds memory); here executed in batch mode against "
    "the SQL time-bucket oracle. Streaming-mode semantics (availableNow "
    "drain + foreachBatch upsert) are covered in tests.",
)
def stream_windowed_counts(spark, sf):
    from ..streaming.incremental import windowed_event_counts

    return windowed_event_counts(
        load_table(spark, sf, "events"),
        window_duration="1 hour",
        watermark="2 hours",
        key_col="event_type",
    )


@query(
    "tpch_q4_exists_semi",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape — correlated EXISTS decorrelated to a LEFT SEMI "
    "join: the lineitem side reduces to distinct qualifying orderkeys "
    "before the join, the semi join emits each order at most once, then a "
    "5-group aggregate. No row explosion at any scale.",
)
def tpch_q4_exists_semi(spark, sf):
    orders = load_table(spark, sf, "orders")
    late = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey")
    )
    return (
        orders.join(
            late, orders.o_orderkey == late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q13_custdist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape — customer order-count distribution: LEFT OUTER "
    "join keeps zero-order customers (count(o_orderkey) ignores the null "
    "match), then a second aggregate over the first's output. Two "
    "shuffles total; the second input is already tiny (|customers| rows).",
)
def tpch_q13_custdist(spark, sf):
    customer = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "sketch_event_profile",
    None,  # HLL/KLL sketch values are engine-specific — accuracy tested
    doc="Sketch aggregates per event_type: HyperLogLog++ distinct users "
    "(approx_count_distinct, rsd 2%) and KLL-style value quantiles "
    "(percentile_approx p50/p95/p99). Both are mergeable partial "
    "aggregates — constant memory per partition at any scale, one "
    "shuffle of sketch buffers, no exact-distinct row explosion. Tests "
    "bound approx error against exact answers.",
)
def sketch_event_profile(spark, sf):
    events = load_table(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias(
            "value_quantiles"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "w_running_total",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           {cum} AS cum_spend
    FROM orders
    """.format(
        cum="CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0"
    ),
    doc="Running per-customer spend: cumulative window sum with a total "
    "order (date, orderkey tie-break) so every prefix is deterministic; "
    "integer cents inside the frame keep the running double exact. One "
    "hash shuffle on the partition key.",
)
def w_running_total(spark, sf):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(cents("o_totalprice")).over(w) / F.lit(100.0)).alias(
            "cum_spend"
        ),
    )


@query(
    "w_ntile_deciles",
    """
    SELECT event_id, event_type, value,
           CAST(ntile(10) OVER (PARTITION BY event_type
                ORDER BY value, event_id) AS INTEGER) AS decile
    FROM events WHERE value IS NOT NULL
    """,
    doc="Per-key decile assignment via ntile(10) with an id tie-break "
    "(equal values land deterministically). The building block for "
    "quality-score stratified sampling of training data.",
)
def w_ntile_deciles(spark, sf):
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        load_table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            "value",
            F.ntile(10).over(w).alias("decile"),
        )
    )


@query(
    "g_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {total} AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """.format(total=sql_exact_money_sum("o_totalprice")),
    doc="CUBE over (status, priority): all four grouping sets in ONE "
    "aggregation pass (Spark expands the grouping sets in the same "
    "hash-aggregate, partial-combined). NULL marks the rolled-up "
    "dimensions, matching ANSI semantics on both engines.",
)
def g_cube_status_priority(spark, sf):
    orders = load_table(spark, sf, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_money_sum("o_totalprice").alias("total_value"),
    )
