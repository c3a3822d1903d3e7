"""The correctness-harness query suite.

Each entry pairs a Spark query (DataFrame API or Spark SQL) with an
equivalent ANSI-SQL oracle that DuckDB runs over the same parquet
tables; the driver hash-compares the two (order-insensitive). Where a
query is expressible in the SQL subset both engines share, the SAME
string is used for both sides so they cannot drift.

Naming: ``b*`` = SURVEY §2 Tier-B shapes the reference exercises
end-to-end (evidence cited per query); ``r*`` = relational operators
absent from the reference but delegated-to-Catalyst (SURVEY §2
"Absent" list — aggregations, windows, sorts, set ops, outer/semi/
anti joins, subqueries, HAVING, DISTINCT...); ``z*`` = Zarr-scan
semantics queries whose oracles reconstruct the store's values with
DuckDB ``range()``; dedup/similarity/text/multimodal ops live in
:mod:`arrow_zarr_spark.operators` and are registered here too.

Determinism conventions (so hashes can match bit-for-bit):
- every computed column is aliased identically on both sides
- float aggregates go through DECIMAL(18,2) accumulation then CAST to
  DOUBLE (order-independent, exact)
- LIMIT always carries a total ORDER BY with a unique tiebreak
- timestamps are reduced to integer parts (year/month/hour) — the
  session timezone is pinned UTC to match DuckDB's naive timestamps
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fixtures

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | None)
_REGISTRY: Dict[str, Tuple[QueryFn, Optional[str]]] = {}


def register_query(name: str, fn: QueryFn, oracle: Optional[str]) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> Dict[str, QueryFn]:
    _ensure_populated()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> Dict[str, str]:
    _ensure_populated()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view named like the oracle's.

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's vectorized
    parquet reader rejects; read nanos as long and convert losslessly
    (integer DIV, not float division — ns-since-epoch overflows a
    double's 53-bit mantissa)."""
    if getattr(spark, "_azs_views_dir", None) == sf_dir:
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        df.createOrReplaceTempView(t)
    spark._azs_views_dir = sf_dir


def _sql_pair(name: str, sql: str) -> None:
    """Register a query that runs the SAME SQL text on Spark and DuckDB."""

    def fn(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(_sql)

    register_query(name, fn, sql)


# ---------------------------------------------------------------------------
# Tier B — query shapes the reference exercises (SURVEY §2 Tier B)
# ---------------------------------------------------------------------------

def _populate_tier_b() -> None:
    # B5/B6 comparison ops incl <=, >=, =, OR (datafusion_filters.rs:188-287)
    _sql_pair(
        "b05_comparisons_or",
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_quantity <= 5 OR l_tax >= 0.07",
    )
    _sql_pair(
        "b06_equality_pred",
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_returnflag = 'R' AND l_linestatus = 'F'",
    )
    # B7 modulo arithmetic in predicate (s3_bench.rs:226)
    _sql_pair(
        "b07_modulo_pred",
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_orderkey % 12 = 0",
    )
    # B8 equi inner join (table_provider.rs:310-327) — DataFrame API with
    # explicit broadcast of the small dims (100-TB posture: nation/region
    # are tiny; never shuffle the fact side for them)
    def b08(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F

        ensure_views(spark, sf_dir)
        customer = spark.table("customer")
        nation = spark.table("nation")
        region = spark.table("region")
        return (
            customer.join(
                F.broadcast(nation),
                customer.c_nationkey == nation.n_nationkey,
            )
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .select(
                "c_custkey",
                "c_name",
                F.col("n_name").alias("nation_name"),
                F.col("r_name").alias("region_name"),
            )
        )

    register_query(
        "b08_equi_join",
        b08,
        "SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey",
    )
    # B9 theta/range self-join (s3_bench.rs:222-229) — broadcast NLJ on the
    # small supplier table, the join the reference benchmarks
    _sql_pair(
        "b09_theta_self_join",
        "SELECT t1.s_suppkey AS k1, t2.s_suppkey AS k2 "
        "FROM supplier t1 JOIN supplier t2 "
        "ON t1.s_suppkey % 12 = 0 AND t1.s_suppkey < t2.s_suppkey + 1 "
        "AND t1.s_suppkey >= t2.s_suppkey - 1",
    )
    # B10/B11 CTE + self-join (table_provider.rs:310-321)
    _sql_pair(
        "b10_cte_self_join",
        "WITH d1 AS (SELECT o_orderkey, o_totalprice FROM orders), "
        "d2 AS (SELECT o_orderkey, o_totalprice * 2 AS price2 FROM orders) "
        "SELECT d1.o_orderkey AS o_orderkey, d1.o_totalprice AS o_totalprice, "
        "d2.price2 AS price2 FROM d1 JOIN d2 ON d1.o_orderkey = d2.o_orderkey",
    )


def _populate_tier_b_deferred() -> None:
    """Tier-B shapes driver-green in r1 AND r2. Window membership is
    governed by DRIVER_WINDOW (slot order no longer follows function
    placement); out-of-window rounds stay parity-enforced by
    tests/test_oracle_parity.py."""
    _sql_pair(
        "b11_self_join_equi",
        "SELECT a.l_orderkey AS l_orderkey, a.l_linenumber AS l_linenumber, "
        "a.l_quantity AS q1, b.l_quantity AS q2 "
        "FROM lineitem a JOIN lineitem b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber",
    )
    # B12 UNION ALL (s3_bench.rs:236-244) — also driver-green on the
    # zarr form (z08, r3)
    _sql_pair(
        "b12_union_all",
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "UNION ALL "
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    )
    # B13 LIMIT (table_provider.rs:300-307) — deterministic via total order
    _sql_pair(
        "b13_limit_topk",
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10",
    )
    # B1 projection list (table_provider.rs:280-281)
    _sql_pair(
        "b01_projection",
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    )
    # B2/B3 scalar expr + alias (table_provider.rs:316-318)
    _sql_pair(
        "b02_scalar_expr_alias",
        "SELECT l_orderkey, l_linenumber, l_extendedprice * 2 AS price2, "
        "l_quantity + 1 AS qty1, l_quantity - 1 AS qtym1 FROM lineitem",
    )
    # B4 WHERE conjunction of range predicates (table_provider.rs:417-422)
    _sql_pair(
        "b04_where_range_conj",
        "SELECT l_orderkey, l_linenumber, l_quantity, l_discount "
        "FROM lineitem WHERE l_quantity < 10 AND l_discount > 0.05",
    )
    # B14 SELECT * (s3_bench.rs:237-243)
    _sql_pair("b14_select_star", "SELECT * FROM nation")


# ---------------------------------------------------------------------------
# Relational operators beyond the reference (SURVEY §2 "Absent" list —
# delegated to Catalyst; exercised here against the DuckDB oracle)
# ---------------------------------------------------------------------------

def _populate_relational() -> None:
    """Relational shapes delegated to Catalyst. Round-4 rotation puts
    all of these INSIDE the 50-slot verification window — their last
    driver-green rows date from r1/r2 (the r3 window went to the
    then-new zarr/operator queries); r36/r37 are new this round."""

    # grouping sets — completes the rollup (r17) / cube (r30) family
    _sql_pair(
        "r36_grouping_sets",
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty "
        "FROM lineitem GROUP BY GROUPING SETS "
        "((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())",
    )
    # NOT EXISTS decorrelated anti-join (complements r16's IN and
    # r11's relational ANTI JOIN with the subquery spelling)
    # the correlated predicate keeps the result non-trivially non-empty
    # (every customer has SOME order in the synthetic data)
    _sql_pair(
        "r37_not_exists",
        "SELECT c_custkey, c_name, c_acctbal FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)",
    )

    _sql_pair(
        "r20_math_case",
        # CEIL/FLOOR(double) → BIGINT in Spark but DOUBLE in DuckDB, and
        # ROUND with no scale is similarly divergent: cast every term so
        # both engines agree on the value type, not just the value.
        "SELECT l_orderkey, l_linenumber, ABS(l_discount - 0.05) AS dev, "
        "CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil, "
        "CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor, "
        "CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct, "
        "CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' "
        "ELSE 'high' END AS qty_band FROM lineitem",
    )

    # multi-way join + agg (TPC-H Q5 shape, the scale-out headline)
    _sql_pair(
        "r21_multiway_join_agg",
        "SELECT n_name, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, "
        "COUNT(*) AS n FROM customer "
        "JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name",
    )

    # aggregation: TPC-H Q1 shape (decimal accumulation => exact, then
    # DOUBLE for a stable comparison type)
    _sql_pair(
        "r01_groupby_agg",
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, "
        "COUNT(*) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus",
    )
    _sql_pair(
        "r02_count_distinct",
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts, "
        "COUNT(*) AS n FROM lineitem GROUP BY l_returnflag",
    )
    _sql_pair(
        "r03_avg_minmax",
        "SELECT l_linestatus, AVG(l_quantity) AS avg_qty, "
        "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price "
        "FROM lineitem GROUP BY l_linestatus",
    )
    _sql_pair(
        "r04_having",
        "SELECT o_custkey, COUNT(*) AS n_orders FROM orders "
        "GROUP BY o_custkey HAVING COUNT(*) > 12",
    )
    _sql_pair(
        "r05_distinct",
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    )
    # sorts / top-k per group (window function with deterministic tiebreak)
    _sql_pair(
        "r06_window_topk_per_group",
        "SELECT o_custkey, o_orderkey, rn FROM ("
        "SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER ("
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn "
        "FROM orders) t WHERE rn <= 3",
    )
    _sql_pair(
        "r07_window_running_sum",
        "SELECT o_custkey, o_orderkey, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS running_total FROM orders",
    )
    _sql_pair(
        "r08_window_lag_rank",
        "SELECT o_custkey, o_orderkey, "
        "LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) "
        "AS prev_order, "
        "RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority, "
        "o_orderkey) AS prio_rank FROM orders",
    )
    # joins beyond inner
    _sql_pair(
        "r09_left_outer_join",
        "SELECT c.c_custkey, o.o_orderkey FROM customer c "
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000",
    )
    # semi/anti joins — DataFrame API (left_semi/left_anti), EXISTS oracle
    def r10(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        customer = spark.table("customer")
        orders = spark.table("orders")
        return customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_semi"
        ).select("c_custkey", "c_name")

    register_query(
        "r10_semi_join",
        r10,
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    )

    def r11(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        customer = spark.table("customer")
        orders = spark.table("orders")
        return customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_anti"
        ).select("c_custkey", "c_name")

    register_query(
        "r11_anti_join",
        r11,
        "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    )
    # set operators
    _sql_pair(
        "r12_intersect",
        "SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer",
    )
    _sql_pair(
        "r13_except",
        "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders",
    )
    _sql_pair(
        "r14_union_distinct",
        "SELECT o_custkey AS k FROM orders UNION SELECT c_custkey AS k FROM customer",
    )
    # subqueries
    _sql_pair(
        "r15_scalar_subquery",
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)",
    )
    _sql_pair(
        "r16_in_subquery",
        "SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')",
    )
    # grouping sets / rollup
    _sql_pair(
        "r17_rollup",
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)",
    )
    # scalar function library: string / date / math / conditional
    _sql_pair(
        "r18_string_funcs",
        "SELECT c_custkey, UPPER(c_name) AS upper_name, "
        "LENGTH(c_name) AS name_len, SUBSTR(c_name, 1, 8) AS name_prefix, "
        "CONCAT(c_mktsegment, '-', c_name) AS seg_name FROM customer",
    )
    _sql_pair(
        "r19_date_parts",
        "SELECT YEAR(o_orderdate) AS order_year, MONTH(o_orderdate) AS "
        "order_month, COUNT(*) AS n FROM orders "
        "GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)",
    )
    # events: time bucketing
    _sql_pair(
        "r22_events_time_agg",
        "SELECT YEAR(ts) AS y, MONTH(ts) AS m, DAY(ts) AS d, event_type, "
        "COUNT(*) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value "
        "FROM events GROUP BY YEAR(ts), MONTH(ts), DAY(ts), event_type",
    )
    _sql_pair(
        "r23_events_user_sessions",
        "SELECT user_id, COUNT(*) AS n_events, "
        "COUNT(DISTINCT event_type) AS n_types "
        "FROM events GROUP BY user_id HAVING COUNT(*) >= 5",
    )
    # grouping sets via CUBE (rollup is r17)
    _sql_pair(
        "r30_cube",
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)",
    )
    # stddev from exact decimal moments (stddev_samp directly would be
    # FP-order-dependent; identical double math from exact inputs isn't)
    _sql_pair(
        "r31_stddev_from_moments",
        "SELECT l_returnflag, ROUND(SQRT((sumsq - s * s / n) / (n - 1)), 6) "
        "AS qty_stddev FROM ("
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * "
        "CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sumsq "
        "FROM lineitem GROUP BY l_returnflag) t",
    )
    # exact interpolated percentile (order-independent, unlike
    # percentile_approx which is r26's rows-only sketch)
    _sql_pair(
        "r32_percentile_cont",
        "SELECT l_returnflag, "
        "PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) "
        "AS median_qty FROM lineitem GROUP BY l_returnflag",
    )
    # regexp extraction (arg forms differ: Spark needs a group index)
    def r33(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(
            "SELECT c_custkey, "
            "CAST(REGEXP_EXTRACT(c_name, '[0-9]+', 0) AS BIGINT) "
            "AS name_num FROM customer"
        )

    register_query(
        "r33_regexp_extract",
        r33,
        "SELECT c_custkey, CAST(REGEXP_EXTRACT(c_name, '[0-9]+') AS BIGINT) "
        "AS name_num FROM customer",
    )
    # TPC-H Q13 shape: left join + count distribution
    _sql_pair(
        "r27_count_distribution",
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count FROM customer "
        "LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) t "
        "GROUP BY c_count",
    )
    # TPC-H Q18 shape: IN over a grouped HAVING subquery
    _sql_pair(
        "r28_having_in_subquery",
        "SELECT c_custkey, o_orderkey, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 120) "
        "GROUP BY c_custkey, o_orderkey",
    )
    # correlated scalar subquery (decorrelation path)
    _sql_pair(
        "r29_correlated_min",
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem "
        "WHERE l_extendedprice = (SELECT MIN(l2.l_extendedprice) "
        "FROM lineitem l2 WHERE l2.l_orderkey = lineitem.l_orderkey)",
    )
    # array functions over the embedding column (higher-order JVM exprs
    # vs DuckDB list functions)
    def r34(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        emb = F.col("embedding")
        l2 = F.sqrt(
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        return spark.table("embeddings").select(
            "vec_id",
            F.round(l2, 6).alias("l2"),
            F.size(emb).alias("dim"),
            F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_val"),
        )

    register_query(
        "r34_array_functions",
        r34,
        "SELECT vec_id, ROUND(SQRT(list_dot_product("
        "CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) "
        "AS l2, CAST(len(embedding) AS INTEGER) AS dim, "
        "ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val "
        "FROM embeddings",
    )

    # JSON extraction from the events props column
    def r35(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.table("events").select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        )

    register_query(
        "r35_json_extract",
        r35,
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) "
        "AS prop_k FROM events",
    )

    # pivot expressed portably via conditional aggregation
    _sql_pair(
        "r24_pivot_conditional",
        "SELECT l_returnflag, "
        "COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_open, "
        "COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_filled "
        "FROM lineitem GROUP BY l_returnflag",
    )


# ---------------------------------------------------------------------------
# Zarr-scan queries — oracles reconstruct store values with DuckDB range()
# ---------------------------------------------------------------------------

def _zarr_df(spark: SparkSession, path: str, view: str) -> DataFrame:
    df = spark.read.format("zarr").load(path)
    df.createOrReplaceTempView(view)
    return df


# F1 values: data = i, lat = 35 + i/8, lon = -120 + i%8  (i = 0..63)
_F1_GEN = (
    "SELECT CAST(i AS DOUBLE) AS data, "
    "CAST(35 + i // 8 AS DOUBLE) AS lat, "
    "CAST(-120 + i % 8 AS DOUBLE) AS lon FROM range(64) t(i)"
)


def _populate_relational_round4_tail() -> None:
    """Round-4 relational completeness additions (never driver-checked
    in r4; the round-5 DRIVER_WINDOW rotates them in): a RANGE window
    frame (r07 covers ROWS frames) and EXISTS (r37 covers NOT
    EXISTS)."""
    _sql_pair(
        "r38_range_frame",
        # RANGE frame over a numeric ORDER BY key: peers within 5
        # quantity units. DECIMAL accumulation per the suite convention.
        "SELECT l_orderkey, l_linenumber, l_quantity, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER ("
        "PARTITION BY l_returnflag ORDER BY l_quantity "
        "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "AS qty_range_sum FROM lineitem",
    )
    _sql_pair(
        "r39_exists",
        "SELECT s_suppkey, s_name FROM supplier s "
        "WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)",
    )


def _populate_relational_round5_tail() -> None:
    """Round-5 completeness additions registered PAST the window
    (round-6 rotation picks them up): NTILE buckets, FIRST/LAST_VALUE
    with explicit full frames, FILTER-clause aggregation, and the
    tumbling-window event stats batch form (the streaming operator's
    driver row — windowed_event_stats was pytest-only until now)."""
    _sql_pair(
        "r40_ntile",
        # NTILE over a total per-group order; DuckDB returns BIGINT and
        # Spark INT, so both sides CAST
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(NTILE(4) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile "
        "FROM orders",
    )
    _sql_pair(
        "r41_first_last_value",
        # explicit UNBOUNDED/UNBOUNDED frame: the default frame for
        # LAST_VALUE (up to CURRENT ROW) differs in spirit across
        # engines, so the full frame is pinned. (l_orderkey,
        # l_linenumber) is NOT unique in the synthetic table, so
        # l_quantity joins the ORDER BY — rows still tied then share
        # the returned value, keeping first/last deterministic
        "SELECT l_orderkey, l_linenumber, "
        "FIRST_VALUE(l_quantity) OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_quantity "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS first_qty, "
        "LAST_VALUE(l_quantity) OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber, l_quantity "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
        "AS last_qty FROM lineitem",
    )
    _sql_pair(
        "r42_filtered_agg",
        # FILTER clause (conditional aggregation without CASE noise)
        "SELECT l_returnflag, "
        "CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big, "
        "CAST(COUNT(*) FILTER (WHERE l_discount < 0.05) AS BIGINT) "
        "AS n_cheap, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) "
        "FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_price "
        "FROM lineitem GROUP BY l_returnflag",
    )

    # correlated LATERAL subquery (both engines accept the same text)
    _sql_pair(
        "r43_lateral_join",
        "SELECT n_name, m.top_price FROM nation, LATERAL ("
        "  SELECT MAX(o_totalprice) AS top_price FROM orders "
        "  JOIN customer ON o_custkey = c_custkey "
        "  WHERE c_nationkey = n_nationkey) m",
    )

    # ordered string aggregation: Spark spells it LISTAGG ... WITHIN
    # GROUP, DuckDB string_agg(... ORDER BY) — same semantics, two
    # spellings, so this row can't use _sql_pair. DISTINCT inputs via
    # the subquery keep the ordered concat fully deterministic.
    def r44(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(
            "SELECT lang, listagg(source, ',') WITHIN GROUP "
            "(ORDER BY source) AS sources FROM "
            "(SELECT DISTINCT lang, source FROM documents) GROUP BY lang"
        )

    register_query(
        "r44_listagg",
        r44,
        "SELECT lang, string_agg(source, ',' ORDER BY source) AS sources "
        "FROM (SELECT DISTINCT lang, source FROM documents) GROUP BY lang",
    )

    # event-time RANGE frame (interval boundary) — same text on both
    # engines; ties share a frame, so the count is order-insensitive
    _sql_pair(
        "r45_time_range_frame",
        "SELECT event_id, user_id, CAST(COUNT(*) OVER ("
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS n_last_hour FROM events",
    )

    def e03(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Tumbling-window event stats (streaming/event_ops.py:65) in
        batch form. The registered projection follows the suite's
        determinism rules: the window struct collapses to its epoch-
        second start (struct columns crash the driver canonicalizer),
        value pre-cast to DECIMAL so the sum is order-independent, and
        the engine-specific approx_count_distinct column is dropped.
        Spark's tumbling windows align to the Unix epoch, so the oracle
        is plain epoch/900 bucket arithmetic."""
        from .streaming.event_ops import windowed_event_stats

        ensure_views(spark, sf_dir)
        ev = spark.table("events").withColumn(
            "value", F.col("value").cast("decimal(38,6)")
        )
        out = windowed_event_stats(ev, window="15 minutes")
        return out.select(
            F.col("win.start").cast("bigint").alias("win_start_s"),
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("total_value").cast("double").alias("total_value"),
        )

    register_query(
        "e03_windowed_stats_batchform",
        e03,
        "SELECT CAST(FLOOR(epoch(ts) / 900) * 900 AS BIGINT) AS win_start_s, "
        "event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value "
        "FROM events GROUP BY 1, 2",
    )


def _populate_relational_round7_tail() -> None:
    """Round-7 completeness additions: the two rank-normalizing
    window functions the inventory still lacked (r40 covers ntile,
    r06/r08 cover rank/dense_rank/row_number/lag). Same text on both
    engines; ROUND(6) keeps the double division order-proof."""
    _sql_pair(
        "r49_percent_rank_cume_dist",
        "SELECT o_orderkey, o_orderpriority, "
        "ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey), 6) AS pr, "
        "ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey), 6) AS cd "
        "FROM orders WHERE o_orderkey < 2000",
    )


def _populate_relational_round6_tail() -> None:
    """Round-6 completeness additions (registered past the window;
    round-7 rotation picks them up): FULL OUTER join and UNPIVOT —
    the last two relational shapes in the inventory with no row."""
    # FULL OUTER: per-nation customer vs supplier rollups where the
    # acctbal filters leave each side with nations the other lacks, so
    # both null-extension directions are exercised. COALESCE keys keep
    # the output null-free on the join key.
    _sql_pair(
        "r46_full_outer_join",
        "SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp "
        "FROM (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) "
        "      AS n_cust FROM customer WHERE c_acctbal > 9000 "
        "      GROUP BY 1) c "
        "FULL OUTER JOIN "
        "(SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp "
        " FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s "
        "ON c.nk = s.nk",
    )
    # UNPIVOT (r24's pivot inverse): wide per-segment metrics to long
    # (segment, metric, value) rows. Metrics use the suite's exact-
    # decimal convention so the doubles are order-independent; the
    # same standard UNPIVOT text parses on both engines.
    _sql_pair(
        "r47_unpivot",
        "SELECT c_mktsegment, metric, v FROM ("
        "  SELECT c_mktsegment, "
        "  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) "
        "    AS sum_bal, "
        "  CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal, "
        "  CAST(COUNT(*) AS DOUBLE) AS n_cust "
        "  FROM customer GROUP BY c_mktsegment) "
        "UNPIVOT (v FOR metric IN (sum_bal, max_bal, n_cust))",
    )
    # WITH RECURSIVE (landed in Spark 4.0; DataFusion lacks it, DuckDB
    # has it) — data-dependent iteration depth per anchor row, then a
    # post-recursion aggregate. Same text on both engines.
    _sql_pair(
        "r48_recursive_cte",
        "WITH RECURSIVE walk(nk, step) AS ("
        "  SELECT n_nationkey, 0 FROM nation WHERE n_regionkey <= 2 "
        "  UNION ALL "
        "  SELECT nk, step + 1 FROM walk WHERE step < nk % 7"
        ") SELECT nk, CAST(MAX(step) AS BIGINT) AS depth, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM walk GROUP BY nk",
    )


def _populate_zarr_round4() -> None:
    """Round-4 zarr addition (driver-green r4, rotated out in r5)."""

    def z17(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Hypertable-style time-bucket rollup over the zarr time
        store: 6-hour buckets of the hourly series, aggregated with the
        suite's exact-decimal sum convention. The continuous-aggregate
        shape time-series engines special-case — here it is a plain
        groupBy on a bucket expression Catalyst folds into the scan
        stage (map-side partial agg; at 100 TB the shuffle carries one
        row per bucket per partition)."""
        path = fixtures.write_time_series_store()
        df = _zarr_df(spark, path, "zarr_time_r4")
        bucket = F.floor(F.hour("time") / 6).cast("long")
        return df.groupBy(bucket.alias("bucket6h")).agg(
            F.count("*").alias("n"),
            F.sum(F.col("val").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_val"),
            F.min("time").alias("bucket_start"),
        )

    register_query(
        "z17_time_rollup",
        z17,
        "SELECT CAST(i // 6 AS BIGINT) AS bucket6h, COUNT(*) AS n, "
        "CAST(SUM(CAST(CAST(i AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) "
        "AS total_val, "
        "MIN(TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 HOUR) "
        "AS bucket_start FROM range(24) t(i) GROUP BY 1",
    )


def _populate_zarr_round5() -> None:
    def z19(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Multi-store union scan (read_zarr_many): two "days" of the
        store-per-day layout read as one DataFrame, each row tagged
        with its store index. Parallelism is the sum of both chunk
        grids; schema equality is validated per store up front."""
        from .datasource import read_zarr_many

        p1 = fixtures.write_lat_lon_store()
        p2 = fixtures.write_lat_lon_store_shifted()
        return read_zarr_many(spark, [p1, p2], source_col="store_idx")

    register_query(
        "z19_multi_store_union",
        z19,
        f"SELECT data, lat, lon, 0 AS store_idx FROM ({_F1_GEN}) "
        "UNION ALL "
        "SELECT CAST(100 + i AS DOUBLE) AS data, "
        "CAST(35 + i // 8 AS DOUBLE) AS lat, "
        "CAST(-120 + i % 8 AS DOUBLE) AS lon, 1 AS store_idx "
        "FROM range(64) t(i)",
    )


def _populate_zarr_round7() -> None:
    def z26(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DDL-schema validation error semantics (SURVEY §2 A3): a
        user-supplied schema whose column type disagrees with the
        store must fail with the reference's exact error text
        (table_provider.rs:440-486, reproduced at datasource.py's
        ``ZarrDataSource.reader``). The query drives the REAL read
        path — ``spark.read.format("zarr").schema(wrong).load(...)``
        plus an action — and returns the surfaced error text as a
        1-row DataFrame; the oracle is the literal string, so any
        drift in the message (or a silent non-error) hash-fails."""
        from pyspark.sql.types import (
            DoubleType,
            StringType,
            StructField,
            StructType,
        )

        from .datasource import register

        register(spark)
        path = fixtures.write_lat_lon_store()
        wrong = StructType(
            [
                StructField("data", StringType()),  # store holds float64
                StructField("lat", DoubleType()),
                StructField("lon", DoubleType()),
            ]
        )
        expected = (
            "Requested column data's type does not match data from store"
        )
        try:
            spark.read.format("zarr").schema(wrong).load(path).take(1)
            msg = "NO ERROR RAISED"
        except Exception as exc:  # noqa: BLE001 — surfaced text is the datum
            text = str(exc)
            msg = expected if expected in text else text[:200]
        return spark.createDataFrame([(msg,)], "error_text string")

    register_query(
        "z26_ddl_validation_error",
        z26,
        "SELECT 'Requested column data''s type does not match data "
        "from store' AS error_text",
    )


def _populate_relational_rotated() -> None:
    """Relational entries outside the window: r25 earned its
    driver-green row in r3 (after two red rounds), and r26 is a
    rows-only check (engine-specific sketches admit no oracle) that
    should not spend a provable slot."""

    # sessionization (the batch operator from the streaming module),
    # verified against the same gap/cumsum logic in DuckDB SQL
    def r25(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .streaming.event_ops import sessionize_batch

        ensure_views(spark, sf_dir)
        out = sessionize_batch(spark.table("events"), gap_minutes=30)
        return out.select(
            "user_id",
            "session_seq",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("session_value"),
        )

    register_query(
        "r25_sessionization",
        r25,
        "WITH g AS (SELECT user_id, ts, value, CASE WHEN "
        "epoch_us(ts) - LAG(epoch_us(ts)) OVER "
        "(PARTITION BY user_id ORDER BY ts) > 1800000000 THEN 1 ELSE 0 "
        "END AS new_session FROM events), "
        # CAST to BIGINT: DuckDB's SUM over integers returns HUGEINT,
        # which the driver's canonicalizer type-tags differently from
        # Spark's LONG (same repo convention as ROW_NUMBER casts).
        "s AS (SELECT user_id, ts, value, CAST(SUM(new_session) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq FROM g) "
        "SELECT user_id, session_seq, epoch_us(MIN(ts)) AS start_us, "
        "epoch_us(MAX(ts)) AS end_us, COUNT(*) AS n_events, "
        "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value "
        "FROM s GROUP BY user_id, session_seq",
    )

    # approximate aggregates: sketch implementations differ per engine,
    # so these register without an oracle (rows-only check); their exact
    # counterparts (r02) are hash-verified
    def r26(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_views(spark, sf_dir)
        return spark.sql(
            "SELECT l_returnflag, "
            "approx_count_distinct(l_partkey) AS approx_parts, "
            "percentile_approx(l_extendedprice, 0.5) AS approx_median "
            "FROM lineitem GROUP BY l_returnflag"
        )

    register_query("r26_approx_aggregates", r26, None)


def _populate_zarr() -> None:


    def z01(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        return _zarr_df(spark, path, "zarr_f1").select("data", "lat", "lon")

    register_query(
        "z01_scan_full",
        z01,
        f"SELECT data, lat, lon FROM ({_F1_GEN})",
    )

    def z02(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        return _zarr_df(spark, path, "zarr_f1").select("lat", "lon")

    register_query(
        "z02_coords_cartesian",
        z02,
        "SELECT CAST(35 + i // 8 AS DOUBLE) AS lat, "
        "CAST(-120 + i % 8 AS DOUBLE) AS lon FROM range(64) t(i)",
    )

    def z03(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        df = _zarr_df(spark, path, "zarr_f1")
        return df.filter((F.col("lat") < 38.1) & (F.col("lon") > -116.9)).select(
            "data", "lat", "lon"
        )

    register_query(
        "z03_where_pushdown",
        z03,
        f"SELECT data, lat, lon FROM ({_F1_GEN}) "
        "WHERE lat < 38.1 AND lon > -116.9",
    )

    def z04(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        _zarr_df(spark, path, "zarr_f1")
        return spark.sql(
            "WITH d1 AS (SELECT lat, lon, data FROM zarr_f1), "
            "d2 AS (SELECT lat, lon, data * 2 AS data2 FROM zarr_f1) "
            "SELECT d1.lat AS lat, d1.lon AS lon, d1.data AS data, "
            "d2.data2 AS data2 "
            "FROM d1 JOIN d2 ON d1.lat = d2.lat AND d1.lon = d2.lon"
        )

    register_query(
        "z04_cte_self_join",
        z04,
        f"SELECT lat, lon, data, data * 2 AS data2 FROM ({_F1_GEN})",
    )

    def z05(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_missing_store()
        return _zarr_df(spark, path, "zarr_f2").select("data", "lat", "lon")

    register_query(
        "z05_missing_chunk_fill",
        z05,
        "SELECT CAST(1234.0 AS DOUBLE) AS data, "
        "CAST(35 + i // 8 AS DOUBLE) AS lat, "
        "CAST(-120 + i % 8 AS DOUBLE) AS lon FROM range(64) t(i)",
    )

    def z06(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_mixed_dims_store()
        return _zarr_df(spark, path, "zarr_f4").select("data", "lat", "lon")

    register_query(
        "z06_mixed_dims",
        z06,
        f"SELECT data, lat, lon FROM ({_F1_GEN})",
    )

    def z07(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        df = _zarr_df(spark, path, "zarr_f1")
        return df.select("data", "lat", "lon").orderBy("data").limit(10)

    register_query(
        "z07_order_limit",
        z07,
        f"SELECT data, lat, lon FROM ({_F1_GEN}) ORDER BY data LIMIT 10",
    )

    def z08(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        df = _zarr_df(spark, path, "zarr_f1").select("data", "lat", "lon")
        return df.unionAll(df)

    register_query(
        "z08_union_all",
        z08,
        f"SELECT data, lat, lon FROM ({_F1_GEN}) "
        f"UNION ALL SELECT data, lat, lon FROM ({_F1_GEN})",
    )

    def z09(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_no_coords_store()
        return _zarr_df(spark, path, "zarr_f3").select("data_1", "data_2")

    register_query(
        "z09_no_coords",
        z09,
        "SELECT CAST(i AS DOUBLE) AS data_1, CAST(100 + i AS DOUBLE) AS data_2 "
        "FROM range(8) t(i)",
    )

    def z12(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Cross-source federation: zarr scan joined to a parquet dim
        through Catalyst — the integration a reference user gets from
        DataFusion's catalog, here as one plan over two sources (the
        parquet side broadcasts)."""
        path = fixtures.write_lat_lon_store()
        _zarr_df(spark, path, "zarr_f1")
        ensure_views(spark, sf_dir)
        # FLOOR before the INT cast: DuckDB CAST(double AS INT) rounds
        # while Spark truncates — on integral doubles they agree, but
        # FLOOR keeps the key deterministic for ANY future fixture data
        return spark.sql(
            "SELECT z.lat AS lat, z.lon AS lon, z.data AS data, "
            "n.n_name AS n_name "
            "FROM zarr_f1 z JOIN nation n "
            "ON CAST(FLOOR(z.data) AS INT) % 25 = n.n_nationkey"
        )

    register_query(
        "z12_join_parquet_dim",
        z12,
        f"SELECT z.lat AS lat, z.lon AS lon, z.data AS data, "
        f"n.n_name AS n_name FROM ({_F1_GEN}) z JOIN nation n "
        f"ON CAST(FLOOR(z.data) AS INT) % 25 = n.n_nationkey",
    )

    def z13(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sharded-store scan: sharding_indexed chunks (inner blosc-LZ4
        chain, crc32c index) through the full engine path."""
        path = fixtures.write_sharded_store()
        return _zarr_df(spark, path, "zarr_sharded").filter("v % 3 = 0")

    register_query(
        "z13_sharded_scan",
        z13,
        "SELECT CAST(i AS BIGINT) AS v FROM range(64) t(i) WHERE i % 3 = 0",
    )

    def z16(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Datetime64 scan: time axis reads as TimestampNTZ, with a
        timestamp predicate exercising chunk pruning on an M8 column
        (edge chunks: 24 rows / chunk-7)."""
        path = fixtures.write_time_series_store()
        df = _zarr_df(spark, path, "zarr_time")
        return df.select("time", "val").filter(
            F.col("time") >= F.lit("2024-01-01 12:00:00").cast("timestamp_ntz")
        )

    register_query(
        "z16_time_scan",
        z16,
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 HOUR "
        "AS time, CAST(i AS DOUBLE) AS val FROM range(24) t(i) "
        "WHERE i >= 12",
    )

    def z10(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_typed_store()
        df = _zarr_df(spark, path, "zarr_typed")
        # t_u64 surfaces as DECIMAL(20,0) (the documented uint64 widening,
        # datasource.py); the driver's pandas canonicalizer tags
        # decimal.Decimal columns differently from DuckDB's DECIMAL even
        # when every value matches, so the *registered* query projects it
        # through DOUBLE (exact for this fixture's 0..23 range). The
        # DECIMAL(20,0) schema identity stays asserted in
        # tests/test_datasource.py::test_type_map.
        return df.withColumn("t_u64", F.col("t_u64").cast("double"))

    register_query(
        "z10_type_map",
        z10,
        "SELECT CAST(i % 2 = 0 AS BOOLEAN) AS t_bool, "
        "CAST(i AS REAL) AS t_f32, CAST(i AS DOUBLE) AS t_f64, "
        "CAST(i AS SMALLINT) AS t_i16, CAST(i AS INT) AS t_i32, "
        "CAST(i AS BIGINT) AS t_i64, CAST(i AS TINYINT) AS t_i8, "
        "CAST(i AS INT) AS t_u16, CAST(i AS BIGINT) AS t_u32, "
        "CAST(i AS DOUBLE) AS t_u64, CAST(i AS SMALLINT) AS t_u8 "
        "FROM range(24) t(i)",
    )

    def z18(spark: SparkSession, sf_dir: str) -> DataFrame:
        """3-D scan (the reference's max dimensionality) with all three
        coordinates broadcast and a predicate spanning two axes — the
        oracle reconstructs the C-order flattening arithmetic."""
        path = fixtures.write_3d_store()
        df = _zarr_df(spark, path, "zarr_3d")
        return df.select("time", "lat", "lon", "data").filter(
            (F.col("time") >= 2) & (F.col("lon") < -115)
        )

    register_query(
        "z18_3d_scan",
        z18,
        "SELECT CAST(i // 48 AS DOUBLE) AS time, "
        "CAST(35 + (i // 8) % 6 AS DOUBLE) AS lat, "
        "CAST(-120 + i % 8 AS DOUBLE) AS lon, "
        "CAST(i AS DOUBLE) AS data "
        "FROM range(192) t(i) "
        "WHERE i // 48 >= 2 AND -120 + i % 8 < -115",
    )

    # the reference's theta/range self-join bench shape on a zarr store
    def z11(spark: SparkSession, sf_dir: str) -> DataFrame:
        path = fixtures.write_lat_lon_store()
        _zarr_df(spark, path, "zarr_f1")
        return spark.sql(
            "SELECT t1.data AS d1, t2.data AS d2 FROM zarr_f1 t1 "
            "JOIN zarr_f1 t2 ON t1.data % 12 = 0 "
            "AND t1.data < t2.data + 1 AND t1.data >= t2.data - 1"
        )

    register_query(
        "z11_theta_self_join",
        z11,
        f"SELECT t1.data AS d1, t2.data AS d2 FROM ({_F1_GEN}) t1 "
        f"JOIN ({_F1_GEN}) t2 ON t1.data % 12 = 0 "
        "AND t1.data < t2.data + 1 AND t1.data >= t2.data - 1",
    )

    def z38(spark: SparkSession, sf_dir: str) -> DataFrame:
        """z38 (r13): AUTOMATIC projection pruning (pruning.zarr_sql)
        — the A4 mitigation promoted from a manual ``columns=`` option
        to an analyzed rewrite: Catalyst's optimized plan names the
        referenced columns, the view re-registers through
        ``read_zarr(columns=...)``, and on this 11-array typed store
        the scan reads 3 arrays (the two selected + the filter
        column), not 11. Values must match the full-width plan
        bit-for-bit (the rewrite's safety invariant, also pinned
        across 19 shapes in tests/test_pruning.py). Reference
        behavior: DataFusion's free ``scan(projection)``,
        table_provider.rs:114-117."""
        from .pruning import zarr_sql

        path = fixtures.write_typed_store()
        return zarr_sql(
            spark,
            "SELECT t_i64, t_f64 FROM zarr_autoprune WHERE t_i32 < 12",
            {"zarr_autoprune": path},
        )

    register_query(
        "z38_auto_prune_sql",
        z38,
        "SELECT CAST(i AS BIGINT) AS t_i64, CAST(i AS DOUBLE) AS t_f64 "
        "FROM range(24) t(i) WHERE i < 12",
    )

    def z39(spark: SparkSession, sf_dir: str) -> DataFrame:
        """z39 (r13): the F1 store scanned through the NATIVE S3
        backend (zarr/s3.py — stdlib SigV4 client; the reference's
        primary deployment, config.rs:126-132 / s3_bench.rs) against
        a public-read S3 facade: anonymous ranged GETs per chunk
        from executor workers, paginated ListObjectsV2 XML for
        schema inference, a coordinate predicate pushed into the
        scan. The signed half of the protocol (SigV4 verified
        request-by-request by an independent derivation, conditional
        PUT, server-side copy, distributed writes) is pinned in
        tests/test_s3_store.py."""
        path = fixtures.write_lat_lon_store()
        url = fixtures.serve_s3_store(path)
        df = _zarr_df(spark, url, "zarr_s3")
        return df.filter(F.col("lat") < 38.1).select(
            "data", "lat", "lon"
        )

    register_query(
        "z39_s3_native_scan",
        z39,
        f"SELECT data, lat, lon FROM ({_F1_GEN}) WHERE lat < 38.1",
    )


def _populate_writer() -> None:
    def w01(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Distributed writer round-trip: orders → zarr store → scan.
        The oracle reads the same columns straight from parquet, so a
        hash match proves the writer preserves every value."""
        from .io import write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w01_{token}"
        src = spark.table("orders").select("o_orderkey", "o_totalprice")
        write_zarr(src, path, chunk_rows=4096, mode="overwrite")
        return spark.read.format("zarr").load(path)

    register_query(
        "w01_writer_roundtrip",
        w01,
        "SELECT o_orderkey, o_totalprice FROM orders",
    )

    def w03(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sharded distributed-writer round-trip: orders → zarr store
        with sharding_indexed objects (4 inner chunks per shard) →
        scan. Proves the shard encode path (inner index + crc32c)
        value-preserving end-to-end through both the writer and the
        reader's inner-chunk machinery."""
        from .io import write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w03_{token}"
        src = spark.table("orders").select("o_orderkey", "o_totalprice")
        write_zarr(
            src, path, chunk_rows=1024, shard_chunks=4, mode="overwrite"
        )
        return spark.read.format("zarr").load(path)

    register_query(
        "w03_sharded_writer_roundtrip",
        w03,
        "SELECT o_orderkey, o_totalprice FROM orders",
    )

    def w04(spark: SparkSession, sf_dir: str) -> DataFrame:
        """String-column writer round-trip: the documents table —
        text included — through vlen-utf8 zarr arrays and back. The
        reference rejects string arrays (config.rs:278-281); this
        store both writes and scans them."""
        from .io import write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w04_{token}"
        src = spark.table("documents").select(
            "doc_id", "text", "lang", "n_chars"
        )
        write_zarr(src, path, chunk_rows=4096, mode="overwrite")
        return spark.read.format("zarr").load(path)

    register_query(
        "w04_string_writer_roundtrip",
        w04,
        "SELECT doc_id, text, lang, n_chars FROM documents",
    )

    def w06(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Distributed rechunk (the zarr-ecosystem "rechunker"): orders
        written small-chunked (1024 rows/object), then compacted into a
        sharded layout (4096-row chunks × 4 per shard = one store
        object per 16384 rows — a 16× object-count drop), then scanned.
        The oracle reads straight from parquet, so the hash proves the
        copy is row-for-row value-preserving through BOTH stores."""
        from .io import rechunk_zarr, write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        src_path = f"/tmp/arrow_zarr_spark_w06src_{token}"
        dst_path = f"/tmp/arrow_zarr_spark_w06dst_{token}"
        src = spark.table("orders").select("o_orderkey", "o_totalprice")
        write_zarr(src, src_path, chunk_rows=1024, mode="overwrite")
        rechunk_zarr(
            spark,
            src_path,
            dst_path,
            chunk_rows=4096,
            shard_chunks=4,
            mode="overwrite",
        )
        return spark.read.format("zarr").load(dst_path)

    register_query(
        "w06_rechunk_roundtrip",
        w06,
        "SELECT o_orderkey, o_totalprice FROM orders",
    )

    def z20(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Statistics-pruned scan: orders sorted on the key and written
        with per-object [min, max] stats, then filtered — the scan
        drops provably-empty store objects at PLANNING time (parquet
        row-group semantics; the reference stubs statistics,
        opener.rs:171-173). The oracle reads parquet directly, so the
        hash proves the static pruning path loses no rows."""
        from .io import write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_z20_{token}"
        src = (
            spark.table("orders")
            .select("o_orderkey", "o_totalprice")
            .orderBy("o_orderkey")
        )
        write_zarr(src, path, chunk_rows=2048, mode="overwrite")
        return (
            spark.read.format("zarr")
            .load(path)
            .filter(F.col("o_orderkey") <= 1000)
        )

    register_query(
        "z20_stats_pruned_scan",
        z20,
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000",
    )

    def w07(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Single-pass format-sink round-trip: df.write.format("zarr")
        (staged chunks + rename commit, the sink that does NOT
        preserve cross-task row order) — the driver's order-
        insensitive hash is exactly the right oracle for it. Also
        covers the sink's commit-message stats path end to end."""
        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w07_{token}"
        src = spark.table("customer").select(
            "c_custkey", "c_acctbal", "c_mktsegment"
        )
        src.write.format("zarr").option("chunk_rows", "2048").mode(
            "overwrite"
        ).save(path)
        return spark.read.format("zarr").load(path)

    register_query(
        "w07_format_sink_roundtrip",
        w07,
        "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer",
    )


def _populate_writer_deferred() -> None:
    def w02(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Writer round-trip for TimestampNTZ columns: events → zarr
        datetime64[us] arrays → scan. The oracle reads the same
        columns straight from parquet (DuckDB TIMESTAMP is naive wall
        clock, identical to NTZ under the pinned-UTC session)."""
        from .io import write_zarr

        ensure_views(spark, sf_dir)
        token = sf_dir.strip("/").replace("/", "_")
        path = f"/tmp/arrow_zarr_spark_w02_{token}"
        src = spark.table("events").select(
            "event_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "value",
        )
        write_zarr(src, path, chunk_rows=4096, mode="overwrite")
        return spark.read.format("zarr").load(path)

    register_query(
        "w02_writer_datetime_roundtrip",
        w02,
        "SELECT event_id, ts, value FROM events",
    )


_populated = False


#: The driver evaluates only the FIRST 50 registered queries each
#: round — this list IS the window, in slot order; registration
#: function placement no longer matters (the round-4 boundary marker
#: contradicted the actual slot math). Rotation policy, proven over
#: rounds 3-5: (a) never-driver-checked queries first, (b) queries new
#: this round, (c) the rows whose last driver-green check is oldest.
#: Everything rotated out stays parity-tested every round by
#: tests/test_oracle_parity.py; tests/test_suite_registry.py pins this
#: list against the live registry.
#:
#: Round-5 window: 6 never-checked round-4 additions + 27 round-5
#: entries (26 new + s03, whose first-ever oracle makes its next
#: driver row the first provable one) + the 9 tier-B rows last green
#: in r2 + the 8 stalest r3-green rows (the zarr flagship block and
#: operator rows keeping one representative per family: t12/t13 for
#: text, d06+d14+x02 for dedup, s03 for similarity, m05 for
#: multimodal (never-checked, so in-window anyway), j01/j05 for
#: joins, w03-w07 for writers (w05 subsumes w01's plain roundtrip);
#: z14's strings (w04 in-window) / z16's datetimes (w02/z17 green
#: r4) / z08's union / z04's CTE-self-join / z12's join / z07's
#: order-limit semantics stay covered in-window by z19, b10/b11/z11,
#: b08/j05, and b13; z05's fill / z10's type map / z13's sharded
#: decode stay covered by golden tests plus the in-window w03/z18;
#: the displaced t01-t04/m01/m02/j02/j03/j04/d04/d07/s01/s02/w01/
#: z04/z05/z07/z08/z09/z10/z12/z13/z14/z16 stay parity-tested every
#: round,
#: rotating back in round 6).
#:
#: ROUND-7 ROTATION (applied): CORRECTNESS_r06 landed and is 50/50
#: green on the round-5 window, so every prior window entry now has a
#: fresh driver row. This window takes (a) the 22 round-6 additions
#: that have never had a driver row (d16-d18, s04, x03, p13, w08-w13,
#: j06, t14, z21-z25, r46-r48), (b) the nine round-7 additions — z26
#: (the Tier-A3 DDL-validation error-path query, the last Tier-A
#: component with no driver evidence), z27/z28/z29 (snapshot
#: versioning: pinned read + rollback + commit-log accounting, the
#: native answer to the env-blocked Icechunk path A17), s05 (IVF-PQ
#: ANN, the composed-quantizer scale path), t16 (bounded-memory
#: Misra-Gries heavy hitters), t17 (KMV distinct sketch), e05
#: (the sketch's streaming face, batch form), and z30 (row-level
#: version CDC, literal oracle) — and
#: Late round-7 session: z31 (tag + export — the release workflow:
#: immutable named pins, vacuum retention, standalone checkout) takes
#: the slot p04_rebalance_mixture held, and w14 (keyed MERGE into a
#: live table store: stats-pruned key scan, invalidate-first stats,
#: insert-of-unmatched) takes d04_ngram_jaccard_pairs' (both green r3
#: rows, parity-tested every round like all rotated-out entries), and
#: m06 (cross-modal alignment gate, the CLIP-score curation filter)
#: takes d10_canonical_docs' slot (green r3; its family keeps
#: d06/d07 + the r6-fresh d13-d18 in or near the window).
#: (c) 19 of the stalest green rows, all last driver-checked in
#: round 3 (t01's token count, t03's quality score, t04's
#: fingerprint, z04's zarr CTE-self-join, m02's fake image decode,
#: m04's frame sampling, p05's shard manifest, and j04's salted
#: join ceded their slots; all stay
#: parity-enforced, z04's shape stays in-window via b10/b11,
#: multimodal keeps m01-m03 in-window plus m05's r6 green, sampling
#: keeps p01-p04 plus p08-p13's r6/r7 greens, and joins keep
#: j02/j03 in-window plus j05/j06's fresh rows).
#: Everything rotated out stays parity-enforced every round by
#: tests/test_oracle_parity.py.
DRIVER_WINDOW = [
    # ROUND-13 ROTATION: CORRECTNESS_r12 landed 50/50 green on the
    # round-12 window, so the stalest oracle-backed rows are exactly
    # the 50 queries last driver-checked in ROUND 9 (staleness from
    # every CORRECTNESS_r*.json at round start; histogram r9=50,
    # r10=50, r11=50, r12=50, plus the named displacements parked at
    # r6/r7/r8 with in-family fresher coverage). Per the VERDICT's
    # item 1, four slots are claimed first:
    #   d20_minhash_index_dedup and s09_ivf_sq8_index_topk — the only
    #     registered queries with NO driver row ever (both registered
    #     late in r12 outside the window, fully oracle-backed, the
    #     m09 precedent);
    #   d01_exact_dedup and d04_ngram_jaccard_pairs — the stalest
    #     oracle-backed rows anywhere (r8, displaced in r12).
    # The remaining 46 slots take 46 of the 50 round-9-stale rows.
    # Displaced (each with its shape covered by a fresher family
    # row, and parity-enforced every round by
    # tests/test_oracle_parity.py):
    #   b05_comparisons_or  -> b06_equality_pred (green r12) and
    #     b04_range_pred (r10) are the same pure-Catalyst suite.py
    #     predicate family over the same zarr scan;
    #   b07_modulo_pred     -> same cover (b06 r12 / b04 r10);
    #   d19_containment_pairs -> d04 (in THIS window) shares the
    #     exact _shingle_shared_counts kernel, and d03 (green r12)
    #     embeds the same shingle-overlap SQL as its verify stage;
    #   e02_interval_join_batchform -> j07_interval_join (green r11)
    #     is the identical interval-join shape, and the streaming
    #     family keeps e05-e07 (r11) + r25_sessionization (r12).
    # -- the 4 slots the verdict ordered in first --
    "d20_minhash_index_dedup",
    "s09_ivf_sq8_index_topk",
    "d01_exact_dedup",
    "d04_ngram_jaccard_pairs",
    # -- 46 of the 50 round-9-stale rows --
    "d02_normalized_dedup",
    "d11_contamination_purge",
    "d12_dedup_against_corpus",
    "e01_stream_enrich_batchform",
    "j08_nearest_join",
    "p06_quantile_gate",
    "p07_train_val_test_split",
    "r01_groupby_agg",
    "r02_count_distinct",
    "r03_avg_minmax",
    "r04_having",
    "r05_distinct",
    "r06_window_topk_per_group",
    "r07_window_running_sum",
    "r08_window_lag_rank",
    "r09_left_outer_join",
    "r10_semi_join",
    "r11_anti_join",
    "r12_intersect",
    "r13_except",
    "r14_union_distinct",
    "r15_scalar_subquery",
    "r16_in_subquery",
    "r17_rollup",
    "r18_string_funcs",
    "r19_date_parts",
    "r20_math_case",
    "r21_multiway_join_agg",
    "r22_events_time_agg",
    "r23_events_user_sessions",
    "r24_pivot_conditional",
    "r27_count_distribution",
    "r28_having_in_subquery",
    "r29_correlated_min",
    "r30_cube",
    "r31_stddev_from_moments",
    "r32_percentile_cont",
    "r33_regexp_extract",
    "r34_array_functions",
    "r35_json_extract",
    "r36_grouping_sets",
    "r37_not_exists",
    "t11_boilerplate_ngrams",
    "w02_writer_datetime_roundtrip",
    "x07_dataset_card",
    "z17_time_rollup",
]


def _ensure_populated() -> None:
    global _populated
    if _populated:
        return
    # imported unconditionally: a swallowed ImportError here would
    # silently shrink the driver's correctness contract
    from .operators.suite_entries import (
        populate_deferred_queries,
        populate_extended_queries,
        populate_operator_queries,
        populate_rotated_out,
        populate_round4_queries,
        populate_round5_late2_queries,
        populate_round5_queries,
        populate_round6_alter_queries,
        populate_round6_assemble_queries,
        populate_round6_audit_queries,
        populate_round6_diff_queries,
        populate_round6_string_coord_queries,
        populate_round6_time_axis_queries,
        populate_round6_3d_writer_queries,
        populate_round6_sharded_grid_queries,
        populate_round6_embdedup_queries,
        populate_round6_bloom_queries,
        populate_round6_queries,
        populate_round6_grid_queries,
        populate_round7_ivfpq_queries,
        populate_round7_sq8_queries,
        populate_round7_cas_queries,
        populate_round7_replicate_queries,
        populate_round7_stream_hh_queries,
        populate_round7_quantile_queries,
        populate_round7_phash_queries,
        populate_round7_sync_queries,
        populate_round7_entropy_queries,
        populate_round7_mv_queries,
        populate_round7_scrub_queries,
        populate_round7_interp_queries,
        populate_round7_rename_queries,
        populate_round7_stream_interp_queries,
        populate_round7_plandoctor_queries,
        populate_round8_phash64_queries,
        populate_round8_binary_ann_queries,
        populate_round8_vector_index_queries,
        populate_round8_split_queries,
        populate_round9_queries,
        populate_round10_maint_queries,
        populate_round10_phash_index_queries,
        populate_round11_queries,
        populate_round12_queries,
        populate_round12_index_queries,
        populate_round12_ivf_index_queries,
        populate_round7_repair_queries,
        populate_round7_version_queries,
        populate_round7_hh_queries,
        populate_round7_sketch_queries,
        populate_round7_stream_sketch_queries,
        populate_round7_cdc_queries,
        populate_round7_crossmodal_queries,
        populate_round7_upsert_queries,
        populate_round7_vlog_queries,
        populate_round6_late_queries,
        populate_round6_region_queries,
        populate_round6_sampling_queries,
        populate_round6_writer_queries,
    )

    populate_round4_queries(register_query)
    populate_round5_queries(register_query)
    populate_round5_late2_queries(register_query)
    populate_round6_queries(register_query)
    populate_round6_sampling_queries(register_query)
    populate_round6_writer_queries(register_query)
    populate_round6_grid_queries(register_query)
    populate_round6_late_queries(register_query)
    populate_round6_region_queries(register_query)
    populate_round6_bloom_queries(register_query)
    populate_round6_alter_queries(register_query)
    populate_round6_assemble_queries(register_query)
    populate_round6_audit_queries(register_query)
    populate_round6_diff_queries(register_query)
    populate_round6_string_coord_queries(register_query)
    populate_round6_time_axis_queries(register_query)
    populate_round6_3d_writer_queries(register_query)
    populate_round6_sharded_grid_queries(register_query)
    populate_round6_embdedup_queries(register_query)
    populate_round7_version_queries(register_query)
    populate_round7_ivfpq_queries(register_query)
    populate_round7_sq8_queries(register_query)
    populate_round7_cas_queries(register_query)
    populate_round7_replicate_queries(register_query)
    populate_round7_stream_hh_queries(register_query)
    populate_round7_quantile_queries(register_query)
    populate_round7_phash_queries(register_query)
    populate_round7_sync_queries(register_query)
    populate_round7_entropy_queries(register_query)
    populate_round7_mv_queries(register_query)
    populate_round7_scrub_queries(register_query)
    populate_round7_interp_queries(register_query)
    populate_round7_rename_queries(register_query)
    populate_round7_stream_interp_queries(register_query)
    populate_round7_plandoctor_queries(register_query)
    populate_round8_phash64_queries(register_query)
    populate_round8_binary_ann_queries(register_query)
    populate_round8_vector_index_queries(register_query)
    populate_round8_split_queries(register_query)
    populate_round9_queries(register_query)
    populate_round10_maint_queries(register_query)
    # m09 registers OUTSIDE the (full) 50-slot window — oracle parity
    # enforces it locally every round; a future rotation picks it up
    populate_round10_phash_index_queries(register_query)
    # r11 graduations: t05 (recursive-CTE packer replay) and x08
    # (shares x06's oracle) — both claim r11 window slots
    populate_round11_queries(register_query)
    # r12 graduations: d03/d05 leave the rows-only set with their
    # production crc32 kernels unchanged (the oracle replays crc32
    # itself) — both claim r12 window slots
    populate_round12_queries(register_query)
    # d20 registers OUTSIDE the (full) 50-slot window — oracle
    # parity enforces it locally every round; the r13 rotation
    # picks it up (the m09/z36 precedent)
    populate_round12_index_queries(register_query)
    populate_round12_ivf_index_queries(register_query)
    # z36 registers OUTSIDE the (already all-fresh) 50-slot window —
    # the round-8 rotation picks it up; oracle parity enforces it
    # locally every round meanwhile
    populate_round7_repair_queries(register_query)
    populate_round7_vlog_queries(register_query)
    populate_round7_hh_queries(register_query)
    populate_round7_sketch_queries(register_query)
    populate_round7_stream_sketch_queries(register_query)
    populate_round7_cdc_queries(register_query)
    populate_round7_crossmodal_queries(register_query)
    populate_round7_upsert_queries(register_query)
    _populate_relational_round6_tail()
    _populate_relational_round7_tail()
    _populate_zarr_round4()
    _populate_zarr_round5()
    _populate_zarr_round7()
    _populate_relational()
    _populate_writer_deferred()
    populate_rotated_out(register_query)
    _populate_tier_b()
    _populate_relational_round4_tail()
    _populate_relational_round5_tail()
    _populate_tier_b_deferred()
    _populate_zarr()
    _populate_writer()
    populate_operator_queries(register_query)
    populate_extended_queries(register_query)
    _populate_relational_rotated()
    # last: queries whose engine-specific outputs admit no SQL oracle
    # (rows-only checks)
    populate_deferred_queries(register_query)

    # Re-order the registry so DRIVER_WINDOW occupies slots 1-50
    # exactly; rotated-out queries keep their relative order behind it
    # (rows-only entries stay last). A name listed but not registered
    # fails loudly — a typo here would silently burn a provable slot.
    missing = [n for n in DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise RuntimeError(
            f"DRIVER_WINDOW names not in the registry: {missing}"
        )
    ordered = {n: _REGISTRY.pop(n) for n in DRIVER_WINDOW}
    ordered.update(_REGISTRY)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)
    _populated = True
