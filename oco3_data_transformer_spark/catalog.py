"""Query catalog: every implemented operator from SURVEY.md §2 expressed over
the driver's synthetic tables, each paired with the equivalent ANSI SQL for
the DuckDB oracle (CORRECTNESS gate).

Conventions keeping the value-hash comparison exact across engines:
  - every computed column is aliased identically on both sides;
  - doubles are ``round``-ed on both sides (2 dp for price-scale sums, 4-6 dp
    for means/ratios/cosines) — pre-rounding values agree to ~1e-10 so the
    rounding is stable;
  - count-like outputs are BIGINT on both sides (DuckDB sums are cast);
  - window ties are always broken by a unique key.

Queries marked ``sql=None`` are genuinely non-SQL-expressible (pandas-UDF
kernels, streaming) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import hashing, scalar, text, vector
from .operators import aggregates as agg_ops
from .operators import dedup as dedup_ops
from .operators import filters as filter_ops
from .operators import joins as join_ops
from .operators import sessionize as sess_ops
from .operators import similarity as sim_ops
from .sources.registry import load


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def exact_mean(sum_col, cnt_col):
    """Cross-engine bit-exact 4-dp mean of 2-dp fixed-decimal data.

    ``round()`` semantics differ between engines on values whose shortest
    decimal repr ends in 5 (DuckDB rounds the printed repr, the JVM rounds
    the exact binary expansion), so no float rounding is used at all:
    the cent-exact sum becomes an integer, half-up division happens in
    integer space ((2a+b) div 2b), and the result is scaled back by 1e4 —
    every step yields identical doubles in any IEEE-754 engine.
    """
    cents = F.round(sum_col * 100, 0).cast("long")
    e4 = F.floor((2 * cents * 100 + cnt_col) / (2 * cnt_col)).cast("long")
    return (e4 / F.lit(10000.0)).alias("__exact_mean")


def exact_mean_sql(sum_expr: str, cnt_expr: str) -> str:
    cents = f"CAST(round(({sum_expr}) * 100, 0) AS BIGINT)"
    e4 = f"CAST(floor((2 * {cents} * 100 + ({cnt_expr})) / (2.0 * ({cnt_expr}))) AS BIGINT)"
    return f"({e4} / 10000.0)"


def register(name: str, sql: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, sql=sql, doc=doc)
        return fn

    return deco


# --------------------------------------------------------------------------
# §2.1/2.2 — scans, projections, filters
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           {exact_mean_sql('sum(l_quantity)', 'count(*)')}             AS avg_qty,
           {exact_mean_sql('sum(l_extendedprice)', 'count(*)')}        AS avg_price,
           {exact_mean_sql('sum(l_discount)', 'count(*)')}             AS avg_disc,
           CAST(count(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="F1 projection pushdown + hash aggregate (TPC-H Q1 shape); "
    "ref processors/Processor.py:86-99 (projection), SURVEY §2.6.",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            exact_mean(F.sum("l_quantity"), F.count(F.lit(1))).alias("avg_qty"),
            exact_mean(F.sum("l_extendedprice"), F.count(F.lit(1))).alias("avg_price"),
            exact_mean(F.sum("l_discount"), F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_pushdown_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT)                    AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="F2/F8 predicate pushdown to scan (TPC-H Q6 shape).",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q03_qf_region_drop",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase_value
    FROM events
    WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    GROUP BY user_id
    """,
    doc="F3 region-drop semi-join: groups with zero 'good' rows dropped "
    "entirely; ref processors/OCO3SamProcessor.py:455-464.",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    kept = filter_ops.drop_regions_without_good(
        ev, ["user_id"], F.col("event_type") == "purchase"
    )
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
        ).alias("purchase_value"),
    )


@register(
    "q04_prepost_dual_output",
    """
    SELECT 'pre' AS qf, user_id, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    UNION ALL
    SELECT 'post' AS qf, user_id, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events WHERE value >= 5.0 GROUP BY user_id
    """,
    doc="F4 pre/post-QF dual emission from one cached frame; ref main.py:374-418.",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    pre, post = filter_ops.pre_post_split(ev, F.col("value") >= 5.0)

    def branch(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value")
        ).select(F.lit(label).alias("qf"), "user_id", "n", "total_value")

    return branch(pre, "pre").unionByName(branch(post, "post"))


@register(
    "q05_missing_target_drop",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE event_type NOT IN ('error')
    GROUP BY event_type
    """,
    doc="F5 excluded-id filter; ref processors/OCO3SamProcessor.py:441-445.",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.filter(~F.col("event_type").isin("error"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q06_empty_slice_drop",
    """
    SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    HAVING count(CASE WHEN event_type = 'purchase' THEN value END) > 0
    """,
    doc="F7 drop-empty: slices whose science values are all absent are "
    "dropped; ref utils/dataset_utils.py:21-26.",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").withColumn("day", F.to_date("ts")).withColumn(
        "pv", F.when(F.col("event_type") == "purchase", F.col("value"))
    )
    kept = filter_ops.drop_empty_slices(ev, ["user_id", "day"], ["pv"])
    return kept.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n_events"))


@register(
    "q07_time_range_subset",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           {exact_mean_sql('sum(value)', 'count(*)')} AS avg_value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type
    """,
    doc="F8 time-range subset (climatology sel(time=slice)); "
    "ref tools/climatology/main.py:177-221. Partition pruning at scale.",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    ev = filter_ops.time_range(
        load(spark, sf, "events"), "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00"
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        exact_mean(F.sum("value"), F.count(F.lit(1))).alias("avg_value"),
    )


@register(
    "q08_day_limit",
    """
    SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE CAST(o_orderdate AS DATE) IN (
        SELECT DISTINCT CAST(o_orderdate AS DATE) FROM orders ORDER BY 1 LIMIT 5)
    GROUP BY 1
    """,
    doc="F9 granule-day limit; ref tools/deploy/run.py:596-603.",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders").withColumn("day", F.to_date("o_orderdate"))
    return (
        filter_ops.limit_days(od, "day", 5)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q09_gap_classification",
    """
    WITH cal AS (
        SELECT CAST(gs AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) t(gs)
    ),
    present AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events WHERE event_type = 'signup'
    )
    SELECT cal.day,
           CASE WHEN cal.day BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
                    THEN 'EXPECTED_ABSENT'
                WHEN present.day IS NOT NULL THEN 'PRESENT'
                ELSE 'ABSENT' END AS status
    FROM cal LEFT JOIN present ON cal.day = present.day
    """,
    doc="F10 known-gap/date-range classification PRESENT/EXPECTED_ABSENT/"
    "ABSENT; ref tools/deploy/run.py:217-305 (gap table run.py:86-98).",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    cal = spark.range(1).select(
        F.explode(
            F.sequence(F.to_date(F.lit("2024-01-01")), F.to_date(F.lit("2024-01-30")))
        ).alias("day")
    )
    present = (
        ev.filter(F.col("event_type") == "signup").select(F.to_date("ts").alias("day")).distinct()
        .withColumn("__p", F.lit(1))
    )
    out = cal.join(present, "day", "left")
    status = (
        F.when(
            F.col("day").between(F.lit("2024-01-05").cast("date"), F.lit("2024-01-07").cast("date")),
            "EXPECTED_ABSENT",
        )
        .when(F.col("__p").isNotNull(), "PRESENT")
        .otherwise("ABSENT")
    )
    return out.select("day", status.alias("status"))


_DEPLOY_FEATURES_SQL = """
    features AS (
        SELECT DISTINCT
               CASE WHEN user_id % 2 = 0 THEN 'oco3' ELSE 'oco2' END AS mission,
               CAST(ts AS DATE) AS day
        FROM events WHERE event_type IN ('signup', 'purchase')),
    span AS (SELECT min(day) AS lo, max(day) AS hi FROM features),
    cal AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM span),
    grid AS (
        SELECT day, mission
        FROM cal CROSS JOIN (SELECT 'oco3' AS mission UNION ALL SELECT 'oco2')),
    status AS (
        SELECT g.day, g.mission,
               CASE WHEN f.day IS NOT NULL THEN 'PRESENT'
                    WHEN g.mission = 'oco2'
                         AND g.day BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
                        THEN 'EXPECTED_ABSENT'
                    ELSE 'ABSENT' END AS status
        FROM grid g LEFT JOIN features f
          ON g.day = f.day AND g.mission = f.mission)
"""


def _deploy_features(spark: SparkSession, sf: str):
    from . import orchestrator as orc

    ev = load(spark, sf, "events")
    feats = (
        ev.filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            F.when(F.col("user_id") % 2 == 0, "oco3").otherwise("oco2").alias("mission"),
            F.to_date("ts").alias("day"),
        )
        .distinct()
        .withColumn("granule", F.concat_ws("_", "mission", "day"))
    )
    cfg = orc.DeployConfig(
        store_path="", ledger_path="", missions=("oco3", "oco2"),
        known_gaps=(("oco2", dt.date(2024, 1, 10), dt.date(2024, 1, 12)),),
    )
    return feats, cfg


@register(
    "q48_deploy_classification",
    f"""
    WITH {_DEPLOY_FEATURES_SQL}
    SELECT day, mission, status FROM status
    """,
    doc="Deploy orchestrator availability classification (PRESENT/"
    "EXPECTED_ABSENT/ABSENT with known-gap table) over a synthetic "
    "two-mission catalog; ref tools/deploy/run.py:257-285.",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    from . import orchestrator as orc

    feats, cfg = _deploy_features(spark, sf)
    return orc.classify_availability(spark, feats, cfg)


@register(
    "q49_deploy_holdback",
    f"""
    WITH {_DEPLOY_FEATURES_SQL},
    wm AS (
        SELECT max(day) AS watermark FROM (
            SELECT day FROM status GROUP BY day
            HAVING max(CASE WHEN status = 'ABSENT' THEN 1 ELSE 0 END) = 0))
    SELECT s.day, CAST(count(*) AS BIGINT) AS n_missions_present
    FROM status s, wm
    WHERE s.status = 'PRESENT' AND s.day <= wm.watermark
    GROUP BY s.day
    """,
    doc="Deploy tail hold-back: process every day up to the LATEST day with "
    "no ABSENT mission (a later complete day proves earlier absences are "
    "final, not late); ref tools/deploy/run.py:291-305.",
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    from . import orchestrator as orc

    feats, cfg = _deploy_features(spark, sf)
    avail = orc.classify_availability(spark, feats, cfg)
    wm = orc.holdback_watermark(avail)
    return (
        avail.filter((F.col("status") == "PRESENT") & (F.col("day") <= F.lit(wm)))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_missions_present"))
    )


# --------------------------------------------------------------------------
# §2.3 — joins
# --------------------------------------------------------------------------

@register(
    "q10_broadcast_dim_join",
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    doc="J1 broadcast dimension lookup chain (TPC-H Q5 shape); "
    "ref processors/OCO3SamProcessor.py:70-78,475-476.",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    od = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cu = load(spark, sf, "customer")
    na = load(spark, sf, "nation")
    re = load(spark, sf, "region")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), F.col("o_custkey") == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q11_nearest_centroid_assoc",
    """
    WITH ranked AS (
        SELECT c.c_custkey, s.s_suppkey,
               abs(c.c_acctbal - s.s_acctbal) AS dist,
               cn.n_regionkey AS c_region, sn.n_regionkey AS s_region,
               row_number() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY abs(c.c_acctbal - s.s_acctbal), s.s_suppkey) AS rk
        FROM customer c
        CROSS JOIN supplier s
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    )
    SELECT c_custkey, s_suppkey, round(dist, 4) AS dist
    FROM ranked
    WHERE rk = 1 AND c_region = s_region
    """,
    doc="J2 nearest-centroid association + intersects guard (rank-1 KNN "
    "join); ref processors/OCO2Processor.py:400-435.",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    cu = load(spark, sf, "customer")
    su = load(spark, sf, "supplier")
    na = load(spark, sf, "nation")
    cu = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey).select(
        "c_custkey", "c_acctbal", F.col("n_regionkey").alias("c_region")
    )
    su = su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).select(
        "s_suppkey", "s_acctbal", F.col("n_regionkey").alias("s_region")
    )
    # r10: 1-D nearest is a sorted binary search, not a pair expansion —
    # O(n log m) searchsorted kernel (regime-gated; the cross+rank-1
    # reference shape remains nearest_value_1d's sql kernel / large-m
    # regime). Winner contract identical: rank-1 over (dist, s_suppkey).
    won = join_ops.nearest_value_1d(
        cu,
        su,
        probe_key="c_custkey",
        probe_val="c_acctbal",
        value_key="s_suppkey",
        value_val="s_acctbal",
        carry=("s_region",),
    )
    return won.filter(F.col("c_region") == F.col("s_region")).select(
        "c_custkey", "s_suppkey", F.round("__dist", 4).alias("dist")
    )


@register(
    "q12_index_lookup_join",
    """
    SELECT coalesce(c.c_name, 'none') AS owner_name, CAST(count(*) AS BIGINT) AS n_events
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY coalesce(c.c_name, 'none')
    """,
    doc="J3 positional/sequence-id resolution with −1→'none' sentinel; "
    "ref processors/OCO3SifProcessor.py:363-366.",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    cu = load(spark, sf, "customer")
    return (
        ev.join(F.broadcast(cu), ev.user_id == cu.c_custkey, "left")
        .select(F.coalesce(F.col("c_name"), F.lit("none")).alias("owner_name"))
        .groupBy("owner_name")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q13_range_refine_join",
    """
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_quantity > p_size
    GROUP BY p_brand
    """,
    doc="J4 coarse-equi + exact-refine join shape (bbox prefilter then "
    "geometry predicate); ref processors/OCO3SamProcessor.py:253-295.",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    pa = load(spark, sf, "part")
    return (
        li.join(F.broadcast(pa), (li.l_partkey == pa.p_partkey) & (li.l_quantity > pa.p_size))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "q14_day_alignment_full_outer",
    """
    WITH clicks AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_click
        FROM events WHERE event_type = 'click' GROUP BY 1),
    purchases AS (
        SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_purchase
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT coalesce(c.day, p.day) AS day,
           coalesce(n_click, 0)    AS n_click,
           coalesce(n_purchase, 0) AS n_purchase
    FROM clicks c FULL OUTER JOIN purchases p ON c.day = p.day
    """,
    doc="J5 same-day multi-mission alignment: full outer join on data-day "
    "with empty-fill; ref main.py:242-320, tools/deploy/run.py:566-580.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").withColumn("day", F.to_date("ts"))
    per = {
        "click": ev.filter(F.col("event_type") == "click")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n")),
        "purchase": ev.filter(F.col("event_type") == "purchase")
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n")),
    }
    aligned = join_ops.day_alignment(per, "day")
    return aligned.select(
        "day",
        F.coalesce(F.col("click_n"), F.lit(0)).alias("n_click"),
        F.coalesce(F.col("purchase_n"), F.lit(0)).alias("n_purchase"),
    )


@register(
    "q15_completeness_holdback",
    """
    SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    HAVING count(DISTINCT event_type) = 5
    """,
    doc="J6 day-completeness hold-back: a day processes only when every "
    "expected collection is present; ref tools/deploy/run.py:257-305.",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").withColumn("day", F.to_date("ts"))
    return (
        ev.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("__k"),
        )
        .filter(F.col("__k") == 5)
        .drop("__k")
    )


@register(
    "q16_sync_diff_join",
    """
    WITH l AS (
        SELECT o_orderkey AS key, round(o_totalprice, 2) AS l_size, o_orderdate AS l_mtime
        FROM orders),
    r AS (
        SELECT l_orderkey AS key, round(sum(l_extendedprice), 2) AS r_size,
               max(l_shipdate) AS r_mtime
        FROM lineitem GROUP BY l_orderkey)
    SELECT CASE WHEN r_size IS NULL THEN 'upload_new'
                WHEN l_size IS NULL THEN 'delete_orphan'
                WHEN l_size <> r_size OR l_mtime > r_mtime THEN 'upload_changed'
                ELSE 'unchanged' END AS action,
           CAST(count(*) AS BIGINT) AS n
    FROM l FULL OUTER JOIN r USING (key)
    GROUP BY 1
    """,
    doc="J7 incremental-sync diff plan: full outer join on key, classify "
    "new/changed/orphan; ref tools/s3Sync/sync.py:87-165.",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.round("o_totalprice", 2).alias("size"),
        F.col("o_orderdate").alias("mtime"),
    )
    li = (
        load(spark, sf, "lineitem")
        .groupBy(F.col("l_orderkey").alias("key"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("size"),
            F.max("l_shipdate").alias("mtime"),
        )
    )
    plan = join_ops.sync_diff(od, li, "key", "size", "mtime")
    return plan.groupBy("action").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# §2.4 — sessionization (signature operator)
# --------------------------------------------------------------------------

_Q17_SQL = """
    WITH e AS (
        SELECT user_id, event_type,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                   AS idx
        FROM events),
    b AS (
        SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                       THEN 1 ELSE 0 END AS brk
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
    r AS (
        SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY idx) AS BIGINT)
                      AS region_id
        FROM b)
    SELECT user_id, region_id, event_type,
           CAST(min(idx) AS INT) AS start_idx,
           CAST(max(idx) + 1 AS INT) AS stop_excl,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM r GROUP BY user_id, region_id, event_type
"""


@register(
    "q17_sessionize_islands",
    _Q17_SQL,
    doc="§2.4 island detection: runs of constant key per partition via "
    "lag + running sum; ref processors/OCO3SamProcessor.py:356-432.",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    ev = sess_ops.assign_dense_index(ev, ["user_id"], ["ts", "event_id"], "idx")
    regions = sess_ops.detect_regions(
        ev.withColumn("__m", F.lit(1)),
        partition_cols=["user_id"],
        idx_col="idx",
        mode_col="__m",
        mode_value=1,
        target_col="event_type",
        margin=0,  # no gaps exist (single span), merge disabled
        order_cols=["ts", "event_id"],  # reuse the index window's sort
    )
    return regions.select(
        "user_id",
        "region_id",
        "event_type",
        "start_idx",
        "stop_excl",
        F.col("n_mode_rows").alias("n_rows"),
    )


_Q18_SQL = """
    WITH e AS (
        SELECT user_id, event_type,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                   AS idx
        FROM events),
    m AS (SELECT * FROM e WHERE event_type <> 'error'),
    s AS (
        SELECT *, CASE WHEN lag(idx) OVER w IS NULL OR idx - lag(idx) OVER w > 1
                       THEN 1 ELSE 0 END AS new_span
        FROM m WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
    sp AS (
        SELECT *, sum(new_span) OVER (PARTITION BY user_id ORDER BY idx) AS span
        FROM s),
    rb AS (
        SELECT *, CASE WHEN lag(span) OVER w IS NULL OR span <> lag(span) OVER w
                            OR event_type IS DISTINCT FROM lag(event_type) OVER w
                       THEN 1 ELSE 0 END AS new_run
        FROM sp WINDOW w AS (PARTITION BY user_id ORDER BY idx)),
    rr AS (
        SELECT *, sum(new_run) OVER (PARTITION BY user_id ORDER BY idx) AS run
        FROM rb),
    runs AS (
        SELECT user_id, run, min(event_type) AS tid, min(idx) AS rstart,
               max(idx) + 1 AS rstop, count(*) AS nrows
        FROM rr GROUP BY user_id, run),
    mg AS (
        SELECT *, CASE WHEN rstart - lag(rstop) OVER w < 2
                            AND tid = lag(tid) OVER w
                       THEN 0 ELSE 1 END AS is_new
        FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY rstart)),
    g AS (
        SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY rstart) AS BIGINT)
                      AS region_id
        FROM mg)
    SELECT user_id, region_id, min(tid) AS event_type,
           CAST(min(rstart) AS INT) AS start_idx,
           CAST(max(rstop) AS INT) AS stop_excl,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(sum(nrows) AS BIGINT) AS n_mode_rows
    FROM g GROUP BY user_id, region_id
"""


@register(
    "q18_sessionize_gap_merge",
    _Q18_SQL,
    doc="§2.4 full segmentation with gap-merge (margin=2, strict <): runs "
    "of the same key separated by a 0-1-row interruption merge, swallowing "
    "the gap; ref processors/OCO3SamProcessor.py:365-375.",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    ev = sess_ops.assign_dense_index(ev, ["user_id"], ["ts", "event_id"], "idx")
    regions = sess_ops.detect_regions(
        ev.withColumn("__in_mode", (F.col("event_type") != "error").cast("int")),
        partition_cols=["user_id"],
        idx_col="idx",
        mode_col="__in_mode",
        mode_value=1,
        target_col="event_type",
        margin=2,
        merge_inclusive=False,
        order_cols=["ts", "event_id"],  # reuse the index window's sort
    )
    return regions.select(
        "user_id", "region_id", "event_type", "start_idx", "stop_excl", "n_runs", "n_mode_rows"
    )


# --------------------------------------------------------------------------
# §2.5 — gridding (the SQL-expressible nearest path; the pandas-UDF kernel
# is exercised by q41 with a rows-only check and by unit tests)
# --------------------------------------------------------------------------

@register(
    "q19_nearest_grid_1d",
    """
    WITH cells AS (
        SELECT CAST(gs AS INT) AS cell_x
        FROM generate_series(0, 10000, 250) t(gs)),
    ranked AS (
        SELECT cell_x, c_custkey, abs(c_acctbal - cell_x) AS dist,
               row_number() OVER (
                   PARTITION BY cell_x
                   ORDER BY abs(c_acctbal - cell_x), c_custkey) AS rk
        FROM cells CROSS JOIN customer)
    SELECT cell_x, c_custkey AS nearest_custkey, round(dist, 4) AS dist
    FROM ranked WHERE rk = 1
    """,
    doc="G1 'nearest' interpolation as pure DataFrame ops: cell×point "
    "distance rank-1; ref processors/OCO3SamProcessor.py:161-182 "
    "(method='nearest' branch).",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    cu = load(spark, sf, "customer")
    cells = spark.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(10000), F.lit(250))).alias("cell_x")
    ).select(F.col("cell_x").cast("int").alias("cell_x"))
    paired = cells.crossJoin(cu).withColumn(
        "dist", F.abs(F.col("c_acctbal") - F.col("cell_x"))
    )
    w = Window.partitionBy("cell_x").orderBy("dist", "c_custkey")
    return (
        paired.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "cell_x",
            F.col("c_custkey").alias("nearest_custkey"),
            F.round("dist", 4).alias("dist"),
        )
    )


# --------------------------------------------------------------------------
# §2.6 — aggregations
# --------------------------------------------------------------------------

@register(
    "q20_climatology_monthly",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS span,
           {exact_mean_sql('sum(o_totalprice)', 'count(o_totalprice)')} AS o_totalprice_mean,
           CAST(count(o_totalprice) AS BIGINT) AS o_totalprice_valid_count,
           CAST(count(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days
    FROM orders GROUP BY 1
    """,
    doc="A1 temporal-mean climatology per monthly span; "
    "ref tools/climatology/main.py:183-250.",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders")
    spans = agg_ops.climatology_spans(od, "o_orderdate", ["o_totalprice"], freq="month")
    return spans.select(
        "span",
        exact_mean(
            F.col("o_totalprice_sum"), F.col("o_totalprice_valid_count")
        ).alias("o_totalprice_mean"),
        "o_totalprice_valid_count",
        "n_days",
    )


@register(
    "q47_climatology_seasonal",
    f"""
    WITH base AS (
        SELECT o_orderdate AS t, o_totalprice AS v,
               month(o_orderdate) AS m, day(o_orderdate) AS d
        FROM orders),
    rolled AS (
        SELECT *, CAST(floor((m + CASE WHEN m % 3 = 0 AND d >= 21 THEN 1 ELSE 0 END - 1) / 3)
                       AS INT) AS qi
        FROM base)
    SELECT make_date(year(t) - CASE WHEN qi = 0 THEN 1 ELSE 0 END,
                     CASE WHEN qi = 0 THEN 12 ELSE qi * 3 END, 21) AS span,
           {exact_mean_sql('sum(v)', 'count(v)')} AS o_totalprice_mean,
           CAST(count(v) AS BIGINT) AS o_totalprice_valid_count,
           CAST(count(DISTINCT CAST(t AS DATE)) AS BIGINT) AS n_days
    FROM rolled GROUP BY 1
    """,
    doc="A1 seasonal climatology with the reference's day-20 3-month split: "
    "season boundaries at day 20 of Mar/Jun/Sep/Dec, labeled by canonical "
    "start date; ref tools/climatology/main.py:194-209.",
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders")
    spans = agg_ops.climatology_spans(od, "o_orderdate", ["o_totalprice"], freq="season")
    return spans.select(
        "span",
        exact_mean(
            F.col("o_totalprice_sum"), F.col("o_totalprice_valid_count")
        ).alias("o_totalprice_mean"),
        "o_totalprice_valid_count",
        "n_days",
    )


@register(
    "q58_asof_join",
    """
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purchases AS (
        SELECT user_id, ts, max(value) AS purchase_value
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
           round(p.purchase_value, 4) AS purchase_value,
           CAST(p.ts AS TIMESTAMP) AS matched_time
    FROM clicks c
    ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    doc="As-of (backward) join — each click matched to the user's latest "
    "prior-or-simultaneous purchase. Spark lacks a built-in ASOF; the "
    "engine's union-sort formulation does one shuffle+sort per key with no "
    "range-join explosion, hash-matched against DuckDB's native ASOF JOIN.",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = join_ops.asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", ["purchase_value"]
    )
    return out.select(
        "event_id", "user_id", "ts",
        F.round("purchase_value", 4).alias("purchase_value"),
        F.col("__matched_time").alias("matched_time"),
    )


@register(
    "q54_monotonic_check",
    """
    WITH seq AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
        FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inversions,
           CAST(max(ts) AS TIMESTAMP) AS series_end
    FROM seq GROUP BY user_id
    """,
    doc="O2 monotonic-time verify: per-series count of timestamps that go "
    "backwards relative to arrival order — the invariant the reference "
    "checks (and auto-sorts) after every Zarr append; "
    "ref writers/ZarrWriter.py:328-408, utils/ZarrUtils.py:115-205.",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.withColumn("prev_ts", F.lag("ts").over(w))
    inv = (F.col("ts") < F.col("prev_ts")).cast("int")
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.coalesce(inv, F.lit(0))).alias("n_inversions"),
        F.max("ts").alias("series_end"),
    )


@register(
    "q21_month_of_year",
    """
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS span,
               round(sum(o_totalprice), 2) / count(*) AS m_mean,
               CAST(count(*) AS BIGINT) AS m_count
        FROM orders GROUP BY 1)
    SELECT CAST(month(span) AS INT) AS month,
           round(avg(m_mean), 4) AS mean_of_means,
           CAST(sum(m_count) AS BIGINT) AS total_count,
           make_date(1970, CAST(month(span) AS INT), 1) AS span
    FROM monthly GROUP BY month(span)
    """,
    doc="A2 month-of-year consolidation across years, mapped to year 1970; "
    "ref tools/climatology/main.py:281-329.",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders")
    monthly = od.groupBy(F.date_trunc("month", "o_orderdate").alias("span")).agg(
        # stable cross-engine mean: exact-cent sum, then divide
        (F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1))).alias("m_mean"),
        F.count(F.lit(1)).alias("m_count"),
    )
    out = agg_ops.month_of_year_consolidation(
        monthly, "span", mean_cols=["m_mean"], count_cols=["m_count"]
    )
    return out.select(
        "month",
        F.round("m_mean", 4).alias("mean_of_means"),
        F.col("m_count").alias("total_count"),
        "span",
    )


@register(
    "q22_region_stats",
    f"""
    SELECT user_id,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           {exact_mean_sql('sum(value)', 'count(*)')} AS avg_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
    """,
    doc="A4 region centroid/extent stats; ref processors/OCO2Processor.py:405-413.",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        exact_mean(F.sum("value"), F.count(F.lit(1))).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q23_rollup_grand_total",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY ROLLUP (event_type)
    """,
    doc="A6 per-key sums plus grand-total row via rollup; "
    "ref tools/bbox-tools/targetsStats.py:209-240.",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return agg_ops.rollup_totals(
        ev,
        ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value")],
    )


@register(
    "q59_cube_totals",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(l_quantity), 0) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="A6 multi-dimensional consolidation: CUBE over (returnflag, "
    "linestatus) — per-cell, per-axis subtotal, and grand-total rows in one "
    "pass (the mission x qf reporting shape); Spark computes all grouping "
    "sets in a single Expand+aggregate, no N-pass unioning.",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 0).cast("long").alias("total_qty"),
    )


@register(
    "q60_percentile_profile",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact per-group percentile profile (p50/p90/p99) — the data-quality "
    "profiling shape for corpus curation; Spark's exact `percentile` and "
    "DuckDB's quantile_cont share linear-interpolation semantics, verified "
    "bit-identical. (Exact percentiles sort per group; at 100 TB swap in "
    "percentile_approx's mergeable sketch for the same plan shape.)",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "q24_coverage_attrs",
    """
    SELECT CAST(min(ts) AS TIMESTAMP) AS coverage_start,
           CAST(max(ts) AS TIMESTAMP) AS coverage_end,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events
    """,
    doc="A7 coverage min/max maintenance on append; ref writers/ZarrWriter.py:140-167.",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    return agg_ops.coverage_attrs(load(spark, sf, "events"), "ts")


# --------------------------------------------------------------------------
# §2.7/2.8 — windows, dedup-keep-first, sorts/limits
# --------------------------------------------------------------------------

@register(
    "q25_dedup_keep_first",
    """
    WITH ranked AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        FROM events)
    SELECT user_id, event_id, event_type FROM ranked WHERE rk = 1
    """,
    doc="O3/S7 duplicate-slice keep-first; ref writers/ZarrWriter.py:353-380. "
    "Executed as a min_by hash aggregate (map-side partial combine, no sort; "
    "the shuffle carries |users| rows instead of |events|) — strictly better "
    "than the row_number/WindowGroupLimit plan it replaced (VERDICT r06 item 1). "
    "struct(ts, event_id) is a unique ordering key per user, so min_by is "
    "deterministic; the oracle keeps the equivalent row_number SQL.",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    first = F.min_by(
        F.struct("event_id", "event_type"), F.struct("ts", "event_id")
    ).alias("first")
    return (
        ev.groupBy("user_id")
        .agg(first)
        .select("user_id", F.col("first.event_id"), F.col("first.event_type"))
    )


@register(
    "q26_topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    doc="O1/O6 deterministic ordered limit (top-k).",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders")
    return (
        od.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


# --------------------------------------------------------------------------
# §2.9 — scalar functions
# --------------------------------------------------------------------------

@register(
    "q27_granule_filename_roundtrip",
    """
    SELECT o_orderkey,
           concat('oco3_LtCO2_', strftime(o_orderdate, '%y%m%d'), '_B11000_', o_orderkey, '.nc4')
               AS granule_name,
           CAST(strptime(string_split(
               concat('oco3_LtCO2_', strftime(o_orderdate, '%y%m%d'), '_B11000_', o_orderkey, '.nc4'),
               '_')[3], '%y%m%d') AS DATE) AS granule_date,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
    FROM orders WHERE o_orderkey <= 200
    """,
    doc="C1 filename→date parse + C9 ISO-8601 formatting; "
    "ref processors/Processor.py:79-83, writers/ZarrWriter.py:48,131.",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    od = load(spark, sf, "orders").filter(F.col("o_orderkey") <= 200)
    fname = F.concat(
        F.lit("oco3_LtCO2_"),
        F.date_format("o_orderdate", "yyMMdd"),
        F.lit("_B11000_"),
        F.col("o_orderkey"),
        F.lit(".nc4"),
    )
    return od.select(
        "o_orderkey",
        fname.alias("granule_name"),
        scalar.granule_date(fname).alias("granule_date"),
        scalar.iso8601(F.col("o_orderdate")).alias("iso_ts"),
    )


@register(
    "q28_target_id_codes",
    f"""
    SELECT p_partkey,
           {scalar.extract_id_num_sql('p_brand')} AS id_num,
           {scalar.determine_id_type_sql('p_name')} AS type_code
    FROM part
    """,
    doc="C4 trailing-digit id extraction + C5 prefix type classification; "
    "ref targets/TargetInfo.py:128-154.",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    pa = load(spark, sf, "part")
    return pa.select(
        "p_partkey",
        scalar.extract_id_num(F.col("p_brand")).alias("id_num"),
        scalar.determine_id_type(F.col("p_name")).alias("type_code"),
    )


@register(
    "q29_merkle_checksum",
    """
    SELECT c_nationkey,
           md5(string_agg(md5(c_name), '|' ORDER BY md5(c_name))) AS checksum,
           CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY c_nationkey
    """,
    doc="S12/C11 Merkle-fold store checksum: sorted member digests combined "
    "into one; ref tools/zarrChecksum/checksum.py:142-189.",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    cu = load(spark, sf, "customer")
    return cu.groupBy("c_nationkey").agg(
        hashing.merkle_fold(F.md5(F.col("c_name"))).alias("checksum"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q131_zarr_roundtrip",
    """
    WITH cells AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS time,
               CAST(o_orderkey % 8 AS INT) AS lat_idx,
               CAST((o_orderkey // 8) % 8 AS INT) AS lon_idx,
               max(o_totalprice) AS value
        FROM orders
        WHERE o_orderdate < TIMESTAMP '1995-04-01'
        GROUP BY 1, 2, 3)
    SELECT time,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
    FROM cells GROUP BY time
    """,
    doc="S6/S3 Zarr v2 store round-trip: store rows -> distributed "
    "from-spec Zarr export (sinks/zarr_store.export_zarr: one shuffle on "
    "(variable, chunk), executors write chunk payloads) -> distributed "
    "scan (one decode task per chunk) -> aggregate. The oracle computes "
    "the same aggregate straight from parquet, so a hash match proves the "
    "container round-trip is value-exact; ref writers/ZarrWriter.py:82-326, "
    "utils/ZarrUtils.py:70-112. Per-cell max is order-independent and the "
    "final sum is integer cents, so floats cross engines exactly. Since "
    "round 9 the store is written with the reference's exact Blosc "
    "blosclz codec (sinks/blosclite.py, from spec).",
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from .sinks.zarr_store import export_zarr, scan_zarr

    od = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp")
    )
    cells = (
        od.groupBy(
            F.date_trunc("day", "o_orderdate").alias("time"),
            (F.col("o_orderkey") % 8).cast("int").alias("lat_idx"),
            F.expr("(o_orderkey div 8) % 8").cast("int").alias("lon_idx"),
        )
        .agg(F.max("o_totalprice").alias("value"))
        .select(
            F.lit("oco3").alias("mission"),
            F.lit("t1").alias("target_id"),
            F.lit("post").alias("qf"),
            "time",
            "lat_idx",
            "lon_idx",
            F.lit("v").alias("variable"),
            "value",
        )
    )
    path = tempfile.mkdtemp(prefix="q131_zarr_")
    # compressor='blosc' = the reference's exact chunk codec (blosclz
    # clevel-9 byte-shuffle via sinks/blosclite.py, round 9) — the driver
    # gate now exercises reference-shaped chunks end-to-end
    export_zarr(cells, path, lat_res=8, lon_res=8, chunk_t=16,
                chunk_lat=4, chunk_lon=4, compressor="blosc")
    back = scan_zarr(spark, path)
    return back.groupBy("time").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )


# Parts 2 and 3 of the catalog (documents/embeddings: dedup, similarity
# search, text analysis; pandas-UDF kernels: gridding, mission pipeline,
# multimodal) register themselves into the same REGISTRY on import.
from . import catalog_text  # noqa: E402,F401  (import-time registration)
from . import catalog_kernels  # noqa: E402,F401  (import-time registration)
from . import catalog_corpus  # noqa: E402,F401  (import-time registration)
from . import catalog_curation  # noqa: E402,F401  (import-time registration)
from . import catalog_sketch  # noqa: E402,F401  (import-time registration)
