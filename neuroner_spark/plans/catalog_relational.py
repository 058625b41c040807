"""Oracle-checked relational operator catalog (SURVEY.md §2 —
joins/aggs/windows/sorts/sets/scalar fns over the driver star schema).

Each entry: a PySpark implementation (spark, sf_dir) -> DataFrame and
an equivalent DuckDB SQL string. Column names/types are pinned on both
sides; floats are rounded identically for value-hash parity.

Scale notes are attached per query — these aren't toy translations:
each one demonstrates the plan shape (broadcast vs shuffle, pushdown,
partial agg) we'd want at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- A1/A4: TPC-H-Q1-style pricing summary (partial agg + tiny key space)
def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- J1: snowflake broadcast joins (dims broadcast; fact never shuffles)
def q_region_acctbal(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


SQL_REGION_ACCTBAL = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- J3 + J4 in one oracle: left semi (EXISTS) and left anti
# (NOT EXISTS) membership, tagged — one entry so the whole registry
# fits the driver's per-round query budget.
def q_customer_order_membership(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "has_orders", F.lit(True)
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "has_orders", F.lit(False)
    )
    return (
        semi.unionByName(anti)
        .groupBy("c_mktsegment", "has_orders")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


SQL_CUSTOMER_ORDER_MEMBERSHIP = """
SELECT c_mktsegment, has_orders, count(*) AS n_customers,
       round(avg(c_acctbal), 4) AS avg_acctbal
FROM (
  SELECT c_mktsegment, c_acctbal, TRUE AS has_orders
  FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  UNION ALL
  SELECT c_mktsegment, c_acctbal, FALSE AS has_orders
  FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
)
GROUP BY c_mktsegment, has_orders
"""


# --- J5: range join with an equi anchor (doc-equi key keeps it a hash join)
def q_shipped_within_30d(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.date_add(F.col("o_orderdate"), 30))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


SQL_SHIPPED_WITHIN_30D = """
SELECT o_orderpriority, count(*) AS n_lineitems,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
"""


# --- J7: left outer join + null handling
def q_part_order_stats(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_outer")
        .groupBy("p_brand")
        .agg(
            F.count("l_orderkey").alias("n_lineitems"),
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).cast("long").alias("n_unsold_rows"),
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).alias("total_qty"),
        )
    )


SQL_PART_ORDER_STATS = """
SELECT p_brand, count(l_orderkey) AS n_lineitems,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unsold_rows,
       round(coalesce(sum(l_quantity), 0.0), 2) AS total_qty
FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
GROUP BY p_brand
"""


# --- W1-analog running sum + RANGE frame in one oracle: both window
# frames computed per event row (same partition key -> one Exchange +
# one sort feeds both WindowExecs).
def q_window_frames(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w_rows = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # FRACTIONAL epoch seconds: cast("long") truncates microseconds and
    # disagrees with DuckDB's fractional epoch() exactly at RANGE-frame
    # boundaries (caught by the sf0.1 oracle sweep — 1 row in 100k)
    epoch = F.col("ts").cast("timestamp").cast("double")
    w_range = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-3600, 0)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w_rows), 2).alias("running_value"),
        F.round(F.sum("value").over(w_range), 2).alias("hour_sum"),
    )


SQL_WINDOW_FRAMES = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS hour_sum
FROM events
"""


# --- W2/W3-analog: lead/lag
def q_event_transitions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count("*").alias("n"))
    )


SQL_EVENT_TRANSITIONS = """
SELECT cur, nxt, count(*) AS n FROM (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
) WHERE nxt IS NOT NULL GROUP BY cur, nxt
"""


# --- W4-analog: gap sessionization
def q_user_sessions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional seconds (see q_window_frames): truncated-long gaps can
    # disagree with DuckDB's fractional epoch() at the 1800s boundary
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    with_flag = ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = with_flag.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.max("n_events").cast("long").alias("max_session_events"),
        )
    )


SQL_USER_SESSIONS = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM flagged
), per_sess AS (
  SELECT user_id, sess_id, count(*) AS n_events FROM sess GROUP BY user_id, sess_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_sess GROUP BY user_id
"""


# --- O1/O4: top-k per group
def q_top3_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


SQL_TOP3_ORDERS_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


# --- array-function battery over the embeddings list column
def q_array_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first"),
        F.round(
            F.aggregate(
                F.slice("embedding", 1, 8), F.lit(0.0), lambda a, v: a + v.cast("double")
            ),
            6,
        ).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
    )


SQL_ARRAY_FUNCS = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(embedding[1]::DOUBLE, 6) AS first,
       round(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 6) AS head_sum,
       round(list_max(embedding)::DOUBLE, 6) AS vmax,
       round(list_min(embedding)::DOUBLE, 6) AS vmin
FROM embeddings
"""


# --- ranking battery: dense_rank / ntile / percent_rank
def q_rank_battery(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


SQL_RANK_BATTERY = """
SELECT o_orderkey, o_orderpriority,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS prank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


# --- pivot (explicit value list -> deterministic columns)
def q_pivot_event_values(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.withColumn("ub", (F.col("user_id") % 4).cast("long"))
        .groupBy("ub")
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 2))
    )


SQL_PIVOT_EVENT_VALUES = """
SELECT CAST(user_id % 4 AS BIGINT) AS ub,
       round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
       round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
       round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
       round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error
FROM events GROUP BY 1
"""


# --- cube helper (rollup_docs tag-merged into events_grouping's
# tagged frame in r5 — DataFrame.rollup stays oracle-checked there)
def cubed(bucketed):
    return bucketed.cube("event_type", "user_bucket").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )


# --- U1 + U2 + U3 in one oracle: UNION-distinct, INTERSECT and
# EXCEPT, tagged.  EXCEPT (distinct semantics) = DataFrame.subtract;
# exceptAll would keep per-occurrence leftovers, which SQL EXCEPT does
# not.  The 'union' branch is the r6 tag-merge of the old
# ``vocab_union`` entry (documents tokens ∪ part-name words, distinct)
# — driver 50-query budget; the freed slot is what ``pii_redaction``
# occupies.  Common schema: (val string, op string).
def q_nations_setops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    inter = c.intersect(s).select(
        F.col("nationkey").cast("string").alias("val"), F.lit("intersect").alias("op")
    )
    exc = c.subtract(s).select(
        F.col("nationkey").cast("string").alias("val"), F.lit("except").alias("op")
    )
    d = _t(spark, sf_dir, "documents")
    p = _t(spark, sf_dir, "part")
    doc_toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("val"))
    part_toks = p.select(F.explode(F.split(F.lower(F.col("p_name")), " ")).alias("val"))
    uni = doc_toks.unionByName(part_toks).distinct().withColumn("op", F.lit("union"))
    return inter.unionByName(exc).unionByName(uni)


SQL_NATIONS_SETOPS = """
SELECT CAST(nationkey AS VARCHAR) AS val, 'intersect' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT CAST(nationkey AS VARCHAR) AS val, 'except' AS op FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT val, 'union' AS op FROM (
  SELECT DISTINCT val FROM (
    SELECT unnest(string_split(text, ' ')) AS val FROM documents
    UNION ALL
    SELECT unnest(string_split(lower(p_name), ' ')) AS val FROM part
  )
)
"""


# --- distinct aggregation
def q_distinct_users(spark, sf_dir):
    """A2 cardinalities + F9 JSON props + median/stddev stats,
    tag-merged into ONE events groupBy (driver 50-query budget — the
    freed slots are what ``dedup_near_corpus`` and ``dup_spans``
    occupy): per event_type, distinct users, event count, avg/max of
    the JSON ``$.k`` prop, and the value distribution (median, sample
    stddev, min, max).  One scan, one shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.round(F.median("value"), 4).alias("med"),
            F.round(F.stddev_samp("value"), 4).alias("sd"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       round(median(value), 4) AS med,
       round(stddev_samp(value), 4) AS sd,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM events GROUP BY event_type
"""


# --- F8: date_trunc partitioning key
# F8 events-per-day lives in the tagged ``events_grouping`` frame
# since r6 ('perday' branch) — merged to free the driver slot
# ``lm_perplexity`` occupies under the <=50-entry budget.


# --- O1: frequency-ordered vocabulary with stable index assignment.
# Two-phase (range-partition + local rank + offsets) — a web-scale
# vocabulary (~10^8 tokens) never lands on one partition.
def q_vocab_freq(spark, sf_dir):
    from neuroner_spark.operators.dedup import ensure_sharded
    from neuroner_spark.operators.ids import assign_sequential_ids

    # ensure_sharded: the explode's map side inherits the input layout — a
    # single-split scan would count the whole corpus on one task
    # (measured 2.9 s vs 1.1 s on a sharded copy at sf0.1)
    d = ensure_sharded(_t(spark, sf_dir, "documents"), "doc_id")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    return assign_sequential_ids(counts, [F.desc("cnt"), F.asc("token")], id_col="idx")


SQL_VOCAB_FREQ = """
SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS idx FROM (
  SELECT token, count(*) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token
)
"""


# --- P3: rare-token -> UNK remap
def q_rare_token_unk(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    remapped = counts.select(
        F.when(F.col("cnt") < 5, F.lit("_UNK_")).otherwise(F.col("token")).alias("token2"),
        "cnt",
    )
    return remapped.groupBy("token2").agg(F.sum("cnt").cast("long").alias("cnt"))


SQL_RARE_TOKEN_UNK = """
WITH counts AS (
  SELECT token, count(*) AS cnt FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token
)
SELECT CASE WHEN cnt < 5 THEN '_UNK_' ELSE token END AS token2,
       CAST(sum(cnt) AS BIGINT) AS cnt
FROM counts GROUP BY 1
"""


# --- TPC-H-Q3-style: 3-way join, filter both sides, top-k by revenue
def q_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < "1995-06-01")
        .join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > "1995-06-01")
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_SHIPPING_PRIORITY = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-06-01'
  AND l_shipdate > TIMESTAMP '1995-06-01'
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# --- TPC-H-Q5-style: snowflake join through supplier+customer to region
def q_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


SQL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


# --- GROUPING SETS + CUBE + ROLLUP in one oracle, tagged (all three
# still the real Spark primitives: GROUP BY GROUPING SETS via SQL,
# DataFrame.cube, DataFrame.rollup).  The rollup branch is the r5
# tag-merge of the old ``rollup_docs`` entry (driver 50-query budget —
# the freed slot is what ``winnowing_fingerprints`` occupies).
def q_events_grouping(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("_ev")
    gs = spark.sql(
        """
        SELECT 'gsets' AS grp, event_type, CAST(user_id % 3 AS BIGINT) AS ub,
               count(*) AS n, round(sum(value), 2) AS total_value
        FROM _ev
        GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 3 AS BIGINT)), (event_type, CAST(user_id % 3 AS BIGINT)))
        """
    )
    cu = (
        cubed(ev.withColumn("user_bucket", (F.col("user_id") % 5).cast("long")))
        .select(
            F.lit("cube").alias("grp"),
            "event_type",
            F.col("user_bucket").alias("ub"),
            "n",
            "total_value",
        )
    )
    ro = (
        ev.withColumn("user_bucket", (F.col("user_id") % 7).cast("long"))
        .rollup("event_type", "user_bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.lit("rollup").alias("grp"),
            "event_type",
            F.col("user_bucket").alias("ub"),
            "n",
            "total_value",
        )
    )
    # 'perday' branch: the r6 tag-merge of the old ``events_per_day``
    # entry (F8 date_trunc stays oracle-checked here; the freed slot is
    # what ``lm_perplexity`` occupies) — the day string rides the
    # event_type column, ub is NULL.
    pd_ = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.lit("perday").alias("grp"),
            "event_type",
            F.lit(None).cast("long").alias("ub"),
            "n",
            "total_value",
        )
    )
    return gs.unionByName(cu).unionByName(ro).unionByName(pd_)


SQL_EVENTS_GROUPING = """
SELECT 'gsets' AS grp, event_type, CAST(user_id % 3 AS BIGINT) AS ub,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 3 AS BIGINT)), (event_type, CAST(user_id % 3 AS BIGINT)))
UNION ALL
SELECT 'cube' AS grp, event_type, CAST(user_id % 5 AS BIGINT) AS ub, count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events GROUP BY CUBE(event_type, (CAST(user_id % 5 AS BIGINT)))
UNION ALL
SELECT 'rollup' AS grp, event_type, CAST(user_id % 7 AS BIGINT) AS ub, count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events GROUP BY ROLLUP(event_type, (CAST(user_id % 7 AS BIGINT)))
UNION ALL
SELECT 'perday' AS grp, strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_type,
       CAST(NULL AS BIGINT) AS ub, count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 2
"""


# --- statistical aggregates: median / stddev / min / max
# value_stats merged into the tagged distinct_users frame (r4) —
# freed the driver slot dup_spans occupies.
# --- string function battery: case, substr, length, levenshtein, concat
def q_string_funcs(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_name")).alias("up"),
        F.substring(F.col("c_name"), 1, 8).alias("pre"),
        F.length("c_name").cast("long").alias("len"),
        F.levenshtein(F.col("c_name"), F.lit("Customer#0")).cast("long").alias("lev"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("tag"),
    )


SQL_STRING_FUNCS = """
SELECT c_custkey,
       upper(c_name) AS up,
       substring(c_name, 1, 8) AS pre,
       CAST(length(c_name) AS BIGINT) AS len,
       CAST(levenshtein(c_name, 'Customer#0') AS BIGINT) AS lev,
       c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR) AS tag
FROM customer
"""


# U1 vocab union lives in the tagged ``nations_setops`` frame since
# r6 ('union' branch) — merged to free the driver slot
# ``pii_redaction`` occupies under the <=50-entry budget.
# A7 (max token length probe) lives in catalog_ner's tagged
# `token_accuracy` frame since r3 — merged to free a driver slot for
# `dedup_contamination` under the <=50-entry budget.


QUERIES = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "local_supplier_volume": (q_local_supplier_volume, SQL_LOCAL_SUPPLIER_VOLUME),
    "events_grouping": (q_events_grouping, SQL_EVENTS_GROUPING),
    "string_funcs": (q_string_funcs, SQL_STRING_FUNCS),
    "region_acctbal": (q_region_acctbal, SQL_REGION_ACCTBAL),
    "customer_order_membership": (q_customer_order_membership, SQL_CUSTOMER_ORDER_MEMBERSHIP),
    "shipped_within_30d": (q_shipped_within_30d, SQL_SHIPPED_WITHIN_30D),
    "part_order_stats": (q_part_order_stats, SQL_PART_ORDER_STATS),
    "window_frames": (q_window_frames, SQL_WINDOW_FRAMES),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "top3_orders_per_customer": (q_top3_orders_per_customer, SQL_TOP3_ORDERS_PER_CUSTOMER),
    "array_funcs": (q_array_funcs, SQL_ARRAY_FUNCS),
    "rank_battery": (q_rank_battery, SQL_RANK_BATTERY),
    "pivot_event_values": (q_pivot_event_values, SQL_PIVOT_EVENT_VALUES),
    "nations_setops": (q_nations_setops, SQL_NATIONS_SETOPS),
    "distinct_users": (q_distinct_users, SQL_DISTINCT_USERS),
    "vocab_freq": (q_vocab_freq, SQL_VOCAB_FREQ),
    "rare_token_unk": (q_rare_token_unk, SQL_RARE_TOKEN_UNK),
}
