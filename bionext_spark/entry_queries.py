"""Driver-checked operator queries: Spark implementation + DuckDB oracle.

Each entry exposes one operator family from SURVEY.md §2 (or a
training-data-pipeline op) as a query over the driver's synthetic tables
(`TESTDATA.md`), with an ANSI-SQL oracle DuckDB runs on the same parquet.
Column names are aligned between both sides; floating-point outputs are
restricted to values both engines compute bit-identically (rationals of
small ints, fixed-grid sums rounded to 4dp) or replaced by integer ranks.

Naming: q* = relational core, j* = joins, a* = aggregations, p*/w*/u*/f* =
filters/windows/set-ops/scalars, dedup_*/ann_*/text_* = training-data ops,
kg_* = KG-pipeline analogs on the events table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def t_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str, cols: list[str] | None = None
) -> DataFrame:
    """Scan-spread: the driver's test tables are single-file, single-row-group
    parquet, so a bare scan plans as ONE task and everything up to the first
    exchange (md5 folds, array HOFs, regex) runs on one core — the "one huge
    unsplittable input" skew of guide §2.5. When (and only when) the scan is
    narrower than the session parallelism, hash-repartition on ``key`` (a
    unique/high-cardinality column, so the spread is even and — unlike a
    round-robin repartition — pays no sort-before-repartition and stays
    deterministic under task retry). The shuffle moves only ``cols`` (a few
    MB here) once, and unlocks every core for the compute above it. At real
    scale a 100 TB table scans as thousands of splits and this is a no-op."""
    df = t(spark, sf_dir, name)
    if cols:
        df = df.select(*cols)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, key)
    return df


def _epoch(col):
    """Seconds-with-fraction epoch of a (NTZ) timestamp under the UTC
    session timezone — matches DuckDB's epoch() on naive timestamps."""
    return col.cast("timestamp").cast("double")


# ---------------------------------------------------------------------------
# Relational core (scan/filter/agg/join/sort/limit) — S1/P*/A5 analogs.
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1997-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4)                                AS sum_qty,
       round(sum(l_extendedprice), 4)                           AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4)        AS sum_disc_price,
       count(*)                                                 AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue_orders(spark, sf):
    """The query needs nothing from orders except WHICH orderkeys belong to
    BUILDING customers (o_orderkey and c_custkey are unique keys — verified
    on every sf — so the inner joins never fan out). Reducing them to a
    broadcast key set turns the old lineitem⇄orders sort-merge shuffle into
    a broadcast LEFT SEMI probe: the big side is never shuffled (guide
    §3.1/§3.2; at true 100 TB the same shape falls out of the runtime
    Bloom-filter join, with the keys table as the creation side)."""
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    keys = o.join(F.broadcast(c), o.o_custkey == F.col("c_custkey")).select("o_orderkey")
    li = t_spread(
        spark, sf, "lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    rev = (
        li.join(F.broadcast(keys), li.l_orderkey == keys.o_orderkey, "left_semi")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), "o_orderkey").limit(10)


Q3_SQL = """
SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# J1/J2 — broadcast dictionary lookups.
# ---------------------------------------------------------------------------


def j1_broadcast_lookup(spark, sf):
    # Examined in r6 and left alone: a spread-by-brand variant (parallel
    # Expand + aggs) measured SLOWER than the single-task probe (1.78 →
    # 1.96s on the 10× profile set) — the 4-column shuffle out of the
    # one-task scan costs more than the agg parallelism buys at 25 groups.
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part")
    s = t(spark, sf, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


J1_SQL = """
SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items, count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


def j2_multihop_dims(spark, sf):
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.sum("c_acctbal"), 4).alias("total_balance"))
    )


J2_SQL = """
SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 4) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# J4 — nearest-anchor (as-of by distance) join, reference genes.py:107-130.
# ---------------------------------------------------------------------------


def j4_nearest_event(spark, sf):
    o = t(spark, sf, "orders").filter(F.col("o_custkey") < 150)
    e = t(spark, sf, "events")
    j = o.join(e, o.o_custkey == e.user_id)
    d = F.abs(_epoch(F.col("ts")) - _epoch(F.col("o_orderdate")))
    return j.groupBy("o_orderkey").agg(
        F.min_by("event_id", F.struct(d.alias("d"), F.col("event_id"))).alias("event_id")
    )


J4_SQL = """
SELECT o_orderkey, event_id FROM (
  SELECT o_orderkey, event_id,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY abs(epoch(ts) - epoch(o_orderdate)), event_id) AS rn
  FROM orders JOIN events ON user_id = o_custkey
  WHERE o_custkey < 150
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# J5 — candidate-pair self-join (extractor/data.py:69-94 analog).
# ---------------------------------------------------------------------------


def j5_pair_selfjoin(spark, sf):
    """Per-order distinct part set → in-array pair generation. The old
    distinct + self-join + filter shape shuffled the 600k-row items table
    three times (distinct, both join sides) and built a corpus-sized hash
    relation; folding to sort_array(collect_set) per order makes the pair
    expansion a map-side HOF over each (small) order's set — one exchange
    on l_orderkey (shared with the scan-spread) plus the tiny pairs agg."""
    li = t_spread(spark, sf, "lineitem", "l_orderkey", ["l_orderkey", "l_partkey"])
    parts = li.groupBy("l_orderkey").agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    pairs = parts.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (x, i) ->"
                " transform(slice(ps, i + 2, size(ps)), y -> struct(x as part1, y as part2))))"
            )
        ).alias("pr")
    )
    return (
        pairs.select("pr.part1", "pr.part2")
        .groupBy("part1", "part2")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


J5_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part1, b.l_partkey AS part2, count(*) AS n_orders
FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# A1 — majority vote (chemicals.py:119-135 analog).
# ---------------------------------------------------------------------------


def a1_majority_vote(spark, sf):
    # hash(user_id) satisfies the clustering of BOTH groupBys below, so the
    # spread's exchange is the only one in the plan
    e = t_spread(spark, sf, "events", "user_id", ["user_id", "event_type"])
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    return counts.groupBy("user_id").agg(
        F.min_by("event_type", F.struct((-F.col("cnt")).alias("nc"), F.col("event_type"))).alias(
            "modal_event"
        )
    )


A1_SQL = """
SELECT user_id, event_type AS modal_event FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A2 — elementwise softmax-sum + argmax (extractor/__init__.py:85-108 analog).
# ---------------------------------------------------------------------------


def a2_softmax_argmax(spark, sf):
    # examined in r6: a scan-spread variant measured neutral at 10× scale
    # (0.571s either way, best-of-3) and +0.11s at sf0.1 — not taken
    em = t(spark, sf, "embeddings")
    # softmax per row. This DRIVER QUERY deliberately skips max-subtraction
    # (embedding values are small and the DuckDB oracle uses the identical
    # formula, so results are bit-equal); the PIPELINE kernel
    # kernels.softmax DOES subtract the max (numerically stable for model
    # logits) and its oracle shares that formula — two contexts, two
    # deliberate formulas, don't "unify" them.
    # exp(x) computed once per element: the transform materializes the exp
    # array and the denominator folds over IT with the same left-to-right
    # additions (s + exp(x_i) ≡ s + ex_i), so every p is bit-identical
    em = em.withColumn("ex", F.expr("transform(embedding, x -> exp(x))"))
    em = em.withColumn("den", F.expr("aggregate(ex, cast(0 as double), (s, x) -> s + x)"))
    ex = em.select(
        "label", F.posexplode("ex").alias("pos", "num"), "den"
    ).withColumn("p", F.col("num") / F.col("den"))
    sums = ex.groupBy("label", "pos").agg(F.sum("p").alias("s"))
    return sums.groupBy("label").agg(
        F.min_by("pos", F.struct((-F.col("s")).alias("ns"), F.col("pos"))).cast("long").alias("argmax_pos")
    )


A2_SQL = """
WITH idx AS (
  SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings),
ex AS (
  SELECT label, i - 1 AS pos,
         exp(embedding[i]) / list_sum(list_transform(embedding, x -> exp(x))) AS p
  FROM idx)
SELECT label, pos AS argmax_pos FROM (
  SELECT label, pos, row_number() OVER (PARTITION BY label ORDER BY sum(p) DESC, pos) AS rn
  FROM ex GROUP BY label, pos
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A3 — overlapping-interval merge (RangeDict, src/utils.py:79-100 analog).
# ---------------------------------------------------------------------------


def a3_interval_merge(spark, sf):
    e = t(spark, sf, "events").select(
        "user_id", F.col("value").alias("lo"), (F.col("value") + 10.0).alias("hi")
    )
    w = Window.partitionBy("user_id").orderBy("lo", "hi")
    run_max = F.max("hi").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grouped = e.withColumn(
        "new_group", F.when(run_max.isNull() | (F.col("lo") > run_max), 1).otherwise(0)
    ).withColumn("grp", F.sum("new_group").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    merged = grouped.groupBy("user_id", "grp").agg(
        F.min("lo").alias("mlo"), F.max("hi").alias("mhi")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.round(F.sum(F.col("mhi") - F.col("mlo")), 4).alias("covered"),
    )


A3_SQL = """
WITH iv AS (SELECT user_id, value AS lo, value + 10.0 AS hi FROM events),
flagged AS (
  SELECT user_id, lo, hi,
         CASE WHEN max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                   OR lo > max(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_group
  FROM iv),
grouped AS (
  SELECT user_id, lo, hi,
         sum(new_group) OVER (PARTITION BY user_id ORDER BY lo, hi
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged),
merged AS (
  SELECT user_id, grp, min(lo) AS mlo, max(hi) AS mhi FROM grouped GROUP BY user_id, grp)
SELECT user_id, count(*) AS n_intervals, round(sum(mhi - mlo), 4) AS covered
FROM merged GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# P2/W7 — filter + re-number (cleaner.py:5-30 analog).
# ---------------------------------------------------------------------------


def p2_filter_renumber(spark, sf):
    e = t(spark, sf, "events").filter(F.col("value") > 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", (F.row_number().over(w) - 1).cast("long").alias("new_id")
    )


P2_SQL = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS new_id
FROM events WHERE value > 50
"""


# ---------------------------------------------------------------------------
# W1 — ordered reassembly (tagger/__init__.py:17-44 analog).
# ---------------------------------------------------------------------------


def w1_ordered_reassembly(spark, sf):
    li = t_spread(
        spark, sf, "lineitem", "l_orderkey", ["l_orderkey", "l_linenumber", "l_returnflag"]
    )
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.expr(
                    # sort by (linenumber, flag): linenumbers may repeat, so
                    # the flag itself is the deterministic tie-break
                    "transform(array_sort(collect_list(struct(l_linenumber, l_returnflag))), x -> x.l_returnflag)"
                ),
                "",
            ).alias("flags"),
            F.count("*").alias("n_lines"),
        )
    )


W1_SQL = """
SELECT l_orderkey,
       string_agg(l_returnflag, '' ORDER BY l_linenumber, l_returnflag) AS flags,
       count(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def w8_topk_per_group(spark, sf):
    p = t(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        p.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "rnk")
    )


W8_SQL = """
SELECT p_brand, p_partkey, rnk FROM (
  SELECT p_brand, p_partkey,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part
) WHERE rnk <= 3
"""


# ---------------------------------------------------------------------------
# U2 — semi/anti set ops (metrics.py:89-91 analog).
# ---------------------------------------------------------------------------


def u2_semi_anti(spark, sf):
    # "severe error" (value > 150) rather than any error: every synthetic user
    # has at least one plain error event, which made the anti-join annihilate
    # the result and the 0-row oracle match vacuous. The severe subset keeps
    # roughly half the customers at sf0.01, so the hash certifies both sides.
    c = t(spark, sf, "customer").filter(F.col("c_custkey") < 150)
    o = t(spark, sf, "orders")
    err = t(spark, sf, "events").filter(
        (F.col("event_type") == "error") & (F.col("value") > 150)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(err, c.c_custkey == err.user_id, "left_anti")
        .select("c_custkey")
    )


U2_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey < 150
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (SELECT 1 FROM events
                  WHERE user_id = c_custkey AND event_type = 'error' AND value > 150)
"""


# ---------------------------------------------------------------------------
# F* — scalar function chains (§2.7).
# ---------------------------------------------------------------------------


def f_scalar_chain(spark, sf):
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace(F.lower("p_name"), r"[aeiou]", "_").alias("devoweled"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.md5(F.col("p_name")).alias("name_md5"),
    )


F_SCALAR_SQL = """
SELECT p_partkey, lower(p_name) AS name_lower,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       length(p_name) AS name_len,
       regexp_replace(lower(p_name), '[aeiou]', '_', 'g') AS devoweled,
       concat_ws('|', p_brand, p_type) AS brand_type,
       md5(p_name) AS name_md5
FROM part
"""


# ---------------------------------------------------------------------------
# Sessionization (batch form of the streaming session-window op).
# ---------------------------------------------------------------------------


def sessionize(spark, sf):
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _epoch(F.col("ts")) - F.lag(_epoch(F.col("ts"))).over(w)
    flagged = e.withColumn("new_s", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = flagged.withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    per_sess = sess.groupBy("user_id", "sid").agg(F.count("*").alias("n"))
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("n").alias("max_session_events")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                   OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged),
per_sess AS (SELECT user_id, sid, count(*) AS n FROM sess GROUP BY user_id, sid)
SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events
FROM per_sess GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Registry.
# ---------------------------------------------------------------------------

RELATIONAL: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_revenue_orders": (q3_top_revenue_orders, Q3_SQL),
    "j1_broadcast_lookup": (j1_broadcast_lookup, J1_SQL),
    "j2_multihop_dims": (j2_multihop_dims, J2_SQL),
    "j4_nearest_event": (j4_nearest_event, J4_SQL),
    "j5_pair_selfjoin": (j5_pair_selfjoin, J5_SQL),
    "a1_majority_vote": (a1_majority_vote, A1_SQL),
    "a2_softmax_argmax": (a2_softmax_argmax, A2_SQL),
    "a3_interval_merge": (a3_interval_merge, A3_SQL),
    "p2_filter_renumber": (p2_filter_renumber, P2_SQL),
    "w1_ordered_reassembly": (w1_ordered_reassembly, W1_SQL),
    "w8_topk_per_group": (w8_topk_per_group, W8_SQL),
    "u2_semi_anti": (u2_semi_anti, U2_SQL),
    "f_scalar_chain": (f_scalar_chain, F_SCALAR_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
}

# ---------------------------------------------------------------------------
# W2/W3 — window/chunk plan arithmetic (src/data.py:169-258,
# extractor/data.py:342-396): the windowing math as relational columns.
# ---------------------------------------------------------------------------


def w2_window_plan(spark, sf):
    d = t(spark, sf, "documents")
    center, ctx, chunk = 384, 64, 512
    toks = F.size(F.split("text", r"\s+")).cast("long")
    n_windows = F.ceil(F.greatest(toks, F.lit(1)).cast("double") / center).cast("long")
    # right-aligned last chunk start (reference extractor/data.py:359)
    last_chunk_start = F.greatest(F.lit(0).cast("long"), toks - chunk)
    return d.select(
        "doc_id",
        toks.alias("n_tokens"),
        n_windows.alias("n_windows"),
        (n_windows * center).alias("center_capacity"),
        last_chunk_start.alias("last_chunk_start"),
        F.least(toks, F.lit(chunk).cast("long")).alias("last_chunk_len"),
    )


W2_SQL = """
SELECT doc_id,
       len(string_split_regex(text, '\\s+')) AS n_tokens,
       CAST(ceil(greatest(len(string_split_regex(text, '\\s+')), 1) / 384.0) AS BIGINT) AS n_windows,
       CAST(ceil(greatest(len(string_split_regex(text, '\\s+')), 1) / 384.0) AS BIGINT) * 384 AS center_capacity,
       greatest(0, len(string_split_regex(text, '\\s+')) - 512) AS last_chunk_start,
       least(len(string_split_regex(text, '\\s+')), 512) AS last_chunk_len
FROM documents
"""


# ---------------------------------------------------------------------------
# J7 — composite-id cross-product explode (extractor/__init__.py:88-94).
# ---------------------------------------------------------------------------


def j7_composite_explode(spark, sf):
    p = t(spark, sf, "part").filter(F.col("p_partkey") < 200)
    e1 = p.select("p_partkey", F.explode(F.split("p_type", " ")).alias("w1"))
    return e1.select(
        "p_partkey", "w1", F.explode(F.split(F.col("p_partkey").cast("string"), "")).alias("digit")
    ).groupBy("w1", "digit").agg(F.count("*").alias("n"))


J7_SQL = """
WITH e1 AS (
  SELECT p_partkey, unnest(string_split(p_type, ' ')) AS w1
  FROM part WHERE p_partkey < 200),
e2 AS (
  SELECT p_partkey, w1, unnest(string_split(CAST(p_partkey AS VARCHAR), '')) AS digit
  FROM e1)
SELECT w1, digit, count(*) AS n FROM e2 GROUP BY w1, digit
"""


# ---------------------------------------------------------------------------
# U1/U3 — union + dedup (taxonomy.py:48-50, seq_variant.py:324-346).
# ---------------------------------------------------------------------------


def u1_union_distinct(spark, sf):
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct().groupBy().agg(F.count("*").alias("n_nations_present"))


U1_SQL = """
SELECT count(*) AS n_nations_present FROM (
  SELECT DISTINCT nationkey FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL SELECT s_nationkey FROM supplier))
"""


# ---------------------------------------------------------------------------
# F12 — offset→segment mapping via cumulative sums (tagger writeback,
# tagger/__init__.py:113-120; ours: span→turn via running offsets).
# ---------------------------------------------------------------------------


def f12_cumulative_segment(spark, sf):
    li = t(spark, sf, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    cum = F.round(F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4)
    tot = F.round(F.sum("l_quantity").over(Window.partitionBy("l_orderkey")), 4)
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", cum.alias("cum_qty"), tot.alias("tot"))
        .filter(F.col("cum_qty") * 2 >= F.col("tot"))
        .groupBy("l_orderkey")
        .agg(F.min_by("l_linenumber", F.struct("l_linenumber", "l_partkey")).alias("median_line"))
    )


F12_SQL = """
WITH cum AS (
  SELECT l_orderkey, l_linenumber, l_partkey,
         round(sum(l_quantity) OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_qty,
         round(sum(l_quantity) OVER (PARTITION BY l_orderkey), 4) AS tot
  FROM lineitem)
SELECT l_orderkey, l_linenumber AS median_line FROM (
  SELECT l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS rn
  FROM cum WHERE cum_qty * 2 >= tot)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A6 — eval-metric counts (tagger/metrics.py:89-91): TP/FP/FN between a
# "predicted" and a "gold" set derived from events.
# ---------------------------------------------------------------------------


def a6_eval_counts(spark, sf):
    e = t(spark, sf, "events")
    pred = e.filter(F.col("value") > 60).select("user_id", "event_id")
    gold = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id")
    tp = pred.join(gold, ["user_id", "event_id"]).count()
    n_pred, n_gold = pred.count(), gold.count()
    return spark.createDataFrame(
        [(tp, n_pred - tp, n_gold - tp)], "tp long, fp long, fn long"
    )


A6_SQL = """
WITH pred AS (SELECT user_id, event_id FROM events WHERE value > 60),
gold AS (SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
tp AS (SELECT count(*) AS c FROM pred JOIN gold USING (user_id, event_id))
SELECT tp.c AS tp,
       (SELECT count(*) FROM pred) - tp.c AS fp,
       (SELECT count(*) FROM gold) - tp.c AS fn
FROM tp
"""


RELATIONAL.update(
    {
        "w2_window_plan": (w2_window_plan, W2_SQL),
        "j7_composite_explode": (j7_composite_explode, J7_SQL),
        "u1_union_distinct": (u1_union_distinct, U1_SQL),
        "f12_cumulative_segment": (f12_cumulative_segment, F12_SQL),
        "a6_eval_counts": (a6_eval_counts, A6_SQL),
    }
)
