"""Scalar function library surface (SURVEY.md §2.6 — [absent] in the
reference beyond the cleaning-chain string ops in
``/root/reference/filters.py:19-64``).

All of these are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python round-trips in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table


@query(
    "fn_string_suite",
    """
    SELECT c_custkey,
           upper(c_name)                       AS name_upper,
           length(c_name)                      AS name_len,
           substr(c_name, 1, 8)                AS name_prefix,
           concat(c_mktsegment, '#', c_name)   AS seg_name,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           levenshtein(c_mktsegment, 'MACHINERY') AS seg_dist,
           split_part(c_name, '#', 2)          AS name_num
    FROM customer
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("long").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("seg_name"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("MACHINERY")).cast("long").alias("seg_dist"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


@query(
    "fn_regexp_suite",
    """
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)      AS first_word,
           regexp_matches(text, 'join .* hash')     AS has_join_hash,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len
    FROM documents
    """,
)
def fn_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_* family (the backbone of the wiki cleaning chain, F3-F6)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("join .* hash").alias("has_join_hash"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias("novowel_len"),
    )


@query(
    "fn_date_suite",
    """
    SELECT event_id,
           extract(year FROM ts)::INT        AS ev_year,
           extract(month FROM ts)::INT       AS ev_month,
           extract(day FROM ts)::INT         AS ev_day,
           extract(hour FROM ts)::INT        AS ev_hour,
           date_trunc('day', ts)             AS ev_date,
           date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts)::INT AS days_since_epoch_start
    FROM events
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("ev_year"),
        F.month("ts").alias("ev_month"),
        F.dayofmonth("ts").alias("ev_day"),
        F.hour("ts").alias("ev_hour"),
        F.date_trunc("day", F.col("ts")).alias("ev_date"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@query(
    "fn_math_suite",
    """
    SELECT o_orderkey,
           round(abs(o_totalprice - 250000), 2)  AS dist_from_mid,
           ceil(o_totalprice / 100000)::BIGINT   AS price_bucket,
           floor(sqrt(o_totalprice))::BIGINT     AS sqrt_floor,
           round(ln(o_totalprice), 6)            AS log_price,
           o_orderkey % 7                        AS key_mod
    FROM orders
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(F.abs(F.col("o_totalprice") - 250000), 2).alias("dist_from_mid"),
        F.ceil(F.col("o_totalprice") / 100000).cast("long").alias("price_bucket"),
        F.floor(F.sqrt("o_totalprice")).cast("long").alias("sqrt_floor"),
        F.round(F.log("o_totalprice"), 6).alias("log_price"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
    )


@query(
    "fn_conditional_suite",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 400000 THEN 'high'
                WHEN o_totalprice >= 150000 THEN 'mid'
                ELSE 'low' END                       AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           (o_orderpriority = '1-URGENT')            AS is_urgent
    FROM orders
    """,
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 400000, "high")
        .when(F.col("o_totalprice") >= 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    )


@query(
    "fn_array_suite",
    """
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0        AS first_component,
           round(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                             (a, b) -> a + b), 4)           AS sq_norm,
           len(list_filter(embedding, x -> x > 0))          AS n_positive
    FROM embeddings
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) — executed
    JVM-side; this is the no-UDF path for vector math. Accumulation is forced
    to double on both engines (float32 fold would drift)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + 0.0).alias("first_component"),
        F.round(
            F.aggregate(
                F.transform(emb_d, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "fn_explode_posexplode",
    """
    SELECT vec_id, pos, round(component, 4) + 0 AS component
    FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1)::BIGINT - 1 AS pos,
               CAST(unnest(embedding) AS DOUBLE)             AS component
        FROM embeddings
        WHERE vec_id < 10
    )
    """,
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF shape (reference U3 [absent]): lateral explode with position."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 10)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "raw_component")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        (F.round(F.col("raw_component").cast("double"), 4) + 0.0).alias("component"),
    )


@query(
    "fn_json_suite",
    """
    SELECT event_type,
           round(avg(json_extract_string(props, '$.k')::INT), 4) AS avg_k,
           max(json_extract_string(props, '$.k')::INT)           AS max_k,
           count(*)                                               AS n
    FROM events
    GROUP BY event_type
    """,
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props) via get_json_object."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "fn_from_json_struct",
    """
    SELECT event_id, json_extract_string(props, '$.k')::INT AS k
    FROM events WHERE json_extract_string(props, '$.k')::INT > 90
    """,
)
def fn_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parse (from_json -> struct) rather than path probes —
    at scale, parse once into a struct column instead of N get_json_object
    passes over the same string."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("pj", F.from_json("props", "k INT"))
    return parsed.select("event_id", F.col("pj.k").alias("k")).where(F.col("k") > 90)


@query(
    "fn_map_suite",
    """
    SELECT event_id,
           to_json(map_keys(m))::VARCHAR AS props_keys,
           m['k'][1]::INT              AS k_value,
           cardinality(m)::INT         AS n_props
    FROM (SELECT event_id, MAP(['k'], [json_extract_string(props, '$.k')]) AS m
          FROM events) t
    """,
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: parse JSON into MAP<string,string>, then map_keys /
    element_at / size — the dynamic-schema path when JSON keys vary by row
    (fixed keys should use from_json into a struct instead). The key list is
    emitted as a JSON string so every output column is a sortable scalar."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.to_json(F.map_keys(m)).alias("props_keys"),
        F.element_at(m, "k").cast("int").alias("k_value"),
        F.size(m).alias("n_props"),
    )


@query(
    "fn_array_utils",
    """
    SELECT vec_id,
           array_to_string(list_transform(
               list_sort(list_transform(embedding[1:5]::DOUBLE[], x -> round(x, 3) + 0)),
               x -> printf('%.3f', x)), ',')   AS sorted_head,
           array_to_string(list_transform(
               list_reverse_sort(list_transform(embedding[1:3]::DOUBLE[], x -> round(x, 3) + 0)),
               x -> printf('%.3f', x)), ',')   AS top3_desc,
           to_json(range(0, len(embedding), 16))::VARCHAR AS stride_idx,
           list_contains(list_transform(embedding, x -> x > 0.1), true) AS has_big
    FROM embeddings WHERE vec_id < 50
    """,
)
def fn_array_utils(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array utilities: slice, sort asc/desc, sequence generation, any().

    Array results are emitted as delimited/JSON strings (numeric sort first,
    then fixed %.3f formatting) so every output column is a sortable scalar
    for the driver's canonicalizer; element order is still asserted because
    the string preserves it."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    # + 0.0 normalizes round()'s zero sign — the engines disagree on
    # whether round(-0.0004, 3) is -0.0, and %.3f renders the sign
    head = F.transform(
        F.slice(F.col("embedding").cast("array<double>"), 1, 5),
        lambda x: F.round(x, 3) + F.lit(0.0),
    )
    top3 = F.transform(
        F.slice(F.col("embedding").cast("array<double>"), 1, 3),
        lambda x: F.round(x, 3) + F.lit(0.0),
    )
    fmt3 = lambda arr: F.array_join(  # noqa: E731
        F.transform(arr, lambda x: F.format_string("%.3f", x)), ","
    )
    return e.select(
        "vec_id",
        fmt3(F.array_sort(head)).alias("sorted_head"),
        fmt3(F.sort_array(top3, asc=False)).alias("top3_desc"),
        F.to_json(
            F.sequence(
                F.lit(0).cast("long"), F.size("embedding") - 1, F.lit(16).cast("long")
            )
        ).alias("stride_idx"),
        F.exists(F.col("embedding"), lambda x: x > 0.1).alias("has_big"),
    )


@query(
    "fn_datetime_format",
    """
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M')            AS ts_minute,
           strptime(strftime(ts, '%Y-%m-%d'), '%Y-%m-%d') AS day_roundtrip,
           (ts + INTERVAL 90 MINUTE)                 AS ts_plus_90m,
           greatest(ts, TIMESTAMP '2024-01-15 00:00:00') AS ts_floor_jan15
    FROM events WHERE event_id < 500
    """,
)
def fn_datetime_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime formatting/parsing round-trip + interval arithmetic."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("ts_minute"),
        F.to_timestamp(F.date_format("ts", "yyyy-MM-dd"), "yyyy-MM-dd").alias(
            "day_roundtrip"
        ),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTE")).alias("ts_plus_90m"),
        F.greatest("ts", F.lit("2024-01-15 00:00:00").cast("timestamp")).alias(
            "ts_floor_jan15"
        ),
    )


@query(
    "ts_resample_gapfill",
    """
    WITH buckets AS (
        SELECT user_id, bucket, obs FROM (
            SELECT user_id, date_trunc('hour', ts) AS bucket, value AS obs,
                   row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE user_id < 20
        ) WHERE rn = 1
    ),
    spans AS (
        SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM buckets
        GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM spans
    )
    SELECT g.user_id, g.bucket,
           round(last_value(b.obs IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) + 0
               AS value,
           (b.obs IS NULL) AS filled
    FROM grid g LEFT JOIN buckets b
      ON g.user_id = b.user_id AND g.bucket = b.bucket
    """,
)
def ts_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to an hourly grid + last-observation-carried-
    forward gap fill: per-bucket latest observation (max_by with a (ts,
    event_id) total order), a sequence()-exploded dense grid per user, and
    LOCF via last(ignorenulls) over a running frame. The grid explode and
    the window both partition by user — one shuffle, no driver loops."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    buckets = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("obs"))
    grid = (
        buckets.groupBy("user_id")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bucket"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(buckets, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            (F.round(F.last("obs", ignorenulls=True).over(w), 2) + 0.0).alias("value"),
            F.col("obs").isNull().alias("filled"),
        )
    )


@query(
    "fn_bitwise_suite",
    """
    SELECT o_orderpriority,
           bit_and(o_orderkey & 255)::BIGINT AS band,
           bit_or(o_orderkey & 255)::BIGINT AS bor,
           bit_xor(o_orderkey & 255)::BIGINT AS bxor,
           sum(bit_count(o_orderkey))::BIGINT AS popcount_sum,
           sum((o_orderkey << 2) % 1000)::BIGINT AS shl_sum,
           sum(o_orderkey >> 3)::BIGINT AS shr_sum,
           sum(xor(o_orderkey, o_custkey) % 997)::BIGINT AS xor_mod_sum
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def fn_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface (the primitives behind the bloom
    filter and z-order operators, exposed as a first-class suite): AND/OR/
    XOR aggregates, popcount, shifts, scalar xor — all whole-stage-codegen
    expressions with DuckDB twins."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bit_and(k.bitwiseAND(F.lit(255))).alias("band"),
            F.bit_or(k.bitwiseAND(F.lit(255))).alias("bor"),
            F.bit_xor(k.bitwiseAND(F.lit(255))).alias("bxor"),
            F.sum(F.bit_count(k)).cast("long").alias("popcount_sum"),
            F.sum(F.shiftleft(k, 2) % 1000).cast("long").alias("shl_sum"),
            F.sum(F.shiftright(k, 3)).cast("long").alias("shr_sum"),
            F.sum(k.bitwiseXOR(F.col("o_custkey")) % 997)
            .cast("long")
            .alias("xor_mod_sum"),
        )
    )
