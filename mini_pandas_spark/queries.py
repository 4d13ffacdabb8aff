"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle that produces the identical result set.

Determinism contract (driver compares by order-insensitive value hash):
- every computed column is aliased identically on both sides;
- money/double aggregates run through DECIMAL(18,2) (exact, order-free)
  and cast back to double — see functions.money_sum;
- top-k / rank orderings always carry a unique-key tiebreak;
- timestamps are output as formatted strings (naive, tz-free on both
  engines) or not at all.

Queries whose algorithm is not expressible in ANSI SQL (MinHash-LSH,
SimHash, LSH-ANN, streaming) carry no oracle — the driver records the
weaker rows-only check for those (``__spark_entry__.py`` contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    dedup,
    events,
    layout,
    relational,
    similarity,
    sketches,
    text,
    tpch,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (query_fn, oracle_sql | None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle for name, (_, oracle) in REGISTRY.items() if oracle is not None
    }


_MONEY_SUM = "CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"

register(
    "flagship_filter",
    relational.flagship_filter,
    """
    SELECT p_partkey, p_name
    FROM part
    WHERE p_retailprice + 5.0 > 10.0 AND p_size > 3
    """,
)

register(
    "q1_pricing_summary",
    relational.q1_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)

register(
    "groupby_distinct",
    relational.groupby_distinct,
    """
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)

register(
    "topk_orders",
    relational.topk_orders,
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)

register(
    "join_broadcast_dims",
    relational.join_broadcast_dims,
    f"""
    SELECT r_name,
           {_MONEY_SUM.format(col='o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)

register(
    "left_join_rollup",
    relational.left_join_rollup,
    f"""
    SELECT c_custkey, c_mktsegment,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(total_spent, 0.0) AS total_spent
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS n_orders,
               {_MONEY_SUM.format(col='o_totalprice')} AS total_spent
        FROM orders GROUP BY o_custkey
    ) t ON c_custkey = t.o_custkey
    """,
)

register(
    "semi_join_customers",
    relational.semi_join_customers,
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)

register(
    "anti_join_customers",
    relational.anti_join_customers,
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)

register(
    "set_ops_nations",
    relational.set_ops_nations,
    """
    SELECT nationkey, 'both' AS tag FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'neither' AS tag FROM (
        SELECT n_nationkey AS nationkey FROM nation
        EXCEPT
        (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
    )
    """,
)

register(
    "window_rank_orders",
    relational.window_rank_orders,
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)

register(
    "window_running_sum",
    relational.window_running_sum,
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spent,
           LAG(o_totalprice, 1) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS prev_price
    FROM orders
    """,
)

register(
    "distinct_status",
    relational.distinct_status,
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)

register(
    "rollup_lineitem",
    relational.rollup_lineitem,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)

register(
    "range_join_price_band",
    relational.range_join_price_band,
    """
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM part
    JOIN (VALUES (0.0, 930.0, 'low'), (930.0, 970.0, 'mid'), (970.0, 1e9, 'high'))
         AS b(lo, hi, band)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)

# -- text analysis (documents) ---------------------------------------------

_TOKENS = r"regexp_split_to_array(trim(text), '\s+')"

register(
    "token_count_docs",
    text.token_count_docs,
    f"SELECT doc_id, len({_TOKENS}) AS n_tokens FROM documents",
)

_QUALITY_SQL = f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           len({_TOKENS}) AS n_tokens,
           round(CAST(length(text) AS DOUBLE) / len({_TOKENS}), 4) AS chars_per_token,
           len({_TOKENS}) < 40 AS is_short
    FROM documents
"""

register("text_quality", text.text_quality, _QUALITY_SQL)
# same oracle on purpose: pins the Arrow pandas-UDF path to identical results
register("text_quality_pandas_udf", text.text_quality_pandas_udf, _QUALITY_SQL)

register(
    "lang_id_heuristic",
    text.lang_id_heuristic,
    f"""
    WITH t AS (
        SELECT doc_id, lang,
               len(list_filter({_TOKENS}, x -> x IN ('the','a','of','and','to','in'))) AS en_hits,
               len(list_filter({_TOKENS}, x -> x IN ('el','la','de','y','en','que'))) AS es_hits,
               len(list_filter({_TOKENS}, x -> x IN ('le','la','de','et','un','une'))) AS fr_hits
        FROM documents
    )
    SELECT doc_id, lang, en_hits, es_hits, fr_hits,
           CASE WHEN en_hits > es_hits AND en_hits > fr_hits THEN 'en'
                WHEN es_hits > en_hits AND es_hits > fr_hits THEN 'es'
                WHEN fr_hits > en_hits AND fr_hits > es_hits THEN 'fr'
                ELSE 'und' END AS pred_lang,
           (CASE WHEN en_hits > es_hits AND en_hits > fr_hits THEN 'en'
                 WHEN es_hits > en_hits AND es_hits > fr_hits THEN 'es'
                 WHEN fr_hits > en_hits AND fr_hits > es_hits THEN 'fr'
                 ELSE 'und' END) = lang AS agrees
    FROM t
    """,
)

register(
    "doc_fingerprint",
    text.doc_fingerprint,
    """
    SELECT doc_id, md5(text) AS fingerprint,
           substr(md5(text), 1, 16) AS bucket_key
    FROM documents
    """,
)

# -- event-time operators (events) -----------------------------------------

register(
    "events_hourly",
    events.events_hourly,
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)

register(
    "events_sliding",
    events.events_sliding,
    """
    WITH starts AS (
        SELECT event_type,
               date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                        ELSE INTERVAL 0 MINUTE END AS w0
        FROM events
    ), expanded AS (
        SELECT event_type, w0 AS ws FROM starts
        UNION ALL
        SELECT event_type, w0 - INTERVAL 30 MINUTE FROM starts
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n_events
    FROM expanded GROUP BY 1, 2
    """,
)

register(
    "events_json_extract",
    events.events_json_extract,
    """
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)

register(
    "q4_order_priority",
    relational.q4_order_priority,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)

register(
    "q10_returned_items",
    relational.q10_returned_items,
    """
    SELECT c_custkey, c_name, c_acctbal, n_name,
           CAST(SUM(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT))
                AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# VARIANT-type path (parse_json + variant_get) must equal the
# string-path JSON aggregates — same oracle by construction.
register(
    "events_variant_extract",
    events.events_variant_extract,
    REGISTRY["events_json_extract"][1],
)

register(
    "sessionize_users",
    events.sessionize_users,
    """
    WITH lagged AS (
        SELECT user_id, event_id, ts,
               LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), flagged AS (
        SELECT user_id, event_id,
               CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new,
               ts
        FROM lagged
    ), sessions AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)

# -- deduplication (documents) ---------------------------------------------

register(
    "dedup_exact",
    dedup.dedup_exact,
    """
    SELECT md5(text) AS content_key,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)

register(
    "dedup_keep_first",
    dedup.dedup_keep_first,
    """
    SELECT doc_id, lang, source, n_chars FROM (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)

_SHINGLES_CTE = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
        FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
"""

register(
    "ngram_jaccard_pairs",
    dedup.ngram_jaccard_pairs,
    _SHINGLES_CTE
    + """
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    """,
)

register(
    "prefix_filter_jaccard_pairs",
    dedup.prefix_filter_jaccard_pairs,
    # Exact algorithm (prefix filtering is lossless for J >= t), so the
    # oracle is the same as the exact baseline's.
    _SHINGLES_CTE
    + """
    SELECT doc_a, doc_b,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    """,
)

# sketch-based dedup: xxhash64 permutations are not expressible in DuckDB —
# rows-only checks; pytest pins minhash_lsh_pairs == ngram_jaccard_pairs.
register("minhash_lsh_pairs", dedup.minhash_lsh_pairs, None)
register("simhash_docs", dedup.simhash_docs, None)
register("simhash_near_pairs", dedup.simhash_near_pairs, None)

# -- similarity search (embeddings) ----------------------------------------

_VEC_CTE = """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve, label FROM embeddings
    )
"""

register(
    "cosine_topk",
    similarity.cosine_topk,
    _VEC_CTE
    + """
    , q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < 10),
    scored AS (
        SELECT query_id, vec_id AS neighbor_id,
               round(list_dot_product(qv, ve)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ve, ve))),
                     6) AS sim
        FROM v CROSS JOIN q
        WHERE vec_id != query_id
    )
    SELECT query_id, neighbor_id, sim, rk FROM (
        SELECT query_id, neighbor_id, sim,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    ) WHERE rk <= 5
    """,
)

register(
    "embedding_norm_stats",
    similarity.embedding_norm_stats,
    _VEC_CTE
    + """
    SELECT label, COUNT(*) AS n_vectors,
           round(MIN(round(list_dot_product(ve, ve), 6)), 6) AS min_sq_norm,
           round(MAX(round(list_dot_product(ve, ve), 6)), 6) AS max_sq_norm
    FROM v GROUP BY label
    """,
)

register("lsh_ann_topk", similarity.lsh_ann_topk, None)
# rows-only: eigendecomposition is not SQL-expressible; pytest pins
# orthonormal basis, monotone variance, diagonal projected covariance,
# and partitioning invariance (tests/test_pipeline_operators.py)
register("pca_project_embeddings", similarity.pca_project_embeddings, None)

# -- streaming + multimodal -------------------------------------------------

from .multimodal import binary as _binary  # noqa: E402
from .sources import synthetic as _synthetic  # noqa: E402
from .streaming import windows as _stream_windows  # noqa: E402

# Streaming windowed agg drained with AvailableNow equals the batch result
# over static input — so it shares the batch query's ANSI oracle (a
# deliberately strong gate for a streaming operator).
register(
    "streaming_hourly_counts",
    _stream_windows.streaming_hourly_counts,
    REGISTRY["events_hourly"][1],
)

# session_window (native streaming primitive, exercised in batch) shares
# the islands-technique oracle of sessionize_users.
register(
    "session_window_agg",
    _stream_windows.session_window_agg,
    REGISTRY["sessionize_users"][1],
)

register(
    "multimodal_meta",
    _binary.multimodal_meta,
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(64 + doc_id % 512 AS INTEGER) AS width,
           CAST(64 + (doc_id * 7) % 512 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           'fake/rgb8' AS format
    FROM documents
    """,
)

# per-chunk checksums need byte-level access — not SQL-expressible
register("extract_patch_features", _binary.extract_patch_features, None)

# the oracle recomputes the aspect-fit arithmetic AND the resized payload
# byte count that the UDF actually produced (octet_length cross-check)
register(
    "multimodal_resize",
    _binary.resize_image_stub,
    """
    SELECT doc_id, CAST(ow AS INTEGER) AS out_width,
           CAST(oh AS INTEGER) AS out_height,
           CAST(ow * oh * 3 AS INTEGER) AS out_n_bytes
    FROM (
      SELECT doc_id,
             GREATEST((w * 16) // GREATEST(w, h), 1) AS ow,
             GREATEST((h * 16) // GREATEST(w, h), 1) AS oh
      FROM (SELECT doc_id, 64 + doc_id % 512 AS w,
                   64 + (doc_id * 7) % 512 AS h
            FROM documents)
    )
    """,
)

# the oracle rebuilds the UDTF's 32/24 token windows with list slices
register(
    "chunk_tokens_udtf",
    text.chunk_tokens_udtf,
    r"""
    SELECT doc_id, CAST(idx AS INTEGER) AS chunk_idx,
           CAST(LEAST(32, n - idx * 24) AS INTEGER) AS n_chunk_tokens,
           array_to_string(toks[(idx * 24 + 1):(idx * 24 + 32)], ' ')
               AS chunk_text
    FROM (
      SELECT doc_id, toks, len(toks) AS n,
             UNNEST(generate_series(0, (len(toks) + 23) // 24 - 1)) AS idx
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
            FROM documents)
    )
    """,
)

# frame_bytes is measured from the actual byte slice in the UDF; the
# oracle recomputes it arithmetically from octet_length
register(
    "audio_frame_sample",
    _binary.audio_frame_sample,
    """
    SELECT doc_id, CAST(idx AS INTEGER) AS frame_idx,
           CAST(idx * 160 AS INTEGER) AS start_byte,
           CAST(LEAST(400, len - idx * 160) AS INTEGER) AS frame_bytes
    FROM (
      SELECT doc_id, len,
             UNNEST(generate_series(0, (len + 159) // 160 - 1)) AS idx
      FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
    )
    """,
)

register(
    "video_frame_sample",
    _binary.video_frame_sample,
    """
    SELECT doc_id, CAST(idx AS INTEGER) AS frame_idx,
           CAST(idx * 40 AS INTEGER) AS ts_ms,
           CAST(LEAST(64, len - idx * 64) AS INTEGER) AS frame_bytes
    FROM (
      SELECT doc_id, len,
             UNNEST(generate_series(0, (len + 63) // 64 - 1, 5)) AS idx
      FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents)
    )
    """,
)

# -- extended relational surface -------------------------------------------

register(
    "cube_orders",
    relational.cube_orders,
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {_MONEY_SUM.format(col='o_totalprice')} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)

register(
    "pivot_segment_region",
    relational.pivot_segment_region,
    """
    SELECT c_nationkey,
           COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
           COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS building,
           COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE')  AS furniture,
           COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')  AS household,
           COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS machinery
    FROM customer GROUP BY c_nationkey
    """,
)

register(
    "stats_lineitem",
    relational.stats_lineitem,
    """
    SELECT l_returnflag, COUNT(*) AS n,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
           round(covar_samp(l_discount, l_tax), 6) + 0.0 AS covar_disc_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)

register(
    "string_funcs_part",
    relational.string_funcs_part,
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(length(p_name) AS BIGINT) AS name_len
    FROM part
    """,
)

register(
    "date_funcs_orders",
    relational.date_funcs_orders,
    f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           COUNT(*) AS n_orders,
           {_MONEY_SUM.format(col='o_totalprice')} AS revenue
    FROM orders GROUP BY 1, 2, 3
    """,
)

# HLL estimates are engine-specific — rows-only
register("approx_distinct_parts", relational.approx_distinct_parts, None)

register(
    "asof_join_purchase",
    events.asof_join_purchase,
    """
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS error_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    """,
)

register(
    "zscore_events_grouped_map",
    events.zscore_events_grouped_map,
    """
    SELECT event_id, user_id,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)

register(
    "above_avg_orders",
    events.above_avg_orders,
    """
    WITH a AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price
        FROM orders
    )
    SELECT o_orderkey, o_totalprice, round(avg_price, 4) AS avg_price
    FROM orders, a WHERE o_totalprice > avg_price
    """,
)

register(
    "union_schema_evolution",
    relational.union_schema_evolution,
    """
    SELECT c_custkey, c_name AS name, 'v1' AS schema_ver,
           CAST(NULL AS VARCHAR) AS segment
    FROM customer
    UNION ALL
    SELECT c_custkey, c_name, 'v2', c_mktsegment FROM customer
    """,
)

register(
    "streaming_user_totals",
    _stream_windows.streaming_user_totals,
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value
    FROM events GROUP BY user_id
    """,
)

register(
    "right_join_orders",
    relational.right_join_orders,
    """
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

register(
    "full_outer_join_keys",
    relational.full_outer_join_keys,
    """
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
          FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY 1) s
    USING (nationkey)
    """,
)

register(
    "window_funcs_variety",
    relational.window_funcs_variety,
    """
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           LEAD(o_totalprice, 1) OVER w AS next_price,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)

# Exact all-pairs baseline (oracle-gated); the registered scale path is
# the IVF-blocked variant below, pinned equal to this at sf0.001/sf0.01
# by pytest (tests/test_pipeline_operators.py) — the minhash/ngram pairing.
register(
    "embedding_near_dup_exact",
    similarity.embedding_near_dup_exact,
    _VEC_CTE
    + """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.ve, b.ve)
                 / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))),
                 6) AS sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.ve, b.ve)
                / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))),
                6) >= 0.4
    """,
)

# IVF-blocked near-dup pairs: quantizer cells are not SQL-expressible →
# rows-only; pytest pins pair-set equality with embedding_near_dup_exact.
register("embedding_near_dup_pairs", similarity.embedding_near_dup_pairs, None)

register(
    "q3_shipping_priority",
    relational.q3_shipping_priority,
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)

register(
    "q6_forecast_revenue",
    relational.q6_forecast_revenue,
    """
    SELECT CAST(SUM(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round(l_discount*100) AS BIGINT) AS DECIMAL(38,0)))
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)

register(
    "word_count_top20",
    text.word_count_top20,
    f"""
    SELECT token, COUNT(*) AS n FROM (
        SELECT unnest({_TOKENS}) AS token FROM documents
    ) GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
)

register(
    "md5_hash_sample",
    text.md5_hash_sample,
    """
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5(text), 1, 1) IN ('0', '1')
    """,
)

register(
    "array_agg_orders",
    relational.array_agg_orders,
    """
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)

register(
    "quantiles_prices",
    relational.quantiles_prices,
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)

register(
    "dedup_clusters",
    dedup.dedup_clusters,
    _SHINGLES_CTE.replace("WITH toks", "WITH RECURSIVE toks")
    + """
    , p AS (
        SELECT doc_a, doc_b
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM p
        UNION ALL
        SELECT doc_b, doc_a FROM p
    ), reach AS (
        SELECT a AS doc, a AS lbl FROM edges
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.doc
    )
    SELECT doc AS doc_id, MIN(lbl) AS cluster_id
    FROM reach GROUP BY doc
    """,
)

register(
    "regexp_extract_stats",
    text.regexp_extract_stats,
    r"""
    SELECT doc_id,
           coalesce(regexp_extract(text, '\b(s[a-z]{3,})\b', 1), '') AS first_s_word,
           CAST(len(regexp_split_to_array(text, '\bdata\b')) AS BIGINT) AS data_hits_plus1
    FROM documents
    """,
)

register(
    "pii_mask_docs",
    text.pii_mask_docs,
    r"""
    SELECT doc_id,
           substr(regexp_replace(text, '[0-9]', '#', 'g'), 1, 50) AS masked_prefix,
           length(regexp_replace(text, '[0-9]', '#', 'g')) = length(text) AS length_preserved
    FROM documents
    """,
)

register(
    "q5_local_supplier_volume",
    relational.q5_local_supplier_volume,
    """
    SELECT n_name,
           CAST(SUM(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(round(l_discount*100) AS BIGINT)) AS DECIMAL(38,0)))
                AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE c_nationkey = s_nationkey
    GROUP BY n_name
    """,
)

register(
    "sql_frontend_revenue",
    relational.sql_frontend_revenue,
    f"""
    SELECT n_name,
           {_MONEY_SUM.format(col='o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

register(
    "unpivot_part_metrics",
    relational.unpivot_part_metrics,
    """
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice', p_retailprice FROM part
    """,
)

register(
    "scd2_merge_emulation",
    relational.scd2_merge_emulation,
    """
    WITH updates AS (
        SELECT c_custkey, c_name, round(c_acctbal + 100.0, 2) AS acctbal
        FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT c_custkey, c_name, c_acctbal AS acctbal,
           CAST(1 AS INTEGER) AS version, TRUE AS is_current
    FROM customer WHERE c_custkey % 10 != 0
    UNION ALL
    SELECT c_custkey, c_name, c_acctbal, CAST(1 AS INTEGER), FALSE
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, c_name, acctbal, CAST(2 AS INTEGER), TRUE FROM updates
    """,
)

# IVF quantizer is iterative k-means — not SQL-expressible; rows-only +
# pytest recall floor vs cosine_topk.
register("ivf_ann_topk", similarity.ivf_ann_topk, None)

register(
    "except_all_multiset",
    relational.except_all_multiset,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM (
        SELECT l_returnflag, l_linestatus FROM lineitem
        EXCEPT ALL
        SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_returnflag = 'R'
    ) GROUP BY 1, 2
    """,
)

register(
    "price_histogram",
    relational.price_histogram,
    """
    SELECT bucket, bucket * 25000.0 + 0.0 AS lo_edge, COUNT(*) AS n FROM (
        SELECT CAST(floor((o_totalprice - 0.0) / 25000.0) AS BIGINT) AS bucket
        FROM orders
    ) GROUP BY bucket
    """,
)

register(
    "token_count_bpe_regex",
    text.token_count_bpe_regex,
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_alpha_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_tokens,
           CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_punct_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+'))
                + len(regexp_extract_all(text, '[0-9]+'))
                + len(regexp_extract_all(text, '[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)

register(
    "profile_documents",
    text.profile_documents,
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text_nulls,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS lang_distinct,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS source_distinct,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM documents
    """,
)

register(
    "repetition_signals",
    text.repetition_signals,
    rf"""
    WITH base AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents
    ), per_doc AS (
      SELECT doc_id, toks, len(toks) AS n_tokens,
        CASE WHEN len(toks) >= 2 THEN
          round(1.0 - CAST(len(list_distinct(list_transform(
              list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
              z -> z[1] || ' ' || z[2]))) AS DOUBLE) / (len(toks) - 1), 4)
        ELSE 0.0 END AS dup_bigram_frac
      FROM base
    ), tok_counts AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
      GROUP BY doc_id, tok
    ), top_tok AS (
      SELECT doc_id, MAX(c) AS top_n FROM tok_counts GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_tokens, p.dup_bigram_frac,
           round(CAST(t.top_n AS DOUBLE) / p.n_tokens, 4) AS top_token_frac
    FROM per_doc p JOIN top_tok t USING (doc_id)
    """,
)

register(
    "boilerplate_shingle_stats",
    text.boilerplate_shingle_stats,
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
        FROM toks
    ), freq AS (
        SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1
    )
    SELECT s.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN f.df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate,
           round(CAST(SUM(CASE WHEN f.df >= 5 THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) + 0.0 AS boiler_frac
    FROM sh s JOIN freq f ON s.shingle = f.shingle
    GROUP BY s.doc_id
    """,
)

register(
    "train_split_assign",
    text.train_split_assign,
    rf"""
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM (
      SELECT source,
             CASE WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 < 8 THEN 'train'
                  WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 < 9 THEN 'val'
                  ELSE 'test' END AS split,
             len({_TOKENS}) AS n_tok
      FROM documents
    )
    GROUP BY source, split
    """,
)

register(
    "pack_sequences",
    text.pack_sequences,
    rf"""
    SELECT shard, chunk_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM (
      SELECT shard, doc_id, n_tok,
             CAST(floor((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id)
                         - n_tok) / 2048.0) AS BIGINT) AS chunk_id
      FROM (
        SELECT doc_id, doc_id % 8 AS shard, len({_TOKENS}) AS n_tok
        FROM documents
      )
    )
    GROUP BY shard, chunk_id
    """,
)

register(
    "tfidf_top_terms",
    text.tfidf_top_terms,
    rf"""
    WITH tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest({_TOKENS}) AS term FROM documents)
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT doc_id, term,
             round(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term AS top_term, tfidf + 0.0 AS tfidf
    FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)

register(
    "funnel_conversion",
    events.funnel_conversion,
    """
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ), s2 AS (
      SELECT user_id, ts, event_type, t_view,
             min(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ), s3 AS (
      SELECT user_id, t_view, t_click,
             min(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    ), per_user AS (
      SELECT DISTINCT user_id, t_view, t_click, t_purchase FROM s3
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS n_viewed,
           COUNT(t_click) AS n_clicked_after_view,
           COUNT(t_purchase) AS n_purchased_after_click
    FROM per_user
    """,
)

register(
    "stratified_sample_docs",
    text.stratified_sample_docs,
    """
    SELECT source,
           10 + 5 * (CAST(substr(source, 4) AS BIGINT) % 10) AS rate_pct,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100
                              < 10 + 5 * (CAST(substr(source, 4) AS BIGINT) % 10)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY source
    """,
)

register(
    "rollup_cascade_events",
    events.rollup_cascade_events,
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS n_hours
    FROM events
    GROUP BY 1, 2
    """,
)

# oracle regenerates the synthetic source's closed-form relation from
# generate_series — proving the custom Python DataSource is deterministic
# and partition-invariant
register(
    "synthetic_source_rollup",
    _synthetic.synthetic_source_rollup,
    """
    SELECT 'src' || CAST(i % 20 AS VARCHAR) AS source,
           COUNT(*) AS n_docs,
           CAST(SUM(20 + ((i % 2147483647) * 2654435761) % 2147483647 % 50) AS BIGINT) AS sum_tokens,
           CAST(SUM(CAST((((i % 2147483647) * 2654435761) % 2147483647 % 1000) / 1000.0
                         AS DECIMAL(18,3))) AS DOUBLE) AS sum_quality
    FROM generate_series(0, 499) t(i)
    GROUP BY 1
    """,
)

# drained custom Python STREAMING source: the oracle regenerates the
# stream's closed-form content — any dropped/duplicated micro-batch
# breaks the hash, so this checks offset-based exactly-once delivery
register(
    "synthetic_stream_rollup",
    _synthetic.synthetic_stream_rollup,
    """
    SELECT substr('abcde', CAST(((i % 2147483647) * 2654435761) % 2147483647 % 5 AS INT) + 1, 1)
             AS action,
           COUNT(*) AS n_events,
           CAST(SUM(i) AS BIGINT) AS sum_ids,
           CAST(SUM(CAST((((i % 2147483647) * 2654435761) % 2147483647 % 10000) / 100.0
                         AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount
    FROM generate_series(0, 499) t(i)
    GROUP BY 1
    """,
)

register(
    "stream_stream_join",
    _stream_windows.stream_stream_join,
    """
    SELECT e.event_id AS error_id, p.event_id AS purchase_id,
           e.user_id AS user_id
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts <= e.ts
     AND p.ts > e.ts - INTERVAL 30 MINUTE
    """,
)

register(
    "grouping_sets_orders",
    relational.grouping_sets_orders,
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)

register(
    "window_range_frame",
    relational.window_range_frame,
    """
    SELECT o_orderkey, o_orderstatus,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
               AS n_in_band
    FROM orders
    """,
)

register(
    "array_functions_demo",
    similarity.array_functions_demo,
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
           round(CAST(embedding[-1] AS DOUBLE), 6) AS last_dim,
           array_to_string(
               list_transform(CAST(embedding[1:4] AS DOUBLE[]),
                              x -> CAST(CAST(round(x, 6) AS DECIMAL(18,6)) AS VARCHAR)),
               ',') AS head4
    FROM embeddings
    """,
)

# ---------------------------------------------------------------------------
# TPC-H family completion (Q2, Q7-Q9, Q11-Q22 shaped — operators/tpch.py).
# With these, all 22 TPC-H query shapes are registered and oracle-gated.
# ---------------------------------------------------------------------------

_DISC_VOL = (
    "CAST(round(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(round(l_discount*100) AS BIGINT))"
)
_DISC_SUM = (
    "CAST(SUM(CAST(" + _DISC_VOL + " AS DECIMAL(38,0))) AS DOUBLE) / 10000.0"
)

register(
    "q2_min_cost_supplier",
    tpch.q2_min_cost_supplier,
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2
    ), mc AS (
      SELECT l_partkey, min(unit_cost) AS min_cost FROM costs GROUP BY 1
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name, unit_cost
    FROM costs
    JOIN mc ON costs.l_partkey = mc.l_partkey AND costs.unit_cost = mc.min_cost
    JOIN part ON costs.l_partkey = p_partkey
    JOIN supplier ON costs.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = 10 AND p_type = 'STANDARD'
    """,
)

register(
    "q7_volume_shipping",
    tpch.q7_volume_shipping,
    f"""
    SELECT supp_nation, cust_nation, l_year, {_DISC_SUM} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY 1, 2, 3
    """,
)

register(
    "q8_market_share",
    tpch.q8_market_share,
    f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(
             CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2' THEN vol
                                ELSE 0 END AS DECIMAL(28,0))) AS DOUBLE)
             / CAST(SUM(CAST(vol AS DECIMAL(28,0))) AS DOUBLE), 6) + 0.0
               AS mkt_share
    FROM (
      SELECT o_orderdate, n2.n_name AS supp_nation, {_DISC_VOL} AS vol
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    )
    GROUP BY 1
    """,
)

register(
    "q9_product_profit",
    tpch.q9_product_profit,
    """
    SELECT nation, o_year,
           CAST(SUM(CAST(profit_e4 AS DECIMAL(28,0))) AS DOUBLE) / 10000.0
               AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT))
             - CAST(round(l_quantity) AS BIGINT)
               * CAST(round(p_retailprice*100) AS BIGINT) * 10 AS profit_e4
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE 'red%'
    )
    GROUP BY 1, 2
    """,
)

register(
    "q11_important_stock",
    tpch.q11_important_stock,
    """
    WITH by_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT) AS DECIMAL(28,0)))
                  AS DOUBLE) / 100.0 AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 3
      GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(CAST(CAST(round(value*100) AS BIGINT)
                   AS DECIMAL(28,0))) AS DOUBLE) / 100.0 AS total_value
      FROM by_part
    )
    SELECT l_partkey, value FROM by_part, tot
    WHERE value > total_value * 0.001
    """,
)

register(
    "q12_shipmode_priority",
    tpch.q12_shipmode_priority,
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)

register(
    "q13_customer_distribution",
    tpch.q13_customer_distribution,
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    GROUP BY 1
    """,
)

register(
    "q14_promo_revenue",
    tpch.q14_promo_revenue,
    f"""
    SELECT round(
             CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN vol
                                ELSE 0 END AS DECIMAL(28,0))) AS DOUBLE)
             * 100.0
             / CAST(SUM(CAST(vol AS DECIMAL(28,0))) AS DOUBLE), 6) + 0.0
               AS promo_revenue,
           COUNT(*) AS n_items
    FROM (
      SELECT p_type, {_DISC_VOL} AS vol
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-07-01'
    )
    """,
)

register(
    "q15_top_supplier",
    tpch.q15_top_supplier,
    f"""
    WITH revenue AS (
      SELECT l_suppkey, {_DISC_SUM} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)

register(
    "q16_parts_supplier_count",
    tpch.q16_parts_supplier_count,
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)

register(
    "q17_small_quantity_revenue",
    tpch.q17_small_quantity_revenue,
    """
    WITH pq AS (
      SELECT l_partkey AS aq_partkey,
             CAST(SUM(CAST(CAST(round(l_quantity) AS BIGINT)
                  AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pq   ON l_partkey = aq_partkey
    WHERE p_brand = 'Brand#4' AND l_quantity < avg_qty * 0.2
    """,
)

register(
    "q18_large_volume_customers",
    tpch.q18_large_volume_customers,
    """
    WITH big AS (
      SELECT l_orderkey AS big_orderkey,
             CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY 1
      HAVING CAST(SUM(l_quantity) AS DOUBLE) > 250.0
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM orders
    JOIN big      ON o_orderkey = big_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)

register(
    "q19_discounted_revenue",
    tpch.q19_discounted_revenue,
    f"""
    SELECT {_DISC_SUM} AS revenue, COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
)

register(
    "q20_excess_suppliers",
    tpch.q20_excess_suppliers,
    """
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_suppkey
        HAVING CAST(SUM(l_quantity) AS DOUBLE) > 100.0)
    """,
)

register(
    "q21_suppliers_kept_waiting",
    tpch.q21_suppliers_kept_waiting,
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)

register(
    "q22_global_sales_opportunity",
    tpch.q22_global_sales_opportunity,
    """
    WITH c2 AS (
      SELECT * FROM customer WHERE (c_nationkey % 5) IN (0, 2, 3)
    ), ab AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM c2 WHERE c_acctbal > 0.0
    )
    SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM c2, ab
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)

# ---------------------------------------------------------------------------
# Skew/salting, record linkage, generated tables, map functions, streaming
# dedup — second extension batch.
# ---------------------------------------------------------------------------

register(
    "salted_groupby_sum",
    relational.salted_groupby_sum,
    f"""
    SELECT l_returnflag, {_DISC_SUM} AS revenue, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY 1
    """,
)

register(
    "date_spine_daily_orders",
    relational.date_spine_daily_orders,
    """
    WITH spine AS (
      SELECT CAST(unnest(generate_series(DATE '1996-01-01',
                   DATE '1996-03-31', INTERVAL 1 DAY)) AS DATE) AS day
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM orders GROUP BY 1
    )
    SELECT strftime(spine.day, '%Y-%m-%d') AS day,
           COALESCE(n, 0) AS n_orders,
           COALESCE(rev, 0.0) AS revenue
    FROM spine LEFT JOIN daily ON spine.day = daily.day
    """,
)

register(
    "argmax_order_per_status",
    relational.argmax_order_per_status,
    """
    SELECT o_orderstatus, o_totalprice AS top_price,
           o_orderkey AS top_orderkey
    FROM (
      SELECT o_orderstatus, o_totalprice, o_orderkey,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice DESC, o_orderkey DESC)
                 AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)

register(
    "window_first_last",
    relational.window_first_last,
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)  OVER w AS last_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)

register(
    "mode_quantity_per_flag",
    relational.mode_quantity_per_flag,
    """
    SELECT l_returnflag, l_quantity AS mode_qty, n AS n_occurrences
    FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY 1, 2
    ) WHERE rn = 1
    """,
)

register(
    "blocked_levenshtein_pairs",
    dedup.blocked_levenshtein_pairs,
    """
    WITH d AS (
      SELECT doc_id, substr(lower(text), 1, 24) AS blk,
             substr(lower(text), 1, 200) AS head
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 40
    """,
)

register(
    "map_functions_events",
    events.map_functions_events,
    """
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           CAST(props->>'k' AS BIGINT) AS k_val,
           CAST(props->>'k' AS BIGINT) * 2 AS k_doubled,
    FROM events
    """,
)

register(
    "streaming_dedup_events",
    _stream_windows.streaming_dedup_events,
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
)

register(
    "locf_gap_fill",
    events.locf_gap_fill,
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 1 HOUR)) AS hour
    ), grid AS (
        SELECT s.hour, t.event_type
        FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    )
    SELECT strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           g.event_type,
           h.v IS NULL AS filled,
           last_value(h.v IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_locf
    FROM grid g LEFT JOIN hourly h
      ON g.hour = h.hour AND g.event_type = h.event_type
    """,
)

register(
    "interpolate_linear_events",
    events.interpolate_linear_events,
    """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ), spine AS (
        SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds),
                                      INTERVAL 1 HOUR)) AS hour
    ), grid AS (
        SELECT s.hour,
               date_diff('hour', (SELECT lo FROM bounds), s.hour) AS idx,
               t.event_type
        FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    ), wnd AS (
        SELECT g.hour, g.event_type, g.idx, h.v,
               last_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN h.v IS NOT NULL THEN g.idx END IGNORE NULLS)
                   OVER (PARTITION BY g.event_type ORDER BY g.idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
               first_value(h.v IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN h.v IS NOT NULL THEN g.idx END IGNORE NULLS)
                   OVER (PARTITION BY g.event_type ORDER BY g.idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
        FROM grid g LEFT JOIN hourly h
          ON g.hour = h.hour AND g.event_type = h.event_type
    )
    SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           v IS NULL AS filled,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * ((idx - pi) * 1.0 / (ni - pi))
                 END, 6) + 0.0 AS value_interp
    FROM wnd
    """,
)

register(
    "systematic_weighted_sample",
    text.systematic_weighted_sample,
    """
    WITH c AS (
        SELECT doc_id % 8 AS shard, doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
               SUM(len(regexp_split_to_array(trim(text), '\\s+'))) OVER (
                   PARTITION BY doc_id % 8 ORDER BY doc_id
               ) AS cum
        FROM documents
    )
    SELECT shard, doc_id, n_tok,
           CAST(cum - n_tok AS BIGINT) AS start_offset
    FROM c
    WHERE (cum - n_tok) // 512 < cum // 512
    """,
)

register(
    "unigram_logprob_docs",
    text.unigram_logprob_docs,
    """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), tc AS (
        SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS total FROM toks
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           ROUND(SUM(tf.tf * ln(tc.cnt / tot.total)) / SUM(tf.tf), 6) + 0.0
               AS avg_logprob
    FROM tf JOIN tc USING (term) CROSS JOIN tot
    GROUP BY tf.doc_id
    """,
)

# Sketch estimates are engine-specific: rows-only in the driver gate;
# tests/test_pipeline_operators.py pins accuracy vs this engine's exact
# answers (SURVEY.md §5 — don't fake oracles with different sketches).
register("hll_rollup_customers", sketches.hll_rollup_customers, None)
register("approx_quantiles_prices", sketches.approx_quantiles_prices, None)

register(
    "decontaminate_ngram_overlap",
    dedup.decontaminate_ngram_overlap,
    _SHINGLES_CTE
    + """
    SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
    FROM sh c JOIN sh b ON c.shingle = b.shingle
    WHERE b.doc_id % 100 = 7 AND c.doc_id % 100 <> 7
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)

register(
    "incremental_dedup",
    dedup.incremental_dedup,
    """
    WITH keyed AS (
        SELECT doc_id, source, md5(text) AS k FROM documents
    ), newb AS (
        SELECT * FROM keyed WHERE doc_id % 5 = 0
    ), oldk AS (
        SELECT DISTINCT k FROM keyed WHERE doc_id % 5 <> 0
    ), st AS (
        SELECT n.source,
               CASE WHEN o.k IS NOT NULL THEN 'dup_vs_existing'
                    WHEN row_number() OVER (PARTITION BY n.k ORDER BY n.doc_id) = 1
                        THEN 'kept'
                    ELSE 'dup_in_batch' END AS status
        FROM newb n LEFT JOIN oldk o ON n.k = o.k
    )
    SELECT source, status, COUNT(*) AS n_docs FROM st GROUP BY 1, 2
    """,
)

register(
    "cleaning_funnel",
    text.cleaning_funnel,
    """
    WITH g AS (
        SELECT source,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
               length(text) AS n_chars,
               lang = 'en' AS pl
        FROM documents
    ), gates AS (
        SELECT source, n_tok, pl,
               n_tok >= 10 AND n_tok <= 500 AS pn,
               n_chars * 1.0 / n_tok <= 8.0 AS pr
        FROM g
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN pl THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_lang,
           CAST(SUM(CASE WHEN pn THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_len,
           CAST(SUM(CASE WHEN pr THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_ratio,
           CAST(SUM(CASE WHEN pl AND pn AND pr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep,
           CAST(SUM(CASE WHEN pl AND pn AND pr THEN n_tok ELSE 0 END)
               AS BIGINT) AS tokens_kept
    FROM gates GROUP BY source
    """,
)

register(
    "chunk_dedup_docs",
    dedup.chunk_dedup_docs,
    """
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), chunks AS (
        SELECT doc_id, CAST(g.i AS INT) AS chunk_pos,
               array_to_string(words[(g.i*10+1):(g.i*10+10)], ' ') AS chunk_text
        FROM base,
             LATERAL (SELECT unnest(range(0, CAST(ceil(len(words)/10.0)
                                                  AS BIGINT))) AS i) g
    ), ranked AS (
        SELECT doc_id, chunk_pos, chunk_text,
               row_number() OVER (PARTITION BY chunk_text
                                  ORDER BY doc_id, chunk_pos) AS rn
        FROM chunks
    )
    SELECT doc_id,
           string_agg(chunk_text, ' ' ORDER BY chunk_pos) AS dedup_text,
           COUNT(*) AS kept_chunks
    FROM ranked WHERE rn = 1
    GROUP BY doc_id ORDER BY doc_id
    """,
)

register(
    "lang_mixture_rebalance",
    text.lang_mixture_rebalance,
    """
    WITH c AS (SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_total) AS min_total FROM c),
    k AS (
        SELECT d.lang, COUNT(*) AS n_kept
        FROM documents d JOIN c USING (lang) CROSS JOIN m
        WHERE (((d.doc_id % 2147483647) * 2654435761) % 2147483647 % 1000000) * c.n_total
              < m.min_total * 1000000
        GROUP BY d.lang
    )
    SELECT c.lang, c.n_total,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM c LEFT JOIN k USING (lang)
    ORDER BY lang
    """,
)

register(
    "winsorize_events",
    events.winsorize_events,
    """
    WITH p AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < p.p05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lo,
           CAST(SUM(CASE WHEN e.value > p.p95 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hi,
           ROUND(AVG(LEAST(GREATEST(e.value, p.p05), p.p95)), 4) + 0.0
               AS avg_winsor,
           ROUND(MIN(p.p05), 4) + 0.0 AS p05_r,
           ROUND(MIN(p.p95), 4) + 0.0 AS p95_r
    FROM events e JOIN p USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)

register(
    "salted_join_skewed",
    relational.salted_join_skewed,
    f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           {_MONEY_SUM.format(col="e.value")} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)

register(
    "weighted_reservoir_docs",
    text.weighted_reservoir_docs,
    """
    SELECT lang, rk, doc_id, n_chars FROM (
        SELECT lang, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY round(ln((((doc_id % 2147483647) * 2654435761) % 2147483647 + 1)
                                     / 2147483648.0) / n_chars, 12) DESC,
                            doc_id ASC
               ) AS rk
        FROM documents WHERE n_chars > 0
    ) WHERE rk <= 5
    ORDER BY lang, rk
    """,
)

register(
    "bloom_filter_join",
    relational.bloom_filter_join,
    # Semantics = plain semi join; the Bloom stage is physical-only, so
    # the oracle carries no bloom.
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {_MONEY_SUM.format(col="o_totalprice")} AS revenue
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_nationkey < 10
    )
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)

register(
    "training_manifest",
    text.training_manifest,
    rf"""
    WITH docs AS (
        SELECT doc_id, source, lang,
               len({_TOKENS}) AS n_tok,
               length(text) AS n_chars
        FROM documents
    ), v AS (
        SELECT vec_id,
               round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])), 6) + 0.0
                   AS sq_norm_r
        FROM embeddings
    )
    SELECT doc_id, source, lang,
           CASE WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 < 8 THEN 'train'
                WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 < 9 THEN 'val'
                ELSE 'test' END AS split,
           n_tok,
           n_tok >= 10 AND n_tok <= 500
               AND n_chars * 1.0 / n_tok <= 8.0 AS keep,
           v.sq_norm_r IS NOT NULL AS has_embedding,
           v.sq_norm_r
    FROM docs LEFT JOIN v ON docs.doc_id = v.vec_id
    ORDER BY doc_id
    """,
)

# Stream-static join drained with AvailableNow equals the batch
# join+window over static input — full ANSI oracle, like the other
# streaming rows.
register(
    "stream_static_enrich",
    _stream_windows.stream_static_enrich,
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)

register(
    "cohort_retention",
    events.cohort_retention,
    """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
    f AS (SELECT user_id, MIN(d) AS cohort_d FROM e GROUP BY user_id),
    x AS (
        SELECT DISTINCT e.user_id,
               strftime(f.cohort_d, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', f.cohort_d, e.d) AS INT) AS day_offset
        FROM e JOIN f USING (user_id)
    )
    SELECT cohort_day, day_offset, COUNT(*) AS n_users
    FROM x GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)

register(
    "event_transition_matrix",
    events.event_transition_matrix,
    """
    WITH s AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), c AS (
        SELECT prev_type, event_type, COUNT(*) AS n_transitions
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n_transitions,
           round(n_transitions * 1.0 /
                 SUM(n_transitions) OVER (PARTITION BY prev_type), 6) + 0.0
               AS p_transition
    FROM c ORDER BY prev_type, event_type
    """,
)

register(
    "rfm_features",
    events.rfm_features,
    """
    WITH h AS (SELECT MAX(CAST(ts AS DATE)) AS horizon_d FROM events),
    p AS (
        SELECT user_id, MAX(CAST(ts AS DATE)) AS last_d,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT user_id,
           CAST(date_diff('day', last_d, horizon_d) AS INT) AS recency_days,
           frequency, monetary
    FROM p CROSS JOIN h ORDER BY user_id
    """,
)

register(
    "ab_test_lift",
    events.ab_test_lift,
    """
    WITH pu AS (
        SELECT user_id,
               CASE WHEN ((user_id % 2147483647) * 2654435761) % 2147483647 % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS bucket,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS n_purch,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(18,2))
                        ELSE CAST(0.0 AS DECIMAL(18,2)) END) AS purch_value
        FROM events GROUP BY user_id, bucket
    )
    SELECT bucket, COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converters,
           round(SUM(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) + 0.0 AS conversion_rate,
           CAST(SUM(purch_value) AS DOUBLE) AS total_purchase_value
    FROM pu GROUP BY bucket ORDER BY bucket
    """,
)

register("kmv_join_size_estimate", sketches.kmv_join_size_estimate, None)

register(
    "event_trigram_paths",
    events.event_trigram_paths,
    """
    WITH tri AS (
        SELECT lag(event_type, 2) OVER w AS t1,
               lag(event_type, 1) OVER w AS t2,
               event_type AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1 AS step1, t2 AS step2, t3 AS step3, COUNT(*) AS n
    FROM tri WHERE t1 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, step1, step2, step3 LIMIT 10
    """,
)

register(
    "holt_linear_forecast",
    text.holt_linear_forecast,
    """
    WITH daily AS (
        SELECT source, CAST(doc_id % 30 AS INT) AS day,
               CAST(SUM(n_chars) AS DOUBLE) AS x
        FROM documents GROUP BY 1, 2
    ),
    folded AS (
        SELECT source, COUNT(*) AS n_days,
               -- state as a 2-list [level, trend]: DuckDB's struct
               -- lambdas rebind acc fields SEQUENTIALLY (acc.l already
               -- updated when 'b' evaluates), list construction doesn't
               list_reduce(
                   list_prepend([(list(x ORDER BY day))[1], 0.0e0],
                       list_transform((list(x ORDER BY day))[2:],
                                      xi -> [xi, 0.0e0])),
                   (acc, s) -> [
                       s[1] * 0.5e0 + (acc[1] + acc[2]) * 0.5e0,
                       (s[1] * 0.5e0 + (acc[1] + acc[2]) * 0.5e0 - acc[1])
                            * 0.3e0 + acc[2] * 0.7e0
                   ]) AS st
        FROM daily GROUP BY source
    )
    SELECT source, n_days,
           round(st[1], 6) + 0.0 AS holt_level,
           round(st[2], 6) + 0.0 AS holt_trend,
           round(st[1] + st[2], 6) + 0.0 AS forecast_next
    FROM folded ORDER BY source
    """,
)

register(
    "rolling_corr_revenue_dau",
    events.rolling_corr_revenue_dau,
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT),
                   0) // 100 AS x,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT day, x, y,
               COUNT(*) OVER w AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
               CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, x, y,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)), 4)
                     + 0.0
           END AS corr_14d
    FROM s ORDER BY day
    """,
)

register(
    "bounce_rate_daily",
    events.bounce_rate_daily,
    """
    WITH lagged AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM lagged
    ),
    per_session AS (
        SELECT user_id, session_id, COUNT(*) AS n_events,
               CAST(MIN(ts) AS DATE) AS day
        FROM sess GROUP BY 1, 2
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           round(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) + 0.0 AS bounce_rate
    FROM per_session GROUP BY day ORDER BY day
    """,
)

register(
    "connected_components_stars",
    relational.connected_components_stars,
    """
    WITH RECURSIVE po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pairs AS (
        SELECT x.p AS a, y.p AS b
        FROM po x JOIN po y ON x.o = y.o AND x.p < y.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
    reach AS (
        SELECT a AS node, a AS lbl FROM edges
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
    ),
    labels AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
    comp AS (
        SELECT cluster_id, COUNT(*) AS n_nodes FROM labels GROUP BY cluster_id
    )
    SELECT rk, cluster_id, n_nodes FROM (
        SELECT cluster_id, n_nodes,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY n_nodes DESC, cluster_id ASC) AS BIGINT) AS rk
        FROM comp
    ) WHERE rk <= 20 ORDER BY rk
    """,
)

register(
    "scd2_point_in_time_join",
    relational.scd2_point_in_time_join,
    """
    WITH c AS (SELECT c_custkey, c_acctbal FROM customer),
    v1 AS (
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
               CAST(1 AS BIGINT) AS version,
               DATE '1970-01-01' AS valid_from,
               CASE WHEN c_custkey % 3 = 0 THEN DATE '1995-06-01'
                    ELSE DATE '9999-12-31' END AS valid_to
        FROM c
    ),
    v2 AS (
        SELECT c_custkey, round(c_acctbal + 100.0, 2) AS acctbal,
               CAST(2 AS BIGINT) AS version,
               DATE '1995-06-01' AS valid_from,
               DATE '9999-12-31' AS valid_to
        FROM c WHERE c_custkey % 3 = 0
    ),
    dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT version,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND d.valid_from <= CAST(o.o_orderdate AS DATE)
     AND CAST(o.o_orderdate AS DATE) < d.valid_to
    GROUP BY version ORDER BY version
    """,
)

register(
    "entity_resolution_pipeline",
    relational.entity_resolution_pipeline,
    """
    WITH c AS (
        SELECT c_custkey,
               substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS c_name,
               c_nationkey
        FROM customer
    ),
    variants AS (
        SELECT c_custkey + 10000000 AS c_custkey,
               substr(c_name, 1, 2) || substr(c_name, 4) AS c_name,
               c_nationkey
        FROM c WHERE c_custkey % 10 = 0
    ),
    allrec AS (SELECT * FROM c UNION ALL SELECT * FROM variants),
    blocked AS (SELECT *, substr(c_name, 1, 2) AS blk FROM allrec),
    cand AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               levenshtein(a.c_name, b.c_name) AS dist,
               a.c_nationkey AS nation
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) BETWEEN 1 AND 2
    ),
    resolved AS (
        SELECT id_b, nation, MIN(id_a) AS canonical
        FROM cand GROUP BY id_b, nation
    ),
    n_rec AS (
        SELECT c_nationkey AS nation, COUNT(*) AS n_records
        FROM allrec GROUP BY 1
    )
    SELECT r.nation, n_records,
           COUNT(*) AS n_matched,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_entities
    FROM resolved r JOIN n_rec USING (nation)
    GROUP BY r.nation, n_records ORDER BY r.nation
    """,
)

register(
    "kaplan_meier_repurchase",
    events.kaplan_meier_repurchase,
    """
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events
        WHERE event_type = 'purchase'
    ),
    maxd AS (SELECT CAST(MAX(ts) AS DATE) AS maxd FROM events),
    ranked AS (
        SELECT user_id, d,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
        FROM p
    ),
    pu AS (
        SELECT user_id, MIN(d) AS first_d,
               MAX(CASE WHEN rn = 2 THEN d END) AS second_d
        FROM ranked WHERE rn <= 2 GROUP BY user_id
    ),
    subjects AS (
        SELECT COALESCE(date_diff('day', first_d, second_d),
                        date_diff('day', first_d, maxd)) AS t,
               second_d IS NOT NULL AS observed
        FROM pu CROSS JOIN maxd
    ),
    times AS (
        SELECT t,
               CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS d_events,
               CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_censored,
               COUNT(*) AS n_at_t
        FROM subjects GROUP BY t
    ),
    ntot AS (SELECT COUNT(*) AS n_total FROM subjects),
    ar AS (
        SELECT t, d_events, c_censored,
               n_total - COALESCE(CAST(SUM(n_at_t) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS n_risk
        FROM times CROSS JOIN ntot
    ),
    lnt AS (
        SELECT t, d_events, c_censored, n_risk,
               CASE WHEN d_events > 0 AND d_events < n_risk
                    THEN round(ln(CAST(n_risk - d_events AS DOUBLE) / n_risk),
                               12)
                    ELSE 0.0 END AS lt
        FROM ar
    ),
    cum AS (
        SELECT t, d_events, c_censored, n_risk,
               SUM(CAST(lt AS DECIMAL(28,12))) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ln
        FROM lnt
    )
    SELECT t AS t_days, n_risk, d_events, c_censored,
           round(exp(CAST(cum_ln AS DOUBLE)), 6) + 0.0 AS survival
    FROM cum WHERE d_events > 0 ORDER BY t_days
    """,
)

register(
    "attribution_models_compare",
    events.attribution_models_compare,
    """
    WITH purchases AS (
        SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
        WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, ts AS t_ts, event_id AS t_id,
               event_type AS touch_type
        FROM events WHERE event_type IN ('view', 'click')
    ),
    j AS (
        SELECT p_id, t_ts, t_id, touch_type
        FROM purchases JOIN touches USING (user_id)
        WHERE t_ts <= p_ts AND t_ts >= p_ts - INTERVAL 7 DAY
    ),
    ranked AS (
        SELECT touch_type,
               ROW_NUMBER() OVER (PARTITION BY p_id
                   ORDER BY t_ts ASC, t_id ASC) AS rk_f,
               ROW_NUMBER() OVER (PARTITION BY p_id
                   ORDER BY t_ts DESC, t_id DESC) AS rk_l,
               COUNT(*) OVER (PARTITION BY p_id) AS k
        FROM j
    )
    SELECT touch_type,
           CAST(SUM(CASE WHEN rk_f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch_convs,
           CAST(SUM(CASE WHEN rk_l = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch_convs,
           round(CAST(SUM(CAST(round(1.0e0 / k, 9) AS DECIMAL(18,9)))
                      AS DOUBLE), 4) AS linear_credit
    FROM ranked GROUP BY touch_type ORDER BY touch_type
    """,
)

register(
    "pagerank_copurchase",
    relational.pagerank_copurchase,
    """
    WITH RECURSIVE po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    pairs AS (
        SELECT a.p AS pa, b.p AS pb
        FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT pa AS src, pb AS dst FROM pairs
            UNION ALL SELECT pb, pa FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
    edges AS (SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d ON s.src = d.src),
    pr(it, node, r) AS (
        SELECT 0, src, CAST(1000000000000 AS BIGINT) FROM deg
        UNION ALL
        SELECT it + 1, e.dst,
               CAST(150000000000 + (85 * SUM(pr.r // e.deg)) // 100 AS BIGINT)
        FROM pr JOIN edges e ON pr.node = e.src
        WHERE it < 10
        GROUP BY it, e.dst
    )
    SELECT rk, part, rank_units FROM (
        SELECT node AS part, r AS rank_units,
               CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node ASC) AS BIGINT)
                   AS rk
        FROM pr WHERE it = 10
    ) WHERE rk <= 20 ORDER BY rk
    """,
)

register(
    "benford_digit_audit",
    relational.benford_digit_audit,
    """
    WITH tot AS (SELECT COUNT(*) AS n FROM orders),
    d AS (
        SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                      1, 1) AS digit,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT digit, n_orders,
           round(n_orders * 1.0 / n, 6) + 0.0 AS obs_share,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) + 0.0
               AS benford_share,
           round(n_orders * 1.0 / n
                 - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) + 0.0
               AS deviation
    FROM d CROSS JOIN tot ORDER BY digit
    """,
)

register(
    "theil_sen_trend",
    relational.theil_sen_trend,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ),
    maxd AS (SELECT MAX(day) AS maxd FROM daily),
    recent AS (
        SELECT date_diff('day', maxd, day) AS i, y
        FROM daily CROSS JOIN maxd
        WHERE date_diff('day', maxd, day) > -120
    ),
    slopes AS (
        SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS s
        FROM recent a JOIN recent b ON a.i < b.i
    ),
    tot AS (SELECT COUNT(*) AS n_pairs FROM slopes),
    ranked AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM slopes),
    nd AS (SELECT COUNT(*) AS n_days FROM recent),
    picked AS (
        SELECT s, n_pairs FROM ranked CROSS JOIN tot
        WHERE rn = CAST(FLOOR((n_pairs + 1) / 2) AS BIGINT)
           OR rn = CAST(FLOOR(n_pairs / 2) AS BIGINT) + 1
    )
    SELECT n_days, n_pairs,
           round(SUM(s) / COUNT(*), 6) + 0.0 AS slope_cents_per_day
    FROM picked CROSS JOIN nd GROUP BY n_days, n_pairs
    """,
)

register(
    "cohort_ltv_curve",
    events.cohort_ltv_curve,
    """
    WITH e AS (
        SELECT user_id, event_type, value,
               CAST(FLOOR(date_diff('day', DATE '1970-01-05',
                                    CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
        FROM events
    ),
    first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id),
    sizes AS (
        SELECT cohort_wk, COUNT(*) AS cohort_users FROM first GROUP BY cohort_wk
    ),
    rev AS (
        SELECT f.cohort_wk,
               CAST(e.wk - f.cohort_wk AS BIGINT) AS week_offset,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS rev_cents
        FROM e JOIN first f ON e.user_id = f.user_id GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_wk, week_offset, rev_cents,
               CAST(SUM(rev_cents) OVER (PARTITION BY cohort_wk
                   ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_cents
        FROM rev
    )
    SELECT cohort_wk, week_offset, cohort_users, cum_cents,
           round(CAST(cum_cents AS DOUBLE) / cohort_users, 4) + 0.0
               AS ltv_cents_per_user
    FROM cum JOIN sizes USING (cohort_wk)
    ORDER BY cohort_wk, week_offset
    """,
)

register(
    "geo_mean_value_udaf",
    text.geo_mean_value_udaf,
    """
    SELECT lang, COUNT(*) AS n_docs,
           round(exp(list_reduce(list(ln(1 + n_chars) ORDER BY n_chars),
                                 (a, b) -> a + b) / COUNT(*)), 6) + 0.0
               AS geo_mean_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)

register(
    "dedup_rate_by_source",
    text.dedup_rate_by_source,
    """
    WITH pc AS (
        SELECT source, md5(text) AS k, COUNT(*) AS n
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           COUNT(*) AS n_distinct,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dupes,
           round((SUM(n) - COUNT(*)) * 1.0 / SUM(n), 6) + 0.0 AS dup_rate
    FROM pc GROUP BY source ORDER BY source
    """,
)

register(
    "cross_lang_dup_pairs",
    text.cross_lang_dup_pairs,
    """
    WITH k AS (
        SELECT md5(substr(text, 1, 120)) AS k, doc_id, lang FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.lang AS lang_a, b.lang AS lang_b
    FROM k a JOIN k b ON a.k = b.k AND a.doc_id < b.doc_id
    WHERE a.lang <> b.lang ORDER BY doc_a, doc_b
    """,
)

register(
    "item_item_recs",
    relational.item_item_recs,
    """
    WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    cnt AS (SELECT p, COUNT(*) AS n FROM po GROUP BY p),
    cooc AS (
        SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cooc
        FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    sym AS (SELECT pa, pb, cooc FROM cooc
            UNION ALL SELECT pb, pa, cooc FROM cooc),
    j AS (
        SELECT s.pa, s.pb, round(s.cooc / sqrt(ca.n * cb.n), 6) AS sim
        FROM sym s JOIN cnt ca ON s.pa = ca.p JOIN cnt cb ON s.pb = cb.p
    )
    SELECT pa AS part, rk, pb AS rec_part, sim FROM (
        SELECT pa, pb, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY pa
                   ORDER BY sim DESC, pb ASC) AS BIGINT) AS rk
        FROM j
    ) WHERE rk <= 3 ORDER BY part, rk
    """,
)

register(
    "adamic_adar_links",
    relational.adamic_adar_links,
    """
    WITH po AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    osz AS (SELECT o, COUNT(*) AS sz FROM po GROUP BY o HAVING COUNT(*) >= 2),
    wpo AS (
        SELECT po.o, po.p,
               CAST(round(1.0 / ln(sz), 9) AS DECIMAL(18,9)) AS wt
        FROM po JOIN osz ON po.o = osz.o
    ),
    aa AS (
        SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_shared,
               round(CAST(SUM(a.wt) AS DOUBLE), 6) AS aa_score
        FROM wpo a JOIN wpo b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2
    )
    SELECT rk, pa, pb, n_shared, aa_score FROM (
        SELECT pa, pb, n_shared, aa_score,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY aa_score DESC, pa ASC, pb ASC) AS BIGINT) AS rk
        FROM aa
    ) WHERE rk <= 20 ORDER BY rk
    """,
)

register(
    "psi_price_drift",
    relational.psi_price_drift,
    """
    WITH priced AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               year(o_orderdate) AS yr
        FROM orders
    ),
    maxy AS (SELECT MAX(yr) AS maxy FROM priced),
    vals AS (SELECT v, COUNT(*) AS cnt FROM priced GROUP BY v),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vals),
    buckets AS (
        SELECT v,
               CAST(FLOOR(COALESCE(CAST(SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) * 10 / n) AS INT) AS bucket
        FROM vals, tot
    ),
    binned AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN yr < maxy THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_early,
               CAST(SUM(CASE WHEN yr = maxy THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_late
        FROM priced CROSS JOIN maxy JOIN buckets ON priced.v = buckets.v
        GROUP BY bucket
    ),
    totals AS (
        SELECT CAST(SUM(n_early) AS BIGINT) AS te,
               CAST(SUM(n_late) AS BIGINT) AS tl
        FROM binned
    )
    SELECT bucket, n_early, n_late,
           round((CAST(n_early + 1 AS DOUBLE) / CAST(te + 10 AS DOUBLE)
                  - CAST(n_late + 1 AS DOUBLE) / CAST(tl + 10 AS DOUBLE))
                 * ln((CAST(n_early + 1 AS DOUBLE) / CAST(te + 10 AS DOUBLE))
                      / (CAST(n_late + 1 AS DOUBLE) / CAST(tl + 10 AS DOUBLE))),
                 8) + 0.0 AS psi_term
    FROM binned CROSS JOIN totals ORDER BY bucket
    """,
)

register(
    "ks_statistic_values",
    events.ks_statistic_values,
    """
    WITH pv AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN ((user_id % 2147483647) * 2654435761) % 2147483647 % 2 = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS c_ctrl,
               CAST(SUM(CASE WHEN ((user_id % 2147483647) * 2654435761) % 2147483647 % 2 = 0
                        THEN 0 ELSE 1 END) AS BIGINT) AS c_trt
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(c_ctrl) AS BIGINT) AS n_ctrl,
               CAST(SUM(c_trt) AS BIGINT) AS n_trt
        FROM pv
    ),
    cdfs AS (
        SELECT v,
               CAST(SUM(c_ctrl) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_ctrl,
               CAST(SUM(c_trt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_trt
        FROM pv
    )
    SELECT n_ctrl, n_trt,
           round(MAX(abs(CAST(cum_ctrl AS DOUBLE) / n_ctrl
                         - CAST(cum_trt AS DOUBLE) / n_trt)), 6) + 0.0 AS ks_stat
    FROM cdfs CROSS JOIN tot GROUP BY n_ctrl, n_trt
    """,
)

register(
    "matryoshka_overlap",
    similarity.matryoshka_overlap,
    _VEC_CTE
    + """
    , vv AS (SELECT vec_id, ve, ve[1:16] AS vt FROM v),
    q AS (SELECT vec_id AS query_id, ve AS qv, vt AS qt FROM vv WHERE vec_id < 10),
    scored AS (
        SELECT query_id, vec_id AS neighbor_id,
               round(list_dot_product(qv, ve)
                     / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(ve, ve))),
                     6) AS sf_,
               round(list_dot_product(qt, vt)
                     / (sqrt(list_dot_product(qt, qt)) * sqrt(list_dot_product(vt, vt))),
                     6) AS st_
        FROM vv CROSS JOIN q WHERE vec_id != query_id
    ), ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY sf_ DESC, neighbor_id) AS rkf,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY st_ DESC, neighbor_id) AS rkt
        FROM scored
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN rkf <= 5 AND rkt <= 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common
    FROM ranked GROUP BY query_id ORDER BY query_id
    """,
)

register(
    "range_partition_planner",
    relational.range_partition_planner,
    """
    WITH vals AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, COUNT(*) AS cnt
        FROM orders GROUP BY 1
    ), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vals),
    a AS (
        SELECT v, cnt,
               COALESCE(CAST(SUM(cnt) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                   0) AS cum_before
        FROM vals
    )
    SELECT CAST(FLOOR(cum_before * 16 / n) AS INT) AS bucket,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           MIN(v) AS lo_cents,
           MAX(v) AS hi_cents
    FROM a, tot GROUP BY 1 ORDER BY 1
    """,
)

register(
    "cusum_changepoints",
    relational.cusum_changepoints,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
        FROM orders GROUP BY 1
    ), g AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
        FROM daily
    ), wnd AS (
        SELECT day, x,
               CAST(SUM(x) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS run,
               ROW_NUMBER() OVER (ORDER BY day) AS i
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           x AS rev_cents,
           round(CAST(run AS DOUBLE) - i * (CAST(sx AS DOUBLE) / n), 4) + 0.0
               AS cusum,
           abs(CAST(run AS DOUBLE) - i * (CAST(sx AS DOUBLE) / n))
               > 2.0 * sqrt(CAST(sxx AS DOUBLE) / n
                            - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                     * sqrt(CAST(n AS DOUBLE)) AS drift_flag
    FROM wnd, g ORDER BY day
    """,
)

register(
    "inverted_index_topdf",
    text.inverted_index_topdf,
    rf"""
    WITH tok AS (
        SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
    ), per_doc AS (
        SELECT token, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), per_token AS (
        SELECT token, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
               array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS postings
        FROM per_doc GROUP BY token
    )
    SELECT * FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY df DESC, token ASC) AS rk,
               token, df, total_tf, postings
        FROM per_token
    ) WHERE rk <= 50 ORDER BY rk
    """,
)

register(
    "ses_forecast_revenue",
    text.ses_forecast_revenue,
    """
    WITH daily AS (
        SELECT source, CAST(doc_id % 30 AS INT) AS day,
               CAST(SUM(n_chars) AS DOUBLE) AS x
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_days,
           round(list_reduce(list(x ORDER BY day), (acc, x) -> acc * 0.7 + x * 0.3),
                 6) + 0.0 AS ses_forecast
    FROM daily GROUP BY source ORDER BY source
    """,
)

register(
    "k_anonymity_audit",
    relational.k_anonymity_audit,
    """
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS class_size
        FROM customer GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN class_size < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_classes,
           MIN(class_size) AS min_class_size,
           CAST(SUM(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)
                AS BIGINT) AS n_customers_at_risk
    FROM classes GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)

register(
    "cuped_adjusted_lift",
    events.cuped_adjusted_lift,
    """
    WITH pu AS (
        SELECT user_id,
               CASE WHEN ((user_id % 2147483647) * 2654435761) % 2147483647 % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS bucket,
               CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ), g AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
               SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy
        FROM pu
    ), b AS (
        SELECT bucket, COUNT(*) AS n_users,
               SUM(CAST(x AS DECIMAL(38,0))) AS sxb,
               SUM(CAST(y AS DECIMAL(38,0))) AS syb
        FROM pu GROUP BY bucket
    )
    SELECT bucket, n_users,
           round(CAST(syb AS DOUBLE) / n_users, 6) + 0.0
               AS mean_purchase_cents,
           round(CAST(syb AS DOUBLE) / n_users
                 - (CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) <> 0.0
                         THEN CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)
                         ELSE 0.0 END)
                   * (CAST(sxb AS DOUBLE) / n_users
                      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0
               AS cuped_adj_purchase_cents
    FROM b, g ORDER BY bucket
    """,
)

register(
    "snapshot_diff",
    relational.snapshot_diff,
    """
    WITH d AS (SELECT doc_id, text FROM documents),
    o AS (SELECT doc_id AS k_old, text AS text_old FROM d WHERE doc_id % 7 <> 0),
    n AS (SELECT doc_id AS k_new,
                 CASE WHEN doc_id % 3 = 0 THEN 'v2 ' || text ELSE text END
                     AS text_new
          FROM d WHERE doc_id % 5 <> 0)
    SELECT CASE WHEN k_old IS NULL THEN 'added'
                WHEN k_new IS NULL THEN 'removed'
                WHEN text_old <> text_new THEN 'changed'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n_keys
    FROM o FULL OUTER JOIN n ON o.k_old = n.k_new
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "key_skew_profile",
    relational.key_skew_profile,
    """
    WITH es AS (SELECT user_id AS k, COUNT(*) AS sz FROM events GROUP BY 1),
    ls AS (SELECT l_orderkey AS k, COUNT(*) AS sz FROM lineitem GROUP BY 1)
    SELECT 'events' AS table_name, 'user_id' AS key_col, COUNT(*) AS n_keys,
           round(AVG(sz), 4) + 0.0 AS mean_sz, MAX(sz) AS max_sz,
           round(quantile_cont(sz, 0.99), 4) + 0.0 AS p99_sz,
           round(MAX(sz) * 1.0 / AVG(sz), 4) + 0.0 AS skew_ratio
    FROM es
    UNION ALL
    SELECT 'lineitem', 'l_orderkey', COUNT(*),
           round(AVG(sz), 4) + 0.0, MAX(sz),
           round(quantile_cont(sz, 0.99), 4) + 0.0,
           round(MAX(sz) * 1.0 / AVG(sz), 4) + 0.0
    FROM ls
    """,
)

register(
    "mad_anomaly_events",
    events.mad_anomaly_events,
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1
    ), mad AS (
        SELECT e.event_type, MIN(m.med) AS med,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value > m.med + 3*1.4826*m.mad
                           OR e.value < m.med - 3*1.4826*m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           round(MIN(m.med), 4) + 0.0 AS median_r,
           round(MIN(m.mad), 4) + 0.0 AS mad_r
    FROM events e JOIN mad m USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)

register(
    "cap_per_source",
    text.cap_per_source,
    """
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % 2147483647) * 2654435761) % 2147483647, doc_id
               ) AS rn
        FROM documents
    )
    SELECT source, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           MIN(CASE WHEN rn <= 15 THEN doc_id END) AS first_kept_doc
    FROM r GROUP BY source ORDER BY source
    """,
)

register(
    "null_safe_join_demo",
    relational.null_safe_join_demo,
    """
    WITH e AS (SELECT NULLIF(user_id % 10, 0) AS eb FROM events),
    c AS (SELECT NULLIF(c_custkey % 10, 0) AS cb, COUNT(*) AS n_cust
          FROM customer GROUP BY 1)
    SELECT COALESCE(eb, -1) AS bucket, COUNT(*) AS n_events,
           MIN(n_cust) AS n_cust
    FROM e JOIN c ON eb IS NOT DISTINCT FROM cb
    GROUP BY COALESCE(eb, -1) ORDER BY bucket
    """,
)

register(
    "daily_revenue_change",
    relational.daily_revenue_change,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, revenue,
           lag(revenue) OVER (ORDER BY d) AS prev_revenue,
           round(revenue - lag(revenue) OVER (ORDER BY d), 2) + 0.0
               AS abs_change,
           round((revenue - lag(revenue) OVER (ORDER BY d))
                 / lag(revenue) OVER (ORDER BY d) * 100, 4) + 0.0
               AS pct_change
    FROM daily ORDER BY day
    """,
)

register(
    "label_centroids",
    similarity.label_centroids,
    """
    WITH v AS (
        SELECT CAST(embedding AS DOUBLE[]) AS ve, label FROM embeddings
    ), p AS (
        SELECT label, CAST(g.i AS INT) AS pos, ve[g.i + 1] AS val
        FROM v, LATERAL (SELECT unnest(range(0, 64)) AS i) g
    )
    SELECT label, pos, round(AVG(val), 6) + 0.0 AS centroid_val,
           COUNT(*) AS n_vectors
    FROM p GROUP BY label, pos ORDER BY label, pos
    """,
)

register(
    "bigram_logprob_docs",
    text.bigram_logprob_docs,
    r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        FROM documents
    ), bg AS (
        SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
        FROM base, LATERAL (SELECT unnest(range(1, len(ws))) AS i) g
    ), c12 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1
    ), v AS (
        SELECT COUNT(DISTINCT t) AS v_sz
        FROM (SELECT unnest(ws) AS t FROM base)
    )
    SELECT bg.doc_id, COUNT(*) AS n_bigrams,
           round(AVG(ln((c12.c12 + 1.0) / (c1.c1 + v.v_sz))), 6) + 0.0
               AS avg_bigram_logprob
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY bg.doc_id ORDER BY bg.doc_id
    """,
)

register(
    "quantile_binning_orders",
    relational.quantile_binning_orders,
    f"""
    WITH q AS (
        SELECT quantile_cont(o_totalprice, 0.25) AS q1,
               quantile_cont(o_totalprice, 0.5) AS q2,
               quantile_cont(o_totalprice, 0.75) AS q3
        FROM orders
    )
    SELECT CASE WHEN o_totalprice <= q.q1 THEN 'q1'
                WHEN o_totalprice <= q.q2 THEN 'q2'
                WHEN o_totalprice <= q.q3 THEN 'q3'
                ELSE 'q4' END AS bin,
           COUNT(*) AS n_orders,
           {_MONEY_SUM.format(col="o_totalprice")} AS total_value,
           round(MIN(o_totalprice), 2) + 0.0 AS min_value,
           round(MAX(o_totalprice), 2) + 0.0 AS max_value
    FROM orders CROSS JOIN q
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "embedding_inertia",
    similarity.embedding_inertia,
    """
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve, label
        FROM embeddings
    ), p AS (
        SELECT vec_id, label, CAST(g.i AS INT) AS pos, ve[g.i + 1] AS val
        FROM v, LATERAL (SELECT unnest(range(0, 64)) AS i) g
    ), c AS (
        SELECT label, pos, AVG(val) AS cv FROM p GROUP BY label, pos
    ), d AS (
        SELECT p.vec_id, p.label,
               SUM((p.val - c.cv) * (p.val - c.cv)) AS dist2
        FROM p JOIN c ON p.label = c.label AND p.pos = c.pos
        GROUP BY p.vec_id, p.label
    )
    SELECT label, COUNT(*) AS n_vectors,
           round(AVG(dist2), 6) + 0.0 AS avg_inertia
    FROM d GROUP BY label ORDER BY label
    """,
)

register(
    "nested_lineitems_roundtrip",
    relational.nested_lineitems_roundtrip,
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_orderkey) AS n_orders,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS items_value
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "dq_constraint_report",
    relational.dq_constraint_report,
    """
    WITH o AS (
        SELECT COUNT(*) AS n, COUNT(*) - COUNT(DISTINCT o_orderkey) AS uq,
               SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS pos
        FROM orders
    ), c AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS nn,
               SUM(CASE WHEN c_nationkey < 0 OR c_nationkey > 24
                        THEN 1 ELSE 0 END) AS nk
        FROM customer
    ), e AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN event_type NOT IN
                        ('click','view','purchase','signup','error')
                        THEN 1 ELSE 0 END) AS ket
        FROM events
    ), l AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN l_discount < 0 OR l_discount > 1
                        THEN 1 ELSE 0 END) AS disc
        FROM lineitem
    )
    SELECT * FROM (
        SELECT 'orders' AS table_name, 'unique_orderkey' AS constraint_name,
               n AS n_rows, CAST(uq AS BIGINT) AS n_violations, uq = 0 AS passed
        FROM o
        UNION ALL
        SELECT 'orders', 'positive_totalprice', n, CAST(pos AS BIGINT),
               pos = 0 FROM o
        UNION ALL
        SELECT 'customer', 'acctbal_not_null', n, CAST(nn AS BIGINT),
               nn = 0 FROM c
        UNION ALL
        SELECT 'customer', 'nationkey_in_range', n, CAST(nk AS BIGINT),
               nk = 0 FROM c
        UNION ALL
        SELECT 'events', 'known_event_type', n, CAST(ket AS BIGINT),
               ket = 0 FROM e
        UNION ALL
        SELECT 'lineitem', 'discount_in_unit_interval', n, CAST(disc AS BIGINT),
               disc = 0 FROM l
    ) ORDER BY table_name, constraint_name
    """,
)

# KMV estimates are hash-engine-specific: rows-only in the driver gate;
# pytest pins accuracy + set-algebra bounds vs exact counts.
register("kmv_set_ops", sketches.kmv_set_ops, None)

register(
    "corpus_curation_pipeline",
    text.corpus_curation_pipeline,
    r"""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), chunks AS (
        SELECT doc_id, CAST(g.i AS INT) AS chunk_pos,
               array_to_string(words[(g.i*10+1):(g.i*10+10)], ' ') AS chunk_text
        FROM base,
             LATERAL (SELECT unnest(range(0, CAST(ceil(len(words)/10.0)
                                                  AS BIGINT))) AS i) g
    ), ranked AS (
        SELECT doc_id, chunk_pos, chunk_text,
               row_number() OVER (PARTITION BY chunk_text
                                  ORDER BY doc_id, chunk_pos) AS rn
        FROM chunks
    ), deduped AS (
        SELECT doc_id,
               string_agg(chunk_text, ' ' ORDER BY chunk_pos) AS dedup_text
        FROM ranked WHERE rn = 1 GROUP BY doc_id
    ), gated AS (
        SELECT dd.doc_id, d.lang,
               len(regexp_split_to_array(trim(dd.dedup_text), '\s+')) AS n_tok
        FROM deduped dd JOIN documents d USING (doc_id)
        WHERE len(regexp_split_to_array(trim(dd.dedup_text), '\s+'))
              BETWEEN 10 AND 500
    ), cnt AS (
        SELECT lang, COUNT(*) AS n_lang FROM gated GROUP BY lang
    ), mn AS (SELECT MIN(n_lang) AS min_lang FROM cnt),
    kept AS (
        SELECT g.doc_id, g.lang, g.n_tok
        FROM gated g JOIN cnt USING (lang) CROSS JOIN mn
        WHERE (((g.doc_id % 2147483647) * 2654435761) % 2147483647 % 1000000) * cnt.n_lang
              < mn.min_lang * 1000000
    )
    SELECT lang,
           CASE WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 < 8 THEN 'train'
                WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 < 9 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM kept GROUP BY 1, 2 ORDER BY 1, 2
    """,
)

# The MG candidate pass guarantees candidates ⊇ tokens with freq > N/256;
# the verify pass recounts exactly, so the oracle is the plain top-20.
register(
    "heavy_hitters_tokens",
    sketches.heavy_hitters_tokens,
    rf"""
    SELECT term AS token, COUNT(*) AS n
    FROM (SELECT unnest({_TOKENS}) AS term FROM documents)
    GROUP BY term ORDER BY n DESC, token LIMIT 20
    """,
)

register(
    "interval_overlap_join",
    events.interval_overlap_join,
    """
    WITH spans AS (
        SELECT user_id, MIN(ts) AS s, MAX(ts) AS t FROM events GROUP BY 1
    ), days AS (
        SELECT user_id, s, t, CAST(g.d AS DATE) AS d
        FROM spans,
             LATERAL (SELECT unnest(generate_series(CAST(s AS DATE),
                                    CAST(t AS DATE), INTERVAL 1 DAY)) AS d) g
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, COUNT(*) AS n_users_overlapping
    FROM days
    WHERE s < CAST(d AS TIMESTAMP) + INTERVAL 4 HOUR
      AND CAST(d AS TIMESTAMP) + INTERVAL 2 HOUR < t
    GROUP BY d ORDER BY day
    """,
)

register(
    "time_decayed_user_value",
    events.time_decayed_user_value,
    """
    WITH h AS (SELECT MAX(ts) AS h FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           round(SUM(value * exp(-0.1 * date_diff('microsecond', ts, h.h)
                                  / 86400000000.0)),
                 4) + 0.0 AS decayed_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS exact_value
    FROM events CROSS JOIN h
    GROUP BY user_id ORDER BY user_id
    """,
)

register(
    "trigram_cosine_pairs",
    dedup.trigram_cosine_pairs,
    r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        FROM documents
    ), grams AS (
        SELECT doc_id, ws[g.i] || ' ' || ws[g.i+1] || ' ' || ws[g.i+2] AS gram
        FROM base, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) g
    ), cnt AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2
    ), nrm AS (
        SELECT doc_id, sqrt(SUM(c*c)) AS nrm FROM cnt GROUP BY 1
    ), dots AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.c*b.c) AS dot
        FROM cnt a JOIN cnt b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(dot / (na.nrm * nb.nrm), 6) + 0.0 AS cosine
    FROM dots JOIN nrm na ON doc_a = na.doc_id JOIN nrm nb ON doc_b = nb.doc_id
    WHERE dot / (na.nrm * nb.nrm) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)

register(
    "inter_arrival_stats",
    events.inter_arrival_stats,
    """
    WITH gaps AS (
        SELECT user_id,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                         ts) AS gap_us
        FROM events
    )
    SELECT user_id, COUNT(*) AS n_gaps,
           round(AVG(gap_us) / 1e6, 4) + 0.0 AS avg_gap_s,
           round(MIN(gap_us) / 1e6, 6) + 0.0 AS min_gap_s,
           round(MAX(gap_us) / 1e6, 6) + 0.0 AS max_gap_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)

# Streaming sliding windows share the batch query's oracle (AvailableNow
# over static input == batch), same policy as streaming_hourly_counts.
register(
    "streaming_sliding_counts",
    _stream_windows.streaming_sliding_counts,
    REGISTRY["events_sliding"][1],
)

# HLL++ estimates are engine-specific: rows-only; pytest pins the drained
# stream result EQUAL to the batch twin (hash sketches are order-free).
register(
    "streaming_hourly_approx_uniques",
    _stream_windows.streaming_hourly_approx_uniques,
    None,
)

# Byte-histogram embeddings are engine-internal: rows-only; pytest pins
# determinism + neighbor sanity.
register("multimodal_embedding_ann", _binary.multimodal_embedding_ann, None)

# byte-histogram SimHash: numpy projection matrix not expressible in
# DuckDB — rows-only; pytest pins determinism + planted-dup recall.
register("phash_near_dup_images", _binary.phash_near_dup_images, None)

# PQ codebooks/argmin not expressible in DuckDB — rows-only; pytest pins
# overlap vs exact cosine + determinism.
register("pq_ann_topk", similarity.pq_ann_topk, None)

# matrix inverse not expressible in SQL — rows-only; pytest pins
# determinism + finite nonnegative scores.
register("mahalanobis_outliers", similarity.mahalanobis_outliers, None)

register(
    "bm25_search",
    text.bm25_search,
    r"""
    WITH dl AS (
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents
        ) WHERE token IN ('scan', 'column', 'filter')
        GROUP BY 1, 2
    ),
    df_ AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id,
               round(CAST(SUM(CAST(round(
                   ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
                   * (tf * 2.2e0)
                   / (tf + 1.2e0 * (0.25e0 + 0.75e0
                       * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))),
                   9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS score,
               COUNT(*) AS n_terms_hit
        FROM tf
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN df_ ON tf.token = df_.token
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT rk, doc_id, score, n_terms_hit FROM (
        SELECT doc_id, score, n_terms_hit,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                    AS BIGINT) AS rk
        FROM scored
    ) WHERE rk <= 10 ORDER BY rk
    """,
)

register(
    "spend_percentile_ranks",
    relational.spend_percentile_ranks,
    f"""
    WITH spend AS (
        SELECT c.c_mktsegment, c.c_custkey,
               {_MONEY_SUM.format(col="o.o_totalprice")} AS spent
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, c.c_custkey
    ), ranked AS (
        SELECT c_mktsegment, c_custkey, spent,
               round(percent_rank() OVER (PARTITION BY c_mktsegment
                                          ORDER BY spent, c_custkey), 6) + 0.0
                   AS pct_rank,
               round(cume_dist() OVER (PARTITION BY c_mktsegment
                                       ORDER BY spent, c_custkey), 6) + 0.0
                   AS cume,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY spent DESC, c_custkey) AS top_rn
        FROM spend
    )
    SELECT c_mktsegment, c_custkey, spent, pct_rank, cume
    FROM ranked WHERE top_rn <= 5
    ORDER BY c_mktsegment, spent DESC, c_custkey
    """,
)

register(
    "revenue_trend_regression",
    relational.revenue_trend_regression,
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               {_MONEY_SUM.format(col="o_totalprice")} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT COUNT(*) AS n_days,
           round(regr_slope(revenue,
                 CAST(date_diff('day', DATE '1992-01-01', d) AS DOUBLE)), 4)
               + 0.0 AS slope,
           round(regr_intercept(revenue,
                 CAST(date_diff('day', DATE '1992-01-01', d) AS DOUBLE)), 2)
               + 0.0 AS intercept,
           round(regr_r2(revenue,
                 CAST(date_diff('day', DATE '1992-01-01', d) AS DOUBLE)), 6)
               + 0.0 AS r2
    FROM daily
    """,
)

register(
    "region_nation_list",
    relational.region_nation_list,
    """
    SELECT r.r_name, COUNT(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nation_csv
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)

register(
    "reservoir_sample_per_key",
    relational.reservoir_sample_per_key,
    """
    WITH h AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               ((o_orderkey % 2147483647) * 2654435761) % 2147483647 AS h
        FROM orders
    ), r AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_orderstatus ORDER BY h ASC, o_orderkey ASC
               ) AS rk
        FROM h
    )
    SELECT o_orderstatus, CAST(rk AS BIGINT) AS rk, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM r WHERE rk <= 3
    ORDER BY o_orderstatus, rk
    """,
)

register(
    "corr_matrix_lineitem",
    relational.corr_matrix_lineitem,
    """
    SELECT 'l_quantity~l_extendedprice' AS pair,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr FROM lineitem
    UNION ALL
    SELECT 'l_quantity~l_discount',
           round(corr(l_quantity, l_discount), 4) + 0.0 FROM lineitem
    UNION ALL
    SELECT 'l_quantity~l_tax',
           round(corr(l_quantity, l_tax), 4) + 0.0 FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice~l_discount',
           round(corr(l_extendedprice, l_discount), 4) + 0.0 FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice~l_tax',
           round(corr(l_extendedprice, l_tax), 4) + 0.0 FROM lineitem
    UNION ALL
    SELECT 'l_discount~l_tax',
           round(corr(l_discount, l_tax), 4) + 0.0 FROM lineitem
    ORDER BY pair
    """,
)

register(
    "chisq_priority_status",
    relational.chisq_priority_status,
    """
    WITH cells AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    ), en AS (
        SELECT n,
               SUM(n) OVER (PARTITION BY o_orderpriority) AS row_n,
               SUM(n) OVER (PARTITION BY o_orderstatus) AS col_n,
               SUM(n) OVER () AS total_n
        FROM cells
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           round(SUM(
               power(n - row_n * col_n / total_n, 2)
               / (row_n * col_n / total_n)
           ), 4) + 0.0 AS chi_square
    FROM en
    """,
)

register(
    "event_path_topk",
    events.event_path_topk,
    """
    WITH p AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
    FROM p WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY n DESC, from_type, to_type
    LIMIT 20
    """,
)

register("tdigest_quantiles_events", sketches.tdigest_quantiles_events, None)

register(
    "cooccurrence_pairs",
    events.cooccurrence_pairs,
    """
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b ON a.user_id = b.user_id
                          AND a.event_type < b.event_type
        GROUP BY 1, 2
    ), marg AS (
        SELECT event_type, COUNT(*) AS n_users FROM ut GROUP BY 1
    )
    SELECT type_a, type_b, n_both, ma.n_users AS n_a, mb.n_users AS n_b,
           round(n_both / (ma.n_users + mb.n_users - n_both), 4) + 0.0
               AS jaccard
    FROM pairs
    JOIN marg ma ON ma.event_type = type_a
    JOIN marg mb ON mb.event_type = type_b
    ORDER BY type_a, type_b
    """,
)

register(
    "incremental_mv_refresh",
    relational.incremental_mv_refresh,
    f"""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {_MONEY_SUM.format(col="o_totalprice")} AS revenue
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)

register(
    "zorder_curve_orders",
    relational.zorder_curve_orders,
    """
    WITH prepared AS (
        SELECT o_custkey % 256 AS xk,
               date_diff('day', DATE '1992-01-01',
                         CAST(o_orderdate AS DATE)) % 256 AS yk
        FROM orders
    ), zv AS (
        SELECT xk, yk, (((xk >> 0) & 1) << 0) + (((yk >> 0) & 1) << 1) + (((xk >> 1) & 1) << 2) + (((yk >> 1) & 1) << 3) + (((xk >> 2) & 1) << 4) + (((yk >> 2) & 1) << 5) + (((xk >> 3) & 1) << 6) + (((yk >> 3) & 1) << 7) + (((xk >> 4) & 1) << 8) + (((yk >> 4) & 1) << 9) + (((xk >> 5) & 1) << 10) + (((yk >> 5) & 1) << 11) + (((xk >> 6) & 1) << 12) + (((yk >> 6) & 1) << 13) + (((xk >> 7) & 1) << 14) + (((yk >> 7) & 1) << 15) AS z
        FROM prepared
    )
    SELECT CAST(z // 1024 AS BIGINT) AS z_bucket, COUNT(*) AS n,
           MIN(xk) AS x_min, MAX(xk) AS x_max,
           MIN(yk) AS y_min, MAX(yk) AS y_max
    FROM zv
    GROUP BY 1 ORDER BY 1
    """,
)

register("tdigest_by_event_type", sketches.tdigest_by_event_type, None)

register(
    "lateral_topn_per_status",
    relational.lateral_topn_per_status,
    """
    SELECT s.o_orderstatus, l.o_orderkey, l.price_cents
    FROM (SELECT DISTINCT o_orderstatus FROM orders) s,
    LATERAL (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM orders o
        WHERE o.o_orderstatus = s.o_orderstatus
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3
    ) l
    ORDER BY o_orderstatus, price_cents DESC, o_orderkey
    """,
)

register(
    "table_checksum_orders",
    relational.table_checksum_orders,
    """
    WITH h AS (
        SELECT o_orderstatus,
               (((o_orderkey % 2147483647) * 2654435761) % 2147483647
                + (CAST(round(o_totalprice * 100) AS BIGINT) * 40503)
                  % 2147483647) % 2147483647 AS h
        FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(h) % 2147483647 AS BIGINT) AS checksum
    FROM h GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)

register(
    "events_hourly_unique_users",
    events.events_hourly_unique_users,
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "first_touch_attribution",
    events.first_touch_attribution,
    """
    WITH base AS (
        SELECT user_id, event_id, event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
               CASE WHEN event_type <> 'purchase' THEN
                   lpad(CAST(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                             AS VARCHAR), 12, '0')
                   || ':' || lpad(CAST(event_id AS VARCHAR), 10, '0')
                   || ':' || event_type
               END AS touch_tag
        FROM events
    ), attributed AS (
        SELECT event_type,
               MIN(touch_tag) OVER (
                   PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING
               ) AS ft
        FROM base
    )
    SELECT CASE WHEN ft IS NULL THEN '(none)'
                ELSE split_part(ft, ':', 3) END AS first_touch_type,
           COUNT(*) AS n_purchases
    FROM attributed WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "ohlc_hourly_value",
    events.ohlc_hourly_value,
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           arg_min(value, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                          * 1000000 + event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                          * 1000000 + event_id) AS close,
           COUNT(*) AS n
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "activity_streaks",
    events.activity_streaks,
    """
    WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx
        FROM events
    ), islands AS (
        SELECT user_id, day_idx,
               day_idx - ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day_idx
               ) AS island
        FROM days
    ), streaks AS (
        SELECT user_id, island, COUNT(*) AS len
        FROM islands GROUP BY 1, 2
    )
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           MAX(len) AS longest_streak, COUNT(*) AS n_streaks
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
)

register(
    "hard_negative_mining",
    similarity.hard_negative_mining,
    _VEC_CTE
    + """
    , q AS (SELECT vec_id AS query_id, label AS query_label, ve AS qv
            FROM v WHERE vec_id < 10),
    scored AS (
        SELECT query_id, query_label, vec_id AS neg_id, label AS neg_label,
               round(list_dot_product(qv, ve)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(ve, ve))),
                     6) AS sim
        FROM v CROSS JOIN q
        WHERE label != query_label
    )
    SELECT query_id, query_label, neg_id, neg_label, sim, rk FROM (
        SELECT query_id, query_label, neg_id, neg_label, sim,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neg_id) AS INTEGER
               ) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)

register(
    "source_mixture_weights",
    text.source_mixture_weights,
    f"""
    WITH per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKENS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), powered AS (
        SELECT *, power(CAST(n_tokens AS DOUBLE), 0.5) AS p FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           round(p / SUM(p) OVER (), 6) + 0.0 AS mix_weight
    FROM powered ORDER BY source
    """,
)

register(
    "tokenizer_fertility_by_lang",
    text.tokenizer_fertility_by_lang,
    f"""
    WITH per_doc AS (
        SELECT lang, CAST(length(text) AS BIGINT) AS n_chars,
               len({_TOKENS}) AS n_tokens
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 4) + 0.0
               AS chars_per_token,
           round(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) + 0.0
               AS tokens_per_doc
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)

register("int8_quantized_topk", similarity.int8_quantized_topk, None)

register(
    "hourly_value_bands",
    events.hourly_value_bands,
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           COUNT(*) AS n,
           round(percentile_cont(0.1) WITHIN GROUP (ORDER BY value), 4)
               + 0.0 AS p10,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 4)
               + 0.0 AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 4)
               + 0.0 AS p90
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "pareto_customers",
    relational.pareto_customers,
    """
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders GROUP BY o_custkey
    ), tot AS (SELECT SUM(rev_cents) AS total_cents FROM per_cust),
    ranked AS (
        SELECT o_custkey, rev_cents,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY rev_cents DESC, o_custkey) AS BIGINT) AS rk,
               CAST(SUM(rev_cents) OVER (
                   ORDER BY rev_cents DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / (SELECT total_cents FROM tot) AS cum_share
        FROM per_cust
    )
    SELECT COUNT(*) AS n_customers,
           MIN(CASE WHEN cum_share >= 0.5 THEN rk END) AS n_for_50pct,
           MIN(CASE WHEN cum_share >= 0.8 THEN rk END) AS n_for_80pct,
           MIN(CASE WHEN cum_share >= 0.95 THEN rk END) AS n_for_95pct
    FROM ranked
    """,
)

register(
    "referential_integrity_audit",
    relational.referential_integrity_audit,
    """
    SELECT 'customer->nation' AS fk_edge,
           (SELECT COUNT(*) FROM customer
            WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
               AS n_orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    ORDER BY fk_edge
    """,
)

register(
    "error_proximity_counts",
    events.error_proximity_counts,
    """
    WITH base AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        FROM events
    ), counted AS (
        SELECT event_type,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
                   PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 300 PRECEDING AND 300 FOLLOWING
               ) AS n_nearby_errors
        FROM base
    )
    SELECT CAST(n_nearby_errors AS BIGINT) AS n_nearby_errors,
           COUNT(*) AS n_purchases
    FROM counted WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)

register(
    "weighted_median_doc_length",
    text.weighted_median_doc_length,
    f"""
    WITH per_doc AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               len({_TOKENS}) AS wt
        FROM documents
    ), tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS total_wt FROM per_doc),
    cum AS (
        SELECT n_chars, doc_id,
               CAST(SUM(wt) OVER (
                   ORDER BY n_chars, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_wt,
               (SELECT total_wt FROM tot) AS total_wt
        FROM per_doc
    )
    SELECT n_chars AS weighted_median_chars,
           cum_wt AS tokens_at_or_below,
           total_wt AS total_tokens
    FROM cum WHERE cum_wt * 2 >= total_wt
    ORDER BY n_chars, doc_id LIMIT 1
    """,
)

register(
    "user_event_entropy",
    events.user_event_entropy,
    """
    WITH per_type AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    ), per_user AS (
        SELECT user_id,
               CAST(SUM(c) AS BIGINT) AS n_events,
               COUNT(*) AS n_types,
               SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sum_clog
        FROM per_type GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           round(log2(CAST(n_events AS DOUBLE)) - sum_clog / n_events, 4)
               + 0.0 AS entropy_bits
    FROM per_user
    ORDER BY entropy_bits DESC, user_id LIMIT 20
    """,
)

register(
    "hour_of_day_profile",
    events.hour_of_day_profile,
    """
    WITH cells AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
               COUNT(*) AS n,
               SUM(value) AS sum_value
        FROM events GROUP BY event_type, 2
    )
    SELECT event_type, hod, n,
           round(sum_value / n, 4) + 0.0 AS avg_value,
           round((sum_value / n) /
                 (SUM(sum_value) OVER (PARTITION BY event_type)
                  / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)),
                 4) + 0.0 AS lift
    FROM cells ORDER BY event_type, hod
    """,
)

register(
    "time_to_purchase_latency",
    events.time_to_purchase_latency,
    """
    WITH per_user AS (
        SELECT user_id,
               MIN(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)) AS first_sec,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                   END) AS first_purchase_sec
        FROM events GROUP BY user_id
    ), lat AS (
        SELECT first_purchase_sec - first_sec AS latency_sec
        FROM per_user WHERE first_purchase_sec IS NOT NULL
    )
    SELECT COUNT(*) AS n_users,
           MIN(latency_sec) AS min_sec,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY latency_sec), 4)
               + 0.0 AS p25_sec,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY latency_sec), 4)
               + 0.0 AS p50_sec,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY latency_sec), 4)
               + 0.0 AS p90_sec,
           MAX(latency_sec) AS max_sec
    FROM lat
    """,
)

register(
    "gini_revenue_customers",
    relational.gini_revenue_customers,
    """
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_cents
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT rev_cents,
               CAST(ROW_NUMBER() OVER (ORDER BY rev_cents, o_custkey)
                    AS BIGINT) AS rk
        FROM per_cust
    ), agg AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(rev_cents AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(rk * rev_cents AS DECIMAL(38,0))) AS DOUBLE) AS six
        FROM ranked
    )
    SELECT n AS n_customers,
           round((2.0 * six - (n + 1.0) * sx) / (n * sx), 6) + 0.0 AS gini
    FROM agg
    """,
)

register(
    "skyline_parts",
    relational.skyline_parts,
    """
    SELECT p_partkey, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE (b.p_retailprice < a.p_retailprice AND b.p_size >= a.p_size)
           OR (b.p_retailprice <= a.p_retailprice AND b.p_size > a.p_size)
    )
    ORDER BY p_retailprice, p_partkey
    """,
)

register(
    "brand_price_means",
    relational.brand_price_means,
    """
    SELECT p_brand, COUNT(*) AS n_parts,
           round(SUM(p_retailprice) / COUNT(*), 4) + 0.0 AS mean_price,
           round(exp(SUM(ln(p_retailprice)) / COUNT(*)), 4) + 0.0
               AS geo_mean_price,
           round(COUNT(*) / SUM(1.0 / p_retailprice), 4) + 0.0
               AS harm_mean_price
    FROM part GROUP BY p_brand ORDER BY p_brand
    """,
)

register(
    "token_entropy_by_lang",
    text.token_entropy_by_lang,
    f"""
    WITH tok AS (
        SELECT lang, doc_id, unnest({_TOKENS}) AS token FROM documents
    ), cnt AS (
        SELECT lang, doc_id, token, COUNT(*) AS c
        FROM tok GROUP BY lang, doc_id, token
    ), per_doc AS (
        SELECT lang, doc_id,
               CAST(SUM(c) AS BIGINT) AS n,
               COUNT(*) AS n_distinct,
               SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sclog
        FROM cnt GROUP BY lang, doc_id
    )
    SELECT lang, COUNT(*) AS n_docs,
           round(AVG(log2(CAST(n AS DOUBLE)) - sclog / n), 4) + 0.0
               AS avg_entropy_bits,
           round(AVG(CAST(n_distinct AS DOUBLE) / n), 4) + 0.0 AS avg_ttr
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)

register(
    "order_revenue_reconciliation",
    relational.order_revenue_reconciliation,
    """
    WITH per_order AS (
        SELECT l_orderkey,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS line_cents
        FROM lineitem GROUP BY l_orderkey
    ), classified AS (
        SELECT CASE
                 WHEN line_cents IS NULL THEN 'missing_lines'
                 WHEN line_cents = CAST(round(o_totalprice * 100) AS BIGINT)
                     THEN 'matched'
                 ELSE 'mismatched'
               END AS status,
               COALESCE(abs(CAST(round(o_totalprice * 100) AS BIGINT)
                            - line_cents), 0) AS abs_diff_cents
        FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
    )
    SELECT status, COUNT(*) AS n_orders,
           CAST(SUM(CAST(abs_diff_cents AS DECIMAL(38,0))) AS DOUBLE)
               AS total_abs_diff_cents
    FROM classified GROUP BY status ORDER BY status
    """,
)

register(
    "rolling_weekly_active_users",
    events.rolling_weekly_active_users,
    """
    WITH presence AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), bounds AS (SELECT MAX(day) AS max_day FROM presence),
    contrib AS (
        SELECT user_id, day + CAST(o.off AS INT) AS wday
        FROM presence, (SELECT unnest(generate_series(0, 6)) AS off) o
        WHERE day + CAST(o.off AS INT) <= (SELECT max_day FROM bounds)
    ), wau AS (
        SELECT wday AS day, COUNT(DISTINCT user_id) AS wau
        FROM contrib GROUP BY wday
    ), dau AS (
        SELECT day, COUNT(DISTINCT user_id) AS dau
        FROM presence GROUP BY day
    )
    SELECT strftime(wau.day, '%Y-%m-%d') AS day,
           COALESCE(dau.dau, 0) AS dau,
           wau.wau,
           round(CAST(COALESCE(dau.dau, 0) AS DOUBLE) / wau.wau, 4) + 0.0
               AS stickiness
    FROM wau LEFT JOIN dau ON wau.day = dau.day
    ORDER BY day
    """,
)

register(
    "user_feature_store",
    events.user_feature_store,
    """
    WITH base AS (
        SELECT user_id, event_id, event_type, value,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
               CAST(ts AS DATE) AS day
        FROM events
    ), sess AS (
        SELECT *,
               CASE WHEN sec - LAG(sec) OVER (
                        PARTITION BY user_id ORDER BY sec, event_id
                    ) <= 1800 THEN 0 ELSE 1 END AS new_sess
        FROM base
    ), per_user AS (
        SELECT user_id,
               COUNT(*) AS n_events,
               COUNT(DISTINCT day) AS days_active,
               CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
               MIN(sec) AS first_sec,
               MAX(sec) AS last_sec,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS purchase_cents
        FROM sess GROUP BY user_id
    ), per_type AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM base GROUP BY user_id, event_type
    ), ent AS (
        SELECT user_id, COUNT(*) AS n_types,
               SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS sum_clog
        FROM per_type GROUP BY user_id
    ), horizon AS (SELECT MAX(sec) AS horizon_sec FROM base)
    SELECT p.user_id, p.n_events, p.days_active, p.n_sessions, e.n_types,
           p.purchase_cents,
           round(log2(CAST(p.n_events AS DOUBLE)) - e.sum_clog / p.n_events, 4)
               + 0.0 AS entropy_bits,
           round(CASE WHEN p.n_events > 1 THEN
                     CAST(p.last_sec - p.first_sec AS DOUBLE)
                     / (p.n_events - 1) END, 2) + 0.0 AS mean_gap_sec,
           CAST(floor((h.horizon_sec - p.last_sec) / 86400.0) AS BIGINT)
               AS recency_days
    FROM per_user p JOIN ent e USING (user_id), horizon h
    ORDER BY p.user_id
    """,
)

register(
    "association_rules_brands",
    relational.association_rules_brands,
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ), n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
    counts AS (SELECT brand, COUNT(*) AS cnt FROM items GROUP BY brand),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS pair_orders
        FROM items a JOIN items b
          ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT brand_a, brand_b, pair_orders,
           round(CAST(pair_orders AS DOUBLE) / n.n_orders, 6) + 0.0 AS support,
           round(CAST(pair_orders AS DOUBLE) / ca.cnt, 6) + 0.0 AS confidence,
           round(CAST(pair_orders AS DOUBLE) * n.n_orders
                 / (CAST(ca.cnt AS DOUBLE) * cb.cnt), 6) + 0.0 AS lift
    FROM pairs
    JOIN counts ca ON ca.brand = pairs.brand_a
    JOIN counts cb ON cb.brand = pairs.brand_b
    CROSS JOIN n
    ORDER BY lift DESC, brand_a ASC, brand_b ASC
    LIMIT 20
    """,
)

register(
    "acf_daily_revenue",
    relational.acf_daily_revenue,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   AS rev
        FROM orders GROUP BY day
    ), series AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx, rev
        FROM daily
    ), moments AS (SELECT AVG(rev) AS mean_rev FROM series),
    lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT) AS lag),
    num AS (
        SELECT lag,
               SUM((a.rev - m.mean_rev) * (b.rev - m.mean_rev)) AS num
        FROM series a CROSS JOIN lags
        JOIN series b ON a.idx = b.idx + lag
        CROSS JOIN moments m
        GROUP BY lag
    ), den AS (
        SELECT SUM((rev - m.mean_rev) * (rev - m.mean_rev)) AS den
        FROM series CROSS JOIN moments m
    )
    SELECT lag, round(num / den.den, 4) + 0.0 AS acf
    FROM num CROSS JOIN den ORDER BY lag
    """,
)

register(
    "target_encoding_segment",
    relational.target_encoding_segment,
    """
    WITH joined AS (
        SELECT c_mktsegment,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), g AS (
        SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS global_mean
        FROM joined
    ), per_seg AS (
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM joined GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n_orders,
           round(CAST(sum_cents AS DOUBLE) / 100.0 / n_orders, 4) + 0.0
               AS raw_mean,
           round((CAST(sum_cents AS DOUBLE) / 100.0 + 20.0 * global_mean)
                 / (n_orders + 20.0), 4) + 0.0 AS encoded
    FROM per_seg CROSS JOIN g
    ORDER BY c_mktsegment
    """,
)

register(
    "gdpr_delete_propagation",
    relational.gdpr_delete_propagation,
    """
    WITH erased_c AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
    ), erased_o AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM erased_c)
    ), lvl AS (
        SELECT 'customer' AS entity,
               (SELECT COUNT(*) FROM erased_c) AS n_deleted,
               (SELECT COUNT(*) FROM customer)
                   - (SELECT COUNT(*) FROM erased_c) AS n_retained
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM erased_o),
               (SELECT COUNT(*) FROM orders)
                   - (SELECT COUNT(*) FROM erased_o)
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM erased_o)),
               (SELECT COUNT(*) FROM lineitem)
                   - (SELECT COUNT(*) FROM lineitem
                      WHERE l_orderkey IN (SELECT o_orderkey FROM erased_o))
    )
    SELECT entity, CAST(n_deleted AS BIGINT) AS n_deleted,
           CAST(n_retained AS BIGINT) AS n_retained
    FROM lvl ORDER BY entity
    """,
)

register(
    "calibration_bins_orders",
    relational.calibration_bins_orders,
    """
    WITH moments AS (
        -- exact decimal cent moments mirror the Spark side (never
        -- accumulation-order-dependent AVG/STDDEV_POP over doubles)
        SELECT COUNT(*) AS n,
               SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(28,0))) AS s1c,
               SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        * CAST(round(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38,0))) AS s2c
        FROM orders
    ), stats AS (
        SELECT CAST(s1c AS DOUBLE) / n / 100.0 AS mu,
               sqrt(greatest(CAST(s2c AS DOUBLE) / n / 10000.0
                     - (CAST(s1c AS DOUBLE) / n / 100.0)
                       * (CAST(s1c AS DOUBLE) / n / 100.0), 0.0)) AS sigma
        FROM moments
    ), scored AS (
        SELECT 1.0 / (1.0 + exp(-(CASE WHEN sigma > 0.0
                   THEN (o_totalprice - mu) / sigma ELSE 0.0 END))) AS score,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS outcome
        FROM orders CROSS JOIN stats
    )
    SELECT CAST(least(9, floor(score * 10)) AS BIGINT) AS bin,
           COUNT(*) AS n,
           round(AVG(score), 4) + 0.0 AS avg_score,
           round(AVG(CAST(outcome AS DOUBLE)), 4) + 0.0 AS event_rate
    FROM scored GROUP BY bin ORDER BY bin
    """,
)

register(
    "asof_forward_tolerance",
    events.asof_forward_tolerance,
    """
    WITH tagged AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ts AS TIMESTAMP) END AS p_ts
        FROM events WHERE event_type IN ('click', 'purchase')
    ), with_next AS (
        SELECT *,
               LAST_VALUE(p_ts IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS next_purchase_ts
        FROM tagged
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
           COALESCE(CASE WHEN epoch(next_purchase_ts) - epoch(ts) <= 3600.0
                THEN strftime(next_purchase_ts, '%Y-%m-%d %H:%M:%S.%f') END,
                '') AS purchase_ts,
           COALESCE(CASE WHEN epoch(next_purchase_ts) - epoch(ts) <= 3600.0
                THEN round(epoch(next_purchase_ts) - epoch(ts), 6) END,
                -1.0) AS latency_sec
    FROM with_next WHERE event_type = 'click'
    """,
)

register(
    "sequential_pair_mining",
    events.sequential_pair_mining,
    """
    WITH base AS (
        SELECT user_id, CAST(ts AS DATE) AS day, event_type,
               epoch(CAST(ts AS TIMESTAMP)) AS sec
        FROM events
    ), spans AS (
        SELECT user_id, day, event_type,
               MIN(sec) AS min_sec, MAX(sec) AS max_sec
        FROM base GROUP BY user_id, day, event_type
    ), n AS (
        SELECT COUNT(*) AS n_days
        FROM (SELECT DISTINCT user_id, day FROM spans)
    ), pairs AS (
        SELECT a.event_type AS antecedent, b.event_type AS consequent,
               COUNT(*) AS n_user_days
        FROM spans a JOIN spans b
          ON a.user_id = b.user_id AND a.day = b.day
         AND a.event_type <> b.event_type AND a.min_sec < b.max_sec
        GROUP BY a.event_type, b.event_type
    )
    SELECT antecedent, consequent, n_user_days,
           round(CAST(n_user_days AS DOUBLE) / n.n_days, 6) + 0.0 AS support
    FROM pairs CROSS JOIN n
    ORDER BY antecedent, consequent
    """,
)

register(
    "bitmap_distinct_users",
    events.bitmap_distinct_users,
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)

register(
    "quantile_align_sources",
    text.quantile_align_sources,
    """
    WITH ranked AS (
        SELECT source, n_chars,
               CAST(least(19, floor(PERCENT_RANK() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id) * 20))
                   AS BIGINT) AS ventile,
               CAST(least(19, floor(PERCENT_RANK() OVER (
                   ORDER BY n_chars, doc_id) * 20)) AS BIGINT) AS gventile
        FROM documents
    ), g AS (
        SELECT gventile AS ventile,
               round(AVG(CAST(n_chars AS DOUBLE)), 4) + 0.0
                   AS global_mean_chars
        FROM ranked GROUP BY gventile
    ), per_src AS (
        SELECT source, ventile, COUNT(*) AS n_docs,
               round(AVG(CAST(n_chars AS DOUBLE)), 4) + 0.0 AS mean_chars
        FROM ranked GROUP BY source, ventile
    )
    SELECT source, per_src.ventile, n_docs, mean_chars, global_mean_chars,
           round(mean_chars - global_mean_chars, 4) + 0.0 AS delta
    FROM per_src JOIN g ON per_src.ventile = g.ventile
    ORDER BY source, per_src.ventile
    """,
)

register(
    "embedding_dim_stats",
    similarity.embedding_dim_stats,
    """
    WITH exploded AS (
        -- series bound derives from the actual vector length so a fixture
        -- dim change fails loudly instead of counting NULL cells
        SELECT CAST(t.ord - 1 AS BIGINT) AS dim,
               CAST(embedding[CAST(t.ord AS INT)] AS DOUBLE) AS v
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS ord) t
    ), agg AS (
        SELECT dim, COUNT(*) AS n,
               SUM(CAST(v AS DECIMAL(28,10))) AS s1,
               SUM(CAST(v * v AS DECIMAL(28,10))) AS s2,
               MIN(v) AS mn, MAX(v) AS mx
        FROM exploded GROUP BY dim
    )
    SELECT dim, n,
           round(CAST(s1 AS DOUBLE) / n, 6) + 0.0 AS mean_val,
           round(sqrt(greatest(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                 0.0)), 6) + 0.0 AS std_val,
           round(mn, 6) + 0.0 AS min_val,
           round(mx, 6) + 0.0 AS max_val
    FROM agg ORDER BY dim
    """,
)

register(
    "ts_features_daily",
    relational.ts_features_daily,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM orders GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(CAST(rev_cents AS DOUBLE) / 100.0, 2) + 0.0 AS revenue,
           round(COALESCE(CAST(LAG(rev_cents, 1) OVER (ORDER BY day)
                 AS DOUBLE) / 100.0, -1.0), 2) + 0.0 AS lag1,
           round(COALESCE(CAST(LAG(rev_cents, 7) OVER (ORDER BY day)
                 AS DOUBLE) / 100.0, -1.0), 2) + 0.0 AS lag7,
           round(AVG(CAST(rev_cents AS DOUBLE)) OVER (
                 ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
                 / 100.0, 4) + 0.0 AS ma28,
           round(COALESCE(
                 CAST(rev_cents - LAG(rev_cents, 1) OVER (ORDER BY day)
                      AS DOUBLE)
                 / CAST(LAG(rev_cents, 1) OVER (ORDER BY day) AS DOUBLE),
                 0.0), 6) + 0.0 AS pct_change
    FROM daily ORDER BY day
    """,
)

register(
    "seasonal_decompose_daily",
    relational.seasonal_decompose_daily,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS rev
        FROM orders GROUP BY day
    ), witht AS (
        SELECT day, rev,
               AVG(rev) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
               datediff('day', DATE '1995-01-01', day) % 7 AS dow
        FROM daily
    ), detr AS (
        SELECT *, rev - trend AS detrended FROM witht
    ), seas AS (
        SELECT dow, AVG(detrended) AS seasonal FROM detr GROUP BY dow
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(rev, 2) + 0.0 AS revenue,
           round(trend, 4) + 0.0 AS trend,
           round(seasonal, 4) + 0.0 AS seasonal,
           round(detrended - seasonal, 4) + 0.0 AS residual
    FROM detr JOIN seas USING (dow)
    ORDER BY day
    """,
)

register(
    "neyman_allocation",
    relational.neyman_allocation,
    """
    WITH base AS (
        SELECT c_mktsegment, CAST(round(c_acctbal * 100) AS BIGINT) AS cb
        FROM customer
    ), per AS (
        SELECT c_mktsegment, COUNT(*) AS n_h,
               SUM(CAST(cb AS DECIMAL(28,0))) AS s1,
               SUM(CAST(cb * cb AS DECIMAL(38,0))) AS s2
        FROM base GROUP BY c_mktsegment
    ), withsd AS (
        SELECT c_mktsegment, n_h,
               sqrt(greatest(CAST(s2 AS DOUBLE) / n_h
                    - (CAST(s1 AS DOUBLE) / n_h) * (CAST(s1 AS DOUBLE) / n_h),
                    0.0)) / 100.0 AS s_h
        FROM per
    ), tot AS (SELECT SUM(n_h * s_h) AS tot_w FROM withsd)
    SELECT c_mktsegment, n_h,
           round(s_h, 4) + 0.0 AS s_h,
           CAST(CASE WHEN tot.tot_w > 0.0
                THEN round(1000.0 * n_h * s_h / tot.tot_w)
                ELSE 0.0 END AS BIGINT) AS alloc
    FROM withsd CROSS JOIN tot
    ORDER BY c_mktsegment
    """,
)

register(
    "bpe_merge_step",
    text.bpe_merge_step,
    """
    WITH words AS (
        SELECT w, COUNT(*) AS cnt
        FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        )
        WHERE length(w) >= 2
        GROUP BY w
    ), pairs AS (
        -- positions derive from each word's own length (no silent cap;
        -- mirrors Spark's sequence(1, length-1) exactly)
        SELECT substr(w, CAST(i AS INT), 2) AS pair, cnt
        FROM words,
             LATERAL (SELECT unnest(generate_series(1, length(w) - 1)) AS i) g
    )
    SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair ASC
    LIMIT 20
    """,
)

register(
    "lateness_audit_events",
    events.lateness_audit_events,
    """
    WITH base AS (
        SELECT user_id, event_id, epoch(CAST(ts AS TIMESTAMP)) AS sec
        FROM events
    ), late AS (
        SELECT MAX(sec) OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - sec AS lateness_sec
        FROM base
    ), total AS (SELECT COUNT(*) AS n_total FROM late),
    deltas AS (SELECT CAST(unnest([0, 60, 300, 1800, 3600]) AS BIGINT)
                   AS delta_sec)
    SELECT delta_sec,
           CAST(SUM(CASE WHEN lateness_sec > delta_sec THEN 1 ELSE 0 END)
               AS BIGINT) AS n_late,
           round(CAST(SUM(CASE WHEN lateness_sec > delta_sec THEN 1 ELSE 0
                END) AS DOUBLE) / MAX(total.n_total), 6) + 0.0 AS frac_late
    FROM late CROSS JOIN deltas CROSS JOIN total
    GROUP BY delta_sec
    ORDER BY delta_sec
    """,
)

register(
    "l_diversity_audit",
    relational.l_diversity_audit,
    """
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS class_size,
               COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                   AS n_sensitive
        FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment, COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           CAST(SUM(CASE WHEN n_sensitive < 3 THEN class_size ELSE 0 END)
               AS BIGINT) AS exposed_individuals
    FROM classes GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)

register(
    "curriculum_stages",
    text.curriculum_stages,
    """
    WITH ranked AS (
        SELECT lang, n_chars,
               PERCENT_RANK() OVER (ORDER BY n_chars, doc_id) AS pr
        FROM documents
    ), staged AS (
        SELECT lang, n_chars,
               CASE WHEN pr < 1.0/3 THEN '1_easy'
                    WHEN pr < 2.0/3 THEN '2_medium'
                    ELSE '3_hard' END AS stage
        FROM ranked
    ), total AS (SELECT COUNT(*) AS n_total FROM staged)
    SELECT stage, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           round(AVG(CAST(n_chars AS DOUBLE)), 2) + 0.0 AS mean_chars,
           round(CAST(COUNT(*) AS DOUBLE) / MAX(total.n_total), 6) + 0.0
               AS corpus_share
    FROM staged CROSS JOIN total
    GROUP BY stage, lang ORDER BY stage, lang
    """,
)

register(
    "conversion_rate_bayes",
    events.conversion_rate_bayes,
    """
    WITH per_user AS (
        SELECT user_id,
               CASE WHEN ((user_id % 2147483647) * 2654435761) % 2147483647 % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS bucket,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM events GROUP BY user_id
    ), per_bucket AS (
        SELECT bucket, COUNT(*) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS converters
        FROM per_user GROUP BY bucket
    )
    SELECT bucket, n_users, converters,
           round(CAST(converters AS DOUBLE) / n_users, 6) + 0.0 AS raw_rate,
           round((converters + 0.5) / (n_users + 1.0), 6) + 0.0 AS post_mean,
           round(sqrt((converters + 0.5) * (n_users - converters + 0.5)
                 / ((n_users + 1.0) * (n_users + 1.0) * (n_users + 2.0))),
                 6) + 0.0 AS post_sd
    FROM per_bucket ORDER BY bucket
    """,
)

register(
    "bfs_hops_copurchase",
    relational.bfs_hops_copurchase,
    """
    WITH RECURSIVE po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
        SELECT a.p AS pa, b.p AS pb
        FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ), edges AS (
        SELECT pa AS src, pb AS dst FROM pairs
        UNION ALL
        SELECT pb AS src, pa AS dst FROM pairs
    ), walk AS (
        SELECT src AS node, 0 AS hops
        FROM (SELECT DISTINCT src FROM edges)
        WHERE src % 1000 = 0
        UNION
        SELECT e.dst AS node, w.hops + 1 AS hops
        FROM walk w JOIN edges e ON w.node = e.src
        WHERE w.hops < 3
    ), best AS (
        SELECT node, MIN(hops) AS hops FROM walk GROUP BY node
    )
    SELECT CAST(hops AS BIGINT) AS hops, COUNT(*) AS n_nodes
    FROM best GROUP BY hops ORDER BY hops
    """,
)

register(
    "audience_overlap_jaccard",
    events.audience_overlap_jaccard,
    """
    WITH aud AS (
        SELECT DISTINCT event_type, user_id FROM events
    ), sizes AS (
        SELECT event_type, COUNT(*) AS n FROM aud GROUP BY event_type
    ), inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_common
        FROM aud a JOIN aud b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6)
               + 0.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = inter.type_a
    JOIN sizes sb ON sb.event_type = inter.type_b
    ORDER BY type_a, type_b
    """,
)

register(
    "max_drawdown_daily",
    relational.max_drawdown_daily,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS rev
        FROM orders GROUP BY day
    ), dd AS (
        SELECT day, rev,
               MAX(rev) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(rev, 2) + 0.0 AS revenue,
           round(peak, 2) + 0.0 AS peak,
           round((peak - rev) / peak, 6) + 0.0 AS drawdown_pct
    FROM dd
    ORDER BY (peak - rev) / peak DESC, day ASC
    LIMIT 10
    """,
)

register(
    "haversine_nearest_supplier",
    relational.haversine_nearest_supplier,
    """
    WITH c AS (
        SELECT c_custkey, c_nationkey,
               radians((((c_custkey % 2147483647) * 2654435761) % 2147483647 % 18000)
                   / 100.0 - 90.0) AS c_lat,
               radians((((c_custkey % 2147483647) * 2246822519) % 2147483647 % 36000)
                   / 100.0 - 180.0) AS c_lon
        FROM customer WHERE c_custkey <= 100
    ), s AS (
        SELECT s_suppkey, s_nationkey,
               radians((((s_suppkey % 2147483647) * 2654435761) % 2147483647 % 18000)
                   / 100.0 - 90.0) AS s_lat,
               radians((((s_suppkey % 2147483647) * 2246822519) % 2147483647 % 36000)
                   / 100.0 - 180.0) AS s_lon
        FROM supplier
    ), scored AS (
        SELECT c_custkey, s_suppkey,
               2.0 * 6371.0 * asin(sqrt(
                   pow(sin((s_lat - c_lat) / 2), 2)
                   + cos(c_lat) * cos(s_lat)
                     * pow(sin((s_lon - c_lon) / 2), 2))) AS dist_km
        FROM c JOIN s ON c_nationkey = s_nationkey
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                   ORDER BY dist_km ASC, s_suppkey ASC) AS rk
        FROM scored
    )
    SELECT c_custkey, s_suppkey, round(dist_km, 2) + 0.0 AS dist_km
    FROM ranked WHERE rk = 1 ORDER BY c_custkey
    """,
)

register(
    "bootstrap_ci_revenue",
    relational.bootstrap_ci_revenue,
    """
    WITH reps AS (SELECT unnest(generate_series(0, 99)) AS b),
    weighted AS (
        SELECT b,
               CASE
                 WHEN u < 0.36787944117144233 THEN 0
                 WHEN u < 0.7357588823428847 THEN 1
                 WHEN u < 0.9196986029286058 THEN 2
                 WHEN u < 0.9810118431238462 THEN 3
                 WHEN u < 0.9963401531726563 THEN 4
                 ELSE 5 END AS w,
               cts
        FROM (
            SELECT b,
                   CAST((((o_orderkey % 2147483647) * 31 + b) % 2147483647)
                        * 2654435761 % 2147483647 AS DOUBLE) / 2147483647 AS u,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cts
            FROM orders CROSS JOIN reps
        )
    ), per_rep AS (
        SELECT b, rep_mean FROM (
            SELECT b,
                   CASE WHEN SUM(CAST(w AS BIGINT)) > 0 THEN
                       round(CAST(SUM(CAST(w AS BIGINT) * cts) AS DOUBLE)
                             / SUM(CAST(w AS BIGINT)) / 100.0, 6)
                   END AS rep_mean
            FROM weighted GROUP BY b
        ) WHERE rep_mean IS NOT NULL
    ), ranked AS (
        SELECT rep_mean, b,
               ROW_NUMBER() OVER (ORDER BY rep_mean ASC, b ASC) AS rk
        FROM per_rep
    ), point AS (
        SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 100.0 AS point_mean
        FROM orders
    ), stats AS (
        SELECT COUNT(*) AS n_replicates,
               MIN(CASE WHEN rk = 3 THEN rep_mean END) AS ci_low,
               MIN(CASE WHEN rk = 98 THEN rep_mean END) AS ci_high,
               SUM(CAST(rep_mean AS DECIMAL(18,6))) AS s1,
               SUM(CAST(rep_mean * rep_mean AS DECIMAL(28,10))) AS s2
        FROM ranked
    )
    SELECT n_replicates,
           round(point_mean, 4) + 0.0 AS point_mean,
           round(sqrt(greatest(CAST(s2 AS DOUBLE) / n_replicates
                 - (CAST(s1 AS DOUBLE) / n_replicates)
                   * (CAST(s1 AS DOUBLE) / n_replicates), 0.0)), 4) + 0.0
               AS boot_se,
           round(ci_low, 4) + 0.0 AS ci_low,
           round(ci_high, 4) + 0.0 AS ci_high
    FROM stats CROSS JOIN point
    """,
)

register(
    "streaming_anomaly_windows",
    _stream_windows.streaming_anomaly_windows,
    """
    WITH cents AS (
        SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
               CAST(round(value * 100) AS BIGINT) AS cv
        FROM events
    ), base AS (
        SELECT event_type,
               CAST(SUM(CAST(cv AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*)
                   / 100.0 AS base_mean,
               sqrt(greatest(
                   CAST(SUM(CAST(cv * cv AS DECIMAL(38,0))) AS DOUBLE)
                       / COUNT(*)
                   - (CAST(SUM(CAST(cv AS DECIMAL(28,0))) AS DOUBLE)
                      / COUNT(*))
                     * (CAST(SUM(CAST(cv AS DECIMAL(28,0))) AS DOUBLE)
                        / COUNT(*)),
                   0.0)) / 100.0 AS base_std
        FROM cents GROUP BY event_type
    ), win AS (
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts),
                   '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type, COUNT(*) AS n_events,
               CAST(SUM(cv) AS BIGINT) AS win_cents
        FROM cents GROUP BY 1, 2
    )
    SELECT window_start, win.event_type, n_events,
           CAST(CAST(round(CAST(win_cents AS DOUBLE) * 100.0 / n_events)
                    AS BIGINT) AS DOUBLE) / 10000.0 AS win_mean,
           CAST(CASE WHEN abs(CAST(win_cents AS DOUBLE) / n_events / 100.0
                        - base_mean)
                     > 2.0 * base_std / sqrt(CAST(n_events AS DOUBLE))
                THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM win JOIN base ON win.event_type = base.event_type
    """,
)

register(
    "twap_daily_value",
    events.twap_daily_value,
    """
    WITH base AS (
        SELECT CAST(ts AS DATE) AS day,
               epoch(CAST(ts AS TIMESTAMP)) AS sec, event_id,
               CAST(round(value * 100) AS BIGINT) AS cv
        FROM events
    ), weighted AS (
        SELECT day, cv,
               CAST(floor(COALESCE(
                   LEAD(sec) OVER (PARTITION BY day ORDER BY sec, event_id),
                   epoch(CAST(day AS TIMESTAMP)) + 86400.0) - sec)
               AS BIGINT) AS w_sec
        FROM base
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           COUNT(*) AS n_events,
           round(CASE WHEN SUM(w_sec) > 0
                 THEN CAST(SUM(w_sec * cv) AS DOUBLE) / SUM(w_sec) / 100.0
                 ELSE 0.0 END, 4) + 0.0 AS twap_value
    FROM weighted GROUP BY day ORDER BY day
    """,
)

register(
    "sla_attainment_report",
    relational.sla_attainment_report,
    """
    WITH first_ship AS (
        SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
        FROM lineitem GROUP BY l_orderkey
    ), j AS (
        SELECT o_orderpriority, o_orderkey,
               datediff('day', CAST(o_orderdate AS DATE), first_ship) AS days
        FROM orders JOIN first_ship ON o_orderkey = l_orderkey
    ), ranked AS (
        SELECT o_orderpriority, days,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY days, o_orderkey) AS rk,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM j
    )
    SELECT o_orderpriority,
           MAX(n) AS n_orders,
           round(CAST(SUM(CASE WHEN days <= 30 THEN 1 ELSE 0 END) AS DOUBLE)
                 / MAX(n), 6) + 0.0 AS on_time_frac,
           CAST(MAX(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT)
                THEN days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT)
                THEN days END) AS BIGINT) AS p90_days
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)

register(
    "degree_distribution_copurchase",
    relational.degree_distribution_copurchase,
    """
    WITH po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
        SELECT a.p AS pa, b.p AS pb
        FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    ), sym AS (
        SELECT pa AS node, pb AS nbr FROM pairs
        UNION ALL
        SELECT pb AS node, pa AS nbr FROM pairs
    ), deg AS (
        SELECT node, COUNT(*) AS deg FROM sym GROUP BY node
    )
    SELECT CAST(floor(log2(CAST(deg AS DOUBLE))) AS BIGINT)
               AS log2_deg_bucket,
           COUNT(*) AS n_nodes,
           CAST(MIN(deg) AS BIGINT) AS min_deg,
           CAST(MAX(deg) AS BIGINT) AS max_deg
    FROM deg GROUP BY log2_deg_bucket ORDER BY log2_deg_bucket
    """,
)

register(
    "sentence_stats_by_lang",
    text.sentence_stats_by_lang,
    r"""
    WITH per_doc AS (
        SELECT lang,
               len(list_filter(string_split_regex(text, '[.!?]+'),
                   s -> length(trim(s)) > 0)) AS n_sents,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_sents) AS BIGINT) AS total_sents,
           round(CAST(SUM(n_tok) AS DOUBLE) / SUM(n_sents), 4) + 0.0
               AS mean_tokens_per_sent,
           round(AVG(CAST(n_sents AS DOUBLE)), 4) + 0.0 AS mean_sents_per_doc
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
)

register(
    "collocations_pmi",
    text.collocations_pmi,
    r"""
    WITH base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        FROM documents
    ), bg AS (
        SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
        FROM base, LATERAL (SELECT unnest(range(1, len(ws))) AS i) g
    ), n AS (SELECT COUNT(*) AS n_total FROM bg),
    c12 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    c2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY 1)
    SELECT c12.w1, c12.w2, c12,
           round(log2(CAST(n.n_total AS DOUBLE) * c12
                 / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 6) + 0.0 AS pmi
    FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
    WHERE c12 >= 5
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
)

register(
    "span_corruption_plan",
    text.span_corruption_plan,
    r"""
    WITH tok AS (
        SELECT doc_id, g.i - 1 AS pos
        FROM (SELECT doc_id,
                     len(regexp_split_to_array(trim(text), '\s+')) AS n
              FROM documents) t,
             LATERAL (SELECT unnest(range(1, n + 1)) AS i) g
    ), flagged AS (
        SELECT doc_id, pos,
               CASE WHEN ((doc_id % 2147483647) * 2654435761
                          + pos * 2246822519) % 2147483647 % 100 < 5
                    THEN 1 ELSE 0 END AS is_start
        FROM tok
    ), covered AS (
        SELECT doc_id, is_start,
               MAX(is_start) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS is_masked
        FROM flagged
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(is_start) AS BIGINT) AS n_spans,
           CAST(SUM(is_masked) AS BIGINT) AS n_masked,
           round(CAST(SUM(is_masked) AS DOUBLE) / COUNT(*), 6) + 0.0
               AS mask_ratio
    FROM covered GROUP BY doc_id ORDER BY doc_id
    """,
)

register(
    "negative_sampling_weights",
    text.negative_sampling_weights,
    r"""
    WITH freq AS (
        SELECT t AS term, COUNT(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
              FROM documents)
        GROUP BY t
    ), pw AS (
        SELECT term, cnt,
               sqrt(sqrt(CAST(cnt AS DOUBLE) * cnt * cnt)) AS p
        FROM freq
    ), tot AS (SELECT SUM(CAST(p AS DECIMAL(28,8))) AS tot FROM pw),
    top AS (
        SELECT term, cnt, p / CAST(tot.tot AS DOUBLE) AS weight_raw
        FROM pw CROSS JOIN tot
        ORDER BY cnt DESC, term ASC LIMIT 20
    )
    SELECT term, cnt,
           round(weight_raw, 8) + 0.0 AS weight,
           round(SUM(weight_raw) OVER (ORDER BY cnt DESC, term ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 8) + 0.0
               AS cum_weight
    FROM top ORDER BY cnt DESC, term ASC
    """,
)

register(
    "rbo_rank_compare",
    relational.rbo_rank_compare,
    """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT o_custkey,
               greatest(
                   ROW_NUMBER() OVER (ORDER BY rev_cents DESC, o_custkey ASC),
                   ROW_NUMBER() OVER (ORDER BY n_orders DESC, o_custkey ASC)
               ) AS m
        FROM per_cust
    ), kept AS (SELECT o_custkey, m FROM ranked WHERE m <= 50),
    depths AS (SELECT CAST(unnest(generate_series(1, 50)) AS INT) AS d),
    olap AS (
        SELECT d, COUNT(o_custkey) AS overlap
        FROM depths LEFT JOIN kept ON kept.m <= depths.d
        GROUP BY d
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS depth,
           round(0.5 * CAST(SUM(CAST(
               pow(2.0, -CAST(d - 1 AS DOUBLE)) * overlap / d
               AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0 AS rbo,
           CAST(MAX(CASE WHEN d = 50 THEN overlap END) AS BIGINT)
               AS overlap_at_50
    FROM olap
    """,
)

register(
    "epoch_shuffle_plan",
    text.epoch_shuffle_plan,
    """
    WITH epochs AS (SELECT CAST(unnest(generate_series(0, 2)) AS BIGINT)
                        AS epoch),
    keyed AS (
        SELECT epoch, doc_id,
               ((doc_id % 2147483647) * 2654435761 + epoch * 97)
                   % 2147483647 AS shuffle_key
        FROM documents CROSS JOIN epochs
    ), ranked AS (
        SELECT epoch, doc_id, shuffle_key,
               CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                   ORDER BY shuffle_key, doc_id) AS BIGINT) AS rank_in_epoch
        FROM keyed
    )
    SELECT epoch, rank_in_epoch, doc_id, shuffle_key
    FROM ranked WHERE rank_in_epoch <= 10
    ORDER BY epoch, rank_in_epoch
    """,
)

register(
    "ngram_novelty_curve",
    text.ngram_novelty_curve,
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 4
    ), sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(ws[g.i:g.i+3], ' ') AS shingle
        FROM toks, LATERAL (SELECT unnest(range(1, len(ws) - 2)) AS i) g
    ), first AS (
        SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    ), per_doc AS (
        SELECT sh.doc_id, COUNT(*) AS n_shingles,
               SUM(CASE WHEN first.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                   AS n_novel
        FROM sh JOIN first USING (shingle)
        GROUP BY sh.doc_id
    )
    SELECT CAST(doc_id // 50 AS BIGINT) * 50 AS doc_bucket,
           COUNT(*) AS n_docs,
           round(SUM(CAST(n_novel AS DOUBLE)) / SUM(n_shingles), 6) + 0.0
               AS novelty
    FROM per_doc GROUP BY doc_bucket ORDER BY doc_bucket
    """,
)

register(
    "fd_histogram_prices",
    relational.fd_histogram_prices,
    """
    WITH base AS (
        SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS cts, p_partkey
        FROM part
    ), ranked AS (
        SELECT cts,
               ROW_NUMBER() OVER (ORDER BY cts, p_partkey) AS rk,
               COUNT(*) OVER () AS n
        FROM base
    ), quart AS (
        SELECT MAX(CASE WHEN rk = CAST(ceil(n * 0.25) AS BIGINT)
                   THEN cts END) AS q1,
               MAX(CASE WHEN rk = CAST(ceil(n * 0.75) AS BIGINT)
                   THEN cts END) AS q3,
               MAX(n) AS n
        FROM ranked
    ), width AS (
        SELECT greatest(1, CAST(round(2.0 * (q3 - q1)
               / cbrt(CAST(n AS DOUBLE))) AS BIGINT)) AS width_cents
        FROM quart
    )
    SELECT CAST((cts // width_cents) * width_cents AS DOUBLE) / 100.0
               AS bin_low,
           CAST(width_cents AS BIGINT) AS width_cents,
           COUNT(*) AS n_parts
    FROM base CROSS JOIN width
    GROUP BY 1, 2 ORDER BY bin_low
    """,
)

register(
    "price_volume_decomposition",
    relational.price_volume_decomposition,
    """
    WITH base AS (
        SELECT p_brand, CAST(strftime(o_orderdate, '%Y') AS INT) AS y,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS rev_cents,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE CAST(strftime(o_orderdate, '%Y') AS INT) IN (1996, 1997)
        GROUP BY p_brand, y
    ), y96 AS (
        SELECT p_brand, rev_cents AS rev96, qty AS qty96
        FROM base WHERE y = 1996
    ), y97 AS (
        SELECT p_brand, rev_cents AS rev97, qty AS qty97
        FROM base WHERE y = 1997
    )
    SELECT p_brand,
           round(CAST(rev97 - rev96 AS DOUBLE) / 100.0, 2) + 0.0
               AS delta_revenue,
           round(CAST(qty97 - qty96 AS DOUBLE)
                 * (CAST(rev96 AS DOUBLE) / qty96) / 100.0, 2) + 0.0
               AS volume_effect,
           round((CAST(rev97 AS DOUBLE) / qty97
                  - CAST(rev96 AS DOUBLE) / qty96) * qty96 / 100.0, 2) + 0.0
               AS price_effect,
           round((CAST(rev97 AS DOUBLE) / qty97
                  - CAST(rev96 AS DOUBLE) / qty96)
                 * CAST(qty97 - qty96 AS DOUBLE) / 100.0, 2) + 0.0
               AS interaction
    FROM y96 JOIN y97 USING (p_brand)
    ORDER BY p_brand
    """,
)

register(
    "golden_record_docs",
    dedup.golden_record_docs,
    """
    WITH keyed AS (
        SELECT md5(substr(text, 1, 80)) AS ckey, doc_id, source, n_chars
        FROM documents
    ), src_counts AS (
        SELECT ckey, source, COUNT(*) AS c FROM keyed GROUP BY ckey, source
    ), best_src AS (
        SELECT ckey, source AS golden_source
        FROM (
            SELECT ckey, source,
                   ROW_NUMBER() OVER (PARTITION BY ckey
                       ORDER BY c DESC, source ASC) AS rk
            FROM src_counts
        ) WHERE rk = 1
    ), merged AS (
        SELECT ckey, COUNT(*) AS n_members,
               MIN(doc_id) AS golden_doc_id,
               CAST(MAX(n_chars) AS BIGINT) AS golden_n_chars
        FROM keyed GROUP BY ckey
    )
    SELECT ckey, n_members, golden_doc_id, golden_source, golden_n_chars
    FROM merged JOIN best_src USING (ckey)
    WHERE n_members >= 2
    ORDER BY golden_doc_id
    """,
)

register(
    "langid_confusion_metrics",
    text.langid_confusion_metrics,
    f"""
    WITH t AS (
        SELECT lang,
               len(list_filter({_TOKENS}, x -> x IN ('the','a','of','and','to','in'))) AS en_hits,
               len(list_filter({_TOKENS}, x -> x IN ('el','la','de','y','en','que'))) AS es_hits,
               len(list_filter({_TOKENS}, x -> x IN ('le','la','de','et','un','une'))) AS fr_hits
        FROM documents
    ), scored AS (
        SELECT lang,
               CASE WHEN en_hits > es_hits AND en_hits > fr_hits THEN 'en'
                    WHEN es_hits > en_hits AND es_hits > fr_hits THEN 'es'
                    WHEN fr_hits > en_hits AND fr_hits > es_hits THEN 'fr'
                    ELSE 'und' END AS pred_lang
        FROM t
    ), per_true AS (
        SELECT lang, COUNT(*) AS support,
               SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS tp
        FROM scored GROUP BY lang
    ), per_pred AS (
        SELECT pred_lang AS lang, COUNT(*) AS n_pred
        FROM scored GROUP BY pred_lang
    ), j AS (
        SELECT per_true.lang, support, tp, COALESCE(n_pred, 0) AS n_pred
        FROM per_true LEFT JOIN per_pred USING (lang)
    )
    SELECT lang, support, CAST(tp AS BIGINT) AS tp, n_pred,
           round(CASE WHEN n_pred > 0
                 THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END, 6) + 0.0
               AS precision,
           round(CAST(tp AS DOUBLE) / support, 6) + 0.0 AS recall,
           round(CASE WHEN (CASE WHEN n_pred > 0
                            THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END
                          + CAST(tp AS DOUBLE) / support) > 0
                 THEN 2.0 * (CASE WHEN n_pred > 0
                             THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END)
                      * (CAST(tp AS DOUBLE) / support)
                      / ((CASE WHEN n_pred > 0
                          THEN CAST(tp AS DOUBLE) / n_pred ELSE 0.0 END)
                         + CAST(tp AS DOUBLE) / support)
                 ELSE 0.0 END, 6) + 0.0 AS f1
    FROM j ORDER BY lang
    """,
)

register(
    "spearman_rank_corr",
    relational.spearman_rank_corr,
    """
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_cents,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev_cents DESC,
                       o_custkey ASC)
                  - ROW_NUMBER() OVER (ORDER BY n_orders DESC,
                       o_custkey ASC) AS BIGINT) AS d
        FROM per_cust
    )
    SELECT COUNT(*) AS n_customers,
           CAST(SUM(d * d) AS BIGINT) AS sum_d2,
           round(CASE WHEN COUNT(*) > 1 THEN
                 1.0 - 6.0 * CAST(SUM(d * d) AS DOUBLE)
                 / (CAST(COUNT(*) AS DOUBLE)
                    * (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1.0))
                 ELSE 0.0 END, 6) + 0.0
               AS spearman_rho
    FROM ranked
    """,
)

# ---------------------------------------------------------------------------
# Round-3 additions: corpus dependence/fit diagnostics, batching economics,
# exact-substring span dedup, DP release, MMR diversification.
# ---------------------------------------------------------------------------

register(
    "mutual_information_lang_source",
    text.mutual_information_lang_source,
    """
    WITH joint AS (
        SELECT lang, source, COUNT(*) AS n_ls FROM documents GROUP BY 1, 2
    ), ml AS (
        SELECT lang, CAST(SUM(n_ls) AS BIGINT) AS n_l FROM joint GROUP BY 1
    ), ms AS (
        SELECT source, CAST(SUM(n_ls) AS BIGINT) AS n_s FROM joint GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_ls) AS BIGINT) AS n FROM joint
    ), mi AS (
        SELECT CAST(SUM(CAST(round(
                   (CAST(n_ls AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln((CAST(n_ls AS DOUBLE) / CAST(n AS DOUBLE))
                        / ((CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)))), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS mi,
               MIN(n) AS n_docs
        FROM joint JOIN ml USING (lang) JOIN ms USING (source) CROSS JOIN tot
    ), hl AS (
        SELECT CAST(SUM(CAST(round(
                   -(CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(n_l AS DOUBLE) / CAST(n AS DOUBLE)), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS h_lang
        FROM ml CROSS JOIN tot
    ), hs AS (
        SELECT CAST(SUM(CAST(round(
                   -(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS h_source
        FROM ms CROSS JOIN tot
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           round(mi, 6) + 0.0 AS mi_nats,
           round(h_lang, 6) + 0.0 AS h_lang,
           round(h_source, 6) + 0.0 AS h_source,
           round(CASE WHEN h_lang > 0 AND h_source > 0
                 THEN mi / sqrt(h_lang * h_source) ELSE 0.0 END, 6) + 0.0 AS nmi
    FROM mi CROSS JOIN hl CROSS JOIN hs
    """,
)

register(
    "zipf_fit_tokens",
    text.zipf_fit_tokens,
    rf"""
    WITH tok AS (
        SELECT unnest({_TOKENS}) AS token FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
    ), top AS (
        SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
        FROM (
            SELECT freq,
                   ROW_NUMBER() OVER (ORDER BY freq DESC, token ASC) AS rank
            FROM counts
        ) WHERE rank <= 500
    ), m AS (
        SELECT COUNT(*) AS n_points,
               CAST(SUM(CAST(round(x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(round(y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(round(x * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(round(y * y, 12) AS DECIMAL(28,12))) AS DOUBLE) AS syy
        FROM top
    )
    SELECT n_points,
           round((CAST(n_points AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n_points AS DOUBLE) * sxx - sx * sx), 4) + 0.0
               AS zipf_slope,
           round((sy - ((CAST(n_points AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n_points AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n_points AS DOUBLE), 4) + 0.0 AS zipf_intercept,
           round(((CAST(n_points AS DOUBLE) * sxy - sx * sy)
                  * (CAST(n_points AS DOUBLE) * sxy - sx * sy))
                 / ((CAST(n_points AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n_points AS DOUBLE) * syy - sy * sy)), 4) + 0.0 AS r2
    FROM m
    """,
)

register(
    "vocab_coverage_curve",
    text.vocab_coverage_curve,
    rf"""
    WITH tok AS (
        SELECT lang, unnest({_TOKENS}) AS token FROM documents
    ), counts AS (
        SELECT lang, token, COUNT(*) AS freq FROM tok GROUP BY 1, 2
    ), ranked AS (
        SELECT lang, freq,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY freq DESC, token ASC) AS rk
        FROM counts
    )
    SELECT lang,
           COUNT(*) AS n_types,
           CAST(SUM(freq) AS BIGINT) AS n_occurrences,
           round(CAST(SUM(CASE WHEN rk <= 10 THEN freq ELSE 0 END) AS DOUBLE)
                 / SUM(freq), 6) + 0.0 AS cov_top10,
           round(CAST(SUM(CASE WHEN rk <= 100 THEN freq ELSE 0 END) AS DOUBLE)
                 / SUM(freq), 6) + 0.0 AS cov_top100,
           round(CAST(SUM(CASE WHEN rk <= 1000 THEN freq ELSE 0 END) AS DOUBLE)
                 / SUM(freq), 6) + 0.0 AS cov_top1000
    FROM ranked GROUP BY lang ORDER BY lang
    """,
)

register(
    "length_bucket_padding",
    text.length_bucket_padding,
    rf"""
    WITH lens AS (
        SELECT doc_id, len({_TOKENS}) AS n_tok FROM documents
    ), g AS (
        SELECT n_tok,
               CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / 16.0)
                    AS BIGINT) AS batch
        FROM lens
    ), gb AS (
        SELECT batch, COUNT(*) AS bsz, MAX(n_tok) AS mx, SUM(n_tok) AS toks
        FROM g GROUP BY 1
    ), gres AS (
        SELECT 'global_by_id' AS strategy, COUNT(*) AS n_batches,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(mx * bsz - toks) AS BIGINT) AS pad_tokens
        FROM gb
    ), b AS (
        SELECT doc_id, n_tok,
               ntile(8) OVER (ORDER BY n_tok ASC, doc_id ASC) AS bucket
        FROM lens
    ), b2 AS (
        SELECT bucket, n_tok,
               CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY bucket
                               ORDER BY n_tok ASC, doc_id ASC) - 1) / 16.0)
                    AS BIGINT) AS batch
        FROM b
    ), bb AS (
        SELECT bucket, batch, COUNT(*) AS bsz, MAX(n_tok) AS mx,
               SUM(n_tok) AS toks
        FROM b2 GROUP BY 1, 2
    ), bres AS (
        SELECT 'bucketed_by_length' AS strategy, COUNT(*) AS n_batches,
               CAST(SUM(toks) AS BIGINT) AS total_tokens,
               CAST(SUM(mx * bsz - toks) AS BIGINT) AS pad_tokens
        FROM bb
    )
    SELECT strategy, n_batches, total_tokens, pad_tokens,
           round(CAST(pad_tokens AS DOUBLE)
                 / (total_tokens + pad_tokens), 6) + 0.0 AS pad_frac
    FROM (SELECT * FROM gres UNION ALL SELECT * FROM bres)
    ORDER BY strategy
    """,
)

register(
    "duplicated_span_islands",
    text.duplicated_span_islands,
    rf"""
    WITH toks AS (
        SELECT doc_id, source, {_TOKENS} AS ts FROM documents
        WHERE len({_TOKENS}) >= 8
    ), grams AS (
        SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
               array_to_string(ts[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')
                   AS gram
        FROM toks,
             LATERAL (SELECT unnest(generate_series(1, len(ts) - 7)) AS i) g
    ), dup_grams AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING MIN(doc_id) <> MAX(doc_id)
    ), dup_pos AS (
        SELECT doc_id, source, pos FROM grams JOIN dup_grams USING (gram)
    ), islands AS (
        SELECT doc_id, source,
               MAX(pos) - MIN(pos) + 8 AS span_len
        FROM (
            SELECT doc_id, source, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS grp
            FROM dup_pos
        ) GROUP BY doc_id, source, grp
    ), per_doc AS (
        SELECT doc_id, source, COUNT(*) AS n_islands,
               MAX(span_len) AS longest_span,
               SUM(span_len) AS dup_token_mass
        FROM islands GROUP BY 1, 2
    ), nd AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
    )
    SELECT per_doc.source, n_docs,
           COUNT(*) AS docs_with_dup_spans,
           CAST(SUM(n_islands) AS BIGINT) AS n_islands,
           CAST(MAX(longest_span) AS BIGINT) AS max_span_tokens,
           CAST(SUM(dup_token_mass) AS BIGINT) AS dup_token_mass,
           round(CAST(COUNT(*) AS DOUBLE) / n_docs, 6) + 0.0 AS affected_frac
    FROM per_doc JOIN nd ON per_doc.source = nd.source
    GROUP BY per_doc.source, n_docs
    ORDER BY per_doc.source
    """,
)

register(
    "dp_noisy_counts",
    relational.dp_noisy_counts,
    """
    WITH c AS (
        SELECT c_mktsegment, COUNT(*) AS n_exact FROM customer GROUP BY 1
    ), u AS (
        SELECT c_mktsegment, n_exact,
               CAST(CAST(CONCAT('0x', substr(md5(c_mktsegment), 1, 7))
                    AS BIGINT) AS DOUBLE) / 268435456.0 AS u
        FROM c
    )
    SELECT c_mktsegment, n_exact,
           round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 4) + 0.0
               AS laplace_noise,
           round(n_exact + (-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 4)
               + 0.0 AS n_released
    FROM u ORDER BY c_mktsegment
    """,
)

# MMR is iterative (greedy argmax over a growing selected set) — not
# SQL-expressible; rows-only + the numpy-oracle pytest in
# tests/test_pipeline_operators.py.
register("mmr_diverse_topk", similarity.mmr_diverse_topk, None)

register(
    "conformal_prediction_interval",
    relational.conformal_prediction_interval,
    """
    WITH o AS (
        SELECT c_mktsegment, o_totalprice,
               ((o_orderkey % 2147483647) * 2654435761 % 2147483647) % 5 = 0
                   AS is_cal
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), model AS (
        SELECT c_mktsegment, COUNT(*) AS n_train,
               CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) / 100.0
                   AS seg_mean
        FROM o WHERE NOT is_cal GROUP BY 1
    ), cal AS (
        SELECT o.c_mktsegment, n_train, seg_mean,
               abs(o_totalprice - seg_mean) AS resid
        FROM o JOIN model ON o.c_mktsegment = model.c_mktsegment
        WHERE is_cal
    )
    SELECT c_mktsegment, n_train, COUNT(*) AS n_cal,
           round(seg_mean, 4) + 0.0 AS seg_mean,
           round(quantile_cont(resid, 0.9), 4) + 0.0 AS conformal_radius,
           round(seg_mean - quantile_cont(resid, 0.9), 4) + 0.0 AS pi_lo,
           round(seg_mean + quantile_cont(resid, 0.9), 4) + 0.0 AS pi_hi
    FROM cal GROUP BY c_mktsegment, n_train, seg_mean
    ORDER BY c_mktsegment
    """,
)

register(
    "group_kfold_assign",
    relational.group_kfold_assign,
    """
    WITH tot AS (SELECT COUNT(*) AS n_total FROM events)
    SELECT CAST(((user_id % 2147483647) * 2654435761 % 2147483647) % 5
                AS BIGINT) AS fold,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           round(CAST(COUNT(*) AS DOUBLE) / MIN(n_total), 6) + 0.0
               AS event_share
    FROM events CROSS JOIN tot
    GROUP BY 1 ORDER BY 1
    """,
)

# Procrustes needs a 64x64 SVD — not SQL-expressible; rows-only + pytest
# (orthogonality + exact-recovery residual pins).
register(
    "procrustes_align_embeddings", similarity.procrustes_align_embeddings, None
)

register(
    "preference_pairs_by_quality",
    text.preference_pairs_by_quality,
    rf"""
    WITH lens AS (
        SELECT lang, doc_id, len({_TOKENS}) AS n_tok FROM documents
    ), best AS (
        SELECT lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY n_tok DESC, doc_id ASC) AS pair_rank,
               doc_id AS chosen_doc, n_tok AS chosen_tokens
        FROM lens QUALIFY pair_rank <= 10
    ), worst AS (
        SELECT lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY n_tok ASC, doc_id ASC) AS pair_rank,
               doc_id AS rejected_doc, n_tok AS rejected_tokens
        FROM lens QUALIFY pair_rank <= 10
    )
    SELECT lang, pair_rank, chosen_doc, chosen_tokens,
           rejected_doc, rejected_tokens,
           chosen_tokens - rejected_tokens AS token_gap
    FROM best JOIN worst USING (lang, pair_rank)
    WHERE chosen_doc <> rejected_doc AND chosen_tokens > rejected_tokens
    ORDER BY lang, pair_rank
    """,
)

register(
    "grid_spatial_join",
    relational.grid_spatial_join,
    """
    WITH c AS (
        SELECT c_custkey,
               (((c_custkey % 2147483647) * 2654435761) % 2147483647 % 18000)
                   / 100.0 - 90.0 AS c_lat,
               (((c_custkey % 2147483647) * 2246822519) % 2147483647 % 36000)
                   / 100.0 - 180.0 AS c_lon
        FROM customer WHERE c_custkey <= 300
    ), s AS (
        SELECT s_suppkey,
               (((s_suppkey % 2147483647) * 2654435761) % 2147483647 % 18000)
                   / 100.0 - 90.0 AS s_lat,
               (((s_suppkey % 2147483647) * 2246822519) % 2147483647 % 36000)
                   / 100.0 - 180.0 AS s_lon
        FROM supplier
    ), s_cells AS (
        SELECT *,
               CAST(round((s_lon + 180.0) * 100) AS BIGINT) // 500 AS cx,
               CAST(round((s_lat + 90.0) * 100) AS BIGINT) // 500 AS cy
        FROM s
    ), ck AS (
        SELECT *,
               least(CAST(ceil(500.0 / (111.045
                     * greatest(cos(radians(c_lat)), 1e-6) * 5.0))
                     AS BIGINT), 36) AS kx
        FROM c
    ), c_cells AS (
        SELECT c_custkey, c_lat, c_lon,
               ((CAST(round((c_lon + 180.0) * 100) AS BIGINT) // 500
                   + dxs.dx) % 72 + 72) % 72 AS cx,
               CAST(round((c_lat + 90.0) * 100) AS BIGINT) // 500
                   + dys.dy AS cy
        FROM ck,
             LATERAL (SELECT unnest(generate_series(-kx, kx)) AS dx) dxs,
             (SELECT unnest([-1, 0, 1]) AS dy) dys
    ), pairs AS (
        SELECT DISTINCT c_custkey, s_suppkey, c_lat, c_lon, s_lat, s_lon
        FROM c_cells JOIN s_cells USING (cx, cy)
    )
    SELECT c_custkey, s_suppkey, round(dist_km, 2) + 0.0 AS dist_km
    FROM (
        SELECT c_custkey, s_suppkey,
               2.0 * 6371.0 * asin(sqrt(
                   pow(sin((radians(s_lat) - radians(c_lat)) / 2), 2)
                   + cos(radians(c_lat)) * cos(radians(s_lat))
                     * pow(sin((radians(s_lon) - radians(c_lon)) / 2), 2)))
                   AS dist_km
        FROM pairs
    )
    WHERE dist_km <= 500.0
    ORDER BY c_custkey, s_suppkey
    """,
)

register(
    "t_closeness_audit",
    relational.t_closeness_audit,
    """
    WITH binned AS (
        SELECT c_mktsegment, c_nationkey,
               ntile(10) OVER (ORDER BY c_acctbal ASC, c_custkey ASC)
                   AS decile
        FROM customer
    ), per_class AS (
        SELECT c_mktsegment, c_nationkey, decile, COUNT(*) AS n
        FROM binned GROUP BY 1, 2, 3
    ), class_tot AS (
        SELECT c_mktsegment, c_nationkey, CAST(SUM(n) AS BIGINT) AS class_n
        FROM per_class GROUP BY 1, 2
    ), gdist AS (
        SELECT decile, COUNT(*) AS gn FROM binned GROUP BY 1
    ), gtot AS (SELECT CAST(SUM(gn) AS BIGINT) AS g_total FROM gdist),
    cells AS (
        SELECT ct.c_mktsegment, ct.c_nationkey, g.decile, ct.class_n,
               CAST(COALESCE(pc.n, 0) AS DOUBLE) / ct.class_n AS q,
               CAST(g.gn AS DOUBLE) / gt.g_total AS p
        FROM class_tot ct
        CROSS JOIN gdist g CROSS JOIN gtot gt
        LEFT JOIN per_class pc
          ON pc.c_mktsegment = ct.c_mktsegment
         AND pc.c_nationkey = ct.c_nationkey
         AND pc.decile = g.decile
    ), cum AS (
        SELECT c_mktsegment, c_nationkey, class_n,
               abs(SUM(q - p) OVER (PARTITION BY c_mktsegment, c_nationkey
                    ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS cum_diff
        FROM cells
    ), per_class_emd AS (
        SELECT c_mktsegment, c_nationkey, class_n,
               round(SUM(cum_diff) / 9, 6) + 0.0 AS emd
        FROM cum GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_classes,
           round(MAX(emd), 6) + 0.0 AS max_emd,
           CAST(SUM(CASE WHEN emd > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
               AS classes_violating_t,
           CAST(SUM(CASE WHEN emd > 0.2 THEN class_n ELSE 0 END) AS BIGINT)
               AS individuals_in_violating
    FROM per_class_emd GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)

register(
    "streaming_topk_trending",
    _stream_windows.streaming_topk_trending,
    """
    WITH win AS (
        SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS w_start,
               event_type, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ), lagged AS (
        SELECT w_start, event_type, n_events,
               LAG(n_events) OVER (PARTITION BY event_type
                                   ORDER BY w_start) AS prev_n
        FROM win
    ), scored AS (
        SELECT *, CAST(round(n_events * 10000.0 / prev_n) AS BIGINT)
                  / 10000.0 + 0.0 AS ratio
        FROM lagged
        WHERE prev_n IS NOT NULL AND n_events >= 10
    ), trending AS (
        SELECT * FROM scored WHERE ratio >= 1.5
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           rk, event_type, n_events, prev_n, ratio
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY w_start
                    ORDER BY ratio DESC, event_type ASC) AS rk
        FROM trending
    ) WHERE rk <= 3 ORDER BY window_start, rk
    """,
)

register(
    "colbert_maxsim_labels",
    similarity.colbert_maxsim_labels,
    _VEC_CTE
    + """
    , q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < 4),
    scored AS (
        SELECT query_id, CAST(label AS INT) AS label,
               list_dot_product(qv, ve)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(ve, ve))) AS sim
        FROM v CROSS JOIN q WHERE vec_id != query_id
    ), per_q AS (
        SELECT label, query_id, round(MAX(sim), 6) AS maxsim
        FROM scored GROUP BY 1, 2
    ), agg AS (
        SELECT label,
               CAST(SUM(CAST(maxsim AS DECIMAL(18,6))) AS DOUBLE) AS score,
               COUNT(*) AS n_query_terms
        FROM per_q GROUP BY label
    )
    SELECT label, round(score, 6) + 0.0 AS score, n_query_terms,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, label ASC) AS BIGINT)
               AS rank
    FROM agg ORDER BY rank
    """,
)

# --- round-4 additions ------------------------------------------------

register(
    "lang_confusion_matrix",
    text.lang_confusion_matrix,
    f"""
    WITH t AS (
        SELECT lang,
               len(list_filter({_TOKENS}, x -> x IN ('the','a','of','and','to','in'))) AS en_hits,
               len(list_filter({_TOKENS}, x -> x IN ('el','la','de','y','en','que'))) AS es_hits,
               len(list_filter({_TOKENS}, x -> x IN ('le','la','de','et','un','une'))) AS fr_hits
        FROM documents
    ), p AS (
        SELECT lang,
               CASE WHEN en_hits > es_hits AND en_hits > fr_hits THEN 'en'
                    WHEN es_hits > en_hits AND es_hits > fr_hits THEN 'es'
                    WHEN fr_hits > en_hits AND fr_hits > es_hits THEN 'fr'
                    ELSE 'und' END AS pred_lang
        FROM t
    ), cm AS (
        SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY 1, 2
    ), tot AS (
        SELECT lang, COUNT(*) AS n_lang FROM p GROUP BY 1
    )
    SELECT cm.lang, cm.pred_lang, cm.n, tot.n_lang,
           CAST(round(cm.n * 1000000.0 / tot.n_lang) AS BIGINT)
               / 1000000.0 + 0.0 AS row_share
    FROM cm JOIN tot ON cm.lang = tot.lang
    ORDER BY cm.lang, cm.pred_lang
    """,
)

register(
    "edit_distance_near_dup",
    text.edit_distance_near_dup,
    """
    WITH probe AS (
        SELECT doc_id, lang, substr(text, 1, 12) AS blk,
               substr(text, 1, 40) AS head
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist
    FROM probe a JOIN probe b
      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 10
    ORDER BY id_a, id_b
    """,
)

register(
    "domain_mixture_weights",
    text.domain_mixture_weights,
    f"""
    WITH per_src AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKENS})) AS BIGINT) AS toks
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(toks) AS BIGINT) AS t_all, COUNT(*) AS n_src
        FROM per_src
    ), j AS (
        SELECT source, n_docs, toks, t_all,
               CAST(t_all / n_src AS BIGINT) AS target_toks,
               least(3 * toks, CAST(t_all / n_src AS BIGINT)) AS alloc_toks
        FROM per_src CROSS JOIN tot
    ), ta AS (
        SELECT CAST(SUM(alloc_toks) AS BIGINT) AS alloc_all FROM j
    )
    SELECT source, n_docs, toks, target_toks, alloc_toks,
           CAST(round(CAST(toks AS DOUBLE) / t_all * 1000000.0) AS BIGINT)
               / 1000000.0 + 0.0 AS actual_share,
           CAST(round(CAST(alloc_toks AS DOUBLE) / toks * 1000000.0) AS BIGINT)
               / 1000000.0 + 0.0 AS epochs,
           CAST(round(CAST(alloc_toks AS DOUBLE) / alloc_all * 1000000.0) AS BIGINT)
               / 1000000.0 + 0.0 AS sample_prob
    FROM j CROSS JOIN ta
    ORDER BY source
    """,
)

register(
    "lang_rebalance_sample",
    text.lang_rebalance_sample,
    """
    SELECT doc_id, lang, source,
           ((doc_id % 2147483647) * 2654435761) % 2147483647 AS h
    FROM documents
    WHERE ((doc_id % 2147483647) * 2654435761) % 2147483647 <
          CASE lang WHEN 'en' THEN 644245094
                    WHEN 'de' THEN 1288490188
                    WHEN 'es' THEN 1288490188
                    WHEN 'fr' THEN 1288490188
                    WHEN 'zh' THEN 1932735282
                    ELSE 0 END
    ORDER BY doc_id
    """,
)

register(
    "token_budget_waterfill",
    text.token_budget_waterfill,
    f"""
    WITH per_lang AS (
        SELECT lang, CAST(SUM(len({_TOKENS})) AS BIGINT) AS toks
        FROM documents GROUP BY lang
    ), ranked AS (
        SELECT lang, toks,
               COALESCE(CAST(SUM(toks) OVER (ORDER BY toks, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cum_before,
               ROW_NUMBER() OVER (ORDER BY toks, lang) - 1 AS idx,
               COUNT(*) OVER () AS n_lang
        FROM per_lang
    ), lv AS (
        SELECT *, CAST((20000 - cum_before) / (n_lang - idx) AS BIGINT)
                  AS level
        FROM ranked
    ), line AS (
        SELECT idx AS line_idx, level AS water_level FROM lv
        WHERE level <= toks
        UNION ALL
        SELECT CAST(n_lang AS BIGINT), CAST(0 AS BIGINT)
        FROM (SELECT COUNT(*) AS n_lang FROM per_lang)
        ORDER BY line_idx LIMIT 1
    )
    SELECT lang, toks,
           CASE WHEN idx < line_idx THEN toks ELSE water_level END
               AS alloc_toks
    FROM lv CROSS JOIN line
    ORDER BY lang
    """,
)

register(
    "time_decayed_user_score",
    events.time_decayed_user_score,
    """
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_events,
               list_reduce(
                   list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                   (acc, v) -> acc * 9e-1 + v
               ) AS folded
        FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, round(folded, 6) + 0.0 AS decayed_score
    FROM per_user ORDER BY user_id
    """,
)

register(
    "gdpr_erasure_audit",
    events.gdpr_erasure_audit,
    """
    WITH erase AS (
        SELECT DISTINCT user_id FROM events
        WHERE ((user_id % 2147483647) * 2654435761) % 2147483647 < 107374182
    ), before AS (
        SELECT event_type, COUNT(*) AS n_before FROM events GROUP BY 1
    ), after AS (
        SELECT event_type, COUNT(*) AS n_after FROM events
        WHERE user_id NOT IN (SELECT user_id FROM erase)
        GROUP BY 1
    )
    SELECT b.event_type, b.n_before,
           COALESCE(a.n_after, 0) AS n_after,
           b.n_before - COALESCE(a.n_after, 0) AS n_erased,
           CAST(round((b.n_before - COALESCE(a.n_after, 0)) * 10000.0
                / b.n_before) AS BIGINT) / 10000.0 + 0.0 AS erased_share
    FROM before b LEFT JOIN after a ON b.event_type = a.event_type
    ORDER BY b.event_type
    """,
)

register(
    "retrieval_eval_metrics",
    similarity.retrieval_eval_metrics,
    _VEC_CTE
    + """
    , q AS (
        SELECT vec_id AS query_id, ve AS qv, label AS qlabel
        FROM v WHERE vec_id < 8
    ), scored AS (
        SELECT query_id,
               v.vec_id AS neighbor_id,
               CASE WHEN v.label = qlabel THEN 1 ELSE 0 END AS rel,
               round(list_dot_product(qv, ve)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(ve, ve))), 6) AS sim
        FROM v CROSS JOIN q WHERE v.vec_id != query_id
    ), totals AS (
        SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_rel
        FROM scored GROUP BY query_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY sim DESC, neighbor_id) AS rk
        FROM scored
    ), top AS (
        SELECT query_id,
               CAST(SUM(rel) AS BIGINT) AS hits,
               MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel,
               SUM(CASE WHEN rel = 1 THEN
                   (CASE rk WHEN 1 THEN 1.000000000000::DECIMAL(18,12)
                            WHEN 2 THEN 0.630929753571::DECIMAL(18,12)
                            WHEN 3 THEN 0.500000000000::DECIMAL(18,12)
                            WHEN 4 THEN 0.430676558073::DECIMAL(18,12)
                            WHEN 5 THEN 0.386852807235::DECIMAL(18,12)
                            WHEN 6 THEN 0.356207187108::DECIMAL(18,12)
                            WHEN 7 THEN 0.333333333333::DECIMAL(18,12)
                            WHEN 8 THEN 0.315464876786::DECIMAL(18,12)
                            WHEN 9 THEN 0.301029995664::DECIMAL(18,12)
                            ELSE 0.289064826318::DECIMAL(18,12) END)
                   ELSE 0::DECIMAL(18,12) END) AS dcg
        FROM ranked WHERE rk <= 10 GROUP BY query_id
    )
    SELECT t.query_id, n_rel, hits AS hits_at_10,
           CASE WHEN first_rel IS NOT NULL THEN 1.0e0 / first_rel
                ELSE 0.0e0 END AS rr_at_10,
           CASE WHEN n_rel > 0 THEN CAST(hits AS DOUBLE) / n_rel
                ELSE 0.0e0 END AS recall_at_10,
           CASE WHEN n_rel > 0 THEN
               CAST(round(CAST(dcg AS DOUBLE)
                   / CAST((CASE least(10, n_rel)
                            WHEN 1 THEN 1.000000000000::DECIMAL(18,12)
                            WHEN 2 THEN 1.630929753571::DECIMAL(18,12)
                            WHEN 3 THEN 2.130929753571::DECIMAL(18,12)
                            WHEN 4 THEN 2.561606311644::DECIMAL(18,12)
                            WHEN 5 THEN 2.948459118879::DECIMAL(18,12)
                            WHEN 6 THEN 3.304666305987::DECIMAL(18,12)
                            WHEN 7 THEN 3.637999639320::DECIMAL(18,12)
                            WHEN 8 THEN 3.953464516106::DECIMAL(18,12)
                            WHEN 9 THEN 4.254494511770::DECIMAL(18,12)
                            ELSE 4.543559338088::DECIMAL(18,12) END) AS DOUBLE)
                   * 1000000.0) AS BIGINT) / 1000000.0 + 0.0
           ELSE 0.0e0 END AS ndcg_at_10
    FROM top t JOIN totals USING (query_id)
    ORDER BY query_id
    """,
)

register(
    "source_vocab_overlap",
    dedup.source_vocab_overlap,
    f"""
    WITH vocab AS (
        SELECT DISTINCT source, t AS w FROM (
            SELECT source, unnest({_TOKENS}) AS t FROM documents
        )
    ), sizes AS (
        SELECT source, COUNT(*) AS sz FROM vocab GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS inter
        FROM vocab a JOIN vocab b
          ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, inter,
           sa.sz + sb.sz - inter AS union_sz,
           CAST(round(inter * 1000000.0 / (sa.sz + sb.sz - inter)) AS BIGINT)
               / 1000000.0 + 0.0 AS vocab_jaccard
    FROM inter
    JOIN sizes sa ON src_a = sa.source
    JOIN sizes sb ON src_b = sb.source
    ORDER BY src_a, src_b
    """,
)

register(
    "neardup_flow_matrix",
    dedup.neardup_flow_matrix,
    _SHINGLES_CTE
    + """
    , nd AS (
        SELECT doc_a, doc_b
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    )
    SELECT least(da.source, db.source) AS src_a,
           greatest(da.source, db.source) AS src_b,
           COUNT(*) AS n_pairs
    FROM nd
    JOIN documents da ON nd.doc_a = da.doc_id
    JOIN documents db ON nd.doc_b = db.doc_id
    GROUP BY 1, 2
    ORDER BY src_a, src_b
    """,
)

register(
    "semantic_decontamination",
    similarity.semantic_decontamination,
    _VEC_CTE
    + """
    , held AS (
        SELECT vec_id AS held_id, ve AS hv FROM v WHERE vec_id < 50
    ), per_vec AS (
        SELECT v.vec_id,
               round(MAX(list_dot_product(hv, ve)
                   / (sqrt(list_dot_product(hv, hv))
                      * sqrt(list_dot_product(ve, ve)))), 6) AS max_sim
        FROM v CROSS JOIN held
        WHERE v.vec_id >= 50
        GROUP BY v.vec_id
    )
    SELECT vec_id, max_sim + 0.0 AS max_held_sim,
           max_sim >= 0.95 AS is_contaminated
    FROM per_vec ORDER BY vec_id
    """,
)

register(
    "join_cardinality_estimate",
    relational.join_cardinality_estimate,
    """
    WITH est AS (
        SELECT 'orders_x_lineitem' AS join_name,
               COUNT(*) AS n_join_keys,
               CAST(SUM(rows_k) AS BIGINT) AS est_join_rows,
               CAST(MAX(rows_k) AS BIGINT) AS max_key_rows
        FROM (
            SELECT ha.k, ha.ca * hb.cb AS rows_k
            FROM (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1) ha
            JOIN (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1) hb
              ON ha.k = hb.k
        )
        UNION ALL
        SELECT 'customer_x_orders',
               COUNT(*), CAST(SUM(rows_k) AS BIGINT), CAST(MAX(rows_k) AS BIGINT)
        FROM (
            SELECT ha.k, ha.ca * hb.cb AS rows_k
            FROM (SELECT c_custkey AS k, COUNT(*) AS ca FROM customer GROUP BY 1) ha
            JOIN (SELECT o_custkey AS k, COUNT(*) AS cb FROM orders GROUP BY 1) hb
              ON ha.k = hb.k
        )
        UNION ALL
        SELECT 'events_self_user',
               COUNT(*), CAST(SUM(rows_k) AS BIGINT), CAST(MAX(rows_k) AS BIGINT)
        FROM (
            SELECT ha.k, ha.ca * hb.cb AS rows_k
            FROM (SELECT user_id AS k, COUNT(*) AS ca FROM events GROUP BY 1) ha
            JOIN (SELECT user_id AS k, COUNT(*) AS cb FROM events GROUP BY 1) hb
              ON ha.k = hb.k
        )
    )
    SELECT join_name, n_join_keys, est_join_rows, max_key_rows,
           CAST(round(max_key_rows * n_join_keys * 10000.0 / est_join_rows)
                AS BIGINT) / 10000.0 + 0.0 AS skew_factor
    FROM est ORDER BY join_name
    """,
)

# Seventh streaming topology: foreachBatch → custom manifest sink →
# manifest-trust read-back; one AvailableNow drain in complete mode
# equals the batch hourly aggregation, so it shares events_hourly's
# oracle end to end (streaming + custom-sink surfaces, one gate).
register(
    "streaming_manifest_sink",
    _stream_windows.streaming_manifest_sink,
    REGISTRY["events_hourly"][1],
)

# Sequential BPE training is not SQL-expressible - rows-only; pytest
# pins the merge loop against an independent reference implementation
# and the fertility accounting against exact recounts.
register("bpe_tokenize_fertility", text.bpe_tokenize_fertility, None)

register(
    "cogroup_purchase_context",
    events.cogroup_purchase_context,
    """
    WITH p AS (
        SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'purchase'
    ), o AS (
        SELECT user_id, ts FROM events WHERE event_type != 'purchase'
    ), ctx AS (
        SELECT p.user_id, p.event_id,
               (SELECT COUNT(*) FROM o
                WHERE o.user_id = p.user_id
                  AND o.ts < p.ts
                  AND o.ts >= p.ts - INTERVAL 1 HOUR)
                   AS n_prior_events_1h,
               CAST((epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)))
                   // 1000000 AS DOUBLE)
                   AS secs_since_prev_purchase
        FROM p
    )
    SELECT user_id, event_id, n_prior_events_1h, secs_since_prev_purchase
    FROM ctx ORDER BY user_id, event_id
    """,
)


register(
    "dsir_importance_weights",
    text.dsir_importance_weights,
    r"""
    WITH occ AS (
        SELECT doc_id, source, lang, w, COUNT(*) AS cnt FROM (
            SELECT doc_id, source, lang,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS w
            FROM documents
        ) GROUP BY 1, 2, 3, 4
    ), occb AS (
        SELECT doc_id, source, lang, cnt,
               CAST(CONCAT('0x', substr(md5(w), 1, 7)) AS BIGINT) % 256
                   AS bucket
        FROM occ
    ), bstats AS (
        SELECT bucket, SUM(cnt) AS r_b,
               SUM(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS t_b
        FROM occb GROUP BY bucket
    ), tot AS (
        SELECT SUM(r_b) AS r_tot, SUM(t_b) AS t_tot FROM bstats
    ), wtab AS (
        SELECT bucket,
               CAST(round(ln((t_b + 1.0) / (t_tot + 256.0))
                        - ln((r_b + 1.0) / (r_tot + 256.0)), 9)
                    AS DECIMAL(18,9)) AS w_b
        FROM bstats CROSS JOIN tot
    ), docs AS (
        SELECT doc_id, source,
               SUM(CAST(cnt AS DECIMAL(7,0)) * w_b) AS imp,
               SUM(cnt) AS n_tok
        FROM occb JOIN wtab USING (bucket) GROUP BY 1, 2
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           round(CAST(SUM(imp) AS DOUBLE) / SUM(n_tok), 6) + 0.0
               AS mean_logratio_per_token,
           CAST(SUM(CASE WHEN imp > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_target_like
    FROM docs GROUP BY source ORDER BY source
    """,
)

register(
    "loss_mask_plan",
    text.loss_mask_plan,
    r"""
    WITH toks AS (
        SELECT lang,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tok
        FROM documents
    ), counted AS (
        SELECT lang,
               LEAST(64, CAST(FLOOR((n_tok + 3) / 4.0) AS BIGINT))
                   AS mask_tok,
               n_tok - LEAST(64, CAST(FLOOR((n_tok + 3) / 4.0) AS BIGINT))
                   AS train_tok
        FROM toks
    ), rolled AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(mask_tok) AS BIGINT) AS mask_tokens,
               CAST(SUM(train_tok) AS BIGINT) AS train_tokens
        FROM counted GROUP BY lang
    )
    SELECT lang, n_docs, mask_tokens, train_tokens,
           round(CAST(mask_tokens AS DOUBLE)
                 / GREATEST(mask_tokens + train_tokens, 1), 6) + 0.0
               AS mask_ratio
    FROM rolled ORDER BY lang
    """,
)

register(
    "striped_shard_plan",
    text.striped_shard_plan,
    rf"""
    WITH t AS (
        SELECT doc_id, len({_TOKENS}) AS n_tok FROM documents
    ), r AS (
        SELECT n_tok,
               row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rk
        FROM t
    ), shards AS (
        SELECT CAST((rk - 1) % 8 AS INT) AS shard, COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
        FROM r GROUP BY 1
    ), tot AS (SELECT SUM(shard_tokens) AS all_tokens FROM shards)
    SELECT shard, n_docs, shard_tokens,
           round(CAST(shard_tokens AS DOUBLE)
                 / GREATEST(all_tokens, 1), 6) + 0.0 AS token_share
    FROM shards CROSS JOIN tot ORDER BY shard
    """,
)

# Exact cross-set 3-gram Jaccard: valid as an oracle because the
# banded-LSH pair set is pytest-pinned identical to the exact pair
# set on this corpus (test_minhash_lsh_equals_exact_jaccard) and the
# new-vs-old pairs are a subset of it.  Shared by the batch operator
# (incremental_neardup_lsh) and its streaming twin
# (streaming_neardup_lsh) — one AvailableNow drain over the static
# fixture equals the batch result by construction.
_INCREMENTAL_NEARDUP_SQL = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
        FROM toks
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), flags AS (
        SELECT doc_id,
               ((doc_id % 2147483647) * 2654435761) % 2147483647 % 10 >= 8
                   AS is_new
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS doc_new, b.doc_id AS doc_old, COUNT(*) AS inter
        FROM sh a
        JOIN flags fa ON a.doc_id = fa.doc_id AND fa.is_new
        JOIN sh b ON a.shingle = b.shingle
        JOIN flags fb ON b.doc_id = fb.doc_id AND NOT fb.is_new
        GROUP BY 1, 2
    )
    SELECT doc_new, doc_old,
           round(inter * 1.0 / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON doc_new = sa.doc_id
    JOIN sizes sb ON doc_old = sb.doc_id
    WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    ORDER BY doc_new, doc_old
    """

register(
    "incremental_neardup_lsh",
    dedup.incremental_neardup_lsh,
    _INCREMENTAL_NEARDUP_SQL,
)

register(
    "multimodal_token_bill",
    _binary.multimodal_token_bill,
    r"""
    WITH per_doc AS (
        SELECT source,
               len(regexp_split_to_array(trim(text), '\s+')) AS text_tok,
               CAST(FLOOR((GREATEST(strlen(text), 1) + 255) / 256.0)
                    AS BIGINT) * 16 AS image_tok
        FROM documents
    ), rolled AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(text_tok) AS BIGINT) AS text_tokens,
               CAST(SUM(image_tok) AS BIGINT) AS image_tokens
        FROM per_doc GROUP BY source
    )
    SELECT source, n_docs, text_tokens, image_tokens,
           text_tokens + image_tokens AS total_tokens,
           round(CAST(image_tokens AS DOUBLE)
                 / GREATEST(text_tokens + image_tokens, 1), 6) + 0.0
               AS image_share
    FROM rolled ORDER BY source
    """,
)


register(
    "neardup_survivors_quality",
    dedup.neardup_survivors_quality,
    # Exact-pair-graph transitive closure (the LSH pair set is pinned
    # identical) + longest-member survivorship.
    _SHINGLES_CTE.replace("WITH toks", "WITH RECURSIVE toks")
    + """
    , p AS (
        SELECT doc_a, doc_b
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM p
        UNION ALL
        SELECT doc_b, doc_a FROM p
    ), reach AS (
        SELECT a AS doc, a AS lbl FROM edges
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.doc
    ), labels AS (
        SELECT doc AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc
    ), docs AS (
        SELECT d.source, d.n_chars,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.doc_id
        FROM documents d LEFT JOIN labels l USING (doc_id)
    ), ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM docs
    ), rolled AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
                   AS dropped_chars
        FROM ranked GROUP BY source
    )
    SELECT source, n_docs, n_kept, n_docs - n_kept AS n_dropped,
           dropped_chars,
           round(CAST(n_docs - n_kept AS DOUBLE) / n_docs, 6) + 0.0
               AS drop_rate
    FROM rolled ORDER BY source
    """,
)

register(
    "perplexity_band_filter",
    text.perplexity_band_filter,
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), tc AS (
        SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS total FROM toks
    ), scored AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               ROUND(SUM(tf.tf * ln(tc.cnt / tot.total)) / SUM(tf.tf), 6)
                   + 0.0 AS avg_logprob
        FROM tf JOIN tc USING (term) CROSS JOIN tot
        GROUP BY tf.doc_id
    ), s AS (
        SELECT scored.*, d.source FROM scored
        JOIN documents d USING (doc_id)
    ), bands AS (
        SELECT source, quantile_cont(avg_logprob, 0.1) AS p10,
               quantile_cont(avg_logprob, 0.9) AS p90
        FROM s GROUP BY source
    )
    SELECT s.source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN avg_logprob BETWEEN p10 AND p90
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN avg_logprob BETWEEN p10 AND p90
                         THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(SUM(CASE WHEN avg_logprob NOT BETWEEN p10 AND p90
                         THEN n_tokens ELSE 0 END) AS BIGINT)
               AS dropped_tokens,
           round(MIN(p10), 6) + 0.0 AS band_lo,
           round(MIN(p90), 6) + 0.0 AS band_hi
    FROM s JOIN bands USING (source)
    GROUP BY s.source ORDER BY s.source
    """,
)

register(
    "gate_ablation_report",
    text.gate_ablation_report,
    r"""
    WITH per_doc AS (
        SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
               lang = 'en' AS gl,
               len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 10 AND 500
                   AS gn,
               CAST(length(text) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\s+')) <= 8.0
                   AS gr
        FROM documents
    ), one AS (
        SELECT
            CAST(SUM(CASE WHEN NOT gl THEN 1 ELSE 0 END) AS BIGINT) AS fd_lang,
            CAST(SUM(CASE WHEN NOT gn THEN 1 ELSE 0 END) AS BIGINT) AS fd_len,
            CAST(SUM(CASE WHEN NOT gr THEN 1 ELSE 0 END) AS BIGINT) AS fd_ratio,
            CAST(SUM(CASE WHEN NOT gl THEN n_tok ELSE 0 END) AS BIGINT) AS ft_lang,
            CAST(SUM(CASE WHEN NOT gn THEN n_tok ELSE 0 END) AS BIGINT) AS ft_len,
            CAST(SUM(CASE WHEN NOT gr THEN n_tok ELSE 0 END) AS BIGINT) AS ft_ratio,
            CAST(SUM(CASE WHEN gl AND gn AND gr THEN n_tok ELSE 0 END) AS BIGINT)
                AS kt_all,
            CAST(SUM(CASE WHEN gn AND gr THEN n_tok ELSE 0 END) AS BIGINT)
                AS kt_loo_lang,
            CAST(SUM(CASE WHEN gl AND gr THEN n_tok ELSE 0 END) AS BIGINT)
                AS kt_loo_len,
            CAST(SUM(CASE WHEN gl AND gn THEN n_tok ELSE 0 END) AS BIGINT)
                AS kt_loo_ratio
        FROM per_doc
    )
    SELECT 'lang' AS gate, fd_lang AS docs_failing_alone,
           ft_lang AS tokens_failing_alone, kt_all AS full_stack_kept_tokens,
           kt_loo_lang AS loo_kept_tokens,
           kt_loo_lang - kt_all AS marginal_tokens FROM one
    UNION ALL
    SELECT 'len', fd_len, ft_len, kt_all, kt_loo_len,
           kt_loo_len - kt_all FROM one
    UNION ALL
    SELECT 'ratio', fd_ratio, ft_ratio, kt_all, kt_loo_ratio,
           kt_loo_ratio - kt_all FROM one
    ORDER BY gate
    """,
)

register(
    "split_embedding_drift",
    similarity.split_embedding_drift,
    """
    WITH exploded AS (
        SELECT label,
               ((vec_id % 2147483647) * 2654435761) % 2147483647 % 10 < 8
                   AS train,
               CAST(t.ord - 1 AS BIGINT) AS dim,
               CAST(embedding[CAST(t.ord AS INT)] AS DOUBLE) AS v
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS ord) t
    ), agg AS (
        SELECT label, dim,
               SUM(CASE WHEN train THEN CAST(v AS DECIMAL(28,10)) END) AS s_t,
               SUM(CASE WHEN NOT train THEN CAST(v AS DECIMAL(28,10)) END)
                   AS s_v,
               SUM(CASE WHEN train THEN 1 ELSE 0 END) AS n_t,
               SUM(CASE WHEN NOT train THEN 1 ELSE 0 END) AS n_v
        FROM exploded GROUP BY label, dim
    ), per_dim AS (
        SELECT label, n_t, n_v,
               CAST(round((CAST(s_t AS DOUBLE) / n_t
                           - CAST(s_v AS DOUBLE) / n_v)
                          * (CAST(s_t AS DOUBLE) / n_t
                             - CAST(s_v AS DOUBLE) / n_v), 12)
                    AS DECIMAL(28,12)) AS d2
        FROM agg
    )
    SELECT label, CAST(MIN(n_t) AS BIGINT) AS n_train,
           CAST(MIN(n_v) AS BIGINT) AS n_val,
           round(sqrt(CAST(SUM(d2) AS DOUBLE)), 6) + 0.0 AS centroid_drift
    FROM per_dim GROUP BY label ORDER BY label
    """,
)


register(
    "stream_static_dedup",
    _stream_windows.stream_static_dedup,
    """
    WITH cut AS (
        SELECT MIN(ts) + INTERVAL 1 DAY AS c FROM events
    ), standing AS (
        SELECT DISTINCT user_id, event_type FROM events, cut WHERE ts < c
    )
    SELECT e.event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    WHERE NOT EXISTS (
        SELECT 1 FROM standing s
        WHERE s.user_id = e.user_id AND s.event_type = e.event_type
    )
    GROUP BY e.event_type
    """,
)


register(
    "dro_mixture_step",
    text.dro_mixture_step,
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), tc AS (
        SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS total FROM toks
    ), scored AS (
        SELECT tf.doc_id,
               ROUND(SUM(tf.tf * ln(tc.cnt / tot.total)) / SUM(tf.tf), 6)
                   + 0.0 AS avg_logprob
        FROM tf JOIN tc USING (term) CROSS JOIN tot
        GROUP BY tf.doc_id
    ), per_src AS (
        SELECT d.source, COUNT(*) AS n_docs,
               -(CAST(SUM(CAST(avg_logprob AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*)) AS loss
        FROM scored JOIN documents d USING (doc_id)
        GROUP BY d.source
    ), gmean AS (
        -- scaled-integer 6-dp rounds mirror the Spark round_scaled
        -- (bigint(round(x*1e6))/1e6): integer±.5 is binary-exact, so a
        -- raw round(quotient, 6) can't split the engines (invariant 6)
        SELECT CAST(SUM(CAST(CAST(round(loss * 1000000.0) AS BIGINT)
                             / 1000000.0 AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*) AS mean_loss
        FROM per_src
    ), expw AS (
        SELECT source, n_docs, loss,
               CAST(round((loss - mean_loss) * 1000000.0) AS BIGINT)
                   / 1000000.0 AS excess,
               CAST(CAST(round(exp(CAST(round((loss - mean_loss)
                                             * 1000000.0) AS BIGINT)
                                   / 1000000.0) * 1000000000.0) AS BIGINT)
                    / 1000000000.0 AS DECIMAL(18,9)) AS w_raw
        FROM per_src CROSS JOIN gmean
    ), norm AS (SELECT SUM(w_raw) AS z FROM expw)
    SELECT source, n_docs,
           CAST(round(loss * 1000000.0) AS BIGINT) / 1000000.0 + 0.0
               AS proxy_loss,
           excess + 0.0 AS excess_loss,
           CAST(round(CAST(w_raw AS DOUBLE) / CAST(z AS DOUBLE)
                      * 1000000.0) AS BIGINT) / 1000000.0 + 0.0
               AS new_weight
    FROM expw CROSS JOIN norm ORDER BY source
    """,
)


# SemDeDup composed pipeline: quantizer cells aren't SQL-expressible →
# rows-only in the driver gate; the pytest runs the exact pair graph
# through the identical tail and pins full-output equality at sf0.01.
register("semdedup_pipeline", similarity.semdedup_pipeline, None)


register(
    "event_runs_udtf",
    events.event_runs_udtf,
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        FROM events
    ), runs AS (
        SELECT user_id, event_type,
               SUM(chg) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS run_id
        FROM ordered
    ), rl AS (
        SELECT user_id, run_id, MIN(event_type) AS event_type,
               COUNT(*) AS len
        FROM runs GROUP BY 1, 2
    ), ranked AS (
        SELECT user_id, event_type, len,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, run_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_runs
        FROM rl
    )
    SELECT user_id, CAST(n_runs AS INT) AS n_runs,
           CAST(len AS INT) AS longest_run_len,
           event_type AS longest_run_type
    FROM ranked WHERE rn = 1
    """,
)


register(
    "pii_pseudonymize_join",
    events.pii_pseudonymize_join,
    """
    WITH ev_p AS (
        SELECT CAST(CONCAT('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS p_user,
               event_type
        FROM events
    ), cust_p AS (
        SELECT CAST(CONCAT('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS p_user,
               c_mktsegment
        FROM customer
    )
    SELECT c_mktsegment, COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT p_user) AS BIGINT) AS n_pseudonyms
    FROM ev_p JOIN cust_p USING (p_user)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)


register(
    "context_budget_curve",
    text.context_budget_curve,
    r"""
    WITH per_doc AS (
        SELECT len(regexp_split_to_array(trim(text), '\s+')) AS n
        FROM documents
    ), stacked AS (
        SELECT n, unnest([512, 1024, 2048, 4096]) AS budget FROM per_doc
    ), bill AS (
        SELECT budget, n,
               CAST(FLOOR((n + budget - 1) / CAST(budget AS DOUBLE)) AS BIGINT)
                   AS n_chunks
        FROM stacked
    )
    SELECT budget, COUNT(*) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_sequences,
           CAST(SUM(n) AS BIGINT) AS real_tokens,
           CAST(SUM(n_chunks * budget - n) AS BIGINT) AS pad_tokens,
           round(CAST(SUM(n) AS DOUBLE)
                 / (SUM(n) + SUM(n_chunks * budget - n)), 6) + 0.0
               AS efficiency
    FROM bill GROUP BY budget ORDER BY budget
    """,
)

register(
    "neardup_cluster_sizes",
    dedup.neardup_cluster_sizes,
    # Exact-pair-graph closure (LSH pair set pinned identical) → component
    # size histogram + singleton count.
    _SHINGLES_CTE.replace("WITH toks", "WITH RECURSIVE toks")
    + """
    , p AS (
        SELECT doc_a, doc_b
        FROM pairs
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM p
        UNION ALL
        SELECT doc_b, doc_a FROM p
    ), reach AS (
        SELECT a AS doc, a AS lbl FROM edges
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.doc
    ), labels AS (
        SELECT doc, MIN(lbl) AS cluster_id FROM reach GROUP BY doc
    ), ksz AS (
        SELECT cluster_id, COUNT(*) AS k FROM labels GROUP BY cluster_id
    ), hist AS (
        SELECT k, COUNT(*) AS n_clusters FROM ksz GROUP BY k
    ), singles AS (
        SELECT CAST(1 AS BIGINT) AS k,
               CAST((SELECT COUNT(*) FROM documents)
                    - (SELECT COUNT(*) FROM labels) AS BIGINT) AS n_clusters
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n_clusters AS BIGINT) AS n_clusters
    FROM hist
    UNION ALL
    SELECT k, n_clusters FROM singles
    ORDER BY k
    """,
)


# Lightweight k-means coreset: sensitivity-sampled weighted subset whose
# weighted k-means cost tracks the corpus (Bachem et al. 2018).  Rows-only:
# the quantizer centers aren't SQL-expressible; pytest pins determinism,
# size, positive weights, and the cost-tracking property.
register("coreset_kmeans_sample", similarity.coreset_kmeans_sample, None)


# t-digest conformal radius: per-type 0.9-quantile of calibration
# residuals read off a MERGEABLE per-partition centroid sketch, emitted
# beside the exact interpolated percentile.  Rows-only: centroid
# boundaries are partitioning-dependent; pytest pins each estimate inside
# the digest's rank-error band around the exact radius.
register("tdigest_conformal_radius", sketches.tdigest_conformal_radius, None)


# Ninth streaming topology: streaming near-dup LSH against a standing
# band index; one AvailableNow drain over the static fixture equals the
# batch incremental_neardup_lsh, so both share the exact cross-set
# Jaccard oracle above.
register(
    "streaming_neardup_lsh",
    _stream_windows.streaming_neardup_lsh,
    _INCREMENTAL_NEARDUP_SQL,
)


# Observation API: corpus DQ metrics captured from the SAME scan as a
# real aggregation — one pass instead of a separate profiling query.
register(
    "observed_scan_metrics",
    relational.observed_scan_metrics,
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(CASE WHEN n_chars = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_empty,
           CAST((SELECT COUNT(DISTINCT source) FROM documents) AS BIGINT)
               AS n_sources
    FROM documents
    """,
)


# mapInArrow surface: RecordBatch-level byte-length histogram, pyarrow
# compute kernels only (no pandas materialization either side).
register(
    "arrow_byte_histogram",
    text.arrow_byte_histogram,
    """
    SELECT CAST(length(CAST(strlen(text) AS VARCHAR)) AS BIGINT) AS digits,
           COUNT(*) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)


# RHO-loss-style selection: reducible loss = unigram loss − bigram loss,
# quantized to integer micro-nats before ranking so both engines select
# identically; top-20% per source.
register(
    "rho_loss_selection",
    text.rho_loss_selection,
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), tc AS (
        SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS total FROM toks
    ), uni AS (
        SELECT tf.doc_id,
               ROUND(SUM(tf.tf * ln(tc.cnt / tot.total)) / SUM(tf.tf), 6)
                   + 0.0 AS avg_logprob
        FROM tf JOIN tc USING (term) CROSS JOIN tot
        GROUP BY tf.doc_id
    ), base AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        FROM documents
    ), bg AS (
        SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
        FROM base, LATERAL (SELECT unnest(range(1, len(ws))) AS i) g
    ), c12 AS (
        SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1
    ), v AS (
        SELECT COUNT(DISTINCT t) AS v_sz
        FROM (SELECT unnest(ws) AS t FROM base)
    ), bi AS (
        SELECT bg.doc_id,
               round(AVG(ln((c12.c12 + 1.0) / (c1.c1 + v.v_sz))), 6) + 0.0
                   AS avg_bigram_logprob
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        GROUP BY bg.doc_id
    ), scored AS (
        SELECT u.doc_id, d.source,
               CAST(round((b.avg_bigram_logprob - u.avg_logprob)
                          * 1000000.0) AS BIGINT) AS rho_micro
        FROM uni u JOIN bi b ON u.doc_id = b.doc_id
        JOIN documents d ON u.doc_id = d.doc_id
    ), ranked AS (
        SELECT source, rho_micro,
               row_number() OVER (PARTITION BY source
                                  ORDER BY rho_micro DESC, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n_src
        FROM scored
    )
    SELECT source,
           CAST(MAX(n_src) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rk <= (n_src + 4) // 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(MIN(CASE WHEN rk <= (n_src + 4) // 5 THEN rho_micro END)
                AS DOUBLE) / 1000000.0 + 0.0 AS sel_threshold_rho,
           CAST(SUM(CASE WHEN rk <= (n_src + 4) // 5 THEN rho_micro END)
                AS DOUBLE)
               / SUM(CASE WHEN rk <= (n_src + 4) // 5 THEN 1 ELSE 0 END)
               / 1000000.0 + 0.0 AS avg_sel_rho
    FROM ranked GROUP BY source ORDER BY source
    """,
)


# IVF index-maintenance: per-cell occupancy + split/merge policy from the
# memoized quantizer layout.  Rows-only (cells aren't SQL-expressible);
# pytest pins occupancy accounting, determinism, and policy consistency.
register("ivf_cell_balance", similarity.ivf_cell_balance, None)


# Custom-connector ROUND TRIP: documents projected through the
# checksummed manifest SINK, read back through the manifest SOURCE
# (manifest-trust + per-shard crc32 re-verification in-stream), then
# aggregated.  The oracle aggregates the original table — any row lost,
# duplicated, or mangled by either connector half breaks the hash.
from .sources import manifest_sink as _manifest  # noqa: E402

register(
    "manifest_roundtrip_stats",
    _manifest.manifest_roundtrip_stats,
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    WHERE doc_id % 5 = 0
    GROUP BY source ORDER BY source
    """,
)


# Per-source exact median via the distributed grouped-rank primitive —
# no per-source window sort anywhere (round-6 verdict item #1's fix,
# exercised as its own oracle-gated operator).  quantile_cont(0.5) on
# integers interpolates to the same IEEE double as (lo + hi) / 2.
register(
    "grouped_median_chars",
    text.grouped_median_chars,
    """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           quantile_cont(n_chars, 0.5) + 0.0 AS median_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source ORDER BY source
    """,
)


# DataFrame.transpose surface (new in Spark 4): metric-per-row flip of
# the per-returnflag pricing profile; decimal-exact averages per the
# money determinism contract.
register(
    "transpose_returnflag_stats",
    relational.transpose_returnflag_stats,
    """
    WITH s AS (
        SELECT l_returnflag AS f,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
                   / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE)
                   / COUNT(*) AS avg_disc
        FROM lineitem GROUP BY 1
    )
    SELECT 'avg_qty' AS key,
           (SELECT avg_qty FROM s WHERE f = 'A') AS A,
           (SELECT avg_qty FROM s WHERE f = 'N') AS N,
           (SELECT avg_qty FROM s WHERE f = 'R') AS R
    UNION ALL
    SELECT 'avg_price',
           (SELECT avg_price FROM s WHERE f = 'A'),
           (SELECT avg_price FROM s WHERE f = 'N'),
           (SELECT avg_price FROM s WHERE f = 'R')
    UNION ALL
    SELECT 'avg_disc',
           (SELECT avg_disc FROM s WHERE f = 'A'),
           (SELECT avg_disc FROM s WHERE f = 'N'),
           (SELECT avg_disc FROM s WHERE f = 'R')
    ORDER BY key
    """,
)


# Tenth streaming topology: streaming coreset maintenance — per-(cell,
# dim) integer micro-unit moments kept in keyed state; quantization
# BEFORE aggregation makes the drain batch-equivalent bit-for-bit, so
# the topology carries a full oracle.
register(
    "streaming_coreset_moments",
    _stream_windows.streaming_coreset_moments,
    """
    WITH m AS (
        SELECT CAST(
                   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                 + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
                 + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
                 + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
                 + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
                 + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
                 + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
                 + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END)
               AS INTEGER) AS cell,
               g.i - 1 AS dim,
               CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000.0)
                    AS BIGINT) AS q
        FROM embeddings,
             LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) g
    )
    SELECT cell,
           CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(q) AS BIGINT) AS sum_q,
           CAST(SUM(q * q) AS BIGINT) AS sum_q2,
           CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000.0 + 0.0 AS mean_val,
           CAST(SUM(q * q) AS DOUBLE) / COUNT(*) / 1000000000000.0 + 0.0
               AS second_moment
    FROM m GROUP BY 1, 2 ORDER BY 1, 2
    """,
)


# Exact tie-corrected AUC from the per-score histogram (Mann-Whitney U
# without per-row ranks): 2U stays integer, so both engines divide the
# same exact integers.
register(
    "auc_stopword_density",
    text.auc_stopword_density,
    f"""
    WITH s AS (
        SELECT CAST(round(
                   len(list_filter({_TOKENS},
                       x -> x IN ('the','a','of','and','to','in')))
                   * 1000000.0 / len({_TOKENS})) AS BIGINT) AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ), h AS (
        SELECT score, SUM(pos) AS pos_s, SUM(1 - pos) AS neg_s
        FROM s GROUP BY 1
    ), c AS (
        SELECT pos_s, neg_s,
               COALESCE(SUM(neg_s) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS neg_below
        FROM h
    )
    SELECT CAST(SUM(pos_s) AS BIGINT) AS n_pos,
           CAST(SUM(neg_s) AS BIGINT) AS n_neg,
           CAST(SUM(pos_s * (2 * neg_below + neg_s)) AS BIGINT) AS u2,
           CASE WHEN SUM(pos_s) > 0 AND SUM(neg_s) > 0 THEN
               CAST(SUM(pos_s * (2 * neg_below + neg_s)) AS DOUBLE)
                   / (2.0 * SUM(pos_s) * SUM(neg_s)) + 0.0
           END AS auc
    FROM c
    """,
)


# N-gram novelty attribution per source: share of each source's distinct
# 3-gram occurrences whose gram first occurs (min doc_id) in that doc —
# sub-document textual novelty next to the whole-doc dedup forecasts.
register(
    "ngram_novelty_by_source",
    dedup.ngram_novelty_by_source,
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents
    ), sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS shingle
        FROM toks
    ), f AS (
        SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1
    ), marked AS (
        SELECT d.source,
               CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END AS novel
        FROM sh JOIN f USING (shingle)
        JOIN documents d ON sh.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           CAST(round(SUM(novel) * 1000000.0 / COUNT(*)) AS BIGINT)
               / 1000000.0 + 0.0 AS novelty_share
    FROM marked GROUP BY source ORDER BY source
    """,
)


# Grouped applyInArrow surface (Spark 4): per-customer inter-order gap
# stats from integer day arithmetic — group key cardinality scales with
# the data, per-group rows are bounded, lower-median picked explicitly
# in both engines (no quantile-convention trust).
register(
    "customer_order_gaps_arrow",
    relational.customer_order_gaps_arrow,
    """
    WITH d AS (
        SELECT o_custkey,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day
        FROM orders
    ), g AS (
        SELECT o_custkey,
               day - lag(day) OVER (PARTITION BY o_custkey ORDER BY day)
                   AS gap
        FROM d
    ), s AS (
        SELECT o_custkey, MAX(gap) AS max_gap_days,
               list(gap ORDER BY gap)[((COUNT(*) - 1) // 2) + 1]
                   AS med_gap_days
        FROM g WHERE gap IS NOT NULL GROUP BY 1
    ), t AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MAX(day) - MIN(day) AS BIGINT) AS span_days
        FROM d GROUP BY 1 HAVING COUNT(*) >= 2
    )
    SELECT t.o_custkey, n_orders, span_days,
           CAST(max_gap_days AS BIGINT) AS max_gap_days,
           CAST(med_gap_days AS BIGINT) AS med_gap_days
    FROM t JOIN s USING (o_custkey)
    """,
)


# Degree-oriented triangle census of the part co-purchase graph; the
# oracle counts the same triangles via the canonical a<b<c three-way
# self-join (the census is orientation-independent).
register(
    "triangle_count_copurchase",
    relational.triangle_count_copurchase,
    """
    WITH po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
        SELECT a.p AS u, b.p AS v FROM po a
        JOIN po b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ), deg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1
    ), tri AS (
        SELECT COUNT(*) AS n FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg)
               AS n_wedges,
           (SELECT CAST(n AS BIGINT) FROM tri) AS n_triangles,
           CASE WHEN (SELECT SUM(deg * (deg - 1) // 2) FROM deg) > 0 THEN
               CAST(round((SELECT n FROM tri) * 3.0
                    / (SELECT SUM(deg * (deg - 1) // 2) FROM deg)
                    * 1000000) AS BIGINT) / 1000000.0 + 0.0
           END AS global_clustering
    """,
)


# 11th streaming topology: dropDuplicatesWithinWatermark first-seen
# dedup + downstream count, drained AvailableNow == batch DISTINCT.
register(
    "streaming_dedup_user_days",
    _stream_windows.streaming_dedup_user_days,
    """
    WITH d AS (
        SELECT DISTINCT event_type, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_user_days,
           CAST(MIN(day) AS BIGINT) AS first_day,
           CAST(MAX(day) AS BIGINT) AS last_day
    FROM d GROUP BY 1
    """,
)


# SCD2 dimension build: islands windows partitioned by the
# HIGH-cardinality o_custkey; unique succession tiebreak = first order
# key of the run; open version carries the 99999 sentinel day.
register(
    "scd2_customer_priority",
    relational.scd2_customer_priority,
    """
    WITH base AS (
        SELECT o_custkey, o_orderpriority,
               CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day,
               o_orderkey
        FROM orders
    ), isl AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY day, o_orderkey)
             - ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderpriority
                   ORDER BY day, o_orderkey) AS island
        FROM base
    ), runs AS (
        SELECT o_custkey, o_orderpriority AS priority,
               CAST(MIN(day) AS BIGINT) AS valid_from,
               MIN(o_orderkey) AS first_key,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM isl GROUP BY o_custkey, o_orderpriority, island
    )
    SELECT o_custkey, priority, valid_from,
           CAST(COALESCE(lead(valid_from) OVER (PARTITION BY o_custkey
               ORDER BY valid_from, first_key), 99999) AS BIGINT)
               AS valid_to,
           n_orders
    FROM runs
    """,
)


# PSI covariate-drift check between the two md5 halves of the corpus;
# Laplace-smoothed over the dense 10-bucket grid, per-bucket terms
# quantized at 9 dp in scaled-integer space.
register(
    "psi_split_drift",
    text.psi_split_drift,
    """
    WITH d AS (
        SELECT (strpos('0123456789abcdef',
                    substring(md5(CAST(doc_id AS VARCHAR)), 32, 1)) % 2)
                   AS split,
               LEAST(9, n_chars // 200) AS bucket
        FROM documents
    ), hist AS (
        SELECT split, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM d GROUP BY 1, 2
    ), grid AS (
        SELECT s.split, b.bucket
        FROM (SELECT unnest(range(0, 2)) AS split) s,
             (SELECT unnest(range(0, 10)) AS bucket) b
    ), dense AS (
        SELECT g.split, g.bucket, COALESCE(cnt, 0) AS cnt
        FROM grid g LEFT JOIN hist h
          ON g.split = h.split AND g.bucket = h.bucket
    ), tot AS (
        SELECT split, SUM(cnt) AS n FROM dense GROUP BY 1
    ), wide AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN d.split = 0 THEN cnt END) AS BIGINT)
                   AS cnt_a,
               CAST(SUM(CASE WHEN d.split = 1 THEN cnt END) AS BIGINT)
                   AS cnt_b,
               CAST(MAX(CASE WHEN d.split = 0 THEN n END) AS BIGINT) AS n_a,
               CAST(MAX(CASE WHEN d.split = 1 THEN n END) AS BIGINT) AS n_b
        FROM dense d JOIN tot USING (split) GROUP BY bucket
    )
    SELECT CAST(bucket AS INT) AS bucket, cnt_a, cnt_b,
           CAST(round(((cnt_a + 1.0) / (n_a + 10.0)
                       - (cnt_b + 1.0) / (n_b + 10.0))
               * ln(((cnt_a + 1.0) / (n_a + 10.0))
                    / ((cnt_b + 1.0) / (n_b + 10.0)))
               * 1000000000.0) AS BIGINT) / 1000000000.0 + 0.0 AS psi_term
    FROM wide
    """,
)


# SQL UDF surface (Spark 4 CREATE FUNCTION): scalar tier classifier +
# exact-cents scalar + a SQL TABLE function, all inlined by the analyzer
# into one codegen'd aggregate; oracle mirrors the inlined bodies.
register(
    "sql_udf_revenue_tiers",
    relational.sql_udf_revenue_tiers,
    """
    WITH big AS (
        SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0
    )
    SELECT CASE WHEN l.l_discount <= 0.01 THEN 'none'
                WHEN l.l_discount <= 0.05 THEN 'low'
                ELSE 'high' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                * (1 + l.l_tax) * 100) AS BIGINT)) AS BIGINT)
               AS eff_cents_sum
    FROM big o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)


# Zero-shuffle fact-to-fact join: orders/lineitem persisted once per
# (session, fixture) as 8-bucket sorted warehouse tables; the join plan
# is a SortMergeJoin with NO Exchange under either side (plan-pinned).
register(
    "bucketed_colocated_join",
    relational.bucketed_colocated_join,
    """
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
                * 100.0) AS BIGINT)) AS BIGINT) AS rev_cents
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)


# 12th streaming topology: the NATIVE DataSourceStreamWriter surface —
# per-task staged JSONL shards, per-epoch atomic _EPOCH manifests,
# manifest-trust read-back; value-cents quantized before the sink.
register(
    "streaming_epoch_log_sink",
    _stream_windows.streaming_epoch_log_sink,
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events GROUP BY 1
    """,
)


# Count-min sketch as a relational (row, col) -> count table: constant
# 2048-cell shuffle at any input size; exact top-10 probes estimated by
# the min-of-cells rule, overcount always >= 0.
register(
    "countmin_heavy_hitters",
    sketches.countmin_heavy_hitters,
    """
    WITH params(r, a, b) AS (VALUES (0,31,7),(1,131,11),(2,151,13),(3,181,17)),
    cells AS (
        SELECT r, (((user_id % 2147483647) * a + b) % 2147483647) % 512 AS c,
               COUNT(*) AS n
        FROM events CROSS JOIN params GROUP BY 1, 2
    ), top AS (
        SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
        ORDER BY exact_n DESC, user_id LIMIT 10
    )
    SELECT t.user_id, CAST(t.exact_n AS BIGINT) AS exact_n,
           CAST(MIN(cl.n) AS BIGINT) AS est_n,
           CAST(MIN(cl.n) - t.exact_n AS BIGINT) AS overcount
    FROM top t CROSS JOIN params p
    JOIN cells cl ON cl.r = p.r
     AND cl.c = (((t.user_id % 2147483647) * p.a + p.b) % 2147483647) % 512
    GROUP BY t.user_id, t.exact_n
    ORDER BY exact_n DESC, user_id
    """,
)


# Asymmetric containment near-dup (doc-in-doc): C = inter / min(sz)
# >= 0.9, roles decided per-pair by (sz, doc_id); exact algorithm
# (prefix filtering is lossless), so the oracle is the brute-force
# shingle self-join.
register(
    "containment_dup_pairs",
    dedup.containment_dup_pairs,
    _SHINGLES_CTE
    + """
    SELECT CASE WHEN sb.sz < sa.sz THEN doc_b ELSE doc_a END AS doc_small,
           CASE WHEN sb.sz < sa.sz THEN doc_a ELSE doc_b END AS doc_big,
           CAST(round((inter * 1.0 / LEAST(sa.sz, sb.sz)) * 1000000.0)
                AS BIGINT) / 1000000.0 AS containment
    FROM pairs
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE inter * 1.0 / LEAST(sa.sz, sb.sz) >= 0.9
    """,
)


# Two unrolled Lloyd iterations in exact scaled-integer space — the
# registry's first ORACLE-gated iterative clustering (floor-div centroid
# updates, packed-key argmin; every intermediate an int64).
register(
    "kmeans_integer_lloyd",
    similarity.kmeans_integer_lloyd,
    """
    WITH pts AS (
        SELECT vec_id, g.i - 1 AS dim,
               CAST(round((CAST(embedding[g.i] AS DOUBLE) + 1.0) * 100000.0)
                    AS BIGINT) AS q
        FROM embeddings,
             LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) g
    ), s1 AS (
        SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8
    ), seeds AS (
        SELECT sa.vec_id, COUNT(*) - 1 AS sid
        FROM s1 sa JOIN s1 sb ON sb.vec_id <= sa.vec_id
        GROUP BY sa.vec_id
    ), c0 AS (
        SELECT s.sid AS cid, dim, q AS cq
        FROM pts p JOIN seeds s ON p.vec_id = s.vec_id
    ), d1 AS (
        SELECT p.vec_id, c.cid, SUM((p.q - c.cq) * (p.q - c.cq)) AS dist
        FROM pts p JOIN c0 c ON p.dim = c.dim GROUP BY 1, 2
    ), a1 AS (
        SELECT vec_id, MIN(dist * 1024 + cid) % 1024 AS cid
        FROM d1 GROUP BY 1
    ), c1 AS (
        SELECT a1.cid, p.dim, SUM(p.q) // COUNT(*) AS cq
        FROM pts p JOIN a1 ON p.vec_id = a1.vec_id GROUP BY 1, 2
    ), d2 AS (
        SELECT p.vec_id, c.cid, SUM((p.q - c.cq) * (p.q - c.cq)) AS dist
        FROM pts p JOIN c1 c ON p.dim = c.dim GROUP BY 1, 2
    ), a2 AS (
        SELECT vec_id, MIN(dist * 1024 + cid) % 1024 AS cid,
               MIN(dist * 1024 + cid) // 1024 AS dist
        FROM d2 GROUP BY 1
    ), c2 AS (
        SELECT a2.cid, p.dim, SUM(p.q) // COUNT(*) AS cq
        FROM pts p JOIN a2 ON p.vec_id = a2.vec_id GROUP BY 1, 2
    )
    SELECT CAST(a2.cid AS BIGINT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(a2.dist) AS BIGINT) AS inertia,
           ANY_VALUE(c2.cq) / 100000.0 - 1.0 + 0.0 AS c0_mean
    FROM a2 JOIN c2 ON c2.cid = a2.cid AND c2.dim = 0
    GROUP BY a2.cid
    ORDER BY cluster
    """,
)


# PERMISSIVE ingestion audit: deterministic corruption of every 17th
# event line in a derived JSONL feed; good-row rollups + quarantine
# count gated by the clean-table oracle.
register(
    "corrupt_record_audit",
    events.corrupt_record_audit,
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events WHERE event_id % 17 <> 0 GROUP BY 1
    UNION ALL
    SELECT '_corrupt' AS event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS cents_sum
    FROM events WHERE event_id % 17 = 0
    ORDER BY event_type
    """,
)


# 13th streaming topology: watermarked LEFT OUTER stream-stream join
# (state-eviction emission path); far-future sentinels advance both
# watermarks so the drain equals the batch LEFT JOIN exactly.
register(
    "streaming_outer_join_attribution",
    _stream_windows.streaming_outer_join_attribution,
    """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
        FROM events WHERE event_type = 'purchase'
    ), e AS (
        SELECT event_id AS error_id, user_id, CAST(ts AS TIMESTAMP) AS e_ts
        FROM events WHERE event_type = 'error'
    )
    SELECT p.purchase_id, p.user_id,
           CAST(COALESCE(e.error_id, -1) AS BIGINT) AS error_id
    FROM p LEFT JOIN e
      ON p.user_id = e.user_id
     AND e.e_ts >= p.p_ts
     AND e.e_ts <= p.p_ts + INTERVAL 30 MINUTE
    """,
)


# Spark 4 WITH RECURSIVE: data-dependent cooldown chain (2-day throttle,
# 7-day horizon) — per-hop position depends on the previous hop's value,
# inexpressible with window functions; identical recursive SQL runs in
# DuckDB.
register(
    "throttled_event_chain",
    events.throttled_event_chain,
    """
    WITH RECURSIVE u AS (
        SELECT DISTINCT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ), nextp AS (
        SELECT a.user_id, a.ts, MIN(b.ts) AS nxt
        FROM u a JOIN u b
          ON b.user_id = a.user_id
         AND b.ts >= a.ts + INTERVAL 2 DAY
         AND b.ts <= a.ts + INTERVAL 7 DAY
        GROUP BY a.user_id, a.ts
    ), anchor AS (
        SELECT user_id, MIN(ts) AS ts FROM u GROUP BY user_id
    ), chain AS (
        SELECT user_id, ts FROM anchor
        UNION ALL
        SELECT n.user_id, n.nxt
        FROM chain c JOIN nextp n
          ON n.user_id = c.user_id AND n.ts = c.ts
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_sent,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_sent,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_sent
    FROM chain GROUP BY user_id ORDER BY user_id
    """,
)


# Spark 4 native from_xml: XML wire-format round trip (third
# semi-structured format beside JSON and VARIANT), rolled up per type.
register(
    "xml_props_roundtrip",
    events.xml_props_roundtrip,
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(MIN(event_id) AS BIGINT) AS first_event,
           CAST(MAX(event_id) AS BIGINT) AS last_event
    FROM events GROUP BY 1 ORDER BY 1
    """,
)


# Spark 4 collated strings: UTF8_LCASE groupBy over a case-mangled
# source label == GROUP BY lower(...), no lowercase key column needed.
register(
    "collated_source_rollup",
    text.collated_source_rollup,
    """
    SELECT lower(source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1 ORDER BY 1
    """,
)


# 14th streaming topology: FULL OUTER stream-stream join — unmatched
# rows from BOTH sides emit via state eviction (two-feed
# reconciliation); sentinel drain, -1 no-match keys, full oracle.
register(
    "streaming_full_outer_reconcile",
    _stream_windows.streaming_full_outer_reconcile,
    """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS p_ts
        FROM events WHERE event_type = 'purchase'
    ), e AS (
        SELECT event_id AS error_id, user_id, CAST(ts AS TIMESTAMP) AS e_ts
        FROM events WHERE event_type = 'error'
    )
    SELECT COALESCE(p.user_id, e.user_id) AS user_id,
           CAST(COALESCE(p.purchase_id, -1) AS BIGINT) AS purchase_id,
           CAST(COALESCE(e.error_id, -1) AS BIGINT) AS error_id
    FROM p FULL JOIN e
      ON p.user_id = e.user_id
     AND e.e_ts >= p.p_ts
     AND e.e_ts <= p.p_ts + INTERVAL 30 MINUTE
    """,
)


# Dynamic partition pruning: hive-partitioned orders layout joined on
# its partition column against a runtime-derived month dim — Catalyst
# injects a DynamicPruningExpression into the scan (plan-pinned).
register(
    "dpp_monthly_revenue",
    relational.dpp_monthly_revenue,
    """
    WITH dim AS (
        SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS o_month
        FROM lineitem
        WHERE CAST(round(l_discount * 100) AS BIGINT) = 10
          AND l_returnflag = 'R'
          AND CAST(round(l_tax * 100) AS BIGINT) = 8
          AND l_quantity >= 45
    )
    SELECT o_month, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM (SELECT strftime(o_orderdate, '%Y-%m') AS o_month, o_totalprice
          FROM orders) o
    JOIN dim USING (o_month)
    GROUP BY 1 ORDER BY 1
    """,
)


# Winnowing (MOSS) fingerprints: window-min over positional 3-gram md5
# HEX strings (lexicographic min — byte-identical in both engines);
# top-20 partial-overlap pairs by shared fingerprint count, after the
# MOSS stop-fingerprint cap (document frequency <= 16) culls
# boilerplate fps whose pair fan-out is O(df²).
register(
    "winnowing_fingerprints",
    text.winnowing_fingerprints,
    r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents
    ), grams AS (
        SELECT doc_id,
               list_transform(range(1, len(ts) - 1),
                   i -> md5(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gh
        FROM toks WHERE len(ts) >= 6
    ), fps AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(gh) - 2),
                       j -> list_min(gh[j:j+3])))) AS fp
        FROM grams
    ), kept AS (
        -- MOSS stop-fingerprint cap (df <= 16), mirrored from the
        -- Spark side's boilerplate guard
        SELECT doc_id, fp FROM fps
        WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 16)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    ORDER BY n_shared DESC, doc_a, doc_b
    LIMIT 20
    """,
)


from .streaming import state_reader as _state_reader  # noqa: E402

# ---- round 9: engine surfaces — state source reader, SQL pipe syntax,
# ---- parameterized SQL, native listagg (APPEND-only: driver samples
# ---- the frozen first 50).


# Spark 4 State Data Source reader: drain an UNWATERMARKED per-user
# totals agg once per (session, fixture), then answer the query from
# the checkpoint's STATE FILES via format("statestore") — buffer
# decoding gated by the plain GROUP BY oracle (buffer holds exact
# integer cents because rounding happens before the sum).
register(
    "state_store_user_totals",
    _state_reader.state_store_user_totals,
    """
    SELECT user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MAX(CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
               AS last_ts
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)


# SQL pipe syntax (|> chains, Spark 4.0): FROM → WHERE → EXTEND →
# AGGREGATE → ORDER BY supplier balance rollup through the
# pipe-operator parser frontend.
register(
    "pipe_syntax_supplier_rollup",
    relational.pipe_syntax_supplier_rollup,
    """
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents_sum
    FROM supplier WHERE s_acctbal > 0
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)


# Parameterized SQL (named markers bound via args=): parameters bind as
# typed literals pre-analysis, so pushdown/constant-folding see them
# exactly like inline literals.
register(
    "parameterized_sql_brand_stats",
    relational.parameterized_sql_brand_stats,
    """
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM part
    WHERE p_size BETWEEN 10 AND 30 AND p_retailprice >= 940.0
    GROUP BY p_brand ORDER BY p_brand
    """,
)


# Native listagg (Spark 4.0, ISO SQL:2023): DISTINCT + WITHIN GROUP
# ordered concat, mirrored by DuckDB string_agg(DISTINCT ... ORDER BY).
register(
    "listagg_segments_by_nation",
    relational.listagg_segments_by_nation,
    """
    SELECT c_nationkey, segments_csv,
           CAST(len(string_split(segments_csv, ',')) AS BIGINT) AS n_segments
    FROM (SELECT c_nationkey,
                 string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
                     AS segments_csv
          FROM customer GROUP BY c_nationkey)
    ORDER BY c_nationkey
    """,
)


# Historical state reads (option("batchId", N) time travel): per-user
# totals AS OF batch 0 (even event_ids, the first of two mtime-ordered
# half files) beside the latest committed state — groups a batch hasn't
# seen are absent from its snapshot, mirrored by the oracle's per-half
# GROUP BY branches.
register(
    "state_evolution_snapshots",
    _state_reader.state_evolution_snapshots,
    """
    SELECT CAST(0 AS BIGINT) AS snapshot_batch, user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events WHERE event_id % 2 = 0 GROUP BY user_id
    UNION ALL
    SELECT CAST(1 AS BIGINT) AS snapshot_batch, user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    ORDER BY snapshot_batch, user_id
    """,
)


# 15th streaming topology — RocksDB state store provider (the 100 TB
# production state backend; every other topology runs the default
# HDFS-backed provider): per-(event_type, day) rollup drained under
# RocksDB, result == batch GROUP BY.
register(
    "rocksdb_daily_type_rollup",
    _stream_windows.rocksdb_daily_type_rollup,
    """
    SELECT event_type,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events GROUP BY 1, 2 ORDER BY event_type, day
    """,
)


# Per-event-gap session windows (session_window(ts, gap_column) —
# purchases hold sessions open 2h, other events 30min); oracle is the
# variable-gap islands formulation (running MAX of ts+gap, unique
# (ts, event_id) tiebreak). Boundary rule: Spark merges an event landing
# EXACTLY at the running session end (touching intervals coalesce), so
# the islands break condition is STRICT ts > MAX(ts + gap) — verified
# empirically and pinned by tests/test_streaming_windows.py.
register(
    "dynamic_gap_sessions",
    _stream_windows.dynamic_gap_sessions,
    """
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 2 HOUR
                    ELSE INTERVAL 30 MINUTE END AS gap
        FROM events
    ), b AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ROW_NUMBER() OVER w = 1 THEN 1
                    WHEN ts > MAX(ts + gap) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, event_type,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM b
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchases
    FROM s GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)


# 16th streaming topology — writeStream.toTable catalog sink (file-sink
# commit protocol + warehouse metadata): watermark-closed daily windows
# read back from the table, last open day unioned from a batch agg of
# the same source; one plain GROUP BY oracle covers the union exactly.
register(
    "streaming_table_sink_daily",
    _stream_windows.streaming_table_sink_daily,
    """
    SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS max_cents,
           CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS min_cents
    FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
)


# Polymorphic UDTF (static analyze() computes the output schema from a
# constant argument — w0..w3 for n=4); padding beyond the word count is
# NULL, mirrored by DuckDB's out-of-range list indexing.
register(
    "polymorphic_split_udtf",
    relational.polymorphic_split_udtf,
    r"""
    WITH t AS (
        SELECT p_partkey,
               regexp_split_to_array(NULLIF(trim(p_name), ''), '\s+') AS w
        FROM part
    )
    SELECT p_partkey, w[1] AS w0, w[2] AS w1, w[3] AS w2, w[4] AS w3
    FROM t
    """,
)


# Stream-stream JOIN state read (joinSide + batchId=0): batch 0 commits
# under the previous watermark (nothing evicted), so each side's
# buffered state is exactly its filtered input — a plain UNION oracle.
# The post-eviction final state (sentinels only) is pytest-pinned.
register(
    "join_state_buffered_sides",
    _state_reader.join_state_buffered_sides,
    """
    SELECT 'purchase' AS side, event_id, user_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
               AS buffered_ts
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT 'error' AS side, event_id, user_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
               AS buffered_ts
    FROM events WHERE event_type = 'error'
    ORDER BY side, event_id
    """,
)


# SQL scripting (BEGIN..END WHILE loop): iterative 2x-mean trim with a
# data-dependent rebind count — the oracle replays the identical
# integer recurrence as a recursive CTE (casts mirror Spark's BIGINT
# DIV; NULLIF guards the empty fixture on both engines).
register(
    "sql_script_trimmed_threshold",
    relational.sql_script_trimmed_threshold,
    """
    WITH RECURSIVE o AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), it(i, t) AS (
        SELECT 0, (SELECT CAST(2 * (SUM(cents) // NULLIF(COUNT(*), 0))
                        AS BIGINT) FROM o)
        UNION ALL
        SELECT i + 1,
               (SELECT CAST(2 * (SUM(cents) // NULLIF(COUNT(*), 0))
                       AS BIGINT) FROM o WHERE cents <= t)
        FROM it
        WHERE i < 8
          AND (SELECT CAST(2 * (SUM(cents) // NULLIF(COUNT(*), 0))
                      AS BIGINT) FROM o WHERE cents <= t) < t
    ), fin AS (
        SELECT i, t FROM it ORDER BY i DESC LIMIT 1
    )
    SELECT CAST(fin.i AS BIGINT) AS n_iters,
           CAST(COALESCE(fin.t, -1) AS BIGINT) AS threshold_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM o WHERE cents <= fin.t)
               AS n_survivors,
           (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT)
            FROM o WHERE cents <= fin.t) AS survivor_cents_sum
    FROM fin
    """,
)


# EXECUTE IMMEDIATE over a session-variable statement text with
# positional USING binds — the dynamic-SQL frontend; plain GROUP BY
# oracle with the literals inlined.
register(
    "execute_immediate_brand_topn",
    relational.execute_immediate_brand_topn,
    """
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM part WHERE p_size <= 25
    GROUP BY p_brand
    ORDER BY cents_sum DESC, p_brand
    LIMIT 10
    """,
)


# state-metadata reads: every value is fixed by the drain mechanics
# (store layout per operator, the two sizing constants, committed batch
# range), so the oracle is a VALUES literal — if BOUNDED_KEY_PARTITIONS
# or OUTER_JOIN_STATE_PARTITIONS changes, this goes loudly red by design.
register(
    "state_metadata_overview",
    _state_reader.state_metadata_overview,
    """
    SELECT * FROM (VALUES
        ('agg', 'stateStoreSave', 'default',
         CAST(8 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        ('join', 'symmetricHashJoin', 'left-keyToNumValues',
         CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        ('join', 'symmetricHashJoin', 'left-keyWithIndexToValue',
         CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        ('join', 'symmetricHashJoin', 'right-keyToNumValues',
         CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)),
        ('join', 'symmetricHashJoin', 'right-keyWithIndexToValue',
         CAST(4 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT))
    ) AS t(checkpoint, operator_name, store_name,
           num_partitions, min_batch_id, max_batch_id)
    ORDER BY checkpoint, store_name
    """,
)


# IDENTIFIER(:param) dynamic identifiers — plan identical to the
# literal query, so the oracle is the literal query.
register(
    "identifier_clause_rollup",
    relational.identifier_clause_rollup,
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# GROUP BY ALL + exact ordered-set percentiles over integer cents;
# quarter fractions keep percentile_cont binary-exact on both engines
# (lower + (upper-lower)*dyadic on bigints), percentile_disc picks a
# data value. DuckDB mirrors GROUP BY ALL verbatim.
register(
    "group_by_all_percentiles",
    relational.group_by_all_percentiles,
    """
    WITH c AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem
    )
    SELECT l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           median(cents) AS median_cents,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) AS p25_cents,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY cents) AS p75_cents,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cents)
                AS BIGINT) AS p90_disc_cents
    FROM c
    GROUP BY ALL
    ORDER BY l_partkey
    """,
)


# State change feed over the two-batch evolution checkpoint: batch 0's
# 'update' changes are the even-half totals, batch 1's are the full
# totals for users the odd half touched — two filtered GROUP BY branches.
register(
    "state_change_feed_user_totals",
    _state_reader.state_change_feed_user_totals,
    """
    SELECT CAST(0 AS BIGINT) AS batch_id, 'update' AS change_type,
           user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events WHERE event_id % 2 = 0 GROUP BY user_id
    UNION ALL
    SELECT CAST(1 AS BIGINT) AS batch_id, 'update' AS change_type,
           user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    HAVING SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) > 0
    ORDER BY batch_id, user_id
    """,
)


# Z-order (Morton) clustered layout: the 2-D box answered from the
# z-clustered stage table; min/max z in the output value-gates the
# 32-term interleave (one shared formula generator feeds both engines);
# the row-group pruning the layout buys is pinned in
# tests/test_scale_techniques.py.
register(
    "zorder_box_pruning",
    layout.zorder_box_pruning,
    layout.zorder_box_oracle_sql(),
)


# PII redaction: detect/count/replace emails/IPv4s/phones in a derived
# deterministic PII-bearing feed (shared feed expression + shared
# regexes), with an order-independent md5 checksum of the REDACTED text
# proving byte-identical redaction across engines.  DuckDB needs the
# 'g' flag for replace-all (Spark's regexp_replace is global by default)
# and length(regexp_extract_all()) for match counts.
register(
    "pii_redaction_counts",
    text.pii_redaction_counts,
    f"""
    WITH feed AS (
        SELECT source, {text._pii_feed_sql("text", "doc_id")} AS t
        FROM documents
    ), red AS (
        SELECT source,
               length(regexp_extract_all(t, '{text.PII_EMAIL_RE}'))
                   AS n_email,
               length(regexp_extract_all(t, '{text.PII_IPV4_RE}')) AS n_ip,
               length(regexp_extract_all(t, '{text.PII_PHONE_RE}'))
                   AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(
                   t, '{text.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{text.PII_IPV4_RE}', '<IP>', 'g'),
                   '{text.PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM feed
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_docs_with_pii,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_ip) AS BIGINT) AS ips,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(CAST(CONCAT('0x', substr(md5(redacted), 1, 7))
                         AS BIGINT)) % 2147483647 AS BIGINT)
               AS redacted_checksum
    FROM red GROUP BY source ORDER BY source
    """,
)


# mergeSchema evolution read: v1 files (odd keys) lack o_orderpriority,
# so their rows roll up under 'unknown'; the oracle replays the parity
# split.
register(
    "merge_schema_evolution_read",
    relational.merge_schema_evolution_read,
    """
    SELECT CASE WHEN o_orderkey % 2 = 1 THEN 'v1' ELSE 'v2' END AS gen,
           CASE WHEN o_orderkey % 2 = 1 THEN 'unknown'
                ELSE o_orderpriority END AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM orders
    GROUP BY 1, 2
    ORDER BY gen, priority
    """,
)


# LSH (b, r) planning S-curve: every power is an exact multiplication
# chain (b, r are powers of two), never pow() — libm-free, bit-identical
# across engines; 6-dp scaled-integer round; crossover = smallest grid
# s with P >= 0.5.
register(
    "lsh_parameter_planner",
    dedup.lsh_parameter_planner,
    """
    WITH b(b) AS (VALUES (4), (8), (16), (32)),
    r(r) AS (VALUES (2), (4), (8)),
    s(s100) AS (SELECT UNNEST(range(5, 100, 5))),
    g AS (
        SELECT b, r, s100, CAST(s100 AS DOUBLE) / 100.0 AS sv
        FROM b CROSS JOIN r CROSS JOIN s
    ), powed AS (
        SELECT b, r, s100,
               CASE WHEN r = 2 THEN (sv * sv)
                    WHEN r = 4 THEN (sv * sv) * (sv * sv)
                    ELSE ((sv * sv) * (sv * sv)) * ((sv * sv) * (sv * sv))
               END AS sr
        FROM g
    ), qd AS (
        SELECT b, r, s100, 1.0 - sr AS q FROM powed
    ), qb AS (
        SELECT b, r, s100,
               CASE WHEN b = 4 THEN (q * q) * (q * q)
                    WHEN b = 8 THEN ((q * q) * (q * q)) * ((q * q) * (q * q))
                    WHEN b = 16 THEN (((q * q) * (q * q)) * ((q * q) * (q * q)))
                                   * (((q * q) * (q * q)) * ((q * q) * (q * q)))
                    ELSE ((((q * q) * (q * q)) * ((q * q) * (q * q)))
                          * (((q * q) * (q * q)) * ((q * q) * (q * q))))
                       * ((((q * q) * (q * q)) * ((q * q) * (q * q)))
                          * (((q * q) * (q * q)) * ((q * q) * (q * q))))
               END AS qb
        FROM qd
    ), curve AS (
        SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
               CAST(s100 AS BIGINT) AS s100,
               CAST(round((1.0 - qb) * 1000000.0) AS BIGINT) / 1000000.0
                   AS p_detect
        FROM qb
    )
    SELECT b, r, s100, p_detect,
           CAST(COALESCE(MIN(CASE WHEN p_detect >= 0.5 THEN s100 END)
                         OVER (PARTITION BY b, r), -1) AS BIGINT)
               AS crossover_s100
    FROM curve
    ORDER BY b, r, s100
    """,
)


# Hilbert-curve layout twin of zorder_box_pruning: same box, min/max
# CURVE POSITION value-gates the unrolled rotation recurrence (one
# shared 16-level generator feeds both engines).
register(
    "hilbert_box_pruning",
    layout.hilbert_box_pruning,
    layout.hilbert_box_oracle_sql(),
)


# ANSI try_* family: try_divide -> NULL on zero denominators (counted
# as quarantined), try_cast -> NULL on malformed numbers; quotients of
# exact integers quantized to bigint THOUSANDTHS before summing (the
# round-11 ADVICE fix: millionths overflowed bigint sums near SF 10).
register(
    "ansi_try_arithmetic_audit",
    relational.ansi_try_arithmetic_audit,
    """
    WITH o AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CAST(o_custkey % 5 AS BIGINT) AS den,
               CONCAT(CAST(o_totalprice AS VARCHAR), 'x') AS malformed
        FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN den = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quarantined,
           CAST(COALESCE(SUM(CAST(round((cents * 1.0 / NULLIF(den, 0))
                                        * 1000.0) AS BIGINT)), 0)
                AS BIGINT) AS ratio_thousandths_sum,
           CAST(SUM(CASE WHEN TRY_CAST(malformed AS DOUBLE) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_nulls
    FROM o GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


# JOIN-STATE change feed (readChangeFeed over the outer join's
# buffered-row stores, per side via storeName — joinSide+readChangeFeed
# is STDS_CONFLICT_OPTIONS): batch 0's 'update' changes are exactly the
# buffered inputs (nothing evicts under the previous watermark), the
# same filtered UNION as the snapshot read — cross-surface equality
# feed@batch0 == snapshot@batch0.  Batch-1 eviction churn is
# intra-batch-unordered (tail-swap compaction) and pytest-pinned.
register(
    "join_state_change_feed",
    _state_reader.join_state_change_feed,
    """
    SELECT CAST(0 AS BIGINT) AS batch_id, 'update' AS change_type,
           'purchase' AS side, event_id, user_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
               AS buffered_ts
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT CAST(0 AS BIGINT), 'update', 'error', event_id, user_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')
    FROM events WHERE event_type = 'error'
    ORDER BY side, event_id
    """,
)


# Rank-quantized curve layout (the unbounded-domain fix for fixed-width
# curves): keys -> equi-depth rank buckets (range_partition_planner's
# cum_before * QB DIV n recipe) -> Morton interleave over the dense
# bucket grid.  The oracle replays the rank CTEs AND the shared
# interleave formula; min/max qz value-gate the quantizer pipeline.
from .operators import layout as _layout  # noqa: E402

register(
    "quantized_box_pruning",
    _layout.quantized_box_pruning,
    _layout.quantized_box_oracle_sql(),
)


# Incremental file ingest with restart-resume (foreachBatch +
# AvailableNow over one checkpoint; second drain sees ONLY the newly
# arrived file — pinned in tests/test_streaming_ingest.py): the sink's
# union equals a plain GROUP BY over the whole fixture.
from .streaming import ingest as _ingest  # noqa: E402

register(
    "incremental_ingest_totals",
    _ingest.incremental_ingest_totals,
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)


# TABLESAMPLE (10 PERCENT) REPEATABLE(42): scan-side Bernoulli sample.
# Rows-only by design — DuckDB's BERNOULLI sampler uses a different
# RNG, so the exact sampled set is engine-specific; in-session
# determinism is pinned in tests/test_streaming_ingest.py.
register(
    "tablesample_priority_profile",
    relational.tablesample_priority_profile,
    None,
)


# Reciprocal Rank Fusion hybrid retrieval: BM25 lexical top-20 (shared
# CTEs with bm25_search) fused with cosine-vs-PRF-centroid semantic
# top-20; rrf = 1/(60+r_lex) + 1/(60+r_sem).  Centroid averaged in
# scaled-integer space; dot products via list_dot_product (the
# cosine_topk fold-order precedent); doc_id tiebreaks everywhere.
register(
    "rrf_hybrid_retrieval",
    similarity.rrf_hybrid_retrieval,
    r"""
    WITH dl AS (
        SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS dl
        FROM documents
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
            FROM documents
        ) WHERE token IN ('scan', 'column', 'filter')
        GROUP BY 1, 2
    ),
    df_ AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    bm25 AS (
        SELECT tf.doc_id,
               round(CAST(SUM(CAST(round(
                   ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
                   * (tf * 2.2e0)
                   / (tf + 1.2e0 * (0.25e0 + 0.75e0
                       * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))),
                   9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS score
        FROM tf
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN df_ ON tf.token = df_.token
        CROSS JOIN stats
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id, rk AS lex_rank FROM (
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS rk
            FROM bm25
        ) WHERE rk <= 20
    ),
    v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
    ),
    top3v AS (
        SELECT ve FROM v JOIN lex ON v.vec_id = lex.doc_id
        WHERE lex.lex_rank <= 3
    ),
    cent AS (
        SELECT ord,
               (CAST(SUM(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE)
                / COUNT(*)) / 1e9 AS c
        FROM (
            SELECT unnest(ve) AS x, generate_subscripts(ve, 1) AS ord
            FROM top3v
        )
        GROUP BY ord
    ),
    carr AS (SELECT list(c ORDER BY ord) AS cv FROM cent),
    sem AS (
        SELECT doc_id, rk AS sem_rank FROM (
            SELECT vec_id AS doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id)
                        AS BIGINT) AS rk
            FROM (
                SELECT vec_id,
                       round(list_dot_product(cv, ve)
                             / (sqrt(list_dot_product(cv, cv))
                                * sqrt(list_dot_product(ve, ve))), 6) AS sim
                FROM v CROSS JOIN carr
            )
        ) WHERE rk <= 20
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               lex_rank, sem_rank,
               round(COALESCE(1.0 / (60 + lex_rank), 0.0)
                     + COALESCE(1.0 / (60 + sem_rank), 0.0), 9) AS rrf_score
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT fused_rank, doc_id,
           CAST(COALESCE(lex_rank, -1) AS BIGINT) AS lex_rank,
           CAST(COALESCE(sem_rank, -1) AS BIGINT) AS sem_rank,
           rrf_score
    FROM (
        SELECT doc_id, lex_rank, sem_rank, rrf_score,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
                    AS BIGINT) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= 10 ORDER BY fused_rank
    """,
)


# URL canonicalization + dedup: derived 6-variant URL feed (case/port/
# slash/fragment/utm variants per page id); one expression generator
# feeds both engines (DuckDB gets the 'g' replace-all flag and
# NULL-guarded extracts).  Hash-key groupBy on the canonical form.
register(
    "url_canonical_dedup",
    text.url_canonical_dedup,
    (
        lambda feed, canon: f"""
    WITH feed AS (
        SELECT doc_id, {feed} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id, url, {canon} AS canonical_url FROM feed
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_spellings,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
    FROM canon GROUP BY canonical_url ORDER BY canonical_url
    """
    )(text.url_feed_sql("duckdb"), text.url_canon_sql("url", "duckdb")),
)
