package graft.queries

/** DuckDB oracle SQL for every SQL-expressible query in [[QueryPack]].
  * Runs against views named after the testdata parquet files
  * (region/nation/customer/supplier/part/orders/lineitem/events/documents/
  * embeddings). Column names and ordering match the Spark outputs exactly
  * (the driver sorts columns by name before hashing values).
  *
  * The LSH/sketch queries (dd03, dd04, dd05, ann02, ann04) are oracled via
  * planted EXACT copies (`id + 100000`): an identical document/vector is
  * GUARANTEED to collide with its original in every band/chunk/cell, so
  * the planted relation is the provable output of the full LSH pipeline
  * and DuckDB re-derives it from the planting formula alone — no MinHash/
  * SimHash/hyperplane evaluation needed oracle-side. Probabilistic recall
  * on noisy copies stays sbt-spec'd (OperatorsSpec).
  */
object Oracles {

  /** txt14's SQL assembled from the SAME workload definition the Spark
    * side uses ([[graft.operators.text.TextOps.bm25Queries]]) — the query
    * terms, their addition order, and the literal-folded constants cannot
    * drift between the two engines.
    */
  private object Bm25 {
    private val queries = graft.operators.text.TextOps.bm25Queries
    private val terms = queries.flatMap(_._2).distinct.sorted
    val termList: String = terms.map(t => s"'$t'").mkString(", ")
    val tfAggs: String = terms.map(t =>
      s"SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(",\n    ")
    val dfAggs: String = terms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n    ")
    private def termScore(t: String): String =
      s"((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / " +
        s"(CAST(df_$t AS DOUBLE) + 0.5)) * ((CAST(tf_$t AS DOUBLE) * 2.2) / " +
        s"(CAST(tf_$t AS DOUBLE) + 1.2 * (0.25 + 0.75 * " +
        "(CAST(dl * n_docs AS DOUBLE) / CAST(total_tokens AS DOUBLE)))))"
    val scoredUnion: String = queries.map { case (qid, qTerms) =>
      val score = qTerms.map(termScore).mkString(" + ")
      s"  SELECT $qid AS query_id, doc_id, dl, $score AS score\n" +
        "  FROM tf CROSS JOIN stats CROSS JOIN dfs"
    }.mkString("\n  UNION ALL\n")
  }

  /** Shared derivation of the CDC change set from `events` — must mirror
    * [[graft.operators.cdc.ChangeStream.changes]] exactly.
    */
  private val changesCte: String = """WITH changes AS (
  SELECT
    event_id AS seq,
    user_id * 4294967296 + event_id AS lsn,
    event_id // 10 AS xid,
    CASE event_type WHEN 'signup' THEN 'insert' WHEN 'error' THEN 'delete' ELSE 'update' END AS op,
    'public' AS schema_name,
    CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'todo' ELSE 'order' END AS table_name,
    epoch_ms(ts) AS commit_ms,
    CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
    CAST(round(value * 100) AS BIGINT) AS val_cents,
    user_id AS record_id
  FROM events
)"""

  private val toksCte: String = """WITH toks AS (
  SELECT doc_id, lang, text, length(text) AS len,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents
)"""

  /** Shared by txt18 (batch) and txt21 (streamed fold) — one sketch
    * definition, two execution lanes.
    */
  /** cdc24's signed-delta aggregate — shared verbatim by cdc26 (the
    * streaming fold): integer-sum mergeability makes the folded state
    * equal the one-shot aggregate exactly.
    */
  private lazy val deltaAggOracle: String = s"""$changesCte,
contribs AS (
  SELECT table_name, 1 AS sign, k AS ck, val_cents AS cv
  FROM changes WHERE op = 'insert'
  UNION ALL
  SELECT table_name, -1, k, val_cents FROM changes WHERE op = 'delete'
  UNION ALL
  SELECT table_name, -1,
    k - CASE WHEN k % 5 = 0 THEN 0 ELSE 1 END,
    val_cents - CASE WHEN k % 3 = 0 THEN 0 ELSE 150 END
  FROM changes WHERE op = 'update'
  UNION ALL
  SELECT table_name, 1, k, val_cents FROM changes WHERE op = 'update')
SELECT table_name, ck % 8 AS k_bucket,
  CAST(sum(sign) AS BIGINT) AS row_delta,
  CAST(sum(sign * cv) AS BIGINT) AS cents_delta
FROM contribs GROUP BY table_name, ck % 8
ORDER BY table_name, k_bucket"""

  /** Shared by txt24 (batch) and txt25 (streamed counter fold) — one
    * sketch definition, two execution lanes (the kmv/deltaAgg device).
    */
  private val lenQuantOracle: String = """
WITH t AS (
  SELECT source,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL),
b AS (
  SELECT source, CAST(length(bin(CAST(len(toks) AS BIGINT))) AS BIGINT) AS bucket
  FROM t WHERE len(toks) > 0),
g AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS n_in_bucket
      FROM b GROUP BY 1, 2),
c AS (SELECT source, bucket, n_in_bucket,
        CAST(sum(n_in_bucket) OVER (
          PARTITION BY source ORDER BY bucket) AS BIGINT) AS cum,
        CAST(sum(n_in_bucket) OVER (PARTITION BY source) AS BIGINT) AS n_docs
      FROM g),
q AS (SELECT source,
        min(CASE WHEN cum * 100 >= n_docs * 50 THEN bucket END) AS b50,
        min(CASE WHEN cum * 100 >= n_docs * 90 THEN bucket END) AS b90,
        min(CASE WHEN cum * 100 >= n_docs * 99 THEN bucket END) AS b99
      FROM c GROUP BY source)
SELECT c.source, bucket, n_in_bucket, cum, n_docs,
  (CAST(1 AS BIGINT) << CAST(b50 - 1 AS INT)) AS p50_lo,
  (CAST(1 AS BIGINT) << CAST(b50 AS INT)) - 1 AS p50_hi,
  (CAST(1 AS BIGINT) << CAST(b90 - 1 AS INT)) AS p90_lo,
  (CAST(1 AS BIGINT) << CAST(b90 AS INT)) - 1 AS p90_hi,
  (CAST(1 AS BIGINT) << CAST(b99 - 1 AS INT)) AS p99_lo,
  (CAST(1 AS BIGINT) << CAST(b99 AS INT)) - 1 AS p99_hi
FROM c JOIN q USING (source)
ORDER BY source, bucket"""

  private val kmvOracle: String = """
WITH t AS (
  SELECT source,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT source, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3),
h AS (
  SELECT DISTINCT source,
    CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h FROM s),
rn AS (SELECT source, h,
       row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
sk AS (SELECT source, CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS kth_hash
       FROM rn WHERE rn <= 64 GROUP BY source)
SELECT source, n_sketch, kth_hash,
  CASE WHEN n_sketch < 64 THEN n_sketch
       WHEN kth_hash >= 144115188075855872
         THEN (1152921504606846976 // kth_hash) * 63
       ELSE (1152921504606846976 // kth_hash) * 63
          + ((1152921504606846976 % kth_hash) * 63) // kth_hash
  END AS est_distinct
FROM sk ORDER BY source"""

  /** txt22 — HLL registers + integral estimator: same distinct-hash head
    * as the KMV oracle; registers via binary-string arithmetic (lpad/bin/
    * strpos produce identical strings on both engines); the estimator
    * divides the SHARED numerator literal
    * ([[graft.operators.text.TextOps.HllNumerator]]) by an exact 63-bit
    * integer denominator — no float anywhere.
    */
  private lazy val hllOracle: String = s"""
WITH t AS (
  SELECT source,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT source, unnest(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM t WHERE len(toks) >= 3),
h AS (
  SELECT DISTINCT source,
    CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) AS h FROM s),
r AS (
  SELECT source, h % 16 AS bucket,
    CASE WHEN strpos(lpad(bin((h // 16) % 281474976710656), 48, '0'), '1') = 0
         THEN 49
         ELSE strpos(lpad(bin((h // 16) % 281474976710656), 48, '0'), '1')
    END AS rho
  FROM h),
regs AS (SELECT source, bucket, CAST(max(rho) AS BIGINT) AS register
         FROM r GROUP BY source, bucket),
srcs AS (SELECT DISTINCT source FROM h),
grid AS (SELECT source, range AS bucket FROM srcs CROSS JOIN range(16)),
fullr AS (SELECT g.source, g.bucket, COALESCE(register, 0) AS register
          FROM grid g LEFT JOIN regs USING (source, bucket)),
summ AS (SELECT source,
    CAST(sum(CAST(1 AS BIGINT) << CAST(49 - register AS INTEGER)) AS BIGINT)
      AS s_denom,
    CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
  FROM fullr GROUP BY source),
ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact FROM h GROUP BY source)
SELECT f.source, f.bucket, f.register, n_empty,
  ${graft.operators.text.TextOps.HllNumerator} // s_denom AS est_hll, n_exact
FROM fullr f JOIN summ USING (source) JOIN ex USING (source)
ORDER BY f.source, f.bucket"""

  val sql: Map[String, String] = Map(

    "q01_pricing_summary" -> """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
  CAST(sum(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
  count(*) AS count_order,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100.0 AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",

    "q02_top_orders" -> """
SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_orderpriority, r.revenue_cents
FROM (SELECT l_orderkey,
        CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem GROUP BY l_orderkey) r
JOIN orders o ON r.l_orderkey = o.o_orderkey
ORDER BY r.revenue_cents DESC, o.o_orderkey
LIMIT 10""",

    "q03_revenue_by_nation" -> """
SELECT r.r_name, n.n_name,
  CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
  count(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name""",

    "q04_forecast_revenue" -> """
SELECT CAST(sum(CAST(round((l_extendedprice * l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",

    "q05_lineitem_windows" -> """
SELECT l_orderkey, l_linenumber,
  row_number() OVER w AS rn,
  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty_cents,
  lag(l_linenumber, 1) OVER w AS prev_line
FROM lineitem
WHERE l_orderkey % 100 = 0
WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
ORDER BY l_orderkey, l_linenumber""",

    "q06_top_customers" -> """
WITH spend AS (
  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM orders GROUP BY o_custkey)
SELECT c_mktsegment, c_custkey, c_name, spend_cents,
       row_number() OVER (PARTITION BY c_mktsegment ORDER BY spend_cents DESC, c_custkey) AS rnk
FROM spend JOIN customer ON o_custkey = c_custkey
QUALIFY rnk <= 3
ORDER BY c_mktsegment, rnk""",

    "q07_rollup_counts" -> """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",

    "q08_setops" -> """
WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     auto AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
SELECT c_custkey, 'rich_auto' AS set_kind FROM (SELECT * FROM big INTERSECT SELECT * FROM auto)
UNION ALL
SELECT c_custkey, 'rich_other' AS set_kind FROM (SELECT * FROM big EXCEPT SELECT * FROM auto)
ORDER BY set_kind, c_custkey""",

    "q09_cust_no_big_orders" -> """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey""",

    "q10_median_price" -> """
SELECT p_brand,
  quantile_cont(p_retailprice, 0.5) AS median_price,
  min(p_retailprice) AS min_price,
  max(p_retailprice) AS max_price,
  count(*) AS n_parts
FROM part
GROUP BY p_brand
ORDER BY p_brand""",

    "q11_hourly_events" -> """
SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY hour_ms, event_type
ORDER BY hour_ms, event_type""",

    "q12_sessionize" -> """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
gaps AS (
  SELECT user_id, ts_ms,
    CASE WHEN lag(ts_ms) OVER w IS NULL
           OR ts_ms - lag(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
sess AS (
  SELECT user_id, ts_ms,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_ms
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM gaps),
per_session AS (
  SELECT user_id, session_idx, count(*) AS n_events,
         max(ts_ms) - min(ts_ms) AS duration_ms
  FROM sess GROUP BY user_id, session_idx)
SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
       max(duration_ms) AS max_session_ms
FROM per_session GROUP BY user_id ORDER BY user_id""",

    "q13_user_pivot" -> """
SELECT user_id,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id ORDER BY user_id""",

    "cdc01_changeset" -> s"""$changesCte
SELECT * FROM changes ORDER BY seq""",

    "cdc02_lsn_format" -> s"""$changesCte
SELECT seq, lsn,
  to_hex(lsn >> 32) || '/' || to_hex(lsn & 4294967295) AS lsn_str
FROM changes ORDER BY seq""",

    "cdc03_subscription" -> s"""$changesCte
SELECT seq, table_name, op FROM changes
WHERE table_name IN ('user', 'todo') ORDER BY seq""",

    "cdc04_op_filter" -> s"""$changesCte
SELECT seq, k FROM changes
WHERE op = 'update' AND schema_name = 'public' AND table_name = 'todo'
ORDER BY seq""",

    "cdc05_txn_assembly" -> s"""$changesCte
SELECT xid, count(*) AS n_changes, min(seq) AS first_seq, max(seq) AS last_seq,
  CAST(sum(CASE WHEN op = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_insert,
  CAST(sum(CASE WHEN op = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS n_update,
  CAST(sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_delete,
  max(commit_ms) AS last_commit_ms
FROM changes GROUP BY xid ORDER BY xid""",

    // changed fields of an UPDATE: k (unless k%5=0), val_cents (unless
    // k%3=0), updated_at (always) — mirrors ChangeStream.withRecords.
    "cdc06_diff" -> s"""$changesCte
SELECT seq, field, old_value, new_value FROM (
  SELECT seq, 'k' AS field,
         CAST(k - 1 AS VARCHAR) AS old_value, CAST(k AS VARCHAR) AS new_value
  FROM changes WHERE op = 'update' AND k % 5 <> 0
  UNION ALL
  SELECT seq, 'updated_at',
         CAST(commit_ms - 1000 AS VARCHAR), CAST(commit_ms AS VARCHAR)
  FROM changes WHERE op = 'update'
  UNION ALL
  SELECT seq, 'val_cents',
         CAST(val_cents - 150 AS VARCHAR), CAST(val_cents AS VARCHAR)
  FROM changes WHERE op = 'update' AND k % 3 <> 0
) ORDER BY seq, field""",

    // op IS NULL passes, mirroring the fused predicate: a NULL-op event
    // has no defined diff and F6 passes it (the synthetic changes CTE
    // never yields NULL op, but the semantics must match row-for-row)
    "cdc07_unwatched_fields" -> s"""$changesCte
SELECT seq, op FROM changes
WHERE op IS NULL OR op <> 'update' OR k % 3 <> 0 OR k % 5 <> 0
ORDER BY seq""",

    "cdc08_unwatched_records" -> s"""$changesCte
SELECT seq, k FROM changes WHERE k <> 0 ORDER BY seq""",

    "cdc09_event_cast" -> s"""$changesCte
SELECT seq, table_name AS name, op AS type, commit_ms AS timestamp_ms,
  to_hex(lsn >> 32) || '/' || to_hex(lsn & 4294967295) AS lsn_str,
  '0.1.0' AS source_version, 'testdata' AS source_db,
  schema_name AS source_schema, table_name AS source_table,
  'id:int8,val_cents:int8,k:int8,updated_at:int8' AS source_columns,
  4 AS n_fields
FROM changes ORDER BY seq""",

    "cdc13_typed_records" -> """
SELECT * FROM (VALUES
 (1, 1, 'alpha', true, CAST(1234 AS BIGINT), 0.5, DATE '2024-01-15',
  '2024-03-15 06:30:05', epoch_ms(TIMESTAMPTZ '2024-03-15 06:30:05+02:00'),
  '4869', CAST(6 AS BIGINT), '550e8400-e29b-41d4-a716-446655440000',
  CAST(123456 AS BIGINT),
  '06:30:05', '04:30:05', 14, 3, CAST(14706000007 AS BIGINT),
  CAST(41 AS BIGINT), true),
 (2, 2, 'b"q" é', false, CAST(NULL AS BIGINT), -2.25, CAST(NULL AS DATE),
  CAST(NULL AS VARCHAR), epoch_ms(TIMESTAMPTZ '2024-03-15 08:30:05+02:00'),
  CAST(NULL AS VARCHAR), CAST(30 AS BIGINT),
  'c0ffee00-0000-4000-8000-000000000000', CAST(-6789 AS BIGINT),
  '23:59:59.123456', '05:29:59.5', 0, -3, CAST(0 AS BIGINT),
  CAST(NULL AS BIGINT), false),
 (3, CAST(NULL AS INT), '日本語 text', CAST(NULL AS BOOLEAN), CAST(5 AS BIGINT),
  CAST('NaN' AS DOUBLE), DATE '2024-02-29', '2024-06-01 00:00:00',
  epoch_ms(TIMESTAMPTZ '2024-06-01 00:00:00+00:00'), '00FF', CAST(0 AS BIGINT),
  CAST(NULL AS VARCHAR), CAST(1 AS BIGINT),
  CAST(NULL AS VARCHAR), '10:00:00', 0, 0, CAST(7384000000 AS BIGINT),
  CAST(7 AS BIGINT), true),
 (4, -5, 'x,y{z}', true, CAST(-1234568 AS BIGINT), 1000.0, DATE '1999-12-31',
  '2030-01-01 23:59:59', epoch_ms(TIMESTAMPTZ '1999-12-31 23:59:59-05:00'),
  '', CAST(2 AS BIGINT), 'not-a-uuid', CAST(123400 AS BIGINT),
  CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INT),
  CAST(NULL AS INT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), false)
) AS t(idx, id, name, active, score_cents, ratio, born, ts_s, tstz_ms,
       data_hex, tags_sum, uid, price_cents, time_s, timetz_utc_s,
       iv_months, iv_days, iv_micros, js_a, js_valid)
ORDER BY idx""",

    "cdc14_stream_replay" -> s"""$changesCte
SELECT seq, (xid + 1) * 65536 AS lsn, xid, op, schema_name, table_name,
       commit_ms, k, val_cents, record_id
FROM changes ORDER BY seq""",

    "cdc15_stream_hourly" -> s"""$changesCte
SELECT commit_ms - commit_ms % 3600000 AS hour_ms, table_name, op,
       count(*) AS n
FROM changes GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // append+watermark lane: the closed-window set must equal the batch
    // answer (the horizon sentinel closes every real window and its own
    // open window never emits) — so the oracle is cdc15's, verbatim
    "cdc19_stream_append" -> s"""$changesCte
SELECT commit_ms - commit_ms % 3600000 AS hour_ms, table_name, op,
       count(*) AS n
FROM changes GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    // stream-stream inner interval join = its batch self-join, exactly
    // (Spark's inner-join completeness guarantee; watermark only bounds
    // state). 2-hour horizon in ms.
    "cdc20_stream_join" -> s"""$changesCte
SELECT i.record_id, i.seq AS ins_seq, d.seq AS del_seq,
       d.commit_ms - i.commit_ms AS gap_ms
FROM changes i JOIN changes d
  ON d.record_id = i.record_id AND d.op = 'delete'
 AND d.commit_ms >= i.commit_ms AND d.commit_ms <= i.commit_ms + 7200000
WHERE i.op = 'insert'
ORDER BY 1, 2, 3""",

    "cdc17_stream_enrich" -> s"""$changesCte
SELECT c.c_mktsegment, ch.op, count(*) AS n_changes,
       CAST(sum(ch.val_cents) AS BIGINT) AS sum_val_cents
FROM changes ch JOIN customer c ON ch.record_id + 1 = c.c_custkey
GROUP BY 1, 2 ORDER BY 1, 2""",

    // per-handler delivery counts; F6: an update passes when any changed
    // field besides updated_at exists — in the WAL lane k changes unless
    // k%5=0, val_cents unless k%3=0 or k%11=0 (unchanged TOAST); F7: a
    // delete with record k='0' is dropped (null k passes).
    "cdc18_dispatch_counts" -> s"""$changesCte
SELECT handler, n_events FROM (
  SELECT 'on_event:*' AS handler, count(*) AS n_events FROM changes
  UNION ALL
  SELECT 'on_insert:user', count(*) FROM changes
  WHERE op = 'insert' AND table_name = 'user'
  UNION ALL
  SELECT 'on_update:todo', count(*) FROM changes
  WHERE op = 'update' AND table_name = 'todo'
    AND (k IS NULL OR k % 5 <> 0 OR (k % 3 <> 0 AND k % 11 <> 0))
  UNION ALL
  SELECT 'on_delete:order', count(*) FROM changes
  WHERE op = 'delete' AND table_name = 'order' AND (k IS NULL OR k <> 0)
) ORDER BY handler""",

    "cdc16_change_table" -> s"""$changesCte
SELECT seq, xid, lsn, table_name AS name, op AS type, commit_ms AS timestamp_ms,
  4 AS n_fields,
  CASE WHEN op = 'update' THEN
    1 + (CASE WHEN k IS NULL THEN 1 WHEN k % 3 <> 0 THEN 1 ELSE 0 END)
      + (CASE WHEN k IS NOT NULL AND k % 5 <> 0 THEN 1 ELSE 0 END)
  END AS n_changes
FROM changes ORDER BY seq""",

    "txt06_langid_ngram" -> """
WITH pre AS (
  SELECT doc_id, lang, lower(substr(text, 1, 200)) AS t FROM documents),
trig AS (
  SELECT doc_id, lang,
    CASE WHEN length(t) >= 3
         THEN list_transform(range(1, length(t) - 1), i -> substr(t, i, 3))
         ELSE [] END AS trigs
  FROM pre)
SELECT doc_id, lang,
  len(trigs) AS n_trigrams,
  len(list_filter(trigs, g -> list_contains(
    ['the','and','ing','ion','tio','ent','ati','for','her','ter',
     'hat','tha','ere','ate','his','con','res','ver','all','ons'], g))) AS n_en_hits,
  CASE WHEN len(trigs) > 0
       THEN CAST(len(list_filter(trigs, g -> list_contains(
         ['the','and','ing','ion','tio','ent','ati','for','her','ter',
          'hat','tha','ere','ate','his','con','res','ver','all','ons'], g))) AS DOUBLE)
            / len(trigs)
       ELSE 0.0 END AS en_ngram_score,
  CASE WHEN CASE WHEN len(trigs) > 0
       THEN CAST(len(list_filter(trigs, g -> list_contains(
         ['the','and','ing','ion','tio','ent','ati','for','her','ter',
          'hat','tha','ere','ate','his','con','res','ver','all','ons'], g))) AS DOUBLE)
            / len(trigs) ELSE 0.0 END >= 0.08 THEN 'en'
       WHEN CASE WHEN len(trigs) > 0
       THEN CAST(len(list_filter(trigs, g -> list_contains(
         ['the','and','ing','ion','tio','ent','ati','for','her','ter',
          'hat','tha','ere','ate','his','con','res','ver','all','ons'], g))) AS DOUBLE)
            / len(trigs) ELSE 0.0 END >= 0.03 THEN 'maybe-en'
       ELSE 'other' END AS lang_guess
FROM trig ORDER BY doc_id""",

    "txt07_winnow_fp" -> """
WITH pre AS (
  SELECT doc_id,
    regexp_replace(lower(substr(text, 1, 128)), '[^a-z0-9 ]', '', 'g') AS t
  FROM documents),
kg AS (
  SELECT doc_id,
    CASE WHEN length(t) >= 5
         THEN list_transform(range(1, length(t) - 3), i ->
           unicode(substr(t, i, 1)) * 923521
           + unicode(substr(t, i + 1, 1)) * 29791
           + unicode(substr(t, i + 2, 1)) * 961
           + unicode(substr(t, i + 3, 1)) * 31
           + unicode(substr(t, i + 4, 1)))
         ELSE [] END AS h
  FROM pre),
fp AS (
  SELECT doc_id, h,
    CASE WHEN len(h) >= 4
         THEN list_distinct(list_transform(range(1, len(h) - 2), j ->
           list_min(h[j:j+3])))
         ELSE list_distinct(h) END AS fps
  FROM kg)
SELECT doc_id,
  len(h) AS n_kgrams,
  len(fps) AS n_fps,
  list_min(fps) AS fp_min,
  list_max(fps) AS fp_max,
  CAST(list_sum(fps) AS BIGINT) AS fp_sum
FROM fp ORDER BY doc_id""",

    "dd06_winnow_pairs" -> """
WITH pre AS (
  SELECT doc_id,
    regexp_replace(lower(substr(text, 1, 128)), '[^a-z0-9 ]', '', 'g') AS t
  FROM documents),
kg AS (
  SELECT doc_id,
    CASE WHEN length(t) >= 5
         THEN list_transform(range(1, length(t) - 3), i ->
           unicode(substr(t, i, 1)) * 923521
           + unicode(substr(t, i + 1, 1)) * 29791
           + unicode(substr(t, i + 2, 1)) * 961
           + unicode(substr(t, i + 3, 1)) * 31
           + unicode(substr(t, i + 4, 1)))
         ELSE [] END AS h
  FROM pre),
fp AS (
  SELECT doc_id,
    CASE WHEN len(h) >= 4
         THEN list_distinct(list_transform(range(1, len(h) - 2), j ->
           list_min(h[j:j+3])))
         ELSE list_distinct(h) END AS fps
  FROM kg),
ex AS (SELECT doc_id, unnest(fps) AS fp FROM fp),
tot AS (SELECT count(*) AS n_docs FROM fp),
rare AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM ex), tot
  WHERE df <= greatest(2.0, 0.01 * n_docs)),
nf AS (SELECT doc_id, count(*) AS n_fps FROM rare GROUP BY 1)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared,
       least(min(x.n_fps), min(y.n_fps)) AS n_fps_min
FROM rare a
JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
JOIN nf x ON x.doc_id = a.doc_id
JOIN nf y ON y.doc_id = b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 0.65 * least(min(x.n_fps), min(y.n_fps))
ORDER BY 1, 2""",

    "dd07_stream_dedup" -> """
SELECT min(doc_id) AS canonical_id, count(*) AS n_copies FROM (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM documents)
GROUP BY f ORDER BY canonical_id""",

    "txt05_bpe_tokens" -> s"""$toksCte
SELECT doc_id, len(t) AS n_ws_tokens,
  len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS DOUBLE)
    / len(t) AS bpe_per_word
FROM toks ORDER BY doc_id""",

    "cdc10_cast_scalars" -> s"""$changesCte,
built AS (
  SELECT seq, k, val_cents,
    CAST(val_cents // 100 AS VARCHAR) || '.' || lpad(CAST(val_cents % 100 AS VARCHAR), 2, '0') AS dec_s
  FROM changes)
SELECT seq,
  k % 2 = 0 AS b,
  k AS i,
  CAST(CAST(dec_s AS DECIMAL(18,2)) * 100 AS BIGINT) AS dec_cents,
  CAST(CAST(regexp_replace('$$' || dec_s, '[^0-9.\\-]', '', 'g') AS DECIMAL(19,2)) * 100 AS BIGINT) AS money_cents,
  CAST('2024-01-' || lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0') AS DATE) AS dt,
  lpad(to_hex(k), 16, '0') AS bytes_hex,
  epoch_ms(CAST('2024-03-15 06:30:' || lpad(CAST(k % 60 AS VARCHAR), 2, '0') AS TIMESTAMP)) AS ts_ms
FROM built ORDER BY seq""",

    "cdc11_array_parse" -> s"""$changesCte
SELECT seq,
  'a, b' AS el1,
  CAST(k AS VARCHAR) AS el2,
  CAST(NULL AS VARCHAR) AS el3,
  3 AS n,
  '{"1","2"}' AS nested_el1,
  2 AS n_nested
FROM changes ORDER BY seq""",

    "cdc12_decode" -> """
SELECT * FROM (VALUES
  (0, 'begin',    '2/3E8', 'xid=619'),
  (1, 'relation', '',      'public.user identity=f cols=id,email'),
  (2, 'type',     '',      'public.citext'),
  (3, 'insert',   '',      'rel=16386 cells=2'),
  (4, 'update',   '',      'rel=16386 old=O nulls=1'),
  (5, 'delete',   '',      'rel=16386 kind=K toast=1'),
  (6, 'truncate', '',      'cascade=true rels=16386,16387'),
  (7, 'origin',   '0/2A',  'replica_a'),
  (8, 'commit',   '2/3E8', 'end=2/420')
) AS t(idx, msg_type, lsn_str, info) ORDER BY idx""",

    "txt01_token_stats" -> s"""$toksCte
SELECT doc_id, lang, len AS len_chars,
  len(t) AS n_tokens,
  len(list_distinct(t)) AS n_distinct,
  CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS sum_token_len
FROM toks ORDER BY doc_id""",

    "txt02_quality" -> s"""$toksCte
SELECT doc_id, len, n_tokens, n_stopwords,
  stopword_ratio, short_ratio, avg_token_span,
  stopword_ratio * 2.0 - short_ratio + avg_token_span / 10.0 AS quality
FROM (
  SELECT doc_id, len, len(t) AS n_tokens,
    len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS n_stopwords,
    len(list_filter(t, x -> length(x) <= 2)) AS n_short,
    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(t) AS stopword_ratio,
    CAST(len(list_filter(t, x -> length(x) <= 2)) AS DOUBLE) / len(t) AS short_ratio,
    CAST(len AS DOUBLE) / len(t) AS avg_token_span
  FROM toks)
ORDER BY doc_id""",

    "txt03_langid" -> s"""$toksCte
SELECT doc_id, lang_label, en_score,
  CASE WHEN en_score >= 0.10 THEN 'en'
       WHEN en_score >= 0.04 THEN 'maybe-en'
       ELSE 'other' END AS lang_pred
FROM (
  SELECT doc_id, lang AS lang_label,
    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) AS en_score
  FROM toks)
ORDER BY doc_id""",

    // non-distinct bigram counts — repetition IS the signal; the share is
    // one integer division in double on both engines
    "txt08_repetition" -> """
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS g
  FROM toks WHERE len(t) >= 2),
cnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
  CAST(max(c) AS BIGINT) AS top_count,
  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS top_share
FROM cnt GROUP BY doc_id ORDER BY doc_id""",

    "txt09_blocklist" -> s"""$toksCte
SELECT doc_id, len(t) AS n_tokens,
  len(list_filter(t, x -> x IN ('slow', 'dup'))) AS n_blocked,
  CASE WHEN len(t) > 0
       THEN CAST(len(list_filter(t, x -> x IN ('slow', 'dup'))) AS DOUBLE)
            / len(t)
       ELSE CAST(0 AS DOUBLE) END AS blocked_frac,
  len(list_filter(t, x -> x IN ('slow', 'dup'))) > 0 AS flagged
FROM toks ORDER BY doc_id""",

    // PQ full-code collision self-recall: the planted exact copy shares
    // every subspace argmax with its original (bitwise-identical
    // subvectors, same tie-break), so the collision join always pairs
    // them and exact-cosine verification ranks the copy first at 1.0 —
    // the planting formula IS the provable output (ann02/ann04 device)
    "ann05_pq_recall" -> """
SELECT vec_id, vec_id + 100000 AS pq_nearest, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings ORDER BY vec_id""",

    // ann06: the same planting theorem as ann05, but the codes flow
    // through the PERSISTED index (build on originals, append the copies
    // as a crawl increment, reload from storage) — storage or increment
    // bugs surface as missing/mis-ranked rows against this relation
    "ann06_pq_persisted" -> """
SELECT vec_id, vec_id + 100000 AS pq_nearest, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings ORDER BY vec_id""",

    // ann07: the planting theorem through the STREAMING loop — every
    // arriving copy retrieves its original at sim 1.0 whatever batch it
    // arrived in (search against stored codebooks/codes, then append)
    "ann07_pq_stream" -> """
SELECT vec_id + 100000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings ORDER BY query_id""",

    // ann08: the planting theorem through the IVF+PQ search path — the
    // copy shares its original's coarse cell (identical embedding, same
    // argmax), so cell pruning cannot exclude it; per subspace its code
    // is the argmax of the query's own subvector, so its ADC total is
    // the global max and the shortlist always holds it; exact rerank
    // then scores it sim 1.0 above every organic neighbor
    "ann08_ivf_pq" -> """
SELECT vec_id AS query_id, vec_id + 100000 AS ivf_nearest,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann13: the ann08 theorem THROUGH leaf compaction — codes are copied
    // verbatim (no re-encode), so the cell-pruned search after compaction
    // returns exactly the planting relation; the leaf counts (1 build +
    // 3 append increments = 4 before, exactly 1 referenced after) are
    // part of the gated relation — the compaction contract itself
    "ann13_compact" -> """
SELECT vec_id AS query_id, vec_id + 100000 AS ivf_nearest,
  CAST(1.0 AS DOUBLE) AS sim,
  4 AS n_leaves_before, 1 AS n_leaves_after
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann14: the planting theorem through FILTERED search — the copy
    // inherits its original's label, each original queries with its own
    // label as the predicate, so the copy passes the pre-filter and wins
    // rank 1 at sim 1.0; the label column rides the gated relation
    "ann14_filtered" -> """
SELECT vec_id AS query_id, label AS want_label,
  vec_id + 100000 AS match_id, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann17: ann14's filtered planting formula through the RESIDUAL
    // (IVFADC) index — identical relation: the copy shares its
    // original's cell/residual/codes and label, rerank exceeds probed
    // volume, so filtered residual search provably returns it at rank 1
    "ann17_filtered_residual" -> """
SELECT vec_id AS query_id, label AS want_label,
  vec_id + 100000 AS match_id, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann15: tombstone deletes — two exact copies per query, the
    // +100000 copy deleted for query % 7 == 0; sim-1.0 ties break by
    // ascending vec_id, so the match flips to +200000 exactly where the
    // tombstone bites; the tombstone census rides every row
    "ann15_tombstone" -> """
SELECT vec_id AS query_id,
  CASE WHEN vec_id % 7 = 0 THEN vec_id + 200000
       ELSE vec_id + 100000 END AS match_id,
  CAST(1.0 AS DOUBLE) AS sim,
  (SELECT count(*) FROM embeddings WHERE vec_id < 64 AND vec_id % 7 = 0)
    AS n_tombstones
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann21: ann15's relation through the sharded build — codes are pure
    // functions of (embedding, codebooks), so merge == single build; the
    // %7 takedown known only to shard 0 still bites post-merge
    "ann21_shard_merge" -> """
SELECT vec_id AS query_id,
  CASE WHEN vec_id % 7 = 0 THEN vec_id + 200000
       ELSE vec_id + 100000 END AS match_id,
  CAST(1.0 AS DOUBLE) AS sim, 2 AS n_shards,
  (SELECT count(*) FROM embeddings WHERE vec_id < 64 AND vec_id % 7 = 0)
    AS n_tombstones
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann09: the planting theorem through RESIDUAL IVFADC — the copy's
    // coarse cell, residual, and residual codes are bitwise its
    // original's; the harness's rerank exceeds the probed candidate
    // volume, so exact-cosine rerank sees every candidate and sim 1.0
    // wins rank 1 whatever the cross-cell ADC ordering did
    "ann09_ivfadc_residual" -> """
SELECT vec_id AS query_id, vec_id + 100000 AS adc_nearest,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // SQ8 scalar-quantized search: an exact copy quantizes to its
    // original's code bitwise, per-vector scales cancel in cosine, so the
    // copy-as-query's code-space top-1 is provably the original at exact
    // cosine 1.0 (the planted relation, re-derived here)
    "ann10_sq8" -> """
SELECT vec_id + 100000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann11: hybrid BM25+cosine retrieval fused by integral RRF — the
    // sparse leg is txt14's full BM25 derivation cut at kLeg=20, the
    // dense leg is ann01's cosine ranking for query ids 1–3 cut at 20,
    // fusion is 1000000 // (60 + rank) per present leg (integer: no
    // float summation order in the contract), final top-10 per query
    "ann11_hybrid_rrf" -> s"""$toksCte,
tok AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
qt AS (SELECT doc_id, dl, term FROM tok
  WHERE term IN (${Bm25.termList})),
tf AS (
  SELECT doc_id, dl, ${Bm25.tfAggs}
  FROM qt GROUP BY doc_id, dl),
stats AS (SELECT count(*) AS n_docs, sum(len(t)) AS total_tokens FROM toks),
dfs AS (SELECT ${Bm25.dfAggs} FROM tf),
scored AS (
${Bm25.scoredUnion}),
sp AS (
  SELECT query_id, doc_id, sparse_rnk FROM (
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
      row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, doc_id ASC) AS sparse_rnk
    FROM scored) WHERE sparse_rnk <= 20),
q AS (SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id IN (1, 2, 3)),
sims AS (
  SELECT q.query_id, e.vec_id AS doc_id,
    list_cosine_similarity(
      list_transform(q.q_emb, x -> CAST(x AS DOUBLE)),
      list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
de AS (
  SELECT query_id, doc_id, dense_rnk FROM (
    SELECT query_id, doc_id,
      row_number() OVER (PARTITION BY query_id
        ORDER BY sim DESC, doc_id ASC) AS dense_rnk
    FROM sims) WHERE dense_rnk <= 20),
fused AS (
  SELECT coalesce(sp.query_id, de.query_id) AS query_id,
         coalesce(sp.doc_id, de.doc_id) AS doc_id,
         coalesce(sp.sparse_rnk, 0) AS sparse_rnk,
         coalesce(de.dense_rnk, 0) AS dense_rnk
  FROM sp FULL OUTER JOIN de
    ON sp.query_id = de.query_id AND sp.doc_id = de.doc_id),
sc AS (
  SELECT query_id, doc_id, sparse_rnk, dense_rnk,
    CAST(CASE WHEN sparse_rnk > 0 THEN 1000000 // (60 + sparse_rnk) ELSE 0 END
       + CASE WHEN dense_rnk > 0 THEN 1000000 // (60 + dense_rnk) ELSE 0 END
      AS BIGINT) AS rrf_score
  FROM fused),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
    ORDER BY rrf_score DESC, doc_id ASC) AS rnk
  FROM sc)
SELECT query_id, rnk, doc_id, rrf_score, sparse_rnk, dense_rnk
FROM r WHERE rnk <= 10 ORDER BY query_id, rnk""",

    // SCD Type 2: each insert/update opens a version valid until the
    // record's next change (a delete closes without opening); lead() over
    // (table, record, seq) on both engines
    "cdc22_scd2" -> s"""$changesCte,
v AS (
  SELECT table_name, record_id, seq, op, commit_ms,
    lead(commit_ms) OVER (PARTITION BY table_name, record_id ORDER BY seq)
      AS valid_to_ms
  FROM changes)
SELECT table_name, record_id, seq AS version_seq, op,
  commit_ms AS valid_from_ms, valid_to_ms,
  valid_to_ms IS NULL AS is_current
FROM v WHERE op <> 'delete'
ORDER BY table_name, record_id, version_seq""",

    // point-in-time snapshot at the midpoint seq: last change per record
    // at or below the cut, dropped when that change is a delete
    "cdc23_snapshot" -> s"""$changesCte,
cut AS (SELECT max(seq) // 2 AS cut_seq FROM changes),
last AS (
  SELECT table_name, record_id,
    max_by(seq, seq) AS as_of_seq,
    max_by(op, seq) AS last_op,
    max_by(commit_ms, seq) AS commit_ms,
    max_by(k, seq) AS k,
    max_by(val_cents, seq) AS val_cents
  FROM changes, cut WHERE seq <= cut_seq
  GROUP BY table_name, record_id)
SELECT table_name, record_id, as_of_seq, last_op, commit_ms, k, val_cents
FROM last WHERE last_op <> 'delete'
ORDER BY table_name, record_id""",

    // cdc27: transaction-consistent snapshot — the cut aligned DOWN to
    // the last commit boundary (max per-xid commit_seq <= raw cut), so
    // the snapshot contains whole transactions only; aligned_seq and the
    // excluded torn-row count ride every row
    "cdc27_txn_snapshot" -> s"""$changesCte,
cut AS (SELECT max(seq) // 2 AS cut_seq FROM changes),
commits AS (SELECT xid, max(seq) AS commit_seq FROM changes GROUP BY xid),
aligned AS (
  SELECT max(commit_seq) AS aligned_seq FROM commits, cut
  WHERE commit_seq <= cut_seq),
torn AS (
  SELECT count(*) AS torn_rows FROM changes, cut, aligned
  WHERE seq > aligned_seq AND seq <= cut_seq),
last AS (
  SELECT table_name, record_id,
    max_by(seq, seq) AS as_of_seq,
    max_by(op, seq) AS last_op,
    max_by(commit_ms, seq) AS commit_ms,
    max_by(k, seq) AS k,
    max_by(val_cents, seq) AS val_cents
  FROM changes, aligned WHERE seq <= aligned_seq
  GROUP BY table_name, record_id)
SELECT table_name, record_id, as_of_seq, last_op, commit_ms, k, val_cents,
  aligned_seq, torn_rows
FROM last, aligned, torn WHERE last_op <> 'delete'
ORDER BY table_name, record_id""",

    // retraction-aware incremental aggregation: each change contributes
    // signed delta rows (insert +new, delete −old, update −old +new; the
    // old image mirrors withRecords' deterministic deltas) so group-key
    // migration retracts correctly; net movement per (table, k%8)
    "cdc24_delta_agg" -> deltaAggOracle,

    // cdc26: the SAME relation maintained as a streaming materialized
    // view — state(b+1) = groupwise integer sum of (state(b) ∪ batch
    // deltas); signed-delta sums are associative and commutative, so the
    // folded state equals the one-shot aggregate EXACTLY and cdc26
    // shares cdc24's oracle verbatim (the merge identity is the claim)
    "cdc26_ivm_stream" -> deltaAggOracle,

    // materialized current state: the last change per record over the
    // whole stream, dropped when it was a delete (tombstone) — what the
    // bucketed store must hold after applying every micro-batch
    // cdc28: schema evolution — same last-change derivation as cdc25,
    // with val_cents masked NULL for keys whose last change predates the
    // DDL boundary (max(seq) div 2, the boundary both engines derive)
    "cdc28_schema_evolution" -> s"""$changesCte,
cut AS (SELECT max(seq) // 2 AS ddl_seq FROM changes),
last AS (
  SELECT table_name, record_id,
    max_by(seq, seq) AS last_seq,
    max_by(op, seq) AS last_op,
    max_by(k, seq) AS k,
    max_by(val_cents, seq) AS val_cents
  FROM changes GROUP BY table_name, record_id)
SELECT table_name, record_id, last_seq, k,
  CASE WHEN last_seq > ddl_seq THEN val_cents END AS val_cents,
  last_seq <= ddl_seq AS pre_ddl_row,
  ddl_seq
FROM last CROSS JOIN cut
WHERE last_op <> 'delete'
ORDER BY table_name, record_id""",

    // cdc30: join-view maintenance — the folded affected-key-recompute
    // view must equal the ONE-SHOT left join of the two final last-change
    // states (alive orders against alive users on the account key); the
    // merge identity is the gated claim
    "cdc30_join_ivm" -> s"""$changesCte,
last_o AS (
  SELECT record_id, max_by(seq, seq) AS order_seq,
    max_by(op, seq) AS last_op, max_by(val_cents, seq) AS order_cents
  FROM changes WHERE table_name = 'order' GROUP BY record_id),
last_u AS (
  SELECT record_id, max_by(op, seq) AS last_op,
    max_by(val_cents, seq) AS val_cents
  FROM changes WHERE table_name = 'user' GROUP BY record_id),
alive_u AS (SELECT * FROM last_u WHERE last_op <> 'delete')
SELECT o.record_id, o.order_seq, o.order_cents,
  (o.record_id // 3) * 3 AS account,
  u.val_cents AS account_cents,
  u.record_id IS NOT NULL AS account_present
FROM last_o o
LEFT JOIN alive_u u ON u.record_id = (o.record_id // 3) * 3
WHERE o.last_op <> 'delete'
ORDER BY o.record_id""",

    // cdc29: TRUNCATE semantics — cdc25's last-change derivation minus
    // 'todo' rows whose LAST change is at or below the truncate watermark
    // (max(seq) div 2); rows the post-truncate WAL touched survive
    "cdc29_truncate_apply" -> s"""$changesCte,
cut AS (SELECT max(seq) // 2 AS trunc_seq FROM changes),
last AS (
  SELECT table_name, record_id,
    max_by(seq, seq) AS last_seq,
    max_by(op, seq) AS last_op,
    max_by(k, seq) AS k,
    max_by(val_cents, seq) AS val_cents
  FROM changes GROUP BY table_name, record_id)
SELECT table_name, record_id, last_seq, k, val_cents, trunc_seq
FROM last CROSS JOIN cut
WHERE last_op <> 'delete'
  AND NOT (table_name = 'todo' AND last_seq <= trunc_seq)
ORDER BY table_name, record_id""",

    "cdc25_materialize" -> s"""$changesCte,
last AS (
  SELECT table_name, record_id,
    max_by(seq, seq) AS last_seq,
    max_by(op, seq) AS last_op,
    max_by(commit_ms, seq) AS commit_ms,
    max_by(k, seq) AS k,
    max_by(val_cents, seq) AS val_cents
  FROM changes GROUP BY table_name, record_id)
SELECT table_name, record_id, last_seq, commit_ms, k, val_cents
FROM last WHERE last_op <> 'delete'
ORDER BY table_name, record_id""",

    // pipe06: the whole crawl-accounting chain mirrored — fetch-log
    // synthesis, txt19's canonicalization rules, page collapse, dd17's
    // ppm weighting across pages (mirror pairs halve), tp14's Bloom
    // membership (set containment = the engine's bit tests), per-host
    // rollup
    "pipe06_crawl_account" -> """
WITH docs AS (
  SELECT doc_id, source, text FROM documents WHERE text IS NOT NULL),
vars AS (
  SELECT doc_id, source, text,
    unnest(range(0, doc_id % 3 + 1)) AS v
  FROM docs),
fetches AS (
  SELECT doc_id, source, text,
    CASE v
      WHEN 0 THEN 'http://' || source || '.com/doc' || doc_id
      WHEN 1 THEN 'HTTP://WWW.' || source || '.COM/doc' || doc_id
                  || '?utm_source=crawl'
      ELSE 'http://' || source || '.com:80/doc' || doc_id || '/' END AS raw_url
  FROM vars
  UNION ALL
  SELECT doc_id, 'mirror' AS source, text,
    'http://mirror.org/m' || doc_id AS raw_url
  FROM docs WHERE doc_id % 10 = 3),
canon AS (
  SELECT doc_id, source, text,
    lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) || '://'
    || regexp_replace(regexp_replace(
         lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?]+)', 1)),
         ':80$', ''), '^www\.', '')
    || (CASE WHEN p0 = '' THEN '/' ELSE p0 END)
    || (CASE WHEN pq = '' THEN '' ELSE '?' || pq END) AS canon_url
  FROM (
    SELECT *,
      regexp_replace(regexp_extract(raw_url,
        '^[A-Za-z]+://[^/?]+(/[^?]*)?', 1), '/$', '') AS p0,
      COALESCE(array_to_string(list_sort(list_filter(
        string_split(regexp_extract(raw_url, '\?(.*)$', 1), '&'),
        x -> NOT starts_with(x, 'utm_') AND x <> '')), '&'), '') AS pq
    FROM fetches)),
pages AS (
  SELECT canon_url, min(doc_id) AS doc_id, min(source) AS source,
         min(text) AS text, CAST(count(*) AS BIGINT) AS n_fetches
  FROM canon GROUP BY 1),
wt AS (
  SELECT *,
    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS n_tokens,
    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
  FROM pages),
cl AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_copies FROM wt GROUP BY 1),
weighted AS (
  SELECT wt.*, CAST(1000000 AS BIGINT) // cl.n_copies AS weight_ppm
  FROM wt JOIN cl USING (fp)),
btoks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM docs WHERE doc_id % 17 = 0),
bg AS (
  SELECT DISTINCT md5(array_to_string(t[s+1:s+13], ' ')) AS gh
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 13 + 1)) AS s
        FROM btoks WHERE len(t) >= 13)),
bgp AS (
  SELECT CAST(('0x' || substring(gh, 1, 15)) AS BIGINT) % 65536 AS p FROM bg
  UNION
  SELECT CAST(('0x' || substring(gh, 17, 15)) AS BIGINT) % 65536 FROM bg),
ptoks AS (
  SELECT doc_id * 2 + (CASE WHEN source = 'mirror' THEN 1 ELSE 0 END) AS pk,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM weighted),
pg AS (
  SELECT pk, md5(array_to_string(t[s+1:s+13], ' ')) AS gh
  FROM (SELECT pk, t, unnest(range(0, len(t) - 13 + 1)) AS s
        FROM ptoks WHERE len(t) >= 13)),
fl AS (
  SELECT pk, max(
    CAST(('0x' || substring(gh, 1, 15)) AS BIGINT) % 65536
      IN (SELECT p FROM bgp)
    AND CAST(('0x' || substring(gh, 17, 15)) AS BIGINT) % 65536
      IN (SELECT p FROM bgp)) AS flagged
  FROM pg GROUP BY 1),
acct AS (
  SELECT w.*, COALESCE(fl.flagged, false) AS flagged
  FROM weighted w LEFT JOIN fl
    ON w.doc_id * 2 + (CASE WHEN w.source = 'mirror' THEN 1 ELSE 0 END) = fl.pk
  WHERE w.source = 'mirror' OR w.doc_id % 17 <> 0)
SELECT source,
  CAST(sum(n_fetches) AS BIGINT) AS n_fetches,
  CAST(count(*) AS BIGINT) AS n_pages,
  CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(sum(weight_ppm) AS BIGINT) AS sum_weight_ppm,
  CAST(sum(CASE WHEN NOT flagged THEN n_tokens * weight_ppm ELSE 0 END)
    AS BIGINT) AS eff_token_ppm
FROM acct GROUP BY 1 ORDER BY 1""",

    // pipe05: the Morton interleave re-derived bit by bit — source-suffix
    // and length-bucket codes, z = Σ bit_i(src)·2^(2i+1) + bit_i(ncb)·2^2i,
    // fixed-width pid = z·16 // 1024, per-pid min/max spans on BOTH dims
    "pipe05_zorder_layout" -> """
WITH c AS (
  SELECT doc_id, source,
    CAST(substring(source, 4) AS INT) AS src_code,
    least(n_chars // 32, 31) AS ncb
  FROM documents),
z AS (
  SELECT doc_id, source, src_code, ncb,
    ((src_code >> 0) & 1) * 2 + ((ncb >> 0) & 1) * 1 +
    ((src_code >> 1) & 1) * 8 + ((ncb >> 1) & 1) * 4 +
    ((src_code >> 2) & 1) * 32 + ((ncb >> 2) & 1) * 16 +
    ((src_code >> 3) & 1) * 128 + ((ncb >> 3) & 1) * 64 +
    ((src_code >> 4) & 1) * 512 + ((ncb >> 4) & 1) * 256 AS z
  FROM c)
SELECT z * 16 // 1024 AS pid,
  count(*) AS n_docs,
  count(DISTINCT source) AS n_sources,
  max(src_code) - min(src_code) AS src_span,
  CAST(max(ncb) - min(ncb) AS INT) AS ncb_span,
  CAST(min(z) AS BIGINT) AS min_z,
  CAST(max(z) AS BIGINT) AS max_z
FROM z GROUP BY 1 ORDER BY pid""",

    // pipe04: cdc25's last-op-wins state, mapped onto document payloads
    // (record_id % 97 — collisions across tables are the point), exact-
    // deduped with (table_name, record_id) first-occurrence arbitration
    "pipe04_cdc_corpus" -> s"""$changesCte,
last AS (
  SELECT table_name, record_id, max_by(op, seq) AS last_op
  FROM changes GROUP BY table_name, record_id),
surv AS (
  SELECT table_name, record_id, CAST(record_id % 97 AS BIGINT) AS doc_id
  FROM last WHERE last_op <> 'delete'),
txt AS (
  SELECT s.table_name, s.record_id, s.doc_id,
    CAST(len(list_filter(string_split_regex(trim(d.text), '\\s+'),
      x -> x <> '')) AS BIGINT) AS n_tokens,
    md5(lower(regexp_replace(trim(d.text), '\\s+', ' ', 'g'))) AS fp
  FROM surv s JOIN documents d USING (doc_id)
  WHERE d.text IS NOT NULL),
arb AS (
  SELECT *, row_number() OVER (
    PARTITION BY fp ORDER BY table_name, record_id) AS rn
  FROM txt)
SELECT table_name, record_id, doc_id, n_tokens, (rn = 1) AS kept
FROM arb ORDER BY table_name, record_id""",

    // pipe08: replica-fed vector index — the LIVE record set (CDC apply
    // loop's survivors) drives PqIndex membership; the ann08 planted-copy
    // theorem restricted to surviving ids, with the index census riding
    // every row so a mis-applied delete shifts n_indexed and fails
    "pipe08_cdc_vectors" -> s"""$changesCte,
last AS (
  SELECT table_name, record_id, max_by(op, seq) AS last_op
  FROM changes GROUP BY table_name, record_id),
live AS (SELECT DISTINCT record_id FROM last WHERE last_op <> 'delete'),
vecs AS (
  SELECT e.vec_id FROM embeddings e JOIN live l ON e.vec_id = l.record_id),
census AS (SELECT count(*) AS n_indexed FROM vecs)
SELECT vec_id AS query_id, vec_id + 100000 AS match_id,
  CAST(1.0 AS DOUBLE) AS sim, n_indexed
FROM vecs, census WHERE vec_id < 64 ORDER BY query_id""",

    // overlapping token-window chunking: starts are 1, 1+step, … (step =
    // 64−16 = 48); DuckDB's range() excludes its stop so len(t)+1 matches
    // Spark's inclusive sequence(1, size). chunk_id is (start−1)/step —
    // arithmetic on both engines, no ordinality agreement needed
    "txt10_chunking" -> s"""$toksCte,
starts AS (
  SELECT doc_id, t, unnest(range(1, len(t) + 1, 48)) AS start_tok
  FROM toks WHERE len(t) > 0)
SELECT doc_id,
  CAST((start_tok - 1) // 48 AS INT) AS chunk_id,
  start_tok,
  len(list_slice(t, start_tok, start_tok + 63)) AS n_chunk_tokens,
  array_to_string(list_slice(t, start_tok, start_tok + 63), ' ') AS chunk_text
FROM starts ORDER BY doc_id, chunk_id""",

    // tf·idf with the LINEAR idf N/df: one IEEE division is bit-exact
    // across engines (ln is only ULP-close) and induces the same ranking;
    // ties broken by term so the top-k set is deterministic
    "txt11_tfidf_terms" -> s"""$toksCte,
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
    CAST(tfc.tf * n.n_docs AS DOUBLE) / dfc.df AS score
  FROM tfc JOIN dfc USING (term) CROSS JOIN n),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, rnk, term, tf, df, score
FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""",

    // vocab coverage: top-256 terms by corpus frequency (ties by term —
    // the boundary is deterministic on both engines), then per-doc share
    // of tokens outside that vocabulary
    "txt12_vocab_oov" -> s"""$toksCte,
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
vocab AS (SELECT term FROM cnt ORDER BY cnt DESC, term ASC LIMIT 256),
iv AS (
  SELECT doc_id, count(*) AS n_invocab FROM tok
  WHERE term IN (SELECT term FROM vocab) GROUP BY 1)
SELECT d.doc_id, len(d.t) AS n_tokens,
  len(d.t) - COALESCE(iv.n_invocab, 0) AS n_oov,
  CASE WHEN len(d.t) > 0
       THEN CAST(len(d.t) - COALESCE(iv.n_invocab, 0) AS DOUBLE) / len(d.t)
       ELSE CAST(0 AS DOUBLE) END AS oov_frac
FROM toks d LEFT JOIN iv USING (doc_id) ORDER BY doc_id""",

    // unigram-LM familiarity (perplexity proxy, linear domain): every
    // aggregate is integral so partial-agg order can't drift; the only
    // fp ops are two per-row divisions — bit-exact on both engines
    "txt13_familiarity" -> s"""$toksCte,
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
cnt AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM cnt),
per AS (
  SELECT tok.doc_id, count(*) AS n_tokens, sum(cnt.cnt) AS sum_cnt,
    sum(CASE WHEN cnt.cnt < 3 THEN 1 ELSE 0 END) AS n_rare
  FROM tok JOIN cnt USING (term) GROUP BY 1)
SELECT d.doc_id,
  COALESCE(per.n_tokens, 0) AS n_tokens,
  CAST(COALESCE(per.sum_cnt, 0) AS BIGINT) AS sum_cnt,
  CAST(COALESCE(per.n_rare, 0) AS BIGINT) AS n_rare,
  CASE WHEN COALESCE(per.n_tokens, 0) > 0
       THEN CAST(per.sum_cnt AS DOUBLE) / (per.n_tokens * tot.total)
       ELSE CAST(0 AS DOUBLE) END AS mean_freq,
  CASE WHEN COALESCE(per.n_tokens, 0) > 0
       THEN CAST(per.n_rare AS DOUBLE) / per.n_tokens
       ELSE CAST(0 AS DOUBLE) END AS rare_frac
FROM toks d LEFT JOIN per ON d.doc_id = per.doc_id CROSS JOIN tot
ORDER BY d.doc_id""",

    // BM25 top-k retrieval. The score expression mirrors the Spark side
    // literally — log-free odds idf, k1=1.2 / b=0.75 folded as literals,
    // dl/avgdl as (dl*n_docs)/total_tokens, per-query sum left-associative
    // in query-term order — so every double op is the identical IEEE-754
    // tree and the comparison is bit-exact. Only docs containing at least
    // one query term rank (zero-score docs are out of scope by contract).
    "txt14_bm25" -> s"""$toksCte,
tok AS (
  SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks),
qt AS (SELECT doc_id, dl, term FROM tok
  WHERE term IN (${Bm25.termList})),
tf AS (
  SELECT doc_id, dl, ${Bm25.tfAggs}
  FROM qt GROUP BY doc_id, dl),
stats AS (SELECT count(*) AS n_docs, sum(len(t)) AS total_tokens FROM toks),
dfs AS (SELECT ${Bm25.dfAggs} FROM tf),
scored AS (
${Bm25.scoredUnion}),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored)
SELECT query_id, rnk, doc_id, dl AS n_tokens, score
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""",

    // Gopher-style quality battery: integral counters, final per-row
    // divisions only — thresholds folded as the same literals as the
    // Spark side. Lines are trimmed non-empty splits on chr(10);
    // '...' runs count via the replace-length identity // 3
    "txt15_gopher_rules" -> """
WITH t0 AS (
  SELECT doc_id, text,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t,
    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      l -> l <> '') AS lines
  FROM documents),
m AS (
  SELECT doc_id,
    len(t) AS n_tokens,
    COALESCE(len(array_to_string(t, '')), 0) AS n_token_chars,
    len(text) - len(replace(text, '#', '')) AS n_hash,
    (len(text) - len(replace(text, '...', ''))) // 3 AS n_ellipsis,
    len(lines) AS n_lines,
    len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%' OR l LIKE '•%'))
      AS n_bullet,
    len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…'))
      AS n_ellipsis_end,
    len(list_distinct(lines)) AS n_distinct_lines,
    len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha
  FROM t0),
f AS (
  SELECT doc_id, n_tokens,
    CASE WHEN n_tokens > 0 THEN CAST(n_token_chars AS DOUBLE) / n_tokens
         ELSE CAST(0 AS DOUBLE) END AS mean_word_len,
    CASE WHEN n_tokens > 0 THEN CAST(n_hash + n_ellipsis AS DOUBLE) / n_tokens
         ELSE CAST(0 AS DOUBLE) END AS symbol_frac,
    CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE) / n_lines
         ELSE CAST(0 AS DOUBLE) END AS bullet_frac,
    CASE WHEN n_lines > 0 THEN CAST(n_ellipsis_end AS DOUBLE) / n_lines
         ELSE CAST(0 AS DOUBLE) END AS ellipsis_line_frac,
    CASE WHEN n_lines > 0 THEN CAST(n_lines - n_distinct_lines AS DOUBLE) / n_lines
         ELSE CAST(0 AS DOUBLE) END AS dup_line_frac,
    CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / n_tokens
         ELSE CAST(0 AS DOUBLE) END AS alpha_frac
  FROM m)
SELECT doc_id, n_tokens, mean_word_len, symbol_frac, bullet_frac,
  ellipsis_line_frac, dup_line_frac, alpha_frac,
  (n_tokens >= 50 AND n_tokens <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_frac < 0.1 AND bullet_frac < 0.9
   AND ellipsis_line_frac < 0.3 AND dup_line_frac < 0.3
   AND alpha_frac > 0.8) AS passes
FROM f ORDER BY doc_id""",

    // txt16: BPE iteration-0 input — adjacent-pair counts over the char
    // + '</w>' symbolization, weighted by word frequency. The merge LOOP
    // is iterative (not SQL-derivable) and is pinned by BpeSpec; this
    // derives the distributed stage the loop consumes
    "txt16_bpe_pairs" -> s"""$toksCte,
tok AS (SELECT unnest(t) AS word FROM toks),
wc AS (SELECT word, count(*) AS n FROM tok GROUP BY 1),
syms AS (
  SELECT n, list_append(
    list_transform(range(0, len(word)), i -> substr(word, CAST(i+1 AS INT), 1)),
    '</w>') AS s
  FROM wc),
pairs AS (
  SELECT n, list_extract(s, CAST(i+1 AS INT)) AS left_sym,
         list_extract(s, CAST(i+2 AS INT)) AS right_sym
  FROM (SELECT n, s, unnest(range(0, len(s) - 1)) AS i FROM syms)),
pc AS (SELECT left_sym, right_sym, CAST(sum(n) AS BIGINT) AS pair_count
       FROM pairs GROUP BY 1, 2)
SELECT left_sym, right_sym, pair_count
FROM pc ORDER BY pair_count DESC, left_sym, right_sym LIMIT 20""",

    // bigram-LM familiarity (txt13's context-conditional extension): all
    // aggregates are integral (corpus bigram counts, context counts,
    // per-doc sums) so partial-agg order can't drift; the only fp ops are
    // the two per-row divisions — bit-exact across engines
    "txt17_bigram_lm" -> s"""$toksCte,
big AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        FROM toks WHERE len(t) >= 2)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
per AS (
  SELECT big.doc_id, count(*) AS n_bigrams, sum(c2.c2) AS sum_big_cnt,
    sum(c1.c1) AS sum_ctx_cnt,
    sum(CASE WHEN c2.c2 < 3 THEN 1 ELSE 0 END) AS n_rare
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1)
SELECT d.doc_id,
  CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  CAST(COALESCE(per.sum_big_cnt, 0) AS BIGINT) AS sum_big_cnt,
  CAST(COALESCE(per.sum_ctx_cnt, 0) AS BIGINT) AS sum_ctx_cnt,
  CAST(COALESCE(per.n_rare, 0) AS BIGINT) AS n_rare,
  CASE WHEN COALESCE(per.n_bigrams, 0) > 0
       THEN CAST(per.sum_big_cnt AS DOUBLE) / per.sum_ctx_cnt
       ELSE CAST(0 AS DOUBLE) END AS cond_familiarity,
  CASE WHEN COALESCE(per.n_bigrams, 0) > 0
       THEN CAST(per.n_rare AS DOUBLE) / per.n_bigrams
       ELSE CAST(0 AS DOUBLE) END AS rare_frac
FROM toks d LEFT JOIN per USING (doc_id) ORDER BY doc_id""",

    // txt18: KMV bottom-k distinct sketch per source — 60-bit md5-prefix
    // hash of each distinct 3-gram shingle, kth-minimum per source, and
    // the (k-1)·2^60/kth estimator in pure integer div/mod arithmetic
    // (guarded branch keeps every intermediate in 63 bits); exact count
    // when a source holds fewer than k distinct hashes.
    // txt21 (the streamed fold) shares this oracle verbatim: the gated
    // claim is the KMV merge identity — per-batch folds converge to the
    // batch-built sketch exactly
    "txt18_kmv_distinct" -> kmvOracle,
    "txt22_hll"          -> hllOracle,
    "txt21_kmv_stream"   -> kmvOracle,

    // txt23: JSONL ingestion accounting — every figure re-derived from
    // the documents table and the planting rule (doc_id % 23 truncated),
    // so the JSON round-trip is proven lossless and the corrupt set
    // exactly the planted set
    "txt23_jsonl_ingest" -> """
WITH d AS (SELECT doc_id, source, text FROM documents),
good AS (
  SELECT source,
    count(*) AS n_docs,
    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_null_text,
    CAST(coalesce(sum(len(text)), 0) AS BIGINT) AS sum_chars,
    CAST(coalesce(sum(CASE WHEN text IS NOT NULL THEN
      len(list_filter(string_split_regex(trim(text), '\s+'),
        x -> x <> '')) END), 0) AS BIGINT) AS sum_tokens
  FROM d WHERE doc_id % 23 <> 0 GROUP BY source),
corrupt AS (
  SELECT '_corrupt' AS source, count(*) AS n_docs,
    CAST(0 AS BIGINT) AS n_null_text, CAST(0 AS BIGINT) AS sum_chars,
    CAST(0 AS BIGINT) AS sum_tokens
  FROM d WHERE doc_id % 23 = 0)
SELECT * FROM good UNION ALL SELECT * FROM corrupt ORDER BY source""",
    // txt24: mergeable log2-bucket quantile sketch over token lengths —
    // bucket = length(bin(n)) (⌊log2 n⌋+1, identical string arithmetic on
    // both engines), quantile crossing by integer cross-multiplication,
    // estimates as [2^(b-1), 2^b - 1] range bounds (the DDSketch γ=2
    // guarantee); everything BIGINT, no float in the contract.
    // txt25 (the streaming fold) shares it VERBATIM: counter addition is
    // the sketch merge, so streamed == batch-built exactly
    "txt24_len_quantiles" -> lenQuantOracle,
    "txt25_quantile_stream" -> lenQuantOracle,

    // txt20: count-min heavy hitters — d=2 rows of w=1024 counters at
    // the two md5-prefix positions (tp14's hash pair), estimate = min
    // over the gram's counters, emitted beside the exact count for the
    // deterministic top-20 (count desc, shingle asc). Occurrences are
    // per-doc-DISTINCT shingles (the engine's shingle unit)
    "txt20_cms_heavy" -> """
WITH t AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT unnest(list_distinct(list_transform(range(1, len(toks) - 1),
         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
  FROM t WHERE len(toks) >= 3),
g AS (
  SELECT sh,
    CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT) % 1024 AS h1,
    CAST(('0x' || substring(md5(sh), 17, 15)) AS BIGINT) % 1024 AS h2
  FROM s),
c1 AS (SELECT h1 AS p, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1),
c2 AS (SELECT h2 AS p, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY 1),
ex AS (SELECT sh, h1, h2, CAST(count(*) AS BIGINT) AS n_exact
       FROM g GROUP BY 1, 2, 3),
top AS (
  SELECT * FROM (
    SELECT sh, h1, h2, n_exact,
      CAST(row_number() OVER (ORDER BY n_exact DESC, sh) AS INT) AS rank
    FROM ex)
  WHERE rank <= 20)
SELECT rank, sh, n_exact,
  least(c1.cnt, c2.cnt) AS est_cms,
  least(c1.cnt, c2.cnt) - n_exact AS overestimate
FROM top JOIN c1 ON top.h1 = c1.p JOIN c2 ON top.h2 = c2.p
ORDER BY rank""",

    // txt19: URL canonicalization + dedup — raw spellings synthesized
    // from the integer formula, canonicalized by the RFC-3986 subset
    // (lowercase scheme/host, strip www. and :80, trailing-slash strip,
    // drop utm_*, sort params), collapsed dd01-style
    "txt19_url_canon" -> """
WITH raw AS (
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' ELSE 'hTtp' END)
    || '://'
    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.Site' || (doc_id % 50) || '.COM'
        ELSE 'site' || (doc_id % 50) || '.com' END)
    || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
    || '/P' || (doc_id % 20)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || '?'
    || (CASE WHEN doc_id % 2 = 0
        THEN 'utm_source=feed&id=' || (doc_id % 10) || '&b=2'
        ELSE 'b=2&id=' || (doc_id % 10) END) AS raw_url
  FROM documents),
parts AS (
  SELECT doc_id,
    lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
    regexp_replace(regexp_replace(
      lower(regexp_extract(raw_url, '^[A-Za-z]+://([^/?]+)', 1)),
      ':80$', ''), '^www\.', '') AS host,
    regexp_replace(
      regexp_extract(raw_url, '^[A-Za-z]+://[^/?]+(/[^?]*)?', 1),
      '/$', '') AS path0,
    array_to_string(list_sort(list_filter(
      string_split(regexp_extract(raw_url, '\?(.*)$', 1), '&'),
      x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') AS pq
  FROM raw),
canon AS (
  SELECT doc_id,
    scheme || '://' || host
    || (CASE WHEN path0 = '' THEN '/' ELSE path0 END)
    || (CASE WHEN pq = '' THEN '' ELSE '?' || pq END) AS canon_url
  FROM parts),
g AS (SELECT canon_url, min(doc_id) AS canonical_id,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM canon GROUP BY 1)
SELECT c.doc_id, c.canon_url, g.canonical_id, g.n_copies
FROM canon c JOIN g USING (canon_url) ORDER BY c.doc_id""",

    // streaming session windows: the oracle is the batch gaps-and-islands
    // sessionization of the change set. Spark's session_window is
    // CLOSED-interval at the boundary — an event exactly `gap` after the
    // previous one still MERGES (pinned by the "session_window gap
    // boundary" spec) — so a new session starts only when the gap is
    // STRICTLY greater than 30 min. The horizon sentinel's own
    // never-closing session is excluded for free (it is not in `changes`:
    // the sentinel exists only in the WAL fixture, past the real set)
    "cdc21_stream_sessions" -> s"""$changesCte,
marked AS (
  SELECT record_id, commit_ms,
    CASE WHEN lag(commit_ms) OVER w IS NULL
           OR commit_ms - lag(commit_ms) OVER w > 1800000
         THEN 1 ELSE 0 END AS new_sess
  FROM changes
  WINDOW w AS (PARTITION BY record_id ORDER BY commit_ms)),
sess AS (
  SELECT record_id, commit_ms,
    sum(new_sess) OVER (PARTITION BY record_id ORDER BY commit_ms
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked)
SELECT min(commit_ms) AS sess_start_ms,
  max(commit_ms) + 1800000 AS sess_end_ms,
  record_id, count(*) AS n_changes
FROM sess GROUP BY record_id, sid
ORDER BY record_id, sess_start_ms""",

    // per-source cap: DuckDB ranks each source in one node; the engine's
    // two-stage distributed top-K must admit exactly the same set
    "tp08_source_cap" -> """
WITH h AS (
  SELECT doc_id, source, md5('cap:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents),
r AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY hx, doc_id) AS rk
  FROM h)
SELECT doc_id, source, rk <= 20 AS kept FROM r ORDER BY doc_id""",

    // as-of semantics: latest order at-or-before each event; right side
    // pre-reduced to one row per (custkey, date) with max orderkey — the
    // deterministic tie rule both engines share
    "q14_asof_join" -> """
WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS t_ms FROM events),
o AS (SELECT o_custkey AS k, epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS t_ms,
             max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, o.o_orderkey, o.t_ms AS order_ms
FROM e ASOF LEFT JOIN o ON e.user_id + 1 = o.k AND o.t_ms <= e.t_ms
ORDER BY e.event_id""",

    "q15_range_join" -> """
WITH e AS (SELECT event_id, epoch_ms(ts) AS t_ms,
                  CAST(round(value * 100) AS BIGINT) AS val_cents, event_type
           FROM events),
inc AS (SELECT event_id AS inc_id, t_ms AS start_ms, t_ms + 900000 AS end_ms
        FROM e WHERE event_type = 'error')
SELECT inc.inc_id, inc.start_ms, count(*) AS n_events,
       CAST(sum(p.val_cents) AS BIGINT) AS sum_val_cents
FROM inc JOIN e p ON p.t_ms >= inc.start_ms AND p.t_ms <= inc.end_ms
GROUP BY inc.inc_id, inc.start_ms
ORDER BY inc.inc_id""",

    "txt04_fingerprint" -> """
SELECT doc_id,
  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp_md5
FROM documents ORDER BY doc_id""",

    "dd01_exact_dedup" -> """
WITH fp AS (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM documents)
SELECT doc_id,
  min(doc_id) OVER (PARTITION BY f) AS canonical_id,
  count(*) OVER (PARTITION BY f) AS n_copies
FROM fp ORDER BY doc_id""",

    "dd02_ngram_jaccard" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
k AS (
  SELECT doc_id, toks[1] || ' ' || toks[2] || ' ' || toks[3] AS prefix,
         list_distinct(toks) AS ws
  FROM t),
tot AS (SELECT count(*) AS n_docs FROM k),
keyed AS (
  SELECT doc_id, prefix FROM (
    SELECT doc_id, prefix, count(*) OVER (PARTITION BY prefix) AS df FROM k), tot
  WHERE df <= greatest(2.0, 0.01 * n_docs)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keyed a JOIN keyed b ON a.prefix = b.prefix AND a.doc_id < b.doc_id),
sim AS (
  SELECT id_a, id_b,
    len(list_filter(x.ws, v -> list_contains(y.ws, v))) AS inter,
    len(x.ws) + len(y.ws) - len(list_filter(x.ws, v -> list_contains(y.ws, v))) AS uni
  FROM pairs JOIN k x ON x.doc_id = id_a JOIN k y ON y.doc_id = id_b)
SELECT id_a, id_b, inter, uni FROM sim
WHERE CAST(inter AS DOUBLE) / uni >= 0.5
ORDER BY id_a, id_b""",

    "ann03_label_stats" -> """
SELECT label, count(*) AS n_vecs, max(len(embedding)) AS dim,
  CAST(sum(CAST(list_sum(list_transform(embedding,
    x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 100000000.0) AS BIGINT))) AS BIGINT)) AS BIGINT) AS sum_norm_sq_e8
FROM embeddings GROUP BY label ORDER BY label""",

    "mm01_media_meta" -> """
SELECT doc_id AS media_id,
  length(text) AS byte_len,
  16 + CAST(doc_id % 64 AS INT) AS width,
  16 + CAST(doc_id % 48 AS INT) AS height,
  1 + CAST(length(text) % 7 AS INT) AS n_frames,
  CASE WHEN doc_id % 2 = 0 THEN 'fake-h264' ELSE 'fake-av1' END AS codec,
  hex(substring(text, 1, 8)) AS frame0_hex
FROM documents ORDER BY media_id""",

    // frame i = 8 bytes at min(i*8, max(len-8, 0)), clamped at the blob
    // end — FakeCodec.sampleFrame's contract. DuckDB has no BLOB substring,
    // so the slice runs on the VARCHAR — byte-exact because the synthetic
    // documents are pure ASCII (octet_length == length corpus-wide, same
    // precondition mm01 relies on).
    "mm02_frame_samples" -> """
WITH m AS (
  SELECT doc_id AS media_id, text,
         octet_length(encode(text)) AS len,
         1 + octet_length(encode(text)) % 7 AS n_frames
  FROM documents),
idx AS (
  SELECT media_id, text, len, unnest(range(0, n_frames, 2)) AS frame_idx
  FROM m),
pos AS (
  SELECT media_id, text, len, frame_idx,
         CAST(least(frame_idx * 8, greatest(len - 8, 0)) AS INT) AS s0
  FROM idx)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
  hex(substring(text, s0 + 1, 8)) AS frame_hex
FROM pos ORDER BY media_id, frame_idx""",

    // nearest-neighbor byte resample: output byte i = source byte
    // floor(i*len/8) (FakeCodec.resize, 1-based substr oracle-side);
    // ASCII corpus makes VARCHAR slicing byte-exact, as in mm01/mm02
    "mm03_resize" -> """
WITH m AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents)
SELECT media_id,
  16 + CAST(media_id % 64 AS INT) AS src_w,
  16 + CAST(media_id % 48 AS INT) AS src_h,
  32 AS dst_w, 24 AS dst_h,
  hex(array_to_string(list_transform(range(0, 8),
    i -> substr(text, CAST(1 + (i * len) // 8 AS INT), 1)), '')) AS resized_hex
FROM m ORDER BY media_id""",

    // 16-bucket byte histogram (high nibble), long-form, zero buckets
    // dropped — group-by over exploded code points mirrors it exactly
    "mm04_features" -> """
WITH chars AS (
  SELECT doc_id AS media_id,
    unnest(list_transform(range(1, length(text) + 1),
      i -> unicode(substr(text, i, 1)))) AS cp
  FROM documents)
SELECT media_id, CAST(cp // 16 AS INT) AS bucket, count(*) AS n
FROM chars GROUP BY 1, 2 ORDER BY 1, 2""",

    // blob = utf8(text), so DuckDB's md5 over the string is the same
    // digest Spark computes over the binary column; null blobs excluded on
    // both sides (a null key would never survive the engine's join-back)
    "mm05_blob_dedup" -> """
WITH m AS (
  SELECT doc_id AS media_id, md5(text) AS f FROM documents WHERE text IS NOT NULL
  UNION ALL SELECT doc_id + 100000, md5(text) FROM documents WHERE text IS NOT NULL)
SELECT media_id,
  min(media_id) OVER (PARTITION BY f) AS canonical_id,
  count(*) OVER (PARTITION BY f) AS n_copies
FROM m ORDER BY media_id""",

    // mm06: the Spark side PNG-encodes a deterministic image per doc and
    // computes every column from the DECODED pixels (real javax.imageio
    // round trip); this oracle re-derives the same numbers from the pixel
    // formula alone — integer luma (299r+587g+114b)//1000, bucket //16,
    // NN resample src index (i*dim)//4 — so a hash match pins the codec's
    // pixel exactness, not just plumbing
    // mm09: the aHash near-dup buckets derived from FIRST PRINCIPLES —
    // pixel formula → integer luma → cross-multiplied threshold bits →
    // two unsigned 32-bit halves → equality-join buckets. PNG is
    // lossless, so the engine's decoded-side hash must equal this
    // pipe07: multimodal corpus assembly — dd01's exact-text canonical
    // joined with mm09's perceptual image canonical (same pixel-formula
    // hash derivation, planted mirrors included so bucket structure and
    // accidental collisions land identically); per-doc pair manifest
    "pipe07_mm_manifest" -> """
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
fp AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS n_tokens,
    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM d),
ct AS (SELECT f, min(doc_id) AS canonical_text_id FROM fp GROUP BY f),
ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
px AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS noisy, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM bits GROUP BY 1),
ci AS (SELECT ahash_hi, ahash_lo, min(media_id) AS canonical_image_id,
         count(*) AS bucket_size
       FROM hash GROUP BY 1, 2),
img AS (
  SELECT h.media_id AS doc_id, canonical_image_id,
    bucket_size > 1 AS image_shared
  FROM hash h JOIN ci USING (ahash_hi, ahash_lo)
  WHERE h.media_id < 100000)
SELECT fp.doc_id, canonical_text_id,
  fp.doc_id = canonical_text_id AS is_text_canonical,
  canonical_image_id, image_shared, n_tokens
FROM fp JOIN ct ON fp.f = ct.f JOIN img ON img.doc_id = fp.doc_id
ORDER BY fp.doc_id""",

    // mm15: Hamming near-dup — the oracle mirrors the SEMANTIC relation
    // (all pairs within distance 3, hashes re-derived from the pixel
    // formulas bit by bit); the engine's 4-chunk multi-index machinery is
    // invisible here BY THEOREM: pigeonhole guarantees every distance ≤ 3
    // pair shares a 16-bit chunk, so candidates == semantics
    "mm15_hamming_neardup" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 35 = 0
                THEN [doc_id, doc_id + 100000, doc_id + 200000]
                WHEN doc_id % 5 = 0 THEN [doc_id, doc_id + 100000]
                WHEN doc_id % 7 = 0 THEN [doc_id, doc_id + 200000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
px AS (
  SELECT media_id, media_id % 100000 AS id,
    media_id >= 100000 AND media_id < 200000 AS noisy,
    media_id >= 200000 AS edited, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              WHEN edited AND (x + y) % 9 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 64) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY 1)
SELECT a.media_id AS a_id, b.media_id AS b_id,
  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
FROM hash a JOIN hash b ON a.media_id < b.media_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
ORDER BY a_id, b_id""",

    // mm16: the Hamming crawl loop — every (edited arrival, original)
    // pair within distance 3, the mm15 semantic relation restricted to
    // the loop's bootstrap-vs-arrival shape (arrival↔arrival matches are
    // excluded as batch-order-dependent); candidate completeness is the
    // pigeonhole theorem, so the chunk-index machinery is invisible here
    "mm16_hamming_stream" -> """
WITH ids AS (
  SELECT doc_id AS media_id FROM documents
  UNION ALL
  SELECT doc_id + 200000 FROM documents WHERE doc_id % 7 = 0),
px AS (
  SELECT media_id, media_id % 100000 AS id,
    media_id >= 100000 AND media_id < 200000 AS noisy,
    media_id >= 200000 AS edited, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              WHEN edited AND (x + y) % 9 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 64) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY 1)
SELECT a.media_id AS batch_id, b.media_id AS corpus_id,
  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
FROM hash a JOIN hash b
  ON a.media_id >= 200000 AND b.media_id < 100000
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
ORDER BY batch_id, corpus_id""",

    // mm17: mm16's semantic relation through chunk-index compaction —
    // rows copied verbatim, so the screen is provably identical; the
    // leaf census (4 appended leaves in, 1 referenced out) rides the
    // gated relation, so a compaction that lost/duplicated rows or a
    // manifest that miscounted committed leaves both break the hash
    "mm17_chunk_compact" -> """
WITH ids AS (
  SELECT doc_id AS media_id FROM documents
  UNION ALL
  SELECT doc_id + 200000 FROM documents WHERE doc_id % 7 = 0),
px AS (
  SELECT media_id, media_id % 100000 AS id,
    media_id >= 100000 AND media_id < 200000 AS noisy,
    media_id >= 200000 AS edited, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              WHEN edited AND (x + y) % 9 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 64) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY 1)
SELECT a.media_id AS batch_id, b.media_id AS corpus_id,
  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist,
  4 AS n_leaves_before, 1 AS n_leaves_after
FROM hash a JOIN hash b
  ON a.media_id >= 200000 AND b.media_id < 100000
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
ORDER BY batch_id, corpus_id""",

    // pipe12: the replica→multimodal reconcile — post-sync membership is
    // (all media ∖ the %9 delete wave) in BOTH stores, so the screens are
    // mm18's eq+ham relations restricted to survivors; the censuses are
    // the planting formulas themselves (every %9 id was bootstrapped —
    // 9's residue class sits inside 3's — and every %3!=0 id folds)
    "pipe12_ahash_sync_facade" -> """
WITH ids AS (
  SELECT doc_id AS media_id FROM documents
  UNION ALL
  SELECT doc_id + 100000 FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000 FROM documents WHERE doc_id % 7 = 0),
px AS (
  SELECT media_id, media_id % 100000 AS id,
    media_id >= 100000 AND media_id < 200000 AS noisy,
    media_id >= 200000 AS edited, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              WHEN edited AND (x + y) % 9 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 64) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY 1),
eq AS (
  SELECT 'eq' AS lane, a.media_id AS batch_id, b.media_id AS corpus_id,
    CAST(0 AS BIGINT) AS dist
  FROM hash a JOIN hash b ON a.hi = b.hi AND a.lo = b.lo
  WHERE a.media_id >= 100000 AND a.media_id < 200000
    AND b.media_id < 100000 AND b.media_id % 9 <> 0),
ham AS (
  SELECT 'ham' AS lane, a.media_id AS batch_id, b.media_id AS corpus_id,
    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
  FROM hash a JOIN hash b ON a.media_id >= 200000 AND b.media_id < 100000
  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
    AND b.media_id % 9 <> 0)
SELECT lane, batch_id, corpus_id, dist,
  CAST((SELECT count(*) FROM documents WHERE doc_id % 9 = 0) AS BIGINT) AS n_deleted,
  CAST((SELECT count(*) FROM documents WHERE doc_id % 3 <> 0) AS BIGINT) AS n_appended
FROM (SELECT * FROM eq UNION ALL SELECT * FROM ham)
ORDER BY lane, batch_id, corpus_id""",

    // pipe13: the replica→graph reconcile — post-sync every live vector
    // is a searchable vertex, so the copy-of-live proof search resolves
    // each original at sim 1.0 (the seed IS the original; no duplicate
    // vectors in the fixture, naturals cap ≈ 0.4); the censuses are the
    // planting formulas (every %9 id was a bootstrap vertex — 9's
    // residue class sits inside 3's and the nlist=1 build makes vertex
    // membership total — and every %3!=0 id greedy-links)
    "pipe13_graph_sync_facade" -> """
SELECT vec_id + 100000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim,
  CAST((SELECT count(*) FROM embeddings WHERE vec_id % 9 = 0) AS BIGINT)
    AS n_deleted,
  CAST((SELECT count(*) FROM embeddings WHERE vec_id % 3 <> 0) AS BIGINT)
    AS n_linked
FROM embeddings WHERE vec_id < 64 AND vec_id % 9 <> 0
ORDER BY query_id""",

    // mm19: the sharded chunk-index build — mm16's Hamming relation
    // restricted to survivors of the per-shard takedowns (their union is
    // exactly %9 == 0); chunk rows are pure per-media functions, so the
    // merged store equals a single build-then-delete
    "mm19_shard_merge" -> """
WITH ids AS (
  SELECT doc_id AS media_id FROM documents
  UNION ALL
  SELECT doc_id + 200000 FROM documents WHERE doc_id % 7 = 0),
px AS (
  SELECT media_id, media_id % 100000 AS id,
    media_id >= 100000 AND media_id < 200000 AS noisy,
    media_id >= 200000 AS edited, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              WHEN edited AND (x + y) % 9 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 64) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY 1)
SELECT a.media_id AS batch_id, b.media_id AS corpus_id,
  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist,
  2 AS n_shards
FROM hash a JOIN hash b
  ON a.media_id >= 200000 AND b.media_id < 100000
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
  AND b.media_id % 9 <> 0
ORDER BY batch_id, corpus_id""",

    // mm18: takedown deletes through BOTH perceptual indexes — the
    // mm10 equality relation and the mm16 Hamming relation, each
    // restricted to SURVIVING originals (media_id % 9 <> 0 — the
    // tombstoned wave matches nothing in either lane); n_passes = 2
    // pins pre- and post-compaction screens row-identical (compaction
    // drops dead rows physically, live rows verbatim)
    "mm18_index_delete" -> """
WITH ids AS (
  SELECT doc_id AS media_id FROM documents
  UNION ALL
  SELECT doc_id + 100000 FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 200000 FROM documents WHERE doc_id % 7 = 0),
px AS (
  SELECT media_id, media_id % 100000 AS id,
    media_id >= 100000 AND media_id < 200000 AS noisy,
    media_id >= 200000 AS edited, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              WHEN edited AND (x + y) % 9 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 64) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS lo
  FROM bits GROUP BY 1),
eq AS (
  SELECT 'eq' AS lane, a.media_id AS batch_id, b.media_id AS corpus_id,
    CAST(0 AS BIGINT) AS dist
  FROM hash a JOIN hash b ON a.hi = b.hi AND a.lo = b.lo
  WHERE a.media_id >= 100000 AND a.media_id < 200000
    AND b.media_id < 100000 AND b.media_id % 9 <> 0),
ham AS (
  SELECT 'ham' AS lane, a.media_id AS batch_id, b.media_id AS corpus_id,
    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS dist
  FROM hash a JOIN hash b ON a.media_id >= 200000 AND b.media_id < 100000
  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
    AND b.media_id % 9 <> 0)
SELECT lane, batch_id, corpus_id, dist, CAST(2 AS BIGINT) AS n_passes
FROM (SELECT * FROM eq UNION ALL SELECT * FROM ham)
ORDER BY lane, batch_id, corpus_id""",

    "mm09_image_ahash" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
px AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS noisy, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM bits GROUP BY 1),
bk AS (SELECT ahash_hi, ahash_lo, count(*) AS bucket_size
       FROM hash GROUP BY 1, 2)
SELECT h.media_id, h.ahash_hi, h.ahash_lo, bk.bucket_size,
       bk.bucket_size > 1 AS is_dup
FROM hash h JOIN bk USING (ahash_hi, ahash_lo)
ORDER BY media_id""",

    // the image crawl loop gates on the copy→ORIGINAL equal-hash
    // relation: the same mm09 bit-by-bit hash derivation, joined on hash
    // equality across the planted boundary — whether each noisy copy (or
    // an accidental cross-original collision) matches is decided by the
    // identical integer arithmetic on both engines
    "mm10_ahash_stream" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
px AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS noisy, y, x
  FROM ids, range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + (y*8 + x) * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + (y*8 + x) * 52361 + 101) % 65521) % 256)
     + 114 * (CASE WHEN noisy AND (x + y) % 7 = 0
              THEN (((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 + 1) % 256
              ELSE ((id * 3266489917 + (y*8 + x) * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, sum(luma) AS total FROM lum GROUP BY 1),
bits AS (
  SELECT l.media_id, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t USING (media_id)),
hash AS (
  SELECT media_id,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM bits GROUP BY 1)
SELECT c.media_id AS batch_id, o.media_id AS corpus_id
FROM hash c JOIN hash o USING (ahash_hi, ahash_lo)
WHERE c.media_id >= 100000 AND o.media_id < 100000
ORDER BY batch_id, corpus_id""",

    "mm06_image_roundtrip" -> """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8 + doc_id % 24 AS INT) AS width,
         CAST(8 + doc_id % 16 AS INT) AS height
  FROM documents),
luma AS (
  SELECT media_id,
    CAST(list_sum(flatten(list_transform(range(0, height), y ->
      list_transform(range(0, width), x ->
        ((299 * ((media_id + 3*x + 5*y) % 256)
        + 587 * ((2*media_id + 7*x + y) % 256)
        + 114 * ((5*media_id + x + 11*y) % 256)) // 1000) // 16)))) AS BIGINT)
      AS luma_checksum
  FROM m),
rz AS (
  SELECT media_id,
    CAST(list_sum(flatten(list_transform(range(0, 4), j ->
      list_transform(range(0, 4), i ->
          ((media_id + 3*((i*width)//4) + 5*((j*height)//4)) % 256)
        + ((2*media_id + 7*((i*width)//4) + ((j*height)//4)) % 256)
        + ((5*media_id + ((i*width)//4) + 11*((j*height)//4)) % 256))))) AS BIGINT)
      AS resize_sum
  FROM m)
SELECT m.media_id, width, height,
  CAST(width AS BIGINT) * height AS hist_total,
  luma_checksum, resize_sum, true AS png_ok
FROM m JOIN luma ON m.media_id = luma.media_id
       JOIN rz ON m.media_id = rz.media_id
ORDER BY m.media_id""",

    // mm11: the audio near-dup fingerprint derived from FIRST PRINCIPLES —
    // sample formula → |amplitude| → 64 frame energies → cross-multiplied
    // mean-threshold bits → two unsigned 32-bit halves → equality-join
    // buckets. WAV PCM is lossless, so the engine's decoded-side
    // fingerprint must equal this
    "mm11_audio_fp" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
samp AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS dithered, i
  FROM ids, range(0, 1024) t(i)),
amp AS (
  SELECT media_id, i // 16 AS frame,
    abs((CASE WHEN dithered AND i % 13 = 0
         THEN (((id * 2654435761 + i * 40503 + id * i * 7919 + 17) % 65521) % 4096 + 1) % 4096
         ELSE ((id * 2654435761 + i * 40503 + id * i * 7919 + 17) % 65521) % 4096 END) - 2048) AS a
  FROM samp),
fe AS (SELECT media_id, frame, sum(a) AS e FROM amp GROUP BY 1, 2),
tot AS (SELECT media_id, sum(e) AS total FROM fe GROUP BY 1),
bits AS (
  SELECT f.media_id, f.frame,
    CASE WHEN f.e * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM fe f JOIN tot t USING (media_id)),
fp AS (
  SELECT media_id,
    CAST(sum(CASE WHEN frame >= 32
             THEN b * (CAST(1 AS BIGINT) << (frame - 32)) ELSE 0 END) AS BIGINT) AS afp_hi,
    CAST(sum(CASE WHEN frame < 32
             THEN b * (CAST(1 AS BIGINT) << frame) ELSE 0 END) AS BIGINT) AS afp_lo
  FROM bits GROUP BY 1),
bk AS (SELECT afp_hi, afp_lo, count(*) AS bucket_size
       FROM fp GROUP BY 1, 2)
SELECT f.media_id, f.afp_hi, f.afp_lo, bk.bucket_size,
       bk.bucket_size > 1 AS is_dup
FROM fp f JOIN bk USING (afp_hi, afp_lo)
ORDER BY media_id""",

    // mm12: the audio crawl loop gates on the copy→ORIGINAL
    // equal-fingerprint relation — the same mm11 bit-by-bit derivation,
    // joined on fingerprint equality across the planted boundary
    "mm12_afp_stream" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
samp AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS dithered, i
  FROM ids, range(0, 1024) t(i)),
amp AS (
  SELECT media_id, i // 16 AS frame,
    abs((CASE WHEN dithered AND i % 13 = 0
         THEN (((id * 2654435761 + i * 40503 + id * i * 7919 + 17) % 65521) % 4096 + 1) % 4096
         ELSE ((id * 2654435761 + i * 40503 + id * i * 7919 + 17) % 65521) % 4096 END) - 2048) AS a
  FROM samp),
fe AS (SELECT media_id, frame, sum(a) AS e FROM amp GROUP BY 1, 2),
tot AS (SELECT media_id, sum(e) AS total FROM fe GROUP BY 1),
bits AS (
  SELECT f.media_id, f.frame,
    CASE WHEN f.e * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM fe f JOIN tot t USING (media_id)),
fp AS (
  SELECT media_id,
    CAST(sum(CASE WHEN frame >= 32
             THEN b * (CAST(1 AS BIGINT) << (frame - 32)) ELSE 0 END) AS BIGINT) AS afp_hi,
    CAST(sum(CASE WHEN frame < 32
             THEN b * (CAST(1 AS BIGINT) << frame) ELSE 0 END) AS BIGINT) AS afp_lo
  FROM bits GROUP BY 1)
SELECT c.media_id AS batch_id, o.media_id AS corpus_id
FROM fp c JOIN fp o USING (afp_hi, afp_lo)
WHERE c.media_id >= 100000 AND o.media_id < 100000
ORDER BY batch_id, corpus_id""",

    // mm13: VIDEO near-dup from FIRST PRINCIPLES — 4 frames per clip,
    // pixel formula (position term spans the 256-pixel clip) → luma →
    // per-frame aHash bits → pairs matched by the ≥3-of-4 same-timestamp
    // frame vote. Noisy copies perturb frames ≠ 2 below the luma quantum
    // and frame 2 far above it, so the vote (not all-equality) links
    // them; every frame-hash (dis)agreement is decided by this same
    // integer arithmetic
    "mm13_video_fp" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
px AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS noisy, f, y, x, f * 64 + y * 8 + x AS p
  FROM ids, range(0, 4) tf(f), range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, f, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + p * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + p * 52361 + 101) % 65521) % 256)
     + 114 * (CASE
         WHEN noisy AND f <> 2 AND (x + y) % 7 = 0
           THEN (((id * 3266489917 + p * 44131 + 233) % 65521) % 256 + 1) % 256
         WHEN noisy AND f = 2 AND (x + y) % 2 = 0
           THEN (((id * 3266489917 + p * 44131 + 233) % 65521) % 256 + 96) % 256
         ELSE ((id * 3266489917 + p * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, f, sum(luma) AS total FROM lum GROUP BY 1, 2),
bits AS (
  SELECT l.media_id, l.f, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t ON l.media_id = t.media_id AND l.f = t.f),
hash AS (
  SELECT media_id, f,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS fh_hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS fh_lo
  FROM bits GROUP BY 1, 2)
SELECT a.media_id AS a_id, b.media_id AS b_id,
  CAST(count(*) AS BIGINT) AS n_frames_matched,
  count(*) >= 3 AS is_neardup
FROM hash a JOIN hash b
  ON a.f = b.f AND a.fh_hi = b.fh_hi AND a.fh_lo = b.fh_lo
  AND a.media_id < b.media_id
GROUP BY 1, 2
ORDER BY a_id, b_id""",

    // mm14: the video crawl loop — mm13's frame-hash derivation, pairs
    // restricted to (arriving copy, corpus ORIGINAL), timestamp-aligned
    // frame equality, >=3-of-4 vote; whether each frame of each copy
    // matches (the f=2 super-quantum edit breaks one) is decided by the
    // shared integer formula on both engines
    "mm14_vfp_stream" -> """
WITH ids AS (
  SELECT unnest(CASE WHEN doc_id % 5 = 0
                THEN [doc_id, doc_id + 100000]
                ELSE [doc_id] END) AS media_id
  FROM documents),
px AS (
  SELECT media_id,
    CASE WHEN media_id >= 100000 THEN media_id - 100000 ELSE media_id END AS id,
    media_id >= 100000 AS noisy, f, y, x, f * 64 + y * 8 + x AS p
  FROM ids, range(0, 4) tf(f), range(0, 8) ty(y), range(0, 8) tx(x)),
lum AS (
  SELECT media_id, f, y * 8 + x AS bit,
    (299 * (((id * 2654435761 + p * 40503 + 17) % 65521) % 256)
     + 587 * (((id * 2246822519 + p * 52361 + 101) % 65521) % 256)
     + 114 * (CASE
         WHEN noisy AND f <> 2 AND (x + y) % 7 = 0
           THEN (((id * 3266489917 + p * 44131 + 233) % 65521) % 256 + 1) % 256
         WHEN noisy AND f = 2 AND (x + y) % 2 = 0
           THEN (((id * 3266489917 + p * 44131 + 233) % 65521) % 256 + 96) % 256
         ELSE ((id * 3266489917 + p * 44131 + 233) % 65521) % 256 END)) // 1000 AS luma
  FROM px),
tot AS (SELECT media_id, f, sum(luma) AS total FROM lum GROUP BY 1, 2),
bits AS (
  SELECT l.media_id, l.f, l.bit,
    CASE WHEN l.luma * 64 > t.total THEN 1 ELSE 0 END AS b
  FROM lum l JOIN tot t ON l.media_id = t.media_id AND l.f = t.f),
hash AS (
  SELECT media_id, f,
    CAST(sum(CASE WHEN bit >= 32
             THEN b * (CAST(1 AS BIGINT) << (bit - 32)) ELSE 0 END) AS BIGINT) AS fh_hi,
    CAST(sum(CASE WHEN bit < 32
             THEN b * (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS fh_lo
  FROM bits GROUP BY 1, 2)
SELECT c.media_id AS batch_id, o.media_id AS corpus_id,
  CAST(count(*) AS BIGINT) AS n_frames_matched
FROM hash c JOIN hash o
  ON c.f = o.f AND c.fh_hi = o.fh_hi AND c.fh_lo = o.fh_lo
WHERE c.media_id >= 100000 AND o.media_id < 100000
GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY batch_id, corpus_id""",

    // mm07: the audio sibling of mm06 — Spark WAV-encodes a deterministic
    // 16-bit PCM signal per doc and computes every column from the
    // DECODED side (real javax.sound RIFF/WAVE parse); this oracle
    // re-derives the same numbers from the sample formula
    // ((id*31 + i*17) % 65536) - 32768, amplitude bucket least(15,|s|//2048)
    "mm07_audio_roundtrip" -> """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
         CAST(64 + doc_id % 128 AS INT) AS n_samples
  FROM documents),
s AS (
  SELECT media_id,
    CAST(list_sum(list_transform(range(0, n_samples), i ->
      abs((media_id*31 + i*17) % 65536 - 32768))) AS BIGINT) AS amp_checksum,
    CAST(list_sum(list_transform(range(0, n_samples), i ->
      least(15, abs((media_id*31 + i*17) % 65536 - 32768) // 2048))) AS BIGINT)
      AS hist_checksum
  FROM m)
SELECT m.media_id, sample_rate, CAST(1 AS INT) AS channels, n_samples,
  amp_checksum, hist_checksum, true AS wav_ok
FROM m JOIN s ON m.media_id = s.media_id
ORDER BY m.media_id""",

    // mm08: Spark writes a spec-conformant ISO BMFF header per doc and
    // parses it back with the independent box walker; this oracle
    // re-derives the parsed values from the geometry formulas —
    // duration_ms is integer (ticks * 1000) // timescale, as the parser
    // computes it
    "mm08_video_probe" -> """
SELECT doc_id AS media_id,
  CAST(320 + (doc_id % 16) * 8 AS INT) AS width,
  CAST(180 + (doc_id % 9) * 8 AS INT) AS height,
  CAST(1 AS INT) AS n_tracks,
  CAST(((10000 + doc_id % 5000) * 1000) // (1000 + (doc_id % 4) * 500) AS BIGINT)
    AS duration_ms,
  true AS mp4_ok
FROM documents ORDER BY media_id""",

    // the composed cleaning pass, mirrored stage by stage: union with
    // planted exact copies, quality gate, language bucket, min-per-
    // fingerprint dedup, per-language budget — a bug in any stage (a gate
    // dropping copies asymmetrically, a dedup keeping both) breaks the hash
    "pipe01_corpus_clean" -> """
WITH ingest AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE text IS NOT NULL),
feats AS (
  SELECT doc_id, text, length(text) AS len,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM ingest
  WHERE len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) >= 1),
scored AS (
  SELECT doc_id, text, len(t) AS n_tokens,
    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(t) * 2.0
      - CAST(len(list_filter(t, x -> length(x) <= 2)) AS DOUBLE) / len(t)
      + (CAST(len AS DOUBLE) / len(t)) / 10.0 AS quality,
    CASE WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) >= 0.10 THEN 'en'
         WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) >= 0.04 THEN 'maybe-en'
         ELSE 'other' END AS lang_pred
  FROM feats),
gated AS (SELECT * FROM scored WHERE quality >= 0.62),
fp AS (
  SELECT *, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM gated),
canon AS (SELECT f, min(doc_id) AS canonical_id FROM fp GROUP BY f)
SELECT lang_pred, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS token_budget,
  round(min(quality), 4) AS q_min, round(max(quality), 4) AS q_max
FROM fp JOIN canon USING (f)
WHERE doc_id = canonical_id
GROUP BY lang_pred ORDER BY lang_pred""",

    // the full five-stage corpus-prep pipeline: ingest+storm → gate →
    // dedup (storm cancels) → 8-gram benchmark decontamination (bench set
    // from the RAW originals, so stormy == clean provably) → 90/5/5 hash
    // split → per-(split, lang) budgets — every stage mirrored exactly
    "pipe02_train_corpus" -> """
WITH ingest AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE text IS NOT NULL),
feats AS (
  SELECT doc_id, text, length(text) AS len,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM ingest
  WHERE len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) >= 1),
scored AS (
  SELECT doc_id, text, t, len(t) AS n_tokens,
    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(t) * 2.0
      - CAST(len(list_filter(t, x -> length(x) <= 2)) AS DOUBLE) / len(t)
      + (CAST(len AS DOUBLE) / len(t)) / 10.0 AS quality,
    CASE WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) >= 0.10 THEN 'en'
         WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) >= 0.04 THEN 'maybe-en'
         ELSE 'other' END AS lang_pred
  FROM feats),
gated AS (SELECT * FROM scored WHERE quality >= 0.62),
fp AS (
  SELECT *, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM gated),
canon AS (SELECT f, min(doc_id) AS canonical_id FROM fp GROUP BY f),
dedup AS (
  SELECT doc_id, t, n_tokens, lang_pred FROM fp JOIN canon USING (f)
  WHERE doc_id = canonical_id),
bt AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL AND doc_id % 97 = 0),
bgrams AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(t) - 6),
    i -> array_to_string(t[i:i+7], ' ')))) AS gram
  FROM bt WHERE len(t) >= 8),
contaminated AS (
  SELECT DISTINCT d.doc_id
  FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 6),
          i -> array_to_string(t[i:i+7], ' ')))) AS gram
        FROM dedup WHERE len(t) >= 8) d
  JOIN bgrams USING (gram)),
clean AS (
  SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
sp AS (
  SELECT *, CAST(CAST(list_sum(list_transform(range(1, 5),
      i -> (strpos('0123456789abcdef',
              substr(md5('graft:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
           * ([4096, 256, 16, 1])[i])) AS BIGINT) % 100 AS INT) AS bucket
  FROM clean)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
  lang_pred, count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS token_budget
FROM sp GROUP BY 1, 2 ORDER BY split, lang_pred""",

    // pipe03: pipe02's per-doc pipeline (same CTE chain through `sp`),
    // train slice only, packed by the tp03 concat-then-chunk window —
    // the running sum is CAST from DuckDB's HUGEINT before any division
    "pipe03_export_pack" -> """
WITH ingest AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE text IS NOT NULL),
feats AS (
  SELECT doc_id, text, length(text) AS len,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM ingest
  WHERE len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) >= 1),
scored AS (
  SELECT doc_id, text, t, len(t) AS n_tokens,
    CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / len(t) * 2.0
      - CAST(len(list_filter(t, x -> length(x) <= 2)) AS DOUBLE) / len(t)
      + (CAST(len AS DOUBLE) / len(t)) / 10.0 AS quality,
    CASE WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) >= 0.10 THEN 'en'
         WHEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','on'))) AS DOUBLE) / len(t) >= 0.04 THEN 'maybe-en'
         ELSE 'other' END AS lang_pred
  FROM feats),
gated AS (SELECT * FROM scored WHERE quality >= 0.62),
fp AS (
  SELECT *, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM gated),
canon AS (SELECT f, min(doc_id) AS canonical_id FROM fp GROUP BY f),
dedup AS (
  SELECT doc_id, t, n_tokens FROM fp JOIN canon USING (f)
  WHERE doc_id = canonical_id),
bt AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL AND doc_id % 97 = 0),
bgrams AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(t) - 6),
    i -> array_to_string(t[i:i+7], ' ')))) AS gram
  FROM bt WHERE len(t) >= 8),
contaminated AS (
  SELECT DISTINCT d.doc_id
  FROM (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 6),
          i -> array_to_string(t[i:i+7], ' ')))) AS gram
        FROM dedup WHERE len(t) >= 8) d
  JOIN bgrams USING (gram)),
clean AS (
  SELECT * FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
sp AS (
  SELECT *, CAST(CAST(list_sum(list_transform(range(1, 5),
      i -> (strpos('0123456789abcdef',
              substr(md5('graft:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
           * ([4096, 256, 16, 1])[i])) AS BIGINT) % 100 AS INT) AS bucket
  FROM clean),
train AS (SELECT doc_id, n_tokens FROM sp WHERE bucket < 90),
c AS (
  SELECT doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
      AS start_offset
  FROM train)
SELECT doc_id, n_tokens, start_offset,
  start_offset // 2048 AS seq_id,
  start_offset % 2048 AS pos_in_seq
FROM c ORDER BY doc_id""",

    // planted-exact-copy recall oracles: the Spark side runs the whole
    // sketch → band join → verify pipeline over corpus ∪ exact copies and
    // keeps the planted relation, whose presence is a theorem (identical
    // input ⇒ identical sketch ⇒ shared bucket ⇒ verified at sim/jac 1.0,
    // hamming 0) — so the oracle is just the planting formula.
    "dd03_minhash_lsh" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
  CAST(1.0 AS DOUBLE) AS jaccard
FROM t WHERE len(toks) >= 3 ORDER BY id_a""",

    // incremental screening: every batch doc (an exact copy of a corpus
    // doc) collides with its original in every band and verifies at 1.0 —
    // the dd03 planting device, restricted to the planting relation; docs
    // too short to shingle (< 3 tokens) never enter the index
    // pipe10: the planting relation restricted to docs whose replica row
    // SURVIVES (last change per (table, record) is not a delete); the
    // tombstone census rides every row
    "pipe10_cdc_dedup_sync" -> s"""$changesCte,
last AS (
  SELECT table_name, record_id, max_by(op, seq) AS last_op
  FROM changes GROUP BY table_name, record_id),
dead AS (SELECT DISTINCT record_id FROM last WHERE last_op = 'delete'),
cens AS (SELECT CAST(count(*) AS BIGINT) AS n_tombstoned FROM dead),
t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard, n_tombstoned
FROM t CROSS JOIN cens
WHERE len(toks) >= 3
  AND doc_id NOT IN (SELECT record_id FROM dead)
ORDER BY batch_id""",

    // dd20: the planting relation restricted to SURVIVORS (doc_id % 9
    // != 0 was not tombstoned); n_lanes = 2 pins pre- and post-compaction
    // screens agreeing row-for-row — a screen that ignores tombstones, or
    // a compaction that loses live rows or keeps dead ones, breaks it
    "dd20_index_delete" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard, CAST(2 AS BIGINT) AS n_lanes
FROM t WHERE len(toks) >= 3 AND doc_id % 9 <> 0 ORDER BY batch_id""",

    "dd11_incremental" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard
FROM t WHERE len(toks) >= 3 ORDER BY batch_id""",

    // dd23: time travel — the asof lane is the version-1 snapshot (even
    // docs only, the %4 deletes not yet committed so they still match);
    // the now lane is the current screen (all docs minus the %4 dead)
    "dd23_time_travel" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT 'asof' AS lane, doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard
FROM t WHERE len(toks) >= 3 AND doc_id % 2 = 0
UNION ALL
SELECT 'now', doc_id + 100000, doc_id, CAST(1.0 AS DOUBLE)
FROM t WHERE len(toks) >= 3 AND doc_id % 4 <> 0
ORDER BY lane, batch_id""",

    // dd19: dd11's planting relation THROUGH dedup-index compaction —
    // rows are copied verbatim (each doc in exactly one leaf), so the
    // screen against the compacted store is identical; the leaf census
    // (4 crawl leaves in, exactly 1 out) rides the gated relation
    "dd19_index_compact" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard,
  4 AS n_leaves_before, 1 AS n_leaves_after
FROM t WHERE len(toks) >= 3 ORDER BY batch_id""",

    // dd13: the same planting relation as dd11 — every arriving copy
    // pairs with its original at Jaccard 1.0 REGARDLESS of which
    // micro-batch it arrived in, so the streaming loop's output is
    // batch-boundary independent and fully derivable
    "dd13_stream_increments" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard
FROM t WHERE len(toks) >= 3 ORDER BY batch_id""",

    // dd21: dd13's planted relation THROUGH in-stream compactions
    // (cadence 2 over 4 batches => the final fold is followed by a
    // compaction, so exactly one committed leaf remains); the census
    // breaks the hash if the cadence silently stops compacting or a
    // compaction loses rows
    "dd21_stream_compact" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard, 1 AS n_leaves_final
FROM t WHERE len(toks) >= 3 ORDER BY batch_id""",

    // dd22: the sharded-build planting theorem — band/set rows are pure
    // per-document functions, so the merged index is row-identical to a
    // single build and the screen returns exactly dd11's relation; the
    // shard census rides every row
    // pipe11: the reconcile-facade planting formulas — the index
    // bootstrapped with %3==0 docs, replica deletes %9==0; one sync
    // tombstones the indexed dead (%9==0 with >=3 tokens — shorter docs
    // never folded) and folds the live unindexed (%9!=0 and (%3!=0 or
    // <3 tokens)); the screen then pairs copies of every live foldable
    // doc and nothing else, censuses riding every row
    "pipe11_dedup_sync_facade" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents WHERE text IS NOT NULL),
cens AS (SELECT
  (SELECT count(*) FROM t WHERE doc_id % 9 = 0 AND len(toks) >= 3) AS n_deleted,
  (SELECT count(*) FROM t
   WHERE doc_id % 9 <> 0 AND (doc_id % 3 <> 0 OR len(toks) < 3)) AS n_folded)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard, n_deleted, n_folded
FROM t, cens
WHERE len(toks) >= 3 AND doc_id % 9 <> 0
ORDER BY batch_id""",

    "dd22_shard_merge" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS jaccard, 2 AS n_shards
FROM t WHERE len(toks) >= 3 ORDER BY batch_id""",

    // duplicated-span statistics: positional 8-gram corpus counts; the
    // covered-position total per doc is the interval-union length via the
    // monotone-end identity Σ min(k, s - prev_s) — integer math only
    "dd12_span_dedup" -> s"""$toksCte,
st AS (
  SELECT doc_id, t, unnest(range(0, len(t) - 8 + 1)) AS s
  FROM toks WHERE len(t) >= 8),
g AS (
  SELECT doc_id, s, md5(array_to_string(t[s+1:s+8], ' ')) AS gh FROM st),
dupg AS (SELECT gh FROM g GROUP BY gh HAVING count(*) > 1),
ds AS (SELECT doc_id, s FROM g JOIN dupg USING (gh)),
isl AS (
  SELECT doc_id,
    CASE WHEN prev IS NULL THEN 8 ELSE LEAST(8, s - prev) END AS contrib
  FROM (
    SELECT doc_id, s, lag(s) OVER (PARTITION BY doc_id ORDER BY s) AS prev
    FROM ds)),
agg AS (SELECT doc_id, sum(contrib) AS n_dup FROM isl GROUP BY 1)
SELECT d.doc_id, len(d.t) AS n_tokens,
  CAST(COALESCE(agg.n_dup, 0) AS BIGINT) AS n_dup_tokens,
  CASE WHEN len(d.t) > 0
       THEN CAST(COALESCE(agg.n_dup, 0) AS DOUBLE) / len(d.t)
       ELSE CAST(0 AS DOUBLE) END AS dup_frac
FROM toks d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id""",

    "dd04_simhash" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 0 AS hamming
FROM t WHERE len(toks) >= 1 ORDER BY id_a""",

    "dd05_cosine_neardup" -> """
SELECT vec_id AS id_a, vec_id + 100000 AS id_b, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings ORDER BY id_a""",

    // SemDeDup (cluster-then-prune): an exact copy's embedding is bitwise
    // its original's, so both take the same argmax cluster under the
    // deterministic tie-break and the within-cluster scoring finds the
    // pair at cosine exactly 1.0 — the planted relation is the provable
    // output (the dd05 device through the k-means pipeline)
    "dd14_semdedup" -> """
SELECT vec_id AS id_a, vec_id + 100000 AS id_b, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings ORDER BY id_a""",

    // set-containment join over distinct 3-shingle sets: the oracle
    // mirrors the WHOLE candidate machinery (df cap, rarest-shingle
    // signatures with (df, shingle) tie-break, inverted-index
    // collisions, set verification) — the dd02 hash-exact discipline;
    // planted prefix-half docs guarantee a non-empty contained-in
    // relation at containment 1.0
    "dd15_containment" -> """
WITH base AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
pl AS (
  SELECT doc_id + 100000 AS doc_id,
    array_to_string(
      (list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
        [1:(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) + 1) // 2],
      ' ') AS text
  FROM base WHERE doc_id % 5 = 0),
allr AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM allr),
k AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, len(toks) - 1),
      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ws
  FROM t WHERE len(toks) >= 3),
tok AS (SELECT doc_id, unnest(ws) AS tk FROM k),
tot AS (SELECT count(*) AS n_docs FROM k),
dfs AS (SELECT tk, count(*) AS df FROM tok GROUP BY 1),
capped AS (
  SELECT tok.doc_id, tok.tk, dfs.df FROM tok JOIN dfs USING (tk), tot
  WHERE dfs.df <= greatest(2.0, 0.01 * tot.n_docs)),
sig AS (
  SELECT tk, doc_id AS id_a FROM (
    SELECT doc_id, tk,
      row_number() OVER (PARTITION BY doc_id ORDER BY df, tk) AS rn
    FROM capped) WHERE rn <= 2),
inv AS (SELECT tk, doc_id AS id_b FROM capped),
cand AS (
  SELECT DISTINCT id_a, id_b FROM sig JOIN inv USING (tk)
  WHERE id_a <> id_b),
sim AS (
  SELECT id_a, id_b,
    len(list_filter(x.ws, v -> list_contains(y.ws, v))) AS inter,
    len(x.ws) AS na
  FROM cand JOIN k x ON x.doc_id = id_a JOIN k y ON y.doc_id = id_b)
SELECT id_a, id_b, inter, na FROM sim
WHERE CAST(inter AS DOUBLE) / na >= 0.8
ORDER BY id_a, id_b""",

    // the claims are constants BY DESIGN: the oracle pins the recall and
    // precision floors; Spark computes the actual fractions through the
    // full noisy-LSH pipeline — a degradation flips a boolean and the
    // hash mismatches (bounded PASS)
    "dd09_noisy_recall" -> """
SELECT count(*) AS n_planted, true AS recall_floor_met,
  true AS precision_floor_met
FROM embeddings""",

    // cross-split leakage: fingerprints, split buckets, and train counts
    // are all closed-form — DuckDB re-derives the whole construction
    "dd10_split_leakage" -> """
WITH all_docs AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT doc_id,
    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f,
    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id, text,
      CAST(CAST(list_sum(list_transform(range(1, 5),
          i -> (strpos('0123456789abcdef',
                substr(md5('graft:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
               * ([4096, 256, 16, 1])[i])) AS BIGINT) % 100 AS INT) AS b
    FROM all_docs)),
tc AS (
  SELECT f, count(*) AS n FROM s WHERE split = 'train' GROUP BY f)
SELECT s.doc_id, s.split, COALESCE(tc.n, 0) AS n_train_dups,
  COALESCE(tc.n, 0) > 0 AS leaked
FROM s LEFT JOIN tc USING (f)
WHERE s.split <> 'train' ORDER BY s.doc_id""",

    // components over planted triangles {x, x+100000, x+200000}: every
    // replica resolves to canonical x = vec_id % 100000 (naturals can't
    // merge: max natural cosine ≈ 0.4 < the 0.5 threshold)
    "dd08_components" -> """
WITH ids AS (
  SELECT vec_id FROM embeddings
  UNION ALL SELECT vec_id + 100000 FROM embeddings
  UNION ALL SELECT vec_id + 200000 FROM embeddings)
SELECT vec_id, vec_id % 100000 AS component_id
FROM ids ORDER BY vec_id""",

    "ann02_lsh_bucket" -> """
SELECT vec_id, vec_id + 100000 AS nearest_candidate,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings ORDER BY vec_id""",

    // ann16: k-NN graph planted theorem — every original's rank-1
    // neighbor is its exact copy and the edge is mutual (both directions
    // are rank-1, hence top-k, edges)
    "ann16_knn_graph" -> """
SELECT vec_id, vec_id + 100000 AS nbr_id, true AS mutual
FROM embeddings ORDER BY vec_id""",

    // ann18: greedy graph search planted theorem — each +200000 copy,
    // seeded at itself, reaches its sim-1.0 twins only through its
    // graph edges; exact rerank puts the ORIGINAL first (ascending-id
    // tie-break at sim 1.0)
    "ann18_graph_search" -> """
SELECT vec_id + 200000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann20: ann18's planted relation through build → PERSIST → reload →
    // search (the committed edge store is the only candidate source);
    // n_leaves = 1 pins the manifest-committed census
    "ann20_graph_persisted" -> """
SELECT vec_id + 200000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim, 1 AS n_leaves
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann22: takedowns through the persisted graph — the answer is the
    // original exactly when it survived and the +100000 twin exactly
    // when the %7 wave tombstoned it (anti-join before the top-k cut;
    // both twins sit in the seed's stored edges at sim 1.0); n_passes=2
    // pins the pre- and post-compaction searches row-identical
    "ann22_graph_delete" -> """
SELECT vec_id + 200000 AS query_id,
  CASE WHEN vec_id % 7 = 0 THEN vec_id + 100000 ELSE vec_id END AS match_id,
  CAST(1.0 AS DOUBLE) AS sim, CAST(2 AS BIGINT) AS n_passes,
  (SELECT count(*) FROM embeddings WHERE vec_id < 64 AND vec_id % 7 = 0)
    AS n_tombstones
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann23: the scale-out graph build — ann22's relation through two
    // parity shards (copies keep their original's parity, so each
    // planted triple's edges are within-shard and survive the union
    // verbatim), per-shard %7 takedowns riding the merge, searches over
    // the single merged edge leaf (n_leaves = 1)
    "ann23_graph_shard_merge" -> """
SELECT vec_id + 200000 AS query_id,
  CASE WHEN vec_id % 7 = 0 THEN vec_id + 100000 ELSE vec_id END AS match_id,
  CAST(1.0 AS DOUBLE) AS sim, 1 AS n_leaves,
  (SELECT count(*) FROM embeddings WHERE vec_id < 64 AND vec_id % 7 = 0)
    AS n_tombstones
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // ann24: the graph crawl loop — every arriving copy is seeded AT
    // its own original (hub seeds = the store's 64 smallest vec_ids =
    // the originals), so its top-1 is the original at sim 1.0 whatever
    // batch it arrived in and across the mid-loop refines
    "ann24_graph_stream" -> """
SELECT vec_id + 100000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64 ORDER BY query_id""",

    // pipe14: the full-fleet reconcile — all four families bootstrap
    // with the %3 slice of the non-null-text id universe and sync
    // against the same replica (every id inserted, %9 deleted later),
    // so every census collapses to the two planting formulas: delete
    // the %9 ids (9's residues sit inside 3's — all were bootstrapped),
    // add the %3 != 0 ids; solo == fleet per family by construction
    "pipe14_sync_all_fleet" -> """
WITH ids AS (SELECT doc_id AS id FROM documents
  WHERE text IS NOT NULL AND doc_id < 600),
 nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ids WHERE id % 9 = 0),
 na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ids WHERE id % 3 <> 0)
SELECT f.family, nd.n AS n_del_solo, na.n AS n_add_solo,
  nd.n AS n_del_fleet, na.n AS n_add_fleet, true AS census_match
FROM (VALUES ('ahash'), ('dedup'), ('graph'), ('vector')) f(family), nd, na
ORDER BY family""",

    // pipe15: the mixed-key fleet — dedup follows the docs table
    // (bootstrap %3, deletes %9 ⊂ the bootstrap slice, so every
    // deleted id was indexed), vector+graph share the vecs key
    // (bootstrap %3, deletes %7: only %21 ids are both indexed and
    // dead; adds are the alive-and-unindexed %7≠0 ∧ %3≠0 ids); solo ==
    // fleet per family by construction
    "pipe15_sync_mixed_fleet" -> """
WITH dids AS (SELECT doc_id AS id FROM documents
  WHERE text IS NOT NULL AND doc_id < 600),
 vids AS (SELECT vec_id AS id FROM embeddings WHERE vec_id < 500),
 dd AS (SELECT
   (SELECT CAST(count(*) AS BIGINT) FROM dids WHERE id % 9 = 0) AS ndel,
   (SELECT CAST(count(*) AS BIGINT) FROM dids WHERE id % 3 <> 0) AS nadd),
 vv AS (SELECT
   (SELECT CAST(count(*) AS BIGINT) FROM vids WHERE id % 21 = 0) AS ndel,
   (SELECT CAST(count(*) AS BIGINT) FROM vids
     WHERE id % 7 <> 0 AND id % 3 <> 0) AS nadd)
SELECT 'dedup' AS family, dd.ndel AS n_del_solo, dd.nadd AS n_add_solo,
  dd.ndel AS n_del_fleet, dd.nadd AS n_add_fleet, true AS census_match
FROM dd
UNION ALL SELECT 'graph', vv.ndel, vv.nadd, vv.ndel, vv.nadd, true FROM vv
UNION ALL SELECT 'vector', vv.ndel, vv.nadd, vv.ndel, vv.nadd, true FROM vv
ORDER BY family""",

    // sql01: the SQL read surface — TVF reads of the two-fold dedup
    // store: eligible (>=3-token) docs fold 16 band rows each, the
    // as-of lane pins the even-docs-only v1 snapshot (no tombstone
    // yet), n_mismatch = 0 gates SQL == Scala-API row-identity, and
    // the catalog row (v3 head, 32-group dial, 2 leaves, 1 tomb leaf,
    // default 8-version retention) rides every row
    "sql01_index_tvf" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
 e AS (SELECT doc_id FROM t WHERE len(toks) >= 3)
SELECT 'asof' AS lane,
  (SELECT count(*) FROM e WHERE doc_id % 2 = 0) AS n_docs,
  16 * (SELECT count(*) FROM e WHERE doc_id % 2 = 0) AS n_band_rows,
  CAST(0 AS BIGINT) AS n_tomb_rows, CAST(0 AS BIGINT) AS n_mismatch,
  CAST(1 AS BIGINT) AS version, CAST(3 AS BIGINT) AS head_version,
  32 AS groups, 2 AS n_leaves, 1 AS n_tombs, 8 AS retain
UNION ALL
SELECT 'now', (SELECT count(*) FROM e), 16 * (SELECT count(*) FROM e),
  CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(3 AS BIGINT),
  CAST(3 AS BIGINT), 32, 2, 1, 8
ORDER BY lane""",

    // sql02: the replica from SQL — every document id inserted, %4
    // deleted after the audit mark: the as-of TVF read sees every id,
    // the now read only survivors, and n_mismatch = 0 gates SQL ==
    // Scala-API row identity in both lanes
    "sql02_state_tvf" -> """
WITH ids AS (SELECT doc_id AS id FROM documents)
SELECT 'asof' AS lane, (SELECT CAST(count(*) AS BIGINT) FROM ids) AS n_rows,
  CAST(0 AS BIGINT) AS n_mismatch
UNION ALL
SELECT 'now', (SELECT count(*) FROM ids WHERE id % 4 <> 0),
  CAST(0 AS BIGINT)
ORDER BY lane""",

    // sql03: the SEARCHES from SQL — the gated rows are the planted-
    // exact-copy relations (batch = every doc at +100000): the dedup
    // screen matches every >=3-token doc at jaccard 1.0, the Hamming
    // screen every doc at distance 0 (formula hashes — identity needs
    // no machinery mirror); n_mismatch = 0 gates the SQL TVF row-
    // identical to the Scala call in both lanes
    "sql03_screen_tvf" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
 e AS (SELECT doc_id FROM t WHERE len(toks) >= 3)
SELECT 'dedup' AS lane, doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(1.0 AS DOUBLE) AS score, CAST(0 AS BIGINT) AS n_mismatch
FROM e
UNION ALL
SELECT 'hamming', doc_id + 100000, doc_id, CAST(0.0 AS DOUBLE),
  CAST(0 AS BIGINT)
FROM documents
ORDER BY lane, batch_id""",

    // sql04: vector + graph search from SQL — ann08's planting (top-1
    // = the +100000 appended copy at sim 1.0) and ann20's (query =
    // +200000 copy seeded at itself, answer = the original) through
    // the TVF lane; n_mismatch = 0 gates SQL == Scala in both lanes
    "sql04_topk_tvf" -> """
SELECT 'graph' AS lane, vec_id + 200000 AS query_id, vec_id AS match_id,
  CAST(1.0 AS DOUBLE) AS sim, CAST(0 AS BIGINT) AS n_mismatch
FROM embeddings WHERE vec_id < 64
UNION ALL
SELECT 'vector', vec_id, vec_id + 100000, CAST(1.0 AS DOUBLE),
  CAST(0 AS BIGINT)
FROM embeddings WHERE vec_id < 64
ORDER BY lane, query_id""",

    // sql05: fleet discovery — the dedup store's lifecycle lands at
    // v4 (two folds, one tombstone, the retention dial at 5), the
    // Hamming store at v1 (one fold); hist_match pins the catalog to
    // each store's graft_index_history head row
    "sql05_stores_tvf" -> """
SELECT 'images' AS store, 'hamming' AS family, CAST(1 AS BIGINT) AS version,
  32 AS groups, 1 AS n_leaves, 0 AS n_tombs, 8 AS retain,
  true AS hist_match
UNION ALL
SELECT 'neardup', 'dedup', CAST(4 AS BIGINT), 32, 2, 1, 5, true
ORDER BY store""",

    // sql06: time-travel SEARCH from SQL — the as-of lane answers from
    // the even-docs-only v1 snapshot (doc 0's later tombstone invisible
    // there), the now lane sees every eligible doc minus the tombstoned
    // 0; n_mismatch = 0 gates each lane row-identical to the Scala
    // At-call
    "sql06_screen_at_tvf" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
 e AS (SELECT doc_id FROM t WHERE len(toks) >= 3)
SELECT 'asof' AS lane, doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(0 AS BIGINT) AS n_mismatch
FROM e WHERE doc_id % 2 = 0
UNION ALL
SELECT 'now', doc_id + 100000, doc_id, CAST(0 AS BIGINT)
FROM e WHERE doc_id <> 0
ORDER BY lane, batch_id""",

    // dd24: snapshot export — the MARK clone screens as the source did
    // at the mark (even eligible docs, doc 0's later tombstone absent
    // from the clone), the HEAD clone as the source does now (all
    // eligible docs minus the tombstoned 0); n_mismatch = 0 gates each
    // clone row-identical to the corresponding source screen
    "dd24_snapshot_export" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
 e AS (SELECT doc_id FROM t WHERE len(toks) >= 3)
SELECT 'asof' AS lane, doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(0 AS BIGINT) AS n_mismatch
FROM e WHERE doc_id % 2 = 0
UNION ALL
SELECT 'head', doc_id + 100000, doc_id, CAST(0 AS BIGINT)
FROM e WHERE doc_id <> 0
ORDER BY lane, batch_id""",

    // sql08: maintenance from SQL — the clone of the v1 mark screens
    // exactly the even planted copies (n_mismatch = 0 vs the source's
    // as-of screen); the export receipt pins (version 1, 0 tombstones);
    // the retention dial commits v4 with retain 2, whose retirement
    // leaves exactly versions {2,3,4} in the history TVF
    "sql08_maintenance_tvf" -> """
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
 e AS (SELECT doc_id FROM t WHERE len(toks) >= 3)
SELECT doc_id + 100000 AS batch_id, doc_id AS corpus_id,
  CAST(0 AS BIGINT) AS n_mismatch, CAST(1 AS BIGINT) AS exp_version,
  0 AS exp_tombs, CAST(4 AS BIGINT) AS dial_version, 2 AS retain,
  CAST(3 AS BIGINT) AS n_hist, CAST(2 AS BIGINT) AS hist_floor
FROM e WHERE doc_id % 2 = 0
ORDER BY batch_id""",

    // sql07: the replica's DESCRIBE HISTORY — v1 inserts every id
    // (default 8-version retention), v2 dials retention to 3 (rows
    // unchanged), v3 deletes the %4 ids; each retained version pins its
    // own as-of row count and effective window
    "sql07_state_history" -> """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
 s AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents
   WHERE doc_id % 4 <> 0)
SELECT CAST(1 AS BIGINT) AS version, n.c AS n_rows, 16 AS nbuckets,
  8 AS retain FROM n
UNION ALL SELECT CAST(2 AS BIGINT), n.c, 16, 3 FROM n
UNION ALL SELECT CAST(3 AS BIGINT), s.c, 16, 3 FROM s
ORDER BY version""",

    // ann25: the filtered TIME-TRAVEL audit — at the v2 mark every
    // query matches its same-label +200000 twin at sim 1.0 (the
    // wrong-label +100000 decoy is pre-filtered despite the smaller
    // id); the now lane loses exactly the %3==0 twins tombstoned after
    // the mark (their queries fall below sim 1.0 and leave the planted
    // relation)
    "ann25_filtered_time_travel" -> """
SELECT 'asof' AS lane, vec_id AS query_id, label AS want_label,
  vec_id + 200000 AS match_id, CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64
UNION ALL
SELECT 'now', vec_id, label, vec_id + 200000, CAST(1.0 AS DOUBLE)
FROM embeddings WHERE vec_id < 64 AND vec_id % 3 <> 0
ORDER BY lane, query_id""",

    // ann26: the graph-quality floor — recall@1 vs brute force for
    // hub-seeded searches must clear 55% after build + 4 appends + one
    // refine (measured 65-72% healthy vs ~39% degraded; the measured
    // value is spec-pinned, the FLOOR is the cross-engine contract —
    // a quality regression flips floor_met and breaks the hash)
    "ann26_graph_recall" -> """
SELECT CAST(64 AS BIGINT) AS n_queries, CAST(55 AS BIGINT) AS floor_pct,
  true AS floor_met""",

    // ann27: the PQ drift/retrain audit — a drifted DOMAIN (per-subspace
    // one-hot topic atoms, a clustered manifold the isotropic base
    // never visits) must pull frozen-codebook recall@1 vs brute force
    // BELOW the floor (the build-time codebooks collapse the domain's
    // palette), retrain must restore it ABOVE (recovered atoms make
    // per-lane ADC near-exact; measured ~55% vs ~98% at sf0.01), and
    // the as-of search at the pre-retrain version must equal the
    // pre-retrain answer row-for-row (pinned geometry; exceptAll
    // identity folded into asof_pins_geometry). All lanes deterministic
    // (hash-ranked k-means seeds, hash atoms, vec_id tie-breaks), so
    // the booleans are stable; measured hit counts pinned in PqIndexSpec
    "ann27_retrain" -> """
SELECT CAST(64 AS BIGINT) AS n_queries, CAST(75 AS BIGINT) AS floor_pct,
  true AS drift_degrades, true AS retrain_restores,
  true AS asof_pins_geometry""",

    // ann19: NN-descent planted theorem — in the degraded k=1 graph
    // every +200000 node knows only its original; one refinement round
    // (2-hop + reverse candidates, exact verify) provably adds the
    // +100000 twin, so each node's top-2 is {original, +100000} at sim
    // 1.0 with the ascending-id tie-break fixing the order
    "ann19_nn_descent" -> """
SELECT vec_id + 200000 AS node_id, 1 AS rank, vec_id AS nbr_id,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 64
UNION ALL
SELECT vec_id + 200000, 2, vec_id + 100000, CAST(1.0 AS DOUBLE)
FROM embeddings WHERE vec_id < 64
ORDER BY node_id, rank""",

    "ann04_ivf_topk" -> """
SELECT vec_id AS query_id, 1 AS rnk, vec_id + 100000 AS vec_id,
  CAST(1.0 AS DOUBLE) AS sim
FROM embeddings WHERE vec_id < 8 ORDER BY query_id""",

    "ann01_brute_topk" -> """
WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
sims AS (
  SELECT q.query_id, e.vec_id,
    list_cosine_similarity(
      list_transform(q.q_emb, x -> CAST(x AS DOUBLE)),
      list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, sim,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rnk
  FROM sims)
SELECT query_id, rnk, vec_id, round(sim, 4) AS sim
FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",

    // ann12: the MIPS reduction mirrored — same augmented construction
    // (norm², max-norm M², sqrt tail dim CAST to FLOAT — the exact bits
    // the engine appends), ranked by augmented cosine, inner product
    // emitted per neighbor
    "ann12_mips_topk" -> """
WITH n AS (
  SELECT vec_id, embedding,
    list_sum(list_transform(embedding,
      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
  FROM embeddings),
m AS (SELECT max(n2) AS m2 FROM n),
aug AS (
  SELECT vec_id, embedding,
    list_append(embedding, CAST(sqrt(m2 - n2) AS FLOAT)) AS aug_emb
  FROM n, m),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb,
    list_append(embedding, CAST(0.0 AS FLOAT)) AS q_aug
  FROM embeddings WHERE vec_id < 8),
sims AS (
  SELECT q.query_id, a.vec_id,
    list_cosine_similarity(
      list_transform(q.q_aug, x -> CAST(x AS DOUBLE)),
      list_transform(a.aug_emb, x -> CAST(x AS DOUBLE))) AS sim_aug,
    list_inner_product(
      list_transform(q.q_emb, x -> CAST(x AS DOUBLE)),
      list_transform(a.embedding, x -> CAST(x AS DOUBLE))) AS ip
  FROM q JOIN aug a ON a.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, ip,
    row_number() OVER (PARTITION BY query_id ORDER BY sim_aug DESC, vec_id) AS rnk
  FROM sims)
SELECT query_id, rnk, vec_id, round(ip, 4) AS ip
FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""",

    // ---- training prep ----

    // benchmark = doc_id % 97 == 0 slice; plant: doc_id % 31 == 5 gains
    // benchmark doc 0's first 8 tokens — same planting device as dd03-05
    "tp01_decontaminate" -> """
WITH t0 AS (
  SELECT list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents WHERE doc_id = 0),
snip AS (SELECT array_to_string(t[1:8], ' ') AS snippet FROM t0),
docs AS (
  SELECT doc_id,
    CASE WHEN doc_id % 31 = 5 THEN text || ' ' || snippet ELSE text END AS text
  FROM documents, snip),
toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM docs),
grams AS (
  SELECT doc_id,
    CASE WHEN len(t) >= 8
         THEN list_distinct(list_transform(range(1, len(t) - 6),
           i -> array_to_string(t[i:i+7], ' ')))
         ELSE [] END AS g
  FROM toks),
bench AS (SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 97 = 0),
ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
hits AS (SELECT doc_id, count(*) AS n_hits FROM ex JOIN bench USING (gram) GROUP BY 1)
SELECT g.doc_id, len(g.g) AS n_grams,
  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  coalesce(h.n_hits, 0) > 0 AS contaminated
FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
ORDER BY g.doc_id""",

    "tp02_hash_split" -> """
WITH h AS (
  SELECT doc_id, substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 4) AS hx
  FROM documents),
b AS (
  SELECT doc_id, CAST(CAST(list_sum(list_transform(range(1, 5),
      i -> (strpos('0123456789abcdef', substr(hx, i, 1)) - 1)
           * ([4096, 256, 16, 1])[i])) AS BIGINT) % 100 AS INT) AS bucket
  FROM h)
SELECT doc_id, bucket,
  CASE WHEN bucket < 90 THEN 'train'
       WHEN bucket < 95 THEN 'val'
       ELSE 'test' END AS split
FROM b ORDER BY doc_id""",

    "tp03_seq_packing" -> """
WITH n AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL),
c AS (
  SELECT doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)
      AS start_offset
  FROM n)
SELECT doc_id, n_tokens, start_offset,
  start_offset // 2048 AS seq_id,
  start_offset % 2048 AS pos_in_seq
FROM c ORDER BY doc_id""",

    // plant: doc_id % 7 == 0 gains one email + one IPv4 + one phone derived
    // from doc_id; redaction order email → IP → phone is part of the contract
    // token-level loss mask: same planted-PII lane as tp04, same portable
    // regex dialect (Java rlike vs RE2 both read these patterns
    // identically); mask indexes are 1-based over the whitespace tokens
    "tp09_loss_mask" -> """
WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN text
      || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
      || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM documents),
t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM p),
m AS (
  SELECT doc_id, len(t) AS n_tokens,
    list_filter(range(1, len(t) + 1), i ->
      regexp_matches(t[i],
        '([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})|(\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b)|(\b555-\d{4}\b)')
      OR t[i] IN ('slow', 'dup')) AS mask_idx
  FROM t)
SELECT doc_id, n_tokens,
  COALESCE(array_to_string(mask_idx, ','), '') AS mask_csv,
  len(mask_idx) AS n_masked,
  CASE WHEN n_tokens > 0
       THEN CAST(len(mask_idx) AS DOUBLE) / n_tokens
       ELSE CAST(0 AS DOUBLE) END AS mask_frac
FROM m ORDER BY doc_id""",

    // tp11: loss masks in PACKED coordinates — tp03's serial prefix sum
    // over the PLANTED corpus composed with tp09's mask indexes; one row
    // per masked token with its global-tape and (sequence, offset) spot
    "tp11_packed_masks" -> """
WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN text
      || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
      || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM documents),
t AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM p WHERE doc_id IS NOT NULL),
c AS (
  SELECT doc_id, t,
    CAST(sum(len(t)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len(t) AS BIGINT)
      AS start_offset
  FROM t),
m AS (
  SELECT doc_id, start_offset,
    list_filter(range(1, len(t) + 1), i ->
      regexp_matches(t[i],
        '([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})|(\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b)|(\b555-\d{4}\b)')
      OR t[i] IN ('slow', 'dup')) AS mask_idx
  FROM c),
e AS (SELECT doc_id, start_offset, unnest(mask_idx) AS idx FROM m)
SELECT doc_id,
  CAST(start_offset + idx - 1 AS BIGINT) AS mask_global,
  (start_offset + idx - 1) // 2048 AS mask_seq_id,
  (start_offset + idx - 1) % 2048 AS mask_pos
FROM e ORDER BY doc_id, mask_global""",

    // tp10: benchmark-set contamination — positional 13-grams of every
    // non-benchmark doc screened against the DISTINCT gram set of the
    // doc_id % 17 == 0 benchmark subset; hits count POSITIONS
    "tp10_contamination" -> s"""$toksCte,
wn AS (SELECT doc_id, len(t) AS n_tokens, t FROM toks),
bg AS (
  SELECT DISTINCT md5(array_to_string(t[s+1:s+13], ' ')) AS gh
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 13 + 1)) AS s
        FROM wn WHERE doc_id % 17 = 0 AND len(t) >= 13)),
cg AS (
  SELECT doc_id, md5(array_to_string(t[s+1:s+13], ' ')) AS gh
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 13 + 1)) AS s
        FROM wn WHERE doc_id % 17 <> 0 AND len(t) >= 13)),
h AS (SELECT cg.doc_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM cg JOIN bg USING (gh) GROUP BY 1)
SELECT w.doc_id, w.n_tokens,
  CASE WHEN w.n_tokens >= 13 THEN w.n_tokens - 12 ELSE 0 END AS n_grams,
  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
  CASE WHEN w.n_tokens >= 13
       THEN CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / (w.n_tokens - 12)
       ELSE CAST(0 AS DOUBLE) END AS hit_frac,
  COALESCE(h.n_hit, 0) > 0 AS contaminated
FROM wn w LEFT JOIN h USING (doc_id)
WHERE w.doc_id % 17 <> 0
ORDER BY w.doc_id""",

    // tp14: the Bloom screen relation — set positions are the two 60-bit
    // md5-prefix halves of each DISTINCT benchmark gram hash mod 65536;
    // a corpus gram bloom-hits iff BOTH its positions are set (h IN set
    // is exactly the engine's bit test); the exact lane is tp10's
    "tp14_bloom_screen" -> s"""$toksCte,
wn AS (SELECT doc_id, len(t) AS n_tokens, t FROM toks),
bg AS (
  SELECT DISTINCT md5(array_to_string(t[s+1:s+13], ' ')) AS gh
  FROM (SELECT doc_id, t, unnest(range(0, len(t) - 13 + 1)) AS s
        FROM wn WHERE doc_id % 17 = 0 AND len(t) >= 13)),
bgp AS (
  SELECT CAST(('0x' || substring(gh, 1, 15)) AS BIGINT) % 65536 AS p FROM bg
  UNION
  SELECT CAST(('0x' || substring(gh, 17, 15)) AS BIGINT) % 65536 FROM bg),
cg AS (
  SELECT doc_id, gh,
    CAST(('0x' || substring(gh, 1, 15)) AS BIGINT) % 65536 AS h1,
    CAST(('0x' || substring(gh, 17, 15)) AS BIGINT) % 65536 AS h2
  FROM (
    SELECT doc_id, md5(array_to_string(t[s+1:s+13], ' ')) AS gh
    FROM (SELECT doc_id, t, unnest(range(0, len(t) - 13 + 1)) AS s
          FROM wn WHERE doc_id % 17 <> 0 AND len(t) >= 13))),
h AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN h1 IN (SELECT p FROM bgp)
                   AND h2 IN (SELECT p FROM bgp) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_bloom,
    CAST(sum(CASE WHEN gh IN (SELECT gh FROM bg) THEN 1 ELSE 0 END) AS BIGINT)
      AS n_exact
  FROM cg GROUP BY 1)
SELECT w.doc_id, w.n_tokens,
  CASE WHEN w.n_tokens >= 13 THEN w.n_tokens - 12 ELSE 0 END AS n_grams,
  COALESCE(h.n_bloom, 0) AS n_bloom_hits,
  COALESCE(h.n_exact, 0) AS n_exact_hits,
  COALESCE(h.n_bloom, 0) > 0 AS flagged_bloom,
  COALESCE(h.n_exact, 0) > 0 AS flagged_exact
FROM wn w LEFT JOIN h USING (doc_id)
WHERE w.doc_id % 17 <> 0
ORDER BY w.doc_id""",

    // tp13: CCNet-style perplexity terciles — txt17's pooled bigram
    // conditional estimate onto a 65536-cell integer grid (×2^16 is an
    // EXACT double scaling), per-cell histogram, running count from the
    // most fluent cell down, cutoff cells by the integer
    // cross-multiplication 3·cum ≥ N / 3·cum ≥ 2N, cutoff-cell docs to
    // the higher bucket — deterministic doc by doc on both engines
    "tp13_ppl_buckets" -> s"""$toksCte,
big AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        FROM toks WHERE len(t) >= 2)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
per AS (
  SELECT big.doc_id, count(*) AS n_bigrams, sum(c2.c2) AS sum_big_cnt,
    sum(c1.c1) AS sum_ctx_cnt
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) GROUP BY 1),
sc AS (
  SELECT d.doc_id,
    CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
    CASE WHEN COALESCE(per.n_bigrams, 0) > 0
         THEN CAST(per.sum_big_cnt AS DOUBLE) / per.sum_ctx_cnt
         ELSE CAST(0 AS DOUBLE) END AS cond_familiarity
  FROM toks d LEFT JOIN per USING (doc_id)),
gc AS (
  SELECT doc_id, n_bigrams, cond_familiarity,
    least(CAST(floor(cond_familiarity * 65536) AS BIGINT), 65535) AS gcell
  FROM sc),
cells AS (SELECT gcell, count(*) AS cnt FROM gc GROUP BY 1),
cum AS (
  SELECT gcell, sum(cnt) OVER (ORDER BY gcell DESC) AS cum,
         (SELECT sum(cnt) FROM cells) AS n
  FROM cells),
cuts AS (
  SELECT max(CASE WHEN cum * 3 >= n THEN gcell END) AS h_cut,
         max(CASE WHEN cum * 3 >= n * 2 THEN gcell END) AS m_cut
  FROM cum)
SELECT g.doc_id, g.n_bigrams, g.cond_familiarity, g.gcell,
  CASE WHEN g.gcell >= c.h_cut THEN 'head'
       WHEN g.gcell >= c.m_cut THEN 'middle'
       ELSE 'tail' END AS ppl_bucket,
  g.gcell >= c.m_cut AS kept
FROM gc g CROSS JOIN cuts c ORDER BY g.doc_id""",

    // tp12: DSIR hashed-ngram importance scoring — unigrams+bigrams into a
    // 65536-bucket space (first 4 md5 hex digits), target model = lang='en'
    // slice, raw model = whole corpus; verdict is the exact-integer
    // cross-multiplication t_mass·R - r_mass·T (sign of the pooled ratio)
    "tp12_dsir" -> """
WITH toks AS (
  SELECT doc_id, lang,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL),
g AS (
  SELECT doc_id, lang,
    unnest(t || list_transform(range(1, len(t)),
      i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toks WHERE len(t) >= 1),
b AS (
  SELECT doc_id, lang,
    CAST(list_sum(list_transform(range(1, 5),
      i -> (strpos('0123456789abcdef', substr(md5(gram), i, 1)) - 1)
           * ([4096, 256, 16, 1])[i])) AS BIGINT) AS bucket
  FROM g),
ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_t
       FROM b WHERE lang = 'en' GROUP BY 1),
cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c_r FROM b GROUP BY 1),
tot AS (SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM b WHERE lang = 'en') AS tt,
  (SELECT CAST(count(*) AS BIGINT) FROM b) AS rt),
mass AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
    CAST(sum(COALESCE(c_t, 0)) AS BIGINT) AS t_mass,
    CAST(sum(c_r) AS BIGINT) AS r_mass
  FROM b LEFT JOIN ct USING (bucket) JOIN cr USING (bucket)
  GROUP BY doc_id)
SELECT doc_id, n_grams, t_mass, r_mass,
  t_mass * rt - r_mass * tt AS score_num,
  (t_mass * rt - r_mass * tt) > 0 AS selected
FROM mass, tot ORDER BY doc_id""",

    // dd16: duplicate-chunk removal — 8-token non-overlapping units,
    // row_number over (unit md5) in (doc_id, pos) order, first wins;
    // cleaned text reassembled in pos order and gated by md5
    "dd16_chunk_dedup" -> """
WITH toks AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
  FROM documents WHERE text IS NOT NULL),
ch AS (
  SELECT doc_id, s AS pos, array_to_string(t[s*8+1 : s*8+8], ' ') AS unit
  FROM (SELECT doc_id, t, unnest(range(0, (len(t) + 7) // 8)) AS s
        FROM toks WHERE len(t) >= 1)),
rn AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(unit) ORDER BY doc_id, pos) AS rn FROM ch),
keptagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
    CAST(sum(len(string_split(unit, ' '))) AS BIGINT) AS kept_tokens,
    string_agg(unit, ' ' ORDER BY pos) AS cleaned
  FROM rn WHERE rn = 1 GROUP BY doc_id),
allagg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM ch GROUP BY doc_id)
SELECT a.doc_id, n_chunks,
  n_chunks - COALESCE(n_kept, 0) AS n_dup_chunks,
  COALESCE(kept_tokens, 0) AS kept_tokens,
  md5(COALESCE(cleaned, '')) AS cleaned_md5
FROM allagg a LEFT JOIN keptagg USING (doc_id) ORDER BY a.doc_id""",

    // dd17: soft dedup — duplicates DOWN-WEIGHTED, not removed: cluster =
    // dd01's normalized-text fingerprint, weight = 1e6 div n_copies in
    // integral ppm (no float division in the contract), effective token
    // mass = n_tokens · weight_ppm
    "dd17_soft_dedup" -> """
WITH planted AS (
  SELECT unnest(CASE WHEN doc_id % 21 = 0
                THEN [doc_id, doc_id + 200000, doc_id + 400000]
                WHEN doc_id % 7 = 0 THEN [doc_id, doc_id + 200000]
                ELSE [doc_id] END) AS doc_id, text
  FROM documents WHERE text IS NOT NULL),
fp AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
         x -> x <> '')) AS BIGINT) AS n_tokens,
    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM planted),
cl AS (SELECT f, CAST(count(*) AS BIGINT) AS n_copies FROM fp GROUP BY f)
SELECT doc_id, n_tokens, n_copies,
  CAST(1000000 AS BIGINT) // n_copies AS weight_ppm,
  n_tokens * (CAST(1000000 AS BIGINT) // n_copies) AS eff_token_ppm
FROM fp JOIN cl ON fp.f = cl.f ORDER BY doc_id""",

    // dd18: bounded edit-distance near-dup — exact-dedup canonicals
    // (group by content hash, min doc_id) blocked on the md5 of the
    // 200-char prefix, candidates verified by EXACT levenshtein ≤ 16.
    // The planted lane appends a 4-char tail to canonicals with
    // doc_id < 300 and length ≥ 250 (prefix untouched ⇒ same block;
    // insertions only ⇒ distance exactly 4); the oracle mirrors the
    // whole block/verify machinery so organic same-prefix pairs gate too
    "dd18_edit_dedup" -> """
WITH u AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
c AS (SELECT min(doc_id) AS doc_id, min(text) AS text
      FROM u GROUP BY md5(text)),
p AS (SELECT doc_id + 100000 AS doc_id, text || ' zqx' AS text
      FROM c WHERE doc_id < 300 AND length(text) >= 250),
allv AS (SELECT * FROM c UNION ALL SELECT * FROM p),
b AS (SELECT doc_id, text, md5(substr(text, 1, 200)) AS blk FROM allv),
pr AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
         CAST(levenshtein(a.text, b2.text) AS BIGINT) AS dist
       FROM b a JOIN b b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id)
SELECT id_a, id_b, dist FROM pr WHERE dist <= 16 ORDER BY id_a, id_b""",

    // tp15: length-bucketed batching efficiency — ceilings and padded
    // masses in pure integer arithmetic; saved fraction by 63-bit
    // cross-multiplied ppm (docs truncate to seqLen=2048 first,
    // granularity=64 — the operator defaults)
    // pipe09: the quantile sketch derives the packing geometry (seq_len =
    // corpus-wide p90 upper bound, gran = max(16, p50_hi // 4)), then the
    // tp15 report runs at exactly that geometry — the whole two-pass
    // planner mirrored, derived parameters riding every row
    "pipe09_sketch_pack" -> """
WITH t AS (
  SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
         x -> x <> '')) AS n0
  FROM documents WHERE text IS NOT NULL),
lens AS (SELECT CAST(n0 AS BIGINT) AS n FROM t WHERE n0 > 0),
bk AS (SELECT CAST(length(bin(n)) AS BIGINT) AS bucket FROM lens),
gq AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM bk GROUP BY bucket),
cq AS (SELECT bucket, sum(c) OVER (ORDER BY bucket) AS cum,
              sum(c) OVER () AS nd FROM gq),
geo AS (SELECT
  (CAST(1 AS BIGINT) <<
     CAST(min(CASE WHEN cum * 100 >= nd * 50 THEN bucket END) AS INT)) - 1
    AS p50_hi,
  (CAST(1 AS BIGINT) <<
     CAST(min(CASE WHEN cum * 100 >= nd * 90 THEN bucket END) AS INT)) - 1
    AS p90_hi
  FROM cq),
param AS (SELECT p90_hi AS seq_len, greatest(16, p50_hi // 4) AS gran
          FROM geo),
n AS (SELECT least(l.n, seq_len) AS n, seq_len, gran
      FROM lens l CROSS JOIN param),
b AS (SELECT ((n - 1) // gran + 1) * gran AS ceiling, n, seq_len, gran FROM n),
g AS (SELECT ceiling, seq_len, gran, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n) AS BIGINT) AS token_mass FROM b GROUP BY 1, 2, 3),
gc AS (SELECT max(ceiling) AS global_ceiling FROM b)
SELECT ceiling, n_docs, token_mass,
  n_docs * ceiling AS padded_mass,
  n_docs * global_ceiling AS naive_mass,
  ((n_docs * global_ceiling - n_docs * ceiling) * 1000000)
    // (n_docs * global_ceiling) AS saved_ppm,
  seq_len, gran
FROM g CROSS JOIN gc ORDER BY ceiling""",

    // tp16: the token-budget mixture plan — masses from the shared token
    // definition, shares from the fixture formula, alloc/rate/epochs by
    // the same split-multiplied integral arithmetic
    "tp16_budget_plan" -> """
WITH m AS (
  SELECT source,
    CAST(sum(len(list_filter(string_split_regex(trim(text), '\s+'),
      x -> x <> ''))) AS BIGINT) AS token_mass
  FROM documents WHERE text IS NOT NULL GROUP BY source),
tot AS (SELECT CAST(sum(token_mass) AS BIGINT) AS budget FROM m),
p AS (
  SELECT source, token_mass, budget,
    ((CAST(substring(source, 4) AS BIGINT) + 1) * 1000000) // 210 AS share_ppm
  FROM m CROSS JOIN tot),
a AS (
  SELECT *, (budget // 1000000) * share_ppm
            + ((budget % 1000000) * share_ppm) // 1000000 AS alloc_tokens
  FROM p)
SELECT source, token_mass, budget, share_ppm, alloc_tokens,
  CASE WHEN alloc_tokens >= token_mass THEN 1000
       ELSE (alloc_tokens * 1000) // token_mass END AS rate_permille,
  (alloc_tokens // token_mass) * 1000
    + ((alloc_tokens % token_mass) * 1000) // token_mass AS epochs_permille,
  greatest(0, alloc_tokens - token_mass) AS repeat_tokens
FROM a ORDER BY source""",

    "tp15_length_buckets" -> """
WITH t AS (
  SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
         x -> x <> '')) AS n0
  FROM documents WHERE text IS NOT NULL),
n AS (SELECT least(CAST(n0 AS BIGINT), 2048) AS n FROM t WHERE n0 > 0),
b AS (SELECT ((n - 1) // 64 + 1) * 64 AS ceiling, n FROM n),
g AS (SELECT ceiling, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n) AS BIGINT) AS token_mass FROM b GROUP BY ceiling),
gc AS (SELECT max(ceiling) AS global_ceiling FROM b)
SELECT ceiling, n_docs, token_mass,
  n_docs * ceiling AS padded_mass,
  n_docs * global_ceiling AS naive_mass,
  ((n_docs * global_ceiling - n_docs * ceiling) * 1000000)
    // (n_docs * global_ceiling) AS saved_ppm
FROM g CROSS JOIN gc ORDER BY ceiling""",

    "tp04_pii_scrub" -> """
WITH p AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN text
      || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
      || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM documents)
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
  len(regexp_extract_all(text, '\b555-\d{4}\b')) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
    '\b555-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5
FROM p ORDER BY doc_id""",

    // mixture shares ∝ k+1 for srcK; rate = min(1, share·budget/n_src),
    // threshold = floor(rate·65536); doubles derive from integer counts
    // through the identical expression order on both engines
    "tp06_mixture" -> """
WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
t AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_total FROM c),
r AS (
  SELECT source,
    CAST(floor(least(CAST(1 AS DOUBLE),
      (CAST(CAST(substr(source, 4) AS INT) + 1 AS DOUBLE) / CAST(210 AS DOUBLE))
        * floor(n_total * CAST(0.6 AS DOUBLE)) / n_src)
      * CAST(65536 AS DOUBLE)) AS BIGINT) AS thresh
  FROM c, t),
v AS (
  SELECT doc_id, source,
    CAST(list_sum(list_transform(range(1, 5),
      i -> (strpos('0123456789abcdef',
              substr(md5('mix:' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
           * ([4096, 256, 16, 1])[i])) AS BIGINT) AS v
  FROM documents)
SELECT doc_id, v.source, v, thresh, v < thresh AS kept
FROM v JOIN r USING (source) ORDER BY doc_id""",

    // global shuffle rank: DuckDB sorts in one node what the engine ranks
    // via bucketed windows + a distributed prefix sum — same permutation
    "tp07_epoch_shuffle" -> """
SELECT doc_id, 1 AS epoch,
  row_number() OVER (
    ORDER BY md5('epoch1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS pos
FROM documents ORDER BY doc_id""",

    // integer invariants of int8 scalar quantization; the double expression
    // order (amax/127, x/scale, round) mirrors the Spark side exactly
    "tp05_embed_quant" -> """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
a AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM v),
q AS (
  SELECT vec_id, amax,
    CASE WHEN amax > 0
         THEN list_transform(v, x -> CAST(round(x / (amax / CAST(127 AS DOUBLE))) AS INT))
         ELSE list_transform(v, x -> 0) END AS q
  FROM a)
SELECT vec_id, len(q) AS dim,
  CAST(round(amax * CAST(100000000 AS DOUBLE)) AS BIGINT) AS amax_e8,
  CAST(list_sum(q) AS BIGINT) AS sum_q,
  list_max(list_transform(q, x -> abs(x))) AS max_abs_q,
  len(list_filter(q, x -> abs(x) = 127)) AS n_sat
FROM q ORDER BY vec_id"""
  )
}
