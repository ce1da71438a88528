package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    analytics.Queries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> ((s, d) => analytics.Queries.pricingSummary(s, d)),
    "a2_topk_revenue" -> ((s, d) => analytics.Queries.topkRevenue(s, d)),
    "a3_multi_join" -> ((s, d) => analytics.Queries.multiJoinVolume(s, d)),
    "a4_window_rank" -> ((s, d) => analytics.Queries.windowRank(s, d)),
    "a5_distinct_stats" -> ((s, d) => analytics.Queries.distinctStats(s, d)),
    "a6_semi_anti" -> ((s, d) => analytics.Queries.semiAnti(s, d)),
    "a7_rollup" -> ((s, d) => analytics.Queries.rollupStats(s, d)),
    "p1_bronze_decode" -> ((s, d) => pipeline.Medallion.p1BronzeDecode(s, d)),
    "p2_silver_clean" -> ((s, d) => pipeline.Medallion.p2SilverClean(s, d)),
    "p3_gold_window15m" -> ((s, d) => pipeline.Medallion.p3GoldWindow(s, d)),
    "p4_gold_sliding" -> ((s, d) => pipeline.Medallion.p4GoldSliding(s, d)),
    "p5_dq_checks" -> ((s, d) => quality.Checks.p5EventChecks(s, d)),
    "p6_stream_gold" -> ((s, d) => streaming.Streams.p6StreamGold(s, d)),
    "p7_backfill_silver" -> ((s, d) => pipeline.Medallion.p7Backfill(s, d)),
    "t1_quality_score" -> ((s, d) => text.TextAnalysis.t1Quality(s, d)),
    "t2_token_count" -> ((s, d) => text.TextAnalysis.t2Tokens(s, d)),
    "t3_fingerprint" -> ((s, d) => text.TextAnalysis.t3Fingerprint(s, d)),
    "t4_lang_id" -> ((s, d) => text.TextAnalysis.t4LangId(s, d)),
    "d1_exact_dedup" -> ((s, d) => dedup.Dedup.d1(s, d)),
    "d2_minhash_lsh" -> ((s, d) => dedup.Dedup.d2(s, d)),
    "d3_simhash" -> ((s, d) => dedup.Dedup.d3(s, d)),
    "d4_ngram_jaccard" -> ((s, d) => dedup.Dedup.d4(s, d)),
    "d5_embed_neardup" -> ((s, d) => dedup.Dedup.d5(s, d)),
    "s1_knn_bruteforce" -> ((s, d) => similarity.Similarity.s1(s, d)),
    "s2_knn_lsh" -> ((s, d) => similarity.Similarity.s2(s, d)),
    "s3_ivf_knn" -> ((s, d) => similarity.Similarity.s3(s, d)),
    "m1_binary_meta" -> ((s, d) => multimodal.Multimodal.m1(s, d)),
    "m2_feature_extract" -> ((s, d) => multimodal.Multimodal.m2(s, d)),
    "st1_sessionize" -> ((s, d) => streaming.Sessionize.st1(s, d)),
    "st2_asof_join" -> ((s, d) => operators.AsOfJoin.st2(s, d)),
    "a8_percentiles" -> ((s, d) => analytics.Queries.percentiles(s, d)),
    "a8b_approx_percentiles" -> ((s, d) => analytics.Queries.approxPercentiles(s, d)),
    "a5b_approx_distinct" -> ((s, d) => analytics.Queries.approxDistinct(s, d)),
    "a9_moment_stats" -> ((s, d) => analytics.Queries.momentStats(s, d)),
    "a10_lag_lead" -> ((s, d) => analytics.Queries.lagLeadDeltas(s, d)),
    "x1_hash_sample" -> ((s, d) => text.Curation.x1HashSample(s, d)),
    "x2_source_cap" -> ((s, d) => text.Curation.x2SourceCap(s, d)),
    "x3_normalize" -> ((s, d) => text.Curation.x3Normalize(s, d)),
    "x4_curation" -> ((s, d) => text.Curation.x4Curation(s, d)),
    "d6_dedup_clusters" -> ((s, d) => dedup.Clusters.d6(s, d)),
    "st3_range_join" -> ((s, d) => operators.RangeJoin.st3(s, d)),
    "x5_stratified_sample" -> ((s, d) => text.Curation.x5StratifiedSample(s, d)),
    "d7_contamination" -> ((s, d) => dedup.Contamination.d7(s, d)),
    "m3_frame_sample" -> ((s, d) => multimodal.Multimodal.m3(s, d)),
    "t5_top_tokens" -> ((s, d) => text.TextAnalysis.t5TopTokens(s, d)),
    "x6_pack_sequences" -> ((s, d) => text.Curation.x6PackSequences(s, d)),
    "a11_promo_share" -> ((s, d) => analytics.Queries.promoRevenue(s, d)),
  )

  /** DuckDB-runnable ANSI SQL oracle per query key (same parquet
    * tables, registered by table name). Column aliases MUST match the
    * Spark side exactly.
    */
  def oracleSql: Map[String, String] = Map(
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a2_topk_revenue" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 20""".stripMargin,
    "a3_multi_join" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "a4_window_rank" ->
      """SELECT * FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, rn""".stripMargin,
    "a5_distinct_stats" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END),4) AS finished_value,
        | round(avg(o_totalprice),4) AS avg_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "a6_semi_anti" ->
      """SELECT c_custkey,
        | EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_orders
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "a7_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "p1_bronze_decode" ->
      """SELECT event_id, event_type,
        | CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "p2_silver_clean" ->
      """SELECT event_id, user_id, event_type,
        | date_trunc('minute', ts) AS event_minute,
        | (event_type = 'error') AS is_error,
        | CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events)
        |ORDER BY event_id""".stripMargin,
    "p3_gold_window15m" ->
      """SELECT event_type,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(avg(value),4) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    "p4_gold_sliding" ->
      """SELECT user_id,
        | round(avg(value),4) AS avg_value,
        | count(*) AS n_events,
        | window_start,
        | window_start + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *, time_bucket(INTERVAL '5 minutes', ts) - (o.i * INTERVAL '5 minutes') AS window_start
        |      FROM events CROSS JOIN (VALUES (0),(1),(2)) o(i))
        |GROUP BY user_id, window_start
        |ORDER BY window_start, user_id""".stripMargin,
    "p5_dq_checks" ->
      """SELECT * FROM (
        | SELECT 'avg_value' AS check_name, round(avg(value),6) AS value,
        |   round(avg(value),6) BETWEEN 0 AND 1000 AS passed FROM events
        | UNION ALL
        | SELECT 'duplicate_count_event_id', CAST(count(event_id) - count(DISTINCT event_id) AS DOUBLE) AS v,
        |   (count(event_id) - count(DISTINCT event_id)) <= 0 FROM events
        | UNION ALL
        | SELECT 'min_value', round(min(value),6) AS v, round(min(value),6) >= 0 FROM events
        | UNION ALL
        | SELECT 'missing_count_user_id', CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS v,
        |   sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) <= 0 FROM events
        | UNION ALL
        | SELECT 'row_count', CAST(count(*) AS DOUBLE) AS v, count(*) > 0 FROM events
        |) ORDER BY check_name""".stripMargin,
    "p6_stream_gold" ->
      """SELECT event_type,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(avg(value),4) AS avg_value,
        | count(*) AS n_events,
        | time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS window_end
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY event_type, time_bucket(INTERVAL '15 minutes', ts)
        |ORDER BY window_start, event_type""".stripMargin,
    "p7_backfill_silver" ->
      """SELECT user_id, count(*) AS n_events,
        | round(avg(pct_value),6) AS avg_pct_value,
        | round(sum(value),4) AS total_value,
        | max(date_trunc('minute', ts)) AS last_seen_minute
        |FROM (SELECT *,
        |   CASE WHEN (value + k) > 0 THEN value / (value + k) ELSE NULL END AS pct_value
        |  FROM (SELECT *, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE) AS k FROM events))
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "t1_quality_score" ->
      """SELECT doc_id, len_chars, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
        | round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        |FROM (
        | SELECT doc_id,
        |  length(text) AS len_chars,
        |  len(toks) AS n_tokens,
        |  round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
        |  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS mean_word_len
        | FROM (SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "t2_token_count" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(text, '\s+')) AS ws_tokens,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(list_distinct(regexp_split_to_array(lower(text), '\s+'))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d1_exact_dedup" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3)
        |SELECT a_id, b_id, round(j, 6) AS jaccard FROM (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        | FROM g a JOIN g b ON a.doc_id < b.doc_id)
        |WHERE j >= 0.5 ORDER BY a_id, b_id""".stripMargin,
    "d5_embed_neardup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
    "s1_knn_bruteforce" ->
      """SELECT q_id, n_id, rank, round(cos, 6) AS cosine FROM (
        | SELECT q.vec_id AS q_id, c.vec_id AS n_id,
        |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS cos,
        |  row_number() OVER (PARTITION BY q.vec_id
        |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        | FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        | WHERE q.vec_id % 50 = 0)
        |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id,
        | octet_length(encode(text)) AS byte_len,
        | upper(substr(hex(encode(text)), 1, 4)) AS magic_hex,
        | md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "st1_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
        |y AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |      FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM x)),
        |z AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM y)
        |SELECT user_id, session_seq,
        | min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        | count(*) AS n_events, round(sum(value),4) AS total_value
        |FROM z GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,
    "st2_asof_join" ->
      """SELECT l.event_id, l.user_id,
        | r.event_id AS signup_event_id, r.ts_us AS signup_ts_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events) l
        |ASOF LEFT JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'signup') r
        | ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        |ORDER BY l.event_id""".stripMargin,
    "a8_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
        | round(quantile_cont(l_extendedprice, 0.75), 4) AS price_p75,
        | round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // a5b: same tolerance-flag pattern as a8b — oracle states the
    // exact distinct counts and `true` flags
    "a5b_approx_distinct" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS exact_custs,
        | true AS approx_within_5pct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // a8b: oracle states the EXACT percentiles and `true` tolerance
    // flags — the Spark side computes both sketch and exact, so any
    // sketch drift beyond 1% relative error hash-mismatches here
    "a8b_approx_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50_exact,
        | round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95_exact,
        | true AS p50_within_tol,
        | true AS p95_within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a9_moment_stats" ->
      """SELECT l_linestatus,
        | round(stddev_samp(l_extendedprice), 4) AS price_sd,
        | round(var_samp(l_quantity), 6) AS qty_var,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_cov
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "a10_lag_lead" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, prev_price, next_price,
        | round(l_extendedprice - prev_price, 4) AS delta_prev
        |FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |  lag(l_extendedprice) OVER w AS prev_price,
        |  lead(l_extendedprice) OVER w AS next_price
        | FROM lineitem
        | WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "x1_hash_sample" ->
      """SELECT doc_id, source FROM documents WHERE doc_id % 10 < 3 ORDER BY doc_id""".stripMargin,
    "x2_source_cap" ->
      """SELECT doc_id, source, quality_score FROM (
        | SELECT doc_id, source, quality_score,
        |  row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rn
        | FROM (
        |  SELECT doc_id, source,
        |   round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        |  FROM (
        |   SELECT doc_id, source, len(toks) AS n_tokens,
        |    round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |    round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |   FROM (SELECT doc_id, source, text, regexp_split_to_array(text, '\s+') AS toks FROM documents))))
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "x3_normalize" ->
      """SELECT doc_id,
        | trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'), '\s+', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x4_curation" ->
      """WITH n AS (
        | SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '<num>', 'g'), '\s+', ' ', 'g')) AS text
        | FROM documents),
        |s AS (
        | SELECT doc_id, source, text,
        |  round(least(1.0, n_tokens / 100.0) * 0.5 + stopword_ratio * 0.3 + (1.0 - punct_ratio) * 0.2, 6) AS quality_score
        | FROM (
        |  SELECT doc_id, source, text, len(toks) AS n_tokens,
        |   round(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text), 6) AS punct_ratio,
        |   round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(toks), 6) AS stopword_ratio
        |  FROM (SELECT doc_id, source, text, regexp_split_to_array(text, '\s+') AS toks FROM n))),
        |f AS (SELECT * FROM s WHERE quality_score >= 0.5),
        |k AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(text)),
        |d AS (SELECT f.* FROM f JOIN k USING (doc_id))
        |SELECT doc_id, source, quality_score FROM (
        | SELECT doc_id, source, quality_score,
        |  row_number() OVER (PARTITION BY source ORDER BY quality_score DESC, doc_id) AS rn
        | FROM d)
        |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,
    "st3_range_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        | p.ts_us - c.ts_us AS gap_us
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click') c
        |JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase') p
        | ON c.user_id = p.user_id
        | AND p.ts_us >= c.ts_us AND p.ts_us <= c.ts_us + 30 * 60 * 1000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "x5_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 10 < (CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 8 ELSE 6 END)
        |ORDER BY doc_id""".stripMargin,
    "a11_promo_share" ->
      """SELECT
        | round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4) AS promo_revenue,
        | round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
        | round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
        |       sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "t5_top_tokens" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin,
    // t4: stopword-profile argmax; ties break to the lexicographically
    // LARGEST language code (Spark sorts struct(hits, lang) descending)
    "t4_lang_id" ->
      """SELECT doc_id,
        | CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
        |      WHEN h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
        |      WHEN h_es >= h_en AND h_es >= h_de THEN 'es'
        |      WHEN h_en >= h_de THEN 'en'
        |      ELSE 'de' END AS lang_pred,
        | CAST(greatest(h_en, h_de, h_es, h_fr) AS INTEGER) AS lang_score
        |FROM (
        | SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the', 'and', 'of', 'to', 'is'))) AS h_en,
        |  len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS h_de,
        |  len(list_filter(toks, x -> x IN ('el', 'la', 'los', 'que', 'es'))) AS h_es,
        |  len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et', 'est'))) AS h_fr
        | FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin,
    // x6: replay of the chunked next-fit packer as a linear recursion
    // over each 64-id chunk (depth = docs per chunk)
    "x6_pack_sequences" ->
      """WITH RECURSIVE toks AS (
        | SELECT doc_id, CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS n,
        |  doc_id // 64 AS chunk,
        |  CAST(row_number() OVER (PARTITION BY doc_id // 64 ORDER BY doc_id) AS INTEGER) AS rn
        | FROM documents),
        |state AS (
        | SELECT chunk, rn, doc_id, n, 0 AS bin, n AS used FROM toks WHERE rn = 1
        | UNION ALL
        | SELECT t.chunk, t.rn, t.doc_id, t.n,
        |  CASE WHEN s.used > 0 AND s.used + t.n > 512 THEN s.bin + 1 ELSE s.bin END,
        |  CASE WHEN s.used > 0 AND s.used + t.n > 512 THEN t.n ELSE s.used + t.n END
        | FROM toks t JOIN state s ON t.chunk = s.chunk AND t.rn = s.rn + 1)
        |SELECT doc_id, chunk * 1048576 + bin AS bin_id, n AS n_tokens
        |FROM state ORDER BY doc_id""".stripMargin,
    // d6: connected components = transitive closure over the exact
    // jaccard pair set (the same pairs d4 verifies), min-id labels
    "d6_dedup_clusters" ->
      """WITH RECURSIVE g AS (
        | SELECT doc_id, list_distinct(list_transform(generate_series(1, len(toks) - 2),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        | FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        | WHERE len(toks) >= 3),
        |p AS (
        | SELECT a.doc_id AS a_id, b.doc_id AS b_id
        | FROM g a JOIN g b ON a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |       / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |edges AS (SELECT a_id AS src, b_id AS dst FROM p UNION SELECT b_id, a_id FROM p),
        |reach AS (
        | SELECT src AS id, src AS r FROM edges
        | UNION
        | SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
        |labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY cluster_id)
        |SELECT l.doc_id, l.cluster_id, s.cluster_size, (l.doc_id = l.cluster_id) AS keep
        |FROM labels l JOIN sizes s USING (cluster_id)
        |WHERE s.cluster_size > 1
        |ORDER BY l.doc_id""".stripMargin,
    // d3: bit-exact DuckDB replay of the simhash pipeline — FNV-1a 64
    // per token then the splitmix64 finalizer applied twice
    // (ShingleHashes n=1 mixes the token hash, then the 1-gram combine
    // mixes again), all in HUGEINT mod-2^64 arithmetic with 32-bit-split
    // modular multiplies (BIGINT would overflow-error, HUGEINT can't
    // hold a 64x64 product); bit-majority vote, then all-pairs
    // bit_count(xor) <= 3 — which is exactly what the Spark side's
    // pigeonhole blocking returns (3 flipped bits cannot touch all
    // four 16-bit chunks). Layered list_transform stages keep each
    // lambda tiny (a nested textual expansion re-evaluates
    // subexpressions exponentially).
    "d3_simhash" ->
      """WITH th AS (
        | SELECT doc_id, list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(list_transform(regexp_split_to_array(text, '\s+'), tk -> list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), list_transform(regexp_split_to_array(tk, ''), ch -> CAST(unicode(ch) AS HUGEINT))), (acc, c) -> (((xor(acc, c)) % 4294967296) * 435 + ((((xor(acc, c)) % 4294967296) * 256 + ((xor(acc, c)) // 4294967296) * 435) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT))), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)), x -> (x + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 30)), x -> (((x) % 4294967296) * 484763065 + ((((x) % 4294967296) * 3210233709 + ((x) // 4294967296) * 484763065) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 27)), x -> (((x) % 4294967296) * 321982955 + ((((x) % 4294967296) * 2496678331 + ((x) // 4294967296) * 321982955) % 4294967296) * 4294967296) % CAST('18446744073709551616' AS HUGEINT)), x -> xor(x, x >> 31)) AS ths
        | FROM documents),
        |sims AS (
        | SELECT doc_id,
        |  list_sum(list_transform(generate_series(0, 63), j ->
        |    CASE WHEN 2 * len(list_filter(ths, t -> (t >> j) % 2 = 1)) > len(ths)
        |         THEN CAST(1 AS HUGEINT) << j ELSE CAST(0 AS HUGEINT) END)) AS u
        | FROM th),
        |sg AS (
        | SELECT doc_id,
        |  CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |       THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END AS BIGINT) AS sim
        | FROM sims)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        | CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
        |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,
    // m2: the deterministic stub decode is a 31x byte fold mod 2^64 —
    // replayable in HUGEINT (31*(2^64) fits without splitting)
    "m2_feature_extract" ->
      """WITH h AS (
        | SELECT doc_id, octet_length(encode(text)) AS byte_len,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u
        | FROM documents)
        |SELECT doc_id,
        | CAST(byte_len AS INTEGER) AS byte_len,
        | CAST(64 + u % 1024 AS INTEGER) AS width,
        | CAST(64 + (u // 131072) % 1024 AS INTEGER) AS height,
        | CAST(1 + (u // 8589934592) % 16 AS INTEGER) AS n_frames,
        | abs(CAST((CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
        |        THEN u - CAST('18446744073709551616' AS HUGEINT) ELSE u END) AS BIGINT) % 1000000)
        |   / 1000000.0 AS feat_norm
        |FROM h ORDER BY doc_id""".stripMargin,
    // m3: frame stride/count from the same fold; frame_hash replays
    // java.util.Arrays.hashCode (31x fold mod 2^32, signed)
    "m3_frame_sample" ->
      """WITH h AS (
        | SELECT doc_id,
        |  list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |    (acc, c) -> (31 * acc + c) % CAST('18446744073709551616' AS HUGEINT)) AS u,
        |  list_reduce(list_prepend(CAST(1 AS BIGINT),
        |    list_transform(regexp_split_to_array(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, c) -> (31 * acc + c) % 4294967296) AS ju
        | FROM documents),
        |s AS (
        | SELECT doc_id,
        |  CAST(1 + (u // 8589934592) % 16 AS INTEGER) AS n_frames,
        |  CASE WHEN ju >= 2147483648 THEN ju - 4294967296 ELSE ju END AS jhash,
        |  CAST(((1 + (u // 8589934592) % 16) + 3) // 4 AS INTEGER) AS stride
        | FROM h)
        |SELECT doc_id,
        | CAST(frame // stride AS INTEGER) AS frame_idx,
        | CAST(frame * 33 AS BIGINT) AS ts_ms,
        | CAST(jhash * 31 + frame AS BIGINT) AS frame_hash
        |FROM (SELECT doc_id, stride, jhash, unnest(generate_series(0, n_frames - 1, stride)) AS frame FROM s)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // d7: 8-gram string-shingle overlap vs the src0 benchmark set
    "d7_contamination" ->
      """WITH t AS (SELECT doc_id, source, regexp_split_to_array(text, '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, source, list_distinct(list_transform(generate_series(1, len(toks) - 7),
        |   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' ||
        |        toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6] || ' ' || toks[i+7])) AS sh
        | FROM t WHERE len(toks) >= 8),
        |bench AS (SELECT DISTINCT unnest(sh) AS s FROM g WHERE source = 'src0'),
        |corpus AS (SELECT doc_id, unnest(sh) AS s FROM g WHERE source <> 'src0')
        |SELECT c.doc_id, count(*) AS shared_shingles, count(*) >= 3 AS contaminated
        |FROM corpus c JOIN bench USING (s)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
  )
}
