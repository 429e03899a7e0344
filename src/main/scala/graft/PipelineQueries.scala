package graft

import graft.ops.Chunking
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-preparation queries: chunking, redaction, stratified sampling. */
object PipelineQueries {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 64-token chunks with 8-token overlap (training context packing).
    "q18_chunk" -> ((s, dir) =>
      Chunking.chunk(Tables(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 64, overlap = 8)),

    // PII redaction (fingerprint of the redacted text keeps rows small).
    "q19_redact" -> ((s, dir) =>
      Tables(s, dir, "documents").select(col("doc_id"),
        md5(Chunking.redact(col("text")).cast("binary")).as("redacted_hash"))),

    // CCNet-style repeated-passage removal: 8-token passages occurring in
    // more than 2 documents are boilerplate; documents reassemble from the
    // surviving passages.
    "dedup_passage_boilerplate" -> ((s, dir) =>
      Chunking.removeRepeatedPassages(Tables(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 8, maxDocFreq = 2)),

    // 5 docs per source stratum, md5-ordered (deterministic pseudo-random).
    "q20_stratified" -> ((s, dir) =>
      Chunking.stratifiedSample(Tables(s, dir, "documents"),
        "source", "doc_id", perGroup = 5)
        .select("doc_id", "source", "lang")),

    // Pretraining-mix temperature sampling (alpha=0.5): small sources keep
    // a larger fraction than big ones; md5-cutoff realization so the kept
    // set is exactly reproducible cross-engine.
    "mix_temperature" -> ((s, dir) =>
      Chunking.temperatureMix(Tables(s, dir, "documents"),
        "source", "doc_id", keepFraction = 0.3)
        .groupBy("source").agg(count(lit(1)).as("n_kept"))),

    // Token-budget draw: maximal md5-ordered prefix whose running token
    // total fits the budget (two-level cumsum — no global sort, no
    // single-partition window; whole buckets past the budget pruned
    // before their window runs).
    "mix_token_budget" -> ((s, dir) =>
      Chunking.tokenBudgetSample(Tables(s, dir, "documents"),
        "doc_id", "text", budget = 20000L)),

    // DSIR importance weights against the 'en' target domain: hashed-
    // unigram log-likelihood ratio per document (bounded bucket tables as
    // plan literals, zero-shuffle scoring fold). is_target as int —
    // cross-engine boolean hashing is not guaranteed stable.
    "mix_dsir_weights" -> ((s, dir) =>
      Chunking.dsirWeights(Tables(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", nBuckets = 1024)
        .withColumn("is_target", col("is_target").cast("int"))),

    // the resampling cut of the same weights: top-100 most-target-like
    // documents (weight desc, id tiebreak) — TakeOrdered, no global sort
    "mix_dsir_resample" -> ((s, dir) =>
      Chunking.dsirWeights(Tables(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", nBuckets = 1024)
        .orderBy(col("log_weight_r").desc, col("doc_id").asc)
        .limit(100)
        .select("doc_id", "log_weight_r")),

    // Weight-proportional draw without replacement (A-ES u^(1/w) keys,
    // weight = document length): the quality/length-weighted corpus
    // subset every mix recipe needs; md5-uniform keys so the selection
    // is exactly reproducible cross-engine. Output is the selected rows
    // themselves — exact integers, keys never leave the plan.
    "mix_weighted_sample" -> ((s, dir) =>
      Chunking.weightedSample(Tables(s, dir, "documents"),
        "doc_id", "n_chars", k = 100)
        .select("doc_id", "n_chars", "source")),

    // GPT-style concat-and-split training-sequence layout: 512-token
    // sequences over 8 independent shards (per-shard prefix sum).
    "pack_sequences" -> ((s, dir) =>
      Chunking.packSequences(Tables(s, dir, "documents"), "doc_id", "text",
        seqLen = 512, nShards = 8)),

    // The materialized sequences themselves (the write-side twin of
    // pack_sequences): one row per 512-token training sequence.
    "pack_sequence_rows" -> ((s, dir) =>
      Chunking.packedSequenceRows(Tables(s, dir, "documents"), "doc_id",
        "text", seqLen = 512, nShards = 8)),

    // Deterministic 98/1/1 train/val/test assignment (md5-of-id buckets —
    // stable under reruns, engines, and corpus growth; a doc can never
    // drift across the eval boundary), reported per source: one row-local
    // projection + one partial-aggregated count
    "split_assign" -> ((s, dir) =>
      Chunking.hashSplit(Tables(s, dir, "documents"), "doc_id",
        Seq(("train", 98), ("val", 1), ("test", 1)))
        .groupBy("split", "source").agg(count(lit(1)).as("n_docs"))),

    // Corpus profiling dashboard: per-source composition stats in ONE
    // partial-aggregated pass (counts, char volume, language spread, mean
    // length, en share — all exact ints + single final divisions).
    "corpus_stats" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("__t", graft.ops.TextAnalysis.wsTokenCount(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          (sum(col("__t").cast("long")).cast("double") / count(lit(1)))
            .as("mean_tokens"),
          (sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("double")
            / count(lit(1))).as("en_share"))),
  )

  /** Shared CTE prefix of the two mix_dsir_* oracles (the KmeansAssignSql
    * pattern): md5-mod-1024 hashed-unigram buckets, add-1 smoothed
    * target/source distributions, per-document ord-sorted fold of the
    * per-token log ratios into `folds(doc_id, s, n)`. */
  private val DsirFoldsSql: String =
    """WITH w AS (
      |  SELECT doc_id, lang,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents
      |), wne AS (
      |  SELECT doc_id, lang, i AS ord,
      |    ('0x' || substr(md5(toks[i]), 1, 8))::bigint % 1024 AS b
      |  FROM w, unnest(range(1, len(toks) + 1)) AS u(i)
      |  WHERE toks[i] != ''
      |), cnt AS (
      |  SELECT b, count(*) AS ns,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt
      |  FROM wne GROUP BY b
      |), tot AS (
      |  SELECT cast(sum(ns) as bigint) AS ts, cast(sum(nt) as bigint) AS tt
      |  FROM cnt
      |), term AS (
      |  SELECT wne.doc_id, wne.ord,
      |    ln(cast(c.nt + 1 as double) / (tot.tt + 1024))
      |      - ln(cast(c.ns + 1 as double) / (tot.ts + 1024)) AS d
      |  FROM wne JOIN cnt c USING (b) CROSS JOIN tot
      |), folds AS (
      |  SELECT doc_id, list_sum(list(d ORDER BY ord)) AS s,
      |    cast(count(*) as bigint) AS n
      |  FROM term GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Chunking.hashSplit's bucket function verbatim: first 8 md5 hex chars
    // of the stringified id, mod 100, cumulative-range CASE
    // weightedSample's key function verbatim: md5-uniform u over 2^32,
    // rank by ln(u)/w desc (the pow(u,1/w)-monotone form whose only
    // transcendental is the MathLn-pinned ln) with id tiebreak —
    // selection-only output, so the compare is over exact integers
    "mix_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars, source,
        |    ln((('0x' || substr(md5(cast(doc_id AS varchar)), 1, 8))::bigint + 1)
        |        / cast(4294967296 AS double))
        |      / cast(n_chars AS double) AS k
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars, source FROM keyed
        |ORDER BY k DESC, doc_id ASC LIMIT 100""".stripMargin,

    "split_assign" ->
      """WITH b AS (
        |  SELECT source,
        |    ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::bigint
        |      % 100 AS bk
        |  FROM documents
        |)
        |SELECT CASE WHEN bk < 98 THEN 'train'
        |            WHEN bk < 99 THEN 'val'
        |            ELSE 'test' END AS split,
        |  source, count(*) AS n_docs
        |FROM b GROUP BY 1, 2""".stripMargin,

    "q18_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    cast((i - 1) // 56 as int) AS chunk_idx,
        |    array_to_string(w[i:i+63], ' ') AS chunk_text
        |  FROM t, unnest(range(1, greatest(len(w), 1) + 1, 56)) AS u(i))
        |SELECT doc_id, chunk_idx, chunk_text,
        |  len(string_split(chunk_text, ' ')) AS n_chunk_tokens
        |FROM c WHERE chunk_text != ''""".stripMargin,

    "q19_redact" ->
      """SELECT doc_id,
        |  md5(regexp_replace(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9][0-9 ()+.-]{6,}[0-9]', '[NUM]', 'g')) AS redacted_hash
        |FROM documents""".stripMargin,

    "dedup_passage_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    cast((i - 1) // 8 as int) AS chunk_idx,
        |    array_to_string(w[i:i+7], ' ') AS chunk_text
        |  FROM t, unnest(range(1, greatest(len(w), 1) + 1, 8)) AS u(i)),
        |cne AS (SELECT * FROM c WHERE chunk_text != ''),
        |freq AS (
        |  SELECT chunk_text, count(DISTINCT doc_id) AS df
        |  FROM cne GROUP BY 1),
        |kept AS (
        |  SELECT cne.* FROM cne JOIN freq USING (chunk_text)
        |  WHERE freq.df <= 2)
        |SELECT t.doc_id,
        |  coalesce(string_agg(kept.chunk_text, ' ' ORDER BY kept.chunk_idx), '')
        |    AS clean_text,
        |  cast(count(kept.chunk_text) as bigint) AS n_kept
        |FROM t LEFT JOIN kept ON t.doc_id = kept.doc_id
        |GROUP BY t.doc_id""".stripMargin,

    "q20_stratified" ->
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(cast(doc_id as varchar)) ASC, doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= 5""".stripMargin,

    // Mirrors Chunking.temperatureMix exactly: integer-scaled sqrt weights
    // (FP sums are accumulation-order-dependent; integer sums are not),
    // one fixed-shape double expression for the cutoff, md5-hex-prefix
    // keep rule. printf('%04x') == Spark lower(lpad(hex)).
    "mix_temperature" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1048576.0) AS BIGINT) AS w
        |  FROM documents GROUP BY source),
        |t AS (SELECT sum(n) AS ntot, sum(w) AS wtot FROM c),
        |cut AS (
        |  SELECT source,
        |    least(CAST(65536 AS BIGINT),
        |      CAST(floor((((65536.0 * 0.3) * CAST(ntot AS DOUBLE)) * CAST(w AS DOUBLE))
        |        / (CAST(wtot AS DOUBLE) * CAST(n AS DOUBLE))) AS BIGINT)) AS cutv
        |  FROM c, t)
        |SELECT d.source, count(*) AS n_kept
        |FROM documents d JOIN cut ON d.source = cut.source
        |WHERE cutv = 65536
        |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < printf('%04x', cutv)
        |GROUP BY d.source""".stripMargin,

    // running-total prefix in md5 order — exact integer cumsum, and the
    // oracle's single global window IS the naive formulation the Spark
    // side deliberately avoids (two-level bucketed cumsum, plan-asserted
    // free of SinglePartition exchanges)
    "mix_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    md5(cast(doc_id as varchar)) AS h,
        |    cast(len(regexp_split_to_array(trim(text), '\s+')) as bigint) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    cast(sum(n_tokens) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) as bigint)
        |      AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 20000""".stripMargin,

    // DSIR re-derivation: same md5-mod feature hash, add-1 smoothed
    // bucket distributions, per-document ord-sorted list_sum fold of the
    // per-token log ratios (the text_perplexity fold discipline),
    // round(,6) 1-ulp-ln guard. Source bucket counts cover every token a
    // document can contain (source = corpus), so the JOIN is inner.
    "mix_dsir_weights" ->
      s"""$DsirFoldsSql
        |SELECT d.doc_id, coalesce(f.n, 0) AS n_tokens,
        |  round(coalesce(f.s, 0.0), 6) AS log_weight_r,
        |  cast(d.lang = 'en' as int) AS is_target
        |FROM documents d LEFT JOIN folds f USING (doc_id)""".stripMargin,

    "mix_dsir_resample" ->
      s"""$DsirFoldsSql
        |, scored AS (
        |  SELECT d.doc_id, round(coalesce(f.s, 0.0), 6) AS log_weight_r
        |  FROM documents d LEFT JOIN folds f USING (doc_id))
        |SELECT doc_id, log_weight_r FROM scored
        |ORDER BY log_weight_r DESC, doc_id ASC LIMIT 100""".stripMargin,

    // pure exact-integer prefix-sum arithmetic — engine-reproducible
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, cast(doc_id % 8 as int) AS shard,
        |    cast(len(string_split(
        |      regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) as bigint)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tokens,
        |    cast(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint)
        |      AS tok_before
        |  FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  tok_before // 512 AS start_seq,
        |  tok_before % 512 AS start_off,
        |  (tok_before + n_tokens - 1) // 512 AS end_seq
        |FROM c""".stripMargin,

    // same prefix-sum layout; reassembly ordered by the in-sequence offset
    "pack_sequence_rows" ->
      """WITH w AS (
        |  SELECT doc_id, cast(doc_id % 8 as int) AS shard,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
        |  FROM documents
        |), t AS (
        |  SELECT doc_id, shard, cast(len(toks) as bigint) AS n_tokens, toks FROM w
        |), c AS (
        |  SELECT doc_id, shard, toks,
        |    cast(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint)
        |      AS tok_before
        |  FROM t
        |), tk AS (
        |  SELECT shard, tok_before + i - 1 AS gidx, toks[i] AS tok
        |  FROM c, unnest(range(1, len(toks) + 1)) AS u(i))
        |SELECT shard, gidx // 512 AS seq_id,
        |  string_agg(tok, ' ' ORDER BY gidx) AS seq_text,
        |  cast(count(*) as bigint) AS n_tokens
        |FROM tk GROUP BY shard, gidx // 512""".stripMargin,

    "corpus_stats" ->
      """SELECT source,
        |  count(*) AS n_docs,
        |  cast(sum(n_chars) as bigint) AS total_chars,
        |  cast(count(DISTINCT lang) as bigint) AS n_langs,
        |  cast(cast(sum(len(regexp_split_to_array(trim(text), '\s+'))) as bigint)
        |    as double) / count(*) AS mean_tokens,
        |  cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) as double)
        |    / count(*) AS en_share
        |FROM documents GROUP BY source""".stripMargin,
  )
}
