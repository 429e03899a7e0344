package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Corpus-preparation operators: fixed-size token chunking with overlap
 * (context-window packing for training data), PII-pattern redaction, and
 * per-group stratified sampling. All row-local or single-window —
 * shuffle-minimal at any scale.
 */
object Chunking {

  /**
   * Split each document into token chunks of `chunkTokens` with `overlap`
   * tokens carried between consecutive chunks. Emits
   * (id, chunk_idx, chunk_text, n_chunk_tokens). Pure array expressions:
   * tokenize once, slice per chunk start, posexplode.
   */
  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    // tokenize in a separate projection so the lambda below references a
    // BOUND column — an inline subexpression inside transform() is
    // re-evaluated per chunk (normalize+split × chunk count per doc)
    val toks = df.select(col(idCol), graft.functions.hashes.word_tokens(col(textCol)).as("__w"))
    val w = col("__w")
    val starts = sequence(lit(0), greatest(size(w) - 1, lit(0)), lit(step))
    val chunks = transform(starts, s => concat_ws(" ", slice(w, s + 1, lit(chunkTokens))))
    toks.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_chunk_tokens", size(split(col("chunk_text"), " ")))
      .filter(col("chunk_text") =!= "")
  }

  /**
   * Repeated-passage (boilerplate) removal — the CCNet/RefinedWeb-style
   * line-level dedup, expressed over fixed-size token chunks since the
   * corpus has no line structure: drop every non-overlapping `chunkTokens`
   * passage that occurs in more than `maxDocFreq` documents (headers,
   * footers, license blocks, templated spans), then reassemble each
   * document from its surviving passages in order. Emits
   * (id, clean_text, n_kept) — `n_kept` = 0 and empty text for a document
   * that was pure boilerplate.
   *
   * Scale shape: passage doc-frequency is a two-level aggregate keyed on
   * the fixed-width md5 digest of the chunk (distinct (digest, doc) then
   * count — never a window over the chunk text, and raw passage text is
   * never a shuffle key); reassembly sorts each document's own surviving
   * chunks (bounded by document length, not corpus size).
   */
  def removeRepeatedPassages(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, maxDocFreq: Long): DataFrame = {
    // cache: the chunk pipeline feeds both the frequency and the keep branch
    val digested = chunk(df, idCol, textCol, chunkTokens)
      .withColumn("__h", md5(col("chunk_text").cast("binary"))).cache()
    val freq = digested.select(col("__h"), col(idCol)).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
    val kept = digested.join(
      freq.filter(col("__df") <= maxDocFreq).select("__h"), Seq("__h"), "left_semi")
    val rebuilt = kept.groupBy(col(idCol)).agg(
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        s => s.getField("chunk_text"))).as("clean_text"),
      count(lit(1)).as("n_kept"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /**
   * Training-sequence packing (the GPT-style concat-and-split layout):
   * documents are laid out end-to-end in id order within each of `nShards`
   * independent shards, and the resulting token stream is cut into
   * fixed-`seqLen` training sequences. Emits, per document, its span in
   * the packed layout: (shard, n_tokens, start_seq, start_off, end_seq) —
   * enough for a writer to materialize sequence files, and for an auditor
   * to locate any document's tokens.
   *
   * Scale shape: the layout is one prefix sum per shard — a window over
   * the shard key ordered by id. Shards are INDEPENDENT streams (as in
   * real pretraining data layouts), so parallelism = `nShards`; pick
   * nShards ≥ cluster cores at scale and no single sort dominates. All
   * arithmetic is exact integers — engine-reproducible.
   */
  def packSequences(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0)
    val t = df.select(col(idCol),
      pmod(col(idCol), lit(nShards)).cast("int").as("shard"),
      size(graft.functions.hashes.word_tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // token count before this doc in its shard; values < 2^52 so the
    // floor(double) divisions below are exact integer arithmetic
    val before = coalesce(sum(col("n_tokens")).over(w), lit(0L))
    t.withColumn("__before", before)
      .select(col(idCol), col("shard"), col("n_tokens"),
        floor(col("__before") / seqLen).cast("long").as("start_seq"),
        pmod(col("__before"), lit(seqLen.toLong)).as("start_off"),
        floor((col("__before") + col("n_tokens") - 1) / seqLen).cast("long").as("end_seq"))
  }

  /**
   * Materialize the [[packSequences]] layout: the actual fixed-`seqLen`
   * training sequences, one row per (shard, seq_id) with the tokens
   * joined in stream order. The reassembly group is bounded by `seqLen`
   * tokens — NOT by document or corpus size — so the collect_list per
   * sequence is constant-memory at any scale; upstream is the same
   * per-shard prefix sum plus one explode of the token stream.
   */
  def packedSequenceRows(
      df: DataFrame, idCol: String, textCol: String,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0)
    val spans = packSequences(df, idCol, textCol, seqLen, nShards)
      .select(col(idCol), col("shard"),
        (col("start_seq") * seqLen + col("start_off")).as("__before"))
    val toks = df.select(col(idCol),
      posexplode(graft.functions.hashes.word_tokens(col(textCol)))
        .as(Seq("__pos", "tok")))
    toks.join(spans, Seq(idCol))
      .select(col("shard"),
        floor((col("__before") + col("__pos")) / seqLen).cast("long").as("seq_id"),
        pmod(col("__before") + col("__pos"), lit(seqLen.toLong)).as("__off"),
        col("tok"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__off"), col("tok")))),
          s => s.getField("tok"))).as("seq_text"),
        count(lit(1)).as("n_tokens"))
  }

  /** PII-pattern redaction: emails and long digit runs replaced with
    * placeholder tags. Patterns are RE2/Java-portable (no lookaround). */
  def redact(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    regexp_replace(email, "[0-9][0-9 ()+.-]{6,}[0-9]", "[NUM]")
  }

  /**
   * Deterministic stratified sample: `perGroup` rows per `groupCol`
   * stratum, chosen by md5-order of the id (pseudo-random but
   * reproducible and engine-portable). One window shuffle on the stratum.
   */
  def stratifiedSample(
      df: DataFrame, groupCol: String, idCol: String, perGroup: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string").cast("binary")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perGroup).drop("__rn")
  }

  /**
   * Temperature-based source mixing — the `n_s^α` reweighting every
   * pretraining data mix applies (α<1 upweights small sources so the model
   * sees more than their natural share). Per-source keep probability
   * `p_s = min(1, keepFraction · N · w_s / (W · n_s))` with `w_s = n_s^α`,
   * realized deterministically: a row survives iff the first 4 hex chars
   * of `md5(id)` sort below the source's cutoff `⌊p_s · 65536⌋`.
   *
   * Engine-portable by construction (full DuckDB oracle): α is fixed at
   * 0.5, so weights need only `sqrt` — correctly rounded IEEE, unlike
   * `pow` — and weights are scaled to INTEGERS (`⌊√n · 2^20⌋`) before
   * summing, because a floating-point SUM is accumulation-order-dependent
   * and neither engine guarantees an order. The remaining double math is a
   * single fixed-shape expression (deterministic rounding in any IEEE
   * engine); `W · n` is multiplied in doubles because the long product
   * overflows at corpus scale.
   *
   * Plan shape: one count-by-source partial agg (tiny frame → broadcast
   * back), then one scan with a per-row md5 — no window, no global sort,
   * no driver collect; the same plan at 100 TB.
   */
  /**
   * Deterministic token-budget sampling — the "take ~N tokens from this
   * source" primitive of pretraining mixes: keep exactly the docs whose
   * RUNNING whitespace-token total, accumulated in md5(id) order (the
   * same engine-portable pseudo-random order as [[stratifiedSample]] /
   * [[temperatureMix]]), stays within `budget`. Emits (id, n_tokens,
   * cum_tokens) for the kept prefix.
   *
   * Plan shape at 100 TB: a running total over a GLOBAL order is the
   * textbook single-partition window (`Exchange SinglePartition` — one
   * task sorts the corpus), so the cumulative sum is computed in two
   * levels instead. Docs hash into 256 buckets by their md5's leading
   * byte — bucket order is a PREFIX of full md5 order — so per-bucket
   * token totals (≤ 256 rows, one partial agg) prefix-sum on the driver
   * into per-bucket starting offsets; each bucket then runs its own
   * window PARTITIONED BY bucket (parallel, bounded by bucket size,
   * plan-asserted: no SinglePartition exchange), seeded by its offset.
   * Buckets whose offset already exceeds the budget are filtered out
   * BEFORE the window — at scale, (1 − budget/corpus) of the data never
   * reaches the sort, and the pre-window filter on the broadcast offset
   * column prunes it at the scan side of the shuffle.
   */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, textCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    val t = df.select(col(idCol),
      md5(col(idCol).cast("string").cast("binary")).as("__h"),
      graft.ops.TextAnalysis.wsTokenCount(col(textCol)).cast("long")
        .as("n_tokens"))
      .withColumn("__b", substring(col("__h"), 1, 2))
    // ≤ 256 rows to the driver — the bounded-global-context pattern
    val perBucket = t.groupBy("__b").agg(sum(col("n_tokens")).as("__bt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val offsets = perBucket.scanLeft(("", 0L)) {
      case ((_, cum), (b, bt)) => (b, cum + bt)
    }.sliding(2).collect { case Array((_, prev), (b, _)) => (b, prev) }.toSeq
    val odf = offsets.toDF("__b", "__off")
    val w = Window.partitionBy(col("__b")).orderBy(col("__h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.join(broadcast(odf), Seq("__b"))
      .filter(col("__off") < budget) // whole-bucket prune, BEFORE the window
      .withColumn("cum_tokens", col("__off") + sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  def temperatureMix(
      df: DataFrame, sourceCol: String, idCol: String,
      keepFraction: Double): DataFrame = {
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w",
        floor(sqrt(col("__n").cast("double")) * lit(1048576.0)).cast("long"))
    val totals = counts.agg(sum(col("__n")).as("__N"), sum(col("__w")).as("__W"))
    // aliases: totals derives from counts, so unqualified refs after the
    // cross join would be ambiguous (shared lineage)
    val cuts = counts.alias("c").crossJoin(broadcast(totals.alias("t")))
      .withColumn("__cut", least(lit(65536L),
        floor((((lit(65536.0) * lit(keepFraction)) * col("t.__N").cast("double"))
          * col("c.__w").cast("double"))
          / (col("t.__W").cast("double") * col("c.__n").cast("double"))).cast("long")))
      .select(col(sourceCol), col("__cut"))
    df.join(broadcast(cuts), Seq(sourceCol))
      .filter(col("__cut") === 65536L
        || substring(md5(col(idCol).cast("string").cast("binary")), 1, 4)
          < lower(lpad(hex(col("__cut")), 4, "0")))
      .drop("__cut")
  }

  /**
   * DSIR-style importance weights for targeted data selection (Xie et
   * al. 2023, "Data Selection for Language Models via Importance
   * Resampling"): score every document by how much more likely its
   * hashed-unigram bag is under the TARGET domain's token distribution
   * than under the full corpus's —
   * `log w(d) = Σ_tokens [ln p_target(bucket) − ln p_source(bucket)]`
   * with add-one smoothing over `nBuckets` feature-hash buckets
   * (`p(b) = (count_b + 1)/(total + nBuckets)`). High weight = looks
   * like the target domain; resample the source by weight to shift the
   * mixture. The hash is the first 8 hex chars of md5 mod `nBuckets` —
   * cross-engine reproducible, so the whole pipeline (hashing, counts,
   * smoothing, per-document fold) carries a full SQL oracle.
   *
   * Scale shape: ONE distributed aggregate builds the two bucket tables
   * (≤ `nBuckets` rows collected — corpus-size-independent), embedded in
   * the plan as a per-bucket log-ratio array literal; then one
   * zero-shuffle row-local pass folds each document's token stream
   * through the array (sequential order — reproducible by a SQL engine
   * folding an ord-sorted list). Output log_weight_r = round(log w, 6):
   * the documented 1-ulp-ln guard (each delta term transits libm).
   */
  def dsirWeights(
      df: DataFrame, idCol: String, textCol: String, targetFilter: Column,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, "nBuckets must be > 0")
    def bucketOf(t: Column): Column =
      conv(substring(md5(t.cast("binary")), 1, 8), 16, 10)
        .cast("long") % nBuckets
    val counts = df
      .select(targetFilter.as("__tgt"),
        explode(graft.functions.hashes.word_tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy(bucketOf(col("__t")).as("__b"))
      .agg(count(lit(1)).as("ns"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("nt"))
      .collect().map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2)))
      .toMap
    val totS = counts.valuesIterator.map(_._1).sum
    val totT = counts.valuesIterator.map(_._2).sum
    // per-bucket log ratio, dense over all nBuckets slots (unseen buckets
    // carry the pure-smoothing delta; unreachable when source = corpus,
    // but dense keeps element_at total)
    val deltas: IndexedSeq[Double] = (0 until nBuckets).map { b =>
      val (ns, nt) = counts.getOrElse(b, (0L, 0L))
      Math.log((nt + 1).toDouble / (totT + nBuckets)) -
        Math.log((ns + 1).toDouble / (totS + nBuckets))
    }
    val deltaArr = array(deltas.map(lit): _*)
    val toks = col("__w")
    df.withColumn("__w", graft.functions.hashes.word_tokens(col(textCol)))
      .select(col(idCol),
        size(filter(toks, t => t =!= "")).cast("long").as("n_tokens"),
        round(aggregate(toks, lit(0.0), (acc, t) =>
          acc + when(t === "", lit(0.0))
            .otherwise(element_at(deltaArr, (bucketOf(t) + 1).cast("int")))),
          6).as("log_weight_r"),
        targetFilter.as("is_target"))
  }

  /**
   * Deterministic train/val/test assignment — the split every training
   * pipeline needs to be STABLE across reruns, engines, and data growth: a
   * document's split must depend only on its id, never on row order,
   * partitioning, or corpus size (a new dump must not reshuffle old docs
   * across the eval boundary — that's silent train-on-test contamination).
   *
   * A row lands in the bucket `md5(id) mod Σweights` and buckets map to
   * splits by cumulative weight ranges (`("train",98),("val",1),("test",1)`
   * → buckets 0-97, 98, 99). md5-of-id is the engine-portable pseudo-random
   * source used across this codebase ([[stratifiedSample]],
   * [[temperatureMix]]); the whole assignment is one row-local projection —
   * zero shuffle, zero driver state, the same plan at 100 TB.
   */
  def hashSplit(
      df: DataFrame, idCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be (name, positive weight) pairs")
    val total = splits.map(_._2).sum
    val bucket =
      conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
        16, 10).cast("long") % total
    val cum = splits.scanLeft(0)(_ + _._2).init
    val assign = splits.zip(cum).tail.foldLeft(
      when(bucket < splits.head._2 + cum.head, lit(splits.head._1))) {
      case (acc, ((name, w), lo)) => acc.when(bucket < lo + w, lit(name))
    }
    df.withColumn("split", assign)
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement (the A-ES /
   * Efraimidis–Spirakis exponential-jumps scheme, reduced to its one-pass
   * key form): each row draws a uniform `u` and is ranked by `u^(1/w)` —
   * realized as the monotone-equivalent `ln(u)/w` so the key needs only
   * `ln` (which [[graft.functions.MathLn]] pins bit-for-bit to the
   * oracle engine's libm) and one correctly-rounded division; `pow` has
   * no such cross-engine guarantee, and a 1-ulp key wobble at the k-th
   * boundary would flip the selection. The top `k` keys are EXACTLY a
   * weight-proportional draw without replacement. The uniform comes from
   * the codebase's engine-portable pseudo-random source — the first 8
   * md5 hex chars of the stringified id over 2^32 — so the selection is
   * reproducible across reruns, engines, and partitionings (same
   * contract as [[hashSplit]]). The uniform is shifted off zero —
   * `u = (hash + 1) / 2^32`, range (0, 1] — because a hash prefix of
   * 00000000 (p = 2^-32 per row) would otherwise feed `ln(0)`: Spark
   * yields -Infinity (sorts last, harmless) but the oracle engine
   * RAISES on ln(0), so the two sides must agree on a strictly
   * positive domain. u = 1 is safe on both (ln(1) = 0).
   *
   * Scale: one row-local projection plus a distributed bounded-heap top-k
   * (`TakeOrderedAndProject` — each partition keeps k rows, the driver
   * merges P·k). No shuffle, no sort of the full corpus. Rows with
   * non-positive weight are excluded (a zero-weight row must never be
   * drawn; guarding here beats a NaN-poisoned pow downstream).
   */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
      16, 10).cast("long") + lit(1L)).cast("double") / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("__key",
        graft.functions.vectors.math_ln(u) / col(weightCol).cast("double"))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(k)
      .drop("__key")
  }
}
