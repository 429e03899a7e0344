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
}
