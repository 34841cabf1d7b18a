package graft.operators.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * All single-scan column expressions (no UDFs, no shuffles except the
  * final aggregates) — at 100 TB these run at parquet-scan speed.
  */
object TextOps {

  /** Whitespace tokenization; empties dropped (multi-space/trailing safe). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Sliding word n-gram shingles (distinct), the MinHash/Jaccard unit.
    * (Guarded: Spark `sequence(1, 0)` would count *down*, so short docs get
    * an explicit empty array.)
    */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Per-doc token stats. */
  def tokenStats(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(
      col("doc_id"), col("lang"),
      tokens(col("text")).as("toks"),
      length(col("text")).as("len_chars"))
      .select(
        col("doc_id"), col("lang"), col("len_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("sum_token_len"))
      .orderBy(col("doc_id"))
  }

  /** BPE-style pre-tokenizer (simplified GPT-2 splitter, engine-portable
    * alphabet): a token is an optionally space-prefixed letter run, digit
    * run, or punctuation run. Counts the sub-word boundary units a BPE
    * tokenizer would start from — the standard "token budget" estimate for
    * training-data accounting.
    */
  val bpePattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Per-doc token-budget view: whitespace words vs BPE-ish units. */
  def bpeTokens(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .withColumn("bpe_per_word",
        col("n_bpe_tokens").cast("double") / col("n_ws_tokens"))
      .orderBy(col("doc_id"))

  /** Quality-score features: ratios of identical integer counts, so the
    * doubles are bit-identical on any engine computing the same division.
    */
  def qualityScores(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
    docs.select(col("doc_id"), tokens(col("text")).as("toks"), length(col("text")).as("len"))
      .select(
        col("doc_id"), col("len"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), t => t.isin(stopwords: _*))).as("n_stopwords"),
        size(filter(col("toks"), t => length(t) <= 2)).as("n_short"))
      .select(
        col("doc_id"), col("len"), col("n_tokens"), col("n_stopwords"),
        (col("n_stopwords").cast("double") / col("n_tokens")).as("stopword_ratio"),
        (col("n_short").cast("double") / col("n_tokens")).as("short_ratio"),
        (col("len").cast("double") / col("n_tokens")).as("avg_token_span"))
      .withColumn("quality",
        col("stopword_ratio") * 2.0 - col("short_ratio") + col("avg_token_span") / 10.0)
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: English-stopword density buckets (the real
    * signal at scale is an n-gram model; the operator shape — per-doc score
    * + threshold classification — is identical).
    */
  def langId(spark: SparkSession, d: String): DataFrame = {
    val en = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang").as("lang_label"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang_label"),
        (size(filter(col("toks"), t => t.isin(en: _*))).cast("double") / size(col("toks")))
          .as("en_score"))
      .withColumn("lang_pred",
        when(col("en_score") >= 0.10, "en")
          .when(col("en_score") >= 0.04, "maybe-en")
          .otherwise("other"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text
    * (content-defined identity for exact dedup); plus a 64-bit engine-side
    * fingerprint (xxhash64) for cheap joins at scale.
    */
  def fingerprints(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        md5(normalized(col("text"))).as("fp_md5"),
        xxhash64(normalized(col("text"))).as("fp64"))
      .orderBy(col("doc_id"))

  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))
}
