package graft.operators.text

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding TOKENIZER INDUCTION — the missing half of the
  * brief's "token counting (whitespace + a BPE-ish regex)" lane: txt05
  * counts with a fixed BPE-shaped regex; this TRAINS the merge table a
  * real tokenizer ships (Sennrich et al. 2016 — the algorithm behind
  * GPT-2/Llama vocabularies; the reference has no analogue).
  *
  * The scale split is the one every production trainer uses:
  *
  *  1. **Corpus pass (distributed, the only big-data stage):** word
  *     counts — one map-side-combined `groupBy(word)`. At 100 TB this is
  *     the whole cluster's work, and it happens ONCE; everything after
  *     operates on the word-frequency TABLE, which is vocabulary-sized
  *     (millions of rows, not billions of tokens).
  *  2. **Merge loop (driver, bounded):** classic BPE over the collected
  *     word-count table — symbolize each word as chars + `</w>`, then
  *     repeatedly merge the most frequent adjacent symbol pair. Ties
  *     break lexicographically on (left, right): fully deterministic,
  *     engine-portable.
  *  3. **Encode (distributed again):** apply the learned merge ranks to
  *     any corpus via `mapPartitions` with the (tiny, broadcast) merge
  *     table — the greedy lowest-rank-first merge every BPE runtime
  *     implements.
  *
  * Driver-gate split (the dd03 device): the ITERATIVE loop is not
  * SQL-derivable, so the driver row (txt16) checks stage 1 + the first
  * iteration's input — the initial adjacent-pair counts over the char
  * symbolization, weighted by word count — which DuckDB re-derives
  * exactly; the loop and the encoder are pinned by hand-computed
  * sbt specs (BpeSpec: the textbook low/lower/newest/widest corpus).
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Distributed word counts — the single corpus-scale pass. */
  def wordCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Adjacent-pair counts over the INITIAL char symbolization (chars +
    * `</w>`), weighted by word frequency — iteration 0's input, exactly
    * what the first merge argmaxes over. SQL-derivable (txt16's oracle
    * re-derives it), integer-only.
    */
  def initialPairCounts(documents: DataFrame): DataFrame = {
    val wc = wordCounts(documents)
    val syms = wc.select(col("word"), col("n"),
      concat(
        transform(sequence(lit(0), length(col("word")) - 1),
          i => col("word").substr(i + 1, lit(1))),
        array(lit(EndOfWord))).as("s"))
    syms
      .select(col("n"),
        explode(transform(sequence(lit(0), size(col("s")) - 2),
          i => struct(element_at(col("s"), i + 1).as("left"),
            element_at(col("s"), i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left_sym"), col("p.right").as("right_sym"))
      .agg(sum(col("n")).as("pair_count"))
  }

  /** txt16's gated shape: the top-`k` initial pairs by weighted count
    * (ties by (left, right)) — the distributed stage driver-verified.
    */
  def topInitialPairs(spark: SparkSession, d: String, k: Int = 20): DataFrame =
    initialPairCounts(Tables.documents(spark, d))
      .orderBy(col("pair_count").desc, col("left_sym"), col("right_sym"))
      .limit(k)

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Classic BPE merge loop over a word-frequency table (driver-side,
    * vocabulary-sized input — step 2). Stops early when no pair occurs
    * twice. Deterministic: argmax by (count, then lexicographic
    * (left, right) ascending).
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Vector[(Vector[String], Long)] = wordCounts.toVector
      .map { case (w, n) => (w.map(_.toString).toVector :+ EndOfWord, n) }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (s, n) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= 2 =>
          merges += Merge(rank, l, r, c)
          val merged = l + r
          words = words.map { case (s, n) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
                out += merged; i += 2
              } else { out += s(i); i += 1 }
            }
            (out.result(), n)
          }
          rank += 1
        case _ => continue = false
      }
    }
    merges.result()
  }

  /** [[train]] fed by the distributed corpus pass — collect is of the
    * word-frequency TABLE, floored IN the distributed pass: words rarer
    * than `minCount` are dropped before anything reaches the driver.
    *
    * Driver-memory bound: O(|{words: n ≥ minCount}|) rows. At web scale
    * the DISTINCT-word tail (URLs, typos, hashes) is itself corpus-sized
    * — a raw collect would be the 100 TB anti-pattern — while the
    * ≥minCount head follows Zipf's law and is vocabulary-sized for any
    * minCount ≥ 2. The floor is standard in production BPE trainers
    * (subword-nmt's `--min-frequency`, SentencePiece's pruning) and
    * biases only pairs whose count comes from sub-floor words — by
    * definition under minCount occurrences per dropped word — so
    * frequent merges (the ones a tokenizer keeps) are unaffected;
    * BpeSpec pins that the textbook merge sequence is floor-invariant.
    * `minCount = 1` keeps the exact semantics for bounded corpora.
    */
  def trainOn(documents: DataFrame, numMerges: Int,
      minCount: Long = 1L): Seq[Merge] =
    train(wordCounts(documents).filter(col("n") >= minCount).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq, numMerges)

  val encodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_bpe_tokens", IntegerType, nullable = false)))

  /** Greedy BPE encode of one word against a rank table — always merge
    * the LOWEST-rank applicable pair first (the GPT-2 runtime rule,
    * which reproduces training-time segmentation).
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var s: Vector[String] = word.map(_.toString).toVector :+ EndOfWord
    var continue = true
    while (continue && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < s.length - 1) {
        ranks.get((s(i), s(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else s = (s.take(bestAt) :+ (s(bestAt) + s(bestAt + 1))) ++ s.drop(bestAt + 2)
    }
    s
  }

  /** Distributed encode (step 3): token counts per document under the
    * learned merges — narrow `mapPartitions`, merge table broadcast by
    * closure (merge tables are KBs), no shuffle.
    */
  def encodeCounts(documents: DataFrame, merges: Seq[Merge]): DataFrame = {
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val enc = RowEncoder.encoderFor(encodedSchema)
    documents.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val words = r.getSeq[String](1)
          var total = 0
          words.foreach(w => total += encodeWord(w, ranks).length)
          Row(id, words.length, total)
        }
      }(enc)
  }
}
