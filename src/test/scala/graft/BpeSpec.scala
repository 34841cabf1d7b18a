package graft

import graft.operators.text.Bpe
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer induction: the merge loop against the textbook corpus
  * (Sennrich et al. 2016's low/lower/newest/widest example), the
  * distributed↔driver seam (loop input == iteration-0 pair counts), and
  * the greedy encoder's training-parity property.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // the classic corpus: word -> frequency
  private val textbook = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("merge loop reproduces the textbook sequence") {
    val merges = Bpe.train(textbook, numMerges = 4)
    // hand-derivation with the (count desc, then lexicographic) tie rule:
    //   pair counts round 0: (e,s)=9 (newest+widest), (s,t)=9, (t,</w>)=9,
    //   (w,e)=8 ... tie among the 9s -> lexicographic: (e,s) first
    assert(merges(0).left == "e" && merges(0).right == "s" && merges(0).count == 9L)
    //   round 1: (es,t)=9 wins
    assert(merges(1).left == "es" && merges(1).right == "t" && merges(1).count == 9L)
    //   round 2: (est,</w>)=9 wins
    assert(merges(2).left == "est" && merges(2).right == "</w>" && merges(2).count == 9L)
    //   round 3: (l,o)=7 (low+lower)
    assert(merges(3).left == "l" && merges(3).right == "o" && merges(3).count == 7L)
  }

  test("the loop's round-0 argmax equals the distributed initial pair counts") {
    // expand the frequency table into an actual document corpus
    val docs = Seq((1L, textbook.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w) }.mkString(" "))).toDF("doc_id", "text")
    val pairs = Bpe.initialPairCounts(docs)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(pairs(("e", "s")) == 9L && pairs(("s", "t")) == 9L &&
      pairs(("t", Bpe.EndOfWord)) == 9L && pairs(("w", "e")) == 8L &&
      pairs(("l", "o")) == 7L)
    // the loop's first merge is the argmax of exactly this table under
    // the same (count desc, lexicographic) order — the seam theorem
    val m0 = Bpe.train(textbook, 1).head
    val best = pairs.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
    assert((m0.left, m0.right, m0.count) == (best._1._1, best._1._2, best._2))
  }

  test("minCount floor bounds the collect without changing the textbook merges") {
    // textbook corpus + a hapax tail (the web-scale distinct-word tail in
    // miniature: each junk word occurs ONCE and shares no frequent pairs)
    val noisy = Seq((1L, (textbook.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w) } ++ Seq("zq1x", "vk9j", "qzzv")).mkString(" ")))
      .toDF("doc_id", "text")
    val floored = Bpe.trainOn(noisy, numMerges = 4, minCount = 2L)
    val exact = Bpe.train(textbook, numMerges = 4)
    assert(floored.map(m => (m.rank, m.left, m.right, m.count)) ==
      exact.map(m => (m.rank, m.left, m.right, m.count)),
      "the ≥2 floor must reproduce the textbook merge sequence exactly")
    // and the floor is applied in the DISTRIBUTED pass: the collected
    // table excludes the hapax words entirely
    val collected = Bpe.wordCounts(noisy)
      .filter(org.apache.spark.sql.functions.col("n") >= 2L)
      .collect().map(_.getString(0)).toSet
    assert(collected == textbook.map(_._1).toSet)
  }

  test("greedy encode reproduces training segmentation on trained words") {
    val merges = Bpe.train(textbook, numMerges = 10)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // a fully-trained word collapses to one token (its whole surface +
    // </w> merged), an unseen word stays maximally split except for
    // merges that genuinely apply
    assert(Bpe.encodeWord("newest", ranks).mkString("|").contains("est</w>"))
    val unseen = Bpe.encodeWord("zq", ranks)
    assert(unseen == Vector("z", "q", Bpe.EndOfWord))
  }

  test("distributed encodeCounts agrees with per-word greedy encode") {
    val docs = Seq((1L, "newest widest low"), (2L, "lower zq"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainOn(
      Seq((10L, "newest widest low lower")).toDF("doc_id", "text"), 6)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val got = Bpe.encodeCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    def count(ws: String*): Int = ws.map(Bpe.encodeWord(_, ranks).length).sum
    assert(got(1L) == ((3, count("newest", "widest", "low"))))
    assert(got(2L) == ((2, count("lower", "zq"))))
  }
}
