package graft

import graft.plans.SketchCols
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native sketch expressions to the SQL-lambda formulations they
  * replaced: results must be bit-identical (same XXH64 primitives, same
  * fold order) so the dedup outputs are unchanged by the plan optimization.
  */
class SketchExprsSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local("4")
  import spark.implicits._

  private val numHashes = 64
  private val bands     = 16
  private val rows      = numHashes / bands

  test("minhash_band_buckets == SQL xxhash64 formulation, bit for bit") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("b c d", "c d e", "d e f", "x y z")),
      (3L, Seq("lone shingle here")),
      (4L, (1 to 100).map(i => s"sh $i tok")),
    ).toDF("doc_id", "sh")
      .withColumn("shh", transform(col("sh"), s => xxhash64(s)))

    val legacyMinhash = transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(col("shh"), h => xxhash64(h, i))))
    val legacyBuckets = transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64((0 until rows).map(r =>
        element_at(col("minhash"), b * rows + r + 1)) :+ b: _*))

    val got = docs
      .withColumn("minhash", legacyMinhash)
      .select(col("doc_id"),
        legacyBuckets.as("legacy"),
        SketchCols.minHashBandBuckets(col("shh"), numHashes, bands).as("native"))
      .collect()

    got.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"bucket mismatch for doc ${r.getLong(0)}")
    }
  }

  test("minhash_band_buckets: empty input is null") {
    val df = Seq(Tuple1(Seq.empty[Long])).toDF("shh")
      .select(SketchCols.minHashBandBuckets(col("shh"), numHashes, bands).as("b"))
    assert(df.collect().head.isNullAt(0))
  }

  test("simhash64 == SQL aggregate formulation, bit for bit") {
    val docs = Seq(
      (1L, Seq("the", "quick", "brown", "fox")),
      (2L, Seq("the", "quick", "brown", "fox", "jumps")),
      (3L, Seq("one")),
      (4L, (1 to 257).map(i => s"tok$i")),
      (5L, Seq.empty[String]),
    ).toDF("doc_id", "toks")
      .withColumn("th", transform(col("toks"), t => xxhash64(t)))

    val legacy = expr(
      """aggregate(sequence(0, 63), 0L, (acc, j) -> acc |
        |  IF(aggregate(th, 0L,
        |       (s, h) -> s + IF((shiftright(h, j) & 1) = 1, 1L, -1L)) > 0,
        |     shiftleft(1L, j), 0L))""".stripMargin)

    val got = docs.select(col("doc_id"), legacy.as("legacy"),
      SketchCols.simHash64(col("th")).as("native")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"simhash mismatch for doc ${r.getLong(0)}")
    }
  }
}
