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

  test("cosine_similarity == SQL aggregate(zip_with) formulation on random vectors") {
    // 300 seeded-random pairs: equal lengths, mismatched lengths (→ null
    // both ways), occasional null elements (→ null both ways). Zero-norm
    // vectors excluded here: under ANSI mode the legacy formulation
    // THROWS DIVIDE_BY_ZERO on them — the native expression deliberately
    // keeps IEEE semantics (NaN, never-throw), pinned below.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).map { i =>
      def vec(n: Int): Seq[java.lang.Float] = Seq.fill(n) {
        if (rnd.nextInt(40) == 0) null
        else java.lang.Float.valueOf((rnd.nextFloat() + 0.1f) * 4f)
      }
      val n = 1 + rnd.nextInt(8)
      val m = if (rnd.nextInt(5) == 0) n + 1 else n // 20% mismatched
      (i.toLong, vec(n), vec(m))
    }
    val df = rows.toDF("id", "a", "b")
    val legacy = {
      val dot = aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
      val na = aggregate(col("a"), lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double"))
      val nb = aggregate(col("b"), lit(0.0),
        (acc, v) => acc + v.cast("double") * v.cast("double"))
      dot / (sqrt(na) * sqrt(nb))
    }
    val got = df.select(col("id"), legacy.as("legacy"),
      SketchCols.cosineSimilarity(col("a"), col("b")).as("native")).collect()
    got.foreach { r =>
      val (l, n) = (if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))
      assert(l == n,
        s"cosine mismatch for row ${r.getLong(0)}: legacy=$l native=$n")
    }

    // zero-norm: native is never-throw IEEE (NaN), where the ANSI-mode
    // legacy formulation would fail the whole job
    val z = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
      .select(SketchCols.cosineSimilarity(col("a"), col("b")).as("c")).collect()(0)
    assert(z.getDouble(0).isNaN)
  }

  test("map_changed_fields == SQL map_filter(map_zip_with) formulation on random maps") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c", "d", "e", "f")
    def randMap(): Map[String, String] =
      keys.filter(_ => rnd.nextBoolean()).map(k =>
        k -> (if (rnd.nextInt(4) == 0) null else rnd.nextInt(3).toString)).toMap
    val rows = (0 until 300).map { i =>
      (i.toLong, randMap(), randMap(),
        keys.filter(_ => rnd.nextInt(4) == 0)) // random toast subset
    }
    val df = rows.toDF("id", "o", "n", "toast")
    val legacy = map_filter(
      map_zip_with(col("o"), col("n"), (_, ov, nv) =>
        struct(ov.as("old_value"), nv.as("new_value"))),
      (k, v) => !(v.getField("old_value") <=> v.getField("new_value")) &&
        !array_contains(col("toast"), k))
    val got = df.select(col("id"),
        legacy.as("legacy"),
        graft.plans.MapDiffCols.mapChangedFields(col("o"), col("n"), col("toast"))
          .as("native"),
        map_keys(legacy).as("legacy_keys"))
      .withColumn("native_keys", map_keys(col("native")))
      .collect()
    got.foreach { r =>
      assert(r.getMap[String, org.apache.spark.sql.Row](1) ==
        r.getMap[String, org.apache.spark.sql.Row](2),
        s"diff mismatch for row ${r.getLong(0)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4),
        s"key ORDER mismatch for row ${r.getLong(0)}")
    }
  }

  test("F6 native short-circuits == lambda formulation on random events") {
    val rnd = new scala.util.Random(11)
    val keys = Seq("a", "b", "c", "d", "e", "f")
    val unwatched = Seq("b", "e")
    def randMap(): Option[Map[String, String]] =
      if (rnd.nextInt(8) == 0) None
      else Some(keys.filter(_ => rnd.nextBoolean()).map(k =>
        k -> (if (rnd.nextInt(4) == 0) null else rnd.nextInt(3).toString)).toMap)
    // null op included: a NULL-op event has no defined diff and must PASS
    // F6 (the `when(op === "update", …)` formulation yields a null map)
    val ops = Seq("insert", "update", "delete", null)
    val rows = (0 until 400).map { i =>
      (i.toLong, ops(rnd.nextInt(4)), randMap(), randMap(),
        keys.filter(_ => rnd.nextInt(4) == 0))
    }
    val df = rows.toDF("id", "op", "o", "n", "toast")

    // the lambda formulation both natives must match bit-for-bit
    val legacyChanges = when(col("op") === "update", map_filter(
      map_zip_with(col("o"), col("n"), (_, ov, nv) =>
        struct(ov.as("old_value"), nv.as("new_value"))),
      (k, v) => !(v.getField("old_value") <=> v.getField("new_value")) &&
        !array_contains(col("toast"), k)))
    val legacyPred = legacyChanges.isNull ||
      size(map_filter(legacyChanges, (k, _) => !k.isin(unwatched: _*))) > 0

    val got = df.select(col("id"),
        legacyPred.as("legacy"),
        graft.plans.ChangeFilterCols.anyChangedKeyNotIn(
          legacyChanges, unwatched).as("native_map"),
        graft.operators.cdc.ChangeStream.watchedFieldsPredicate(col("op"),
          col("o"), col("n"), col("toast"), unwatched).as("native_fused"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"map-form mismatch for row ${r.getLong(0)}")
      assert(r.getBoolean(1) == r.getBoolean(3),
        s"fused-form mismatch for row ${r.getLong(0)}")
    }
    // interpreted fallback path (eval, no codegen) agrees too
    val interp = graft.plans.ChangeFilterUtil
    val m = org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("b")),
      Array[Any](null))
    assert(!interp.anyKeyNotIn(m, interp.toSet(unwatched)))
    assert(interp.anyKeyNotIn(m, interp.toSet(Seq("x"))))
  }
}
