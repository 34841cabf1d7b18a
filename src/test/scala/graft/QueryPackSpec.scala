package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run and produce rows at the smoke SF, and
  * the oracle map must stay consistent with the query map.
  */
class QueryPackSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.timeType.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("planting offset clears every corpus id (self-recall invariant)") {
    // the +100000 planted-copy device (dd03-dd05, ann02/ann04, pipe01)
    // requires all corpus ids < 100000 — a collision would alias planted
    // and organic rows and silently break the planting-formula oracles
    import org.apache.spark.sql.functions.max
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d)))
    assert(dirs.nonEmpty, "no testdata dirs found — the planting guard would be vacuous")
    dirs.foreach { dir =>
        val maxDoc = graft.Tables.documents(spark, dir)
          .agg(max("doc_id")).head.getLong(0)
        val maxVec = graft.Tables.embeddings(spark, dir)
          .agg(max("vec_id")).head.getLong(0)
        assert(maxDoc < 100000L && maxVec < 100000L,
          s"$dir: ids reach $maxDoc/$maxVec — planting offset would collide")
      }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
