package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: every native expression resolves and evaluates from
  * plain SQL through `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // extensions bind at session creation — force a fresh session over the
    // shared SparkContext (suites run sequentially in the forked test JVM).
    // withExtensions, not spark.sql.extensions: the conf is STATIC and read
    // from the SparkContext's conf, which an earlier suite already created.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("native expressions resolve and evaluate from plain SQL") {
    val r = spark.sql("""
      SELECT
        cosine_similarity(array(cast(3.0 as float), cast(4.0 as float)),
                          array(cast(3.0 as float), cast(4.0 as float))) AS cos,
        pg_array_parse('{a,NULL,"x y"}') AS arr,
        simhash64(array(cast(5 as bigint))) AS sh,
        pg_interval_parts('1 day 02:00:00') AS iv,
        cast(pg_timetz('06:30:05+02') as string) AS ttz,
        element_at(map_changed_fields(map('a','1','b','9'), map('a','2','b','9'),
          cast(array() as array<string>)), 'a').new_value AS nv,
        size(minhash_band_buckets(array(cast(7 as bigint)), 64, 16)) AS n_bands,
        size(hyperplane_band_buckets(array(cast(1.0 as float)), 8, 10)) AS n_hp,
        winnow_fingerprints('abcdefghijklmnop', 5, 4).n_kgrams AS n_kg,
        any_changed_key_not_in(map('b', named_struct('old_value','1','new_value','2')),
          array('b')) AS f6_map,
        any_watched_field_changed(map('a','1','b','1'), map('a','2','b','1'),
          cast(array() as array<string>), array('a')) AS f6_fused,
        word_ngrams(' a b  a b c ', 2) AS ngrams,
        count_in_static_set(array('bad','ok','bad','worse'),
          array('bad','worse')) AS n_blocked
    """).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getSeq[String](1) == Seq("a", null, "x y"))
    assert(r.getLong(2) == 5L) // single token: simhash = its own bits
    val iv = r.getStruct(3)
    assert((iv.getInt(0), iv.getInt(1), iv.getLong(2)) == ((0, 1, 7200000000L)))
    assert(r.getString(4) == "04:30:05")
    assert(r.getString(5) == "2")
    assert(r.getInt(6) == 16 && r.getInt(7) == 8)
    assert(r.getInt(8) == 12) // 16 chars, k=5 → 12 k-grams
    assert(!r.getBoolean(9)) // only changed key is unwatched → drop
    assert(!r.getBoolean(10)) // only 'a' changed and 'a' is unwatched → drop
    // distinct, first-occurrence order, whitespace-run/trim tolerant
    assert(r.getSeq[String](11) == Seq("a b", "b a", "b c"))
    assert(r.getInt(12) == 3) // duplicates counted: bad×2 + worse
  }

  test("sketch shape arguments must be INT literals") {
    val ex = intercept[Exception] {
      spark.sql("SELECT minhash_band_buckets(array(cast(1 as bigint)), 1 + 1, 16)")
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("INT literal")))
  }
}
