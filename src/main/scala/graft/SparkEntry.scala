package graft

import graft.queries.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full streaming engine on sf0.001 — change set rendered
    * as binary WAL segments, replayed through the DSv2 source, transaction-
    * assembled, and projected to typed change rows (driver smoke-checks
    * rows>0). This is the pipeline a walex user runs, end to end.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    QueryPack.streamReplay(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryPack.queries.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => fn(GraftSession.prepare(s), d))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for LSH-internal ops (rows-only).
    */
  def oracleSql: Map[String, String] = QueryPack.oracleSql
}
