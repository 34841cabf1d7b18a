package graft

import graft.operators.cdc.ChangeStream
import graft.queries.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the end-to-end CDC pipeline (derive change set → records →
    * diffs → typed Events) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    ChangeStream.events(spark, "/root/testdata/sf0.001")
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
