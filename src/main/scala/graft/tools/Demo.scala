package graft.tools

import graft.sources.cdc.WalFixture
import graft.streaming._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable walkthrough of the engine — the walex README demo
  * (README.md:229-285) on Spark: render a few transactions as binary WAL
  * segments, then configure, register handlers, and start the engine.
  *
  *   sbt "runMain graft.tools.Demo"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val walDir = java.nio.file.Files.createTempDirectory("graft-demo").toString
    WalFixture.writeSegments(walDir, Seq(
      WalFixture.Change(1, 0, "insert", "public", "user", 1700000000000L, Some(7), 1234, 1),
      WalFixture.Change(2, 0, "update", "public", "user", 1700000060000L, Some(8), 1384, 1),
      WalFixture.Change(3, 1, "update", "public", "user", 1700000120000L, Some(10), 1384, 2),
      WalFixture.Change(4, 2, "delete", "public", "todo", 1700000180000L, Some(3), 500, 3)))

    val config = GraftConfig("demo_app",
      publication = Some("graft_pub"),
      subscriptions = Seq("user", "todo"))
    println(s"slot = ${config.effectiveSlotName}, wal = $walDir")

    val engine = new Engine()
      .onInsert("user") { ev =>
        ev.select(element_at(col("new_record"), "id").as("id")).collect()
          .foreach(r => println(s"[on_insert user] id=${r.getString(0)}"))
      }
      .onUpdate("user", EventFilters(unwatchedFields = Seq("updated_at"))) { ev =>
        ev.select(element_at(col("new_record"), "id").as("id"),
            map_keys(col("changes")).as("changed")).collect()
          .foreach(r => println(
            s"[on_update user] id=${r.getString(0)} changed=${r.getSeq[String](1).sorted.mkString(",")}"))
      }
      .onDelete("todo") { ev =>
        ev.select(element_at(col("old_record"), "id").as("id")).collect()
          .foreach(r => println(s"[on_delete todo] id=${r.getString(0)}"))
      }

    val query = Graft.start(spark, config, walDir, engine, trigger = Trigger.AvailableNow())
    query.awaitTermination(120000)
    spark.stop()
  }
}
