package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print schema, sample rows and the formatted plan of a
  * parquet table or an ad-hoc SQL statement over the testdata tables.
  *
  * Usage:
  *   runMain graft.tools.Inspect <parquetPath>
  *   runMain graft.tools.Inspect sql <sfDir> <SQL>   (tables registered as views)
  *   runMain graft.tools.Inspect query <sfDir> <name[,name…]>  (SparkEntry plan audit)
  */
object Inspect {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toList match {
      case "sql" :: sfDir :: sql :: Nil =>
        tables.foreach { t =>
          try spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
          catch { case e: Exception => System.err.println(s"skip $t: ${e.getMessage}") }
        }
        val df = spark.sql(sql)
        df.printSchema()
        df.show(20, truncate = false)
        df.explain("formatted")
      case "query" :: sfDir :: names :: Nil =>
        names.split(",").foreach { name =>
          println(s"\n========== $name ==========")
          graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        }
      case "queryexec" :: sfDir :: names :: Nil =>
        // execute first: under AQE the FINAL plan (stage reuse, runtime
        // join strategy switches, coalesced partitions) only exists after
        // an action — the static plan shows none of it
        names.split(",").foreach { name =>
          println(s"\n========== $name (executed) ==========")
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          // execute the EXACT plan without driver materialization: count()
          // would finalize a different (pruned) plan, collect() would pull
          // the whole result into the driver
          df.queryExecution.toRdd.foreach(_ => ())
          println(df.queryExecution.executedPlan.toString)
        }
      case "progress" :: sfDir :: names :: Nil =>
        // micro-batch census for the streaming lanes: how many batches a
        // query's sink actually committed, with the per-batch input rows —
        // the ground truth behind complete-vs-append cost claims (a
        // complete-mode lane that runs ONE data batch re-aggregates once)
        import org.apache.spark.sql.streaming.StreamingQueryListener
        import StreamingQueryListener._
        val log = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()
        spark.streams.addListener(new StreamingQueryListener {
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            log.add((e.progress.name, e.progress.batchId, e.progress.numInputRows))
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        })
        names.split(",").foreach { name =>
          val rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
          // listener events are delivered async; drain before reporting
          Thread.sleep(3000)
          import scala.jdk.CollectionConverters._
          val batches = log.asScala.toSeq
          log.clear()
          println(s"$name: result_rows=$rows micro_batches=${batches.length} " +
            batches.map { case (q, id, n) => s"[$q b$id rows=$n]" }.mkString(" "))
        }
      case path :: Nil =>
        val df = spark.read.parquet(path)
        df.printSchema()
        df.show(5, truncate = false)
        println(s"count=${df.count()}")
      case _ =>
        System.err.println("usage: Inspect <path> | Inspect sql <sfDir> <SQL>")
    }
    spark.stop()
  }
}
