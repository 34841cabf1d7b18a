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
      case "profile" :: sfDir :: names :: Nil =>
        // job-level wall-time attribution (optimization guide §1: measure
        // first): run the query the way Bench does (count()) under a
        // listener that records every job's duration + callsite, then
        // aggregate by callsite — tells WHICH action inside a multi-action
        // query (store builds, sync cores, screens) owns the envelope
        import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
        val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Double, Int)]()
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onJobStart(js: SparkListenerJobStart): Unit = {
            val desc = Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(js.stageInfos.lastOption.map(_.name)) // action callsite
              .getOrElse("?")
            starts.put(js.jobId, (desc, js.time,
              js.stageInfos.map(_.numTasks).sum))
            ()
          }
          override def onJobEnd(je: SparkListenerJobEnd): Unit = {
            Option(starts.remove(je.jobId)).foreach { case (desc, t0, nt) =>
              done.add((je.jobId, desc, (je.time - t0) / 1e3, nt)); ()
            }
          }
        })
        names.split(",").foreach { name =>
          done.clear()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(500) // listener events are async
          import scala.jdk.CollectionConverters._
          val js = done.asScala.toSeq
          println(f"\n========== $name: wall=$wall%.2f s, ${js.length} jobs, " +
            f"sum=${js.map(_._3).sum}%.2f s ==========")
          println("-- by callsite --")
          js.groupBy(_._2).map { case (d, xs) =>
            (xs.map(_._3).sum, xs.length, d)
          }.toSeq.sortBy(-_._1).take(40).foreach { case (s, n, d) =>
            println(f"$s%8.2f s  n=$n%-4d $d")
          }
          println("-- slowest jobs --")
          js.sortBy(-_._3).take(25).foreach { case (id, d, s, nt) =>
            println(f"$s%8.2f s  job=$id%-5d tasks=$nt%-5d $d")
          }
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
