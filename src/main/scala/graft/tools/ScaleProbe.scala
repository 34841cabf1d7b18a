package graft.tools

import graft.Tables
import graft.streaming.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ONE-OFF empirical scale probe: every 100 TB claim in the store loops
  * ("increment cost independent of corpus size") is plan-audited and
  * spec-pinned, but the bench measures it only at one corpus size per
  * round. This main measures the SAME fixed-size increment stream
  * against a 1× and an N× (default 10×) corpus and prints per-batch
  * seconds at both scales — the cheapest way to falsify a hidden
  * corpus-size-dependent cost (driver-side listings, collect growth,
  * screen fan-out) before a real cluster does.
  *
  * Protocol — what varies and what is pinned:
  *  - the CORPUS grows N×: derived replicas are content-distinct (every
  *    token suffixed per replica → disjoint shingle sets; embeddings
  *    rolled per replica → distinct vectors), so index cardinality
  *    really grows N× with no pathological duplicate blow-up;
  *  - the INCREMENT stream is byte-identical across scales: the same 4
  *    staged arrival batches (planted copies of base rows at +100000
  *    ids), so any per-batch cost delta is attributable to corpus size
  *    alone;
  *  - each lane reports its bootstrap (index build — the one cost that
  *    SHOULD grow with the corpus) apart from the per-batch times.
  *
  * Lanes: the dedup crawl loop (screen+fold), the vector crawl loop
  * (IVF search+append), the aHash crawl loop (decode+screen+fold), the
  * graph crawl loop (search+link — N× store grown by appends, the
  * realistic path), and a one-shot screen per scale.
  *
  * Usage: `sbt "runMain graft.tools.ScaleProbe [baseSfDir] [factor]"`;
  * results go to stdout as one JSON line (record into BENCH notes).
  */
object ScaleProbe {
  import graft.streaming.Graft.CrawlMetrics

  private def timed[A](body: => A): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_scaleprobe_$tag").toString

  /** Write the N× corpus: replica k shifts ids by k·10⁷ and makes the
    * content distinct (suffixed tokens / rolled embeddings); k = 0 is
    * the base verbatim, so planted arrival copies still match.
    */
  private def deriveScaled(spark: SparkSession, baseDir: String,
      factor: Int): String = {
    val out = freshDir("corpus")
    val docs = Tables.documents(spark, baseDir)
      .select(col("doc_id"), col("text"))
    (0 until factor).map { kk =>
      if (kk == 0) docs
      else docs.select((col("doc_id") + kk * 10000000L).as("doc_id"),
        array_join(transform(split(col("text"), "\\s+"),
          t => concat(t, lit(s"_$kk"))), " ").as("text"))
    }.reduce(_ unionByName _)
      .write.parquet(s"$out/documents.parquet")
    val emb = Tables.embeddings(spark, baseDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    (0 until factor).map { kk =>
      if (kk == 0) emb
      else emb.select((col("vec_id") + kk * 10000000L).as("vec_id"),
        concat(slice(col("embedding"), kk + 1, 64 - kk),
          slice(col("embedding"), 1, kk)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .write.parquet(s"$out/embeddings.parquet")
    out
  }

  /** Stage the FIXED arrival set (4 parquet files = 4 micro-batches). */
  private def stage(df: DataFrame, nBatches: Int, keyCol: String): String = {
    val dir = s"${freshDir("arrivals")}/files"
    df.repartition(nBatches, col(keyCol)).write.parquet(dir)
    dir
  }

  private def streamOf(spark: SparkSession, stagedDir: String): DataFrame = {
    val schema = spark.read.parquet(stagedDir).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stagedDir)
  }

  private def run(spark: SparkSession,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    graft.GraftSession.awaitFinished(q, timeoutMs = 1800000L)

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.timeType.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaledDir = deriveScaled(spark, baseDir, factor)
    val results = scala.collection.mutable.LinkedHashMap[String, String]()

    // fixed arrivals, shared across scales
    val baseDocs = Tables.documents(spark, baseDir)
      .select(col("doc_id"), col("text"))
    val docArrivals = stage(baseDocs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text")),
      4, "doc_id")
    val baseEmb = Tables.embeddings(spark, baseDir)
      .select(col("vec_id"), col("embedding"))
    val vecArrivals = stage(baseEmb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")),
      4, "vec_id")
    val mediaArrivals = stage(baseDocs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("media_id")), 4, "media_id")

    def batches(label: String): String = {
      val xs = CrawlMetrics.snapshot(label)
      xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    }

    for ((scale, d) <- Seq("x1" -> baseDir, s"x$factor" -> scaledDir)) {
      val corpusDocs = Tables.spread(Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))).cache()
      val corpusEmb = Tables.spread(Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))).cache()
      corpusDocs.count(); corpusEmb.count()

      // ---- dedup crawl loop ----
      locally {
        val root = freshDir(s"dedup_$scale")
        val label = s"probe-dedup-$scale"
        val boot = timed {
          graft.operators.dedup.Dedup
            .dedupIndexAppend(corpusDocs, s"$root/idx", "corpus")
        }
        run(spark, graft.GraftSession.withStreamShuffle(spark)(
          Graft.screenAndFold(streamOf(spark, docArrivals), s"$root/idx",
            s"$root/pairs", trigger = Trigger.AvailableNow(),
            queryName = label)))
        results(s"dedup_$scale") =
          f"""{"bootstrap":$boot%.3f,"batches":${batches(label)}}"""
      }

      // ---- vector crawl loop ----
      locally {
        val root = freshDir(s"vec_$scale")
        val label = s"probe-vec-$scale"
        val boot = timed {
          graft.operators.ann.PqIndex.build(corpusEmb, s"$root/idx")
        }
        val provider = corpusEmb.unionByName(
          spark.read.parquet(vecArrivals))
        run(spark, graft.GraftSession.withStreamShuffle(spark)(
          Graft.searchAndAppend(streamOf(spark, vecArrivals), s"$root/idx",
            s"$root/matches", embProvider = provider, nprobe = 2, k = 1,
            rerank = 64, trigger = Trigger.AvailableNow(),
            queryName = label)))
        results(s"vector_$scale") =
          f"""{"bootstrap":$boot%.3f,"batches":${batches(label)}}"""
      }

      // ---- aHash crawl loop (decode + screen + fold, the mm10 shape) ----
      locally {
        val M = graft.operators.multimodal.Multimodal
        val root = freshDir(s"mm_$scale")
        val label = s"probe-mm-$scale"
        val ids = Tables.documents(spark, d)
          .select(col("doc_id").as("media_id"))
        val boot = timed {
          M.ahashIndexAppend(M.ahashOf(Tables.spread(ids)), s"$root/idx",
            "corpus")
        }
        val q = graft.GraftSession.withStreamShuffle(spark)(
          streamOf(spark, mediaArrivals).writeStream.foreachBatch {
            (batch: DataFrame, bid: Long) =>
              CrawlMetrics.timed(label) {
                val hashed = M.ahashOf(batch).cache()
                try {
                  M.screenAhash(spark, s"$root/idx", hashed)
                    .write.mode("append").parquet(s"$root/pairs")
                  M.ahashIndexAppend(hashed, s"$root/idx", f"b$bid%06d")
                } finally { hashed.unpersist(); () }
              }
          }.queryName(label).trigger(Trigger.AvailableNow()).start())
        run(spark, q)
        results(s"ahash_$scale") =
          f"""{"bootstrap":$boot%.3f,"batches":${batches(label)}}"""
      }

      // ---- graph crawl loop (N× store grown by appends — the realistic
      // build-out; bootstrap = build(first wave) + N−1 appends) ----
      locally {
        val K = graft.operators.ann.KnnGraph
        val root = freshDir(s"graph_$scale")
        val label = s"probe-graph-$scale"
        val boot = timed {
          K.build(corpusEmb.filter(col("vec_id") < 10000000L),
            s"$root/idx", "corpus")
          (1 until factor).foreach { kk =>
            val wave = corpusEmb.filter(col("vec_id") >= kk * 10000000L &&
              col("vec_id") < (kk + 1) * 10000000L)
            if (scale != "x1")
              K.append(spark, s"$root/idx", corpusEmb, wave, s"w$kk")
          }
        }
        val provider = corpusEmb.unionByName(
          spark.read.parquet(vecArrivals))
        run(spark, graft.GraftSession.withStreamShuffle(spark)(
          Graft.searchAndLink(streamOf(spark, vecArrivals), s"$root/idx",
            s"$root/matches", embProvider = provider, k = 1,
            trigger = Trigger.AvailableNow(), queryName = label)))
        results(s"graph_$scale") =
          f"""{"bootstrap":$boot%.3f,"batches":${batches(label)}}"""
      }

      // ---- one-shot screen (the non-streaming serving path) ----
      locally {
        val root = freshDir(s"screen_$scale")
        graft.operators.dedup.Dedup
          .dedupIndexAppend(corpusDocs, s"$root/idx", "corpus")
        val batch = baseDocs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
        // shingle explicitly and release per iteration: the probe
        // measures SCALING, so a pin left behind by scale k must not
        // skew scale k+1's memory headroom (the crawl-loop lifecycle,
        // not the serving path's bounded registry)
        val bsh = graft.operators.dedup.Dedup.shingledOf(batch).cache()
        val secs = try timed {
          graft.operators.dedup.Dedup
            .screenAgainstIndexShingled(spark, s"$root/idx", bsh).count()
        } finally { bsh.unpersist(); () }
        results(s"screen_$scale") = f"""{"secs":$secs%.3f}"""
      }

      corpusDocs.unpersist(); corpusEmb.unpersist()
    }

    val line = results.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"probe":"scale","base":"$baseDir","factor":$factor,""",
        ",", "}")
    println(line)
    spark.stop()
  }
}
