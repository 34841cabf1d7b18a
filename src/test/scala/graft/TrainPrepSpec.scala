package graft

import graft.operators.prep.TrainPrep
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + scale-shape tests for the training-prep family (tp01-tp05).
  * The DuckDB oracles verify exact values; these pin the semantic
  * properties that make the values RIGHT, on the smoke SF.
  */
class TrainPrepSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("tp01: benchmark docs are fully self-contaminated, most others clean") {
    val out = TrainPrep.decontaminate(spark, sf).cache()
    val bench = out.filter(col("doc_id") % 97 === 0 && col("n_grams") > 0)
    assert(bench.count() > 0)
    assert(bench.filter(col("n_hits") =!= col("n_grams")).count() === 0,
      "a benchmark doc must hit every one of its own grams")
    val planted = out.filter(col("doc_id") % 31 === 5 && col("n_grams") > 0)
    assert(planted.count() > 0)
    assert(planted.filter(!col("contaminated")).count() === 0,
      "planted docs must be flagged")
    // the clean majority: neither benchmark nor planted, with enough grams
    val clean = out.filter(col("doc_id") % 97 =!= 0 && col("doc_id") % 31 =!= 5)
    assert(clean.filter(!col("contaminated")).count() > 0,
      "contamination must not be corpus-wide (grams too short / set too big)")
    out.unpersist()
  }

  test("word_ngrams native expression matches the declarative shingle pipeline") {
    import graft.operators.text.TextOps
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val diff = docs.select(col("doc_id"),
      graft.plans.SketchCols.wordNGrams(col("text"), 8).as("native"),
      TextOps.shingles(TextOps.tokens(col("text")), 8).as("declarative"))
      .filter(not(col("native") <=> col("declarative")))
    assert(diff.count() === 0, "native and lambda shingles must be bit-identical")
    // short/empty/whitespace edges
    val edge = spark.range(1).select(
      graft.plans.SketchCols.wordNGrams(lit("a b c"), 8).as("short"),
      graft.plans.SketchCols.wordNGrams(lit(""), 2).as("empty"),
      graft.plans.SketchCols.wordNGrams(lit("  x   y  "), 2).as("padded"))
      .collect()(0)
    assert(edge.getSeq[String](0) == Seq() && edge.getSeq[String](1) == Seq())
    assert(edge.getSeq[String](2) == Seq("x y"))
  }

  test("tp01 plan: benchmark gram set joins broadcast (no corpus-corpus shuffle join)") {
    val df = TrainPrep.decontaminate(spark, sf)
    df.collect() // AQE finalizes on execution
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bench-gram join must broadcast:\n$plan")
    // one corpus shingle pass + the pushed-down 1/97 bench slice + the
    // doc-0 snippet point lookup; the ids-only re-entry lane must NOT
    // read text — a 4th scan means the corpus is shingled per lane again
    val textScans = plan.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("text#"))
    assert(textScans <= 3, s"corpus shingled per lane ($textScans text scans)")
  }

  test("tp02: assignment is deterministic and ~90/5/5") {
    val a = TrainPrep.hashSplit(spark, sf).collect()
    val b = TrainPrep.hashSplit(spark, sf).collect()
    assert(a.sameElements(b), "hash split must be run-stable")
    val n = a.length.toDouble
    val frac = a.groupBy(_.getString(2)).view.mapValues(_.length / n).toMap
    assert(frac("train") > 0.80 && frac("train") < 0.97, s"train frac: $frac")
    assert(a.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 100))
  }

  test("tp03: offsets tile the token tape exactly (no gaps, no overlaps)") {
    val rows = TrainPrep.seqPacking(spark, sf).collect()
    assert(rows.head.getLong(2) === 0L, "tape starts at 0")
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c.getLong(2) === p.getLong(2) + p.getInt(1),
        s"doc ${c.getLong(0)} start must be prev start + prev n_tokens")
    case _ => ()
    }
    assert(rows.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 2048))
    // multi-doc sequences actually happen (budget isn't degenerate)
    val perSeq = rows.groupBy(_.getLong(3)).values.map(_.length)
    assert(perSeq.max > 1)
  }

  test("tp03: bucketed prefix sum — no global single-partition window over docs") {
    // the doc-level window must partition by bucket; only the tiny
    // bucket-level frame may use an unpartitioned window
    val plans = TrainPrep.seqPacking(spark, sf)
      .queryExecution.executedPlan.toString
    val windowLines = plans.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.exists(_.contains("bucket#")),
      s"doc window must be partitioned by bucket:\n${windowLines.mkString("\n")}")
  }

  test("tp03: recursive prefix — corpus scanned once, levels share the bucket stage") {
    val df = TrainPrep.seqPacking(spark, sf)
    df.collect() // AQE finalizes (and can only reuse stages) on execution
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // every recursion level re-references the corpus subtree; the pinned
    // per-level isnotnull chain must keep the lanes identical so stage
    // reuse collapses them — one scan+tokenize, not one per level
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"corpus re-scanned per recursion level:\n$p")
    assert("ReusedExchange".r.findAllIn(p).size >= 3,
      s"recursion lanes de-shared (expected ≥3 reused exchanges):\n$p")
    // the id-space capacity guard must survive optimization into the plan
    assert(p.contains("raise_error"), "maxDocs capacity guard compiled out")
  }

  test("tp03: capacity guard raises on a doc_id past maxDocs") {
    val ex = intercept[Throwable] {
      TrainPrep.seqPacking(spark, sf, maxDocs = 10L).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("exceeds declared capacity"), s"wrong failure: $msgs")
  }

  test("tp03: exclusivePrefix matches the single-level formula at any depth") {
    import spark.implicits._
    val totals = (0L until 57L).map(k => (k, k * 3 + 1)).toDF("key", "tot")
    val expect = (0L until 57L).map(k => k -> (0L until k).map(_ * 3 + 1).sum).toMap
    Seq(0, 1, 2, 3).foreach { depth =>
      val got = TrainPrep.exclusivePrefix(totals, depth, fanout = 4L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"depth=$depth prefix mismatch")
    }
  }

  test("tp01: building the query submits zero Spark jobs (lazy constructor)") {
    // drain any in-flight listener events from earlier tests first
    spark.sparkContext.parallelize(Seq(1)).count()
    Thread.sleep(500)
    // warm the per-path schema cache — the first read of a path is allowed
    // its footer-inference jobs; constructors must be lazy thereafter
    TrainPrep.decontaminate(spark, sf)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      TrainPrep.decontaminate(spark, sf) // build only — must not execute
      // single-job marker (an AQE count() would be 2 jobs)
      spark.sparkContext.parallelize(Seq(1)).count()
      // the listener bus is FIFO: once the marker's start event has been
      // observed, any build-time job would already have been counted
      val deadline = System.currentTimeMillis + 30000
      while (jobs.get() < 1 && System.currentTimeMillis < deadline) Thread.sleep(50)
      assert(jobs.get() === 1,
        s"building decontaminate submitted ${jobs.get() - 1} Spark job(s)")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("tp01: missing benchmark doc fails at execution with a clear message") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_tp01_").toString
    Tables.documents(spark, sf).filter(col("doc_id") =!= 0)
      .write.mode("overwrite").parquet(tmp + "/documents.parquet")
    val ex = intercept[Throwable] {
      graft.operators.prep.TrainPrep.decontaminate(spark, tmp).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("benchmark snippet doc"), s"wrong failure: $msgs")
  }

  test("tp06: caller-supplied share map drives rates; unlisted sources drop") {
    val out = TrainPrep.mixtureSample(spark, sf, budgetFrac = 0.5,
      shares = Map("src0" -> 1.0)).cache()
    // src0 gets the whole budget — far above its supply → clamps to keep-all
    assert(out.filter(col("source") === "src0" && !col("kept")).count() === 0)
    assert(out.filter(col("source") === "src0").count() > 0)
    // sources absent from the map get share 0 → excluded from the mix
    assert(out.filter(col("source") =!= "src0" && col("kept")).count() === 0)
    out.unpersist()
  }

  test("tp07: epoch shuffle is a permutation, epoch-distinct, and single-task-free") {
    val e1 = TrainPrep.epochShuffle(spark, sf, epoch = 1)
    val rows = e1.collect()
    val n = rows.length
    // a permutation of 0..n-1
    assert(rows.map(_.getLong(2)).sorted.toSeq == (0L until n).toSeq,
      "positions must be a permutation of 0..n-1")
    // deterministic, and a different epoch is a different permutation
    val again = TrainPrep.epochShuffle(spark, sf, epoch = 1).collect()
    assert(rows.map(_.getLong(2)).toSeq == again.map(_.getLong(2)).toSeq)
    val e2 = TrainPrep.epochShuffle(spark, sf, epoch = 2).collect()
    assert(rows.map(_.getLong(2)).toSeq != e2.map(_.getLong(2)).toSeq,
      "epoch 2 must permute differently")
    // matches the single-node reference rank (what the DuckDB oracle runs):
    // sorting by (md5 hex, doc_id) locally must recover pos = 0..n-1
    def hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"epoch1:$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val ref = rows.sortBy(r => (hex(r.getLong(0)), r.getLong(0)))
    assert(ref.map(_.getLong(2)).toSeq == (0L until n).toSeq,
      "bucketed rank must equal the global (hash, id) sort rank")
    // scale shape: the doc-level window partitions by bucket; only the
    // prefix lane's tiny frames may sort unpartitioned
    val p = TrainPrep.epochShuffle(spark, sf).queryExecution.executedPlan.toString
    val docWindows = p.linesIterator.filter(l =>
      l.contains("Window") && l.contains("rk#")).toSeq
    assert(docWindows.nonEmpty && docWindows.forall(_.contains("bucket#")),
      s"doc-rank window must partition by bucket:\n${docWindows.mkString("\n")}")
  }

  test("tp07 geometry derives from declared capacity; the permutation is geometry-invariant") {
    // defaults reproduce the original fixed shape: 65536 buckets, depth 1
    assert(TrainPrep.epochShuffleGeometry(65536L * 1000L, 1000L) == (4, 1))
    // a 10^12-doc declaration widens to 16^8 buckets and three prefix
    // levels — every in-bucket sort stays ~fanout rows, every prefix level
    // tops out ≤ fanout
    assert(TrainPrep.epochShuffleGeometry(1000000000000L, 1000L) == (8, 3))
    // the permutation is defined by (hash, doc_id) order alone: bucket is
    // an order-consistent PREFIX slice of the hash, so re-declaring
    // capacity must not move a single position
    val base = TrainPrep.epochShuffle(spark, sf, epoch = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val wide = TrainPrep.epochShuffle(spark, sf, epoch = 3,
        maxDocs = 1000000000000L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(base == wide, "declared capacity changed the permutation")
  }

  test("tp08: two-stage top-K admits exactly the per-source hash-rank top cap") {
    val cap = 20
    val rows = TrainPrep.sourceCap(spark, sf, cap).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    def hx(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"cap:$id".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val want = rows.groupBy(_._2).iterator.flatMap { case (_, docs) =>
      docs.sortBy(d => (hx(d._1), d._1)).take(cap).map(_._1)
    }.toSet
    val got = rows.filter(_._3).map(_._1).toSet
    assert(got == want, s"admission set mismatch: extra=${got -- want} missing=${want -- got}")
    // every source keeps min(cap, supply)
    rows.groupBy(_._2).foreach { case (src, docs) =>
      assert(docs.count(_._3) == math.min(cap, docs.length), s"$src cap violated")
    }
    // scale shape: the full-frame window must partition by (source, pb) —
    // only the bounded survivor frame may window on source alone
    val p = TrainPrep.sourceCap(spark, sf, cap)
      .queryExecution.executedPlan.toString
    val w1 = p.linesIterator.filter(l => l.contains("Window") && l.contains("rk1")).toSeq
    assert(w1.nonEmpty && w1.forall(l => l.contains("pb#")),
      s"full-frame window not sub-bucketed:\n${w1.mkString("\n")}")
  }

  test("tp04: planted docs carry exactly one of each PII kind; redaction kills all") {
    val out = TrainPrep.piiScrub(spark, sf).cache()
    val planted = out.filter(col("doc_id") % 7 === 0)
    assert(planted.count() > 0)
    assert(planted.filter(col("n_emails") =!= 1 || col("n_ipv4") =!= 1 ||
      col("n_phones") =!= 1).count() === 0)
    assert(out.filter(col("doc_id") % 7 =!= 0)
      .filter(col("n_emails") + col("n_ipv4") + col("n_phones") =!= 0)
      .count() === 0, "organic corpus is PII-free")
    out.unpersist()
    // end-to-end: re-scanning the redacted text finds nothing
    val redacted = Tables.documents(spark, sf)
      .select(concat(col("text"), lit(" a user1@example.com 10.1.0.2 555-1234"))
        .as("text"))
      .select(regexp_replace(regexp_replace(regexp_replace(col("text"),
        TrainPrep.emailRe, "<EMAIL>"), TrainPrep.ipv4Re, "<IP>"),
        TrainPrep.phoneRe, "<PHONE>").as("r"))
      .filter(regexp_count(col("r"), lit(TrainPrep.emailRe)) +
        regexp_count(col("r"), lit(TrainPrep.ipv4Re)) +
        regexp_count(col("r"), lit(TrainPrep.phoneRe)) > 0)
    assert(redacted.count() === 0)
  }

  test("tp06: mixture clamps oversubscribed sources and thins underweighted ones") {
    val out = TrainPrep.mixtureSample(spark, sf).cache()
    // src19's target (share 20/210 of a 60% budget) exceeds its supply →
    // rate clamps to 1.0 → every doc kept
    assert(out.filter(col("source") === "src19" && !col("kept")).count() === 0)
    // src0 (share 1/210) must keep strictly less than it was given
    val src0 = out.filter(col("source") === "src0")
    assert(src0.filter(col("kept")).count() < src0.count())
    // overall: roughly the budget, and kept is a pure function of doc_id
    val keptFrac = out.filter(col("kept")).count().toDouble / out.count()
    assert(keptFrac > 0.2 && keptFrac < 0.9, s"kept fraction $keptFrac")
    out.unpersist()
    val plan = TrainPrep.mixtureSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast back onto documents:\n$plan")
  }

  test("tp05: quantization saturates at exactly 127 and reconstructs within half-step") {
    val out = TrainPrep.embedQuant(spark, sf)
    assert(out.filter(col("amax_e8") > 0 && col("max_abs_q") =!= 127).count() === 0,
      "the max-magnitude element must land exactly on ±127")
    assert(out.filter(col("n_sat") < 1).count() === 0)
    // reconstruction bound: |x - q*scale| <= scale/2 for every element
    val bad = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("amax", expr("array_max(transform(v, x -> abs(x)))"))
      .filter(col("amax") > 0)
      .withColumn("scale", expr("amax / CAST(127 AS DOUBLE)"))
      .filter(expr(
        """exists(v, x ->
          |  abs(x - round(x / scale) * scale) > scale / 2.0D + 1e-12)""".stripMargin))
    assert(bad.count() === 0)
  }

  test("tp09: mask indexes point at exactly the PII-planted + blocklisted tokens") {
    import graft.operators.text.TextOps
    val out = TrainPrep.lossMask(spark, sf).collect()
    val blocked = Set("slow", "dup")
    val pii = ("([A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,})|" +
      "(\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b)|(\\b555-\\d{4}\\b)").r
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val doc = r.getLong(0)
      val text = if (doc % 7 == 0)
        texts(doc) + s" contact user$doc@example.com ip 10.${doc % 256}.0." +
          s"${doc % 100} call 555-${"%04d".format(doc % 10000)}"
      else texts(doc)
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      assert(r.getInt(1) == toks.length, s"doc $doc token count")
      val want = toks.zipWithIndex.collect {
        case (t, i) if pii.findFirstIn(t).isDefined || blocked(t) => i + 1
      }.toSeq
      assert(r.getSeq[Int](2) == want, s"doc $doc mask indexes")
      assert(r.getInt(3) == want.length)
      // every planted doc masks at least its three planted PII tokens
      if (doc % 7 == 0) assert(r.getInt(3) >= 3, s"doc $doc planted mask")
    }
    // tokenizer parity guard: the spec's split mirrors TextOps.tokens
    val got = spark.range(1)
      .select(TextOps.tokens(org.apache.spark.sql.functions.lit("  a  b c ")))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a", "b", "c"))
  }

  test("tp11: packed masks land docs across sequence boundaries correctly") {
    val sf = "/root/testdata/sf0.001"
    // tiny budget so documents straddle sequence boundaries
    val rows = TrainPrep.packedLossMask(spark, sf, budget = 64).collect()
    assert(rows.nonEmpty)
    // invariant: coordinates decompose exactly
    rows.foreach { r =>
      val g = r.getLong(1)
      assert(r.getLong(2) == g / 64 && r.getLong(3) == g % 64)
    }
    // at least one doc's masks span two different sequences — the case
    // per-doc masks cannot express (the reason tp11 exists)
    val spanning = rows.groupBy(_.getLong(0))
      .filter { case (_, rs) => rs.map(_.getLong(2)).distinct.length > 1 }
    assert(spanning.nonEmpty, "no doc's masks straddle a boundary at budget 64")
    // cross-check one doc against the un-packed mask lane: global
    // positions are start_offset + idx - 1 under the PLANTED packing
    val masks = TrainPrep.lossMask(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val globals = rs.map(_.getLong(1)).sorted
      val idxs = masks(doc).sorted
      assert(globals.length == idxs.length, s"doc $doc mask count")
      val start = globals.head - (idxs.head - 1)
      assert(globals.zip(idxs).forall { case (g, i) => g == start + i - 1 },
        s"doc $doc global positions inconsistent with mask indexes")
    }
  }

  test("tp10: planted benchmark overlap is found at exactly its positional mass") {
    import spark.implicits._
    val bench = (1 to 20).map(i => s"bench$i").mkString(" ") // doc 0: 20 tokens
    val clean = (1 to 30).map(i => s"clean$i").mkString(" ")
    // doc 3 embeds benchmark tokens 3..17 (15 tokens) mid-document:
    // its contaminated 13-gram STARTS are those fully inside the span
    val infected = (1 to 5).map(i => s"pre$i").mkString(" ") + " " +
      (3 to 17).map(i => s"bench$i").mkString(" ") + " " +
      (1 to 5).map(i => s"post$i").mkString(" ")
    val docs = Seq((0L, bench), (3L, infected), (5L, clean), (9L, "tiny doc"))
      .toDF("doc_id", "text")
    val r = TrainPrep.contaminationScreenFor(docs, k = 13, benchMod = 17L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(0L), "benchmark docs are not screened rows")
    // infected: 25 tokens -> 13 grams; the 15-token benchmark span holds
    // 15-13+1 = 3 contaminated gram starts
    assert(r(3L).getInt(2) == 13 && r(3L).getLong(3) == 3L)
    assert(r(3L).getBoolean(5), "overlap must flag contaminated")
    assert(math.abs(r(3L).getDouble(4) - 3.0 / 13.0) < 1e-12)
    assert(r(5L).getLong(3) == 0L && !r(5L).getBoolean(5))
    assert(r(9L).getInt(2) == 0 && !r(9L).getBoolean(5),
      "sub-k docs have zero grams and are never flagged")
  }

  test("tp12: planted vocabulary skew — target-like docs outrank off-target docs") {
    import spark.implicits._
    // target model trains on 'en' docs (alpha/beta vocabulary), raw model
    // on everything; doc 100 reuses the target vocabulary, doc 101 the
    // off-target one — the log-likelihood-ratio weight must rank 100 > 101
    // and the integral verdict must agree with the weight's sign
    val docs = (
      (1L to 20L).map(i => (i, "en", "alpha beta gamma alpha beta")) ++
      (21L to 40L).map(i => (i, "zz", "zeta eta theta zeta eta")) ++
      Seq((100L, "zz", "alpha beta alpha beta gamma"),
          (101L, "zz", "zeta eta zeta eta theta"))
    ).toDF("doc_id", "lang", "text")
    val w = TrainPrep.dsirLogWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // note: the SMOOTHED weight's absolute sign is not meaningful here —
    // the raw model contains the target slice, so per-gram ratios sit just
    // below 1 and only the RANKING (what resampling uses) is the contract
    assert(w(100L) > w(101L) + 5.0,
      s"target-vocab doc must far outweigh off-vocab doc: ${w(100L)} vs ${w(101L)}")
    val s = TrainPrep.dsirScoresFor(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(s(100L)._2 && !s(101L)._2,
      s"integral verdict must agree with the weight sign: ${s(100L)}, ${s(101L)}")
    assert(s(100L)._1 > 0 && s(101L)._1 < 0)
  }

  test("tp13: terciles are grid-ordered, cutoff-exact in size, kept = not tail") {
    val rows = TrainPrep.perplexityBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4), r.getBoolean(5)))
    val n = rows.length
    assert(n > 0)
    rows.foreach { case (_, _, b, kept) => assert(kept == (b != "tail")) }
    val byB = rows.groupBy(_._3).map { case (b, rs) => b -> rs.map(_._2) }
    assert(byB.keySet == Set("head", "middle", "tail"), s"${byB.keySet}")
    // grid ordering: every head cell ≥ every middle cell ≥ every tail cell
    assert(byB("head").min >= byB("middle").max)
    assert(byB("middle").min > byB("tail").max)
    // cutoff exactness: head holds ≥ N/3 docs but overshoots by less than
    // its boundary cell's mass; head+middle likewise at 2N/3
    val hCut = byB("head").min
    val hMass = rows.count(_._2 == hCut)
    assert(3 * byB("head").size >= n)
    assert(3 * (byB("head").size - hMass) < n,
      s"head ${byB("head").size} overshoots beyond its cutoff cell ($hMass)")
    val hm = byB("head").size + byB("middle").size
    val mCut = byB("middle").min
    val mMass = rows.count(_._2 == mCut)
    assert(3 * hm >= 2 * n && 3 * (hm - mMass) < 2 * n)
  }

  test("tp12 plan: model tables join broadcast; no cartesian on the gram lane") {
    val df = TrainPrep.dsirScores(spark, sf)
    df.collect() // AQE finalizes on execution
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"bucket-count models must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"tp12 must not cartesian anywhere:\n$plan")
    // the only full shuffles may carry (bucket) counts or (doc_id) masses —
    // never a gram-exploded text column
    val gramShuffles = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning") && l.contains("gram#"))
    assert(gramShuffles == 0, s"gram rows must not shuffle:\n$plan")
  }

  test("tp14: Bloom never misses, saturates at tiny widths, converges at large ones") {
    import spark.implicits._
    val bench = (1 to 20).map(i => s"bench$i").mkString(" ")
    val infected = (1 to 5).map(i => s"pre$i").mkString(" ") + " " +
      (3 to 17).map(i => s"bench$i").mkString(" ") + " " +
      (1 to 5).map(i => s"post$i").mkString(" ")
    val clean = (1 to 30).map(i => s"clean$i").mkString(" ")
    val docs = Seq((0L, bench), (3L, infected), (5L, clean))
      .toDF("doc_id", "text")
    // default width: no false negatives, exact lane agrees with tp10
    val r = TrainPrep.bloomScreenFor(docs, k = 13, benchMod = 17L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(0L), "benchmark docs are not screened rows")
    assert(r(3L).getLong(4) == 3L && r(3L).getBoolean(6), "exact lane = tp10")
    r.values.foreach { x =>
      assert(x.getLong(3) >= x.getLong(4),
        s"doc ${x.getLong(0)}: bloom missed an exact hit (false negative)")
    }
    // 64-bit filter: the 40 benchmark positions saturate ~all 64 bits →
    // (nearly) every gram collides; the clean doc must pick up FP flags
    val tiny = TrainPrep.bloomScreenFor(docs, k = 13, benchMod = 17L, mBits = 64)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(tiny(5L).getLong(3) > tiny(5L).getLong(4),
      "a saturated filter must show false positives on the clean doc")
    // generous width: FP probability ~(40/2^20)^2 per gram — bloom == exact
    val wide = TrainPrep.bloomScreenFor(docs, k = 13, benchMod = 17L,
      mBits = 1 << 20)
      .collect().map(x => x.getLong(0) -> x).toMap
    wide.values.foreach { x =>
      assert(x.getLong(3) == x.getLong(4),
        s"doc ${x.getLong(0)}: wide filter should be FP-free here")
    }
  }
}
