package graft.operators.prep

import graft.Tables
import graft.operators.text.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators beyond cleaning/dedup: benchmark
  * decontamination, deterministic split assignment, sequence packing,
  * PII detection/redaction, and embedding quantization — the remaining
  * steps a 100 TB corpus goes through between "cleaned" and "training
  * batches".
  *
  * Scale design notes are on each operator; the common discipline is the
  * same as the rest of the engine: declarative single-scan column
  * expressions wherever possible, candidate-key joins (never all-pairs),
  * broadcast for provably-small sides, and map-side-combined aggregation
  * for every frequency count.
  *
  * Reference scope: walex stops at change-event delivery
  * (`/root/reference/README.md` — no corpus-prep surface); this module is
  * part of the brief's "operations a large-scale training-data pipeline
  * would need" extension, not a reference port.
  */
object TrainPrep {

  // ---------------------------------------------------------------- decon

  /** Benchmark decontamination (the GPT-3-style n-gram overlap check): flag
    * every document sharing any word `n`-gram with a benchmark set. Here
    * the benchmark set is the deterministic `doc_id % 97 == 0` slice of the
    * corpus itself, and a planted contamination lane (`doc_id % 31 == 5`
    * gets benchmark doc 0's first `n` tokens appended) proves the detector
    * fires through a verifiable relation — the same planting device as the
    * dd03/dd04/dd05 recall harnesses.
    *
    * Scale shape: the benchmark gram set is tiny by nature (benchmarks are
    * MBs against a 100 TB corpus) → `broadcast` it; the corpus side is ONE
    * scan → shingle → explode → left join to the broadcast gram set →
    * map-side-combined per-doc aggregate counting rows (= n_grams, grams
    * are distinct) and matches (= n_hits) together — no second
    * shingle lane, and the only full shuffles carry (doc_id, two counts).
    * Docs too short to shingle re-enter via an ids-only left join.
    * Benchmark grams are re-shingled from a pushed-down 1/97 slice of the
    * scan (cheap) rather than caching the full gram frame.
    *
    * Shingling runs as the native codegen'd `word_ngrams` expression
    * (`plans/SketchExprs.scala`) for the same reason winnowing does: the
    * SQL-lambda pipeline gets inlined wholesale into the `size(...) > 0`
    * predicate Catalyst infers below the explode, re-running the full
    * shingle construction per row inside the scan stage; the native call
    * is one JIT'd pass and stays cheap when duplicated.
    */
  def decontaminate(spark: SparkSession, d: String, n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    // the planting device needs benchmark doc 0; a corpus without it would
    // plant nothing and the oracle would vacuously agree — fail loudly
    // instead, INSIDE the plan: the point filter aggregates to exactly one
    // row (null snippet when the doc is absent) and the guard raises at
    // execution time. Building the query runs zero Spark jobs — a library
    // query constructor must stay lazy.
    val snippet = docs.filter(col("doc_id") === 0)
      .agg(max(concat_ws(" ", slice(TextOps.tokens(col("text")), 1, n))).as("s"))
      .select(when(col("s").isNotNull, col("s"))
        .otherwise(raise_error(lit(
          s"decontaminate: benchmark snippet doc (doc_id=0) missing in $d")))
        .as("snippet"))
    // plant over an already-spread scan: spread() inspects the scan's RDD
    // partitioning, which is free on a plain file scan but would MATERIALIZE
    // the broadcast stage (the snippet aggregate) if applied above the
    // crossJoin — the spread goes below the plant to keep the builder lazy
    def plant(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(snippet)) // one-row scalar side
      .select(col("doc_id"),
        when(col("doc_id") % 31 === 5,
          concat(col("text"), lit(" "), col("snippet")))
          .otherwise(col("text")).as("text"))
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        graft.plans.SketchCols.wordNGrams(col("text"), n).as("grams"))
    val bench = grams(plant(docs).filter(col("doc_id") % 97 === 0))
      .select(explode(col("grams")).as("gram")).distinct()
      .withColumn("hit", lit(1))
    val counts = grams(plant(Tables.spread(docs)))
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(bench), Seq("gram"), "left") // bench grams distinct → row-preserving
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hits"))
    docs.select(col("doc_id")) // ids-only re-entry for un-shingleable docs
      .join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- split

  /** The one deterministic hash-bucket primitive every sampling/split lane
    * uses: first 16 bits of `md5(salt || id)` as a value in [0, 65536).
    * Salt and width are the cross-engine contract — the DuckDB oracles
    * re-derive this exact expression, so any change must land in both.
    */
  def hashBucket16(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("long")

  /** Deterministic train/val/test assignment: bucket 0-99 from the first
    * 16 bits of `md5("graft:" || doc_id)`, split by 90/5/5. Hash-based
    * (not random) so the assignment is stable across runs, engines, and
    * re-shards — the property training pipelines need for reproducible
    * holdout sets. Pure single-scan projection: zero shuffles, zero state;
    * at 100 TB this runs at parquet-scan speed and the split is decided
    * per-row with no coordination.
    */
  def hashSplit(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        (hashBucket16("graft:", col("doc_id")) % 100).cast("int").as("bucket"))
      .withColumn("split", splitOf(col("bucket")))
      .orderBy(col("doc_id"))

  /** The ONE bucket→split mapping (90/5/5). Shared with the dd10 leakage
    * audit so the audit can never drift from the split it audits.
    */
  def splitOf(bucket: Column): Column =
    when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")

  // ------------------------------------------------------------- packing

  /** Exclusive distributed prefix sum over a one-row-per-key totals frame
    * `(key, tot)` → `(key, pre)` where `pre` = Σ tot over all keys < key.
    *
    * Recursion is the scale device: keys are grouped into super-keys
    * `key div fanout`; in-group running sums run as a PARTITIONED window
    * (parallel, ≤ fanout rows per task) and the per-group totals recurse.
    * Only `depth == 0` uses a global-order window — a single task, but one
    * the CALLER has proven holds ≤ fanout rows (see [[seqPacking]]'s
    * capacity guard) — so no level ever sorts an unbounded frame in one
    * task. Each level above the first is fanout× smaller, so the extra
    * levels cost a few tiny shuffles, not corpus passes.
    */
  private[graft] def exclusivePrefix(totals: DataFrame, depth: Int,
      fanout: Long): DataFrame =
    if (depth <= 0) {
      totals.withColumn("pre", coalesce(
        sum(col("tot")).over(Window.orderBy(col("key"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("key"), col("pre"))
    } else {
      val inGroup = totals
        .withColumn("gkey", expr(s"CAST(key AS BIGINT) div $fanout"))
        .withColumn("cum",
          sum(col("tot")).over(Window.partitionBy(col("gkey"))
            .orderBy(col("key"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // group totals ride the window's (gkey)-partitioning — no 2nd shuffle
      val gTotals = inGroup.groupBy(col("gkey"))
        .agg(max(col("cum")).as("tot"))
        .select(col("gkey").as("key"), col("tot"))
      val gPrefix = exclusivePrefix(gTotals, depth - 1, fanout)
        .select(col("key").as("gkey"), col("pre").as("gpre"))
      inGroup.join(broadcast(gPrefix), Seq("gkey"))
        .select(col("key"), (col("gpre") + col("cum") - col("tot")).as("pre"))
    }

  /** Sequence packing (GPT-style concatenate-and-chunk): documents in
    * doc_id order are laid end-to-end on a global token tape; each doc's
    * start offset assigns it to training sequence `start / budget`.
    *
    * The global running sum is the interesting part at 100 TB: a bare
    * `Window.orderBy(doc_id)` is a single-task sort of the whole corpus.
    * Instead this runs a RECURSIVE distributed prefix sum: in-bucket
    * running sums partitioned by `doc_id div bucketWidth` (parallel), then
    * [[exclusivePrefix]] over the one-row-per-bucket totals, which keeps
    * grouping by `fanout` until the top frame fits one task. The recursion
    * depth is STATIC, derived from `maxDocs` (the declared id-space
    * capacity, default 2^42 ≈ 4×10^12 docs — past the 100 TB envelope), so
    * plan construction needs no data inspection; the capacity itself is
    * enforced IN the plan — a doc_id at or above `maxDocs` raises at scan
    * time instead of silently overflowing the top level into an unbounded
    * single-task sort. Determinism: offsets are pure integer arithmetic
    * over (doc_id, n_tokens), so the packing is reproducible regardless of
    * partitioning.
    */
  def seqPacking(spark: SparkSession, d: String, budget: Int = 2048,
      bucketWidth: Long = 1000L, fanout: Long = 1000L,
      maxDocs: Long = 1L << 42): DataFrame =
    seqPackingFor(Tables.documents(spark, d), budget, bucketWidth,
      fanout, maxDocs)

  /** [[seqPacking]] over any (doc_id, text) frame — the composition seam
    * ([[packedLossMask]] packs the PII-planted corpus through it).
    */
  def seqPackingFor(documents: DataFrame, budget: Int = 2048,
      bucketWidth: Long = 1000L, fanout: Long = 1000L,
      maxDocs: Long = 1L << 42): DataFrame = {
    // smallest depth with maxDocs/bucketWidth/fanout^depth ≤ fanout rows at
    // the top: depth ≥ log_fanout(maxBuckets) - 1
    val maxBuckets = math.max(1.0, maxDocs.toDouble / bucketWidth)
    val depth = math.max(0,
      math.ceil(math.log(maxBuckets) / math.log(fanout.toDouble)).toInt - 1)
    // capacity guard fused into the bucket expression (an unreferenced
    // assert column would be pruned away): one codegen'd compare per row
    val guardedId = when(col("doc_id") < maxDocs, col("doc_id"))
      .otherwise(raise_error(concat(
        lit("seqPacking: doc_id "), col("doc_id").cast("string"),
        lit(s" exceeds declared capacity maxDocs=$maxDocs — raise maxDocs"))))
    // no-op isNotNull chain: each level's broadcast-join constraint infers
    // isnotnull(bucket div fanout^k) onto the STREAMED lane's scan only,
    // de-sharing that lane's copy of this subtree (scan+tokenize+shuffle
    // would run once PER LEVEL). Pinning the exact predicates every level
    // will infer here — the nested `(… div fanout)` shape, matching the
    // optimizer's canonical form — keeps all lanes identical so AQE stage
    // reuse scans and tokenizes the corpus once — the pattern established
    // in the dd02/dd06 shared-fingerprint stage.
    val levelKeys = (1 to depth).scanLeft("bucket")((e, _) => s"($e div $fanout)")
    val n = levelKeys.foldLeft(
      documents
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).as("n_tokens"),
          floor(guardedId / bucketWidth).cast("long").as("bucket")))(
      (df, k) => df.filter(expr(k).isNotNull))
    val inBucket = n.withColumn("cum_in",
      sum(col("n_tokens")).over(Window.partitionBy(col("bucket"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // bucket totals ride the window's (bucket)-partitioning — no 2nd shuffle
    val totals = inBucket.groupBy(col("bucket"))
      .agg(max(col("cum_in")).as("tot"))
      .select(col("bucket").as("key"), col("tot"))
    val prefix = exclusivePrefix(totals, depth, fanout)
      .select(col("key").as("bucket"), col("pre").as("bprefix"))
    inBucket.join(broadcast(prefix), Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"),
        (col("bprefix") + col("cum_in") - col("n_tokens")).as("start_offset"))
      .withColumn("seq_id", floor(col("start_offset") / budget).cast("long"))
      .withColumn("pos_in_seq", col("start_offset") % budget)
      .orderBy(col("doc_id"))
  }

  /** tp07 — deterministic epoch shuffle: the global training-order
    * permutation ("shuffle the corpus differently each epoch,
    * reproducibly"). Each document's position for epoch `e` is its rank
    * under `md5("epoch<e>:" || doc_id)` — stable across runs, engines, and
    * re-shards, and a different permutation per epoch.
    *
    * A global rank is the same scale trap as tp03's running sum: a bare
    * `row_number() over (order by h)` is a single-task sort of the corpus.
    * Same cure, reusing [[exclusivePrefix]]: bucket by a hex PREFIX of the
    * order key (so bucket-major order IS hash order), rank in-bucket with
    * a partitioned window, and offset each bucket by the exclusive prefix
    * sum of bucket counts. No level sorts more than a task's worth of
    * rows; the shuffle is (doc_id, 32-byte hash) only.
    *
    * The envelope is DECLARED, not hard-coded (tp03's `maxDocs` device):
    * [[epochShuffleGeometry]] derives the prefix width (bucket count) and
    * recursion depth so expected in-bucket rows and every prefix level
    * stay ≤ `fanout` at the declared corpus size — the default
    * (65536 buckets × fanout 1000 ≈ 6.5×10^7 docs) matches the previous
    * fixed geometry; declaring 10^12 docs widens to 16^8 buckets, depth 3.
    * The OUTPUT is geometry-invariant: the permutation is defined by
    * (h, doc_id) order alone, and any prefix width buckets it
    * order-consistently — so re-declaring capacity never re-shuffles an
    * epoch. Buckets are hash-sliced, so unlike tp03's id-width buckets the
    * per-bucket bound is expected-case (w.h.p.), not absolute — the right
    * trade for an id-space-agnostic permutation.
    */
  def epochShuffle(spark: SparkSession, d: String, epoch: Int = 1,
      maxDocs: Long = 65536L * 1000L, fanout: Long = 1000L): DataFrame = {
    val salt = s"epoch$epoch:"
    val (hexChars, depth) = epochShuffleGeometry(maxDocs, fanout)
    // pre-pin the isnotnull predicates the prefix-lane joins would infer
    // (bucket, and each exclusivePrefix level's nested `div fanout` key) so
    // all references to this subtree stay identical — the tp03
    // shared-stage discipline
    val levelKeys = (1 to depth).scanLeft("bucket")((e, _) => s"($e div $fanout)")
    val ranked = levelKeys.foldLeft(
      Tables.documents(spark, d)
        .select(col("doc_id"),
          md5(concat(lit(salt), col("doc_id").cast("string"))).as("h"))
        .withColumn("bucket",
          conv(substring(col("h"), 1, hexChars), 16, 10).cast("long")))(
      (df, k) => df.filter(expr(k).isNotNull))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))))
    // bucket counts ride the window's (bucket)-partitioning
    val totals = ranked.groupBy(col("bucket")).agg(count(lit(1)).as("tot"))
      .select(col("bucket").as("key"), col("tot"))
    val prefix = exclusivePrefix(totals, depth, fanout)
      .select(col("key").as("bucket"), col("pre"))
    // the prefix table has one row per OCCUPIED bucket: broadcastable for
    // any realistic geometry (16^4 buckets ≈ a few MB) but the declared
    // envelope admits up to 16^8 ≈ 4.3e9 buckets at maxDocs=1e12 — far
    // past any driver broadcast ceiling. Above ~10^7 buckets fall back to
    // a shuffle join on `bucket` (both sides already carry it; AQE picks
    // the strategy for the actual, not declared, bucket count)
    val prefixSide =
      if (math.pow(16.0, hexChars.toDouble) <= 1e7) broadcast(prefix) else prefix
    ranked.join(prefixSide, Seq("bucket"))
      .select(col("doc_id"), lit(epoch).as("epoch"),
        (col("pre") + col("rk") - 1).as("pos"))
      .orderBy(col("doc_id"))
  }

  /** (hex prefix chars, recursion depth) for a declared corpus capacity:
    * buckets = 16^hexChars ≥ maxDocs/fanout (expected in-bucket rows ≤
    * fanout), and depth keeps every [[exclusivePrefix]] level's top frame
    * ≤ fanout rows. Defaults reproduce the original fixed geometry
    * (4 hex chars = 65536 buckets, depth 1).
    */
  private[graft] def epochShuffleGeometry(maxDocs: Long, fanout: Long): (Int, Int) = {
    require(maxDocs > 0 && fanout > 1, s"maxDocs=$maxDocs fanout=$fanout")
    val targetBuckets = math.max(1.0, maxDocs.toDouble / fanout)
    // 12 hex chars = 2^48 buckets — past any addressable corpus
    val hexChars = math.max(1, math.min(12,
      math.ceil(math.log(targetBuckets) / math.log(16.0)).toInt))
    val depth = math.max(1, math.ceil(
      hexChars * math.log(16.0) / math.log(fanout.toDouble)).toInt - 1)
    (hexChars, depth)
  }

  /** tp08 — per-source document cap (the domain-balancing step real
    * pipelines run so no single domain dominates the mix): keep at most
    * `cap` documents per source, chosen by deterministic hash rank so the
    * selection is reproducible and unbiased.
    *
    * `row_number() over (partition by source)` would sort EVERY document
    * of a source in one task — a hot domain at 100 TB is tens of millions
    * of rows. Distributed top-K instead: (1) rank within (source ×
    * 256 hash-prefix sub-buckets) — parallel, and the global top-cap of a
    * source necessarily has ≤ cap members in any sub-bucket, so survivors
    * (≤ 256·cap per source) are a superset of the answer; (2) rank the
    * survivors per source (bounded rows per task now) and take the cap-th
    * (hash, doc_id) pair as the source's admission threshold; (3) one
    * broadcast threshold join back — every document's keep/drop is a
    * single tuple comparison, no global sort anywhere. A source with
    * fewer than cap documents keeps everything (threshold = its max).
    */
  def sourceCap(spark: SparkSession, d: String, cap: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("h"))
    val sub = docs.withColumn("pb",
      conv(substring(col("h"), 1, 2), 16, 10).cast("int"))
    val survivors = sub
      .withColumn("rk1", row_number().over(
        Window.partitionBy(col("source"), col("pb"))
          .orderBy(col("h"), col("doc_id"))))
      .filter(col("rk1") <= cap)
    val thresholds = survivors
      .withColumn("rk2", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rk2") <= cap)
      .groupBy(col("source"))
      .agg(max(struct(col("h"), col("doc_id"))).as("thr"))
    docs.join(broadcast(thresholds), Seq("source"))
      .select(col("doc_id"), col("source"),
        (struct(col("h"), col("doc_id")) <= col("thr")).as("kept"))
      .orderBy(col("doc_id"))
  }

  // ----------------------------------------------------------------- pii

  /** Portable regex dialect (Java here, RE2 oracle-side): no lookaround,
    * no backrefs, ASCII classes only.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phoneRe = "\\b555-\\d{4}\\b"

  /** The shared planted-PII lane (tp04/tp09/tp11): `doc_id % 7 == 0`
    * gains one email + one IPv4 + one phone, each derived from doc_id —
    * one definition so the three operators (and their oracles) cannot
    * drift.
    */
  private[graft] def withPlantedPii(documents: DataFrame): DataFrame = documents
    .select(col("doc_id"),
      when(col("doc_id") % 7 === 0, concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string"),
        lit(" call 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")).as("text"))

  /** PII detection + redaction: per-doc counts of email / IPv4 / phone
    * matches and the fingerprint of the redacted text (email→`<EMAIL>`
    * first, then IP, then phone — order matters and is part of the
    * contract). The synthetic corpus is PII-free, so a planted lane
    * (`doc_id % 7 == 0` gains one of each, derived from doc_id) proves
    * detection AND redaction end-to-end against the oracle re-deriving
    * the same plant. Single-scan column expressions — codegen'd regexes,
    * no shuffle, no UDFs; at 100 TB this is scan-bound.
    */
  def piiScrub(spark: SparkSession, d: String): DataFrame = {
    val planted = withPlantedPii(Tables.documents(spark, d))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")
    planted.select(col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(ipv4Re)).as("n_ipv4"),
      regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
      md5(redacted).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** tp09 — token-level LOSS MASKING: the artifact a trainer consumes to
    * exclude spans from the loss without dropping the document — PII
    * tokens (the tp04 dialect, planted by the same `doc_id % 7` lane) and
    * compliance-blocklisted tokens keep their positions but contribute no
    * gradient. Output is the 1-based masked token index array plus
    * tallies. Pure narrow projection — tokenize once, one lambda filter
    * over the index sequence, no shuffle; at 100 TB this is scan-bound
    * like tp04. CONSUMER WARNING: the `mask_idx` ARRAY is a leaf output —
    * never feed it into a downstream `explode`/join; Catalyst substitutes
    * the whole lambda into an inferred filter where `element_at` re-runs
    * the tokenization per probed element, an O(tokens²) interpreted
    * blowup (measured 16.6 s vs 2.2 s at sf0.1). Compositions use the
    * relational long form instead — see [[packedLossMask]] and the
    * PlanAuditSpec "tp11" guard. (The blocklist here is the
    * two-term fixture list via array_contains; a C4-scale list would go
    * through the txt09 `count_in_static_set` hash-set probe instead.)
    */
  def lossMask(spark: SparkSession, d: String,
      blocklist: Seq[String] = Seq("slow", "dup")): DataFrame = {
    val maskRe = s"($emailRe)|($ipv4Re)|($phoneRe)"
    val blocked = array(blocklist.map(lit): _*)
    // spread BEFORE the per-token regex probes: the interpreted lambda
    // filter is the most compute-heavy per-row projection in the prep
    // family (measured 29 s single-task at sf0.1 on the unsplittable
    // single-row-group fixture vs ~1 s spread across cores); at 100 TB
    // spread is a no-op and the scan splits naturally
    val planted = withPlantedPii(Tables.spread(Tables.documents(spark, d)))
    val masked = planted
      .select(col("doc_id"),
        graft.operators.text.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        when(size(col("t")) > 0, // sequence(1, 0) would count DOWN
          filter(sequence(lit(1), size(col("t"))), i =>
            element_at(col("t"), i).rlike(maskRe) ||
              array_contains(blocked, element_at(col("t"), i))))
          .otherwise(array().cast("array<int>")).as("mask_idx"))
    masked.select(col("doc_id"), col("n_tokens"), col("mask_idx"),
      size(col("mask_idx")).as("n_masked"),
      when(col("n_tokens") > 0,
        size(col("mask_idx")).cast("double") / col("n_tokens"))
        .otherwise(0.0).as("mask_frac"))
      .orderBy(col("doc_id"))
  }

  /** tp09 gated form: identical to [[lossMask]] but the index array is
    * flattened to a comma-joined string. Harness outputs must stay
    * scalar-typed — a pandas-side compare cannot sort an array column —
    * so the gate consumes `mask_csv` while library callers keep the
    * typed `mask_idx` array from [[lossMask]]. Same plan shape (one
    * extra codegen'd `array_join`), still a pure narrow projection.
    */
  def lossMaskGated(spark: SparkSession, d: String): DataFrame =
    lossMask(spark, d)
      .select(col("doc_id"), col("n_tokens"),
        array_join(col("mask_idx"), ",").as("mask_csv"),
        col("n_masked"), col("mask_frac"))
      .orderBy(col("doc_id"))

  /** tp11 — loss masks in PACKED coordinates: the artifact a trainer
    * actually consumes once documents are concatenated into fixed-length
    * sequences — each masked token's position in the GLOBAL token tape
    * (`start_offset + idx − 1`, composing [[seqPackingFor]]'s
    * distributed prefix-sum geometry with [[lossMask]]'s per-doc
    * indexes) and its (sequence, offset) coordinate under the packing
    * budget. A document spanning a sequence boundary lands its masks in
    * BOTH sequences correctly — the case per-doc masks can't express and
    * the reason this composition exists. Long-form one row per masked
    * token: scalar-only, gate-safe, and the shape a masking dataloader
    * joins by (mask_seq_id, mask_pos).
    *
    * Shape at 100 TB: the packing lane is tp03's recursive prefix sum
    * (no single-task window at any level); the mask lane here is the
    * RELATIONAL form — `posexplode` the tokens and filter with a
    * codegen'd `rlike`, NOT [[lossMask]]'s array-lambda form: an array
    * column consumed by a downstream `explode` makes Catalyst infer a
    * non-empty filter and SUBSTITUTE the whole lambda expression into
    * it, where `element_at(tokens(...), i)` re-derives the tokenization
    * per probed element — a measured O(tokens²) interpreted blowup
    * (~15 s at sf0.1 vs ~1 s relational). Long-form masks keep every
    * regex probe inside whole-stage codegen and shuffle (doc_id, int)
    * pairs only; the composition is one id-keyed join.
    */
  def packedLossMask(spark: SparkSession, d: String,
      budget: Int = 2048): DataFrame = {
    val packed = seqPackingFor(withPlantedPii(Tables.documents(spark, d)),
      budget).select(col("doc_id"), col("start_offset"))
    val maskRe = s"($emailRe)|($ipv4Re)|($phoneRe)"
    val masks = withPlantedPii(Tables.spread(Tables.documents(spark, d)))
      .select(col("doc_id"),
        posexplode(graft.operators.text.TextOps.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .filter(col("tok").rlike(maskRe) || col("tok").isin("slow", "dup"))
      .select(col("doc_id"), (col("pos") + 1).as("idx"))
    packed.join(masks, Seq("doc_id"))
      .select(col("doc_id"),
        (col("start_offset") + col("idx") - 1).as("mask_global"))
      .select(col("doc_id"), col("mask_global"),
        expr(s"mask_global div $budget").as("mask_seq_id"),
        (col("mask_global") % budget).as("mask_pos"))
      .orderBy(col("doc_id"), col("mask_global"))
  }

  /** tp10 — BENCHMARK-SET contamination screening: the GPT-3/Llama
    * decontamination rule at corpus scale. Where tp01 screens against a
    * single planted snippet, this screens every training document
    * against the full n-gram SET of a benchmark corpus (here the
    * deterministic `doc_id % benchMod == 0` subset): a document is
    * contaminated when ANY of its positional `k`-grams appears anywhere
    * in the benchmark, and `hit_frac` (contaminated positions over
    * positions) grades the severity — the figure a curation run reports
    * before dropping or masking.
    *
    * Shape at 100 TB: both sides explode positional k-grams as narrow
    * projections (the dd12 device — md5 over the joined window, ids and
    * 128-bit hashes only past the scan); the benchmark gram set is one
    * map-side-combined distinct (benchmarks are small relative to the
    * corpus — MMLU+GSM8K+… is megabytes against terabytes, so the gram
    * relation often BROADCASTS; AQE decides); the screen is one
    * LEFT SEMI equi-join on the gram hash keeping contaminated POSITION
    * rows, then a per-doc count. No window on the gram key, no text
    * rides any exchange.
    */
  def contaminationScreen(spark: SparkSession, d: String, k: Int = 13,
      benchMod: Long = 17L): DataFrame =
    contaminationScreenFor(Tables.documents(spark, d), k, benchMod)

  /** [[contaminationScreen]] over any (doc_id, text) frame — the spec
    * seam.
    */
  def contaminationScreenFor(documents: DataFrame, k: Int = 13,
      benchMod: Long = 17L): DataFrame = {
    val withN = documents
      .select(col("doc_id"),
        graft.operators.text.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"), col("t"))
    def gramsOf(df: DataFrame): DataFrame = df
      .filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("n_tokens") - k),
          i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(k)))))).as("gh"))
    val benchGrams = gramsOf(withN.filter(col("doc_id") % benchMod === 0))
      .select(col("gh")).distinct()
    val corpus = withN.filter(col("doc_id") % benchMod =!= 0)
    val hits = gramsOf(corpus)
      .join(benchGrams, Seq("gh"), "left_semi") // keeps contaminated POSITIONS
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    corpus.select(col("doc_id"), col("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") >= k, col("n_tokens") - (k - 1))
          .otherwise(lit(0)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        when(col("n_tokens") >= k,
          coalesce(col("n_hit"), lit(0L)).cast("double") /
            (col("n_tokens") - (k - 1)))
          .otherwise(lit(0.0)).as("hit_frac"),
        (coalesce(col("n_hit"), lit(0L)) > 0L).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** tp14 — BLOOM decontamination screen: the broadcast-bitset form of
    * tp10. The semi-join screen ships every corpus gram hash into a
    * join; at 100 TB the cheaper shape is a Bloom filter built ONCE over
    * the benchmark gram set and broadcast as a literal bitmask — each
    * corpus gram then tests two bits locally at scan speed, no exchange
    * at all on the screening side. This operator runs BOTH screens and
    * emits them side by side, so the filter's false-positive behavior is
    * part of the gated relation: `n_bloom_hits >= n_exact_hits` always
    * (no false negatives, the Bloom guarantee), and the overshoot is the
    * measured FP mass a curation run uses to size `mBits` before
    * trusting the cheap screen alone.
    *
    * Bits are DETERMINISTIC: positions are the two 60-bit md5-prefix
    * halves of the gram hash mod `mBits`, so the DuckDB oracle
    * re-derives membership as `h1 IN set AND h2 IN set` — the identical
    * relation to the engine's bit tests. The driver-side filter build
    * collects DISTINCT set positions: bounded by `mBits` ints (8 KiB of
    * filter at the default), NOT by benchmark size.
    *
    * Scale shape: gram hashing is the tp10 narrow projection; the only
    * exchange left is the exact-screen comparison lane (drop it in
    * production once FP rate is accepted, and the whole screen is
    * shuffle-free); the filter rides codegen as an array literal.
    */
  def bloomScreen(spark: SparkSession, d: String, k: Int = 13,
      benchMod: Long = 17L, mBits: Int = 65536): DataFrame =
    bloomScreenFor(Tables.documents(spark, d), k, benchMod, mBits)

  /** Positional k-gram hashes of a (doc_id, n_tokens, t) frame (pipe06
    * reuses it with page keys in the doc_id column).
    */
  private[graft] def pageGrams(df: DataFrame, k: Int): DataFrame = df
    .filter(col("n_tokens") >= k)
    .select(col("doc_id"),
      explode(transform(sequence(lit(0), col("n_tokens") - k),
        i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(k)))))).as("gh"))

  /** Bloom position from an md5-half of the gram hash (`gh` column). */
  private def bloomPos(start: Int, mBits: Int): Column =
    pmod(conv(substring(col("gh"), start, 15), 16, 10).cast("long"),
      lit(mBits.toLong))

  /** Build the Bloom bitmask over a gram-hash frame. Driver memory is
    * bounded by `mBits` DISTINCT positions, not the gram count.
    */
  private[graft] def bloomBitsOf(grams: DataFrame, mBits: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must pack into longs: $mBits")
    val words = new Array[Long](mBits / 64)
    grams.select(explode(array(bloomPos(1, mBits), bloomPos(17, mBits))).as("p"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p / 64) |= 1L << (p % 64)
      }
    words
  }

  /** Per-gram Bloom membership of a gram-hash frame against `words` —
    * two local bit tests, no exchange.
    */
  private[graft] def bloomTested(grams: DataFrame, words: Array[Long],
      mBits: Int): DataFrame = grams
    .select(col("doc_id"), col("gh"),
      bloomPos(1, mBits).as("h1"), bloomPos(17, mBits).as("h2"))
    .withColumn("bloom_bits", typedlit(words.toSeq))
    .withColumn("bloom_hit", expr(
      """((element_at(bloom_bits, CAST(h1 div 64 AS INT) + 1)
          & shiftleft(1L, CAST(h1 % 64 AS INT))) <> 0L)
         AND ((element_at(bloom_bits, CAST(h2 div 64 AS INT) + 1)
          & shiftleft(1L, CAST(h2 % 64 AS INT))) <> 0L)"""))

  /** [[bloomScreen]] over any (doc_id, text) frame — the spec seam. */
  def bloomScreenFor(documents: DataFrame, k: Int = 13, benchMod: Long = 17L,
      mBits: Int = 65536): DataFrame = {
    val withN = documents
      .select(col("doc_id"),
        graft.operators.text.TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"), col("t"))
    val benchGrams = pageGrams(withN.filter(col("doc_id") % benchMod === 0), k)
      .select(col("gh")).distinct()
    val words = bloomBitsOf(benchGrams, mBits)
    val corpus = withN.filter(col("doc_id") % benchMod =!= 0)
    val tested = bloomTested(pageGrams(corpus, k), words, mBits)
    val counted = tested
      .join(benchGrams.withColumn("ex", lit(1)), Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("bloom_hit").cast("long")).as("n_bloom"),
        sum(coalesce(col("ex"), lit(0)).cast("long")).as("n_exact"))
    corpus.select(col("doc_id"), col("n_tokens"))
      .join(counted, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") >= k, col("n_tokens") - (k - 1))
          .otherwise(lit(0)).as("n_grams"),
        coalesce(col("n_bloom"), lit(0L)).as("n_bloom_hits"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact_hits"),
        (coalesce(col("n_bloom"), lit(0L)) > 0L).as("flagged_bloom"),
        (coalesce(col("n_exact"), lit(0L)) > 0L).as("flagged_exact"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------- mixture

  /** Budget-constrained domain mixture resampling: given target mixture
    * shares per source (here ∝ k+1 for srcK — deliberately non-uniform)
    * and a global document budget (`budgetFrac` of the corpus), compute
    * each source's sampling rate `min(1, share·budget/n_src)` and accept
    * documents by deterministic hash — the standard way a training mix
    * ("give me 60% of the corpus at these domain weights") is materialized
    * reproducibly. Sources whose target exceeds their supply clamp to
    * keep-everything (src19 here), underweighted ones thin out.
    *
    * Scale shape: source counts are one map-side-combined groupBy (one row
    * per source out of each partition); the rate table is tiny by nature
    * (#domains) → broadcast back; acceptance is a per-row hash compare.
    * One shuffle of counts, zero shuffles of documents. The rate doubles
    * come from integer counts through a fixed expression order, then round
    * to an integer threshold in [0, 65536) — engine-portable.
    */
  def mixtureSample(spark: SparkSession, d: String,
      budgetFrac: Double = 0.6,
      shares: Map[String, Double] = Map.empty): DataFrame = {
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    // the caller's domain-weight table, as a broadcast map literal; the
    // default (empty) falls back to the fixture formula share(srcK) ∝ k+1,
    // which the DuckDB oracle re-derives. Sources absent from a supplied
    // map get share 0 — "not in the mix" — rather than null-poisoned rates.
    val shareCol =
      if (shares.isEmpty)
        (expr("CAST(substring(source, 4) AS INT)") + 1).cast("double") / lit(210.0)
      else coalesce(element_at(typedLit(shares), col("source")), lit(0.0))
    val rates = counts
      .crossJoin(broadcast(counts.agg(sum(col("n_src")).as("n_total"))))
      .withColumn("share", shareCol)
      .withColumn("rate", least(lit(1.0),
        col("share") * floor(col("n_total") * lit(budgetFrac)) / col("n_src")))
      .withColumn("thresh", floor(col("rate") * lit(65536.0)).cast("long"))
      .select(col("source"), col("thresh"))
    docs
      .withColumn("v", hashBucket16("mix:", col("doc_id")))
      .join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"), col("v"), col("thresh"),
        (col("v") < col("thresh")).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** tp16 — the TOKEN-BUDGET mixture plan (the DoReMi/Chinchilla-style
    * data-budget table a training run is sized from): per source, its
    * measured token mass, its target share of the budget, the allocated
    * tokens, the sampling rate (≤ 1) or repetition factor (> 1 epoch —
    * upsampling a small high-weight source), and the repeated-token count.
    * tp06 samples documents BY COUNT at a fixed fraction; this plans BY
    * TOKENS against explicit shares — the number that actually sizes a
    * run. Budget = the corpus's own total mass (one epoch-equivalent), so
    * over-weighted sources provably repeat and under-weighted ones
    * provably downsample, both visible in the gated relation.
    *
    * All arithmetic is integral with 63-bit-safe split multiplication
    * (the KMV guard): shares in ppm, rates/epochs in permille — exact up
    * to ~9.2e15 tokens per source (≈ 36 PB of text), documented bound.
    *
    * Scale shape: one narrow scan → one map-side-combined groupBy(source)
    * → a one-row broadcast total — nothing wide ever shuffles.
    */
  def budgetPlan(spark: SparkSession, d: String): DataFrame = {
    val masses = Tables.spread(Tables.documents(spark, d)
        .select(col("source"), col("text")).filter(col("text").isNotNull))
      .select(col("source"),
        size(graft.operators.text.TextOps.tokens(col("text"))).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("token_mass"))
    val total = masses.agg(sum(col("token_mass")).as("budget"))
    masses.crossJoin(broadcast(total))
      // the fixture share formula (srcK → (k+1)/210), ppm-exact
      .withColumn("share_ppm",
        expr("((CAST(substring(source, 4) AS BIGINT) + 1) * 1000000) div 210"))
      // alloc = budget · share, split-multiplied so no 63-bit overflow
      .withColumn("alloc_tokens", expr(
        """(budget div 1000000) * share_ppm
           + ((budget % 1000000) * share_ppm) div 1000000"""))
      .withColumn("rate_permille", expr(
        """CASE WHEN alloc_tokens >= token_mass THEN 1000
                ELSE (alloc_tokens * 1000) div token_mass END"""))
      .withColumn("epochs_permille", expr(
        """(alloc_tokens div token_mass) * 1000
           + ((alloc_tokens % token_mass) * 1000) div token_mass"""))
      .withColumn("repeat_tokens",
        greatest(lit(0L), col("alloc_tokens") - col("token_mass")))
      .orderBy(col("source"))
  }

  // --------------------------------------------------------------- quant

  /** Int8 scalar quantization of the embedding column (the standard ANN
    * index compression): per-vector scale `amax/127`, `q_i = round(x_i /
    * scale)`. Emits integer invariants (dim, scaled amax, Σq, max|q|,
    * saturation count) — integers from a fixed double expression order, so
    * the values are engine-portable where a raw double column would be
    * partition-order-hostage. Pure projection: no shuffle; 4× memory
    * reduction is the point at 100 TB (the quantized corpus rides the
    * same IVF/LSH candidate paths as `operators/ann`).
    *
    * Zero vectors (amax == 0) quantize to all-zeros rather than NaN-ing
    * the division — the never-throw discipline of the cast layer.
    */
  /** The int8 symmetric quantizer — per-vector max-abs scale, round to
    * [-127, 127] INTs — as ONE shared expression pair over a staged
    * `v: array<double>` column: the tp05 integrity lane ([[embedQuant]])
    * and the SQ8 search lane (`Ann.sq8Codes`) both quantize through
    * these, so their bit-parity is structural, not copy-paste.
    */
  private[graft] def sq8AmaxExpr: Column =
    expr("array_max(transform(v, x -> abs(x)))")

  private[graft] def sq8QuantExpr: Column = expr(
    """CASE WHEN amax > 0
      |THEN transform(v, x -> CAST(round(x / (amax / CAST(127 AS DOUBLE))) AS INT))
      |ELSE transform(v, x -> 0) END""".stripMargin)

  def embedQuant(spark: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding")))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("amax", sq8AmaxExpr)
      .withColumn("q", sq8QuantExpr)
      .select(col("vec_id"),
        size(col("q")).as("dim"),
        expr("CAST(round(amax * CAST(100000000 AS DOUBLE)) AS BIGINT)").as("amax_e8"),
        expr("CAST(aggregate(q, 0L, (a, x) -> a + CAST(x AS BIGINT)) AS BIGINT)").as("sum_q"),
        expr("array_max(transform(q, x -> abs(x)))").as("max_abs_q"),
        expr("size(filter(q, x -> abs(x) = 127))").as("n_sat"))
      .orderBy(col("vec_id"))

  // ---------------------------------------------------------------- dsir

  /** Hashed n-gram features for DSIR-style importance weighting (Xie et
    * al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): unigrams + bigrams of the whitespace tokens, each
    * hashed into a 65536-bucket space by the first 4 hex digits of its
    * md5 — the hashing trick, engine-portable so the DuckDB oracle can
    * re-derive every bucket.
    */
  private def dsirGrams(documents: DataFrame): DataFrame =
    documents
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), col("lang"),
        explode(concat(col("t"),
          when(size(col("t")) >= 2,
            transform(sequence(lit(1), size(col("t")) - 1),
              i => concat(element_at(col("t"), i), lit(" "),
                element_at(col("t"), i + 1))))
            .otherwise(array().cast("array<string>")))).as("gram"))
      .select(col("doc_id"), col("lang"),
        conv(substring(md5(col("gram")), 1, 4), 16, 10)
          .cast("long").as("bucket"))

  /** DSIR importance scoring, integral gating form (tp12): fit two
    * bag-of-hashed-ngrams models — a TARGET model from the `lang = 'en'`
    * slice and a RAW model from the whole corpus — then score every
    * document by its pooled occurrence mass under each. The gated
    * verdict is the cross-multiplied integer comparison
    * `t_mass·R > r_mass·T` (i.e. the document's per-gram target-hit
    * rate exceeds its raw-hit rate relative to the corpus totals), an
    * exact-integer proxy for the sign of the likelihood-ratio weight
    * that stays hash-comparable across engines; the float log-ratio
    * weight itself (what production resampling ranks by) is
    * [[dsirLogWeights]].
    *
    * Scale shape: gram explosion is one scan; both model fits are
    * bucket-keyed counts (≤ 65536 rows, map-side combined) that come
    * back as BROADCAST joins; the per-doc masses are one map-side-
    * combined groupBy(doc_id). No all-pairs, no global sort — the
    * selection rule is per-document against broadcast corpus totals, so
    * the 100 TB corpus never re-shuffles its text.
    */
  def dsirScores(spark: SparkSession, d: String): DataFrame =
    dsirScoresFor(Tables.spread(
      Tables.documents(spark, d).select(col("doc_id"), col("lang"), col("text"))))

  /** [[dsirScores]] over any (doc_id, lang, text) frame — the spec seam.
    * Target slice = `lang = 'en'`.
    */
  def dsirScoresFor(documents: DataFrame): DataFrame = {
    val g = dsirGrams(documents)
    val ct = g.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    val cr = g.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    val tot = ct.agg(coalesce(sum(col("c_t")), lit(0L)).as("tt"))
      .crossJoin(cr.agg(coalesce(sum(col("c_r")), lit(0L)).as("rt")))
    g.join(broadcast(ct), Seq("bucket"), "left")
      .join(broadcast(cr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("c_t"), lit(0L))).as("t_mass"),
        sum(col("c_r")).as("r_mass"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("n_grams"), col("t_mass"), col("r_mass"),
        (col("t_mass") * col("rt") - col("r_mass") * col("tt")).as("score_num"),
        (col("t_mass") * col("rt") - col("r_mass") * col("tt") > 0L).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** The production DSIR weight: per-document log likelihood ratio
    * `Σ_g log p̂(b(g)) − log q̂(b(g))` under Laplace-smoothed hashed-ngram
    * models (target p̂ from `targetPred` docs, raw q̂ from all docs) —
    * what importance resampling ranks by. Float output (not gated: sum
    * order perturbs last ulps); the integral tp12 verdict agrees with
    * this weight's SIGN wherever both masses are bucket-collision-free,
    * and DsirSpec pins the ranking on a planted vocabulary skew.
    */
  /** tp13 — CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020): rank
    * the corpus by language-model fluency and split it into head /
    * middle / tail thirds — the standard "keep the fluent third, drop
    * the garbled tail" curation gate. The LM signal is txt17's pooled
    * bigram conditional estimate (`Σc₂/Σc₁` ∈ [0,1], higher = more
    * fluent = lower perplexity); since c₂(w1,w2) ≤ c₁(w1) per bigram,
    * the pooled ratio is bounded and maps onto a FIXED INTEGER GRID.
    *
    * The tercile cutoffs come from a distributed HISTOGRAM, not a global
    * per-doc sort (the scale decision): each doc's score lands in one of
    * `grid` cells (one narrow projection), the per-cell counts are a
    * map-side-combined groupBy whose output is ≤ `grid` rows, and the
    * cutoff cells fall out of one running sum over that bounded table
    * (the single-partition window is over ≤ 65 536 rows — independent of
    * corpus size). Docs then bucket by comparing their cell against the
    * two broadcast cutoffs. Buckets are exact to cell granularity —
    * the same contract a KLL/t-digest quantile gives, but fully
    * deterministic: cutoff-cell docs go to the HIGHER bucket, so both
    * engines agree doc by doc. CCNet itself thresholds on quantiles
    * computed offline once; this is that computation, kept in-plan.
    */
  def perplexityBuckets(spark: SparkSession, d: String,
      grid: Int = 65536): DataFrame = {
    val scores = TextOps.bigramFamiliarity(spark, d)
      .select(col("doc_id"), col("n_bigrams"), col("cond_familiarity"))
      .withColumn("gcell",
        least(floor(col("cond_familiarity") * grid).cast("long"),
          lit(grid - 1L)))
    val cells = scores.groupBy(col("gcell")).agg(count(lit(1)).as("cnt"))
    // running doc count from the MOST fluent cell down; ≤ grid rows, so
    // the unpartitioned window is bounded and corpus-size independent
    val cum = cells.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("gcell").desc)))
      .crossJoin(broadcast(cells.agg(sum(col("cnt")).as("n"))))
    // head = cells down to where the running count first reaches N/3;
    // middle down to 2N/3. Cutoffs are the LARGEST cells satisfying
    // cum ≥ target (the first reached walking down); `3·cum ≥ N` is the
    // integer cross-multiplied form of `cum ≥ ⌈N/3⌉` — no division
    val cuts = broadcast(cum.agg(
      max(when(col("cum") * 3L >= col("n"), col("gcell"))).as("h_cut"),
      max(when(col("cum") * 3L >= col("n") * 2L, col("gcell"))).as("m_cut")))
    scores.crossJoin(cuts)
      .select(col("doc_id"), col("n_bigrams"), col("cond_familiarity"),
        col("gcell"),
        when(col("gcell") >= col("h_cut"), "head")
          .when(col("gcell") >= col("m_cut"), "middle")
          .otherwise("tail").as("ppl_bucket"))
      .withColumn("kept", col("ppl_bucket") =!= "tail")
      .orderBy(col("doc_id"))
  }

  def dsirLogWeights(documents: DataFrame, targetPred: Column,
      alpha: Double = 1.0, buckets: Int = 65536): DataFrame = {
    val g = dsirGrams(documents.withColumn("lang",
      when(targetPred, lit("en")).otherwise(lit("__raw"))))
    val ct = g.filter(col("lang") === "en")
      .groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    val cr = g.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    val tot = ct.agg(coalesce(sum(col("c_t")), lit(0L)).as("tt"))
      .crossJoin(cr.agg(coalesce(sum(col("c_r")), lit(0L)).as("rt")))
    g.join(broadcast(ct), Seq("bucket"), "left")
      .join(broadcast(cr), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("lw",
        log((coalesce(col("c_t"), lit(0L)) + lit(alpha)) /
            (col("tt") + lit(alpha * buckets))) -
        log((col("c_r") + lit(alpha)) /
            (col("rt") + lit(alpha * buckets))))
      .groupBy(col("doc_id"))
      .agg(sum(col("lw")).as("log_weight"), count(lit(1)).as("n_grams"))
  }

  /** tp15 — LENGTH-BUCKETED batching efficiency (the "group by length"
    * curriculum every trainer applies before padding): documents batch
    * with similar-length peers, each batch pads to its own bucket
    * ceiling instead of the global max, and this operator reports the
    * padding the bucketing saves — the quantity that decides bucket
    * geometry BEFORE an expensive packing run. Per bucket of
    * `granularity` tokens: document count, real token mass, padded mass
    * at the bucket ceiling (n_docs · ceiling), padded mass under naive
    * global-max padding, and the saved fraction in integral ppm.
    *
    * All-integer arithmetic (ceilings via `((n-1) div g + 1) * g`, ppm
    * via 63-bit cross-multiplication), so the relation is cross-engine
    * exact. Docs longer than `seqLen` truncate to it first — the
    * trainer's own behavior.
    *
    * Scale shape: one narrow scan projects (doc → n_tokens), one
    * map-side-combined groupBy on ≤ seqLen/granularity bucket keys, and
    * the global-max side is a one-row broadcast — nothing wide ever
    * shuffles.
    */
  def lengthBuckets(spark: SparkSession, d: String, seqLen: Int = 2048,
      granularity: Int = 64): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, d)
        .select(col("doc_id"), col("text")).filter(col("text").isNotNull))
      .select(least(size(TextOps.tokens(col("text"))).cast("long"),
        lit(seqLen.toLong)).as("n"))
      .filter(col("n") > 0)
    val bucketed = toks.withColumn("ceiling",
      expr(s"((n - 1) div $granularity + 1) * $granularity"))
    val g = bucketed.groupBy(col("ceiling"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("token_mass"))
      .withColumn("padded_mass", col("n_docs") * col("ceiling"))
    val globalCeil = bucketed.agg(max(col("ceiling")).as("global_ceiling"))
    g.crossJoin(broadcast(globalCeil))
      .select(col("ceiling"), col("n_docs"), col("token_mass"),
        col("padded_mass"),
        (col("n_docs") * col("global_ceiling")).as("naive_mass"),
        expr("""((n_docs * global_ceiling - padded_mass) * 1000000L)
                div (n_docs * global_ceiling)""").as("saved_ppm"))
      .orderBy(col("ceiling"))
  }
}
