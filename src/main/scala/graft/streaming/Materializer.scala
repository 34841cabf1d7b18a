package graft.streaming

import graft.sources.cdc.WalSegments
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Current-state table maintenance from the change stream — the MERGE
  * INTO every CDC consumer ultimately wants (reference README.md:14-16
  * lists "keep state in sync" as the first walex use case; the reference
  * stops at dispatching events and leaves the apply job to the handler).
  * `Materializer` is that apply job as a Spark-first primitive: a
  * bucketed parquet store of the LATEST row per key, maintained
  * incrementally by `foreachBatch` over the typed change stream.
  *
  * Design for 100 TB:
  *  - **Bucket pruning.** State lives in `spec.buckets` hash buckets of
  *    the record key. A micro-batch only reads and rewrites the buckets
  *    its keys fall in — the apply cost scales with the CHANGE RATE, not
  *    the table size. (Size buckets so one bucket ≈ an executor-friendly
  *    rewrite unit: a 100 TB table at 64 Ki buckets is ~1.5 GB/bucket.)
  *  - **One shuffle per batch.** The merge is
  *    `groupBy(key).agg(max_by(row, seq))` over (affected state ∪ batch)
  *    — ids and the packed row ride a single exchange; no window, no
  *    sort, no driver-side state. The only driver materialization is the
  *    affected-bucket ID LIST (≤ `spec.buckets` ints — metadata, not
  *    data).
  *  - **Atomic multi-bucket commit, no data renames.** New bucket
  *    versions are written DIRECTLY at their final immutable paths
  *    (`leaf=b<bucket>-v<version>/`); the swap is one EXCLUSIVE publish
  *    of the next immutable manifest version
  *    ([[WalSegments.publishExclusive]]: atomic hard-link claim on local
  *    POSIX, rename-to-existing on HDFS, PUT-if-absent on object
  *    stores). Readers resolve the manifest
  *    first, so they see every batch entirely or not at all — snapshot
  *    isolation over plain parquet, and NOT just at plan time: superseded
  *    leaves are retained for the full [[RetainedManifests]]-version
  *    grace window (the Iceberg vacuum rule), so a scan planned against
  *    any retained manifest finds its files even while the applier keeps
  *    committing. A crash before the swap leaves only unreferenced leaf
  *    directories, swept once no retained manifest names them.
  *  - **Idempotent redelivery.** `foreachBatch` after a restart may
  *    replay a committed batch (Spark's offset-log contract). The merge
  *    is a pure max-by-seq: re-applying any prefix of already-applied
  *    changes reproduces the same state, so at-least-once delivery gives
  *    exactly-once state. DELETES ARE TOMBSTONES — the row is kept with
  *    its op so a replayed older change can never resurrect a deleted
  *    record; [[currentState]] filters them, [[compact]] drops those the
  *    whole pipeline has moved past.
  *
  * Single-writer contract — ENFORCED, not documented: the store fences
  * appliers the way the reference's durable replication slot fences a
  * second walsender (`lib/walex/replication/server.ex:86-143` — takeover
  * invalidates the old connection, which finds out on its next write).
  * [[acquire]] stamps the manifest with a writer token (epoch + random
  * fence id); every fenced commit re-checks the token and every manifest
  * swap is an EXCLUSIVE CREATE of an immutable version-numbered file
  * (`_state_manifest-v<N>`), so two appliers racing the same version can
  * never both win — the loser's [[FencedWriterException]] is the storage
  * analogue of the slot's "replication slot is active for PID" error. A
  * fenced-out applier's already-written leaves are unreferenced residue,
  * swept by the winner's next apply; no committed bucket is ever lost.
  * Readers are unlimited and resolve the highest committed manifest.
  */
object Materializer {

  /** Thrown when a commit loses the fence: another applier [[acquire]]d
    * the store (epoch moved), or won the exclusive create of this
    * manifest version. The loser must stop — its next state read would
    * be a torn view of someone else's store.
    */
  final class FencedWriterException(msg: String)
    extends IllegalStateException(msg)

  /** A writer's fence: `epoch` is strictly monotone per acquisition,
    * `id` disambiguates two acquisitions racing to the same epoch.
    */
  final case class WriterToken(epoch: Long, id: String)

  /** Shape of the change rows being applied.
    *
    * @param keyCols   record identity (e.g. table_name, record_id)
    * @param seqCol    total order of changes per key (seq / LSN): the
    *                  highest wins
    * @param opCol     operation column; rows where it equals `deleteOp`
    *                  are tombstones
    * @param buckets   hash-bucket count — fixed for the life of the state
    *                  directory (changing it re-keys every row; use
    *                  [[rebucket]])
    */
  final case class Spec(
      keyCols: Seq[String],
      seqCol: String = "seq",
      opCol: String = "op",
      deleteOp: String = "delete",
      buckets: Int = 64) {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(buckets > 0, "buckets must be positive")
  }

  /** Deterministic bucket of a row's key: xxhash64 over the key columns,
    * non-negative mod `buckets`. Stable across Spark versions for a fixed
    * seed (42, the xxhash64 default).
    */
  def bucketCol(spec: Spec): Column =
    pmod(xxhash64(spec.keyCols.map(col): _*), lit(spec.buckets.toLong))

  /** Latest row per key (max seq), all non-key columns packed through one
    * map-side-combined `max_by` — the merge primitive shared by batch
    * reduction and state merge. Column order is preserved.
    */
  def reduceLatest(df: DataFrame, spec: Spec): DataFrame = {
    val others = df.columns.filterNot(spec.keyCols.contains).toSeq
    df.groupBy(spec.keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col(spec.seqCol)).as("_s"))
      .select(spec.keyCols.map(col) ++ others.map(c => col(s"_s.$c").as(c)): _*)
  }

  // ---- manifest: the store's single source of truth ----
  // JSON {"version":N,"writerEpoch":E,"writerId":"…",
  //       "buckets":{"5":"leaf=b00005-v00012", ...}} — leaf directory
  // names are immutable and version-suffixed, and so is the manifest
  // itself (`_state_manifest-v<N>`): a commit is an exclusive create of
  // the next version, readers resolve the highest one. The legacy single
  // `_state_manifest` file is still read (pre-fence stores) and retired
  // on the first versioned commit.

  /** @param truncates TRUNCATE watermarks: first-key-column value → seq.
    *                   A row whose first key equals the entry's key and
    *                   whose seq is ≤ the watermark is DEAD — filtered at
    *                   read, physically dropped at the next [[compact]].
    *                   Riding the manifest makes truncation snapshot-
    *                   isolated and time-travelable like any commit.
    */
  final case class Manifest(version: Long, leaves: Map[Int, String],
      writerEpoch: Long = 0L, writerId: String = "", nbuckets: Int = 0,
      truncates: Map[String, Long] = Map.empty,
      retain: Int = 0)

  private def legacyManifestPath(stateDir: String): Path =
    new Path(stateDir, "_state_manifest")

  private def manifestFile(v: Long): String = f"_state_manifest-v$v%08d"

  private val ManifestVRe = "_state_manifest-v(\\d+)".r

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def parseManifest(text: String): Manifest = {
    def num(key: String) = s""""$key"\\s*:\\s*(\\d+)""".r
      .findFirstMatchIn(text).map(_.group(1).toLong)
    val leaves = "\"(\\d+)\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(text)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    val truncates = """"truncates"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(text).map(_.group(1)) match {
      case Some(body) => """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toLong).toMap
      case None => Map.empty[String, Long]
    }
    Manifest(num("version").getOrElse(0L), leaves,
      num("writerEpoch").getOrElse(0L),
      """"writerId"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(text)
        .map(_.group(1)).getOrElse(""),
      num("nbuckets").getOrElse(0L).toInt,
      truncates,
      num("retain").getOrElse(0L).toInt)
  }

  def readManifest(stateDir: String,
      conf: Configuration = WalSegments.localConf): Manifest = {
    val (fs, root) = WalSegments.fsFor(stateDir, conf)
    val versioned =
      try fs.listStatus(root).iterator
        .map(_.getPath.getName)
        .collect { case n @ ManifestVRe(v) => (v.toLong, n) }
        .maxByOption(_._1)
      catch { case _: java.io.FileNotFoundException => None }
    versioned match {
      case Some((_, name)) =>
        parseManifest(readFully(fs, new Path(stateDir, name)))
      case None =>
        val legacy = legacyManifestPath(stateDir)
        if (fs.exists(legacy)) parseManifest(readFully(fs, legacy))
        else Manifest(0L, Map.empty)
    }
  }

  /** The RETAINED manifest at `version`, or None once retired past the
    * grace window — the state store's [[graft.operators.store
    * .IndexManifest.readMetaAt]]: snapshot metadata (bucket dial,
    * truncate watermarks, retention) resolves from the SNAPSHOT, not
    * the head (a `graft_state_at` read across an intervening
    * [[rebucket]] must plan with the pinned version's dial).
    */
  private[graft] def readManifestAt(stateDir: String, version: Long,
      conf: Configuration = WalSegments.localConf): Option[Manifest] = {
    val (fs, _) = WalSegments.fsFor(stateDir, conf)
    try Some(parseManifest(
      readFully(fs, new Path(stateDir, manifestFile(version)))))
    catch { case _: java.io.IOException => None }
  }

  /** The manifest versions currently on disk, ascending — what
    * [[readManifestAt]]/[[currentStateAt]] can reach (the state store's
    * time-travel catalog; the IndexManifest `retainedVersions` move).
    */
  def retainedVersions(stateDir: String,
      conf: Configuration = WalSegments.localConf): Seq[Long] = {
    val (fs, root) = WalSegments.fsFor(stateDir, conf)
    try fs.listStatus(root).iterator.map(_.getPath.getName)
      .collect { case ManifestVRe(v) => v.toLong }.toSeq.sorted
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** How many manifest versions stay on disk after a commit. This is the
    * store's READ GRACE WINDOW, for manifests and leaves alike: a reader
    * that planned its scan against any retained manifest finds every leaf
    * that manifest references ([[sweepUnreferenced]] only deletes leaves
    * no retained manifest names — the Iceberg/Delta vacuum rule, "a data
    * file is live while any retained snapshot references it"). A query
    * must finish within `RetainedManifests` commits of when it planned;
    * at a typical replica cadence of one commit per multi-second
    * micro-batch that is tens of seconds to minutes of scan time.
    */
  private[graft] val RetainedManifests = 8

  /** The store's dialed read-grace window: the manifest's `retain` field
    * (published by [[setRetention]]), defaulting to [[RetainedManifests]]
    * — pre-dial manifests parse with it 0 and keep the default. The
    * IndexManifest `retain`-param rule applied to the state store: a
    * replica committing per micro-batch burns a version per batch, so
    * its time-travel reach in WALL time is `retain x commit cadence`.
    */
  private[graft] def retentionOf(m: Manifest): Int =
    if (m.retain >= 1) m.retain else RetainedManifests

  /** Commit a manifest version: write a uniquely-named temp file, then
    * publish it EXCLUSIVELY at the immutable `_state_manifest-v<N>`
    * ([[WalSegments.publishExclusive]]: atomic hard-link claim on local
    * POSIX — where a bare rename would silently overwrite a racer's
    * manifest — rename-to-existing on HDFS, PUT-if-absent on object
    * stores). Of two appliers racing the same version exactly one wins;
    * the loser throws [[FencedWriterException]] having published nothing.
    * Manifest versions older than [[RetainedManifests]], and the legacy
    * single-file manifest, are retired best-effort — readers only ever
    * resolve the max, and leaf retention follows the retained set.
    */
  private[graft] def commitManifest(fs: FileSystem, stateDir: String,
      m: Manifest): Unit = {
    val dest = new Path(stateDir, manifestFile(m.version))
    val tmp = new Path(stateDir,
      s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try {
      val entries = m.leaves.toSeq.sortBy(_._1)
        .map { case (b, d) => s""""$b":"$d"""" }.mkString(",")
      val truncs = m.truncates.toSeq.sorted
        .map { case (k, s) => s""""$k":$s""" }.mkString(",")
      out.write((s"""{"version":${m.version},""" +
        s""""writerEpoch":${m.writerEpoch},"writerId":"${m.writerId}",""" +
        s""""nbuckets":${m.nbuckets},"retain":${m.retain},""" +
        s""""truncates":{$truncs},""" +
        s""""buckets":{$entries}}""").getBytes("UTF-8"))
    } finally out.close()
    if (!WalSegments.publishExclusive(fs, tmp, dest))
      throw new FencedWriterException(
        s"lost manifest commit race for version ${m.version} at $stateDir")
    // retire superseded manifests (keep the store's dialed grace window)
    try {
      val window = retentionOf(m)
      fs.listStatus(new Path(stateDir)).foreach { st =>
        st.getPath.getName match {
          case ManifestVRe(v) if v.toLong < m.version - window =>
            try fs.delete(st.getPath, false)
            catch { case _: java.io.IOException => () }
          case _ => ()
        }
      }
      val legacy = legacyManifestPath(stateDir)
      if (fs.exists(legacy)) fs.delete(legacy, false)
    } catch { case _: java.io.IOException => () }
  }

  /** Dial the store's retention window — a metadata-only commit
    * publishing `retain` into the manifest, which every LATER commit's
    * retirement honors (and the leaf sweep follows for free: it keeps
    * whatever any on-disk manifest references). The state-store form of
    * [[graft.operators.store.IndexManifest.setRetention]]; dialing down
    * takes effect on the next commit's retirement, and already-retired
    * versions never come back. Respects the writer fence exactly like
    * [[applyBatch]]: pass the applier's token on an acquired store (the
    * commit is a version bump, so an un-fenced racer loses the exclusive
    * publish at worst).
    */
  def setRetention(stateDir: String, retain: Int,
      token: Option[WriterToken] = None,
      conf: Configuration = WalSegments.localConf): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val (fs, _) = WalSegments.fsFor(stateDir, conf)
    val m = readManifest(stateDir, conf)
    if (m.version == 0L) throw new IllegalStateException(
      s"$stateDir holds no materialized state — dial retention on a " +
        "committed store")
    checkFence(m, token, stateDir)
    commitManifest(fs, stateDir, m.copy(version = m.version + 1,
      retain = retain))
  }

  /** Acquire the store: bump the writer epoch and commit a manifest
    * carrying this applier's fence — the slot-takeover move. Any applier
    * holding an older token fails fast on its next commit ([[applyBatch]]
    * checks the fence before doing work AND the exclusive manifest create
    * backstops the read-check-commit window). Call once per applier
    * lifetime; [[sink]] does it automatically on its first batch.
    */
  def acquire(stateDir: String,
      conf: Configuration = WalSegments.localConf): WriterToken = {
    val (fs, root) = WalSegments.fsFor(stateDir, conf)
    fs.mkdirs(root)
    var tries = 0
    while (true) {
      val m = readManifest(stateDir, conf)
      val token = WriterToken(m.writerEpoch + 1,
        java.util.UUID.randomUUID().toString)
      try {
        commitManifest(fs, stateDir, m.copy(version = m.version + 1,
          writerEpoch = token.epoch, writerId = token.id))
        return token
      } catch {
        case e: FencedWriterException =>
          tries += 1
          if (tries >= 5) throw e // livelock guard: someone else is churning
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fail fast when `token` no longer owns the store (or, for token-less
    * legacy callers, when anyone has fenced it).
    */
  private def checkFence(manifest: Manifest, token: Option[WriterToken],
      stateDir: String): Unit = token match {
    case Some(t) =>
      if (manifest.writerEpoch != t.epoch || manifest.writerId != t.id)
        throw new FencedWriterException(
          s"writer fenced at $stateDir: holding epoch ${t.epoch} but " +
            s"store is at epoch ${manifest.writerEpoch} " +
            s"(another applier acquired it)")
    case None =>
      if (manifest.writerEpoch > 0L)
        throw new FencedWriterException(
          s"$stateDir is fenced (epoch ${manifest.writerEpoch}); " +
            "unfenced writes are refused — Materializer.acquire() a token")
  }

  private def leafName(bucket: Int, version: Long): String =
    f"leaf-b$bucket%05d-v$version%08d"

  /** Fail fast when the caller's Spec disagrees with the bucket count the
    * store was created (or last [[rebucket]]ed) with: a mismatched
    * applier would hash every key into the WRONG bucket — reading buckets
    * that don't hold the key, writing merged rows where no later reader
    * of that key looks — and silently fork the state. The manifest
    * records the count (`nbuckets`; 0 on legacy stores, adopted from the
    * first post-upgrade commit's Spec).
    */
  private def checkBuckets(manifest: Manifest, spec: Spec,
      stateDir: String): Unit =
    if (manifest.nbuckets > 0 && manifest.nbuckets != spec.buckets)
      throw new IllegalStateException(
        s"$stateDir is bucketed at ${manifest.nbuckets} but the Spec says " +
          s"${spec.buckets} — a mismatched applier scatters keys across " +
          "wrong buckets; use the store's count, or rebucket() offline")

  /** The union of leaf directories referenced by EVERY manifest version
    * still on disk (the [[RetainedManifests]] window plus the legacy
    * single-file manifest). This — not the current manifest alone — is
    * the live set for the sweep: a reader plans its scan against the
    * manifest it read, and the applier may commit several more versions
    * before the reader's tasks open those files; retaining every leaf any
    * retained manifest references gives in-flight readers the same grace
    * window the manifests themselves get. A manifest that fails to read
    * mid-sweep contributes nothing (fail-open would retain garbage
    * forever; the next sweep retries).
    */
  private[graft] def retainedLeafRefs(fs: FileSystem,
      stateDir: String): Set[String] = {
    try {
      val root = new Path(stateDir)
      val versioned = fs.listStatus(root).iterator
        .map(_.getPath.getName)
        .collect { case n @ ManifestVRe(_) => n }
        .toSeq
      val refs = Set.newBuilder[String]
      versioned.foreach { n =>
        try refs ++= parseManifest(readFully(fs, new Path(stateDir, n)))
          .leaves.values
        catch { case _: java.io.IOException => () }
      }
      val legacy = legacyManifestPath(stateDir)
      if (fs.exists(legacy))
        try refs ++= parseManifest(readFully(fs, legacy)).leaves.values
        catch { case _: java.io.IOException => () }
      refs.result()
    } catch { case _: java.io.FileNotFoundException => Set.empty }
  }

  /** Delete every `leaf-…` directory NO retained manifest references —
    * residue of crashes before a manifest swap (new leaves never
    * committed) and superseded leaves whose last referencing manifest has
    * been retired past the [[RetainedManifests]] window. Superseded
    * leaves still named by a retained manifest are NOT residue: an
    * in-flight reader that planned against that manifest is entitled to
    * open them (snapshot isolation with a grace window, not just at plan
    * time). Safe under the single-writer contract.
    */
  private def sweepUnreferenced(fs: FileSystem, stateDir: String): Unit = {
    val referenced = retainedLeafRefs(fs, stateDir)
    try {
      fs.listStatus(new Path(stateDir)).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("leaf-") && !referenced.contains(n))
          try fs.delete(st.getPath, true)
          catch { case _: java.io.IOException => () }
      }
    } catch { case _: java.io.FileNotFoundException => () }
  }

  /** Apply one micro-batch of change rows to the state directory.
    *
    * Steps: reduce the batch to its latest row per key → list affected
    * buckets (driver-side bucket IDs only) → merge those buckets' current
    * leaves with the batch in ONE `max_by` shuffle → write new leaf
    * versions at their final paths → swap the manifest. Unaffected
    * buckets are not read, not written, and keep their manifest entries.
    */
  def applyBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      spec: Spec, conf: Configuration = WalSegments.localConf,
      token: Option[WriterToken] = None): Unit = {
    // no up-front isEmpty probe: that is one extra Spark job per
    // micro-batch on every apply path (guide §1.2) — the affected-bucket
    // collect below already materializes the batch once, and an empty
    // batch collects zero buckets and returns before any write or
    // manifest commit. INTENDED semantic change vs the probe era: the
    // fence and bucket-spec checks now run even for an empty batch (a
    // fenced-out writer fails fast instead of silently no-opping — it
    // should learn it lost the token on its next call, not on its next
    // non-empty batch), and applying to a nonexistent dir creates it.
    val (fs, root) = WalSegments.fsFor(stateDir, conf)
    fs.mkdirs(root)
    val manifest = readManifest(stateDir, conf)
    checkFence(manifest, token, stateDir)
    checkBuckets(manifest, spec, stateDir)
    val nextVersion = manifest.version + 1

    val batchLatest = reduceLatest(batch, spec)
      .withColumn("_gbucket", bucketCol(spec))
      .persist() // two consumers: the bucket list and the merge
    try {
      val affected = batchLatest.select("_gbucket").distinct()
        .collect().map(_.getLong(0).toInt).sorted // ≤ spec.buckets ints: metadata
      if (affected.isEmpty) return // empty batch: nothing to merge or commit
      val existingPaths = affected.flatMap { b =>
        manifest.leaves.get(b).map(d => s"$stateDir/$d")
      }
      // leaf files do not store the partition/bucket columns — re-derive.
      // mergeSchema + allowMissingColumns make the store SCHEMA-EVOLVING:
      // a batch carrying new columns widens the state (old rows read
      // null); a batch missing columns the state has leaves them null on
      // its rows — mid-stream ADD COLUMN flows through without a rebuild
      val existing =
        if (existingPaths.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true")
          .parquet(existingPaths.toIndexedSeq: _*)
          .withColumn("_gbucket", bucketCol(spec)))
      val unioned = existing.fold(batchLatest)(
        _.unionByName(batchLatest, allowMissingColumns = true))
      val merged = reduceLatest(unioned, spec)
        .withColumn("_leaf",
          concat(lit("b"), lpad(col("_gbucket").cast("string"), 5, "0"),
            lit(f"-v$nextVersion%08d")))
        .drop("_gbucket")
      // one job writes every affected bucket's new version; Spark names
      // the partition dirs `_leaf=<value>` (values avoid '=' so no
      // escaping), then each is published to its manifest name with one
      // FS rename of a just-written dir — atomic on POSIX/HDFS; on object
      // stores a copy of ONLY this batch's new files, never the table
      merged.write.mode("append").partitionBy("_leaf").parquet(stateDir)
      affected.foreach { b =>
        val written = new Path(stateDir, s"_leaf=${leafName(b, nextVersion).stripPrefix("leaf-")}")
        val dest = new Path(stateDir, leafName(b, nextVersion))
        if (fs.exists(written) && !fs.rename(written, dest))
          throw new java.io.IOException(s"could not publish $written to $dest")
      }
      val newLeaves = manifest.leaves ++
        affected.map(b => b -> leafName(b, nextVersion)).toMap
      // THE commit: exclusive create of version N+1 — a concurrent
      // acquire or apply that got there first makes this throw, and the
      // leaves written above become unreferenced residue for the
      // winner's sweep (no committed bucket is ever lost)
      commitManifest(fs, stateDir, Manifest(nextVersion, newLeaves,
        manifest.writerEpoch, manifest.writerId, spec.buckets,
        manifest.truncates, manifest.retain))
      // superseded leaves are NOT deleted here: a reader that planned its
      // scan against the just-superseded manifest may still open them.
      // The post-commit sweep (after this commit retired manifests past
      // the RetainedManifests window) collects only leaves NO retained
      // manifest references — crash residue and long-superseded versions.
      sweepUnreferenced(fs, stateDir)
    } finally batchLatest.unpersist()
  }

  /** The store's current rows — tombstones filtered (pass
    * `keepTombstones = true` for the raw merge state, e.g. to audit
    * delete retention). A manifest read pins the snapshot: concurrent
    * applies never tear this view.
    */
  /** Test-visible census of full-state READ PLANS built
    * ([[currentState]] + [[deletedRecords]] calls) — the
    * one-scan contract of `Graft.syncAllIndexes` is asserted against
    * it: the fleet facade must build exactly one of each, where four
    * individual facades build four.
    */
  private[graft] val stateReads = new java.util.concurrent.atomic.AtomicLong

  def currentState(spark: SparkSession, stateDir: String, spec: Spec,
      keepTombstones: Boolean = false,
      conf: Configuration = WalSegments.localConf): DataFrame = {
    stateReads.incrementAndGet()
    val manifest = readManifest(stateDir, conf)
    if (manifest.leaves.isEmpty)
      throw new IllegalStateException(
        if (manifest.version == 0L)
          s"$stateDir holds no materialized state (no manifest)"
        else
          s"$stateDir state is EMPTY at version ${manifest.version} " +
            "(every record deleted and compacted; schema is gone with the rows)")
    stateOf(spark, stateDir, spec, manifest, keepTombstones)
  }

  /** The store's rows AS OF manifest `version` — TIME TRAVEL over the
    * retention window. Retention keeps every manifest (and every leaf a
    * retained manifest references) for [[RetainedManifests]] commits, so
    * any still-on-disk version reads as a complete, consistent snapshot:
    * "what did the replica say N commits ago" costs one manifest read.
    * Versions retired past the window throw — use a longer-horizon
    * history mechanism (the SCD2 lane) for audits beyond the grace
    * window.
    */
  def currentStateAt(spark: SparkSession, stateDir: String, spec: Spec,
      version: Long, keepTombstones: Boolean = false,
      conf: Configuration = WalSegments.localConf): DataFrame = {
    val (fs, _) = WalSegments.fsFor(stateDir, conf)
    val p = new Path(stateDir, manifestFile(version))
    val manifest =
      try parseManifest(readFully(fs, p))
      catch {
        case _: java.io.IOException =>
          val head = readManifest(stateDir, conf)
          throw new IllegalArgumentException(
            s"$stateDir has no retained manifest v$version — retained " +
              s"window is (${math.max(1, head.version - retentionOf(head))}" +
              s"..${head.version}]; older snapshots are retired")
      }
    stateOf(spark, stateDir, spec, manifest, keepTombstones)
  }

  /** Rows dead under the manifest's TRUNCATE watermarks: first key column
    * matches an entry and seq is at or below its watermark. `lit(false)`
    * when no table was ever truncated — folds away entirely. Watermark
    * keys round-trip through the JSON manifest as STRINGS, so the key
    * column is compared as a string EXPLICITLY — with a bare `===` Spark
    * would insert an implicit cast on a non-string key column and could
    * silently match or miss rows (e.g. `1` vs `"1"` vs `"01"`).
    */
  private def truncatedPredicate(manifest: Manifest, spec: Spec): Column =
    manifest.truncates.foldLeft(lit(false)) { case (acc, (k, wm)) =>
      acc || (col(spec.keyCols.head).cast("string") === lit(k) &&
        col(spec.seqCol) <= wm)
    }

  private def stateOf(spark: SparkSession, stateDir: String, spec: Spec,
      manifest: Manifest, keepTombstones: Boolean): DataFrame = {
    val paths = manifest.leaves.values.map(d => s"$stateDir/$d").toIndexedSeq
    // mergeSchema: buckets last rewritten before a schema widening still
    // read into the union schema (their missing columns as null)
    val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
    if (keepTombstones) df
    else df.filter(col(spec.opCol) =!= spec.deleteOp &&
      !truncatedPredicate(manifest, spec))
  }

  /** Apply a TRUNCATE: every row of `key` (the first key column's value —
    * the table, in the CDC shape) whose seq is at or below `upToSeq` dies.
    * This is a METADATA-ONLY commit — one watermark entry in the next
    * manifest version, no leaf read or written, O(1) at any table size
    * (the reference delivers TruncatedRelation events the same way:
    * reference lib/walex/changes.ex TruncatedRelation — no per-row
    * tombstones exist to replay). Readers planned against earlier
    * manifests still see the rows (snapshot isolation); time travel to a
    * pre-truncate version shows the table as it was; the next [[compact]]
    * drops dead rows physically. Rows arriving AFTER the watermark
    * (seq > upToSeq) live — exactly Postgres semantics, where nothing can
    * touch a truncated row's identity except a fresh insert later in WAL
    * order. Re-applying (foreachBatch replay) is idempotent: watermarks
    * only ratchet up. The first key column should be string-typed (the
    * CDC table_name shape) — the watermark matches it by string equality.
    * Truncate rows arriving IN a change stream (op == "truncate") are
    * handled by [[sink]] automatically.
    */
  def applyTruncate(stateDir: String, key: String, upToSeq: Long, spec: Spec,
      conf: Configuration = WalSegments.localConf,
      token: Option[WriterToken] = None): Unit = {
    val (fs, root) = WalSegments.fsFor(stateDir, conf)
    fs.mkdirs(root)
    val manifest = readManifest(stateDir, conf)
    checkFence(manifest, token, stateDir)
    checkBuckets(manifest, spec, stateDir)
    val wm = math.max(upToSeq,
      manifest.truncates.getOrElse(key, Long.MinValue))
    // an unchanged watermark commits NOTHING: a replayed truncate must
    // not burn the RetainedManifests time-travel window on no-op versions
    if (manifest.truncates.get(key).contains(wm)) return
    commitManifest(fs, stateDir, manifest.copy(
      version = manifest.version + 1,
      truncates = manifest.truncates + (key -> wm)))
  }

  /** The store's DELETE FEED — the key rows a replica-synced downstream
    * artifact (dedup index, vector index, corpus manifest) must retire:
    * retained per-row tombstones (latest change is a delete) PLUS rows
    * dead under TRUNCATE watermarks, which carry their original op and
    * would otherwise be invisible to an op == delete filter.
    */
  def deletedRecords(spark: SparkSession, stateDir: String, spec: Spec,
      conf: Configuration = WalSegments.localConf): DataFrame = {
    stateReads.incrementAndGet()
    val manifest = readManifest(stateDir, conf)
    if (manifest.leaves.isEmpty)
      throw new IllegalStateException(s"$stateDir holds no materialized state")
    val raw = stateOf(spark, stateDir, spec, manifest, keepTombstones = true)
    raw.filter(col(spec.opCol) === spec.deleteOp ||
        truncatedPredicate(manifest, spec))
      .select(spec.keyCols.map(col): _*).distinct()
  }

  /** Drop tombstones whose seq is at or below `floor` — call with the
    * slowest consumer's committed position (the same figure the WAL
    * source's ackPath carries) once no replay can reach below it — and
    * rows dead under TRUNCATE watermarks (expirable at ANY floor: the
    * watermark rides every future manifest, so a replayed old batch's
    * resurrected rows die at read regardless). Rewrites only buckets that
    * actually hold expirable rows.
    */
  def compact(spark: SparkSession, stateDir: String, spec: Spec, floor: Long,
      conf: Configuration = WalSegments.localConf,
      token: Option[WriterToken] = None): Unit = {
    val (fs, _) = WalSegments.fsFor(stateDir, conf)
    val manifest = readManifest(stateDir, conf)
    checkFence(manifest, token, stateDir)
    checkBuckets(manifest, spec, stateDir)
    if (manifest.leaves.isEmpty) return
    val nextVersion = manifest.version + 1
    val all = spark.read.option("mergeSchema", "true")
      .parquet(manifest.leaves.values.map(d => s"$stateDir/$d").toIndexedSeq: _*)
      .withColumn("_gbucket", bucketCol(spec))
    val expired = (col(spec.opCol) === spec.deleteOp &&
      col(spec.seqCol) <= floor) || truncatedPredicate(manifest, spec)
    // ONE aggregation finds the buckets holding expirable tombstones (a
    // per-leaf probe loop would be O(buckets) driver-side jobs — the
    // compaction scan is inherently full-table, but it must be one job)
    val expirable = all.filter(expired).select("_gbucket").distinct()
      .collect().map(_.getLong(0).toInt).sorted // bucket IDs: metadata
    if (expirable.isEmpty) return
    val expirableSet = expirable.toSet
    // ONE write job rewrites exactly those buckets without tombstones
    all.filter(col("_gbucket").isin(expirable.map(Integer.valueOf): _*) && !expired)
      .withColumn("_leaf",
        concat(lit("b"), lpad(col("_gbucket").cast("string"), 5, "0"),
          lit(f"-v$nextVersion%08d")))
      .drop("_gbucket")
      .write.mode("append").partitionBy("_leaf").parquet(stateDir)
    // a bucket whose rows were ALL expirable tombstones writes no dir —
    // it simply leaves the manifest (an absent entry IS the empty bucket)
    val rewritten = expirable.filter { b =>
      val written = new Path(stateDir,
        s"_leaf=${leafName(b, nextVersion).stripPrefix("leaf-")}")
      fs.exists(written) && {
        val dest = new Path(stateDir, leafName(b, nextVersion))
        if (!fs.rename(written, dest))
          throw new java.io.IOException(s"could not publish $written to $dest")
        true
      }
    }
    val newLeaves = (manifest.leaves -- expirableSet) ++
      rewritten.map(b => b -> leafName(b, nextVersion)).toMap
    commitManifest(fs, stateDir, Manifest(nextVersion, newLeaves,
      manifest.writerEpoch, manifest.writerId, spec.buckets,
      manifest.truncates, manifest.retain))
    // compacted-away leaves keep the same reader grace window as apply:
    // the sweep only collects leaves no retained manifest references
    sweepUnreferenced(fs, stateDir)
  }

  /** Re-key the WHOLE store into `newBuckets` hash buckets — the one
    * maintenance operation that cannot be incremental, because changing
    * the count moves every row's bucket. One full-table read → one
    * shuffle on the new bucket key → an all-new leaf set at the next
    * version → one manifest swap; fenced like any write, and
    * snapshot-isolated like any commit (readers planned against retained
    * manifests keep the old-bucket leaves until the grace window retires
    * them). Run it OFFLINE like an Iceberg rewrite — cost is one read +
    * one write of the table. Afterwards every applier must use the new
    * count: the manifest records it and [[applyBatch]]/[[compact]] refuse
    * a mismatched Spec.
    */
  def rebucket(spark: SparkSession, stateDir: String, spec: Spec,
      newBuckets: Int, conf: Configuration = WalSegments.localConf,
      token: Option[WriterToken] = None): Unit = {
    require(newBuckets > 0, "newBuckets must be positive")
    val (fs, _) = WalSegments.fsFor(stateDir, conf)
    val manifest = readManifest(stateDir, conf)
    checkFence(manifest, token, stateDir)
    checkBuckets(manifest, spec, stateDir)
    val newSpec = spec.copy(buckets = newBuckets)
    val nextVersion = manifest.version + 1
    if (manifest.leaves.nonEmpty) {
      spark.read.option("mergeSchema", "true")
        .parquet(manifest.leaves.values.map(d => s"$stateDir/$d").toIndexedSeq: _*)
        .withColumn("_gbucket", bucketCol(newSpec))
        .withColumn("_leaf",
          concat(lit("b"), lpad(col("_gbucket").cast("string"), 5, "0"),
            lit(f"-v$nextVersion%08d")))
        .drop("_gbucket")
        .write.mode("append").partitionBy("_leaf").parquet(stateDir)
    }
    // publish every just-written dir (one listing, not a per-bucket probe)
    val suffix = f"-v$nextVersion%08d"
    val newLeaves = fs.listStatus(new Path(stateDir)).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith("_leaf=b") && n.endsWith(suffix))
      .map { n =>
        val leafN = "leaf-" + n.stripPrefix("_leaf=")
        val dest = new Path(stateDir, leafN)
        if (!fs.rename(new Path(stateDir, n), dest))
          throw new java.io.IOException(s"could not publish $n to $dest")
        n.stripPrefix("_leaf=b").take(5).toInt -> leafN
      }.toMap
    commitManifest(fs, stateDir, Manifest(nextVersion, newLeaves,
      manifest.writerEpoch, manifest.writerId, newBuckets,
      manifest.truncates, manifest.retain))
    sweepUnreferenced(fs, stateDir)
  }

  /** `foreachBatch` adapter: attach the materializer to any typed change
    * stream —
    * {{{
    * stream.writeStream.foreachBatch(Materializer.sink(stateDir, spec)).start()
    * }}}
    */
  def sink(stateDir: String, spec: Spec): (DataFrame, Long) => Unit =
    sink(stateDir, spec, compactEvery = 0, floorProvider = () => None)

  /** `foreachBatch` adapter with an in-stream retention cadence: every
    * `compactEvery` batches (0 = never) the sink [[compact]]s tombstones
    * at or below `floorProvider()`'s floor — the applier is the ONLY
    * party that can compact a live store (it holds the fence), so wiring
    * the cadence here is what keeps a long-running replica's directory
    * bounded without stopping the stream. The floor comes from the same
    * consumer-ack file the WAL source's retention uses
    * ([[graft.streaming.Graft.materialize]] wires it).
    */
  def sink(stateDir: String, spec: Spec, compactEvery: Int,
      floorProvider: () => Option[Long]): (DataFrame, Long) => Unit = {
    // acquire lazily on the first batch: the stream that owns this sink
    // owns the store, and a restarted driver's new sink fences the old
    // one out (the zombie's next applyBatch throws FencedWriterException)
    var token: Option[WriterToken] = None
    var applied = 0L
    (batch: DataFrame, _: Long) => {
      if (token.isEmpty) token = Some(acquire(stateDir))
      // TRUNCATE rows arriving IN the stream (op == "truncate"): the row
      // set applies first, then watermarks ratchet to each truncate's seq.
      // Order within the batch is irrelevant by the watermark rule — a
      // same-batch row at seq ≤ the truncate dies at read no matter when
      // its leaf was written, and a row after it (seq > watermark) lives.
      // One tiny aggregate per batch; zero cost when no truncate arrived.
      val truncOp = "truncate"
      val truncs = batch.filter(col(spec.opCol) === truncOp)
        .groupBy(col(spec.keyCols.head))
        .agg(max(col(spec.seqCol)).as("_wm"))
        .collect() // ≤ one row per truncated table: metadata, not data
      applyBatch(batch.sparkSession, stateDir,
        batch.filter(col(spec.opCol) =!= truncOp), spec, token = token)
      truncs.foreach { r =>
        applyTruncate(stateDir, String.valueOf(r.get(0)),
          r.getLong(1), spec, token = token)
      }
      applied += 1
      if (compactEvery > 0 && applied % compactEvery == 0)
        floorProvider().foreach(f =>
          compact(batch.sparkSession, stateDir, spec, f, token = token))
    }
  }
}
