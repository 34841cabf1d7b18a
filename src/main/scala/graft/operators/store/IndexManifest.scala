package graft.operators.store

import graft.sources.cdc.WalSegments
import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned-manifest discipline for the partitioned immutable-leaf
  * INDEX stores (the dedup band/set index, the multimodal hash and
  * chunk indexes) — the same snapshot-isolation-with-grace-window
  * contract the [[graft.streaming.Materializer]] state store and the
  * [[graft.operators.ann.PqIndex]] already enforce, factored out so
  * every persisted store in the repo shares ONE rule set:
  *
  *  - **The manifest is the store's single source of truth.** A tiny
  *    immutable JSON file `_idx_manifest-v<N>` lists the live leaf
  *    names per relation plus the store's hash-group count; readers
  *    resolve the highest committed version and restrict their scans
  *    to its leaves (`leaf` is a partition column, so the restriction
  *    is a `PartitionFilters` prune, and uncommitted crash residue is
  *    invisible even before any sweep).
  *  - **Commits are exclusive.** A commit writes a uniquely-named temp
  *    file and publishes it at the immutable versioned name via
  *    [[WalSegments.publishExclusive]] (atomic hard-link claim on local
  *    POSIX, rename-to-existing on HDFS, PUT-if-absent on object
  *    stores): of two writers racing a version exactly one wins, the
  *    loser throws having published nothing and its just-written leaf
  *    is unreferenced residue.
  *  - **Leaves are version-named.** A leaf's partition value is
  *    `v<version>-<tag>` where `tag` is the caller's idempotency tag
  *    (foreachBatch batch id, compaction tag): the version prefix
  *    gives the sweep its safety rule, the tag suffix gives replays
  *    their no-op check — exact tag equality, never substring.
  *  - **Retention is the read grace window.** [[RetainedManifests]]
  *    manifest versions stay on disk after a commit, and
  *    [[sweep]] deletes ONLY leaf directories that (a) no retained
  *    manifest references and (b) carry a version at or below the
  *    current committed one (an unreferenced HIGHER version may belong
  *    to a writer mid-commit). A reader that planned its scan against
  *    any retained manifest therefore finds every file it needs while
  *    commits — including COMPACTIONS — keep landing: this is what
  *    makes index compaction online-safe instead of offline-only.
  *
  * Legacy stores (written before this module) have no manifest:
  * [[readMeta]] returns None and callers fall back to scanning every
  * on-disk leaf — the pre-manifest semantics, preserved for read
  * compatibility. The FIRST manifest commit on such a store must
  * enroll the existing leaves via [[legacyLeaves]]: after the commit,
  * readers restrict to committed leaves, so an un-enrolled first
  * commit would silently hide the whole pre-upgrade corpus.
  */
object IndexManifest {

  /** The committed state of one index store.
    *
    * @param version monotone commit counter
    * @param groups  hash-range partition count the store was built with
    *                — recorded so appends and screens can refuse a
    *                mismatched dial (the Materializer's nbuckets rule:
    *                a mismatched writer scatters keys across wrong
    *                groups and silently forks the store)
    * @param leaves  live data-leaf names (`v<version>-<tag>`), shared
    *                by every data relation of the store (relations are
    *                written together under one tag per commit)
    * @param tombs   live tombstone-leaf names (separate lifecycle:
    *                compaction RETAINS them as the replay guard;
    *                a retention floor clears them)
    * @param params  store-specific build parameters beyond the group
    *                dial (the PqIndex geometry: m/ksub/dim/residual and
    *                the artifact directory names) — opaque strings the
    *                owning module interprets; manifests written before
    *                the field parse with it empty
    */
  final case class Meta(version: Long, groups: Int,
      leaves: Seq[String], tombs: Seq[String],
      params: Map[String, String] = Map.empty) {
    def hasLeafTag(tag: String): Boolean = leaves.exists(tagOf(_) == tag)
    def hasTombTag(tag: String): Boolean = tombs.exists(tagOf(_) == tag)
  }

  private val ManifestVRe = "_idx_manifest-v(\\d+)".r

  private def manifestFile(v: Long): String = f"_idx_manifest-v$v%08d"

  /** `v<version>-<tag>`: version-prefixed for the sweep's safety rule,
    * tag-suffixed for replay idempotency.
    */
  def leafName(version: Long, tag: String): String = f"v$version%08d-$tag"

  /** The tag back out of a leaf name — structural, not positional:
    * `f"v$version%08d"` WIDENS past 1e8 versions instead of truncating,
    * so a fixed `drop(10)` would return garbage there; and a legacy
    * (pre-manifest) leaf enrolled by [[legacyLeaves]] has no version
    * prefix at all, so its name IS its tag.
    */
  def tagOf(leaf: String): String = leaf.replaceFirst("^v\\d+-", "")

  private val LeafVRe = "v(\\d+)-.*".r

  private def versionOf(leaf: String): Option[Long] = leaf match {
    case LeafVRe(v) => Some(v.toLong)
    case _          => None
  }

  /** Default manifest versions retained after a commit — the read grace
    * window for manifests and leaves alike (the Materializer/PqIndex
    * figure). Per store, the `retain` manifest param OVERRIDES this
    * ([[retentionOf]] / [[setRetention]] — the Delta/Iceberg
    * per-table-retention move): a crawl loop committing per micro-batch
    * burns a version per batch, so its time-travel reach in WALL time is
    * `retain × commit cadence` — a store whose audit cadence is nightly
    * but whose commit cadence is minutes must dial `retain` up or its
    * reproducibility window is minutes, not days.
    */
  private[graft] val RetainedManifests = 8

  /** The store's dialed read-grace window: the `retain` manifest param,
    * defaulting to [[RetainedManifests]] (legacy manifests have no
    * params at all and parse with the map empty — same default).
    */
  def retentionOf(meta: Meta): Int =
    meta.params.get("retain").flatMap(_.toIntOption)
      .filter(_ >= 1).getOrElse(RetainedManifests)

  /** The dialed window of a store by directory — what an out-of-window
    * time-travel error should quote.
    */
  def retentionWindow(indexDir: String): Int =
    readMeta(indexDir).map(retentionOf).getOrElse(RetainedManifests)

  /** Dial the store's retention window — a metadata-only commit (no
    * leaves change) publishing `retain` into the manifest params, which
    * every LATER commit's retirement honors ([[commit]]) and the sweep
    * follows for free (it keeps whatever any on-disk manifest
    * references). Dialing DOWN takes effect on the next data commit's
    * retirement; already-retired versions never come back — reach can
    * only shrink to what is still on disk.
    */
  def setRetention(indexDir: String, retain: Int): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val meta = readMeta(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed manifest — dial retention on a " +
        "committed store"))
    commit(indexDir, meta.copy(version = meta.version + 1,
      params = meta.params + ("retain" -> retain.toString)))
  }

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

  private def parseMeta(text: String): Meta = {
    def num(k: String) = s""""$k"\\s*:\\s*(\\d+)""".r
      .findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
    def list(k: String): Seq[String] =
      s""""$k"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(text)
        .map(_.group(1)).toSeq
        .flatMap("\"([^\"]+)\"".r.findAllMatchIn(_).map(_.group(1)))
    val params = """"params"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(text)
      .map(_.group(1)).toSeq
      .flatMap(""""([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(_)
        .map(mm => mm.group(1) -> mm.group(2))).toMap
    Meta(num("version"), num("groups").toInt, list("leaves"), list("tombs"),
      params)
  }

  /** The highest committed manifest, or None on a legacy (pre-manifest)
    * or empty store.
    */
  def readMeta(indexDir: String): Option[Meta] = {
    val (fs, root) = WalSegments.fsFor(indexDir)
    val name =
      try fs.listStatus(root).iterator.map(_.getPath.getName)
        .collect { case n @ ManifestVRe(v) => (v.toLong, n) }
        .maxByOption(_._1).map(_._2)
      catch { case _: java.io.FileNotFoundException => None }
    name.map(n => parseMeta(readFully(fs, new Path(indexDir, n))))
  }

  /** A SPECIFIC retained manifest version — the index stores' TIME
    * TRAVEL (the Materializer `currentStateAt` device): any reader can
    * re-run a screen/search against the exact snapshot a past commit
    * published, because retained manifests keep their leaves on disk
    * ([[sweep]]'s rule). None when the version was never committed or
    * has left the [[RetainedManifests]] grace window — time travel
    * reaches exactly as far as retention does, never silently further.
    */
  def readMetaAt(indexDir: String, version: Long): Option[Meta] = {
    val (fs, _) = WalSegments.fsFor(indexDir)
    val p = new Path(indexDir, manifestFile(version))
    try {
      if (fs.exists(p)) Some(parseMeta(readFully(fs, p))) else None
    } catch { case _: java.io.IOException => None }
  }

  /** The manifest versions currently on disk, ascending — what
    * [[readMetaAt]] can reach (the time-travel catalog; Delta's
    * DESCRIBE HISTORY move). At most the store's dialed window + 1
    * entries ([[retentionOf]]).
    */
  def retainedVersions(indexDir: String): Seq[Long] = {
    val (fs, root) = WalSegments.fsFor(indexDir)
    try fs.listStatus(root).iterator.map(_.getPath.getName)
      .collect { case ManifestVRe(v) => v.toLong }.toSeq.sorted
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** Commit `meta` as the next manifest version: exclusive publish (one
    * winner per version — the loser throws having published nothing),
    * then retire manifests past the grace window.
    */
  def commit(indexDir: String, meta: Meta): Unit = {
    val (fs, root) = WalSegments.fsFor(indexDir)
    fs.mkdirs(root)
    val dest = new Path(indexDir, manifestFile(meta.version))
    val tmp = new Path(indexDir,
      s".${dest.getName}.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try {
      def arr(xs: Seq[String]) = xs.map(l => s""""$l"""").mkString(",")
      val params = meta.params.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
      out.write((s"""{"version":${meta.version},"groups":${meta.groups},""" +
        s""""leaves":[${arr(meta.leaves)}],""" +
        s""""tombs":[${arr(meta.tombs)}],""" +
        s""""params":{$params}}""").getBytes("UTF-8"))
    } finally out.close()
    if (!WalSegments.publishExclusive(fs, tmp, dest))
      throw new IllegalStateException(
        s"lost index-manifest commit race for version ${meta.version} at " +
          s"$indexDir — another writer won; re-read and retry")
    try {
      val window = retentionOf(meta) // the store's dialed grace window
      fs.listStatus(root).foreach { st =>
        st.getPath.getName match {
          case ManifestVRe(v) if v.toLong < meta.version - window =>
            try fs.delete(st.getPath, false)
            catch { case _: java.io.IOException => () }
          case _ => ()
        }
      }
    } catch { case _: java.io.IOException => () }
  }

  /** Union of every leaf/tomb name referenced by ANY manifest version
    * still on disk — the live set for [[sweep]]. A manifest that fails
    * to read contributes nothing (fail-open would retain garbage
    * forever; the next sweep retries).
    */
  private[graft] def retainedRefs(indexDir: String): Set[String] = {
    val (fs, root) = WalSegments.fsFor(indexDir)
    try {
      fs.listStatus(root).iterator.map(_.getPath.getName)
        .collect { case n @ ManifestVRe(_) => n }.toSeq
        .flatMap { n =>
          try {
            val m = parseMeta(readFully(fs, new Path(indexDir, n)))
            m.leaves ++ m.tombs
          } catch { case _: java.io.IOException => Seq.empty }
        }.toSet
    } catch { case _: java.io.FileNotFoundException => Set.empty }
  }

  /** Partition values of PRE-MANIFEST leaf directories (no `v<N>-`
    * prefix) under the given relations — the legacy store's data. The
    * FIRST manifest commit on a directory that already holds such
    * leaves MUST enroll them ([[Meta.leaves]] / [[Meta.tombs]]):
    * committed readers restrict their scans to the manifest's leaf
    * list, so an empty first commit would silently hide every
    * pre-upgrade row (worst case: a first delete commits `leaves=[]`
    * and the whole index reads as empty). Enrolling is retention-safe
    * — [[sweep]] never touches a version-less leaf. Handles both
    * nested (`rel/<grp>=g/leaf=…`) and flat (`rel/leaf=…`) layouts.
    */
  def legacyLeaves(indexDir: String, rels: Seq[String]): Seq[String] = {
    val (fs, _) = WalSegments.fsFor(indexDir)
    rels.flatMap { rel =>
      def glob(pattern: String): Seq[Path] =
        try Option(fs.globStatus(new Path(s"$indexDir/$rel/$pattern")))
          .toSeq.flatten.filter(_.isDirectory).map(_.getPath)
        catch { case _: java.io.IOException => Seq.empty }
      (glob("*/leaf=*") ++ glob("leaf=*"))
        .map(_.getName.stripPrefix("leaf="))
    }.distinct.filter(l => versionOf(l).isEmpty).sorted
  }

  /** Delete every `leaf=v<N>-<tag>` directory under the given relations
    * that NO retained manifest references and whose `N` is at or below
    * the current committed version (an unreferenced higher version may
    * belong to a writer mid-commit). Handles both nested
    * (`rel/<grp>=g/leaf=…`) and flat (`rel/leaf=…`) layouts. Pre-
    * manifest leaves (no `v<N>-` prefix) are never touched — they are
    * the legacy store's data.
    */
  def sweep(indexDir: String, rels: Seq[String], currentVersion: Long): Unit = {
    val (fs, _) = WalSegments.fsFor(indexDir)
    val referenced = retainedRefs(indexDir)
    def sweepDirs(paths: Seq[Path]): Unit = paths.foreach { p =>
      val leaf = p.getName.stripPrefix("leaf=")
      versionOf(leaf) match {
        case Some(v) if !referenced.contains(leaf) && v <= currentVersion =>
          try fs.delete(p, true) catch { case _: java.io.IOException => () }
        case _ => ()
      }
    }
    rels.foreach { rel =>
      def glob(pattern: String): Seq[Path] =
        try Option(fs.globStatus(new Path(s"$indexDir/$rel/$pattern")))
          .toSeq.flatten.filter(_.isDirectory).map(_.getPath)
        catch { case _: java.io.IOException => Seq.empty }
      sweepDirs(glob("*/leaf=*") ++ glob("leaf=*"))
    }
  }

  /** EXPORT a retained snapshot as a STANDALONE store — the compliance
    * clone ("ship the index exactly as the nightly mark saw it" to an
    * audit cluster, a staging environment, or cold storage): copy every
    * leaf and tombstone directory the pinned manifest references —
    * relative layout preserved, so group/cell partition pruning works
    * unchanged on the clone — plus that manifest file itself. The clone
    * reads as a normal store whose HEAD is the snapshot (screens,
    * searches, and further commits all work; version numbering
    * continues from the snapshot's), and the source store is never
    * touched. Cost is one copy of the snapshot's live bytes —
    * retired/unreferenced leaves and other versions do not ship. Throws
    * when `version` is not retained (the time-travel reach rule) or the
    * destination already holds a manifest (never silently merge into an
    * existing store); a manifest-LESS non-empty destination is a torn
    * prior export's residue and is cleared before copying, so a crashed
    * export is safely retryable (kill-mid-export → retry reads
    * identical to a clean export — spec-pinned).
    */
  def exportSnapshot(indexDir: String, version: Long,
      destDir: String): Unit = {
    val meta = readMetaAt(indexDir, version).getOrElse(
      throw new IllegalArgumentException(
        s"manifest version $version is not retained at $indexDir — " +
          s"export reaches the ${retentionWindow(indexDir)}-version " +
          "grace window"))
    val (fs, root) = WalSegments.fsFor(indexDir)
    val (dfs, droot) = WalSegments.fsFor(destDir)
    if (readMeta(destDir).isDefined) throw new IllegalArgumentException(
      s"$destDir already holds a committed index manifest — export " +
        "refuses to merge into an existing store")
    // torn-export residue: the manifest copies LAST, so an export that
    // died mid-copy leaves a manifest-less, non-empty destination. A
    // retry must CLEAR it first — Hadoop FileUtil.copy into an existing
    // directory NESTS (checkDest resolves dst/leaf=X → dst/leaf=X/leaf=X),
    // which would commit a clone with duplicated partition levels. The
    // residue is un-committed bytes, garbage by definition (the
    // dropResidue discipline applied to the whole clone).
    try {
      if (dfs.getFileStatus(droot).isDirectory &&
          dfs.listStatus(droot).nonEmpty)
        dfs.delete(droot, true)
    } catch { case _: java.io.FileNotFoundException => () }
    val wanted = (meta.leaves ++ meta.tombs).map(l => s"leaf=$l").toSet
    val conf = new org.apache.hadoop.conf.Configuration()
    // relation dirs = every non-metadata child; leaves sit at
    // <rel>/leaf=X (flat, e.g. tombs) or <rel>/<grp>/leaf=X (grouped)
    val rels =
      try fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
      catch { case _: java.io.FileNotFoundException => Array.empty[String] }
    rels.foreach { rel =>
      def glob(pattern: String): Seq[Path] =
        try Option(fs.globStatus(new Path(s"$indexDir/$rel/$pattern")))
          .toSeq.flatten.filter(_.isDirectory).map(_.getPath)
        catch { case _: java.io.IOException => Seq.empty }
      val leafDirs = glob("leaf=*") ++ glob("*/leaf=*")
      // a child dir holding plain data FILES and no leaf layout is an
      // out-of-leaf ARTIFACT (the PqIndex codebooks/coarse-quantizer
      // parquet datasets, named by the manifest's params) — immutable
      // after build, shared by every version, required by the clone's
      // searches: copy it wholesale
      val isArtifact = leafDirs.isEmpty &&
        fs.listStatus(new Path(root, rel))
          .exists(st => st.isFile && !st.getPath.getName.startsWith("."))
      if (isArtifact) {
        if (!org.apache.hadoop.fs.FileUtil.copy(fs, new Path(root, rel),
            dfs, new Path(droot, rel), false, conf))
          throw new java.io.IOException(
            s"could not copy artifact dir $rel to $destDir")
      } else leafDirs
        .filter(p => wanted.contains(p.getName)).foreach { src =>
          // re-derive the root-relative path (rel[/grp]/leaf=X)
          val grp = src.getParent.getName
          val relPath =
            if (grp == rel) s"$rel/${src.getName}"
            else s"$rel/$grp/${src.getName}"
          val dst = new Path(droot, relPath)
          dfs.mkdirs(dst.getParent)
          if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, dfs, dst,
              false, conf))
            throw new java.io.IOException(s"could not copy $src to $dst")
        }
    }
    if (!org.apache.hadoop.fs.FileUtil.copy(fs,
        new Path(indexDir, manifestFile(version)),
        dfs, new Path(droot, manifestFile(version)), false, conf))
      throw new java.io.IOException(
        s"could not copy the v$version manifest to $destDir")
  }

  /** Restrict an index relation to the committed leaves (`leaf` is a
    * partition column, so this is a partition prune): None = legacy
    * store, scan everything; Some(empty) = committed-empty store, no
    * rows.
    */
  def committedOnly(df: org.apache.spark.sql.DataFrame,
      live: Option[Seq[String]]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    live match {
      case Some(ls) if ls.isEmpty => df.filter(lit(false))
      case Some(ls)               => df.filter(col("leaf").isin(ls: _*))
      case None                   => df
    }
  }

  /** Delete any directory named exactly `leaf=<leaf>` under the given
    * relations — crash residue of a torn write carrying the name the
    * retry is about to (re)write; mode("append") would otherwise
    * duplicate its rows.
    */
  def dropResidue(indexDir: String, rels: Seq[String], leaf: String): Unit = {
    val (fs, _) = WalSegments.fsFor(indexDir)
    rels.foreach { rel =>
      def glob(pattern: String): Seq[Path] =
        try Option(fs.globStatus(new Path(s"$indexDir/$rel/$pattern")))
          .toSeq.flatten.map(_.getPath)
        catch { case _: java.io.IOException => Seq.empty }
      (glob(s"*/leaf=$leaf") ++ glob(s"leaf=$leaf")).foreach { p =>
        try fs.delete(p, true) catch { case _: java.io.IOException => () }
      }
    }
  }
}
