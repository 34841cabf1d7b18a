package graft.sources.cdc

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.time.Instant

import graft.sources.pgoutput._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** WAL segment files: the durable replay unit of the CDC source.
  *
  * A segment is a sequence of length-prefixed binary pgoutput frames
  * (`[int32 len][frame bytes]`...) behind a small magic header. Segment
  * files are named `segment-<n>.wal` and consumed in name order; each
  * segment re-emits the `Relation`/`Type` metadata frames at its head —
  * mirroring how a pgoutput session resends relation metadata after a
  * reconnect (reference: publisher caches Relation per session,
  * lib/walex/replication/publisher.ex:83-95) — so any segment is
  * independently decodable and segments can be read in parallel.
  *
  * Storage speaks the Hadoop [[FileSystem]] API, NOT `java.nio`: `walDir`
  * can be a plain local path (routed through `file://`), an explicit
  * `file:///` URI, or shared cluster storage (`hdfs://`, `s3a://`) — the
  * executors opening [[CdcInputPartition]] slices resolve the same
  * FileSystem from the serialized Hadoop conf, so no shared POSIX mount
  * is required. Visibility is scheme-aware ([[writeAtomic]]): on
  * filesystems whose in-progress writes are VISIBLE but whose rename is
  * atomic (local POSIX, HDFS), a segment is written to a `.tmp` sibling
  * and `rename`d into place; on object stores (`s3a://`, `gs://`, …),
  * where rename is a nonatomic copy+delete but `create`→`close` IS the
  * atomic publication point (one PUT — the object appears whole or not
  * at all), the final name is written directly — no torn reads, no extra
  * copy, and a crash mid-write leaves NO object rather than a stray
  * temp. Stores outside both lists keep tmp+rename plus the
  * magic/length-prefix framing, which makes a torn read fail loudly
  * (`require(Magic)` / EOF inside a frame) rather than silently
  * truncate.
  *
  * The publication manifest (`publication_<name>` listing `schema.table`
  * lines) stands in for `pg_publication` (reference fail-fast check:
  * lib/walex/replication/server.ex:75-83, query_builder.ex:2-4).
  */
object WalSegments {

  val Magic = 0x4757414C // "GWAL"
  val Version = 1

  /** Process-default Hadoop conf for callers outside a Spark session
    * (tailer, tests): picks up core-site.xml when present, serves
    * `file://` otherwise. Spark-side callers pass the session conf.
    */
  lazy val localConf: Configuration = new Configuration()

  def segmentName(idx: Int): String = f"segment-$idx%06d.wal"

  def segmentPath(dir: String, idx: Int): Path = new Path(dir, segmentName(idx))

  private val SegIdxRe = "segment-(\\d+)\\.wal".r

  /** Segment index from a segment file name (None for non-segment names). */
  def segIdxOf(name: String): Option[Int] = name match {
    case SegIdxRe(d) => d.toIntOption
    case _           => None
  }

  /** FileSystem + qualified path for a directory string (cheap:
    * `FileSystem.get` caches per scheme+authority).
    */
  def fsFor(dir: String, conf: Configuration = localConf): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  /** True when `pattern` (a glob under some index/state dir) matches at
    * least one path — absent dirs and IO errors read as "no match". The
    * shared probe behind the persisted indexes' idempotent-fold checks
    * (dedup band leaves, aHash leaves): one definition of the
    * null-globStatus / IOException edge cases instead of one per index.
    */
  def globNonEmpty(dir: String, pattern: String): Boolean = {
    val (fs, _) = fsFor(dir)
    try fs.globStatus(new Path(s"$dir/$pattern")) match {
      case null => false
      case a    => a.nonEmpty
    } catch { case _: java.io.IOException => false }
  }

  def listSegments(dir: String, conf: Configuration = localConf): Seq[Path] = {
    val (fs, d) = fsFor(dir, conf)
    try {
      if (!fs.getFileStatus(d).isDirectory) return Seq.empty
      fs.listStatus(d).iterator
        .map(_.getPath)
        .filter(_.getName.matches("segment-\\d+\\.wal"))
        .toSeq
        // NUMERIC order: at 4096 frames/segment a 100 TB history passes a
        // million segments, where the %06d padding overflows to 7 digits
        // and lexicographic order would interleave ("segment-1000000"
        // sorts before "segment-999999") — the index is the truth
        .sortBy(p => segIdxOf(p.getName).getOrElse(Int.MaxValue))
    } catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  // ---- retention: bounded replay history with stable offsets ----
  // At 100 TB the replay history cannot grow forever, but deleting
  // segments naively breaks every checkpointed offset (global frame
  // counts are counted over the segment list — the source fails fast by
  // design). The `_retention` record solves both: it durably states "the
  // first `framesBefore` frames of this stream lived in segments below
  // `firstSegment` and are gone", so global frame offsets KEEP their
  // meaning — consumers at or past the boundary resume exactly, and only
  // a checkpoint that genuinely needs expired frames fails. Expiry
  // writes the record FIRST, then deletes (a crash between leaves
  // shadowed residue below `firstSegment`, which every reader filters
  // out and the next expiry sweeps).

  /** `framesBefore` global frames lived in segments below `firstSegment`
    * and have been expired from the directory.
    */
  final case class Retention(framesBefore: Long, firstSegment: Int)

  def retentionPath(dir: String): Path = new Path(dir, "_retention")

  def readRetention(fs: FileSystem, dir: Path): Option[Retention] =
    try {
      val p = new Path(dir, "_retention")
      if (!fs.exists(p)) return None
      val in = fs.open(p)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](512)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8")
      } finally in.close()
      def field(k: String): Option[Long] =
        ("\"" + k + "\"\\s*:\\s*(\\d+)").r.findFirstMatchIn(text)
          .map(_.group(1).toLong)
      for {
        f <- field("frames_before")
        s <- field("first_segment")
      } yield Retention(f, s.toInt)
    } catch { case _: java.io.IOException => None }

  /** The directory's retention record plus its LIVE segments (those at or
    * past `firstSegment`; anything below is expired residue from a crash
    * window between record-write and delete — filtered everywhere, swept
    * by the next expiry).
    */
  def activeSegments(dir: String,
      conf: Configuration = localConf): (Option[Retention], Seq[Path]) = {
    val (fs, d) = fsFor(dir, conf)
    val ret = readRetention(fs, d)
    val segs = listSegments(dir, conf)
    val live = ret.fold(segs) { r =>
      segs.filter(p => segIdxOf(p.getName).exists(_ >= r.firstSegment))
    }
    (ret, live)
  }

  /** Index the NEXT segment written to this directory must use: one past
    * the last live segment, or the retention boundary when all live
    * segments are gone, or 0 for a fresh directory. (Deriving this from
    * `listSegments.size` would collide after any retention.)
    */
  def nextSegmentIndex(dir: String, conf: Configuration = localConf): Int = {
    val (ret, live) = activeSegments(dir, conf)
    live.lastOption.flatMap(p => segIdxOf(p.getName)).map(_ + 1)
      .orElse(ret.map(_.firstSegment))
      .getOrElse(0)
  }

  /** Expire all segments below `uptoSegment`: durably record the new
    * retention boundary (global frame offsets stay meaningful — see the
    * retention comment above), THEN delete the expired segment and
    * sidecar files, sweeping any residue from earlier crash windows.
    * Callers are responsible for only expiring history every consumer has
    * committed past (couple to the source's `ackPath`, or use
    * [[expireConsumed]]). Returns the new record.
    */
  def expireSegments(dir: String, uptoSegment: Int,
      conf: Configuration = localConf): Retention = {
    val (fs, d) = fsFor(dir, conf)
    val (ret0, live) = activeSegments(dir, conf)
    val base = ret0.map(_.framesBefore).getOrElse(0L)
    val first = ret0.map(_.firstSegment).getOrElse(0)
    require(uptoSegment >= first,
      s"cannot expire below the existing retention boundary ($uptoSegment < $first)")
    val expiring = live.filter(p => segIdxOf(p.getName).exists(_ < uptoSegment))
    // the expired range must be fully present: a hole would make
    // framesBefore undercount and silently remap every later offset
    val idxs = expiring.flatMap(p => segIdxOf(p.getName)).sorted
    require(idxs == (first until uptoSegment),
      s"expire range [$first, $uptoSegment) is not contiguous on disk: $idxs")
    val frames = expiring.map(p => countFrames(fs, p)).sum
    val rec = Retention(base + frames, uptoSegment)
    writeAtomic(fs, retentionPath(dir)) { out =>
      out.write(
        (s"""{"frames_before":${rec.framesBefore},""" +
          s""""first_segment":${rec.firstSegment}}""").getBytes("UTF-8"))
    }
    // record is durable — now delete everything below the boundary
    // (including residue below the OLD boundary); best-effort, residue is
    // shadowed and swept next time
    listSegments(dir, conf)
      .filter(p => segIdxOf(p.getName).exists(_ < uptoSegment))
      .foreach { p =>
        try {
          fs.delete(p, false)
          val idx = indexPath(p)
          if (fs.exists(idx)) fs.delete(idx, false)
        } catch { case _: java.io.IOException => () }
      }
    rec
  }

  /** Expire every segment the consumer has fully committed past:
    * `committedFrames` is a global frame count (the source's `ackPath`
    * figure); the boundary lands on the last segment whose frames are all
    * at or below it. No-op (returning the current record) when nothing is
    * expirable.
    */
  def expireConsumed(dir: String, committedFrames: Long,
      conf: Configuration = localConf): Retention = {
    val (fs, _) = fsFor(dir, conf)
    val (ret0, live) = activeSegments(dir, conf)
    var cum = ret0.map(_.framesBefore).getOrElse(0L)
    var upto = ret0.map(_.firstSegment).getOrElse(0)
    val it = live.iterator
    var scanning = true
    while (scanning && it.hasNext) {
      val p = it.next()
      val n = countFrames(fs, p)
      if (cum + n <= committedFrames) { cum += n; upto = segIdxOf(p.getName).get + 1 }
      else scanning = false
    }
    if (upto == ret0.map(_.firstSegment).getOrElse(0))
      ret0.getOrElse(Retention(0L, 0)) // nothing expirable: no record churn
    else expireSegments(dir, upto, conf)
  }

  /** Schemes whose `create`→`close` publishes the object ATOMICALLY (a
    * single PUT: readers never observe a partial object, and listings show
    * it only once complete) and whose rename is a nonatomic copy+delete —
    * there the direct write is both safer and one full copy cheaper than
    * tmp+rename. Conservative by design: Azure (`abfs`/`wasb`) stays on
    * the rename path because block-blob writes can surface mid-stream
    * while ADLS Gen2 rename is atomic anyway; unknown schemes default to
    * tmp+rename.
    */
  private val atomicPutSchemes =
    Set("s3a", "s3n", "s3", "gs", "oss", "swift", "cos", "obs")

  private def schemeOf(fs: FileSystem): String =
    try fs.getScheme catch { case _: UnsupportedOperationException => "" }

  /** Write `path` so that readers never see a torn file: direct single-PUT
    * on object stores ([[atomicPutSchemes]]), `.tmp` sibling + atomic
    * rename everywhere else. Segments are immutable once named, so a
    * pre-existing destination means a concurrent writer replayed the same
    * content — overwrite keeps last-writer-wins parity with the old
    * REPLACE_EXISTING semantics.
    */
  def writeAtomic(fs: FileSystem, path: Path)(body: java.io.OutputStream => Unit): Unit =
    if (atomicPutSchemes(schemeOf(fs))) {
      val out = fs.create(path, true)
      try body(out) finally out.close() // close() IS the publication point
    } else {
      val tmp = new Path(path.getParent, path.getName + ".tmp")
      val out = fs.create(tmp, true)
      try body(out) finally out.close()
      if (fs.exists(path)) fs.delete(path, false)
      if (!fs.rename(tmp, path))
        throw new java.io.IOException(s"could not rename $tmp to $path")
    }

  /** Publish the fully-written, closed `tmp` file at `dest` EXCLUSIVELY:
    * true iff this call claimed `dest`, false if another committer already
    * holds it. The manifest-commit arbiter for [[graft.streaming
    * .Materializer]] and `PqIndex`.
    *
    * On local (`file://`) filesystems the claim is an atomic hard link —
    * link(2) fails with EEXIST if `dest` exists, and the link appears with
    * its COMPLETE content, so readers can never observe a torn file. A
    * plain rename(2) would be wrong here: POSIX rename silently REPLACES
    * an existing destination, so two committers checking `!exists` then
    * renaming could both "win" and the second would clobber the first.
    * On HDFS rename-to-existing fails, which is the same arbiter; object
    * stores should map this to a conditional PUT-if-absent.
    */
  def publishExclusive(fs: FileSystem, tmp: Path, dest: Path): Boolean =
    if (schemeOf(fs) == "file" || schemeOf(fs).isEmpty) {
      val won =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(fs.makeQualified(dest).toUri.getPath),
            java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // tmp vanished (a sweeper raced us): the claim is simply lost
          case _: java.nio.file.NoSuchFileException => false
        }
      try fs.delete(tmp, false)
      catch { case _: java.io.IOException => () }
      won
    } else {
      val won = !fs.exists(dest) && fs.rename(tmp, dest)
      if (!won)
        try fs.delete(tmp, false)
        catch { case _: java.io.IOException => () }
      won
    }

  def write(fs: FileSystem, path: Path, frames: Seq[Array[Byte]]): Unit = {
    writeAtomic(fs, path) { raw =>
      val out = new DataOutputStream(new BufferedOutputStream(raw))
      out.writeInt(Magic)
      out.writeInt(Version)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      out.flush()
    }
    // sidecar index AFTER the segment is durable: a crash in between
    // leaves a segment without an index, which every index consumer
    // treats as "fall back to the frame scan" — never wrong, only slower
    writeIndex(fs, path, frames)
  }

  // ---- per-segment sidecar index ----
  // Startup paths (tailer replay floor, flush-mark rebuild, the DSv2
  // source's offset planning) need three numbers per segment: frame
  // count, last commit LSN, last commit end-LSN. Without an index each of
  // them is a full segment read — O(entire replay history) on every
  // tailer restart or stream start, which does not survive 100 TB of
  // retained history. The index is advisory: segments are immutable so it
  // can never go stale, a missing one (legacy segment, crash window)
  // falls back to the scan, and `listSegments`' name filter ignores it.

  final case class SegmentIndex(
      frames: Long, lastCommitLsn: Long, lastCommitEndLsn: Long)

  def indexPath(segment: Path): Path =
    new Path(segment.getParent, segment.getName + ".idx")

  /** (max commit LSN, max commit end-LSN) across `frames` — Commit layout
    * [C][flags int8][commit_lsn int64][end_lsn int64]…, zeros when no
    * Commit is present.
    */
  def commitInfo(frames: IterableOnce[Array[Byte]]): (Long, Long) = {
    var lsn = 0L
    var end = 0L
    frames.iterator.foreach { f =>
      if (f.length >= 10 && f(0) == 'C'.toByte) {
        lsn = math.max(lsn, java.nio.ByteBuffer.wrap(f, 2, 8).getLong)
        if (f.length >= 18)
          end = math.max(end, java.nio.ByteBuffer.wrap(f, 10, 8).getLong)
      }
    }
    (lsn, end)
  }

  private def writeIndex(fs: FileSystem, segment: Path,
      frames: Seq[Array[Byte]]): Unit = {
    val (lsn, end) = commitInfo(frames)
    writeAtomic(fs, indexPath(segment)) { out =>
      out.write(
        (s"""{"frames":${frames.length},"last_commit_lsn":$lsn,""" +
          s""""last_commit_end_lsn":$end}""").getBytes("UTF-8"))
    }
  }

  /** The segment's sidecar index, or None when absent/unreadable (legacy
    * segment or index-write crash window) — callers scan instead.
    */
  def readIndex(fs: FileSystem, segment: Path): Option[SegmentIndex] =
    try {
      val idx = indexPath(segment)
      if (!fs.exists(idx)) return None
      val in = fs.open(idx)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](512)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8")
      } finally in.close()
      def field(k: String): Option[Long] =
        ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(text)
          .map(_.group(1).toLong)
      for {
        f <- field("frames")
        l <- field("last_commit_lsn")
        e <- field("last_commit_end_lsn")
      } yield SegmentIndex(f, l, e)
    } catch { case _: java.io.IOException => None }

  def write(path: Path, frames: Seq[Array[Byte]]): Unit =
    write(path.getFileSystem(localConf), path, frames)

  /** Closeable frame iterator over one segment. */
  final class FrameIterator(fs: FileSystem, path: Path)
      extends Iterator[Array[Byte]] with AutoCloseable {
    private val in = new DataInputStream(new BufferedInputStream(fs.open(path)))
    require(in.readInt() == Magic, s"$path: not a GWAL segment")
    require(in.readInt() == Version, s"$path: unsupported segment version")
    private var closed = false
    private var nextFrame: Array[Byte] = advance()
    private def advance(): Array[Byte] =
      try {
        val len = in.readInt()
        val arr = new Array[Byte](len)
        in.readFully(arr)
        arr
      } catch { case _: EOFException => close(); null }
    override def hasNext: Boolean = nextFrame != null
    override def next(): Array[Byte] = {
      val f = nextFrame; nextFrame = advance(); f
    }
    override def close(): Unit = if (!closed) { closed = true; in.close() }
  }

  def readFrames(fs: FileSystem, path: Path): FrameIterator = new FrameIterator(fs, path)

  def readFrames(path: Path): FrameIterator =
    new FrameIterator(path.getFileSystem(localConf), path)

  /** Frame count without materializing frames: one sidecar-index read
    * when the segment has one (offset planning is driver-side and must
    * stay O(metadata), not O(data) — the scan fallback covers legacy
    * segments and index-write crash windows).
    */
  def countFrames(fs: FileSystem, path: Path): Long =
    readIndex(fs, path).map(_.frames).getOrElse {
      val in = new DataInputStream(new BufferedInputStream(fs.open(path)))
      try {
        require(in.readInt() == Magic, s"$path: not a GWAL segment")
        in.readInt()
        var n = 0L
        try {
          while (true) { val len = in.readInt(); in.skipBytes(len); n += 1 }
          n
        } catch { case _: EOFException => n }
      } finally in.close()
    }

  def countFrames(path: Path): Long = countFrames(path.getFileSystem(localConf), path)

  // ---- publication manifest (S2) ----

  def publicationPath(dir: String, name: String): Path =
    new Path(dir, s"publication_$name")

  def writePublication(dir: String, name: String, tables: Seq[String],
      conf: Configuration = localConf): Unit = {
    val p = publicationPath(dir, name)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(tables.mkString("\n").getBytes("UTF-8")) finally out.close()
  }

  /** Tables served by a publication, or None if the publication does not
    * exist (the source fails fast, matching server.ex:75-83).
    */
  def publicationTables(dir: String, name: String,
      conf: Configuration = localConf): Option[Seq[String]] = {
    val p = publicationPath(dir, name)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        buf.toByteArray
      } finally in.close()
      Some(new String(bytes, "UTF-8").split("\n").map(_.trim)
        .filter(_.nonEmpty).toSeq)
    }
  }
}

/** Deterministic WAL fixture generation from the testdata-derived change set
  * (graft.operators.cdc.ChangeStream.changes semantics): one transaction per
  * xid, `Begin` + per-change `Insert`/`Update`/`Delete` + `Commit`, with
  * REPLICA IDENTITY FULL old images for updates/deletes, NULL cells for null
  * `k`, and — as real pgoutput does — an unchanged-TOAST 'u' cell in the NEW
  * tuple of every `k % 11 == 0` update (the unchanged value is not resent;
  * the FULL old image carries the actual, identical value) — so the full
  * protocol surface ('n'/'u'/'t' cells, O-images, Relation/Type replays)
  * flows through the binary path.
  */
object WalFixture {
  import WalMessage._

  final case class Change(seq: Long, xid: Long, op: String, schemaName: String,
      tableName: String, commitMs: Long, k: Option[Long], valCents: Long,
      recordId: Long)

  /** Table → relation id; every fixture table shares the 5-column int8
    * shape (id, seq, k, val_cents, updated_at).
    */
  val relations: Map[String, Int] = Map("user" -> 16001, "todo" -> 16002, "order" -> 16003)

  val columnNames: Seq[String] = Seq("id", "seq", "k", "val_cents", "updated_at")

  def relationFrame(table: String): Relation =
    Relation(relations(table), "public", table, ReplicaIdentity.AllColumns,
      columnNames.map(n => RelationColumn(key = n == "id", n, 20, -1))) // oid 20 = int8

  /** Txn commit LSN: monotone in xid, non-zero high word past 2^16 txns. */
  def txnLsn(xid: Long): Lsn = Lsn.fromLong((xid + 1L) << 16)

  private def cell(v: Option[Long]): Cell =
    v.fold[Cell](Cell.Null)(x => Cell.Text(x.toString))

  /** True when the change's `val_cents` models an unchanged TOASTed column
    * (UPDATE only): the new tuple carries a 'u' cell and the old/new values
    * are identical.
    */
  private def valToastUnchanged(c: Change): Boolean = c.k.exists(_ % 11 == 0)

  /** New-image tuple, ordered per [[columnNames]]. */
  private def newTuple(c: Change): IndexedSeq[Cell] = IndexedSeq(
    cell(Some(c.recordId)), cell(Some(c.seq)), cell(c.k),
    cell(Some(c.valCents)), cell(Some(c.commitMs)))

  /** UPDATE new image: real pgoutput omits an unchanged TOASTed value from
    * the new tuple ('u' cell, decoded as Cell.UnchangedToast) — the k%11=0
    * val_cents models that; the value is resent only in the FULL old image.
    */
  private def updateNewTuple(c: Change): IndexedSeq[Cell] =
    if (valToastUnchanged(c)) newTuple(c).updated(3, Cell.UnchangedToast)
    else newTuple(c)

  /** Old image per ChangeStream.withRecords' deterministic delta: val_cents
    * −150 unless k%3=0, k −1 unless k%5=0, updated_at −1000. When k%11=0 the
    * val_cents column is an unchanged TOASTed value: old == new == valCents,
    * carried only here (the new tuple has the 'u' sentinel).
    */
  private def oldTuple(c: Change): IndexedSeq[Cell] = {
    val k = c.k
    val oldVal: Cell =
      if (valToastUnchanged(c)) cell(Some(c.valCents))
      else cell(Some(c.valCents - k.map(x => if (x % 3 == 0) 0L else 150L).getOrElse(150L)))
    IndexedSeq(
      cell(Some(c.recordId)), cell(Some(c.seq)),
      k.map(x => cell(Some(x - (if (x % 5 == 0) 0L else 1L)))).getOrElse(Cell.Null),
      oldVal, cell(Some(c.commitMs - 1000)))
  }

  /** Frames for one committed transaction (changes must share an xid and be
    * seq-ordered). Begin carries the commit LSN as final_lsn and the commit
    * timestamp — the Commit frame must match it (publisher.ex:70-77 guard).
    */
  def txnFrames(changes: Seq[Change]): Seq[WalMessage] = {
    val xid = changes.head.xid
    val lsn = txnLsn(xid)
    val ts  = Instant.ofEpochMilli(changes.map(_.commitMs).max)
    val body: Seq[WalMessage] = changes.map { c =>
      val rel = relations(c.tableName)
      c.op match {
        case "insert" => Insert(rel, newTuple(c))
        case "update" => Update(rel, Some('O'), Some(oldTuple(c)), updateNewTuple(c))
        case "delete" => Delete(rel, 'O', newTuple(c))
        case other    => throw new IllegalArgumentException(s"op $other")
      }
    }
    Begin(lsn, ts, xid) +: body :+ Commit(0, lsn, Lsn.fromLong(lsn.toLong + 56), ts)
  }

  /** Metadata replay at each segment head: the three Relations plus a
    * custom-Type announcement (D9 path).
    */
  def headerFrames: Seq[WalMessage] =
    relations.keys.toSeq.sorted.map(relationFrame) :+
      PgType(35756, "public", "citext")

  /** Write the change set as WAL segments + publication manifest.
    * Deterministic: same changes → byte-identical segments. Segments are
    * independent, so encode+write fans out across cores (fixture
    * generation is harness scaffolding, but it sits inside measured
    * benchmark time — keep it off the critical path).
    */
  def writeSegments(dir: String, changes: Seq[Change], txnsPerSegment: Int = 64,
      publication: String = "graft_pub"): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val (fs, d) = WalSegments.fsFor(dir)
    fs.mkdirs(d)
    val txns = changes.groupBy(_.xid).toSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_.seq) }
    implicit val ec: ExecutionContext = ExecutionContext.global
    val writes = txns.grouped(txnsPerSegment).zipWithIndex.toSeq.map { case (group, i) =>
      Future {
        val frames = (headerFrames ++ group.flatMap(txnFrames)).map(PgOutputEncoder.encode)
        WalSegments.write(fs, new Path(d, WalSegments.segmentName(i)), frames)
      }
    }
    Await.result(Future.sequence(writes), Duration.Inf)
    WalSegments.writePublication(dir, publication,
      relations.keys.toSeq.sorted.map(t => s"public.$t"))
  }
}
