package graft.sources.replication

import java.nio.file.{Files, Paths}

import graft.sources.cdc.WalSegments

/** Bridges the live replication stream onto the WAL segment layout the
  * DSv2 CDC source consumes: the missing production piece between "a
  * PostgreSQL with a publication" and `Graft.start`. Runs beside the
  * driver (or anywhere with database + shared-storage access); the Spark
  * side just streams the segment directory as usual.
  *
  * Responsibilities:
  *  - append incoming pgoutput frames into rotating GWAL segments
  *    (atomic tmp+move per segment, so the source never sees a torn file)
  *  - REPLAY cached `Relation`/`Type` metadata frames at each segment
  *    head: pgoutput sends relation metadata once per session, but every
  *    segment must be independently decodable (the source decodes
  *    segments in parallel) — the same invariant a reconnecting session
  *    gets from the server, maintained here per segment
  *  - rotate only at transaction boundaries (after Commit), so a segment
  *    never strands a headless transaction tail — cross-segment
  *    transactions still assemble (cdc05/cdc14 semantics), this just
  *    keeps segments humanly inspectable and replay-friendly
  *  - ack the last durably-WRITTEN LSN as the flushed position (S6): the
  *    segment file is the durable handoff, so the slot's retention window
  *    is bounded by what is on disk, not by what Spark has consumed.
  *    `consumerAckPath` switches retention to track the CONSUMER instead:
  *    pointed at the CDC source's `ackPath` status file (committed frame
  *    counts), the tailer maps the consumer's committed frame count onto
  *    the per-flush LSN marks it keeps and never acks past it — the
  *    server then retains WAL until Spark has actually committed, so even
  *    a lost segment DIRECTORY can be re-streamed from the slot.
  *  - DEDUPLICATE replayed transactions across reconnects: if the server
  *    dies before processing the final ack, the resumed stream re-sends
  *    transactions that are already on disk (the slot's documented
  *    at-least-once window — reference `server.ex:182` replays from
  *    `restart_lsn`). The reference pushes that dedup to consumers;
  *    HERE it cannot be deferred, because segments are durable replay
  *    history — a duplicate written once would re-deliver on every
  *    downstream replay forever. The tailer recovers the last written
  *    commit LSN from the existing segments at startup and SKIPS whole
  *    transactions at or below it (decided at Begin via its final_lsn),
  *    so segment content stays exactly-once even though the wire is
  *    at-least-once.
  */
final class ReplicationTailer(
    client: PgReplicationClient,
    walDir: String,
    framesPerSegment: Int = 4096,
    consumerAckPath: Option[String] = None) {

  import PgReplicationClient._

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val metadata = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
  private val pending = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
  private var segmentIdx = WalSegments.listSegments(walDir).size
  private var lastWrittenLsn = 0L
  private var pendingEndLsn = 0L
  // replay floor: commit LSN of the last transaction already on disk;
  // transactions at or below it are re-sends and are dropped whole
  private var commitFloor = ReplicationTailer.lastCommitLsn(walDir)
  private var skippingReplayedTxn = false
  // consumer-coupled retention: cumulative frame count → end LSN, one mark
  // per flush, so a committed_frames figure maps to the LSN it covers.
  // Frames already on disk predate this instance's marks — the floor stays
  // conservative (never acks past what it can prove)
  private var cumFrames: Long =
    WalSegments.listSegments(walDir).map(WalSegments.countFrames).sum
  private val flushMarks = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
  private var lastSentAck = 0L

  Files.createDirectories(Paths.get(walDir))

  /** Metadata key: relation frames replace by relation id, type frames by
    * type oid — last-write-wins, like the server's per-session cache
    * (reference: publisher.ex:79-95).
    */
  private def metadataKey(frame: Array[Byte]): Option[String] =
    frame.headOption.map(_.toChar) match {
      case Some('R') if frame.length >= 5 =>
        Some("R" + java.nio.ByteBuffer.wrap(frame, 1, 4).getInt)
      case Some('Y') if frame.length >= 5 =>
        Some("Y" + java.nio.ByteBuffer.wrap(frame, 1, 4).getInt)
      case _ => None
    }

  private def isCommit(frame: Array[Byte]): Boolean =
    frame.headOption.contains('C'.toByte)

  /** Consume one stream message. Returns true while the stream is live. */
  def accept(msg: Message): Boolean = msg match {
    case XLogData(_, walEnd, _, frame) =>
      metadataKey(frame) match {
        case Some(k) => metadata(k) = frame // cached even inside a skipped txn
        case None =>
          frame.headOption.map(_.toChar) match {
            case Some('B') =>
              // Begin: [B][final_lsn int64][ts int64][xid int32] — the
              // final_lsn IS the transaction's commit LSN, so the replay
              // decision lands before any of its changes
              val finalLsn = java.nio.ByteBuffer.wrap(frame, 1, 8).getLong
              if (finalLsn <= commitFloor) {
                skippingReplayedTxn = true
                log.info(s"graft-replication: skipping replayed txn " +
                  s"${PgReplicationClient.formatLsn(finalLsn)} (already on disk)")
              } else pending += frame
            case Some('C') =>
              if (skippingReplayedTxn) skippingReplayedTxn = false
              else {
                pending += frame
                // Commit: [C][flags int8][commit_lsn int64]… — raise the
                // floor as transactions land in the buffer
                if (frame.length >= 10)
                  commitFloor = math.max(commitFloor,
                    java.nio.ByteBuffer.wrap(frame, 2, 8).getLong)
              }
            case _ =>
              if (!skippingReplayedTxn) pending += frame
          }
      }
      pendingEndLsn = math.max(pendingEndLsn, walEnd)
      if (pending.length >= framesPerSegment && isCommit(frame) && !skippingReplayedTxn)
        flush()
      true
    case Keepalive(_, _, _) => true
    case StreamEnded        => false
  }

  /** Write buffered frames as one segment (metadata replayed at its head)
    * and advance the ack. With no buffered frames the write is skipped but
    * the ack still advances — in consumer-coupled mode the consumer keeps
    * committing between segments and retention must follow.
    */
  def flush(): Unit = {
    if (pending.nonEmpty) {
      val frames = metadata.values.toSeq ++ pending.toSeq
      WalSegments.write(
        Paths.get(walDir, WalSegments.segmentName(segmentIdx)), frames)
      segmentIdx += 1
      pending.clear()
      lastWrittenLsn = pendingEndLsn
      cumFrames += frames.length
      flushMarks += ((cumFrames, lastWrittenLsn))
      log.info(s"graft-replication: segment ${segmentIdx - 1} " +
        s"(${frames.length} frames) flushed at ${formatLsn(lastWrittenLsn)}")
    }
    val ack = consumerAckPath match {
      case None       => lastWrittenLsn // write-through: disk is the handoff
      case Some(path) => ReplicationTailer.committedFrames(path)
        .flatMap(ackFloorLsn).getOrElse(0L)
    }
    if (ack > lastSentAck) {
      client.sendStandbyStatus(ack)
      lastSentAck = ack
      lastAckComputed = ack
    }
  }

  /** Largest flushed LSN fully covered by the consumer's committed frame
    * count, per this instance's flush marks. Marks at or below the ack are
    * pruned (the floor is monotone).
    */
  private[graft] def ackFloorLsn(committed: Long): Option[Long] = {
    val covered = flushMarks.takeWhile(_._1 <= committed)
    if (covered.length > 1) flushMarks.remove(0, covered.length - 1)
    covered.lastOption.map(_._2)
  }

  /** Last ack actually sent (test observability). */
  @volatile private[graft] var lastAckComputed: Long = 0L

  /** Pump the stream until `idleMs` passes with no traffic, or the stream
    * ends; flushes any tail. Returns whether the stream is still live
    * (false after StreamEnded) — [[Replicator]] loops on it.
    */
  def runUntilIdle(idleMs: Long = 2000L): Boolean = {
    var live = true
    var pumping = true
    while (pumping) client.poll(idleMs) match {
      case Some(m) => if (!accept(m)) { live = false; pumping = false }
      case None    => pumping = false // idle window elapsed
    }
    flush()
    live
  }
}

object ReplicationTailer {
  /** The CDC source's ack status file → committed frame count (None when
    * the consumer has not committed yet or the file is mid-rotation).
    */
  private[graft] def committedFrames(path: String): Option[Long] =
    try {
      val p = Paths.get(path)
      if (!Files.exists(p)) None
      else "\"committed_frames\"\\s*:\\s*(\\d+)".r
        .findFirstMatchIn(new String(Files.readAllBytes(p), "UTF-8"))
        .map(_.group(1).toLong)
    } catch { case _: java.io.IOException => None }

  /** Commit LSN of the last transaction in the directory's segments (0 if
    * none): the replay floor a restarted tailer resumes under. Scans
    * backwards — the last segment holding any Commit decides.
    */
  private[replication] def lastCommitLsn(dir: String): Long = {
    val segs = WalSegments.listSegments(dir)
    segs.reverseIterator.map { p =>
      val it = WalSegments.readFrames(p)
      try it.foldLeft(0L) { (acc, f) =>
        if (f.length >= 10 && f(0) == 'C'.toByte)
          math.max(acc, java.nio.ByteBuffer.wrap(f, 2, 8).getLong)
        else acc
      } finally it.close()
    }.find(_ > 0L).getOrElse(0L)
  }
}

/** Background pump with SUPERVISION (S7, the live lane): drains the
  * stream on a daemon thread; when the connection dies — server restart,
  * network cut, `pg_terminate_backend` on the walsender — it reconnects
  * through `reconnect` with exponential backoff, up to `maxRestarts`
  * consecutive failures (any successful pump window resets the budget,
  * the [[graft.streaming.Supervisor]] discipline). A DURABLE slot resumes
  * from `confirmed_flush_lsn`, so a kill window loses nothing; a
  * TEMPORARY slot is re-created and resumes from the present — the S3
  * contract. [[close]] stops the pump and closes the live connection
  * (dropping a temporary slot server-side).
  */
final class Replicator(
    initial: (PgReplicationClient, ReplicationTailer),
    reconnect: () => (PgReplicationClient, ReplicationTailer),
    idleMs: Long = 2000L,
    maxRestarts: Int = 10) extends AutoCloseable {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  @volatile private var closed = false
  @volatile private var live: PgReplicationClient = initial._1
  private val thread = new Thread(() => {
    var session = Option(initial)
    var restarts = 0
    var backoff = 200L
    while (!closed && restarts <= maxRestarts) {
      session match {
        case Some((client, tailer)) =>
          live = client
          try {
            var streaming = true
            while (!closed && streaming) {
              streaming = tailer.runUntilIdle(idleMs)
              // surviving a pump window restores the budget; a session
              // that dies inside its first window does NOT (else a crash
              // loop would reconnect forever)
              if (streaming) { restarts = 0; backoff = 200L }
            }
          } catch { case e: Throwable =>
            // during close() a racing ack hits the closed socket — expected
            if (!closed) log.warn(s"graft-replicator stream failed: $e")
          } finally client.close()
          session = None
        case None =>
          if (!closed) {
            restarts += 1
            try { Thread.sleep(backoff); backoff = math.min(backoff * 2, 10000L) }
            catch { case _: InterruptedException => () }
            if (!closed) {
              try session = Some(reconnect())
              catch { case e: Throwable =>
                if (!closed)
                  log.warn(s"graft-replicator reconnect $restarts/$maxRestarts failed: $e")
              }
            }
          }
      }
      if (closed) session.foreach(_._1.close())
    }
    if (restarts > maxRestarts)
      log.error(s"graft-replicator: gave up after $maxRestarts consecutive failures")
  }, "graft-replicator")
  thread.setDaemon(true)
  thread.start()

  def isRunning: Boolean = thread.isAlive

  override def close(): Unit = {
    closed = true
    live.close()
    thread.interrupt()
    thread.join(10000)
  }
}
