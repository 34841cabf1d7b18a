package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One decoded WAL message row, as produced by the CDC source
  * (graft.sources.cdc.CdcSource.schema). Field names match the source's
  * column names so `.as[ChangeMsg]` binds positionally-by-name.
  */
final case class ChangeMsg(
    seq: Long,
    lsn: Long,
    xid: Option[Long],
    msg: String,
    commit_ts_us: Option[Long],
    schema_name: Option[String],
    table_name: Option[String],
    record: Option[Map[String, String]],
    old_record: Option[Map[String, String]],
    old_kind: Option[String],
    toast_unchanged: Option[Seq[String]],
    col_types: Option[Map[String, String]])

/** A change emitted once its transaction committed: the reference's
  * `Changes.Transaction` member rows (lib/walex/changes.ex:9-33) with the
  * commit LSN/timestamp stamped on.
  */
final case class AssembledChange(
    xid: Long,
    commit_lsn: Long,
    commit_ts_us: Long,
    change_idx: Int,
    seq: Long,
    op: String,
    schema_name: Option[String],
    table_name: Option[String],
    record: Option[Map[String, String]],
    old_record: Option[Map[String, String]],
    old_kind: Option[String],
    toast_unchanged: Option[Seq[String]],
    col_types: Option[Map[String, String]])

/** Buffered per-xid state between micro-batches. */
final case class TxnState(
    beginLsn: Option[Long],
    beginTsUs: Option[Long],
    changes: Vector[ChangeMsg])

/** P1 — cross-batch transaction assembly (reference:
  * lib/walex/replication/publisher.ex:57-77): buffer every change between
  * `Begin` and the `Commit` whose LSN matches the Begin's final_lsn, then
  * emit the whole transaction atomically at commit. A transaction whose
  * frames span micro-batches is held in the state store and emitted once,
  * intact, when its Commit arrives; a transaction that never commits is
  * never emitted (matching the reference: an aborted/unfinished txn yields
  * no events).
  *
  * Scale: state is keyed by xid and holds exactly the open transactions'
  * rows — bounded by WAL transaction size, not stream length. The shuffle
  * introduced by `groupByKey(xid)` is the one unavoidable exchange (txn
  * atomicity is a cross-partition property); everything downstream of it
  * stays partitioned by xid. A transaction whose Commit never arrives
  * (torn WAL tail, crashed upstream writer) would otherwise pin its buffer
  * in the state store forever — a processing-time TTL evicts such stale
  * open transactions (dropped and counted, never half-emitted; logical
  * decoding only ships committed transactions, so an eviction is always a
  * producer-side fault, mirroring the reference dropping in-flight state
  * on restart, server.ex:86-143).
  */
object TxnAssembler {

  private val dataOps = Set("insert", "update", "delete", "truncate")

  /** `staleTxnTtl` (e.g. `Some("30 minutes")`) arms a processing-time TTL
    * per open transaction — set it on long-running production streams.
    * It is opt-in because ProcessingTimeTimeout makes Spark schedule
    * batches continuously even with no data (timeouts must get a chance to
    * fire), which breaks drain-and-stop semantics (AvailableNow /
    * processAllAvailable never quiesce) and burns empty batches on
    * bounded replays.
    */
  def assemble(messages: DataFrame,
      staleTxnTtl: Option[String] = None,
      evictedCounter: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[AssembledChange] = {
    val spark = messages.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (staleTxnTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    messages.as[ChangeMsg]
      .filter(m => m.xid.isDefined && (dataOps(m.msg) || m.msg == "begin" || m.msg == "commit"))
      .groupByKey(_.xid.get)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        assembleGroup(staleTxnTtl, evictedCounter))
  }

  /** Pure state transition — also unit-testable without a stream. */
  def assembleGroup(staleTxnTtl: Option[String],
      evictedCounter: Option[org.apache.spark.util.LongAccumulator])(
      xid: Long, rows: Iterator[ChangeMsg],
      state: GroupState[TxnState]): Iterator[AssembledChange] = {
    if (state.hasTimedOut) {
      // stale open txn: drop whole buffer, never a partial emit
      evictedCounter.foreach(_.add(1))
      state.remove()
      return Iterator.empty
    }
    var st = state.getOption.getOrElse(TxnState(None, None, Vector.empty))
    val out = Vector.newBuilder[AssembledChange]
    rows.toSeq.sortBy(_.seq).foreach { m =>
      m.msg match {
        case "begin" =>
          st = TxnState(Some(m.lsn), m.commit_ts_us, st.changes)
        case "commit" =>
          // commit-LSN guard (publisher.ex:70-77): only the matching commit
          // closes the txn; a mismatch discards it (reference raises — here
          // the txn is dropped and state cleared, never half-emitted).
          if (st.beginLsn.contains(m.lsn)) {
            val ts = m.commit_ts_us.orElse(st.beginTsUs).getOrElse(0L)
            st.changes.sortBy(_.seq).zipWithIndex.foreach { case (c, i) =>
              out += AssembledChange(xid, m.lsn, ts, i, c.seq, c.msg,
                c.schema_name, c.table_name, c.record, c.old_record,
                c.old_kind, c.toast_unchanged, c.col_types)
            }
          }
          st = TxnState(None, None, Vector.empty)
        case op if dataOps(op) =>
          st = st.copy(changes = st.changes :+ m)
        case _ => ()
      }
    }
    if (st.beginLsn.isEmpty && st.changes.isEmpty) state.remove()
    else {
      state.update(st)
      staleTxnTtl.foreach(state.setTimeoutDuration)
    }
    out.result().iterator
  }
}
