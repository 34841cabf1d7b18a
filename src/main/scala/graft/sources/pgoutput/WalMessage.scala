package graft.sources.pgoutput

import java.time.Instant

/** Log sequence number: `{xlog_file:int32, xlog_offset:int32}`
  * (reference: lib/walex/decoder/decoder.ex:271-272). Packed into one Long
  * (`file << 32 | offset`) so it is orderable / watermarkable in Spark;
  * display form is `"HI/LO"` upper-hex (lib/walex/event/event.ex:170-175).
  */
final case class Lsn(file: Int, offset: Int) {
  def toLong: Long = (file.toLong << 32) | (offset.toLong & 0xFFFFFFFFL)
  override def toString: String =
    java.lang.Integer.toHexString(file).toUpperCase + "/" +
      java.lang.Integer.toHexString(offset).toUpperCase
}

object Lsn {
  def fromLong(v: Long): Lsn = Lsn((v >>> 32).toInt, (v & 0xFFFFFFFFL).toInt)
  /** Parse `"HI/LO"` hex form. */
  def parse(s: String): Lsn = {
    val Array(hi, lo) = s.split("/")
    Lsn(java.lang.Long.parseLong(hi, 16).toInt, java.lang.Long.parseLong(lo, 16).toInt)
  }
}

/** One cell of a decoded tuple (reference: lib/walex/decoder/decoder.ex:218-239). */
sealed trait Cell
object Cell {
  /** `'n'` tag — SQL NULL. */
  case object Null extends Cell
  /** `'u'` tag — unchanged TOAST value (present in old image only).
    * Must NOT register as a change in update diffs (decoder.ex:226-227).
    */
  case object UnchangedToast extends Cell
  /** `'t'` tag — text wire format value. */
  final case class Text(value: String) extends Cell
}

/** Replica identity of a relation (reference: decoder.ex:106-112). */
sealed abstract class ReplicaIdentity(val code: Char)
object ReplicaIdentity {
  case object Default    extends ReplicaIdentity('d')
  case object Nothing    extends ReplicaIdentity('n')
  case object AllColumns extends ReplicaIdentity('f')
  case object Index      extends ReplicaIdentity('i')
  def fromCode(c: Char): ReplicaIdentity = c match {
    case 'd' => Default
    case 'n' => Nothing
    case 'f' => AllColumns
    case 'i' => Index
    case other => throw new IllegalArgumentException(s"unknown replica identity '$other'")
  }
}

/** Decoded pgoutput message ADT — the 10 message shapes of the logical
  * replication protocol v1 (reference: lib/walex/decoder/decoder.ex:8-36).
  */
sealed trait WalMessage

object WalMessage {

  final case class Begin(finalLsn: Lsn, commitTimestamp: Instant, xid: Long)
      extends WalMessage

  final case class Commit(flags: Int, lsn: Lsn, endLsn: Lsn, commitTimestamp: Instant)
      extends WalMessage

  final case class Origin(originLsn: Lsn, name: String) extends WalMessage

  final case class RelationColumn(key: Boolean, name: String, typeOid: Int, typeModifier: Int)

  final case class Relation(
      id: Int,
      namespace: String,
      name: String,
      replicaIdentity: ReplicaIdentity,
      columns: Seq[RelationColumn])
      extends WalMessage

  /** Custom-type announcement; patches the relation registry by OID
    * (reference: lib/walex/replication/publisher.ex:79-95).
    */
  final case class PgType(id: Int, namespace: String, name: String) extends WalMessage

  final case class Insert(relationId: Int, tuple: IndexedSeq[Cell]) extends WalMessage

  /** Update in its three wire shapes: new-only, `O`+new (REPLICA IDENTITY
    * FULL) or `K`+new (USING INDEX) (reference: decoder.ex:134-164).
    */
  final case class Update(
      relationId: Int,
      oldKind: Option[Char], // 'O' full old tuple | 'K' key tuple
      oldTuple: Option[IndexedSeq[Cell]],
      tuple: IndexedSeq[Cell])
      extends WalMessage

  /** Delete with `K` or `O` old image (reference: decoder.ex:166-181). */
  final case class Delete(relationId: Int, oldKind: Char, oldTuple: IndexedSeq[Cell])
      extends WalMessage

  final case class Truncate(
      cascade: Boolean,
      restartIdentity: Boolean,
      relationIds: Seq[Int])
      extends WalMessage

  final case class Unsupported(raw: Array[Byte]) extends WalMessage
}
