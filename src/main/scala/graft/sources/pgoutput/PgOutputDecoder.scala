package graft.sources.pgoutput

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import graft.functions.PgTextCast

/** Binary decoder for the `pgoutput` logical-replication plugin protocol
  * (proto_version 1). Message layout is public PostgreSQL documentation
  * ("Logical Streaming Replication Protocol", protocol.sgml); the reference
  * implements the same ten shapes at lib/walex/decoder/decoder.ex:67-216.
  *
  * Pure function `Array[Byte] => WalMessage`; no Spark dependency, so it is
  * usable from a DataSource V2 reader, a `map` over `Dataset[Array[Byte]]`,
  * or plain unit tests.
  */
object PgOutputDecoder {

  def decode(bytes: Array[Byte]): WalMessage = {
    if (bytes == null || bytes.isEmpty) return WalMessage.Unsupported(bytes)
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    try {
      buf.get() match {
        case 'B' => decodeBegin(buf)
        case 'C' => decodeCommit(buf)
        case 'O' => decodeOrigin(buf)
        case 'R' => decodeRelation(buf)
        case 'Y' => decodeType(buf)
        case 'I' => decodeInsert(buf)
        case 'U' => decodeUpdate(buf)
        case 'D' => decodeDelete(buf)
        case 'T' => decodeTruncate(buf)
        case _   => WalMessage.Unsupported(bytes)
      }
    } catch {
      case _: Exception => WalMessage.Unsupported(bytes)
    }
  }

  // ---- per-message decoders (decoder.ex:72-216) ----

  private def decodeBegin(buf: ByteBuffer): WalMessage.Begin = {
    val lsn = readLsn(buf)
    val ts  = PgTextCast.pgMicrosToInstant(buf.getLong)
    val xid = buf.getInt.toLong & 0xFFFFFFFFL
    WalMessage.Begin(lsn, ts, xid)
  }

  private def decodeCommit(buf: ByteBuffer): WalMessage.Commit = {
    val flags  = buf.get().toInt
    val lsn    = readLsn(buf)
    val endLsn = readLsn(buf)
    val ts     = PgTextCast.pgMicrosToInstant(buf.getLong)
    WalMessage.Commit(flags, lsn, endLsn, ts)
  }

  private def decodeOrigin(buf: ByteBuffer): WalMessage.Origin =
    WalMessage.Origin(readLsn(buf), readCString(buf))

  private def decodeRelation(buf: ByteBuffer): WalMessage.Relation = {
    val id        = buf.getInt
    val namespace = readCString(buf)
    val name      = readCString(buf)
    val identity  = ReplicaIdentity.fromCode(buf.get().toChar)
    val ncols     = buf.getShort.toInt
    val cols = (0 until ncols).map { _ =>
      val flags   = buf.get().toInt
      val colName = readCString(buf)
      val oid     = buf.getInt
      val typeMod = buf.getInt
      WalMessage.RelationColumn(key = (flags & 1) == 1, colName, oid, typeMod)
    }
    WalMessage.Relation(id, namespace, name, identity, cols)
  }

  private def decodeType(buf: ByteBuffer): WalMessage.PgType =
    WalMessage.PgType(buf.getInt, readCString(buf), readCString(buf))

  private def decodeInsert(buf: ByteBuffer): WalMessage.Insert = {
    val relId = buf.getInt
    expect(buf, 'N')
    WalMessage.Insert(relId, readTuple(buf))
  }

  private def decodeUpdate(buf: ByteBuffer): WalMessage.Update = {
    val relId = buf.getInt
    buf.get().toChar match {
      case 'N' =>
        WalMessage.Update(relId, None, None, readTuple(buf))
      case k @ ('O' | 'K') =>
        val old = readTuple(buf)
        expect(buf, 'N')
        WalMessage.Update(relId, Some(k), Some(old), readTuple(buf))
      case other =>
        throw new IllegalArgumentException(s"unexpected update sub-tag '$other'")
    }
  }

  private def decodeDelete(buf: ByteBuffer): WalMessage.Delete = {
    val relId = buf.getInt
    buf.get().toChar match {
      case k @ ('O' | 'K') => WalMessage.Delete(relId, k, readTuple(buf))
      case other =>
        throw new IllegalArgumentException(s"unexpected delete sub-tag '$other'")
    }
  }

  private def decodeTruncate(buf: ByteBuffer): WalMessage.Truncate = {
    val nRels   = buf.getInt
    val options = buf.get().toInt
    val ids     = (0 until nRels).map(_ => buf.getInt)
    WalMessage.Truncate(
      cascade = (options & 1) == 1,
      restartIdentity = (options & 2) == 2,
      relationIds = ids)
  }

  // ---- primitives ----

  private def readLsn(buf: ByteBuffer): Lsn = Lsn(buf.getInt, buf.getInt)

  /** NUL-terminated string; end-of-frame also terminates (the reference
    * reads Origin's name as the frame remainder with no trailing NUL —
    * decoder_test.exs:46-52 — and real servers send both forms).
    */
  private def readCString(buf: ByteBuffer): String = {
    val start = buf.position()
    while (buf.position() < buf.limit() && buf.get(buf.position()) != 0)
      buf.position(buf.position() + 1)
    val len = buf.position() - start
    val arr = new Array[Byte](len)
    buf.position(start)
    buf.get(arr)
    if (buf.position() < buf.limit()) buf.get() // consume NUL if present
    new String(arr, StandardCharsets.UTF_8)
  }

  /** TupleData: int16 column count then per-cell tag `n`/`u`/`t`+len
    * (reference: decoder.ex:218-239).
    */
  private def readTuple(buf: ByteBuffer): IndexedSeq[Cell] = {
    val ncols = buf.getShort.toInt
    (0 until ncols).map { _ =>
      buf.get().toChar match {
        case 'n' => Cell.Null
        case 'u' => Cell.UnchangedToast
        case 't' =>
          val len = buf.getInt
          val arr = new Array[Byte](len)
          buf.get(arr)
          Cell.Text(new String(arr, StandardCharsets.UTF_8))
        case other =>
          throw new IllegalArgumentException(s"unknown cell tag '$other'")
      }
    }
  }

  private def expect(buf: ByteBuffer, tag: Char): Unit = {
    val got = buf.get().toChar
    if (got != tag)
      throw new IllegalArgumentException(s"expected '$tag' tuple tag, got '$got'")
  }
}

/** Test/fixture-side encoder for the same protocol — lets the suite build
  * byte-exact pgoutput frames programmatically (round-trip property tests)
  * instead of copying captured fixtures.
  */
object PgOutputEncoder {
  import WalMessage._

  def encode(msg: WalMessage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d   = new java.io.DataOutputStream(out)
    def cstr(s: String): Unit = { d.write(s.getBytes(StandardCharsets.UTF_8)); d.write(0) }
    def lsn(l: Lsn): Unit = { d.writeInt(l.file); d.writeInt(l.offset) }
    def micros(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000L - 946684800000000L
    def tuple(cells: IndexedSeq[Cell]): Unit = {
      d.writeShort(cells.length)
      cells.foreach {
        case Cell.Null           => d.write('n')
        case Cell.UnchangedToast => d.write('u')
        case Cell.Text(v) =>
          val b = v.getBytes(StandardCharsets.UTF_8)
          d.write('t'); d.writeInt(b.length); d.write(b)
      }
    }
    msg match {
      case Begin(l, ts, xid) =>
        d.write('B'); lsn(l); d.writeLong(micros(ts)); d.writeInt(xid.toInt)
      case Commit(flags, l, e, ts) =>
        d.write('C'); d.write(flags); lsn(l); lsn(e); d.writeLong(micros(ts))
      case Origin(l, n) =>
        d.write('O'); lsn(l); cstr(n)
      case Relation(id, ns, n, ident, cols) =>
        d.write('R'); d.writeInt(id); cstr(ns); cstr(n); d.write(ident.code)
        d.writeShort(cols.length)
        cols.foreach { c =>
          d.write(if (c.key) 1 else 0); cstr(c.name); d.writeInt(c.typeOid); d.writeInt(c.typeModifier)
        }
      case PgType(id, ns, n) =>
        d.write('Y'); d.writeInt(id); cstr(ns); cstr(n)
      case Insert(rel, t) =>
        d.write('I'); d.writeInt(rel); d.write('N'); tuple(t)
      case Update(rel, Some(k), Some(old), t) =>
        d.write('U'); d.writeInt(rel); d.write(k); tuple(old); d.write('N'); tuple(t)
      case Update(rel, _, _, t) =>
        d.write('U'); d.writeInt(rel); d.write('N'); tuple(t)
      case Delete(rel, k, old) =>
        d.write('D'); d.writeInt(rel); d.write(k); tuple(old)
      case Truncate(cascade, restart, ids) =>
        d.write('T'); d.writeInt(ids.length)
        d.write((if (cascade) 1 else 0) | (if (restart) 2 else 0))
        ids.foreach(d.writeInt)
      case Unsupported(raw) => d.write(raw)
    }
    d.flush()
    out.toByteArray
  }
}
