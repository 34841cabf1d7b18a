package graft

import java.time.Instant

import graft.sources.pgoutput._
import org.scalatest.funsuite.AnyFunSuite

/** Decoder ground truth. Covers the same message-shape matrix as the
  * reference's decoder suite (reference: test/walex/decoder/decoder_test.exs:22-227)
  * — Begin/Commit/Origin/Relation/Type/Insert (incl. NULL + unchanged-TOAST
  * cells)/Update (3 identity shapes)/Delete (K and O)/Truncate (options) —
  * using a test-side binary encoder + hand-built frames rather than captured
  * byte strings.
  */
class PgOutputDecoderSpec extends AnyFunSuite {
  import WalMessage._

  private def roundTrip(m: WalMessage): Unit =
    assert(PgOutputDecoder.decode(PgOutputEncoder.encode(m)) == m)

  private val ts = Instant.parse("2019-07-18T17:02:35.726322Z")

  test("begin: hand-built frame decodes lsn/ts/xid") {
    // 'B' + lsn{2, 2817828992} + µs since pg epoch + xid 619
    val buf = java.nio.ByteBuffer.allocate(1 + 8 + 8 + 4)
    buf.put('B'.toByte).putInt(2).putInt(-1477138304) // 2817828992 as signed int32
    buf.putLong(616784555726322L).putInt(619)
    val got = PgOutputDecoder.decode(buf.array())
    assert(got == Begin(Lsn(2, -1477138304), ts, 619L))
    assert(got.asInstanceOf[Begin].finalLsn.toLong == (2L << 32 | 2817828992L))
    assert(got.asInstanceOf[Begin].finalLsn.toString == "2/A7F4A880")
  }

  test("commit round-trip") {
    roundTrip(Commit(0, Lsn(2, 123456), Lsn(2, 123512), ts))
  }

  test("origin round-trip") {
    roundTrip(Origin(Lsn(0, 42), "origin_name"))
  }

  test("relation with key flags and identity codes") {
    val rel = Relation(16386, "public", "user", ReplicaIdentity.AllColumns,
      Seq(
        RelationColumn(key = true, "id", 23, -1),
        RelationColumn(key = false, "email", 25, -1),
        RelationColumn(key = false, "tags", 1009, -1)))
    roundTrip(rel)
    for (ident <- Seq(ReplicaIdentity.Default, ReplicaIdentity.Nothing, ReplicaIdentity.Index))
      roundTrip(rel.copy(replicaIdentity = ident))
  }

  test("custom type message") {
    roundTrip(PgType(35756, "public", "example_type"))
  }

  test("insert incl. NULL and unchanged-TOAST cells") {
    roundTrip(Insert(16386, IndexedSeq(Cell.Text("baz"), Cell.Text("560"))))
    roundTrip(Insert(16386, IndexedSeq(Cell.Null, Cell.Text("560"))))
    roundTrip(Insert(16386, IndexedSeq(Cell.UnchangedToast, Cell.Text("560"))))
  }

  test("update: default identity (new only)") {
    roundTrip(Update(16386, None, None, IndexedSeq(Cell.Text("baz"), Cell.Text("560"))))
  }

  test("update: replica identity FULL (O + N)") {
    roundTrip(Update(16386, Some('O'),
      Some(IndexedSeq(Cell.Text("old"), Cell.Text("1"))),
      IndexedSeq(Cell.Text("new"), Cell.Text("1"))))
  }

  test("update: USING INDEX (K + N)") {
    roundTrip(Update(16386, Some('K'),
      Some(IndexedSeq(Cell.Text("1"), Cell.Null)),
      IndexedSeq(Cell.Text("1"), Cell.Text("new"))))
  }

  test("delete: K and O variants") {
    roundTrip(Delete(16386, 'K', IndexedSeq(Cell.Text("1"), Cell.Null)))
    roundTrip(Delete(16386, 'O', IndexedSeq(Cell.Text("1"), Cell.Text("old"))))
  }

  test("truncate incl. cascade / restart_identity options") {
    roundTrip(Truncate(cascade = false, restartIdentity = false, Seq(16386)))
    roundTrip(Truncate(cascade = true, restartIdentity = false, Seq(16386, 16387)))
    roundTrip(Truncate(cascade = false, restartIdentity = true, Seq(16386)))
    roundTrip(Truncate(cascade = true, restartIdentity = true, Seq(16386, 16387, 16400)))
  }

  test("utf-8 in strings and cells") {
    roundTrip(Relation(1, "pübli¢", "tablé", ReplicaIdentity.Default,
      Seq(RelationColumn(key = false, "naïve", 25, -1))))
    roundTrip(Insert(1, IndexedSeq(Cell.Text("héllo wörld 🚀"))))
  }

  test("unknown tag → Unsupported") {
    PgOutputDecoder.decode(Array('Z'.toByte, 1, 2)) match {
      case Unsupported(raw) => assert(raw.sameElements(Array('Z'.toByte, 1, 2)))
      case other            => fail(other.toString)
    }
  }

  test("truncated frame → Unsupported (never throws)") {
    val full = PgOutputEncoder.encode(Insert(16386, IndexedSeq(Cell.Text("abc"))))
    for (n <- 1 until full.length) {
      PgOutputDecoder.decode(full.take(n)) match {
        case Unsupported(_) => ()
        case other          => fail(s"prefix $n decoded to $other")
      }
    }
  }

  test("lsn string / long round-trips") {
    val l = Lsn(2, -1477138304)
    assert(Lsn.fromLong(l.toLong) == l)
    assert(Lsn.parse(l.toString) == l)
    assert(Lsn(0, 0).toString == "0/0")
  }

  test("relation registry: schema build + custom type patch") {
    val reg = new RelationRegistry
    reg.onMessage(PgType(99999, "public", "citext"))
    reg.onMessage(Relation(16386, "public", "user", ReplicaIdentity.AllColumns,
      Seq(
        RelationColumn(key = true, "id", 23, -1),
        RelationColumn(key = false, "email", 99999, -1),
        RelationColumn(key = false, "age", 23, -1),
        RelationColumn(key = false, "books", 1015, -1),
        RelationColumn(key = false, "meta", 3802, -1),
        RelationColumn(key = false, "created_at", 1184, -1))))
    val schema = reg.schemaOf(16386).get
    import org.apache.spark.sql.types._
    assert(schema.fieldNames.toSeq ==
      Seq("id", "email", "age", "books", "meta", "created_at"))
    assert(schema("id").dataType == IntegerType)
    assert(schema("email").dataType == StringType) // citext → string lane
    assert(schema("books").dataType == ArrayType(StringType))
    assert(schema("meta").dataType == StringType)  // jsonb string lane
    assert(schema("created_at").dataType == TimestampType)
    assert(reg.typeName(99999) == "citext")
    assert(reg.typeName(16) == "bool")
    assert(reg.typeName(1234567) == "1234567")
  }

  test("literal pgoutput wire frames decode exactly (protocol ground truth)") {
    import WalMessage._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val ts = java.time.Instant.parse("2019-07-18T17:02:35.726322Z")

    // Begin {2, 2817828992} / xid 619 (reference: decoder_test.exs:22-29)
    PgOutputDecoder.decode(b(66, 0, 0, 0, 2, 167, 244, 168, 128, 0, 2, 48, 246,
      88, 88, 213, 242, 0, 0, 2, 107)) match {
      case Begin(lsn, t, xid) =>
        assert(lsn.toLong == (2L << 32 | 2817828992L) && t == ts && xid == 619L)
      case other => fail(s"$other")
    }

    // Commit lsn {2,2817828992} end {2,2817829040} (decoder_test.exs:31-44)
    PgOutputDecoder.decode(b(67, 0, 0, 0, 0, 2, 167, 244, 168, 128, 0, 0, 0, 2,
      167, 244, 168, 176, 0, 2, 48, 246, 88, 88, 213, 242)) match {
      case Commit(flags, lsn, end, t) =>
        assert(flags == 0 && lsn.toLong == (2L << 32 | 2817828992L) &&
          end.toLong == (2L << 32 | 2817829040L) && t == ts)
      case other => fail(s"$other")
    }

    // Origin (decoder_test.exs:46-52)
    val origin = b(79, 0, 0, 0, 2, 167, 244, 168, 128) ++ "Elmer Fud".getBytes("UTF-8")
    assert(PgOutputDecoder.decode(origin) ==
      Origin(Lsn(2, 0xA7F4A880.toInt), "Elmer Fud"))

    // Relation 24576 public.foo, cols bar:text, id:int4(key) (decoder_test.exs:54-80)
    PgOutputDecoder.decode(b(82, 0, 0, 96, 0, 112, 117, 98, 108, 105, 99, 0,
      102, 111, 111, 0, 100, 0, 2, 0, 98, 97, 114, 0, 0, 0, 0, 25, 255, 255,
      255, 255, 1, 105, 100, 0, 0, 0, 0, 23, 255, 255, 255, 255)) match {
      case r: Relation =>
        assert(r.id == 24576 && r.namespace == "public" && r.name == "foo")
        assert(r.replicaIdentity == ReplicaIdentity.Default)
        assert(r.columns.map(c => (c.key, c.name, c.typeOid)) ==
          Seq((false, "bar", 25), (true, "id", 23)))
      case other => fail(s"$other")
    }

    // Type 32820 public.example_type (decoder_test.exs:101-110)
    assert(PgOutputDecoder.decode(b(89, 0, 0, 128, 52, 112, 117, 98, 108, 105,
      99, 0, 101, 120, 97, 109, 112, 108, 101, 95, 116, 121, 112, 101, 0)) ==
      PgType(32820, "public", "example_type"))

    // Truncate plain / cascade / restart-identity (decoder_test.exs:112-138)
    assert(PgOutputDecoder.decode(b(84, 0, 0, 0, 1, 0, 0, 0, 96, 0)) ==
      Truncate(cascade = false, restartIdentity = false, Seq(24576)))
    assert(PgOutputDecoder.decode(b(84, 0, 0, 0, 1, 1, 0, 0, 96, 0)) ==
      Truncate(cascade = true, restartIdentity = false, Seq(24576)))
    assert(PgOutputDecoder.decode(b(84, 0, 0, 0, 1, 2, 0, 0, 96, 0)) ==
      Truncate(cascade = false, restartIdentity = true, Seq(24576)))

    // Insert text/null/toast cells (decoder_test.exs:142-168)
    assert(PgOutputDecoder.decode(b(73, 0, 0, 96, 0, 78, 0, 2, 116, 0, 0, 0, 3,
      98, 97, 122, 116, 0, 0, 0, 3, 53, 54, 48)) ==
      Insert(24576, IndexedSeq(Cell.Text("baz"), Cell.Text("560"))))
    assert(PgOutputDecoder.decode(b(73, 0, 0, 96, 0, 78, 0, 2, 110, 116, 0, 0,
      0, 3, 53, 54, 48)) ==
      Insert(24576, IndexedSeq(Cell.Null, Cell.Text("560"))))
    assert(PgOutputDecoder.decode(b(73, 0, 0, 96, 0, 78, 0, 2, 117, 116, 0, 0,
      0, 3, 53, 54, 48)) ==
      Insert(24576, IndexedSeq(Cell.UnchangedToast, Cell.Text("560"))))

    // Update: default / FULL (O+N) / USING INDEX (K+N) (decoder_test.exs:170-206)
    assert(PgOutputDecoder.decode(b(85, 0, 0, 96, 0, 78, 0, 2, 116, 0, 0, 0, 7,
      101, 120, 97, 109, 112, 108, 101, 116, 0, 0, 0, 3, 53, 54, 48)) ==
      Update(24576, None, None, IndexedSeq(Cell.Text("example"), Cell.Text("560"))))
    assert(PgOutputDecoder.decode(b(85, 0, 0, 96, 0, 79, 0, 2, 116, 0, 0, 0, 3,
      98, 97, 122, 116, 0, 0, 0, 3, 53, 54, 48, 78, 0, 2, 116, 0, 0, 0, 7, 101,
      120, 97, 109, 112, 108, 101, 116, 0, 0, 0, 3, 53, 54, 48)) ==
      Update(24576, Some('O'), Some(IndexedSeq(Cell.Text("baz"), Cell.Text("560"))),
        IndexedSeq(Cell.Text("example"), Cell.Text("560"))))
    assert(PgOutputDecoder.decode(b(85, 0, 0, 96, 0, 75, 0, 2, 116, 0, 0, 0, 3,
      98, 97, 122, 110, 78, 0, 2, 116, 0, 0, 0, 7, 101, 120, 97, 109, 112, 108,
      101, 116, 0, 0, 0, 3, 53, 54, 48)) ==
      Update(24576, Some('K'), Some(IndexedSeq(Cell.Text("baz"), Cell.Null)),
        IndexedSeq(Cell.Text("example"), Cell.Text("560"))))

    // Delete: K and O images (decoder_test.exs:208-228)
    assert(PgOutputDecoder.decode(b(68, 0, 0, 96, 0, 75, 0, 2, 116, 0, 0, 0, 7,
      101, 120, 97, 109, 112, 108, 101, 110)) ==
      Delete(24576, 'K', IndexedSeq(Cell.Text("example"), Cell.Null)))
    assert(PgOutputDecoder.decode(b(68, 0, 0, 96, 0, 79, 0, 2, 116, 0, 0, 0, 3,
      98, 97, 122, 116, 0, 0, 0, 3, 53, 54, 48)) ==
      Delete(24576, 'O', IndexedSeq(Cell.Text("baz"), Cell.Text("560"))))
  }

  test("unsupported decode equality is by content") {
    // Unsupported carries the raw bytes; compare via pattern match
    PgOutputDecoder.decode(Array[Byte]()) match {
      case Unsupported(_) => ()
      case other          => fail(other.toString)
    }
  }
}
