package graft

import graft.sources.cdc.{CdcSourceProvider, WalSegments}
import graft.sources.replication.{PgReplicationClient, ReplicationTailer}
import graft.streaming.TxnAssembler
import graft.operators.cdc.ChangeStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The LIVE replication lane end to end, against a real walsender: wire
  * client → CopyBoth stream → segment tailer → DSv2 source → assembly →
  * Event view, with the flushed-LSN ack verified against the server's own
  * `pg_replication_slots.confirmed_flush_lsn` — the reference's
  * production topology (a replication connection feeding the event
  * pipeline, lib/walex/replication/server.ex), not a fixture of it.
  * Auto-skipped where no PostgreSQL installation exists.
  */
class LiveReplicationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("START_REPLICATION stream → tailer segments → events; acks advance confirmed_flush_lsn") {
    assume(LivePgHarness.available, "no usable PostgreSQL installation — skipping")
    val cluster = LivePgHarness.provision()
    var client: PgReplicationClient = null
    try {
      cluster.psql("""
        CREATE TABLE items (id bigint PRIMARY KEY, label text, n bigint);
        ALTER TABLE items REPLICA IDENTITY FULL;
        CREATE PUBLICATION repl_pub FOR TABLE items""")
      cluster.psql(
        "SELECT pg_create_logical_replication_slot('repl_slot', 'pgoutput')")

      // live walsender session over the unix socket (trust auth; the JVM
      // connects directly — no JDBC driver exists or is needed)
      client = new PgReplicationClient(PgReplicationClient.Endpoint(
        unixSocketDir = Some(cluster.sock),
        database = "postgres", user = "postgres"))
        .connect()
        .startReplication("repl_slot", "repl_pub")

      val walDir = s"${cluster.base}/wal"
      val tailer = new ReplicationTailer(client, walDir, framesPerSegment = 4)

      // round 1: one multi-row transaction + an update
      cluster.psql("""
        BEGIN;
        INSERT INTO items VALUES (1, 'one', 10), (2, 'two', 20);
        COMMIT;
        UPDATE items SET n = 21 WHERE id = 2""")
      tailer.runUntilIdle(idleMs = 4000)
      val afterRound1 = WalSegments.listSegments(walDir).size
      assert(afterRound1 >= 1, "round-1 traffic produced no segments")

      // round 2 on the SAME live stream: later segments must replay the
      // cached Relation metadata (the server sent it once, in round 1)
      cluster.psql("DELETE FROM items WHERE id = 1")
      tailer.runUntilIdle(idleMs = 4000)
      val segments = WalSegments.listSegments(walDir)
      assert(segments.size > afterRound1, "round-2 traffic produced no new segment")
      val lastSegFrames = {
        val it = WalSegments.readFrames(segments.last)
        try it.toList finally it.close()
      }
      assert(lastSegFrames.exists(_.headOption.contains('R'.toByte)),
        "later segments must replay cached Relation metadata at their head")

      // the tailer acked what it wrote: the slot's confirmed position
      // moved past the slot-creation point (server-side proof of S6)
      val confirmed = PgReplicationClient.parseLsn(cluster.psql(
        "SELECT confirmed_flush_lsn FROM pg_replication_slots " +
          "WHERE slot_name = 'repl_slot'").trim)
      val created = PgReplicationClient.parseLsn(cluster.psql(
        "SELECT restart_lsn FROM pg_replication_slots WHERE slot_name = 'repl_slot'").trim)
      assert(confirmed > 0 && confirmed >= created,
        s"ack did not advance confirmed_flush_lsn ($confirmed vs $created)")

      // the produced segments feed the standard pipeline
      WalSegments.writePublication(walDir, "repl_pub", Seq("public.items"))
      val raw = spark.readStream.format(classOf[CdcSourceProvider].getName)
        .option("path", walDir).option("publication", "repl_pub").load()
      val events = ChangeStream.eventsFromAssembled(TxnAssembler.assemble(raw).toDF())
      val q = events.writeStream.format("memory").queryName("t_liverepl")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val rows = spark.table("t_liverepl").orderBy("lsn", "seq").collect()
      val byOp = rows.groupBy(_.getAs[String]("type"))
      assert(byOp.getOrElse("insert", Array.empty).length == 2)
      assert(byOp("update").length == 1 && byOp("delete").length == 1)
      // UPDATE events carry `changes` (not old_record — reference
      // README.md:215-216 semantics): the real old/new images diff to it
      val changes = byOp("update").head
        .getAs[Map[String, org.apache.spark.sql.Row]]("changes")
      assert(changes.keySet == Set("n"), s"changes: ${changes.keySet}")
      assert(changes("n").getAs[String]("old_value") == "20"
        && changes("n").getAs[String]("new_value") == "21")
      assert(byOp("update").head.getAs[Map[String, String]]("new_record")("n") == "21")
      // the two inserts share one transaction: same xid through assembly
      assert(byOp("insert").map(_.getAs[Long]("xid")).distinct.length == 1)
      assert(byOp("delete").head.getAs[Map[String, String]]("old_record")("label") == "one")
    } finally {
      if (client != null) client.close()
      cluster.stop()
    }
  }

  test("durable slot resumes after disconnect: offline traffic delivered, nothing duplicated") {
    assume(LivePgHarness.available, "no usable PostgreSQL installation — skipping")
    val cluster = LivePgHarness.provision()
    try {
      cluster.psql("""
        CREATE TABLE ledger (id bigint PRIMARY KEY, v bigint);
        ALTER TABLE ledger REPLICA IDENTITY FULL;
        CREATE PUBLICATION dur_pub FOR TABLE ledger""")
      val walDir = s"${cluster.base}/wal-dur"
      def session(): (PgReplicationClient, ReplicationTailer) = {
        val c = new PgReplicationClient(PgReplicationClient.Endpoint(
          unixSocketDir = Some(cluster.sock),
          database = "postgres", user = "postgres"))
          .connect()
          .createSlot("dur_slot", temporary = false) // S4: durable, resumable
          .startReplication("dur_slot", "dur_pub")
        (c, new ReplicationTailer(c, walDir, framesPerSegment = 4))
      }
      // session 1: two rows arrive, are segmented, and ACKED
      val (c1, t1) = session()
      cluster.psql("INSERT INTO ledger VALUES (1, 10), (2, 20)")
      t1.runUntilIdle(idleMs = 4000)
      Thread.sleep(500) // let the walsender process the final ack before EOF
      c1.close() // connection dies; the DURABLE slot and its position survive
      // offline traffic: committed while no consumer is connected
      cluster.psql("INSERT INTO ledger VALUES (3, 30)")
      cluster.psql("UPDATE ledger SET v = 11 WHERE id = 1")
      // session 2 resumes the SAME slot from confirmed_flush_lsn: the
      // tailer appends new segments after the existing ones
      val (c2, t2) = session()
      t2.runUntilIdle(idleMs = 4000)
      c2.close()
      WalSegments.writePublication(walDir, "dur_pub", Seq("public.ledger"))
      val raw = spark.readStream.format(classOf[CdcSourceProvider].getName)
        .option("path", walDir).option("publication", "dur_pub").load()
      val events = ChangeStream.eventsFromAssembled(TxnAssembler.assemble(raw).toDF())
      val q = events.writeStream.format("memory").queryName("t_durable")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val rows = spark.table("t_durable").orderBy("lsn", "seq").collect()
      val ids = rows.filter(_.getAs[String]("type") == "insert")
        .map(_.getAs[Map[String, String]]("new_record")("id")).sorted.toSeq
      // exactly once each: the ack before disconnect means the resumed
      // stream replays nothing already segmented
      assert(ids == Seq("1", "2", "3"), s"offline insert lost or duplicated: $ids")
      assert(rows.count(_.getAs[String]("type") == "update") == 1)
    } finally cluster.stop()
  }

  test("Graft.replicate facade: live publication check, temporary slot lifecycle, events end to end") {
    assume(LivePgHarness.available, "no usable PostgreSQL installation — skipping")
    import graft.streaming.{Engine, Graft, GraftConfig}
    val cluster = LivePgHarness.provision()
    try {
      cluster.psql("""
        CREATE TABLE acct (id bigint PRIMARY KEY, v bigint);
        ALTER TABLE acct REPLICA IDENTITY FULL;
        CREATE PUBLICATION face_pub FOR TABLE acct""")
      val config = GraftConfig("face_demo",
        database = Some("postgres"), username = Some("postgres"),
        publication = Some("face_pub"))
      // S2 against the real catalog: a wrong publication fails before any slot
      intercept[IllegalStateException] {
        Graft.replicate(config.copy(publication = Some("nope")),
          s"${cluster.base}/wal-nope", unixSocketDir = Some(cluster.sock))
      }
      val walDir = s"${cluster.base}/wal-face"
      val repl = Graft.replicate(config, walDir,
        unixSocketDir = Some(cluster.sock), framesPerSegment = 4, idleMs = 1000)
      try {
        // temporary slot (durableSlot=false) exists while connected — the
        // reference's S3 semantics on an actual server
        assert(cluster.psql("SELECT temporary FROM pg_replication_slots " +
          "WHERE slot_name = 'face_demo_graft'").trim == "t")
        cluster.psql("INSERT INTO acct VALUES (1, 5), (2, 6)")
        cluster.psql("UPDATE acct SET v = 7 WHERE id = 1")
        // the daemon pump flushes on idle; wait for segments
        val deadline = System.currentTimeMillis() + 30000
        while (WalSegments.listSegments(walDir).isEmpty
          && System.currentTimeMillis() < deadline) Thread.sleep(250)
        assert(WalSegments.listSegments(walDir).nonEmpty, "no segments within 30 s")
        Thread.sleep(1500) // let the update's segment flush too
        // standard engine over the replicated segments
        WalSegments.writePublication(walDir, "face_pub", Seq("public.acct"))
        val raw = spark.readStream.format(classOf[CdcSourceProvider].getName)
          .option("path", walDir).option("publication", "face_pub").load()
        val events = ChangeStream.eventsFromAssembled(TxnAssembler.assemble(raw).toDF())
        val got = new java.util.concurrent.atomic.AtomicInteger(0)
        val engine = new Engine().onEvent("acct") { df => got.addAndGet(df.count().toInt); () }
        val q = engine.start(events, trigger = Trigger.AvailableNow(), queryName = "t_face")
        q.awaitTermination(120000)
        assert(got.get() >= 3, s"expected the 2 inserts + update, got ${got.get()}")
      } finally repl.close()
      // closing the connection drops the TEMPORARY slot server-side
      val deadline = System.currentTimeMillis() + 15000
      var slots = ""
      do {
        slots = cluster.psql("SELECT count(*) FROM pg_replication_slots " +
          "WHERE slot_name = 'face_demo_graft'").trim
        if (slots != "0") Thread.sleep(250)
      } while (slots != "0" && System.currentTimeMillis() < deadline)
      assert(slots == "0", "temporary slot must die with its connection (S3)")
    } finally cluster.stop()
  }
}
