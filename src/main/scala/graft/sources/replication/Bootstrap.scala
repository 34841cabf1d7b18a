package graft.sources.replication

import graft.sources.cdc.WalSegments
import graft.sources.pgoutput.{Cell, Lsn, PgOutputEncoder, ReplicaIdentity, WalMessage}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Consistent snapshot-then-stream BOOTSTRAP — the initial-sync step the
  * reference leaves to its users (walex starts at the slot and never
  * backfills; reference `README.md` pairs it with hand-rolled syncs).
  * Postgres gives the exact primitive: `CREATE_REPLICATION_SLOT …
  * EXPORT_SNAPSHOT` returns a snapshot name pinned to the slot's
  * consistent point, and a plain-SQL session that runs
  * `SET TRANSACTION SNAPSHOT '<name>'` inside REPEATABLE READ sees the
  * database EXACTLY as of that point. Reading the published tables under
  * that snapshot and then streaming from the consistent point yields a
  * replica with no gap and no overlap:
  *  - a transaction committed before slot creation is in the snapshot and
  *    never streamed (the slot starts past it);
  *  - a transaction committed after is streamed and NOT in the snapshot
  *    (snapshot isolation), even if it committed while the snapshot reads
  *    were still running.
  *
  * The snapshot lands in the SAME WAL-segment layout the streaming tailer
  * appends to: each chunk becomes one segment holding a synthetic
  * transaction (Relation header + Begin/Insert…/Commit at the consistent
  * LSN, real table OIDs and attribute type OIDs from the catalog), so the
  * DSv2 source replays bootstrap rows as ordinary inserts — decoders,
  * typed records, dispatch and the delivery ledger all apply unchanged —
  * and [[ReplicationTailer]]'s commit-LSN replay floor lands exactly at
  * the consistent point, deduplicating any stream overlap by
  * construction.
  *
  * Scale notes: rows stream through JDBC cursor-style (one chunk of
  * frames in memory at a time, `rowsPerTxn` bounds segment size); the
  * writer is the Hadoop FileSystem API, so `walDir` may be object
  * storage; a huge table bootstraps as many segments which the source
  * then decodes in parallel.
  */
object Bootstrap {

  final case class Result(consistentLsn: Long, snapshotName: String,
      tables: Seq[String], rows: Long, segments: Int)

  /** Run the bootstrap. `client` must be a fresh, connected replication
    * session with NO slot created yet (the slot is created here, durably,
    * exporting its snapshot); `connect` opens the plain-SQL lane (the
    * pure-JDK [[graft.sources.jdbc.GraftPgDriver]] or stock pgjdbc).
    * After this returns, `client.startReplication(slot, publication,
    * startLsn = result.consistentLsn)` continues the stream seamlessly —
    * or hand the client to a [[ReplicationTailer]], whose recovered
    * replay floor is exactly the consistent point.
    */
  def snapshotToSegments(client: PgReplicationClient,
      connect: () => java.sql.Connection,
      slot: String, publication: String, walDir: String,
      hadoopConf: Configuration = WalSegments.localConf,
      rowsPerTxn: Int = 65536,
      afterSlot: () => Unit = () => ()): Result = {
    // catalog probes BEFORE the slot: the exported snapshot dies on the
    // replication connection's next command
    if (!client.publicationExists(publication))
      throw new java.io.IOException(s"publication $publication does not exist")
    val tables = client.publicationTables(publication)
    val (lsn, snap) = client.createSlotExported(slot)
    // test seam for the boundary theorem: work committed HERE — after the
    // consistent point, before any snapshot read — must reach the replica
    // via the STREAM only (snapshot isolation keeps it out of the reads)
    afterSlot()

    val (fs, dirPath) = WalSegments.fsFor(walDir, hadoopConf)
    fs.mkdirs(dirPath)
    WalSegments.writePublication(walDir, publication, tables, hadoopConf)
    var segIdx = WalSegments.nextSegmentIndex(walDir, hadoopConf)
    val firstSeg = segIdx
    var totalRows = 0L
    val at = Lsn.fromLong(lsn)
    val ts = java.time.Instant.now() // snapshot-taken-at; carried in Begin/Commit

    val conn = connect()
    try {
      // the pure-JDK driver exposes the prepared surface only — utility
      // statements run through it just as well (extended protocol)
      def exec(sql: String): Unit = {
        val st = conn.prepareStatement(sql)
        try { st.executeUpdate(); () } finally st.close()
      }
      exec("BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ")
      exec(s"SET TRANSACTION SNAPSHOT '${snap.replace("'", "''")}'")

      tables.foreach { qualified =>
        val Array(schema, rel) = qualified.split("\\.", 2)
        // real table OID + attribute (name, type oid, typmod, pkey) — the
        // same Relation message the server itself would send
        val meta = conn.prepareStatement(
          """SELECT c.oid, a.attname, a.atttypid, a.atttypmod,
            |  COALESCE((SELECT true FROM pg_index i
            |    WHERE i.indrelid = c.oid AND i.indisprimary
            |      AND a.attnum = ANY(i.indkey)), false)
            |FROM pg_attribute a
            |JOIN pg_class c ON a.attrelid = c.oid
            |JOIN pg_namespace n ON c.relnamespace = n.oid
            |WHERE n.nspname = ? AND c.relname = ?
            |  AND a.attnum > 0 AND NOT a.attisdropped
            |ORDER BY a.attnum""".stripMargin)
        meta.setString(1, schema)
        meta.setString(2, rel)
        val mrs = meta.executeQuery()
        var relId = 0
        val cols = Vector.newBuilder[WalMessage.RelationColumn]
        while (mrs.next()) {
          relId = mrs.getString(1).toInt
          cols += WalMessage.RelationColumn(
            key = mrs.getString(5) == "t" || mrs.getString(5) == "true",
            name = mrs.getString(2),
            typeOid = mrs.getString(3).toInt,
            typeModifier = mrs.getString(4).toInt)
        }
        mrs.close(); meta.close()
        val columns = cols.result()
        require(columns.nonEmpty, s"table $qualified has no columns")
        val relation = PgOutputEncoder.encode(WalMessage.Relation(
          relId, schema, rel, ReplicaIdentity.Default, columns))

        // identifiers are interpolated (not bindable) — double any embedded
        // quote so a legitimately-quoted relation name cannot break out
        def ident(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
        val q = conn.prepareStatement(
          s"SELECT * FROM ${ident(schema)}.${ident(rel)}")
        val rs = q.executeQuery()
        val n = columns.length
        val chunk = Vector.newBuilder[Array[Byte]]
        var inChunk = 0
        def flushChunk(): Unit = {
          val rows = chunk.result()
          if (rows.nonEmpty) {
            // synthetic xid per chunk, parked far above live ranges so a
            // same-micro-batch real transaction can never share it
            val xid = 0x7F000000L + segIdx
            val frames = Vector(relation,
              PgOutputEncoder.encode(WalMessage.Begin(at, ts, xid))) ++
              rows :+
              PgOutputEncoder.encode(WalMessage.Commit(0, at, at, ts))
            WalSegments.write(fs,
              new Path(dirPath, WalSegments.segmentName(segIdx)), frames)
            segIdx += 1
          }
          chunk.clear(); inChunk = 0
        }
        while (rs.next()) {
          val cells = IndexedSeq.tabulate(n) { i =>
            val v = rs.getString(i + 1)
            if (rs.wasNull() || v == null) Cell.Null else Cell.Text(v)
          }
          chunk += PgOutputEncoder.encode(WalMessage.Insert(relId, cells))
          totalRows += 1
          inChunk += 1
          if (inChunk >= rowsPerTxn) flushChunk()
        }
        flushChunk()
        rs.close(); q.close()
      }
      exec("COMMIT")
    } finally conn.close()

    Result(lsn, snap, tables, totalRows, segIdx - firstSeg)
  }
}
