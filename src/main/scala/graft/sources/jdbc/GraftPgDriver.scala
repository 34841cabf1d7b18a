package graft.sources.jdbc

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, DatabaseMetaData, PreparedStatement, ResultSet,
  ResultSetMetaData, SQLException, SQLFeatureNotSupportedException}

import graft.sources.pgoutput.OidDatabase
import graft.sources.replication.PgReplicationClient
import graft.sources.replication.PgReplicationClient.Endpoint

/** A minimal, pure-JDK PostgreSQL JDBC driver — exactly the `java.sql`
  * surface the graft JDBC polling lane touches (Driver → Connection →
  * PreparedStatement → ResultSet, plus `DatabaseMetaData.getColumns`),
  * implemented over the same frontend/backend protocol v3 machinery the
  * live replication lane runs ([[PgReplicationClient]] in
  * `replicationMode = false`): unix-socket and TCP transports, trust/
  * cleartext/md5/SCRAM-SHA-256(-PLUS) auth, TLS with pinned-CA and
  * verify-full modes — one wire implementation, two consumers.
  *
  * Queries run over the EXTENDED query protocol (Parse/Bind/Describe/
  * Execute), so `?` placeholders bind as real wire parameters — never
  * string-interpolated — and `setFetchSize` maps onto portal suspension
  * (Execute's row cap + PortalSuspended), streaming large range scans in
  * fetch-sized slices instead of materializing them. All values travel in
  * text format, matching the polling source's all-text change-table
  * schema (the reference's change rows are JSON text the same way,
  * lib/walex/event.ex).
  *
  * Why it exists: no PostgreSQL JDBC jar ships in this sandbox, so the
  * polling lane (S1's JDBC mode) could only ever be verified against a
  * stub driver. This driver closes that gap — LiveJdbcSpec drives the
  * DSv2 source end-to-end against a real PostgreSQL through it. It is
  * also a legitimate production fallback: deployments that already ship
  * the stock pgjdbc driver can keep passing it via the source's `driver`
  * option; nothing in the lane is coupled to this class.
  *
  * Unimplemented `java.sql` methods throw
  * `SQLFeatureNotSupportedException` naming the method — the facade is a
  * reflective proxy (the same device the test stub uses), not 500 lines
  * of dead stubs. The reflective dispatch sits on the per-row getter
  * path; at change-table polling rates this is noise against the network
  * round-trip, and the hot analytics paths never touch JDBC.
  *
  * URL grammar (canonical scheme `jdbc:graftpg:`; `jdbc:postgresql:` is
  * accepted as a drop-in so [[graft.streaming.GraftConfig]]-built URLs
  * work unchanged):
  * {{{
  *   jdbc:graftpg://host:5432/db?user=u&password=p&sslmode=verify-ca&sslrootcert=/ca.pem
  *   jdbc:graftpg:///db?socketDir=/var/run/postgresql&port=5432&user=u
  * }}}
  * An empty authority selects the unix-domain-socket transport
  * (`socketDir` required; `port` names the socket file, Postgres
  * convention). `user`/`password` in `java.util.Properties` override the
  * URL's. `sslmode` takes the [[Endpoint]] values: disable, require,
  * verify-ca, verify.
  *
  * Concurrency contract: one statement executing per connection at a
  * time (a new execute auto-closes the previous cursor), matching how
  * the polling source uses it — driver-side probes are sequential, and
  * each partition reader owns a private connection.
  */
object GraftPgDriver {

  private val prefixes = Seq("jdbc:graftpg:", "jdbc:postgresql:")

  def accepts(url: String): Boolean = prefixes.exists(url.startsWith)

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Idempotent `DriverManager` registration, for the `driver`-option-less
    * path; the polling source's `driver` option instantiates by class
    * name and needs no registration.
    */
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true))
      java.sql.DriverManager.registerDriver(new GraftPgDriver)

  /** URL + properties → wire endpoint (replicationMode=false: a regular
    * backend session, not a walsender).
    */
  def parseEndpoint(url: String, info: java.util.Properties): Endpoint = {
    require(accepts(url), s"not a graft pg url: $url")
    val uri = new java.net.URI(url.stripPrefix("jdbc:"))
    val query: Map[String, String] = Option(uri.getRawQuery).toSeq
      .flatMap(_.split("&").toSeq).filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap
    def opt(k: String): Option[String] =
      Option(info).flatMap(p => Option(p.getProperty(k))).orElse(query.get(k))
    val database = Option(uri.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
      .getOrElse(throw new SQLException(s"no database in url: $url", "3D000"))
    Endpoint(
      host = Option(uri.getHost).getOrElse("localhost"),
      port = if (uri.getPort > 0) uri.getPort
             else query.get("port").map(_.toInt).getOrElse(5432),
      unixSocketDir = query.get("socketDir"),
      database = database,
      user = opt("user").getOrElse(System.getProperty("user.name", "postgres")),
      password = opt("password"),
      applicationName = query.getOrElse("application_name", "graft-jdbc"),
      sslMode = query.getOrElse("sslmode", "disable"),
      sslRootCert = query.get("sslrootcert"),
      replicationMode = false)
  }

  /** `?` placeholders → the wire protocol's `$n`, skipping single-quoted
    * literals (with `''` escapes) and double-quoted identifiers — the
    * only JDBC-ism the polling source's SQL carries.
    */
  def dollarNumbered(sql: String): String = {
    val out = new java.lang.StringBuilder(sql.length + 8)
    var i = 0; var n = 0
    var inStr = false; var inIdent = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        out.append(c)
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') { out.append('\''); i += 1 }
          else inStr = false
        }
      } else if (inIdent) { out.append(c); if (c == '"') inIdent = false }
      else c match {
        case '\'' => inStr = true; out.append(c)
        case '"'  => inIdent = true; out.append(c)
        case '?'  => n += 1; out.append('$').append(n)
        case _    => out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** pg type name → `java.sql.Types` code (the getColumns DATA_TYPE and
    * ResultSetMetaData.getColumnType mapping; unknowns → OTHER, arrays —
    * pg spells them `_elemtype` — → ARRAY).
    */
  def sqlTypeOf(pgType: String): Int = {
    import java.sql.Types._
    if (pgType.startsWith("_")) ARRAY
    else pgType match {
      case "int2" | "smallint"                      => SMALLINT
      case "int4" | "integer" | "oid"               => INTEGER
      case "int8" | "bigint"                        => BIGINT
      case "float4" | "real"                        => REAL
      case "float8" | "double precision"            => DOUBLE
      case "numeric" | "decimal"                    => NUMERIC
      case "bool" | "boolean"                       => BOOLEAN
      case "text" | "varchar" | "bpchar" | "name" | "char" => VARCHAR
      case "bytea"                                  => VARBINARY
      case "date"                                   => DATE
      case "time" | "timetz"                        => TIME
      case "timestamp" | "timestamptz"              => TIMESTAMP
      case _                                        => OTHER
    }
  }

  // ---- reflective facade -------------------------------------------------

  private def proxy[T](cls: Class[T], label: String)(
      h: PartialFunction[(String, List[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val key = (m.getName, Option(args).map(_.toList).getOrElse(Nil))
          if (h.isDefinedAt(key)) h(key)
          else key match {
            case ("toString", Nil)     => label
            case ("hashCode", Nil)     => Integer.valueOf(System.identityHashCode(p))
            case ("equals", a :: Nil)  => java.lang.Boolean.valueOf(p eq a)
            case ("isWrapperFor", _)   => java.lang.Boolean.FALSE
            case ("getWarnings", Nil)  => null
            case ("clearWarnings", Nil) => null
            case (name, _) => throw new SQLFeatureNotSupportedException(
              s"$label.$name — the graft pg driver implements the surface " +
                "the CDC polling lane uses; pass the stock pgjdbc driver " +
                "via the source's `driver` option for full JDBC")
          }
        }
      }).asInstanceOf[T]

  /** Uniform row feed: the wire cursor and locally-materialized metadata
    * results present the same shape to the ResultSet facade.
    */
  private[jdbc] trait Rows {
    def names: Array[String]
    def typeOids: Array[Int]
    /** Next row (text cells, null = SQL NULL), or null when exhausted. */
    def fetch(): Array[String]
    def close(): Unit
  }

  private def staticRows(cols: Array[String], oids: Array[Int],
      data: IndexedSeq[Array[String]]): Rows = new Rows {
    private var i = 0
    val names = cols
    val typeOids = oids
    def fetch(): Array[String] =
      if (i < data.length) { i += 1; data(i - 1) } else null
    def close(): Unit = ()
  }

  private def rsMeta(rows: Rows): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData], "graft-pg-rsmeta") {
      case ("getColumnCount", Nil) => Integer.valueOf(rows.names.length)
      case ("getColumnName", (i: Integer) :: Nil)  => rows.names(i - 1)
      case ("getColumnLabel", (i: Integer) :: Nil) => rows.names(i - 1)
      case ("getColumnTypeName", (i: Integer) :: Nil) =>
        OidDatabase.name(rows.typeOids(i - 1))
      case ("getColumnType", (i: Integer) :: Nil) =>
        Integer.valueOf(sqlTypeOf(OidDatabase.name(rows.typeOids(i - 1))))
      case ("isNullable", (_: Integer) :: Nil) =>
        Integer.valueOf(ResultSetMetaData.columnNullableUnknown)
    }

  private def resultSet(rows: Rows): ResultSet = {
    var row: Array[String] = null
    var nullFlag = false
    var closed = false
    def cell(i: Int): String = {
      if (row == null) throw new SQLException("no current row", "24000")
      val v = row(i - 1); nullFlag = v == null; v
    }
    def idx(label: String): Int = {
      val i = rows.names.indexWhere(_.equalsIgnoreCase(label))
      if (i < 0) throw new SQLException(s"no such column: $label", "42703")
      i + 1
    }
    proxy(classOf[ResultSet], "graft-pg-resultset") {
      case ("next", Nil) =>
        row = rows.fetch(); java.lang.Boolean.valueOf(row != null)
      case ("getString", (i: Integer) :: Nil) => cell(i)
      case ("getString", (s: String) :: Nil)  => cell(idx(s))
      case ("getObject", (i: Integer) :: Nil) => cell(i)
      case ("getLong", (i: Integer) :: Nil) =>
        java.lang.Long.valueOf(cell(i) match { case null => 0L; case v => v.toLong })
      case ("getLong", (s: String) :: Nil) =>
        java.lang.Long.valueOf(cell(idx(s)) match { case null => 0L; case v => v.toLong })
      case ("getInt", (i: Integer) :: Nil) =>
        Integer.valueOf(cell(i) match { case null => 0; case v => v.toInt })
      case ("getBoolean", (i: Integer) :: Nil) => // pg text bools are t/f
        java.lang.Boolean.valueOf(cell(i) match {
          case null => false; case v => v == "t" || v == "true" })
      case ("wasNull", Nil)     => java.lang.Boolean.valueOf(nullFlag)
      case ("findColumn", (s: String) :: Nil) => Integer.valueOf(idx(s))
      case ("getMetaData", Nil) => rsMeta(rows)
      case ("close", Nil)       => closed = true; rows.close(); null
      case ("isClosed", Nil)    => java.lang.Boolean.valueOf(closed)
    }
  }

  private def prepared(wire: PgWire, rawSql: String): PreparedStatement = {
    val sql = dollarNumbered(rawSql)
    val params = scala.collection.mutable.Map.empty[Int, Option[String]]
    var fetchSize = 0
    def bound: Seq[Option[String]] = {
      val n = params.keys.maxOption.getOrElse(0)
      (1 to n).map(i => params.getOrElse(i,
        throw new SQLException(s"parameter $i not set", "07001")))
    }
    proxy(classOf[PreparedStatement], "graft-pg-statement") {
      case ("setString", (i: Integer) :: v :: Nil) =>
        params(i.intValue) = Option(v).map(_.asInstanceOf[String]); null
      case ("setLong", (i: Integer) :: (v: java.lang.Long) :: Nil) =>
        params(i.intValue) = Some(v.toString); null
      case ("setInt", (i: Integer) :: (v: Integer) :: Nil) =>
        params(i.intValue) = Some(v.toString); null
      case ("setBoolean", (i: Integer) :: (v: java.lang.Boolean) :: Nil) =>
        params(i.intValue) = Some(if (v) "t" else "f"); null
      case ("setNull", (i: Integer) :: (_: Integer) :: Nil) =>
        params(i.intValue) = None; null
      case ("clearParameters", Nil) => params.clear(); null
      case ("setFetchSize", (n: Integer) :: Nil) => fetchSize = n; null
      case ("getFetchSize", Nil) => Integer.valueOf(fetchSize)
      case ("executeQuery", Nil) => resultSet(wire.begin(sql, bound, fetchSize))
      case ("executeUpdate", Nil) =>
        val c = wire.begin(sql, bound, 0)
        while (c.fetch() != null) ()
        // tag forms: "INSERT 0 5" / "UPDATE 3" / "CREATE TABLE"
        Integer.valueOf(c.commandTag.split(' ').lastOption
          .flatMap(_.toIntOption).getOrElse(0))
      case ("close", Nil)    => null // cursor lifecycle rides on the ResultSet
      case ("isClosed", Nil) => java.lang.Boolean.FALSE
      case ("setQueryTimeout", (_: Integer) :: Nil) => null // no async cancel lane
    }
  }

  /** getColumns runs over information_schema with LIKE semantics (the
    * JDBC pattern contract); rows are small catalog metadata, so they
    * materialize locally, letting DATA_TYPE carry the client-side
    * `java.sql.Types` mapping. Column layout matches the JDBC spec's
    * first six (the polling lane reads 3=TABLE_NAME, 4=COLUMN_NAME,
    * 6=TYPE_NAME; TYPE_NAME is the pg name, `udt_name`, matching the
    * replication lane's OID-derived names).
    */
  private def metaData(wire: PgWire, ep: Endpoint, url: String): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData], "graft-pg-metadata") {
      case ("getColumns", cat :: schemaPat :: tablePat :: colPat :: Nil) =>
        val _ = cat // pg has one catalog per connection
        val sql = """SELECT c.table_schema, c.table_name, c.column_name, c.udt_name
          FROM information_schema.columns c
          WHERE ($1::text IS NULL OR c.table_schema LIKE $1::text)
            AND ($2::text IS NULL OR c.table_name LIKE $2::text)
            AND ($3::text IS NULL OR c.column_name LIKE $3::text)
          ORDER BY c.table_schema, c.table_name, c.ordinal_position"""
        val cur = wire.begin(sql,
          Seq(schemaPat, tablePat, colPat).map(Option(_).map(_.asInstanceOf[String])), 0)
        val buf = Vector.newBuilder[Array[String]]
        var r = cur.fetch()
        while (r != null) {
          buf += Array[String](ep.database, r(0), r(1), r(2),
            sqlTypeOf(r(3)).toString, r(3))
          r = cur.fetch()
        }
        resultSet(staticRows(
          Array("TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME",
            "DATA_TYPE", "TYPE_NAME"),
          Array.fill(6)(0), buf.result()))
      case ("getDatabaseProductName", Nil) => "PostgreSQL"
      case ("getURL", Nil)        => url
      case ("getUserName", Nil)   => ep.user
      case ("getDriverName", Nil) => "graft-pg"
    }

  private[jdbc] def connection(wire: PgWire, ep: Endpoint, url: String): Connection = {
    var closed = false
    proxy(classOf[Connection], "graft-pg-connection") {
      case ("prepareStatement", (sql: String) :: Nil) => prepared(wire, sql)
      case ("getMetaData", Nil)  => metaData(wire, ep, url)
      case ("close", Nil)        => closed = true; wire.close(); null
      case ("isClosed", Nil)     => java.lang.Boolean.valueOf(closed)
      case ("isValid", _)        => java.lang.Boolean.valueOf(!closed)
      case ("getAutoCommit", Nil) => java.lang.Boolean.TRUE
      case ("setAutoCommit", (b: java.lang.Boolean) :: Nil) if b.booleanValue() =>
        null // autocommit is the only mode (each Sync closes the implicit txn)
      case ("getCatalog", Nil)   => ep.database
      case ("getSchema", Nil)    => null
    }
  }
}

/** Instantiable by class name via the polling source's `driver` option
  * (the same contract the stub driver and stock pgjdbc follow).
  */
class GraftPgDriver extends java.sql.Driver {
  override def connect(url: String, info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      val ep = GraftPgDriver.parseEndpoint(url, info)
      try GraftPgDriver.connection(new PgWire(ep), ep, url)
      catch { // JDBC contract: connect failures are SQLExceptions
        case e: java.io.IOException =>
          throw new SQLException(s"connection failed: ${e.getMessage}", "08001", e)
        case e: IllegalArgumentException =>
          throw new SQLException(e.getMessage, "28000", e)
      }
    }
  override def acceptsURL(url: String): Boolean = GraftPgDriver.accepts(url)
  override def getPropertyInfo(url: String, info: java.util.Properties) = Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger = throw new SQLFeatureNotSupportedException()
}

/** The extended-query-protocol engine over a `replicationMode = false`
  * [[PgReplicationClient]] session: unnamed statement + unnamed portal,
  * text-format parameters and results, Flush-driven exchanges so a
  * suspended portal can resume without a Sync (Sync would close the
  * implicit transaction AND the portal — it is sent exactly once, when a
  * statement completes or errors, restoring ReadyForQuery).
  *
  * One cursor is active at a time; opening the next auto-closes the
  * previous (Close portal + Sync, drained to ReadyForQuery). Errors
  * surface as `SQLException` with the server's SQLSTATE after the
  * protocol is drained back to ReadyForQuery, so the connection stays
  * usable — the supervised polling lane retries on top.
  */
private[jdbc] final class PgWire(ep: Endpoint) extends AutoCloseable {
  import GraftPgDriver.Rows

  private val client = new PgReplicationClient(ep).connect()
  private var active: Cursor = null
  private var closed = false

  private def read(): (Byte, Array[Byte]) = client.readMessage().getOrElse(
    throw new SQLException("connection closed mid-protocol", "08006"))

  private def i16(n: Int): Array[Byte] =
    Array(((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
  private def i32(n: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(n).array()

  def begin(sql: String, params: Seq[Option[String]], fetchSize: Int): Cursor = {
    if (closed) throw new SQLException("connection is closed", "08003")
    if (active != null) active.close()
    client.send('P'.toByte, client.cstr("") ++ client.cstr(sql) ++ i16(0))
    val bind = new java.io.ByteArrayOutputStream()
    bind.write(client.cstr("")); bind.write(client.cstr(""))
    bind.write(i16(0)) // zero param-format codes: all text
    bind.write(i16(params.length))
    params.foreach {
      case None    => bind.write(i32(-1))
      case Some(v) => val b = v.getBytes(UTF_8); bind.write(i32(b.length)); bind.write(b)
    }
    bind.write(i16(0)) // zero result-format codes: all text
    client.send('B'.toByte, bind.toByteArray)
    client.send('D'.toByte, 'P'.toByte +: client.cstr(""))
    val c = new Cursor(math.max(0, fetchSize))
    active = c
    c.advance()
    c
  }

  override def close(): Unit = if (!closed) {
    closed = true
    try if (active != null) active.close() catch { case _: SQLException => () }
    client.close()
  }

  final class Cursor(fetchSize: Int) extends Rows {
    var names: Array[String] = Array.empty
    var typeOids: Array[Int] = Array.empty
    var commandTag: String = ""
    private val pending = new java.util.ArrayDeque[Array[String]]()
    private var suspended = false
    private var finished = false
    private var cursorClosed = false

    /** Execute (capped at fetchSize; 0 = all) + Flush, then pump replies
      * until the portal suspends or the statement completes.
      */
    private[PgWire] def advance(): Unit = {
      client.send('E'.toByte, client.cstr("") ++ i32(fetchSize))
      client.send('H'.toByte, Array.emptyByteArray)
      pump()
    }

    private def parseRowDescription(b: Array[Byte]): Unit = {
      val buf = ByteBuffer.wrap(b)
      val n = buf.getShort.toInt
      val nm = new Array[String](n); val oids = new Array[Int](n)
      var i = 0
      while (i < n) {
        val start = buf.position()
        var end = start
        while (b(end) != 0) end += 1
        nm(i) = new String(b, start, end - start, UTF_8)
        buf.position(end + 1)
        buf.getInt; buf.getShort // table oid, attnum
        oids(i) = buf.getInt
        buf.getShort; buf.getInt; buf.getShort // typlen, typmod, format
        i += 1
      }
      names = nm; typeOids = oids
    }

    private def parseDataRow(b: Array[Byte]): Array[String] = {
      val buf = ByteBuffer.wrap(b)
      val n = buf.getShort.toInt
      val row = new Array[String](n)
      var i = 0
      while (i < n) {
        val len = buf.getInt
        if (len >= 0) {
          val a = new Array[Byte](len); buf.get(a)
          row(i) = new String(a, UTF_8)
        }
        i += 1
      }
      row
    }

    /** Sync + drain to ReadyForQuery: the one place the implicit
      * transaction closes.
      */
    private def syncToReady(): Unit = {
      client.send('S'.toByte, Array.emptyByteArray)
      var z = false
      while (!z) { if (read()._1.toChar == 'Z') z = true }
      finished = true
      if (active eq this) active = null
    }

    private def pump(): Unit = {
      suspended = false
      var done = false
      while (!done) {
        val (tpe, b) = read()
        tpe.toChar match {
          case '1' | '2' | '3' | 'n'       => () // Parse/Bind/Close complete, NoData
          case 'S' | 'N' | 'A' | 'K'       => () // async status/notice/notify
          case 'T'                         => parseRowDescription(b)
          case 'D'                         => pending.add(parseDataRow(b))
          case 's'                         => suspended = true; done = true
          case 'C' =>
            commandTag = new String(b, 0, math.max(0, b.length - 1), UTF_8)
            syncToReady(); done = true
          case 'I' => syncToReady(); done = true
          case 'E' =>
            val state = client.errorFields(b).getOrElse('C', "XX000")
            val msg = client.errorText(b)
            syncToReady()
            throw new SQLException(msg, state)
          case other =>
            throw new SQLException(s"unexpected protocol message '$other'", "08P01")
        }
      }
    }

    def fetch(): Array[String] = {
      if (cursorClosed) throw new SQLException("result set is closed", "24000")
      while (pending.isEmpty && suspended) advance()
      pending.poll() // null once drained and complete
    }

    def close(): Unit = if (!cursorClosed) {
      cursorClosed = true
      pending.clear()
      if (!finished) { // suspended portal: close it and restore ReadyForQuery
        client.send('C'.toByte, 'P'.toByte +: client.cstr(""))
        syncToReady()
      }
    }
  }
}
