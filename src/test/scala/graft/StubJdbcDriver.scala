package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, ResultSet}

import scala.collection.mutable

/** In-memory stub of the JDBC surface the graft JDBC CDC source touches —
  * just enough java.sql (Driver → Connection → PreparedStatement →
  * ResultSet) to verify the source's polling protocol without a live
  * database: watermark probes, LIMIT-capped probes, range-bounded reads
  * with parameterized pushed filters. Implemented with reflective proxies
  * so the java.sql interfaces don't need 40-method stubs.
  */
object StubJdbc {

  val Url = "jdbc:graftstub:mem"

  final case class Row(seq: Long, lsn: Long, xid: Long, op: String,
      schemaName: String, tableName: String, commitTsUs: Long,
      recordJson: String, oldRecordJson: String, oldKind: String,
      toastJson: String, colTypesJson: String) {
    def cells: IndexedSeq[Any] = IndexedSeq(
      seq, lsn, xid, op, schemaName, tableName, commitTsUs,
      recordJson, oldRecordJson, oldKind, toastJson, colTypesJson)
  }

  private val rows = mutable.ArrayBuffer.empty[Row]
  val issuedSql = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** DatabaseMetaData.getColumns fixture: (table, column, pg type name). */
  private var metaColumns: Seq[(String, String, String)] = Nil
  def setMetaColumns(cols: Seq[(String, String, String)]): Unit =
    synchronized { metaColumns = cols }

  /** Chaos injection: the next N connection attempts throw SQLException —
    * the stub's `pg_terminate_backend` equivalent (reference chaos tests,
    * database_test.exs).
    */
  private val failNext = new java.util.concurrent.atomic.AtomicInteger(0)
  def failNextConnections(n: Int): Unit = failNext.set(n)
  private[graft] def maybeFailConnect(): Unit =
    if (failNext.getAndUpdate(v => math.max(0, v - 1)) > 0)
      throw new java.sql.SQLException("stub: connection refused (injected)")

  def reset(data: Seq[Row]): Unit = synchronized {
    rows.clear(); rows ++= data; issuedSql.clear(); metaColumns = Nil
    failNext.set(0)
  }
  def append(data: Seq[Row]): Unit = synchronized { rows ++= data }
  private def snapshot: Vector[Row] = synchronized(rows.toVector)

  private def colIdx(name: String): Int = Seq("seq", "lsn", "xid", "op",
    "schema_name", "table_name", "commit_ts_us", "record_json",
    "old_record_json", "old_kind", "toast_unchanged_json", "col_types_json")
    .indexOf(name)

  private def proxy[T](cls: Class[T])(
      h: PartialFunction[(String, List[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val key = (m.getName, Option(args).map(_.toList).getOrElse(Nil))
          if (h.isDefinedAt(key)) h(key)
          else m.getName match {
            case "close" | "setFetchSize" | "setAutoCommit" => null
            case "isClosed"                                 => java.lang.Boolean.FALSE
            case "toString"                                 => s"stub-${cls.getSimpleName}"
            case other => throw new UnsupportedOperationException(
              s"stub ${cls.getSimpleName}.$other")
          }
        }
      }).asInstanceOf[T]

  /** Single-column / multi-column result set over pre-computed rows. */
  private def resultSet(data: Seq[IndexedSeq[Any]]): ResultSet = {
    var idx = -1
    var lastNull = false
    def cell(i: Int): Any = {
      val v = data(idx)(i - 1)
      lastNull = v == null
      v
    }
    proxy(classOf[ResultSet]) {
      case ("next", Nil) => idx += 1; java.lang.Boolean.valueOf(idx < data.length)
      case ("getLong", (i: Integer) :: Nil) =>
        cell(i) match {
          case null    => java.lang.Long.valueOf(0L)
          case v: Long => java.lang.Long.valueOf(v)
        }
      case ("getString", (i: Integer) :: Nil) =>
        cell(i) match { case null => null; case v => v.toString }
      case ("wasNull", Nil) => java.lang.Boolean.valueOf(lastNull)
    }
  }

  private val LimitRe = """LIMIT (\d+)""".r
  private val FilterEqRe = """(\w+) = \?""".r
  private val FilterInRe = """(\w+) IN \(([?, ]+)\)""".r
  // rowFilter lane: the source appends the validated predicate verbatim in
  // parens; the stub evaluates the two shapes the specs use — a string
  // equality and a numeric comparison (a real DB evaluates arbitrary SQL)
  private val RowFilterEqRe = """\((\w+) = '([^']*)'\)""".r
  private val RowFilterCmpRe = """\((\w+) (>=|<=|<>|>|<) (\d+)\)""".r

  /** Interpret the source's generated SQL against the in-memory table. */
  private def run(sql: String, params: Map[Int, Any]): ResultSet = {
    issuedSql.add(sql)
    val all = snapshot
    def long(i: Int): Long = params(i).asInstanceOf[Long]
    def single(v: Option[Long]): ResultSet =
      resultSet(Seq(IndexedSeq(v.map(java.lang.Long.valueOf).orNull match {
        case null         => null
        case l: java.lang.Long => l.longValue()
      })))

    if (sql.startsWith("SELECT min(")) single(all.map(_.lsn).minOption)
    else if (sql.contains("graft_probe")) {
      val cap = LimitRe.findFirstMatchIn(sql).get.group(1).toInt
      val capped = all.filter(_.lsn > long(1)).sortBy(_.lsn).take(cap)
      single(capped.map(_.lsn).maxOption)
    } else if (sql.startsWith("SELECT max(")) {
      single(all.filter(_.lsn > long(1)).map(_.lsn).maxOption)
    } else {
      // range scan: WHERE lsn > ? AND lsn <= ?[ AND <pushed>…] ORDER BY lsn, seq
      val where = sql.substring(sql.indexOf("WHERE"), sql.indexOf(" ORDER BY"))
      val extra = where.split(" AND ").toSeq.drop(2) // first two are the lsn bounds
      var nextParam = 3
      val preds: Seq[Row => Boolean] = extra.map {
        case FilterEqRe(col) =>
          val p = nextParam; nextParam += 1
          val v = params(p).asInstanceOf[String]
          (r: Row) => r.cells(colIdx(col)) == v
        case FilterInRe(col, qs) =>
          val n = qs.count(_ == '?')
          val vs = (0 until n).map(i => params(nextParam + i).asInstanceOf[String]).toSet
          nextParam += n
          (r: Row) => vs(String.valueOf(r.cells(colIdx(col))))
        case RowFilterEqRe(col, v) =>
          (r: Row) => String.valueOf(r.cells(colIdx(col))) == v
        case RowFilterCmpRe(col, cmp, lit) =>
          val rhs = lit.toLong
          (r: Row) => {
            val lhs = r.cells(colIdx(col)).asInstanceOf[Long]
            cmp match {
              case ">" => lhs > rhs; case ">=" => lhs >= rhs
              case "<" => lhs < rhs; case "<=" => lhs <= rhs
              case "<>" => lhs != rhs
            }
          }
        case other => throw new IllegalStateException(s"stub can't parse clause: $other")
      }
      val hits = all
        .filter(r => r.lsn > long(1) && r.lsn <= long(2) && preds.forall(_(r)))
        .sortBy(r => (r.lsn, r.seq))
      resultSet(hits.map(_.cells))
    }
  }

  private def prepared(sql: String): PreparedStatement = {
    val params = mutable.Map.empty[Int, Any]
    proxy(classOf[PreparedStatement]) {
      case ("setLong", (i: Integer) :: (v: java.lang.Long) :: Nil) =>
        params(i.intValue) = v.longValue(); null
      case ("setString", (i: Integer) :: v :: Nil) =>
        params(i.intValue) = v.asInstanceOf[String]; null
      case ("executeQuery", Nil) => run(sql, params.toMap)
    }
  }

  def connection(): Connection = { maybeFailConnect(); proxy(classOf[Connection]) {
    case ("prepareStatement", (sql: String) :: Nil) => prepared(sql)
    case ("getMetaData", Nil) =>
      proxy(classOf[java.sql.DatabaseMetaData]) {
        case ("getColumns", _ :: _ :: tablePat :: _ :: Nil) =>
          val pat = String.valueOf(tablePat)
          val hits = synchronized(metaColumns)
            .filter { case (t, _, _) => pat == "%" || pat == "null" || t == pat }
          // standard getColumns layout: 3=TABLE_NAME, 4=COLUMN_NAME, 6=TYPE_NAME
          resultSet(hits.map { case (t, c, tp) =>
            IndexedSeq[Any](null, null, t, c, null, tp)
          })
      }
  } }
}

/** Instantiable by class name via the source's `driver` option. */
class StubJdbcDriver extends java.sql.Driver {
  override def connect(url: String, info: java.util.Properties): Connection =
    if (acceptsURL(url)) StubJdbc.connection() else null
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftstub:")
  override def getPropertyInfo(url: String, info: java.util.Properties) = Array.empty
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}
