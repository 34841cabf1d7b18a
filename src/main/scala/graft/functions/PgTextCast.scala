package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime}

/** Postgres text-wire-format → JVM value casting.
  *
  * Semantics follow the reference cast table
  * (reference: lib/walex/casting/types.ex:35-431):
  *
  *   - every cast is *never-throw*: unparseable input degrades to the
  *     original string (types.ex fallback clauses, e.g. :48-56)
  *   - `bool` "t"/"f" (types.ex:35-36)
  *   - ints/floats with garbage fallback (types.ex:48-66)
  *   - `NaN` / `Infinity` / `-Infinity` for float and numeric
  *     (types.ex:42-46) — represented as Double specials (documented
  *     divergence: pg numeric NaN has no Decimal representation)
  *   - `numeric`/`decimal` → BigDecimal (types.ex:68-69)
  *   - timestamps RFC3339 or pg "YYYY-MM-DD HH:MM:SS[.ffffff][+TZ]" text
  *     (types.ex:71-88), date/time ISO-8601 (types.ex:104-125)
  *   - json passthrough-validated (we keep the raw string for Spark's
  *     `from_json` lane; types.ex:90-100 decodes — divergence documented)
  *   - `money` strips currency symbols/commas → BigDecimal (types.ex:127-132)
  *   - `bytea` `\x`-hex → bytes (types.ex:134-143)
  *   - arrays: [[PgArrayParser]] grammar + element-wise cast
  *     (types.ex:190-426), recursive for nested arrays (types.ex:435-447)
  *   - unknown types pass through unchanged (types.ex:429-431)
  */
object PgTextCast {

  /** Cast one text cell. `value` may be null. Array types are `_`-prefixed
    * (pg catalog convention) or end in `[]`.
    */
  def cast(value: String, pgType: String): Any = {
    if (value == null) return null
    val t = pgType
    if (t.startsWith("_")) return castArray(value, t.substring(1))
    if (t.endsWith("[]")) return castArray(value, t.substring(0, t.length - 2))
    castScalar(value, t)
  }

  private def castScalar(value: String, t: String): Any = t match {
    case "bool" | "boolean" =>
      value match {
        case "t" | "true"  => java.lang.Boolean.TRUE
        case "f" | "false" => java.lang.Boolean.FALSE
        case _             => value
      }
    case "int2" | "smallint" =>
      tryOr(value)(java.lang.Short.valueOf(value.trim))
    case "int4" | "int8" | "int" | "integer" | "bigint" | "serial" | "bigserial" =>
      // int4/int8/integer/bigint: widest-safe Long (reference keeps native int)
      tryOr(value)(java.lang.Long.valueOf(value.trim))
    case "float4" | "real" =>
      floatSpecial(value).getOrElse(tryOr(value)(java.lang.Float.valueOf(value.trim)))
    case "float8" | "double precision" =>
      floatSpecial(value).getOrElse(tryOr(value)(java.lang.Double.valueOf(value.trim)))
    case "numeric" | "decimal" =>
      floatSpecial(value).getOrElse(tryOr(value)(new JBigDecimal(value.trim)))
    case "timestamp" =>
      tryOr(value)(parseTimestampNtz(value))
    case "timestamptz" =>
      tryOr(value)(parseTimestampTz(value))
    case "date" =>
      tryOr(value)(LocalDate.parse(value.trim))
    case "json" | "jsonb" =>
      value // raw JSON string; downstream lane is Spark try_parse_json
    case "time" =>
      tryOr(value)(java.time.LocalTime.parse(value.trim))
    case "timetz" =>
      // keep the offset at the JVM lane (types.ex:110-125); the Spark
      // column lane normalizes to UTC TIME (graft.plans.PgTimeTz)
      tryOr(value)(parseTimeTz(value))
    case "interval" =>
      parseInterval(value).getOrElse(value)
    case "money" =>
      tryOr(value)(new JBigDecimal(value.replaceAll("[^0-9.\\-]", "")))
    case "bytea" =>
      if (value.startsWith("\\x")) tryOr(value)(hexToBytes(value.substring(2)))
      else value
    // uuid/interval/time/timetz/inet/cidr/macaddr*/xml/geometric/range/
    // tsvector/tsquery/bit/...: passthrough strings (types.ex:102,145-187)
    case _ => value
  }

  private def castArray(value: String, elemType: String): Any =
    PgArrayParser.parse(value) match {
      case Left(_) => value
      case Right(elems) =>
        def rec(x: Any): Any = x match {
          case null            => null
          case l: List[_]      => l.map(rec)
          case s: String       => castScalar(s.trim, elemType)
          case other           => other
        }
        elems.map(rec)
    }

  private def floatSpecial(v: String): Option[Any] = v.trim match {
    case "NaN"                     => Some(java.lang.Double.valueOf(Double.NaN))
    case "Infinity" | "infinity"   => Some(java.lang.Double.valueOf(Double.PositiveInfinity))
    case "-Infinity" | "-infinity" => Some(java.lang.Double.valueOf(Double.NegativeInfinity))
    case _                         => None
  }

  /** `timestamp` (no zone) → LocalDateTime. Accepts 'T' or ' ' separator. */
  def parseTimestampNtz(v: String): LocalDateTime = {
    val s = v.trim.replace(' ', 'T')
    LocalDateTime.parse(s)
  }

  /** `timestamptz` → Instant. Accepts RFC3339 and pg's `+HH`/`+HH:MM` offsets. */
  def parseTimestampTz(v: String): Instant = {
    var s = v.trim.replace(' ', 'T')
    // pg emits short offsets like "+00"; OffsetDateTime needs "+00:00"
    val off = "([+-])(\\d{2})$".r
    s = off.replaceAllIn(s, m => m.group(1) + m.group(2) + ":00")
    if (s.endsWith("Z")) Instant.parse(s)
    else OffsetDateTime.parse(s).toInstant
  }

  /** `timetz` "HH:MM:SS[.f][±HH[:MM]]" → OffsetTime (offset preserved;
    * no-offset input reads as UTC).
    */
  def parseTimeTz(v: String): java.time.OffsetTime = {
    var s = v.trim
    val off = "([+-])(\\d{2})$".r
    s = off.replaceAllIn(s, m => m.group(1) + m.group(2) + ":00")
    if (!s.matches(".*([+-]\\d{2}:\\d{2}|Z)$")) s = s + "Z"
    java.time.OffsetTime.parse(s)
  }

  /** Postgres interval stored triple — what `interval` columns decode to
    * at the JVM lane (the Spark column lane is the identical
    * struct(months, days, micros), graft.plans.PgIntervalParts).
    */
  final case class PgInterval(months: Int, days: Int, micros: Long)

  // months? before mons?: alternation is first-match, and `mons?` would
  // otherwise match the "mon" prefix of "months" and strand "ths"
  private val NumUnitRe = """(-?\d+)\s+(years?|months?|mons?|days?|weeks?)""".r
  private val TimePartRe = """([+-]?)(\d{1,9}):(\d{2}):(\d{2})(?:\.(\d{1,6}))?""".r

  /** pg default-style interval text ("[N year[s]] [N mon[s]] [N day[s]]
    * [±]HH:MM:SS[.ffffff]") → [[PgInterval]]; None if malformed. Validated
    * by full consumption: every token must be a recognized `N unit` pair
    * or the single time part.
    */
  def parseInterval(v: String): Option[PgInterval] = {
    val text = v.trim
    if (text.isEmpty) return None
    var months = 0; var days = 0; var micros = 0L
    var sawAny = false; var sawTime = false
    var rest = text
    while (rest.nonEmpty) {
      NumUnitRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          val n = m.group(1).toInt
          m.group(2) match {
            case u if u.startsWith("year") => months += 12 * n
            case u if u.startsWith("mon")  => months += n
            case u if u.startsWith("week") => days += 7 * n
            case _                         => days += n
          }
          sawAny = true
          rest = rest.substring(m.end).trim
        case None =>
          val tp = TimePartRe.findPrefixMatchOf(rest)
          if (tp.isEmpty || sawTime) return None
          val m = tp.get
          val frac = m.group(5)
          val fracMicros =
            if (frac == null) 0L else (frac + "0" * (6 - frac.length)).toLong
          val mag = (m.group(2).toLong * 3600L + m.group(3).toLong * 60L +
            m.group(4).toLong) * 1000000L + fracMicros
          micros += (if (m.group(1) == "-") -mag else mag)
          sawAny = true; sawTime = true
          rest = rest.substring(m.end).trim
      }
    }
    if (sawAny) Some(PgInterval(months, days, micros)) else None
  }

  private def hexToBytes(hex: String): Array[Byte] = {
    require(hex.length % 2 == 0, "odd-length hex")
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  @inline private def tryOr(orig: String)(f: => Any): Any =
    try f
    catch { case _: Exception => orig }

  /** Micros since the Postgres epoch (2000-01-01) → Instant
    * (reference: lib/walex/decoder/decoder.ex:265-269).
    */
  def pgMicrosToInstant(micros: Long): Instant = {
    val unixMicros = micros + 946684800000000L
    Instant.ofEpochSecond(
      Math.floorDiv(unixMicros, 1000000L),
      Math.floorMod(unixMicros, 1000000L) * 1000L)
  }
}
