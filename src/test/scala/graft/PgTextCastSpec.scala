package graft

import java.math.{BigDecimal => JBigDecimal}
import java.time.{Instant, LocalDate, LocalDateTime}

import graft.functions.PgTextCast
import org.scalatest.funsuite.AnyFunSuite

/** Cast matrix mirrors the reference's type fixtures
  * (reference: test/walex/casting/types_test.exs:1-358).
  */
class PgTextCastSpec extends AnyFunSuite {

  private def c(v: String, t: String): Any = PgTextCast.cast(v, t)

  test("bool") {
    assert(c("t", "bool") == java.lang.Boolean.TRUE)
    assert(c("f", "bool") == java.lang.Boolean.FALSE)
  }

  test("ints incl. max int8 and garbage fallback") {
    assert(c("42", "int4") == 42L)
    assert(c("-7", "int2") == (-7: Short))
    assert(c("9223372036854775807", "int8") == Long.MaxValue)
    assert(c("not_a_number", "int4") == "not_a_number")
  }

  test("floats incl. garbage fallback") {
    assert(c("1.5", "float8") == 1.5d)
    assert(c("2.25", "float4") == 2.25f)
    assert(c("xyz", "float8") == "xyz")
  }

  test("NaN and infinities for float and numeric") {
    assert(c("NaN", "float8").asInstanceOf[Double].isNaN)
    assert(c("Infinity", "float4") == Double.PositiveInfinity)
    assert(c("-Infinity", "float8") == Double.NegativeInfinity)
    assert(c("NaN", "numeric").asInstanceOf[Double].isNaN)
  }

  test("numeric high precision") {
    assert(c("123.4567890123456789", "numeric") == new JBigDecimal("123.4567890123456789"))
  }

  test("timestamp / timestamptz incl. invalid fallback") {
    assert(c("2019-07-18T17:02:35.726322", "timestamp") ==
      LocalDateTime.parse("2019-07-18T17:02:35.726322"))
    assert(c("2019-07-18 17:02:35.726322", "timestamp") ==
      LocalDateTime.parse("2019-07-18T17:02:35.726322"))
    assert(c("2019-07-18T17:02:35.726322Z", "timestamptz") ==
      Instant.parse("2019-07-18T17:02:35.726322Z"))
    assert(c("2019-07-18 17:02:35.726322+00", "timestamptz") ==
      Instant.parse("2019-07-18T17:02:35.726322Z"))
    assert(c("2019-07-18 19:02:35+02:00", "timestamptz") ==
      Instant.parse("2019-07-18T17:02:35Z"))
    assert(c("not a ts", "timestamptz") == "not a ts")
  }

  test("date") {
    assert(c("2024-02-29", "date") == LocalDate.of(2024, 2, 29))
    assert(c("bad-date", "date") == "bad-date")
  }

  test("json passthrough (string lane)") {
    assert(c("""{"k":{"foo":"bar"}}""", "jsonb") == """{"k":{"foo":"bar"}}""")
  }

  test("uuid passthrough") {
    assert(c("7c9d24e3-c38a-4df6-8a33-c9c9e9a1b27b", "uuid") ==
      "7c9d24e3-c38a-4df6-8a33-c9c9e9a1b27b")
  }

  test("money strips symbols") {
    assert(c("$123.45", "money") == new JBigDecimal("123.45"))
    assert(c("-$67.89", "money") == new JBigDecimal("-67.89"))
  }

  test("bytea hex and non-hex passthrough") {
    assert(c("\\x48656c6c6f", "bytea").asInstanceOf[Array[Byte]]
      .sameElements("Hello".getBytes))
    assert(c("plain", "bytea") == "plain")
  }

  test("passthrough families: inet/range/geometric/xml/unknown") {
    assert(c("192.168.0.1/24", "inet") == "192.168.0.1/24")
    assert(c("1 day", "interval") == PgTextCast.PgInterval(0, 1, 0L)) // typed since r4
    assert(c("[1,10)", "int4range") == "[1,10)")
    assert(c("(1,2)", "point") == "(1,2)")
    assert(c("<a/>", "xml") == "<a/>")
    assert(c("whatever", "sometype") == "whatever")
  }

  test("arrays: ints, floats, strings with quoted commas") {
    assert(c("{1,2,3}", "_int4") == List(1L, 2L, 3L))
    assert(c("{1.5,2.5}", "_float8") == List(1.5d, 2.5d))
    assert(c("""{"book1, 2 and 3","book4"}""", "_varchar") ==
      List("book1, 2 and 3", "book4"))
  }

  test("arrays: empty, NULL elements, nested") {
    assert(c("{}", "_int4") == Nil)
    assert(c("{1,NULL,3}", "_int4") == List(1L, null, 3L))
    assert(c("{{1,2},{3,4}}", "_int4") == List(List(1L, 2L), List(3L, 4L)))
    assert(c("{{{1,2}}}", "_int4") == List(List(List(1L, 2L))))
  }

  test("arrays: bool, numeric, timestamptz, uuid") {
    assert(c("{t,f}", "_bool") == List(true, false))
    assert(c("{1.10,2.20}", "_numeric") ==
      List(new JBigDecimal("1.10"), new JBigDecimal("2.20")))
    assert(c("{2019-07-18 17:02:35+00}", "_timestamptz") ==
      List(Instant.parse("2019-07-18T17:02:35Z")))
    assert(c("{abc-def}", "_uuid") == List("abc-def"))
  }

  test("arrays: malformed literal falls back to original string") {
    assert(c("{1,2", "_int4") == "{1,2")
  }

  test("array via [] suffix spelling") {
    assert(c("{1,2}", "int4[]") == List(1L, 2L))
  }

  test("null input") {
    assert(c(null, "int4") == null)
  }

  test("pg epoch conversion") {
    // 0 µs since 2000-01-01 == 2000-01-01T00:00:00Z
    assert(PgTextCast.pgMicrosToInstant(0L) == Instant.parse("2000-01-01T00:00:00Z"))
    assert(PgTextCast.pgMicrosToInstant(616784555726322L) ==
      Instant.parse("2019-07-18T17:02:35.726322Z"))
  }

  test("time / timetz (types.ex:104-125)") {
    assert(c("06:30:05", "time") == java.time.LocalTime.of(6, 30, 5))
    assert(c("23:59:59.123456", "time") ==
      java.time.LocalTime.parse("23:59:59.123456"))
    assert(c("garbage", "time") == "garbage") // never-throw fallback
    assert(c("06:30:05+02", "timetz") ==
      java.time.OffsetTime.parse("06:30:05+02:00"))
    assert(c("23:59:59.5-05:30", "timetz") ==
      java.time.OffsetTime.parse("23:59:59.5-05:30"))
    assert(c("bad", "timetz") == "bad")
  }

  test("interval: pg default style -> (months, days, micros)") {
    import PgTextCast.PgInterval
    assert(c("1 year 2 mons 3 days 04:05:06.000007", "interval") ==
      PgInterval(14, 3, 14706000007L))
    assert(c("-3 days", "interval") == PgInterval(0, -3, 0L))
    assert(c("02:03:04", "interval") == PgInterval(0, 0, 7384000000L))
    assert(c("2 weeks", "interval") == PgInterval(0, 14, 0L))
    // 'month(s)' spelling (non-default intervalstyle / human input) — the
    // `mons?` alternative must not eat the "mon" prefix and strand "ths"
    assert(c("3 months", "interval") == PgInterval(3, 0, 0L))
    assert(c("1 month", "interval") == PgInterval(1, 0, 0L))
    assert(c("-00:00:01", "interval") == PgInterval(0, 0, -1000000L))
    assert(c("nope", "interval") == "nope")       // never-throw fallback
    assert(c("1 day trailing junk", "interval") == "1 day trailing junk")
  }

  test("timetz UTC normalization for the Spark TIME lane") {
    import graft.plans.PgTimeUtil.timeTzToUtcNanos
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    assert(timeTzToUtcNanos(u8("06:30:05+02")) == 4 * 3600L * 1000000000L +
      30 * 60L * 1000000000L + 5 * 1000000000L)
    // wraps mod 24h: 23:59:59.5 -05:30 → 05:29:59.5 UTC next day
    assert(timeTzToUtcNanos(u8("23:59:59.5-05:30")) ==
      ((5 * 3600L + 29 * 60L + 59) * 1000000000L + 500000000L))
    assert(timeTzToUtcNanos(u8("10:00:00")) == 10 * 3600L * 1000000000L)
    assert(timeTzToUtcNanos(u8("bad")) == null)
    assert(timeTzToUtcNanos(u8("25:00:00+02")) == null) // invalid hour
  }
}
