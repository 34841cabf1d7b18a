package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native casts for the pg time-ish types the scalar cast table could not
  * express declaratively (reference: lib/walex/casting/types.ex:104-125
  * time/timetz, types.ex:145-187 interval as text):
  *
  *  - `timetz` ("HH:MM:SS[.ffffff]±HH[:MM]") → Spark 4 TIME, normalized to
  *    UTC (wrapping mod 24h). Spark has no zoned-time type, so the offset
  *    is applied rather than carried — documented divergence; the raw text
  *    is always recoverable from the record map.
  *  - `interval` (pg default output style: "[N year[s]] [N mon[s]]
  *    [N day[s]] [±]HH:MM:SS[.ffffff]") → STRUCT<months INT, days INT,
  *    micros BIGINT> — the exact (months, days, micros) triple Postgres
  *    stores. A struct rather than CalendarIntervalType because the triple
  *    is parquet-writable, cross-engine comparable, and convertible to
  *    Spark's ANSI intervals via make_ym_interval/make_dt_interval.
  *
  * Both are never-throw (NULL on garbage) and codegen'd static calls.
  */
object PgTimeUtil {

  private val TimeTzRe =
    """(\d{2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?(?:([+-])(\d{2})(?::?(\d{2}))?)?""".r

  private val NanosPerDay = 86400L * 1000000000L

  /** "HH:MM:SS[.f…][±HH[:MM]]" → UTC nanos-of-day, null if malformed. */
  def timeTzToUtcNanos(s: UTF8String): java.lang.Long = s.toString.trim match {
    case TimeTzRe(h, m, sec, frac, offSign, offH, offM) =>
      val hh = h.toInt; val mm = m.toInt; val ss = sec.toInt
      if (hh > 23 || mm > 59 || ss > 59) return null
      val fracNanos =
        if (frac == null) 0L else (frac + "0" * (9 - frac.length)).toLong
      var nanos = (hh * 3600L + mm * 60L + ss) * 1000000000L + fracNanos
      if (offSign != null) {
        val off = (offH.toInt * 3600L + (if (offM == null) 0L else offM.toLong * 60L)) *
          1000000000L
        nanos -= (if (offSign == "+") off else -off)
      }
      java.lang.Long.valueOf(java.lang.Math.floorMod(nanos, NanosPerDay))
    case _ => null
  }

  /** pg-style interval text → (months, days, micros) InternalRow, null if
    * malformed (never-throw). Parsing shared with the JVM lane
    * ([[graft.functions.PgTextCast.parseInterval]]).
    */
  def intervalParts(s: UTF8String): InternalRow =
    graft.functions.PgTextCast.parseInterval(s.toString) match {
      case Some(iv) => new GenericInternalRow(Array[Any](iv.months, iv.days, iv.micros))
      case None     => null
    }
}

/** `pg_timetz(text)` → TIME(6), UTC-normalized (see [[PgTimeUtil]]). */
case class PgTimeTz(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = TimeType(TimeType.MICROS_PRECISION)
  override def nullable: Boolean = true
  override def prettyName: String = "pg_timetz"

  override def nullSafeEval(input: Any): Any =
    PgTimeUtil.timeTzToUtcNanos(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("tz")
      s"""
      java.lang.Long $boxed = graft.plans.PgTimeUtil.timeTzToUtcNanos($c);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PgTimeTz =
    copy(child = newChild)
}

/** `pg_interval_parts(text)` → STRUCT<months INT, days INT, micros BIGINT>
  * (see [[PgTimeUtil.intervalParts]]).
  */
case class PgIntervalParts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("months", IntegerType, nullable = false),
    StructField("days", IntegerType, nullable = false),
    StructField("micros", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "pg_interval_parts"

  override def nullSafeEval(input: Any): Any =
    PgTimeUtil.intervalParts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.PgTimeUtil.intervalParts($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): PgIntervalParts =
    copy(child = newChild)
}
