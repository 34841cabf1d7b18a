package graft.plans

import graft.functions.PgArrayParser
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the pg array-literal grammar
  * (reference semantics: lib/walex/casting/array_parser.ex:43-165).
  *
  * `pg_array_parse('{1,NULL,"a, b"}')` → `array('1', null, 'a, b')`.
  * Malformed literals evaluate to NULL (never-throw cast-layer property).
  * Nested sub-arrays are re-rendered as their literal string form at this
  * level; deep typed nesting goes through [[graft.functions.PgTextCast]].
  *
  * Implements `doGenCode` (a static call, not `CodegenFallback`) so it stays
  * inside whole-stage codegen on the hot decode path.
  */
case class PgArrayParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pg_array_parse expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "pg_array_parse"

  override def nullSafeEval(input: Any): Any =
    PgArrayParseUtil.parseToArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.PgArrayParseUtil.parseToArrayData($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): PgArrayParse =
    copy(child = newChild)
}

object PgArrayParseUtil {

  /** UTF8String pg literal → ArrayData of UTF8String (null elements kept;
    * null return = malformed). Called from generated code — keep static.
    */
  def parseToArrayData(s: UTF8String): ArrayData =
    PgArrayParser.parse(s.toString) match {
      case Left(_) => null
      case Right(elems) =>
        new GenericArrayData(elems.map {
          case null         => null
          case l: List[_]   => UTF8String.fromString(render(l))
          case v: String    => UTF8String.fromString(v)
          case other        => UTF8String.fromString(other.toString)
        }.toArray[Any])
    }

  /** Re-render a nested element back to pg literal form. */
  private def render(l: List[_]): String =
    l.map {
      case null        => "NULL"
      case sub: List[_] => render(sub)
      case s: String   =>
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case other       => other.toString
    }.mkString("{", ",", "}")
}

/** Column-level pg cast helpers (the codegen'd, declarative lane of the
  * reference cast table — SURVEY §1.3). Built-in functions only, so Catalyst
  * can push/prune/codegen them; the generic JVM lane is PgTextCast.
  */
object PgCasts {
  import org.apache.spark.sql.functions._

  def pgArrayParse(c: Column): Column = Bridge.column(PgArrayParse(Bridge.expression(c)))

  def pgBool(c: Column): Column =
    when(c === "t" || c === "true", true).when(c === "f" || c === "false", false)

  // try_cast throughout: the reference cast layer never throws (garbage
  // degrades; types.ex:429-431) — and Spark 4 runs ANSI mode by default,
  // where a plain cast would fail the whole stream on one bad cell.
  def pgInt(c: Column): Column    = c.try_cast("long")
  def pgFloat8(c: Column): Column = c.try_cast("double")

  def pgNumeric(c: Column, precision: Int = 38, scale: Int = 18): Column =
    c.try_cast(s"decimal($precision,$scale)")

  /** `$123.45` / `-$67.89` → decimal (reference: types.ex:127-132). */
  def pgMoney(c: Column): Column =
    regexp_replace(c, "[^0-9.\\-]", "").try_cast("decimal(19,2)")

  /** `\x48656c6c6f` → bytes (reference: types.ex:134-143). */
  def pgBytea(c: Column): Column =
    when(c.startsWith("\\x"), unhex(substring(c, 3, Int.MaxValue)))

  def pgDate(c: Column): Column      = c.try_cast("date")
  def pgTimestamp(c: Column): Column = c.try_cast("timestamp")

  /** `time` → Spark 4 TIME(6) (never-throw). */
  def pgTime(c: Column): Column =
    c.try_cast(org.apache.spark.sql.types.TimeType(
      org.apache.spark.sql.types.TimeType.MICROS_PRECISION))

  /** `timetz` → TIME(6) normalized to UTC (native, see [[PgTimeTz]]). */
  def pgTimeTz(c: Column): Column = Bridge.column(PgTimeTz(Bridge.expression(c)))

  /** `interval` → struct(months, days, micros) (native, see
    * [[PgIntervalParts]]).
    */
  def pgInterval(c: Column): Column = Bridge.column(PgIntervalParts(Bridge.expression(c)))

  /** `json`/`jsonb` → VARIANT via try_parse_json: invalid JSON → NULL
    * (never-throw), valid JSON gets typed `variant_get` access. The raw
    * text always remains available in the record map.
    */
  def pgJson(c: Column): Column = try_parse_json(c)

  /** Typed array cast: parse the literal then cast elements. */
  def pgArray(c: Column, elemSqlType: String): Column =
    transform(pgArrayParse(c), e => e.cast(elemSqlType))
}
