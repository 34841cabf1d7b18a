package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native short-circuit forms of the F6 unwatched-fields filter
  * (reference transaction_filter.ex:175-187).
  *
  * Two seams, one semantic ("does this event change any field the
  * subscriber watches?"):
  *
  *  - [[AnyChangedKeyNotIn]] over an already-materialized `changes` map —
  *    replaces `size(map_filter(changes, (k,_) => !k.isin(unwatched)))>0`,
  *    whose higher-order lambda dispatches interpreted per field per row
  *    (the K-layer filters a persisted Event batch this way).
  *  - [[AnyWatchedFieldChanged]] fused over (old, new, toast) — for
  *    pipelines that compute the diff ONLY to filter on it (cdc07's
  *    shape), this skips materializing the diff map entirely: one loop,
  *    early-exit on the first watched changed field, no map allocation
  *    for rows the filter drops.
  *
  * Both return TRUE on null input (an event with no computable diff
  * passes F6 — the `changes.isNull || …` convention of the lambda
  * formulation), so `nullable = false` and they compose under plain `&&`.
  * Unwatched field names are a constructor parameter (always a literal
  * subscriber config), referenced from generated code as a shared set.
  */
case class AnyChangedKeyNotIn(child: Expression, unwatched: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, _, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a MAP<STRING, …> child")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "any_changed_key_not_in"

  @transient private lazy val unwatchedSet = ChangeFilterUtil.toSet(unwatched)

  override def eval(input: InternalRow): Any = {
    val m = child.eval(input)
    if (m == null) true
    else ChangeFilterUtil.anyKeyNotIn(m.asInstanceOf[MapData], unwatchedSet)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("unwatchedSet", unwatchedSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      boolean ${ev.value} = ${c.isNull} ||
        graft.plans.ChangeFilterUtil.anyKeyNotIn(${c.value}, $setRef);""")
  }

  override protected def withNewChildInternal(newChild: Expression): AnyChangedKeyNotIn =
    copy(child = newChild)
}

/** See [[AnyChangedKeyNotIn]]. Bit-equivalent to
  * `AnyChangedKeyNotIn(MapChangedFields(old, new, toast), unwatched)`
  * without building the map: TRUE iff some field differs null-safely
  * between old and new, is not TOAST-unchanged, and is not unwatched.
  * Null old/new ⇒ TRUE (no computable diff passes); null toast ⇒ empty.
  */
case class AnyWatchedFieldChanged(oldMap: Expression, newMap: Expression,
    toastUnchanged: Expression, unwatched: Seq[String])
    extends TernaryExpression {

  override def first: Expression = oldMap
  override def second: Expression = newMap
  override def third: Expression = toastUnchanged

  private def isStringMap(dt: DataType): Boolean = dt match {
    case MapType(StringType, StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringMap(oldMap.dataType) && isStringMap(newMap.dataType) &&
        (toastUnchanged.dataType match {
          case ArrayType(StringType, _) => true
          case _ => false
        }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (MAP<STRING,STRING>, MAP<STRING,STRING>, ARRAY<STRING>)")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "any_watched_field_changed"

  @transient private lazy val unwatchedSet = ChangeFilterUtil.toSet(unwatched)

  override def eval(input: InternalRow): Any = {
    val o = oldMap.eval(input)
    val n = newMap.eval(input)
    if (o == null || n == null) true
    else {
      val t = toastUnchanged.eval(input)
      ChangeFilterUtil.anyWatchedChanged(o.asInstanceOf[MapData],
        n.asInstanceOf[MapData],
        if (t == null) null else t.asInstanceOf[ArrayData], unwatchedSet)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("unwatchedSet", unwatchedSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    val o = oldMap.genCode(ctx)
    val n = newMap.genCode(ctx)
    val t = toastUnchanged.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${o.code}
      ${n.code}
      boolean ${ev.value} = true;
      if (!${o.isNull} && !${n.isNull}) {
        ${t.code}
        ${ev.value} = graft.plans.ChangeFilterUtil.anyWatchedChanged(
          ${o.value}, ${n.value}, ${t.isNull} ? null : ${t.value}, $setRef);
      }""")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AnyWatchedFieldChanged =
    copy(oldMap = newFirst, newMap = newSecond, toastUnchanged = newThird)
}

object ChangeFilterUtil {

  def toSet(names: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](names.size * 2)
    names.foreach(n => s.add(UTF8String.fromString(n)))
    s
  }

  /** Called from generated code — keep static. */
  def anyKeyNotIn(m: MapData, unwatched: java.util.HashSet[UTF8String]): Boolean = {
    val keys = m.keyArray()
    var i = 0
    while (i < m.numElements()) {
      if (!unwatched.contains(keys.getUTF8String(i))) return true
      i += 1
    }
    false
  }

  /** Called from generated code — keep static. Mirrors
    * [[MapDiffUtil.diff]]'s emission rule (null-safe value inequality,
    * TOAST-sentinel exclusion, old-then-new-only key order) but returns at
    * the FIRST emitted key outside `unwatched` instead of building the map.
    */
  def anyWatchedChanged(oldMap: MapData, newMap: MapData, toast: ArrayData,
      unwatched: java.util.HashSet[UTF8String]): Boolean = {
    val ok = oldMap.keyArray(); val ov = oldMap.valueArray()
    val nk = newMap.keyArray(); val nv = newMap.valueArray()
    val nOld = oldMap.numElements(); val nNew = newMap.numElements()

    var toastSet: java.util.HashSet[UTF8String] = null
    if (toast != null && toast.numElements() > 0) {
      toastSet = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i < toast.numElements()) {
        val s = toast.getUTF8String(i)
        if (s != null) toastSet.add(s)
        i += 1
      }
    }
    val newIdx = new java.util.HashMap[UTF8String, Integer](nNew * 2)
    var i = 0
    while (i < nNew) { newIdx.put(nk.getUTF8String(i), i); i += 1 }

    @inline def watched(k: UTF8String, o: UTF8String, n: UTF8String): Boolean = {
      val equal = if (o == null) n == null else o.equals(n) // null-safe <=>
      !equal && (toastSet == null || !toastSet.contains(k)) &&
        !unwatched.contains(k)
    }
    i = 0
    while (i < nOld) {
      val k = ok.getUTF8String(i)
      val o = if (ov.isNullAt(i)) null else ov.getUTF8String(i)
      val ni = newIdx.remove(k)
      val n = if (ni == null || nv.isNullAt(ni)) null else nv.getUTF8String(ni)
      if (watched(k, o, n)) return true
      i += 1
    }
    i = 0
    while (i < nNew) {
      val k = nk.getUTF8String(i)
      if (newIdx.containsKey(k) &&
          watched(k, null, if (nv.isNullAt(i)) null else nv.getUTF8String(i)))
        return true
      i += 1
    }
    false
  }
}

object ChangeFilterCols {
  def anyChangedKeyNotIn(changes: Column, unwatched: Seq[String]): Column =
    Bridge.column(AnyChangedKeyNotIn(Bridge.expression(changes), unwatched))

  def anyWatchedFieldChanged(oldMap: Column, newMap: Column, toast: Column,
      unwatched: Seq[String]): Column =
    Bridge.column(AnyWatchedFieldChanged(Bridge.expression(oldMap),
      Bridge.expression(newMap), Bridge.expression(toast), unwatched))
}
