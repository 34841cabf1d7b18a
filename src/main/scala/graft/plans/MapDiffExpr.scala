package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native change-diff (P5, reference transaction_filter.ex:209-222): the
  * old-vs-new per-field diff `map<field, struct<old_value, new_value>>`
  * keeping only fields whose values differ (null-safe) and whose old cell
  * was not the unchanged-TOAST sentinel.
  *
  * Bit-compatible with the `map_filter(map_zip_with(old, new, …), …)`
  * formulation it replaces — including key ordering (old map's key order,
  * then new-only keys) and null-safe equality — but in one tight loop.
  * The lambda version evaluates through interpreted `HigherOrderFunction`
  * dispatch per field per row: on the engine's hot path (every UPDATE
  * event carries a diff) that interpreter tax scales with the stream.
  *
  * `toastUnchanged` must be non-null (callers coalesce to an empty array).
  */
case class MapChangedFields(oldMap: Expression, newMap: Expression,
    toastUnchanged: Expression) extends TernaryExpression {

  override def first: Expression = oldMap
  override def second: Expression = newMap
  override def third: Expression = toastUnchanged

  private val stringMap = MapType(StringType, StringType)

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

  override def dataType: DataType = MapType(StringType,
    StructType(Seq(
      StructField("old_value", StringType),
      StructField("new_value", StringType))),
    valueContainsNull = false)
  override def nullable: Boolean = oldMap.nullable || newMap.nullable
  override def prettyName: String = "map_changed_fields"

  override def nullSafeEval(o: Any, n: Any, t: Any): Any =
    MapDiffUtil.diff(o.asInstanceOf[MapData], n.asInstanceOf[MapData],
      t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (o, n, t) =>
      s"${ev.value} = graft.plans.MapDiffUtil.diff($o, $n, $t);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): MapChangedFields =
    copy(oldMap = newFirst, newMap = newSecond, toastUnchanged = newThird)
}

object MapDiffUtil {

  /** Called from generated code — keep static. */
  def diff(oldMap: MapData, newMap: MapData, toast: ArrayData): MapData = {
    val ok = oldMap.keyArray(); val ov = oldMap.valueArray()
    val nk = newMap.keyArray(); val nv = newMap.valueArray()
    val nOld = oldMap.numElements(); val nNew = newMap.numElements()

    val toastSet = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < toast.numElements()) {
      val s = toast.getUTF8String(i)
      if (s != null) toastSet.add(s)
      i += 1
    }
    val newIdx = new java.util.HashMap[UTF8String, Integer](nNew * 2)
    i = 0
    while (i < nNew) { newIdx.put(nk.getUTF8String(i), i); i += 1 }

    val keys = new scala.collection.mutable.ArrayBuffer[Any](nOld)
    val vals = new scala.collection.mutable.ArrayBuffer[Any](nOld)
    @inline def emit(k: UTF8String, o: UTF8String, n: UTF8String): Unit = {
      val equal = if (o == null) n == null else o.equals(n) // null-safe <=>
      if (!equal && !toastSet.contains(k)) {
        keys += k
        vals += new GenericInternalRow(Array[Any](o, n))
      }
    }
    // old map's keys first (map_zip_with ordering), then new-only keys
    i = 0
    while (i < nOld) {
      val k = ok.getUTF8String(i)
      val o = if (ov.isNullAt(i)) null else ov.getUTF8String(i)
      val ni = newIdx.remove(k)
      val n = if (ni == null || nv.isNullAt(ni)) null else nv.getUTF8String(ni)
      emit(k, o, n)
      i += 1
    }
    i = 0
    while (i < nNew) {
      val k = nk.getUTF8String(i)
      if (newIdx.containsKey(k))
        emit(k, null, if (nv.isNullAt(i)) null else nv.getUTF8String(i))
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys.toArray),
      new GenericArrayData(vals.toArray))
  }
}

object MapDiffCols {
  def mapChangedFields(oldMap: Column, newMap: Column, toast: Column): Column =
    Bridge.column(MapChangedFields(
      Bridge.expression(oldMap), Bridge.expression(newMap), Bridge.expression(toast)))
}
