package graft.operators.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic as-of join: for every left row, attach the right row with the
  * greatest time ≤ the left row's time, per key — the standard
  * "latest value as of t" lookup (prices, dimensions, sensor state).
  *
  * Implemented as the union + last-value-over-window merge, not a range
  * join: both inputs are tagged and unioned, then the right row's
  * attributes — packed into ONE struct so the match is row-atomic even
  * when individual attributes are null — are
  * `last(struct, ignoreNulls) over (partition by keys order by time,
  * side)` with right rows sorting before left rows at equal timestamps
  * (inclusive ≤ semantics). Cost is ONE sort-shuffle of |left| + |right|
  * rows by key; the naive formulation (range join, then max per left row)
  * first explodes each left row against every earlier right row —
  * O(left × right/key) intermediate — which is the difference between a
  * plan that survives 100 TB and one that doesn't. Skewed keys ride the
  * same AQE skew handling as any sort-merge exchange.
  *
  * Determinism contract: callers must ensure at most one right row per
  * (keys, time) — pre-reduce with a deterministic rule (e.g. max id) —
  * otherwise "the" as-of match is ill-defined. [[AsofJoin.asof]] leaves
  * the reduction to the caller so the rule stays visible at the call site.
  */
object AsofJoin {

  /** @param left  left frame; all its columns are preserved
    * @param right right frame containing (keys ++ time ++ attrs), at most
    *              one row per (keys, time)
    * @param keys  equi-join key column names (present on both sides)
    * @param time  event-time column name (present on both sides, mutually
    *              comparable type)
    * @param attrs right-side attribute columns to carry; emitted with an
    *              `asof_` prefix (all null when no right row precedes)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      time: String, attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asof join needs at least one key column")
    require(attrs.nonEmpty, "asof join needs at least one carried attribute")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("graft_r") && !leftCols.contains("graft_is_left"),
      "left side uses reserved graft_* column names")
    val rStruct: StructType = right.select(attrs.map(col): _*).schema
    val taggedLeft = left
      .withColumn("graft_is_left", lit(1))
      .withColumn("graft_r", lit(null).cast(rStruct))
    val taggedRight = right
      .withColumn("graft_is_left", lit(0))
      .withColumn("graft_r", struct(attrs.map(col): _*))
      .select(keys.map(col) ++ Seq(col(time), col("graft_is_left"), col("graft_r")): _*)
    // right rows contribute nulls for the left-only columns via unionByName
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc, col("graft_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("graft_asof", last(col("graft_r"), ignoreNulls = true).over(w))
      .filter(col("graft_is_left") === 1)
      .select(leftCols.map(col) ++
        attrs.map(a => col("graft_asof").getField(a).as(s"asof_$a")): _*)
  }
}
