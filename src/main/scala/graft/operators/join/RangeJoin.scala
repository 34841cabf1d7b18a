package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generic point-in-interval range join — the second of the brief's
  * "operators Spark lacks" (alongside [[AsofJoin]]): pair every left
  * (point) row with every right (interval) row whose `[start, end]`
  * contains the point, WITHOUT a cartesian product.
  *
  * Spark's own planner turns a pure inequality join into
  * BroadcastNestedLoopJoin (O(points × intervals) comparisons and a
  * broadcast of one whole side) — fatal at 100 TB. The standard fix,
  * used by every production range-join implementation (Databricks'
  * range-join hint does exactly this binning under the hood), is to
  * overlay a fixed grid of width `bin` on the time axis:
  *
  *  - a point lands in exactly ONE bin → no dedup step is needed;
  *  - an interval is exploded to every bin it overlaps
  *    (⌈len/bin⌉ + 1 rows — choose `bin` near the typical interval
  *    length so this stays O(1) per interval);
  *  - candidates = equi-join on the bin id (hash shuffle, AQE-skew
  *    splittable — a dense time region is a hot bin, not a hot task,
  *    because both sides hash on (bin) and AQE splits oversized
  *    partitions);
  *  - exact `start ≤ t ≤ end` re-check filters the candidates inside
  *    the same codegen stage — no second pass.
  *
  * Cost: one shuffle of each side keyed by bin, join fan-in bounded by
  * bin occupancy — the plan shape survives any scale where intervals
  * are short relative to the data span. Long-tail intervals (>> bin)
  * are the caller's contract to cap or split; the scale hazard is
  * interval length, not row count.
  */
object RangeJoin {

  /** @param points    left frame; all columns preserved
    * @param pointTime long/numeric event-time column (same unit both sides)
    * @param intervals right frame; all columns preserved — column names
    *                  must be disjoint from `points`'
    * @param start     interval start column name on `intervals` (inclusive)
    * @param end       interval end column name on `intervals` (inclusive)
    * @param bin       grid width in the time unit; pick ≈ median interval
    *                  length (explosion factor = len/bin + 1)
    */
  def pointInInterval(points: DataFrame, pointTime: String,
      intervals: DataFrame, start: String, end: String, bin: Long): DataFrame = {
    require(bin > 0, "bin width must be positive")
    val reserved = Seq("graft_bin")
    require(!(points.columns ++ intervals.columns).exists(reserved.contains),
      "inputs use reserved graft_* column names")
    require(points.columns.intersect(intervals.columns).isEmpty,
      s"point/interval column names must be disjoint, both have: " +
        points.columns.intersect(intervals.columns).mkString(", "))
    val p = points.withColumn("graft_bin", binId(points, pointTime, bin))
    val i = intervals.withColumn("graft_bin",
      explode(sequence(binId(intervals, start, bin), binId(intervals, end, bin))))
    p.join(i, Seq("graft_bin"))
      .filter(contains(col(pointTime), col(start), col(end)))
      .drop("graft_bin")
  }

  /** Grid-cell id, exact for integral time columns: `floor(t / bin)` in
    * double is monotone-correct but inexact past 2^52 (nanosecond epochs),
    * while `div` alone truncates toward zero, mis-binning negative times —
    * subtracting `pmod` first makes it a true floor for any sign.
    * Fractional/decimal time columns take the `floor` lane instead (`div`
    * rejects non-integral operands, and doubles carry no sub-ULP exactness
    * to preserve anyway). The column name is backquote-escaped, so names
    * that are not bare identifiers (`a-b`, `order`) resolve as attributes,
    * not as SQL expressions. Edge: an integral time within `bin` of
    * Long.MinValue overflows the subtraction and raises under ANSI —
    * fail-loud, and far outside any real time domain.
    */
  private def binId(df: DataFrame, c: String, bin: Long): Column = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val integral = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val q = "`" + c.replace("`", "``") + "`"
    if (integral)
      expr(s"CAST(($q - pmod($q, ${bin}L)) div ${bin}L AS BIGINT)")
    else floor(col(c) / bin).cast("long")
  }

  /** The exact containment predicate — the single definition both the
    * binned join's re-check and any caller-side assertion use.
    */
  def contains(t: Column, lo: Column, hi: Column): Column = t >= lo && t <= hi
}
