package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional DATA LAYOUT clustering — the write-side half of scan
  * pruning. Sorting a table by one column makes that column's parquet
  * row-group min/max stats tight and every other column's useless;
  * Z-ORDERING (bit-interleaving the dimensions' bucket codes into one
  * sort key — Morton order) keeps the stats tight on ALL interleaved
  * dimensions at once, so a predicate on any of them skips most files.
  * This is what Delta's `OPTIMIZE ZORDER BY` and Iceberg's sort-order
  * z-transform do; at 100 TB the difference is reading 1/P of the files
  * for a point predicate instead of all of them, on every dimension the
  * key interleaves.
  *
  * Reference scope: walex has no storage-layout surface (it stops at
  * change delivery) — this is part of the LLM-pipeline extension lane,
  * the layout step a curated corpus goes through before it is served.
  */
object Layout {

  /** Morton/Z interleave of two `bits`-bit bucket codes: bit i of `a`
    * lands at position 2i+1, bit i of `b` at position 2i. Pure integer
    * arithmetic (shift/mask folded into the plan as literals) — codegen
    * keeps it a narrow projection.
    */
  def zOrderKey(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i))
    }.reduce(_ + _)

  /** The documents table's two pruning dimensions, bucketed to 5-bit
    * codes: source (its numeric suffix — the fixture's sources are
    * `src<N>`) and length (n_chars / 32, capped). Shared by the gated
    * stats query and the writer.
    */
  private def coded(docs: DataFrame): DataFrame =
    docs
      .withColumn("src_code", substring(col("source"), 4, 8).cast("int"))
      .withColumn("ncb", least((col("n_chars") / 32).cast("int"), lit(31)))
      .withColumn("z", zOrderKey(col("src_code"), col("ncb"), 5))

  /** pipe05 — the layout AUDIT: assign every document to its fixed-width
    * z-range partition (`pid = z·P / 2^10`, deterministic — the gated
    * form of the range-split a real writer does) and report each
    * partition's min/max SPAN on both dimensions. Because P=16 divides
    * the 10-bit z-space into ALIGNED 64-length ranges, every pid covers
    * an exact 8×8 rectangle of (source, length-bucket) space: both spans
    * are provably ≤ 7, which is the multi-dimensional locality a
    * single-column sort cannot give (source-sorted layout leaves the
    * length span at full width and vice versa). The spans ARE the
    * row-group min/max stats a scan prunes with.
    *
    * Scale shape: one narrow projection for codes+z, one
    * map-side-combined groupBy(pid) — no joins, no windows; the
    * distinct-source count per pid is a tiny per-group set.
    */
  def zOrderStats(spark: SparkSession, d: String, parts: Int = 16): DataFrame =
    zOrderStatsFor(Tables.documents(spark, d), parts)

  /** [[zOrderStats]] over any documents-shaped frame — the spec seam. */
  def zOrderStatsFor(docs: DataFrame, parts: Int = 16): DataFrame =
    coded(docs)
      .withColumn("pid", (col("z") * parts / 1024L).cast("long"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        (max(col("src_code")) - min(col("src_code"))).as("src_span"),
        (max(col("ncb")) - min(col("ncb"))).as("ncb_span"),
        min(col("z")).as("min_z"),
        max(col("z")).as("max_z"))
      .orderBy(col("pid"))

  /** The real write path: range-split on the z key (sampling boundaries,
    * like every production writer) and sort within partitions so parquet
    * row-group stats stay tight inside files too. Returns the written
    * location's row count for convenience.
    */
  def writeZOrdered(docs: DataFrame, dir: String, parts: Int = 16): Long = {
    coded(docs).drop("src_code", "ncb")
      .repartitionByRange(parts, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(dir)
    docs.sparkSession.read.parquet(dir).count()
  }
}
