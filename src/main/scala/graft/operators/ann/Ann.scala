package graft.operators.ann

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two lanes:
  *  - brute-force cosine top-k: correctness baseline. Query side is tiny and
  *    broadcast, so the big side streams once with no shuffle — at 100 TB
  *    this is a single scan per query batch.
  *  - LSH (random-hyperplane / sign) bucketing: scale path. Signature bits
  *    come from deterministic pseudo-random hyperplanes (hash-derived ±1
  *    components, no stored model); candidates are an equi-join on bucket
  *    prefixes.
  */
object Ann {

  /** Cosine similarity, computed in double with a single array pass.
    * zip_with + aggregate stay inside codegen; accumulation order is the
    * array order, so results are deterministic and engine-portable.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot  = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na   = aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val nb   = aggregate(b, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force exact top-k neighbors for a small query set (vec_id <
    * nQueries). Queries broadcast; ranking via row_number with id
    * tie-break for full determinism.
    */
  def bruteForceTopK(spark: SparkSession, d: String,
                     nQueries: Int = 8, k: Int = 5): DataFrame = {
    // per-row cosine over the whole corpus is compute-bound → spread the
    // unsplittable local scan (no-op at scale, Tables.spread)
    val emb = Tables.spread(Tables.embeddings(spark, d))
    val queries = broadcast(
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    queries.join(emb, col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
      .select(col("query_id"), col("vec_id"), col("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Deterministic random-hyperplane signature: bit j = sign(v · h_j) where
    * h_j[dim] = ±1 derived from xxhash64(j, dim). No model state — any
    * executor can recompute any plane, so this scales embarrassingly.
    * (SQL-string lambdas: the nested shift needs expression offsets.)
    */
  def lshSignature(vecCol: String, bits: Int): Column = expr(
    s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, j) -> acc |
       |  IF(aggregate(zip_with($vecCol, sequence(0, size($vecCol) - 1),
       |       (x, i) -> CAST(x AS DOUBLE) *
       |                 IF((xxhash64(j, i) & 1) = 1, 1.0D, -1.0D)),
       |     0.0D, (s, p) -> s + p) > 0,
       |     shiftleft(1L, j), 0L))""".stripMargin)

  /** LSH-bucketed nearest-neighbor: signature prefix (bucketBits) forms the
    * bucket key; exact cosine re-ranks within buckets; output = best
    * neighbor per vector among its bucket's candidates.
    */
  def lshNearestInBucket(spark: SparkSession, d: String,
                         bits: Int = 16, bucketBits: Int = 8): DataFrame = {
    val emb = Tables.spread(Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding")))
      .withColumn("sig", lshSignature("embedding", bits))
      .withColumn("bucket", expr(s"shiftrightunsigned(sig, ${bits - bucketBits})"))
    val a = emb.select(col("bucket"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = emb.select(col("bucket"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val w = Window.partitionBy(col("id_a")).orderBy(col("sim").desc, col("id_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("id_a").as("vec_id"), col("id_b").as("nearest_in_bucket"),
        round(col("sim"), 4).as("sim"))
      .orderBy(col("vec_id"))
  }

  /** Per-label embedding stats (norm distribution) — the sanity scan a
    * pipeline runs before indexing.
    *
    * Norms are accumulated as scaled integers: each float² is exact in
    * double (24-bit mantissa squared < 53 bits), scaled by 1e8 and rounded
    * per element, then summed as BIGINT — exact, partition-order
    * independent, and engine-portable (no DECIMAL canonicalization drift).
    */
  def labelStats(spark: SparkSession, d: String): DataFrame =
    Tables.spread(Tables.embeddings(spark, d))
      .select(col("label"), col("vec_id"),
        aggregate(col("embedding"), lit(0L),
          (acc, v) => acc +
            round(v.cast("double") * v.cast("double") * lit(1e8)).cast("long"))
          .as("norm_sq_e8"),
        size(col("embedding")).as("dim"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        max(col("dim")).as("dim"),
        sum(col("norm_sq_e8")).as("sum_norm_sq_e8"))
      .orderBy(col("label"))
}
