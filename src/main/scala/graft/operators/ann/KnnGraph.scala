package graft.operators.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED k-NN graph — the edge relation [[Ann.knnGraphOf]] builds,
  * committed as a store instead of rebuilt in-plan per consumer: at
  * 100 TB the graph exists precisely so a search does NOT pay a
  * corpus-wide pass, so rebuilding it per query ([[Ann.graphSearchTopK]]
  * over an in-plan build) is exactly the cost the artifact should
  * amortize. The store gives the edge relation the same discipline as
  * every other persisted index in the repo
  * ([[graft.operators.store.IndexManifest]]): immutable hash-grouped
  * leaves (`edges/ggrp=<g>/leaf=v<N>-<tag>`, grouped by `vec_id` so a
  * node's adjacency list is one partition probe and the relation
  * co-locates with other vec_id-keyed stores), exclusive-publish
  * versioned manifests, committed-leaf pruning, tag idempotency for
  * at-least-once crawl folds, online-safe compaction under the retained
  * grace window.
  *
  * Lifecycle (the crawl-loop shape):
  *  - [[build]] — one full construction pass ([[Ann.knnGraphOf]]:
  *    cell-keyed candidate pairing, never corpus × corpus).
  *  - [[append]] — O(batch · degree) incremental linking: each new
  *    vector greedy-searches the COMMITTED graph for its neighbors
  *    (seeded at deterministic hub vertices), committing its forward
  *    edges plus the reverse edges that splice it into existing
  *    adjacency lists.
  *  - [[refine]] — one [[Ann.nnDescentRound]] over the committed edges
  *    (the maintenance pass that repairs append approximations),
  *    rewritten as a single fresh leaf.
  *  - [[compact]] — verbatim small-file fold.
  *
  * Reference scope: walex has no ANN surface; this is the
  * training-data-pipeline extension lane (SemDeDup/HNSW substrate).
  */
object KnnGraph {

  import graft.operators.store.IndexManifest

  /** Hash-range partition dial (the Dedup/Multimodal figure): small
    * enough that a batch's touched-group list is driver-side metadata,
    * large enough that point probes prune most of the store.
    */
  val DefaultGroups = 32

  private def metaOf(indexDir: String) = IndexManifest.readMeta(indexDir)

  private def ggrp(groups: Int) =
    pmod(xxhash64(col("vec_id")), lit(groups.toLong)).cast("int")

  /** Write one committed edge leaf (vec_id, nbr_id, rank, mutual) and
    * publish the next manifest — the shared append/build/refine commit
    * path. `replace = true` commits ONLY the new leaf (compaction /
    * refine semantics); otherwise the leaf joins the committed set.
    */
  private def commitLeaf(edges: DataFrame, indexDir: String, tag: String,
      groups: Int, replace: Boolean): Unit = {
    require(tag.matches("[0-9A-Za-z_\\-]+"), s"invalid leaf tag: $tag")
    val meta = metaOf(indexDir).getOrElse(IndexManifest.Meta(0L, groups,
      IndexManifest.legacyLeaves(indexDir, Seq("edges")), Seq.empty))
    if (meta.hasLeafTag(tag)) return
    if (meta.groups != groups)
      throw new IllegalStateException(
        s"$indexDir is grouped at ${meta.groups} but the write says " +
          s"$groups — use the store's dial")
    val leafDir = IndexManifest.leafName(meta.version + 1, tag)
    IndexManifest.dropResidue(indexDir, Seq("edges"), leafDir)
    edges
      .select(col("vec_id"), col("nbr_id"), col("rank"), col("mutual"))
      .withColumn("ggrp", ggrp(groups))
      .withColumn("leaf", lit(leafDir))
      .repartition(col("ggrp"))
      .write.partitionBy("ggrp", "leaf")
      .mode("append").parquet(s"$indexDir/edges")
    IndexManifest.commit(indexDir, meta.copy(version = meta.version + 1,
      leaves = if (replace) Seq(leafDir) else meta.leaves :+ leafDir))
    IndexManifest.sweep(indexDir, Seq("edges"), meta.version + 1)
  }

  /** Build the graph over `emb` ([[Ann.knnGraphOf]] — one cell-keyed
    * construction pass) and commit it as the store's first leaf.
    */
  def build(emb: DataFrame, indexDir: String, tag: String,
      nlist: Int = 16, k: Int = 3, refineIters: Int = 1,
      groups: Int = DefaultGroups): Unit =
    commitLeaf(Ann.knnGraphOf(emb, nlist, k, refineIters), indexDir,
      tag, groups, replace = false)

  /** The committed edge relation (vec_id, nbr_id, rank, mutual) — a
    * `leaf` partition prune over the committed set; legacy stores scan
    * every leaf.
    */
  def edges(spark: SparkSession, indexDir: String): DataFrame =
    IndexManifest.committedOnly(
        spark.read.parquet(s"$indexDir/edges"), metaOf(indexDir).map(_.leaves))
      .select(col("vec_id"), col("nbr_id"), col("rank"), col("mutual"))

  /** Committed leaf count — the census the harnesses gate. */
  def leafCount(indexDir: String): Int =
    metaOf(indexDir).map(_.leaves.size).getOrElse(0)

  /** Greedy beam search over the COMMITTED graph ([[Ann.graphSearchTopK]]
    * reading edges from storage): candidates come only from the stored
    * edges, so cost is |queries| · beam · degree per hop regardless of
    * corpus size — the property persisting the graph buys.
    */
  def searchTopK(spark: SparkSession, indexDir: String, emb: DataFrame,
      queries: DataFrame, seeds: DataFrame, hops: Int = 2, beam: Int = 8,
      k: Int = 5): DataFrame =
    Ann.graphSearchTopK(edges(spark, indexDir), emb, queries, seeds,
      hops, beam, k)

  /** Deterministic HUB seeds: the store's `n` smallest vec_ids — the
    * fixed entry points [[append]] searches from (ids-only
    * TakeOrderedAndProject; metadata-sized).
    */
  private def hubIds(spark: SparkSession, indexDir: String,
      n: Int): DataFrame =
    edges(spark, indexDir).select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(n)

  /** Link a new batch into the committed graph — the crawl-increment
    * move, O(batch · degree), no corpus pass: each batch vector
    * greedy-searches the stored edges for its top-k neighbors (seeded
    * at the [[hubIds]] hub vertices), then ONE leaf commits its forward
    * edges (rank = search rank) plus the REVERSE edges that splice the
    * newcomer into its neighbors' adjacency lists (appended at rank k —
    * a beyond-quota approximation a later [[refine]] round re-ranks
    * exactly; they carry `mutual = true` by construction, both
    * directions land together). Tag-idempotent like every other fold.
    *
    * Caller contract: batch vec_ids are new to the graph; `emb` must
    * cover the committed graph's vertices AND the batch (exact
    * re-scoring joins by id).
    */
  def append(spark: SparkSession, indexDir: String, emb: DataFrame,
      batch: DataFrame, tag: String, k: Int = 3, hops: Int = 2,
      beam: Int = 8, nSeeds: Int = 16): Unit = {
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (meta.hasLeafTag(tag)) return
    val queries = batch.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val seeds = queries.select(col("query_id"))
      .crossJoin(broadcast(hubIds(spark, indexDir, nSeeds)))
    val found = Ann.graphSearchTopK(edges(spark, indexDir), emb, queries,
      seeds, hops, beam, k)
    val fwd = found.select(col("query_id").as("vec_id"),
      col("vec_id").as("nbr_id"), col("rnk").as("rank"),
      lit(true).as("mutual"))
    val rev = found.select(col("vec_id"),
      col("query_id").as("nbr_id"), lit(k).as("rank"),
      lit(true).as("mutual"))
    commitLeaf(fwd.unionByName(rev), indexDir, tag, meta.groups,
      replace = false)
  }

  /** One NN-descent maintenance round over the committed edges
    * ([[Ann.nnDescentRound]] — neighbors ∪ reverse ∪ 2-hop candidates,
    * exact verify, linear in |E|), committed as the store's single
    * fresh leaf: repairs [[append]]'s rank-k approximations and lifts
    * graph quality without any corpus×corpus pass. Doubles as
    * compaction (the result replaces every committed leaf).
    */
  def refine(spark: SparkSession, indexDir: String, emb: DataFrame,
      tag: String, k: Int = 3): Unit = {
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (meta.hasLeafTag(tag)) return
    val refined = Ann.nnDescentRound(edges(spark, indexDir), emb, k)
      .select(col("vec_id"), col("nbr_id"), col("rank"))
    val rev = refined.select(col("nbr_id").as("vec_id"),
      col("vec_id").as("nbr_id"), lit(true).as("mutual"))
    val withMutual = refined
      .join(rev, Seq("vec_id", "nbr_id"), "left")
      .withColumn("mutual", coalesce(col("mutual"), lit(false)))
    commitLeaf(withMutual, indexDir, tag, meta.groups, replace = true)
  }

  /** Verbatim small-file fold of the committed leaves into one (the
    * crawl loop's maintenance cadence; rows unchanged, searches
    * identical, online-safe under the manifest grace window).
    */
  def compact(spark: SparkSession, indexDir: String, tag: String): Unit = {
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (meta.hasLeafTag(tag)) return
    commitLeaf(edges(spark, indexDir), indexDir, tag, meta.groups,
      replace = true)
  }

  /** ann20's driver-checked shape — ann18's planted theorem through
    * BUILD → PERSIST → RELOAD → SEARCH: the graph over corpus + two
    * exact copies per planted original commits to storage, and the
    * search then runs against the COMMITTED edge relation only (a torn
    * commit, a leaf lost by the manifest, or a broken reload surfaces
    * as a missing row — the persisted artifact is load-bearing). Each
    * +200000 copy queries the stored graph seeded at itself; hop 1
    * provably reaches both its twins through stored edges and exact
    * rerank puts the ORIGINAL first (the ann18 argument, unchanged).
    * The committed-leaf census rides the relation.
    */
  def persistedSearchSelfRecall(spark: SparkSession, d: String,
      nQueries: Int = 64): DataFrame = {
    val base = graft.Tables.spread(graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))).cache()
    val qs = base.filter(col("vec_id") < nQueries)
    val copies1 = qs.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"))
    val copies2 = qs.select((col("vec_id") + 200000L).as("vec_id"),
      col("embedding"))
    val all = base.unionByName(copies1).unionByName(copies2)
    val indexDir = s"${graft.Tables.scratchDir("graft_ann20")}/graph"
    build(all, indexDir, "corpus")
    val queries = copies2.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val seeds = copies2.select(col("vec_id").as("query_id"), col("vec_id"))
    searchTopK(spark, indexDir, all, queries, seeds,
      hops = 2, beam = 8, k = 1)
      .select(col("query_id"), col("vec_id").as("match_id"), col("sim"),
        lit(leafCount(indexDir)).as("n_leaves"))
      .orderBy(col("query_id"))
  }
}
