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

  /** How many hub ids ride the manifest — the seed pool [[hubIds]]
    * serves without scanning the store. This is the DEFAULT; each
    * store can dial its own pool size via the `hubs_n` manifest param
    * ([[setHubCount]] — the `retain` treatment: seed-pool size is the
    * recall/cost knob for graph search, so it belongs to the store,
    * not the binary).
    */
  private val DefaultHubCount = 64

  /** The store's dialed pool size: `hubs_n` param, default
    * [[DefaultHubCount]] — pre-dial manifests keep the default. A
    * malformed value (manual manifest edit, cross-version corruption)
    * throws a CONTEXTUAL error instead of a bare
    * NumberFormatException from every later commit/search.
    */
  private def hubCountOf(meta: Option[IndexManifest.Meta]): Int =
    meta.flatMap(_.params.get("hubs_n")).map(_.trim).filter(_.nonEmpty)
      .map { s =>
        s.toIntOption.getOrElse(throw new IllegalStateException(
          s"malformed hubs_n manifest param '$s' — the hub-pool dial " +
            "must be a positive INT; repair it with setHubCount"))
      }.filter(_ >= 1).getOrElse(DefaultHubCount)

  /** The next commit's hub list: the `hubN` (store-dialed) smallest vec_ids of
    * (prior hubs ∪ the just-written leaf's vertices). The leaf read-back
    * is a partition-pruned TakeOrdered over ONE leaf — batch-sized for
    * appends, so maintaining the pool costs O(batch) there. [[merge]] is
    * the documented exception: its single leaf IS the union of the
    * shards, so the read-back is merge-sized — paid once per merge, the
    * same order as the merge's own write. On a replace commit
    * (refine/compact) the prior pool is DROPPED: the new leaf IS the
    * whole store and tombstoned vertices were dropped physically before
    * the write, so the read-back can never resurrect a stale hub after
    * the tombstone set clears. `exclude` anti-joins known-tombstoned
    * vec_ids out of the read-back (the merge path rides its sources'
    * takedowns into the same commit — without the exclusion a dead
    * vertex would enroll as a hub in the very commit that tombstones
    * it, contradicting the rule above).
    */
  private def nextHubs(spark: SparkSession, indexDir: String,
      leafDir: String, prior: Seq[Long], hubN: Int,
      exclude: Option[DataFrame] = None): Seq[Long] = {
    val freshBase = spark.read.parquet(s"$indexDir/edges")
      .filter(col("leaf") === leafDir)
      .select(col("vec_id")).distinct()
    val fresh = exclude.fold(freshBase)(t =>
        freshBase.join(broadcast(t.select(col("vec_id"))), Seq("vec_id"),
          "left_anti"))
      .orderBy(col("vec_id")).limit(hubN)
      .collect().map(_.getLong(0)).toSeq
    (prior ++ fresh).distinct.sorted.take(hubN)
  }

  private def hubsParam(meta: IndexManifest.Meta): Seq[Long] =
    meta.params.get("hubs").toSeq.flatMap(_.split(","))
      .filter(_.nonEmpty).map(_.toLong)

  /** Tags RETIRED from the manifest's leaf/tomb lists by replace commits
    * (refine/compact/regroup rewrite the store as one fresh leaf, which
    * would otherwise erase every prior commit's tag) — kept in the
    * manifest's `donetags` param so tag idempotency survives the
    * rewrite: a checkpoint-replayed crawl batch whose leaf was folded
    * away by an intervening refine still no-ops instead of committing
    * duplicate edges. Growth is one short tag per retired commit —
    * manifest-sized metadata, linear in commits ever made, the price of
    * an exactly-once fold claim that holds across maintenance.
    */
  private def doneTags(meta: IndexManifest.Meta): Set[String] =
    meta.params.get("donetags").toSeq.flatMap(_.split(","))
      .filter(_.nonEmpty).toSet

  /** Has `tag` been committed — as a live leaf OR retired by a later
    * replace commit? The idempotency check every fold uses.
    */
  private def isDone(meta: IndexManifest.Meta, tag: String): Boolean =
    meta.hasLeafTag(tag) || doneTags(meta).contains(tag)

  private def isDoneTomb(meta: IndexManifest.Meta, tag: String): Boolean =
    meta.hasTombTag(tag) || doneTags(meta).contains(tag)

  /** The `donetags` value a replace commit publishes: prior retired tags
    * plus every leaf/tomb tag the rewrite erases.
    */
  private def retiredTags(meta: IndexManifest.Meta): String =
    (doneTags(meta) ++ meta.leaves.map(IndexManifest.tagOf) ++
      meta.tombs.map(IndexManifest.tagOf)).toSeq.sorted.mkString(",")

  /** Write one committed edge leaf (vec_id, nbr_id, rank, mutual) and
    * publish the next manifest — the shared append/build/refine commit
    * path. `replace = true` commits ONLY the new leaf AND clears the
    * tombstone set (compaction/refine semantics: dead edges were
    * dropped physically by the caller); otherwise the leaf joins the
    * committed set and tombstones carry over. Every commit refreshes
    * the manifest's HUB pool from the written leaf ([[nextHubs]]), so
    * seed selection never scans the store.
    */
  private def commitLeaf(edges: DataFrame, indexDir: String, tag: String,
      groups: Int, replace: Boolean): Unit = {
    require(tag.matches("[0-9A-Za-z_\\-]+"), s"invalid leaf tag: $tag")
    val meta = metaOf(indexDir).getOrElse(IndexManifest.Meta(0L, groups,
      IndexManifest.legacyLeaves(indexDir, Seq("edges")),
      IndexManifest.legacyLeaves(indexDir, Seq("tombs"))))
    if (isDone(meta, tag)) return
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
    val spark = edges.sparkSession
    val hubN = hubCountOf(Some(meta))
    // prior pool for the fold: a replace commit drops it (the new leaf
    // IS the store); a PRE-POOL store (committed before the pool
    // existed, or a merge destination upgraded mid-life) enrolls from
    // the full committed scan ONCE here — reading only the new leaf
    // would silently seed the pool with the batch's ids, not the
    // store's smallest, and the scan fallback in hubIds would stop
    // triggering the moment this commit publishes a partial pool
    val prior =
      if (replace) Seq.empty
      else {
        val pooled = hubsParam(meta)
        if (pooled.nonEmpty || meta.leaves.isEmpty) pooled
        else IndexManifest.committedOnly(
            spark.read.parquet(s"$indexDir/edges"), Some(meta.leaves))
          .select(col("vec_id")).distinct()
          .orderBy(col("vec_id")).limit(hubN)
          .collect().map(_.getLong(0)).toSeq
      }
    val hubs = nextHubs(spark, indexDir, leafDir, prior, hubN)
    val params = meta.params + ("hubs" -> hubs.mkString(",")) ++
      (if (replace) Map("donetags" -> retiredTags(meta)) else Map.empty)
    IndexManifest.commit(indexDir, meta.copy(version = meta.version + 1,
      leaves = if (replace) Seq(leafDir) else meta.leaves :+ leafDir,
      tombs = if (replace) Seq.empty else meta.tombs,
      params = params))
    IndexManifest.sweep(indexDir, Seq("edges", "tombs"), meta.version + 1)
  }

  /** KILL-ALL vertex tombstones — the takedown lane on the graph store
    * (mm18/ann15's device on the edge relation): a deleted vector must
    * stop appearing in ANY search result without rewriting a committed
    * edge leaf, so deletes commit as immutable id-leaves
    * (`tombs/leaf=v<N>-<tag>`, parquet of `vec_id`) under the same
    * tag-idempotent manifest discipline. [[searchTopK]] anti-joins the
    * set BEFORE its top-k cut; the tombstoned vertex keeps ROUTING
    * (its edges stay — the HNSW soft-delete rule: dropping a hub from
    * routing would orphan its neighborhood) until [[refine]] or
    * [[compact]] drops every incident edge physically and clears the
    * set, after which a re-crawled vector re-links via [[append]].
    */
  def delete(spark: SparkSession, indexDir: String, ids: DataFrame,
      tag: String): Unit = {
    require(tag.matches("[0-9A-Za-z_\\-]+"), s"invalid tombstone tag: $tag")
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (isDoneTomb(meta, tag)) return
    val leafDir = IndexManifest.leafName(meta.version + 1, tag)
    IndexManifest.dropResidue(indexDir, Seq("tombs"), leafDir)
    ids.select(col("vec_id").cast("long").as("vec_id")).distinct()
      .withColumn("leaf", lit(leafDir))
      .coalesce(1) // a delete batch is id-sized: one file per tag
      .write.partitionBy("leaf").mode("append").parquet(s"$indexDir/tombs")
    IndexManifest.commit(indexDir, meta.copy(version = meta.version + 1,
      tombs = meta.tombs :+ leafDir))
  }

  /** The committed tombstoned vec_ids (None when nothing was deleted —
    * zero cost on the search path).
    */
  private def tombstones(spark: SparkSession,
      indexDir: String): Option[DataFrame] =
    tombstonesSnapshot(spark, indexDir, metaOf(indexDir))

  private def tombstonesSnapshot(spark: SparkSession, indexDir: String,
      meta: Option[IndexManifest.Meta]): Option[DataFrame] = {
    val live = meta.map(_.tombs)
    if (live.forall(_.isEmpty)) None
    else Some(IndexManifest.committedOnly(
        spark.read.parquet(s"$indexDir/tombs"), live)
      .select(col("vec_id")).distinct())
  }

  /** The committed tombstoned vec_ids as a relation (empty when none) —
    * public for reconcile jobs, the
    * [[graft.operators.ann.PqIndex.tombstonedIds]] rationale.
    */
  def tombstonedIds(spark: SparkSession, indexDir: String): DataFrame =
    tombstones(spark, indexDir)
      .getOrElse(spark.range(0).select(col("id").as("vec_id")))

  /** Drop every edge INCIDENT to a tombstoned vertex (either endpoint)
    * — what [[refine]]/[[compact]] fold, making the physical drop.
    */
  private def liveEdges(spark: SparkSession, indexDir: String): DataFrame = {
    val e = edges(spark, indexDir)
    tombstones(spark, indexDir).fold(e) { t =>
      val bt = broadcast(t)
      e.join(bt, Seq("vec_id"), "left_anti")
        .join(bt.withColumnRenamed("vec_id", "nbr_id"), Seq("nbr_id"),
          "left_anti")
    }
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
    * corpus size — the property persisting the graph buys. Tombstoned
    * vertices ([[delete]]) are anti-joined out BEFORE the top-k cut
    * but keep routing until compaction.
    */
  def searchTopK(spark: SparkSession, indexDir: String, emb: DataFrame,
      queries: DataFrame, seeds: DataFrame, hops: Int = 2, beam: Int = 8,
      k: Int = 5): DataFrame = {
    val meta = metaOf(indexDir)
    // eagerHops: the store is the storage-backed case the driver-side
    // frontier carve-out exists for — constant-size per-hop plans with
    // STATIC ggrp partition pruning, instead of a lazy plan that doubles
    // per hop (see Ann.graphSearchTopKEager's scaladoc)
    Ann.graphSearchTopK(groupedEdges(spark, indexDir, meta), emb, queries,
      seeds, hops, beam, k, exclude = tombstones(spark, indexDir),
      groupedBy = meta.map(_.groups), eagerHops = true)
  }

  /** The committed edge relation WITH its `ggrp` partition column — the
    * hop joins carry it so the frontier's groups prune the scan at
    * runtime (dynamic partition pruning; see [[Ann.graphSearchTopK]]).
    */
  private def groupedEdges(spark: SparkSession, indexDir: String,
      meta: Option[IndexManifest.Meta]): DataFrame =
    IndexManifest.committedOnly(
        spark.read.parquet(s"$indexDir/edges"), meta.map(_.leaves))
      .select(col("ggrp"), col("vec_id"), col("nbr_id"), col("rank"),
        col("mutual"))

  /** TIME-TRAVEL search — [[searchTopK]] against the exact snapshot a
    * PAST manifest version committed (edges AND the tombstone set — the
    * dd23 device on the graph store): a vertex linked later is
    * unreachable, a vertex tombstoned later still matches. Reach is the
    * retained-manifest grace window (whose leaves stay on disk — the
    * same rule that makes refine/compact online-safe); asking beyond it
    * throws instead of silently answering from a different snapshot.
    */
  def searchTopKAt(spark: SparkSession, indexDir: String, emb: DataFrame,
      queries: DataFrame, seeds: DataFrame, asOfVersion: Long,
      hops: Int = 2, beam: Int = 8, k: Int = 5): DataFrame = {
    val meta = IndexManifest.readMetaAt(indexDir, asOfVersion).getOrElse(
      throw new IllegalArgumentException(
        s"manifest version $asOfVersion is not retained at $indexDir — " +
          s"time travel reaches the ${IndexManifest.retentionWindow(indexDir)}-" +
          "version grace window"))
    val asOfEdges = IndexManifest.committedOnly(
        spark.read.parquet(s"$indexDir/edges"), Some(meta.leaves))
      .select(col("ggrp"), col("vec_id"), col("nbr_id"), col("rank"),
        col("mutual"))
    // the group dial pins from the SNAPSHOT (a later regroup re-keys
    // ggrp — hashing the frontier with the head's dial would prune to
    // the wrong partitions)
    Ann.graphSearchTopK(asOfEdges, emb, queries, seeds, hops, beam, k,
      exclude = tombstonesSnapshot(spark, indexDir, Some(meta)),
      groupedBy = Some(meta.groups), eagerHops = true)
  }

  /** Deterministic HUB seeds: the store's `n` smallest vec_ids — the
    * fixed entry points [[append]] searches from. Served from the
    * MANIFEST's hub pool (maintained by every commit, [[nextHubs]]), so
    * a crawl-loop increment pays O(1) metadata here instead of a
    * distinct+sort over the whole edge relation — the scan that would
    * otherwise make "per-increment cost independent of corpus size"
    * false. Stores committed before the pool existed fall back to the
    * scan (their next commit enrolls them), and so does a caller asking
    * for MORE seeds than the pool holds (the store's dialed `hubs_n`,
    * default [[DefaultHubCount]]) on a store with at least that many
    * vertices — a pool of exactly `hubs_n` entries is a prefix, not
    * the full sorted vertex set, so serving `pooled.take(n)` there
    * would silently cap the caller's seed count. A pool SHORTER than
    * `hubs_n` is by construction the store's entire vertex set (the
    * invariant [[setHubCount]] restores at every dial change) and
    * serves any n exactly.
    */
  private[graft] def hubIds(spark: SparkSession, indexDir: String,
      n: Int): DataFrame = {
    val meta = metaOf(indexDir)
    val hubN = hubCountOf(meta)
    val pooled = meta.map(hubsParam).getOrElse(Seq.empty)
    if (pooled.nonEmpty && (n <= pooled.size || pooled.size < hubN)) {
      import spark.implicits._
      pooled.take(n).toDF("vec_id")
    } else
      edges(spark, indexDir).select(col("vec_id")).distinct()
        .orderBy(col("vec_id")).limit(n)
  }

  /** Dial the store's hub-pool size — `hubs_n` rides the manifest (the
    * `retain` treatment: the seed pool is graph search's recall/cost
    * knob, so its size belongs to the STORE, not the binary), honored
    * by every later commit's pool maintenance and served by [[hubIds]].
    * Dialing UP re-enrolls the pool from the full committed scan HERE,
    * once, offline — without it a 64-entry pool under a 128 dial would
    * read as "the whole store" and silently cap seed counts (the
    * [[hubIds]] invariant: a pool shorter than `hubs_n` IS the entire
    * vertex set). Dialing DOWN truncates the pool — metadata only.
    * Commits exclusively like any manifest publish; run it like
    * `regroup`: offline, between crawl increments.
    */
  def setHubCount(spark: SparkSession, indexDir: String, n: Int): Unit = {
    require(n >= 1, s"hubs_n must be >= 1, got $n")
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    val pooled = hubsParam(meta)
    val pool =
      if (n <= pooled.size || meta.leaves.isEmpty) pooled.take(n)
      else {
        // dial-up re-enrollment must EXCLUDE tombstoned vertices (the
        // merge/nextHubs exclude semantics): committed edge leaves
        // retain deleted vertices until a refine drops them physically,
        // and a dead hub would occupy a seed slot for every search
        val scan = IndexManifest.committedOnly(
            spark.read.parquet(s"$indexDir/edges"), Some(meta.leaves))
          .select(col("vec_id")).distinct()
        tombstonesSnapshot(spark, indexDir, Some(meta))
          .fold(scan)(t => scan.join(broadcast(t), Seq("vec_id"), "left_anti"))
          .orderBy(col("vec_id")).limit(n)
          .collect().map(_.getLong(0)).toSeq
      }
    IndexManifest.commit(indexDir, meta.copy(version = meta.version + 1,
      params = meta.params ++ Map(
        "hubs_n" -> n.toString, "hubs" -> pool.mkString(","))))
  }

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
    if (isDone(meta, tag)) return
    linkFound(spark, indexDir,
      searchForLink(spark, indexDir, emb, batch, nSeeds, hops, beam, k),
      tag, k)
  }

  /** [[append]]'s SEARCH half, separable so a streaming loop writes
    * matches and links from ONE search: each batch vector
    * greedy-searches the committed graph for its top-k neighbors,
    * seeded at the [[hubIds]] hub vertices. Tombstoned vertices are
    * excluded — a match must never surface a takedown, and a newcomer
    * should link to LIVE neighbors (the dead still route mid-search,
    * the soft-delete rule). Returns (query_id, rnk, vec_id, sim).
    */
  def searchForLink(spark: SparkSession, indexDir: String, emb: DataFrame,
      batch: DataFrame, nSeeds: Int = 16, hops: Int = 2, beam: Int = 8,
      k: Int = 3): DataFrame = {
    val queries = batch.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val seeds = queries.select(col("query_id"))
      .crossJoin(broadcast(hubIds(spark, indexDir, nSeeds)))
    val meta = metaOf(indexDir)
    Ann.graphSearchTopK(groupedEdges(spark, indexDir, meta), emb, queries,
      seeds, hops, beam, k, exclude = tombstones(spark, indexDir),
      groupedBy = meta.map(_.groups), eagerHops = true)
  }

  /** [[append]]'s LINK half: ONE leaf commits the found relation's
    * forward edges (rank = search rank) plus the REVERSE edges that
    * splice each newcomer into its neighbors' adjacency lists
    * (appended at rank k — a beyond-quota approximation a later
    * [[refine]] round re-ranks exactly; both directions land together,
    * so they carry `mutual = true` by construction). Tag-idempotent
    * like every other fold.
    */
  def linkFound(spark: SparkSession, indexDir: String, found: DataFrame,
      tag: String, k: Int = 3): Unit = {
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (isDone(meta, tag)) return
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
    if (isDone(meta, tag)) return
    // dead vertices leave physically here: tombstoned endpoints' edges
    // drop before the round, so they neither survive nor become
    // candidates, and the replace-commit clears the tombstone set
    val refined = Ann.nnDescentRound(liveEdges(spark, indexDir), emb, k)
      .select(col("vec_id"), col("nbr_id"), col("rank"))
    val rev = refined.select(col("nbr_id").as("vec_id"),
      col("vec_id").as("nbr_id"), lit(true).as("mutual"))
    val withMutual = refined
      .join(rev, Seq("vec_id", "nbr_id"), "left")
      .withColumn("mutual", coalesce(col("mutual"), lit(false)))
    commitLeaf(withMutual, indexDir, tag, meta.groups, replace = true)
  }

  /** Re-key the committed edge relation into `newGroups` hash-range
    * partitions — the Materializer-rebucket move on the graph store
    * (the dedup/multimodal regroup rule): edges copy VERBATIM into one
    * fresh leaf under the new dial (tombstoned vertices' edges ride —
    * they keep ROUTING, the soft-delete rule — and the tombstone set
    * carries over), the manifest records the new dial, and mismatched
    * old-dial writes are refused from then on. Tag-idempotent,
    * online-safe under the retained grace window.
    */
  def regroup(spark: SparkSession, indexDir: String, newGroups: Int,
      tag: String): Unit = {
    import graft.operators.store.IndexManifest
    require(newGroups > 0, "newGroups must be positive")
    require(tag.matches("[0-9A-Za-z_\\-]+"), s"invalid regroup tag: $tag")
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (isDone(meta, tag)) return
    val leafDir = IndexManifest.leafName(meta.version + 1, tag)
    IndexManifest.dropResidue(indexDir, Seq("edges"), leafDir)
    edges(spark, indexDir)
      .withColumn("ggrp", ggrp(newGroups))
      .withColumn("leaf", lit(leafDir))
      .repartition(col("ggrp"))
      .write.partitionBy("ggrp", "leaf")
      .mode("append").parquet(s"$indexDir/edges")
    // a regroup erases every prior leaf tag (leaves := the one fresh
    // leaf) — retire them into donetags so replayed folds still no-op;
    // tombs carry over, so only the LEAF tags retire here
    val retired = (doneTags(meta) ++ meta.leaves.map(IndexManifest.tagOf))
      .toSeq.sorted.mkString(",")
    IndexManifest.commit(indexDir, meta.copy(version = meta.version + 1,
      groups = newGroups, leaves = Seq(leafDir),
      params = meta.params + ("donetags" -> retired)))
    IndexManifest.sweep(indexDir, Seq("edges", "tombs"), meta.version + 1)
  }

  /** MERGE several graph stores into one — the scale-out BUILD path
    * (dd22/ann21/mm19's device on the edge relation): a 100 TB corpus
    * builds as N independent per-shard graphs (each [[build]] over its
    * slice, no coordination), then one merge folds the shards'
    * committed edges into the destination as a single
    * manifest-committed leaf. The union of per-shard k-NN graphs is
    * the standard distributed NN-descent INITIALIZATION (Dong et al.
    * 2011): within-shard edges are exact for within-shard neighbors,
    * and a [[refine]] round over the merged store then converges
    * toward the global graph without any corpus × corpus pass. Edges
    * copy VERBATIM (only the group key depends on the dial, so it is
    * recomputed against the destination's — mixed-dial shards merge
    * fine); tombstones ride as one destination leaf per source
    * (kill-all vec_ids — a takedown known to any shard stays a
    * takedown; overlapping vec_id spaces therefore OR their deletes).
    * One manifest commit publishes the edge leaf and every ridden tomb
    * leaf together; replaying a completed merge no-ops on its tag, a
    * torn attempt rewrites its deterministic leaf names.
    */
  def merge(spark: SparkSession, srcDirs: Seq[String], destDir: String,
      tag: String, groups: Int = DefaultGroups): Unit = {
    import graft.operators.store.IndexManifest
    require(srcDirs.nonEmpty, "merge needs at least one source")
    require(tag.matches("[0-9A-Za-z_\\-]+"), s"invalid merge tag: $tag")
    val dest = metaOf(destDir).getOrElse(IndexManifest.Meta(0L, groups,
      IndexManifest.legacyLeaves(destDir, Seq("edges")),
      IndexManifest.legacyLeaves(destDir, Seq("tombs"))))
    if (isDone(dest, tag)) return
    if (dest.groups != groups)
      throw new IllegalStateException(
        s"$destDir is grouped at ${dest.groups} but the merge says " +
          s"$groups — use the destination's dial")
    srcDirs.foreach { dir =>
      if (metaOf(dir).isEmpty) throw new IllegalStateException(
        s"$dir holds no committed k-NN graph — merge folds committed shards")
    }
    val leafDir = IndexManifest.leafName(dest.version + 1, tag)
    IndexManifest.dropResidue(destDir, Seq("edges"), leafDir)
    srcDirs.map(edges(spark, _)).reduce(_ unionByName _)
      .withColumn("ggrp", ggrp(groups))
      .withColumn("leaf", lit(leafDir))
      .repartition(col("ggrp"))
      .write.partitionBy("ggrp", "leaf")
      .mode("append").parquet(s"$destDir/edges")
    val tombsMerged = srcDirs.zipWithIndex.flatMap { case (dir, i) =>
      tombstones(spark, dir).map { t =>
        val tl = IndexManifest.leafName(dest.version + 1, s"$tag-t$i")
        IndexManifest.dropResidue(destDir, Seq("tombs"), tl)
        t.withColumn("leaf", lit(tl))
          .coalesce(1)
          .write.partitionBy("leaf").mode("append").parquet(s"$destDir/tombs")
        tl
      }
    }
    // ridden takedowns must not enroll as hubs in the commit that
    // tombstones them — anti-join the sources' dead ids out of the
    // (merge-sized, see nextHubs) read-back. A PRE-POOL destination
    // with committed leaves enrolls its prior pool from the full
    // committed scan, the commitLeaf rule.
    val ridden = srcDirs.flatMap(tombstones(spark, _))
      .reduceOption(_ unionByName _)
    val hubN = hubCountOf(Some(dest))
    val prior = {
      val pooled = hubsParam(dest)
      if (pooled.nonEmpty || dest.leaves.isEmpty) pooled
      else IndexManifest.committedOnly(
          spark.read.parquet(s"$destDir/edges"), Some(dest.leaves))
        .select(col("vec_id")).distinct()
        .orderBy(col("vec_id")).limit(hubN)
        .collect().map(_.getLong(0)).toSeq
    }
    val hubs = nextHubs(spark, destDir, leafDir, prior, hubN,
      exclude = ridden)
    IndexManifest.commit(destDir, dest.copy(version = dest.version + 1,
      leaves = dest.leaves :+ leafDir,
      tombs = dest.tombs ++ tombsMerged,
      params = dest.params + ("hubs" -> hubs.mkString(","))))
    IndexManifest.sweep(destDir, Seq("edges", "tombs"), dest.version + 1)
  }

  /** Small-file fold of the committed leaves into one (the crawl
    * loop's maintenance cadence): LIVE edges copy verbatim, edges
    * incident to a tombstoned vertex drop physically, the tombstone
    * set clears — searches are identical (deletes were already
    * invisible), and the commit is online-safe under the manifest
    * grace window.
    */
  def compact(spark: SparkSession, indexDir: String, tag: String): Unit = {
    val meta = metaOf(indexDir).getOrElse(throw new IllegalStateException(
      s"$indexDir holds no committed k-NN graph (build first)"))
    if (isDone(meta, tag)) return
    commitLeaf(liveEdges(spark, indexDir), indexDir, tag, meta.groups,
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
  /** ann22's driver-checked shape — TAKEDOWNS through the persisted
    * graph (the delete matrix's sixth and last store family): build
    * over corpus + two exact copies per planted original, tombstone
    * every `% 7` ORIGINAL ([[delete]] — the replica dropped those
    * vectors), and search each +200000 copy seeded at itself. Both
    * twins sit in the seed's stored edge list at sim 1.0, so the
    * answer is the ORIGINAL exactly when it survived and the +100000
    * twin exactly when it was tombstoned (the anti-join runs before
    * the top-k cut — a dead vertex cannot consume the slot; ascending-
    * id tie-break fixes each case). Then [[compact]] drops every
    * incident edge physically and clears the set, and the re-search is
    * row-identical: `n_passes == 2` rides every row (the dd20/mm18
    * device), with the tombstone census beside it.
    */
  def deletedSearchSelfRecall(spark: SparkSession, d: String,
      nQueries: Int = 64): DataFrame = {
    val base = graft.Tables.spread(graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))).cache()
    val qs = base.filter(col("vec_id") < nQueries)
    val copies1 = qs.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"))
    val copies2 = qs.select((col("vec_id") + 200000L).as("vec_id"),
      col("embedding"))
    val all = base.unionByName(copies1).unionByName(copies2)
    val indexDir = s"${graft.Tables.scratchDir("graft_ann22")}/graph"
    build(all, indexDir, "corpus")
    val dead = qs.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    delete(spark, indexDir, dead, "takedown0")
    val census = dead.agg(count(lit(1)).as("n_tombstones"))
    val queries = copies2.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val seeds = copies2.select(col("vec_id").as("query_id"), col("vec_id"))
    def search(): DataFrame =
      searchTopK(spark, indexDir, all, queries, seeds,
        hops = 2, beam = 8, k = 1)
        .select(col("query_id"), col("vec_id").as("match_id"), col("sim"))
    val pre = search() // planned pre-compaction, grace window keeps it live
    compact(spark, indexDir, "compact0")
    val post = search()
    pre.unionByName(post)
      .groupBy(col("query_id"), col("match_id"), col("sim"))
      .agg(count(lit(1)).as("n_passes")) // 2 ⇔ pre/post agree
      .crossJoin(broadcast(census))
      .orderBy(col("query_id"))
  }

  /** ann23's driver-checked shape — the SCALE-OUT BUILD through the
    * graph store: ann22's planted relation built as TWO independent
    * parity shards (deliberately mixed group dials), per-shard `% 7`
    * takedowns, one [[merge]], then the search over the MERGED store
    * only. Copies keep their original's parity (+100000/+200000 are
    * even offsets), so each planted sim-1.0 triple lives WITHIN one
    * shard and its stored edges survive the union verbatim: seeding
    * each +200000 copy at itself, the answer is the ORIGINAL exactly
    * when it survived its shard's takedown and the +100000 twin
    * exactly when it was tombstoned (tombstones ride the merge per
    * source; the anti-join runs before the top-k cut). `n_leaves = 1`
    * pins the single merged edge leaf; the tombstone census rides. A
    * merge that lost a shard's edges, re-keyed groups wrong, or
    * dropped a ridden takedown breaks its rows.
    */
  def shardMergedSearchSelfRecall(spark: SparkSession, d: String,
      nQueries: Int = 64): DataFrame = {
    val base = graft.Tables.spread(graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))).cache()
    val qs = base.filter(col("vec_id") < nQueries)
    val copies1 = qs.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"))
    val copies2 = qs.select((col("vec_id") + 200000L).as("vec_id"),
      col("embedding"))
    val all = base.unionByName(copies1).unionByName(copies2)
    val tmp = graft.Tables.scratchDir("graft_ann23")
    val (s0, s1, m) = (s"$tmp/s0", s"$tmp/s1", s"$tmp/merged")
    build(all.filter(col("vec_id") % 2 === 0), s0, "shard", groups = 16)
    build(all.filter(col("vec_id") % 2 === 1), s1, "shard", groups = 64)
    val dead = qs.filter(col("vec_id") % 7 === 0).select(col("vec_id"))
    delete(spark, s0, dead.filter(col("vec_id") % 2 === 0), "takedown0")
    delete(spark, s1, dead.filter(col("vec_id") % 2 === 1), "takedown0")
    merge(spark, Seq(s0, s1), m, "merge0")
    val census = dead.agg(count(lit(1)).as("n_tombstones"))
    val queries = copies2.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val seeds = copies2.select(col("vec_id").as("query_id"), col("vec_id"))
    searchTopK(spark, m, all, queries, seeds, hops = 2, beam = 8, k = 1)
      .select(col("query_id"), col("vec_id").as("match_id"), col("sim"),
        lit(leafCount(m)).as("n_leaves"))
      .crossJoin(broadcast(census))
      .orderBy(col("query_id"))
  }

  /** ann24's driver-checked shape — the GRAPH crawl loop as a STREAM
    * (the ann07/dd13 pattern on the edge store), run through the
    * ONE-CALL facade [[graft.streaming.Graft.searchAndLink]]: arriving
    * vector batches greedy-search the persisted graph, matches append
    * to the output, and the SAME search's results link the batch in —
    * so later batches can reach it — with one NN-descent refine every
    * second batch (the in-stream maintenance cadence, dd21's device).
    *
    * The planted theorem: every arriving vector is an exact copy of a
    * corpus vector with vec_id < nSeeds, and the loop's hub seeds are
    * the store's nSeeds SMALLEST vec_ids — exactly those originals
    * (copies sit at +100000 and never displace them). Every query is
    * therefore seeded AT its own original: the original is in the
    * visited set by construction, exact scoring puts it at sim 1.0
    * (unique — no duplicate vectors in the fixture, naturals cap
    * ≈ 0.4), so each copy's top-1 match is its original REGARDLESS of
    * graph quality, whatever batch it arrived in and across the
    * mid-loop refines. A loop that lost a batch, searched a stale
    * manifest, or broke the hub-seed rule surfaces as missing rows.
    *
    * Scale per increment: the search touches |batch| · beam · degree
    * candidate rows (never the corpus), the link is one immutable
    * leaf, the refine is |E|-linear.
    */
  def streamingSearchSelfRecall(spark: SparkSession, d: String,
      nBatches: Int = 4, nQueries: Int = 64): DataFrame = {
    val base = graft.Tables.spread(graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))).cache()
    val copies = base.filter(col("vec_id") < nQueries)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = base.unionByName(copies).cache() // the loop's emb store
    val tmp = graft.Tables.scratchDir("graft-knn-stream")
    val indexDir = s"$tmp/graph"
    val stageDir = s"$tmp/arrivals"
    val outDir = s"$tmp/matches"
    // one-off corpus build, metered apart from the increments (bench:
    // bootstrap_sec vs per_increment_sec); the shared embedding store
    // materializes here too, not inside the first micro-batch
    graft.streaming.Graft.CrawlMetrics
      .timed("graft-search-and-link-bootstrap") {
        build(base, indexDir, "corpus")
        all.count()
        ()
      }
    copies.repartition(nBatches, col("vec_id")).write.parquet(stageDir)
    val schema = spark.read.parquet(stageDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    val q = graft.GraftSession.withStreamShuffle(spark)(
      graft.streaming.Graft.searchAndLink(stream, indexDir, outDir,
        embProvider = all, k = 1, hops = 2, beam = 8, nSeeds = nQueries,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        refineEvery = 2))
    graft.GraftSession.awaitFinished(q)
    spark.read.parquet(outDir)
      .select(col("query_id"), col("vec_id").as("match_id"), col("sim"))
      .filter(col("match_id") === col("query_id") - 100000L)
      .orderBy(col("query_id"))
  }

  /** ann26's driver-checked shape — graph QUALITY, not reachability:
    * recall@1 against brute force for searches that must NAVIGATE. The
    * planted self-recall gates (ann20/ann22/ann24) deliberately seed
    * each query at (or next to) its own answer, so they stay green
    * regardless of how good the graph is; this row removes that crutch.
    * [[recallHits]] measures the real thing: queries are corpus
    * originals OUTSIDE the hub pool (vec_ids `[200, 200+n)` — the pool
    * is the 64 smallest ids), the corpus splits 80/20 into a build
    * slice plus `nBatches` crawl [[append]] batches followed by ONE
    * [[refine]] (the lifecycle under audit), and every search starts at
    * the store's hub seeds — reaching a query's true neighbor requires
    * real hops through stored edges. No copies are planted (recallHits'
    * doc explains why a planted target would not discriminate);
    * instead the graph's top-1 is compared against an EXPLICIT in-plan
    * brute-force top-1 over the whole corpus, and a hit is exact
    * agreement. The gated row pins
    * `n_hits * 100 >= floor_pct * n_queries` (floor 55% — the healthy
    * lifecycle measures 65-72% across the driver fixtures while the
    * degraded contrast graph measures ~39%, so the floor splits the
    * two with margin on both sides); an append or refine regression
    * that quietly degrades linking drops recall below the floor and
    * flips `floor_met` (the spec contrasts a deliberately
    * degraded graph failing the same floor). The measured recall is
    * spec-pinned, not driver-gated — organic navigation varies with
    * fixture scale; the FLOOR is the cross-scale contract.
    */
  def recallAudit(spark: SparkSession, d: String, nQueries: Int = 64,
      floorPct: Int = 55): DataFrame = {
    val hits = recallHits(spark, d, nQueries)
    spark.range(1).select(
      lit(nQueries.toLong).as("n_queries"),
      lit(floorPct.toLong).as("floor_pct"),
      lit(hits * 100L >= floorPct.toLong * nQueries).as("floor_met"))
  }

  /** The measured hit count behind [[recallAudit]] — TRUE recall@1: the
    * graph search's top-1 is compared against the IN-PLAN brute-force
    * top-1 over the whole corpus (the ground truth the index
    * approximates; |queries| × corpus cosines — audit-sized, never the
    * serving path). The corpus splits 80/20 into a build slice and
    * `nBatches` crawl [[append]] batches followed by one [[refine]], so
    * the score holds the WHOLE lifecycle accountable: a build that
    * pairs wrong, an append that mislinks, or a refine that drops good
    * edges all pull graph-top-1 away from brute-top-1. Spec-pinnable
    * and parameterized so the spec can show a DEGRADED graph (k=1
    * chains, no build refinement, no post-append refine) failing the
    * floor the healthy lifecycle clears — a planted-copy target would
    * not discriminate here, because a bad append that wires arrivals
    * near the hubs makes planted copies EASIER to find, not harder.
    */
  private[graft] def recallHits(spark: SparkSession, d: String,
      nQueries: Int = 64, nBatches: Int = 4, buildK: Int = 3,
      buildRefineIters: Int = 1, refineAfter: Boolean = true,
      hops: Int = 4, beam: Int = 32, nSeeds: Int = 64): Long = {
    val base = graft.Tables.spread(graft.Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"))).cache()
    val indexDir = s"${graft.Tables.scratchDir("graft_ann26")}/graph"
    build(base.filter(col("vec_id") % 5 =!= 4L), indexDir, "corpus",
      k = buildK, refineIters = buildRefineIters)
    val arrivals = base.filter(col("vec_id") % 5 === 4L)
    (0 until nBatches).foreach { b =>
      append(spark, indexDir, base,
        arrivals.filter(pmod(col("vec_id"), lit(5L * nBatches))
          === (5L * b + 4L)), s"b$b")
    }
    if (refineAfter) refine(spark, indexDir, base, "r1")
    val queries = base.filter(col("vec_id") >= 200L &&
      col("vec_id") < 200L + nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    val bruteTop = broadcast(queries).join(base,
        col("vec_id") =!= col("query_id"))
      .withColumn("sim", Ann.cosine(col("q_emb"), col("embedding")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("query_id"), col("vec_id").as("true_nn"))
    val seeds = queries.select(col("query_id"))
      .crossJoin(broadcast(hubIds(spark, indexDir, nSeeds)))
    // the audit's two measurement legs — the in-plan brute-force ground
    // truth and the graph search — are INDEPENDENT once the store is
    // committed and `base` is pinned: overlap them (guide §2.6) instead
    // of letting each leg's small-job tail serialize the other, and pin
    // each so the scoring join below reads the computed rows. The graph
    // leg CONSTRUCTS inside its thunk: searchTopK is eager (the
    // driver-side frontier loop), so its work happens at construction.
    val legs: Seq[() => DataFrame] = Seq(
      () => {
        val p = bruteTop.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p
      },
      () => {
        val p = searchTopK(spark, indexDir, base, queries, seeds,
            hops, beam, k = 1)
          .select(col("query_id"), col("vec_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count(); p
      })
    val Seq(bt, gt) = graft.GraftSession.concurrently(legs, maxPar = 2)
    val hits =
      try gt.join(bt, Seq("query_id"))
        .filter(col("vec_id") === col("true_nn"))
        .agg(count(lit(1))).collect()(0).getLong(0)
      finally { bt.unpersist(); gt.unpersist(); () }
    base.unpersist()
    hits
  }

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
