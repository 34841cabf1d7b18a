package graft.operators.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * All single-scan column expressions (no UDFs, no shuffles except the
  * final aggregates) — at 100 TB these run at parquet-scan speed.
  */
object TextOps {

  /** Whitespace tokenization; empties dropped (multi-space/trailing safe). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Sliding word n-gram shingles (distinct), the MinHash/Jaccard unit.
    * (Guarded: Spark `sequence(1, 0)` would count *down*, so short docs get
    * an explicit empty array.)
    */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Per-doc token stats. */
  def tokenStats(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(
      col("doc_id"), col("lang"),
      tokens(col("text")).as("toks"),
      length(col("text")).as("len_chars"))
      .select(
        col("doc_id"), col("lang"), col("len_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("sum_token_len"))
      .orderBy(col("doc_id"))
  }

  /** BPE-style pre-tokenizer (simplified GPT-2 splitter, engine-portable
    * alphabet): a token is an optionally space-prefixed letter run, digit
    * run, or punctuation run. Counts the sub-word boundary units a BPE
    * tokenizer would start from — the standard "token budget" estimate for
    * training-data accounting.
    */
  val bpePattern: String = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Per-doc token-budget view: whitespace words vs BPE-ish units. */
  def bpeTokens(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .withColumn("bpe_per_word",
        col("n_bpe_tokens").cast("double") / col("n_ws_tokens"))
      .orderBy(col("doc_id"))

  /** Character-trigram language ID (the n-gram heuristic lane; the
    * stopword lane is [[langId]]): score = share of the doc's first-200-char
    * trigrams that appear in a fixed English trigram profile. Pure
    * expressions over a bounded prefix — O(200) per doc regardless of doc
    * size, single scan, no shuffle.
    */
  val enTrigramProfile: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter",
    "hat", "tha", "ere", "ate", "his", "con", "res", "ver", "all", "ons")

  def langIdNgram(spark: SparkSession, d: String): DataFrame = {
    val profile = enTrigramProfile.map(t => s"'$t'").mkString("array(", ",", ")")
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"),
        lower(substring(col("text"), 1, 200)).as("t"))
      .withColumn("trigs", expr(
        "CASE WHEN length(t) >= 3 THEN transform(sequence(1, length(t)-2), i -> substring(t, i, 3)) ELSE array() END"))
      .select(col("doc_id"), col("lang"),
        size(col("trigs")).as("n_trigrams"),
        expr(s"size(filter(trigs, g -> array_contains($profile, g)))").as("n_en_hits"))
      .withColumn("en_ngram_score",
        when(col("n_trigrams") > 0,
          col("n_en_hits").cast("double") / col("n_trigrams")).otherwise(lit(0.0)))
      .withColumn("lang_guess",
        when(col("en_ngram_score") >= 0.08, "en")
          .when(col("en_ngram_score") >= 0.03, "maybe-en")
          .otherwise("other"))
      .orderBy(col("doc_id"))
  }

  /** Winnowing document fingerprints (rolling-hash lane; MOSS-style):
    * 5-gram polynomial rolling hashes over the sanitized 128-char prefix,
    * then the minimum per sliding window of 4 — the classic winnowing
    * selection (any shared substring ≥ 8 chars shares a fingerprint).
    * The hash is a base-31 polynomial over code points, kept engine-exact
    * (< 2^63, ASCII-sanitized input so code-point semantics agree
    * everywhere).
    */
  /** doc_id → (n_kgrams, distinct winnowing fingerprints) over any
    * (doc_id, text) frame — shared by the per-doc stats view and the dedup
    * blocker. The selection runs as a native codegen'd expression
    * (graft.plans.WinnowFingerprints): the equivalent nested-lambda SQL
    * pipeline was O(k·w·n) interpreted dispatches per doc AND got inlined
    * wholesale into the `size(fps) > 0` predicate Catalyst infers below the
    * explode — which then ran in the pre-repartition scan stage, single-
    * threaded (measured: dd06 went from 0.2 s of winnowing to minutes).
    */
  def winnowFingerprintSets(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    docs
      .select(col("doc_id"),
        regexp_replace(lower(substring(col("text"), 1, 128)), "[^a-z0-9 ]", "")
          .as("t"))
      .withColumn("wf", graft.plans.SketchCols.winnowFingerprints(col("t"), k, w))
      .select(col("doc_id"),
        col("wf.n_kgrams").as("n_kgrams"), col("wf.fps").as("fps"))

  def winnowFingerprints(spark: SparkSession, d: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    winnowFingerprintSets(
        Tables.documents(spark, d).select(col("doc_id"), col("text")), k, w)
      .select(col("doc_id"),
        col("n_kgrams"),
        size(col("fps")).as("n_fps"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"),
        // empty → NULL to agree with SQL list_sum([]) semantics cross-engine
        when(size(col("fps")) > 0,
          expr("aggregate(fps, 0L, (a, x) -> a + x)")).as("fp_sum"))
      .orderBy(col("doc_id"))
  }

  /** The one stopword list every quality/lang lane shares — the quality
    * formula and the language thresholds live HERE and only here; the
    * composed pipeline (graft.operators.Pipelines) and the standalone
    * operators must stay bit-identical to the DuckDB oracles that mirror
    * these exact constants.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
  val enStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on")

  /** quality = stopword_ratio·2 − short_ratio + avg_token_span/10, from
    * integer counts so the doubles are engine-portable.
    */
  def qualityExpr(nTokens: Column, nStopwords: Column, nShort: Column,
      len: Column): Column =
    (nStopwords.cast("double") / nTokens) * 2.0 -
      nShort.cast("double") / nTokens +
      (len.cast("double") / nTokens) / 10.0

  /** English-stopword-density buckets (0.10 / 0.04 thresholds) over a
    * precomputed density score (`n_en / n_tokens` in double).
    */
  def langPredExpr(enScore: Column): Column =
    when(enScore >= 0.10, "en").when(enScore >= 0.04, "maybe-en")
      .otherwise("other")

  /** Quality-score features: ratios of identical integer counts, so the
    * doubles are bit-identical on any engine computing the same division.
    */
  def qualityScores(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    docs.select(col("doc_id"), tokens(col("text")).as("toks"), length(col("text")).as("len"))
      .select(
        col("doc_id"), col("len"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), t => t.isin(stopwords: _*))).as("n_stopwords"),
        size(filter(col("toks"), t => length(t) <= 2)).as("n_short"))
      .select(
        col("doc_id"), col("len"), col("n_tokens"), col("n_stopwords"),
        (col("n_stopwords").cast("double") / col("n_tokens")).as("stopword_ratio"),
        (col("n_short").cast("double") / col("n_tokens")).as("short_ratio"),
        (col("len").cast("double") / col("n_tokens")).as("avg_token_span"),
        qualityExpr(col("n_tokens"), col("n_stopwords"), col("n_short"),
          col("len")).as("quality")) // bit-identical: same ratio op order
      .orderBy(col("doc_id"))
  }

  /** Language-ID heuristic: English-stopword density buckets (the real
    * signal at scale is an n-gram model; the operator shape — per-doc score
    * + threshold classification — is identical).
    */
  def langId(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang").as("lang_label"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("lang_label"),
        (size(filter(col("toks"), t => t.isin(enStopwords: _*))).cast("double")
          / size(col("toks"))).as("en_score"))
      .withColumn("lang_pred", langPredExpr(col("en_score")))
      .orderBy(col("doc_id"))

  /** Repetition score (the Gopher-style repeated-n-gram quality filter):
    * share of the document's bigram mass held by its most frequent bigram
    * — high values flag boilerplate/template/spam docs that slip past
    * stopword-based quality gates. Non-distinct bigrams (repetition IS the
    * signal), two map-side-combined aggregations: (doc, gram) counts ride
    * one shuffle, the per-doc max/sum rides a counts-only second. The
    * share is one integer division in double — engine-portable.
    */
  def repetition(spark: SparkSession, d: String): DataFrame = {
    val toks = Tables.spread(
        Tables.documents(spark, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    toks.select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"))
        .as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"), max(col("c")).as("top_count"))
      .withColumn("top_share",
        col("top_count").cast("double") / col("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  /** txt09 — blocklist screening (the C4-style "bad words" gate): per-doc
    * count and fraction of tokens on a blocklist, plus the drop flag a
    * gate would apply. Single scan, no join, no shuffle — and the
    * membership test is the native [[graft.plans.CountInStaticSet]]
    * hash-set probe (O(tokens), codegen'd), NOT a per-token linear scan of
    * a plan-constant array: a real C4-style list is hundreds of terms, and
    * `size(filter(t, x -> array_contains(...)))` would be O(tokens×terms)
    * in an interpreted lambda. At 100 TB this runs at parquet-scan speed
    * regardless of list size. The default list picks fixture vocabulary so
    * the planted relation is non-trivial; a real deployment passes its own
    * terms.
    */
  def blocklistFlags(spark: SparkSession, d: String,
      terms: Seq[String] = Seq("slow", "dup")): DataFrame = {
    Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        graft.plans.SketchCols.countInStaticSet(col("t"), terms).as("n_blocked"))
      .withColumn("blocked_frac",
        when(col("n_tokens") > 0,
          col("n_blocked").cast("double") / col("n_tokens")).otherwise(0.0))
      .withColumn("flagged", col("n_blocked") > 0)
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text
    * (content-defined identity for exact dedup); plus a 64-bit engine-side
    * fingerprint (xxhash64) for cheap joins at scale.
    */
  def fingerprints(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"),
        md5(normalized(col("text"))).as("fp_md5"),
        xxhash64(normalized(col("text"))).as("fp64"))
      .orderBy(col("doc_id"))

  def normalized(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** txt10 — overlapping token-window chunking (the RAG / context-window
    * prep step: split each document into fixed-size token chunks with a
    * configurable overlap so no span falls on a hard boundary). Chunk
    * starts are `1, 1+step, 1+2·step, …` over the token array
    * (`step = chunkSize − overlap`); the last chunk is short rather than
    * padded. Pure narrow projection — tokenize, `sequence` the starts,
    * `posexplode`, `slice` — so there is NO shuffle and at 100 TB this
    * runs at parquet-scan speed with output parallelism equal to input
    * parallelism. `chunk_id` is derived arithmetically from the start
    * ((start−1)/step) so engines need no ordinality agreement.
    */
  def chunkWindows(spark: SparkSession, d: String,
      chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap=$overlap must be in [0, chunkSize=$chunkSize)")
    val step = chunkSize - overlap
    Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(when(size(col("t")) > 0,
          sequence(lit(1), size(col("t")), lit(step)))
          .otherwise(array().cast("array<int>"))).as("start_tok"))
      .select(
        col("doc_id"),
        ((col("start_tok") - 1) / step).cast("int").as("chunk_id"),
        col("start_tok"),
        slice(col("t"), col("start_tok"), lit(chunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** txt11 — top-k characteristic terms per document by tf·idf. The idf
    * is the LINEAR form `N/df` (not `ln(N/df)`): one IEEE division is
    * bit-exact across engines where `ln` is only ULP-close, so the score
    * stays hash-comparable — and the ranking it induces is the same
    * monotone order. Shape at 100 TB: term frequencies are a map-side-
    * combined `groupBy(doc_id, term)`; document frequencies aggregate the
    * ALREADY per-doc-distinct tf table (vocabulary-sized, term-keyed);
    * the tf⋈df join shuffles on `term` (AQE handles stopword skew); the
    * final top-k is a per-doc window — no all-pairs stage, no driver
    * collect, ties broken deterministically by term.
    */
  def tfidfTopTerms(spark: SparkSession, d: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, d)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, Seq("term"))
      .crossJoin(broadcast(nDocs)) // one-row scalar side
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** txt12 — corpus vocabulary + per-doc OOV rate (the tokenizer-coverage
    * check run before committing a vocab size): build the top-`vocabSize`
    * terms by corpus frequency (ties by term, deterministic), then score
    * every document by the fraction of its tokens OUTSIDE that
    * vocabulary. Shape at 100 TB: the count table is a map-side-combined
    * term agg; the top-N compiles to TakeOrderedAndProject (per-partition
    * top-N, single small merge — never a global sort); the tiny vocab
    * BROADCASTs to a semi-join against the exploded tokens, and the
    * per-doc tallies key on doc_id. `oov_frac` is one integer division in
    * double — hash-exact across engines.
    */
  /** txt13 — unigram-LM familiarity scoring (the perplexity-proxy quality
    * filter, linear domain): a document made of corpus-common tokens
    * scores high, one made of rare/garbled tokens scores low. Working in
    * the LINEAR domain (mean corpus frequency instead of mean -log p)
    * keeps every aggregate INTEGRAL — corpus counts, per-doc count sums,
    * rare-occurrence tallies — so partial aggregation is exact in any
    * order and the only floating-point ops are two per-row divisions:
    * bit-exact across engines where a log-domain mean (float sums ordered
    * by partition) is not; the induced ranking is the same monotone
    * signal. Shape at 100 TB: term counts are a map-side-combined term
    * agg; the token⋈count join shuffles on `term` (AQE absorbs stopword
    * skew); per-doc tallies key on doc_id; the corpus total is a one-row
    * broadcast scalar.
    */
  def familiarity(spark: SparkSession, d: String,
      rareBelow: Long = 3L): DataFrame = {
    val docs = Tables.documents(spark, d)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val cnt = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = cnt.agg(sum(col("cnt")).as("total")) // one-row scalar side
    val per = toks.join(cnt, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("cnt")).as("sum_cnt"),
        sum(when(col("cnt") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_cnt"), lit(0L)).as("sum_cnt"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          col("sum_cnt").cast("double") / (col("n_tokens") * col("total")))
          .otherwise(0.0).as("mean_freq"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0,
          col("n_rare").cast("double") / col("n_tokens"))
          .otherwise(0.0).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  /** txt17 — bigram-LM familiarity (the CONTEXT-CONDITIONAL extension of
    * [[familiarity]]): scores each document by how typical its word
    * TRANSITIONS are of the corpus, the signal an n-gram-LM perplexity
    * filter (CCNet-style) uses — fluent text chains common bigrams,
    * shuffled/garbled/boilerplate text chains rare ones, even when every
    * individual token is common (the case unigram familiarity cannot
    * see). Same linear-domain discipline as txt13: per doc, sum the
    * corpus count of each of its bigrams (Σc₂) and of each bigram's
    * context unigram in first position (Σc₁) — both INTEGRAL, so partial
    * aggregation is exact in any arrival order — and emit the pooled
    * conditional estimate Σc₂/Σc₁ (one IEEE division, bit-exact across
    * engines) plus the rare-transition fraction. Pooling the division to
    * the end is what makes the statistic hash-portable; the per-bigram
    * mean of c₂/c₁ would be a float sum whose value depends on partition
    * order. Shape at 100 TB: bigrams come from a slice/zip projection at
    * scan speed (no positional self-join); the two count tables are
    * map-side-combined aggs on (w1,w2)/(w1); the scoring joins shuffle on
    * those keys (AQE absorbs stopword-context skew) and the per-doc tally
    * keys on doc_id — no step is quadratic and nothing collects.
    */
  def bigramFamiliarity(spark: SparkSession, d: String,
      rareBelow: Long = 3L): DataFrame = {
    val docs = Tables.documents(spark, d)
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val big = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cnt2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val cnt1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val per = big.join(cnt2, Seq("w1", "w2")).join(cnt1, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2")).as("sum_big_cnt"),
        sum(col("c1")).as("sum_ctx_cnt"),
        sum(when(col("c2") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
    docs.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_big_cnt"), lit(0L)).as("sum_big_cnt"),
        coalesce(col("sum_ctx_cnt"), lit(0L)).as("sum_ctx_cnt"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          col("sum_big_cnt").cast("double") / col("sum_ctx_cnt"))
          .otherwise(0.0).as("cond_familiarity"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          col("n_rare").cast("double") / col("n_bigrams"))
          .otherwise(0.0).as("rare_frac"))
      .orderBy(col("doc_id"))
  }

  def vocabOovRate(spark: SparkSession, d: String,
      vocabSize: Int = 256): DataFrame = {
    val docs = Tables.documents(spark, d)
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(vocabSize)
      .select(col("term"))
    val inVocab = toks
      .join(broadcast(vocab), Seq("term"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_invocab"))
    docs
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      .join(inVocab, Seq("doc_id"), "left")
      .withColumn("n_invocab", coalesce(col("n_invocab"), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - col("n_invocab")).as("n_oov"),
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("n_invocab")).cast("double") / col("n_tokens"))
          .otherwise(0.0).as("oov_frac"))
      .orderBy(col("doc_id"))
  }

  /** txt14's fixed query workload: id → terms. Terms are corpus
    * vocabulary (one rare term, `dup`, exercises the idf end); the list
    * order is the score's ADDITION order — part of the contract (see
    * [[bm25TopK]]). Terms must be `[a-z0-9_]+`: the oracle assembler
    * interpolates them into SQL string literals AND `tf_<term>`
    * identifiers, so anything else (quote, space, hyphen, uppercase)
    * would generate broken or silently mismatched SQL — fail at
    * definition time instead.
    */
  val bm25Queries: Seq[(Int, Seq[String])] = {
    val qs = Seq(
      1 -> Seq("spark", "join"),
      2 -> Seq("dup", "vector"),
      3 -> Seq("customer", "table", "query"))
    qs.flatMap(_._2).foreach(t => require(t.matches("[a-z0-9_]+"),
      s"bm25 workload term '$t' must match [a-z0-9_]+ — it is spliced " +
        "into oracle SQL literals and tf_/df_ column identifiers"))
    qs
  }

  /** txt14 — BM25 top-k retrieval (the lexical-retrieval primitive of
    * RAG and data-curation stacks; the reference has no analogue). For
    * each query, rank documents containing at least one query term by
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the
    * standard k1=1.2, b=0.75 — folded as LITERALS so both engines build
    * the identical IEEE-754 expression tree.
    *
    * Cross-engine exactness: idf is the log-free odds form
    * `(N−df+0.5)/(df+0.5)` — the ODDS whose logarithm is Robertson idf.
    * CAVEAT (intentional, callers must know): odds is monotone in the
    * Robertson idf PER TERM, so single-term rankings are identical, but
    * a SUM of odds is not order-equivalent to a sum of log-odds — a
    * multi-term query can rank documents differently than textbook
    * ln-idf BM25 (rare terms weigh in linearly rather than
    * logarithmically, so they dominate harder). The trade is bit-exact
    * cross-engine comparability (a fixed five-op double tree instead of
    * an engine-specific `ln`) over textbook ordering fidelity; callers
    * needing Robertson ordering for multi-term queries should apply
    * `ln` per term and accept ULP-level engine divergence;
    * `dl/avgdl` is computed as `(dl·N)/total_tokens` — one exact integer
    * product (safe: dl·N < 2^53 up to ~10^3-token docs at 10^10 docs)
    * and one double division; tf/df/N/total are integer aggregates, so
    * partial-agg order cannot drift; the per-query sum is a FIXED
    * left-associative fold in query-term order, never a float SUM over
    * rows. Ties break by doc_id.
    *
    * Scale shape: one token explode filtered to the query terms (a few
    * rows per doc), per-doc tf via map-side-combined conditional counts
    * keyed on doc_id; df and corpus stats are one-row broadcast sides;
    * scoring is a narrow projection (all three queries ride ONE pass via
    * an unpivot, not one subtree per query); top-k is the tp08 two-stage
    * device — per-(query, hash-bucket) partial top-k, then a final
    * window over ≤ buckets·k survivors — never a single-task global
    * sort per query.
    */
  def bm25TopK(spark: SparkSession, d: String, k: Int = 5,
      buckets: Int = 64): DataFrame =
    bm25TopKFor(Tables.documents(spark, d), bm25Queries, k, buckets)

  /** [[bm25TopK]] over any (doc_id, text) frame and workload — the
    * spec's hand-check seam.
    */
  def bm25TopKFor(documents: DataFrame, queries: Seq[(Int, Seq[String])],
      k: Int, buckets: Int = 64): DataFrame = {
    val terms = queries.flatMap(_._2).distinct.sorted
    val docs = documents
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("total_tokens"))
    val tok = docs.select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
    val tfAggs = terms.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val tfs = tok.groupBy(col("doc_id"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    val dfAggs = terms.map(t =>
      sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val dfs = tfs.agg(dfAggs.head, dfAggs.tail: _*)
    val base = tfs.crossJoin(broadcast(stats)).crossJoin(broadcast(dfs))
    def termScore(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      val ldn = (col("dl").cast("long") * col("n_docs")).cast("double") /
        col("total_tokens").cast("double")
      idf * ((tf * lit(2.2)) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * ldn)))
    }
    val qStructs = queries.map { case (qid, qTerms) =>
      struct(lit(qid).as("query_id"),
        qTerms.map(termScore).reduceLeft(_ + _).as("score"))
    }
    val scored = base
      .select(col("doc_id"), col("dl"), explode(array(qStructs: _*)).as("q"))
      .select(col("q.query_id").as("query_id"), col("doc_id"), col("dl"),
        col("q.score").as("score"))
    val stage1 = scored
      .withColumn("pb", pmod(xxhash64(col("doc_id")), lit(buckets.toLong)))
      .withColumn("rk1", row_number().over(
        Window.partitionBy(col("query_id"), col("pb"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rk1") <= k)
    stage1
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        col("dl").as("n_tokens"), col("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** txt15 — the Gopher-style quality-rule battery (Rae et al. 2021 §A1.1
    * repetition/format heuristics, the standard pre-training corpus gate;
    * the reference has no analogue — this is the LLM-pipeline extension
    * lane): per document, the structural measures and ONE pass/fail
    * verdict with the thresholds folded as literals.
    *
    * Measures (every counter INTEGRAL, so the only floating-point ops are
    * the final per-row divisions — bit-exact across engines):
    *  - `mean_word_len`  — token characters / tokens (target 3–10)
    *  - `symbol_frac`    — (# '#' chars + # '...' runs) / tokens (< 0.1)
    *  - `bullet_frac`    — lines starting '-'/'*'/'•' over non-empty
    *                       trimmed lines (< 0.9)
    *  - `ellipsis_line_frac` — lines ending '...' or '…' (< 0.3)
    *  - `dup_line_frac`  — 1 − distinct/total non-empty lines (< 0.3)
    *  - `alpha_frac`     — tokens containing a letter / tokens (> 0.8)
    *  - token count in [50, 100000]
    *
    * Shape at 100 TB: a pure narrow projection — tokenize + line-split +
    * per-row array ops, NO shuffle, no aggregation; runs at parquet-scan
    * speed with output parallelism = input parallelism (the txt01/txt02
    * discipline, which this battery composes with: txt02 is the
    * length/punct/stopword lane, this is the repetition/format lane).
    */
  def gopherRules(spark: SparkSession, d: String): DataFrame =
    gopherRulesFor(Tables.documents(spark, d))

  /** [[gopherRules]] over any (doc_id, text) frame — the spec seam. */
  def gopherRulesFor(documents: DataFrame): DataFrame = {
    val lines = filter(transform(split(col("text"), "\n"), l => trim(l)),
      l => l =!= "")
    val m = documents.select(col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      length(concat_ws("", tokens(col("text")))).as("n_token_chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "#", ""))).as("n_hash"),
      expr("CAST((length(text) - length(replace(text, '...', ''))) DIV 3 AS BIGINT)")
        .as("n_ellipsis"),
      size(lines).as("n_lines"),
      size(filter(lines, l => l.startsWith("-") || l.startsWith("*") ||
        l.startsWith("•"))).as("n_bullet"),
      size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
        .as("n_ellipsis_end"),
      size(array_distinct(lines)).as("n_distinct_lines"),
      size(filter(tokens(col("text")), x => x.rlike("[A-Za-z]")))
        .as("n_alpha"))
    def overTokens(c: Column): Column =
      when(col("n_tokens") > 0, c.cast("double") / col("n_tokens"))
        .otherwise(0.0)
    def overLines(c: Column): Column =
      when(col("n_lines") > 0, c.cast("double") / col("n_lines"))
        .otherwise(0.0)
    m.select(col("doc_id"), col("n_tokens"),
      overTokens(col("n_token_chars")).as("mean_word_len"),
      overTokens(col("n_hash") + col("n_ellipsis")).as("symbol_frac"),
      overLines(col("n_bullet")).as("bullet_frac"),
      overLines(col("n_ellipsis_end")).as("ellipsis_line_frac"),
      overLines(col("n_lines") - col("n_distinct_lines")).as("dup_line_frac"),
      overTokens(col("n_alpha")).as("alpha_frac"))
      .withColumn("passes",
        col("n_tokens") >= 50 && col("n_tokens") <= 100000 &&
          col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
          col("symbol_frac") < 0.1 && col("bullet_frac") < 0.9 &&
          col("ellipsis_line_frac") < 0.3 && col("dup_line_frac") < 0.3 &&
          col("alpha_frac") > 0.8)
      .orderBy(col("doc_id"))
  }

  /** txt18 — KMV (k-minimum-values) distinct sketch per source over the
    * 3-gram shingle universe: the "how many distinct n-grams does each
    * source contribute" statistic that sizes dedup/contamination passes
    * BEFORE running them. Exact `count(distinct shingle)` at 100 TB is a
    * full shuffle of every distinct string; the KMV bottom-k sketch ships
    * k=64 8-byte hashes per source and estimates distinct cardinality as
    * `(k-1)·2^60 / kth_min_hash` (Bar-Yossef et al. 2002) with standard
    * error ~1/√k. The hash is the 60-bit md5 prefix — DETERMINISTIC, so
    * the sketch itself (not just the estimate) is cross-engine gated;
    * the estimator is INTEGRAL (div/mod cross-multiplication, a guarded
    * branch for huge kth values keeps every intermediate in 63 bits) so
    * no float division enters the contract. Exact-mode fallback when a
    * source holds fewer than k distinct hashes.
    *
    * Scale shape: shingles are hashed AT THE SCAN and distinct-ed as
    * (source, 8-byte hash) — the only wide exchange carries 16-byte rows,
    * never shingle strings; bottom-k is the two-stage window device
    * (per-(source, h%32) bucket top-k then per-source top-k over ≤32k
    * survivors — txt14's discipline), so no source's full distinct set
    * ever sorts in one task.
    */
  def kmvDistinctShingles(spark: SparkSession, d: String, k: Int = 64): DataFrame =
    kmvSummary(kmvBottomK(shingleHashes(Tables.spread(
      Tables.documents(spark, d)
        .select(col("source"), col("text")).filter(col("text").isNotNull))), k), k)

  /** Per-source 60-bit md5-prefix hashes of distinct shingles — the KMV
    * sketch's input relation (16-byte rows past the scan).
    */
  private def shingleHashes(docs: DataFrame): DataFrame = docs
    .select(col("source"), explode(shingles(tokens(col("text")))).as("sh"))
    .select(col("source"),
      conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("h"))
    .distinct()

  /** Bottom-k hashes per source via the two-stage group-limit device. */
  private def kmvBottomK(hashed: DataFrame, k: Int): DataFrame = {
    val perBucket = Window.partitionBy(col("source"), pmod(col("h"), lit(32L)))
      .orderBy(col("h"))
    val perSource = Window.partitionBy(col("source")).orderBy(col("h"))
    hashed
      .withColumn("rn", row_number().over(perBucket)).filter(col("rn") <= k)
      .drop("rn")
      .withColumn("rn", row_number().over(perSource)).filter(col("rn") <= k)
      .drop("rn")
  }

  /** The KMV summary row per source: sketch size, kth minimum, integral
    * estimator (shared by the batch and streaming lanes).
    */
  private def kmvSummary(bottom: DataFrame, k: Int): DataFrame = {
    val H = "1152921504606846976L" // 2^60, the hash-space size
    bottom.groupBy(col("source"))
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_hash"))
      .withColumn("est_distinct", expr(
        s"""CASE WHEN n_sketch < $k THEN n_sketch
              WHEN kth_hash >= 144115188075855872L THEN ($H div kth_hash) * ${k - 1}
              ELSE ($H div kth_hash) * ${k - 1}
                 + (($H % kth_hash) * ${k - 1}) div kth_hash END"""))
      .orderBy(col("source"))
  }

  /** txt21 — the KMV sketch as STREAMING state: document batches arrive
    * as a stream and the per-source bottom-k sketch is FOLDED forward
    * per micro-batch — `bottomK(state ∪ batchHashes)` — exploiting the
    * sketch's mergeability (bottom-k of a union is the bottom-k of
    * merged bottom-ks), so distinct-cardinality tracking over a
    * continuous crawl costs one tiny-state merge per batch instead of
    * re-scanning the corpus. The final summary equals the batch-built
    * sketch EXACTLY (same oracle as txt18 — the merge identity is the
    * gated claim), and the driver gate exercises it across `nBatches`
    * real micro-batches.
    *
    * Scale shape per batch: hash the BATCH only (16-byte rows), union
    * with ≤ sources·k state rows, one bounded bottom-k; the state write
    * is versioned per batch id and mode-overwrite, so foreachBatch
    * replay is idempotent (the dd13 fold discipline on sketch state).
    */
  def streamingKmvDistinct(spark: SparkSession, d: String, k: Int = 64,
      nBatches: Int = 4): DataFrame = {
    val tmp = Tables.scratchDir("graft_txt21")
    val stateDir = s"$tmp/sketch"
    val stageDir = s"$tmp/arrivals"
    // metered apart (bench: bootstrap_sec vs per_increment_sec vs the
    // query envelope): the r16 driver artifact showed a 4× min/median
    // spread on this lane with a clean implementation — the meters let
    // the artifact itself attribute the spread to streaming-query
    // startup (envelope minus bootstrap minus folds) instead of
    // guessing
    graft.streaming.Graft.CrawlMetrics.timed("graft-txt21-kmv-stream-bootstrap") {
      Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), col("text"))
        .filter(col("text").isNotNull)
        .repartition(nBatches, col("doc_id"))
        .write.parquet(stageDir)
    }
    val schema = spark.read.parquet(stageDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    def vdir(b: Long): String = f"$stateDir%s/v$b%05d"
    val q = graft.GraftSession.withStreamShuffle(spark) {
      stream.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.streaming.Graft.CrawlMetrics.timed("graft-txt21-kmv-stream") {
            val s = batch.sparkSession
            val prior =
              if (batchId == 0L)
                s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  org.apache.spark.sql.types.StructType(Seq(
                    org.apache.spark.sql.types.StructField("source",
                      org.apache.spark.sql.types.StringType),
                    org.apache.spark.sql.types.StructField("h",
                      org.apache.spark.sql.types.LongType))))
              else s.read.parquet(vdir(batchId))
            // bottom-k of (state ∪ batch) — the KMV merge; overwrite makes
            // at-least-once replay a pure recompute of the same version
            kmvBottomK(prior.unionByName(shingleHashes(batch)).distinct(), k)
              .write.mode("overwrite").parquet(vdir(batchId + 1))
          }
          ()
        }
        .start()
    }
    graft.GraftSession.awaitFinished(q)
    val latest = new java.io.File(stateDir).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName).max
    kmvSummary(spark.read.parquet(s"$stateDir/$latest"), k)
  }

  /** Integral HLL estimator numerator: floor(α₁₆ · m² · 2^48+1) with
    * α₁₆ = 0.673, m = 16, and the register scale 2^(49−reg) — computed
    * once in BigInt (the product overflows 63 bits before the /1000) and
    * shared by the Spark lane and the DuckDB oracle so the two engines
    * divide the identical literal.
    */
  val HllNumerator: Long = (BigInt(172288) * (BigInt(1) << 49) / 1000).toLong

  /** txt22 — HyperLogLog distinct-cardinality REGISTERS per source
    * (Flajolet et al. 2007): the third sketch beside KMV (txt18) and
    * count-min (txt20), and the one production systems actually merge
    * across shards — a register bank is m small integers, and the union
    * of two sketches is the elementwise MAX (spec-pinned). m = 16
    * buckets (low 4 bits of the 60-bit md5-prefix hash); ρ = position of
    * the first 1-bit in the next 48 bits (49 when they are all zero),
    * register = max ρ per bucket.
    *
    * The whole relation is cross-engine EXACT: registers are integer
    * string arithmetic (`lpad(bin(suffix))` + first-'1' position — both
    * engines produce identical binary strings), and the estimator is
    * INTEGRAL — E = α·m²/Σ2^(−reg) becomes [[HllNumerator]] div
    * Σ2^(49−reg), every term a 63-bit integer, no float pow/harmonic sum
    * anywhere. The exact distinct count rides beside the estimate (the
    * txt20 side-by-side discipline) so the sketch error is part of the
    * gated relation. No small-range (linear-counting) correction: n/m is
    * far above the bias regime at every shipped sf; n_empty is emitted
    * so a consumer can apply it.
    *
    * Scale shape: the only wide exchange carries (source, 8-byte hash)
    * distinct rows — the txt18 discipline; registers aggregate to
    * 16 rows per source (map-side max), the grid/summary joins touch
    * sketch-sized relations only.
    */
  def hllRegisters(spark: SparkSession, d: String): DataFrame = {
    val hashed = shingleHashes(Tables.spread(
      Tables.documents(spark, d)
        .select(col("source"), col("text")).filter(col("text").isNotNull)))
    val regs = hllRegsOf(hashed)
    val grid = hashed.select(col("source")).distinct()
      .select(col("source"), explode(sequence(lit(0L), lit(15L))).as("bucket"))
    val full = grid.join(regs, Seq("source", "bucket"), "left")
      .withColumn("register", coalesce(col("register"), lit(0L)))
    val summ = full.groupBy(col("source")).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(49 - register AS INT))"))
        .as("s_denom"),
      sum(when(col("register") === 0, 1L).otherwise(0L)).as("n_empty"))
    val ex = hashed.groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    full.join(summ, Seq("source")).join(ex, Seq("source"))
      .select(col("source"), col("bucket"), col("register"), col("n_empty"),
        expr(s"${HllNumerator}L div s_denom").as("est_hll"), col("n_exact"))
      .orderBy(col("source"), col("bucket"))
  }

  /** Register bank (source, bucket, register) from a (source, h) hash
    * relation — the mergeability seam [[hllRegisters]]' spec pins:
    * registers(A ∪ B) = elementwise max(registers(A), registers(B)).
    */
  private[graft] def hllRegsOf(hashed: DataFrame): DataFrame =
    hashed.select(col("source"),
        expr("h % 16").as("bucket"),
        expr("CAST((h div 16) % 281474976710656 AS BIGINT)").as("suffix"))
      .withColumn("pos", instr(lpad(bin(col("suffix")), 48, "0"), "1"))
      .withColumn("rho", when(col("pos") === 0, 49).otherwise(col("pos")))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).cast("long").as("register"))

  /** [[hllRegsOf]] over a document set (shingle-hash head included). */
  private[graft] def hllRegisterBank(docs: DataFrame): DataFrame =
    hllRegsOf(shingleHashes(docs))

  /** txt24 — MERGEABLE log₂-bucket QUANTILE sketch over document token
    * lengths, per source: the distribution profiler that sizes sequence
    * length, bucket geometry (tp15) and packing (tp03) BEFORE a pass runs.
    * Exact per-source quantiles at 100 TB need a global sort (or a
    * non-mergeable exact percentile); the sketch needs one counter per
    * power-of-two bucket — `bucket = len(bin(n))`, i.e. ⌊log₂ n⌋+1, pure
    * integer string arithmetic both engines compute identically — and the
    * q-quantile estimate is the first bucket whose cumulative count
    * crosses q·N (integer cross-multiplication: `100·cum ≥ q·N` — the
    * tp13 device), reported as the bucket's inclusive value range
    * [2^(b−1), 2^b−1]. The true quantile provably lies in that range —
    * the DDSketch/HdrHistogram guarantee with γ = 2 — and the sketch
    * MERGES by counter addition (spec-pinned: sketch(A ∪ B) = sketch(A)
    * + sketch(B) elementwise, so per-partition sketches fold into the
    * corpus sketch without a re-scan, the txt18/txt22 mergeability law
    * on the quantile axis).
    *
    * Output: one row per non-empty (source, bucket) carrying the counter,
    * the cumulative count, and the source's p50/p90/p99 range bounds —
    * estimator output rides the gated relation (the txt22 discipline).
    * Everything is BIGINT; no float enters the contract.
    *
    * Scale shape: one narrow scan projects (source, n_tokens) — no
    * shingles, no strings past the scan; one map-side-combined groupBy on
    * (source, bucket) where bucket has ≤ 64 values, so the exchange
    * carries at most sources·64 counter rows regardless of corpus size;
    * the cumulative window and the quantile aggregation run over those
    * sketch-sized rows only (never a per-document window).
    */
  def lengthQuantileSketch(spark: SparkSession, d: String): DataFrame =
    quantilesOf(lengthBucketCounters(
      Tables.documents(spark, d)
        .select(col("source"), col("text")).filter(col("text").isNotNull)))

  /** The sketch itself: per-(source, log₂-bucket) counters — the unit that
    * merges by addition across corpus partitions.
    */
  private[graft] def lengthBucketCounters(docs: DataFrame): DataFrame = docs
    .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
    .filter(col("n") > 0)
    .select(col("source"), length(bin(col("n"))).cast("long").as("bucket"))
    .groupBy(col("source"), col("bucket"))
    .agg(count(lit(1)).as("n_in_bucket"))

  /** txt25 — the quantile sketch FOLDED as streaming state: per
    * micro-batch, bucket-count the batch only and ADD into the stored
    * counter bank — counter addition is the sketch's merge, so continuous
    * length-distribution monitoring of a crawl costs one sketch-sized
    * integer sum per batch instead of a corpus re-scan. The final summary
    * equals the batch-built sketch EXACTLY (same oracle as txt24 — the
    * merge identity is the gated claim; the txt21/cdc26 device on the
    * quantile axis). State writes are versioned per batch id and
    * mode-overwrite, so foreachBatch replay is idempotent.
    */
  def streamingLenQuantiles(spark: SparkSession, d: String,
      nBatches: Int = 4): DataFrame = {
    val tmp = Tables.scratchDir("graft_txt25")
    val stateDir = s"$tmp/sketch"
    val stageDir = s"$tmp/arrivals"
    Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), col("text"))
      .filter(col("text").isNotNull)
      .repartition(nBatches, col("doc_id"))
      .write.parquet(stageDir)
    val schema = spark.read.parquet(stageDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    def vdir(b: Long): String = f"$stateDir%s/v$b%05d"
    val q = graft.GraftSession.withStreamShuffle(spark) {
      stream.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val s = batch.sparkSession
          val prior =
            if (batchId == 0L)
              s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("source",
                    org.apache.spark.sql.types.StringType),
                  org.apache.spark.sql.types.StructField("bucket",
                    org.apache.spark.sql.types.LongType),
                  org.apache.spark.sql.types.StructField("n_in_bucket",
                    org.apache.spark.sql.types.LongType))))
            else s.read.parquet(vdir(batchId))
          // counters(state) + counters(batch) — the sketch merge; overwrite
          // makes at-least-once replay a pure recompute of the same version
          prior.unionByName(lengthBucketCounters(batch))
            .groupBy(col("source"), col("bucket"))
            .agg(sum(col("n_in_bucket")).as("n_in_bucket"))
            .write.mode("overwrite").parquet(vdir(batchId + 1))
          ()
        }
        .start()
    }
    graft.GraftSession.awaitFinished(q)
    val latest = new java.io.File(stateDir).listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName).max
    quantilesOf(spark.read.parquet(s"$stateDir/$latest"))
  }

  /** Cumulative counts + p50/p90/p99 range bounds from a (source, bucket,
    * n_in_bucket) counter relation — the mergeability seam the spec pins:
    * counters from disjoint corpus halves ADD into the whole's sketch.
    */
  private[graft] def quantilesOf(counters: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val cum = counters
      .withColumn("cum", sum(col("n_in_bucket")).over(wCum))
      .withColumn("n_docs",
        sum(col("n_in_bucket")).over(Window.partitionBy(col("source"))))
    def qBucket(q: Int): Column =
      min(when(col("cum") * 100 >= col("n_docs") * q, col("bucket")))
    val qs = cum.groupBy(col("source")).agg(
      qBucket(50).as("b50"), qBucket(90).as("b90"), qBucket(99).as("b99"))
    def lo(b: String): Column =
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST($b - 1 AS INT))")
    def hi(b: String): Column =
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST($b AS INT)) - 1")
    cum.join(broadcast(qs), Seq("source"))
      .select(col("source"), col("bucket"), col("n_in_bucket"), col("cum"),
        col("n_docs"),
        lo("b50").as("p50_lo"), hi("b50").as("p50_hi"),
        lo("b90").as("p90_lo"), hi("b90").as("p90_hi"),
        lo("b99").as("p99_lo"), hi("b99").as("p99_hi"))
      .orderBy(col("source"), col("bucket"))
  }

  /** txt20 — COUNT-MIN heavy hitters: the frequency twin of txt18's
    * cardinality sketch. Exact "which boilerplate n-grams dominate the
    * corpus" needs a full groupBy over every distinct gram; the
    * count-min sketch folds all occurrences into `d=2` rows of `w`
    * integer counters (positions = the two 60-bit md5-prefix halves mod
    * `w` — tp14's hash pair), and estimates any gram's frequency as the
    * MIN over its counters: never an undercount, overcounts by colliding
    * mass (Cormode & Muthukrishnan 2005). This operator emits the top-k
    * exact-count shingles WITH their sketch estimates side by side, so
    * the overestimate — the quantity that sizes `w` before trusting the
    * sketch alone — is part of the gated relation: `est_cms >= n_exact`
    * on every row, by the same deterministic arithmetic on both engines.
    *
    * Scale shape: the sketch lane shuffles at most `d·w` counter keys
    * (map-side-combined — constant exchange width no matter the corpus);
    * in PRODUCTION (no exact comparison) it aggregates the gram stream
    * directly — one bounded pass. In THIS harness the exact lane must
    * run anyway, so the counters are derived FROM the exact aggregate
    * (`sum(n_exact)` per position ≡ `count(occurrences)` per position,
    * exactly): the corpus is tokenized once — Spark's exchange reuse
    * dedupes the shared gram aggregation — and the sketch lane's input
    * shrinks from every occurrence to every DISTINCT gram. Top-k is the
    * two-stage group-limit device, never a global sort of the gram table.
    */
  def cmsHeavyHitters(spark: SparkSession, d: String, w: Int = 1024,
      topK: Int = 20): DataFrame = {
    val grams = Tables.spread(Tables.documents(spark, d)
        .select(col("text")).filter(col("text").isNotNull))
      .select(explode(shingles(tokens(col("text")))).as("sh"))
      .withColumn("gh", md5(col("sh")))
      .withColumn("h1", pmod(conv(substring(col("gh"), 1, 15), 16, 10)
        .cast("long"), lit(w.toLong)))
      .withColumn("h2", pmod(conv(substring(col("gh"), 17, 15), 16, 10)
        .cast("long"), lit(w.toLong)))
    // exact counts: the one corpus-wide aggregation (both lanes ride it)
    val exact = grams.groupBy(col("sh"), col("h1"), col("h2"))
      .agg(count(lit(1)).as("n_exact"))
    // the sketch: d=2 bounded counter rows — ≤ 2w keys ride this
    // exchange, and its input is the distinct-gram aggregate, not the
    // occurrence stream (identical sums by associativity)
    val counters = exact
      .select(explode(array(
        struct(lit(0).as("r"), col("h1").as("p"), col("n_exact").as("n")),
        struct(lit(1).as("r"), col("h2").as("p"), col("n_exact").as("n")))).as("c"))
      .select(col("c.r").as("r"), col("c.p").as("p"), col("c.n").as("n"))
      .groupBy(col("r"), col("p")).agg(sum(col("n")).as("cnt"))
    // deterministic top-k (count desc, shingle asc)
    val perBucket = Window.partitionBy(pmod(col("h1"), lit(32L)))
      .orderBy(col("n_exact").desc, col("sh"))
    val global = Window.partitionBy().orderBy(col("n_exact").desc, col("sh"))
    val top = exact
      .withColumn("rn", row_number().over(perBucket)).filter(col("rn") <= topK)
      .drop("rn")
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= topK)
    val c0 = counters.filter(col("r") === 0)
      .select(col("p").as("h1"), col("cnt").as("cnt1"))
    val c1 = counters.filter(col("r") === 1)
      .select(col("p").as("h2"), col("cnt").as("cnt2"))
    top.join(c0, Seq("h1")).join(c1, Seq("h2"))
      .select(col("rank"), col("sh"), col("n_exact"),
        least(col("cnt1"), col("cnt2")).as("est_cms"),
        (least(col("cnt1"), col("cnt2")) - col("n_exact")).as("overestimate"))
      .orderBy(col("rank"))
  }

  /** txt19 — URL canonicalization + dedup: the identity pass a crawl
    * pipeline runs BEFORE content dedup (the same page fetched as
    * `HTTP://WWW.Site.COM:80/p/?utm_source=feed&id=3` and
    * `http://site.com/p?id=3` must collapse without touching its body).
    * Rules (the standard RFC-3986-normalization subset): lowercase
    * scheme and host, strip a leading `www.` and a default `:80` port,
    * strip the trailing path slash (bare host → `/`), drop `utm_*`
    * tracking parameters, sort the surviving query parameters. Raw URLs
    * are synthesized per doc from a fixed integer formula that spreads
    * each canonical page across five raw spellings, so the collapse is
    * non-trivial and the oracle re-derives it from the same formula.
    *
    * Canonicalization is pure codegen'd string expressions
    * (regexp_extract/replace, split/filter/sort — no UDF): it runs at
    * parquet-scan speed on 100 TB of crawl logs. The dedup tail is
    * dd01's: one map-side-combined groupBy(canonical) + join-back, AQE
    * skew-splittable (hot URLs are exactly the skew case).
    */
  def urlCanonDedup(spark: SparkSession, d: String): DataFrame = {
    val raw = Tables.documents(spark, d).select(col("doc_id"))
      .withColumn("raw_url", expr(
        """(CASE doc_id % 3 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' ELSE 'hTtp' END)
           || '://'
           || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.Site' || (doc_id % 50) || '.COM'
               ELSE 'site' || (doc_id % 50) || '.com' END)
           || (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END)
           || '/P' || (doc_id % 20)
           || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
           || '?'
           || (CASE WHEN doc_id % 2 = 0
               THEN 'utm_source=feed&id=' || (doc_id % 10) || '&b=2'
               ELSE 'b=2&id=' || (doc_id % 10) END)"""))
    val withCanon = Tables.spread(raw)
      .select(col("doc_id"), canonicalizeUrl(col("raw_url")).as("canon_url"))
    val groups = withCanon.groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
    withCanon.join(groups, Seq("canon_url"))
      .select(col("doc_id"), col("canon_url"), col("canonical_id"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** The txt19 normalization rules as one reusable column expression —
    * IDEMPOTENT (canonicalizing a canonical URL is a no-op; spec-pinned),
    * pure codegen'd string functions.
    */
  def canonicalizeUrl(raw: Column): Column = {
    val scheme = lower(regexp_extract(raw, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(raw, "^[A-Za-z]+://([^/?]+)", 1)),
        ":80$", ""),
      "^www\\.", "")
    val path0 = regexp_replace(
      regexp_extract(raw, "^[A-Za-z]+://[^/?]+(/[^?]*)?", 1), "/$", "")
    val params = array_join(array_sort(filter(
      split(regexp_extract(raw, "\\?(.*)$", 1), "&"),
      x => !x.startsWith("utm_") && x =!= "")), "&")
    concat(scheme, lit("://"), host,
      when(path0 === "", lit("/")).otherwise(path0),
      when(params === "", lit("")).otherwise(concat(lit("?"), params)))
  }

  /** txt23 — the corpus FRONT DOOR: raw JSONL ingestion with
    * corrupt-record quarantine. Every 100 TB pipeline starts at messy
    * line-delimited JSON (crawl exports, API dumps); the production
    * contract is: parse what parses, quarantine what doesn't — never
    * drop silently, never fail the job (Spark's PERMISSIVE mode with
    * `columnNameOfCorruptRecord`). This lane writes the documents table
    * as real JSONL (Spark `to_json` escaping), plants unparseable lines
    * (every `doc_id % 23 == 0` line truncated mid-token), reads the file
    * back through the JSON source with an explicit schema + corrupt
    * column, and accounts per source: docs, null-text docs, chars,
    * tokens — plus one `_corrupt` quarantine row. The oracle recomputes
    * every figure from the documents table and the planting rule alone,
    * so the gate proves the JSON round-trip LOSSLESS (an escaping bug in
    * either direction shifts sum_chars/sum_tokens) and the corrupt set
    * exactly the planted set.
    *
    * Scale shape: ingestion is a parquet-speed scan of the JSON lines
    * (schema given — no inference pass), accounting one map-side-combined
    * groupBy(source); the quarantine row rides the same aggregate. No
    * shuffle beyond the final tiny rollup.
    */
  def jsonlIngestAccounting(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val stage = graft.Tables.scratchDir("graft-jsonl")
    Tables.documents(spark, d)
      .select(col("doc_id"),
        to_json(struct(col("doc_id"), col("source"), col("text")))
          .as("value"))
      .select(when(col("doc_id") % 23 === 0,
        substring(col("value"), 1, 10)).otherwise(col("value")).as("value"))
      .write.mode("overwrite").text(stage)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType), StructField("_corrupt", StringType)))
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(stage)
    parsed
      .withColumn("src", coalesce(col("source"), lit("_corrupt")))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_corrupt").isNull && col("text").isNull, 1L)
          .otherwise(0L)).as("n_null_text"),
        coalesce(sum(length(col("text")).cast("long")), lit(0L))
          .as("sum_chars"),
        coalesce(sum(when(col("text").isNotNull,
          size(tokens(col("text"))).cast("long"))), lit(0L))
          .as("sum_tokens"))
      .select(col("src").as("source"), col("n_docs"), col("n_null_text"),
        col("sum_chars"), col("sum_tokens"))
      .orderBy(col("source"))
  }
}
