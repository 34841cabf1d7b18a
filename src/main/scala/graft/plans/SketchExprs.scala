package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd sketch expressions for the dedup family.
  *
  * Both replicate — bit for bit — the semantics of the SQL-lambda
  * formulations they replace (minhash: `array_min(transform(shh, h ->
  * xxhash64(h, i)))` per hash i, banded with multi-arg `xxhash64(...)`;
  * simhash: per-bit ±1 token votes), but in single tight JIT'd loops with
  * zero per-row allocations beyond the output. The interpreted
  * nested-lambda versions cost O(k·n) Catalyst eval dispatches *and*
  * O(k) array allocations per document; these cost one static call.
  * Hash identity is guaranteed by calling the same `XXH64` primitives
  * Spark's own `xxhash64` codegen emits (seed 42, fold order child-by-child).
  */
object SketchUtil {

  /** MinHash signature + LSH band buckets in one pass.
    *
    * For shingle hashes H and numHashes k: sig[i] = min over h∈H of
    * XXH64.hashInt(i, XXH64.hashLong(h, 42)) — identical to SQL
    * `xxhash64(h, i)`. Band b's bucket folds its `k/bands` signature rows
    * through XXH64 then mixes the band index, identical to SQL
    * `xxhash64(sig[b·r+1], …, sig[b·r+r], b)`.
    *
    * Returns null for empty input (no shingles → no buckets), mirroring
    * `array_min(transform([], …))` = null propagation upstream.
    */
  /** Membership count for [[CountInStaticSet]]: one hash probe per array
    * element, null elements never match. Called from generated code with
    * the raw (erased) HashSet reference.
    */
  def countInSet(arr: ArrayData,
      set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Int = {
    val n = arr.numElements()
    var i = 0
    var hits = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  def minHashBandBuckets(hashes: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val rows = numHashes / bands
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var k = 0
    while (k < n) {
      val base = XXH64.hashLong(hashes.getLong(k), 42L)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      k += 1
    }
    val buckets = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(mins(b * rows + r), acc)
        r += 1
      }
      buckets(b) = XXH64.hashInt(b, acc)
      b += 1
    }
    new GenericArrayData(buckets)
  }

  /** Deterministic ±1 hyperplane components for random-hyperplane LSH:
    * plane p's component for dimension i is sign(XXH64(i, XXH64(p, 42))).
    * Cached per (planes, dim) — identical on every executor (hash-derived,
    * no model state to ship), computed once per JVM, so the per-row cost is
    * a pure dense dot product.
    */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Float]]]()

  private def signPlanes(planes: Int, dim: Int): Array[Array[Float]] =
    planeCache.computeIfAbsent((planes, dim), { case (p, d) =>
      Array.tabulate(p) { plane =>
        val base = XXH64.hashInt(plane, 42L)
        Array.tabulate(d)(i => if ((XXH64.hashInt(i, base) & 1L) == 1L) 1.0f else -1.0f)
      }
    })

  /** Random-hyperplane band buckets over a float embedding: band b's key
    * packs `bits` sign bits (bit j = sign(v · h_{b·bits+j}) > 0) and mixes
    * in the band index via XXH64, so keys never collide across bands.
    * Bucket cardinality grows with the data (2^bits per band), unlike a
    * fixed global bucket count — no O(n²/#buckets) blow-up at scale.
    * Returns null for an empty vector.
    */
  def hyperplaneBandBuckets(vec: ArrayData, bands: Int, bits: Int): ArrayData = {
    val dim = vec.numElements()
    if (dim == 0) return null
    val planes = signPlanes(bands * bits, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val h = planes(b * bits + j)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += vec.getFloat(i) * h(i); i += 1 }
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      out(b) = XXH64.hashLong(key, XXH64.hashInt(b, 42L))
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint selection (MOSS): base-31 polynomial rolling
    * hashes over k-grams of the (pre-sanitized, ASCII) text, minimum per
    * sliding window of w, first-occurrence-distinct. Bit-exact with the
    * SQL formulation it replaces (`ascii(substring(t,i+j,1)) * 31^…`,
    * `array_min(slice(h, j, w))`, `array_distinct`), including the
    * short-input branches — the nested-lambda SQL version costs O(k·w·n)
    * interpreted dispatches per doc and, worse, gets fully inlined into
    * Generate-inferred predicates at the scan. Returns
    * struct(n_kgrams, fps).
    */
  def winnowFingerprints(t: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val s = t.toString
    val n = s.length
    val m = math.max(0, n - k + 1)
    val h = new Array[Long](if (n >= k) m else 0)
    var i = 0
    while (i < h.length) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = acc * 31L + s.charAt(i + j).toLong; j += 1 }
      h(i) = acc
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    if (h.length >= w) {
      var j = 0
      while (j <= h.length - w) {
        var mn = h(j)
        var x = 1
        while (x < w) { if (h(j + x) < mn) mn = h(j + x); x += 1 }
        if (seen.add(mn)) out += mn
        j += 1
      }
    } else {
      var j = 0
      while (j < h.length) { if (seen.add(h(j))) out += h(j); j += 1 }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](h.length, new GenericArrayData(out.toArray)))
  }

  /** Cosine similarity over two float embeddings in ONE fused pass —
    * replaces the `aggregate(zip_with(a, b, …)) / (sqrt(aggregate(a, …)) *
    * sqrt(aggregate(b, …)))` formulation, which dispatches three
    * interpreted higher-order folds per pair (2·dim + 2·dim lambda evals)
    * on the verify stage of every ANN/dedup candidate pair. Arithmetic is
    * bit-identical to the SQL version: per-element float→double casts,
    * accumulation in array order, IEEE semantics for zero norms (no
    * special-casing). Null when lengths differ or an element is null —
    * mirroring zip_with's null-padding and `acc + null` propagation.
    */
  def cosineSimilarity(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** 64-bit SimHash over token hashes: bit j's vote is Σ over tokens of
    * (+1 if bit j of the token hash is set else −1); the output bit is set
    * when the vote is positive — identical to the SQL
    * `aggregate(sequence(0,63), …, shiftright(h, j) & 1` formulation.
    * Empty input → 0L (the SQL fold over an empty array yields acc = 0).
    */
  def simHash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](64)
    var k = 0
    while (k < n) {
      val h = hashes.getLong(k)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      k += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

private[plans] object WordNGramsUtil {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct space-joined word `n`-grams of `text` — bit-identical to the
    * SQL pipeline `array_distinct(transform(sequence(...), i ->
    * concat_ws(' ', element_at(toks, i), …)))` over whitespace tokens
    * (first-occurrence order, empty array when the doc has < n tokens),
    * in one native pass. Exists for the same reason as
    * [[SketchUtil.winnowFingerprints]]: the lambda pipeline gets inlined
    * wholesale into the `size(...) > 0` filter Catalyst infers below an
    * explode, running the whole shingling twice per row in the scan stage
    * — a native call is cheap enough to inline (and stays codegen'd).
    */
  def wordNGrams(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    // split-then-drop-empties makes leading/trailing whitespace irrelevant,
    // matching filter(split(trim(text), '\s+'), t -> t <> '')
    val toks = ws.split(text.toString).filter(_.nonEmpty)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }
}

/** `word_ngrams(text, n)` → ARRAY<STRING> of distinct space-joined word
  * n-grams (see [[WordNGramsUtil.wordNGrams]]); null text → null.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGramsUtil.wordNGrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordNGramsUtil.wordNGrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

private[plans] trait LongArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got ${other.sql}")
  }
}

/** `minhash_band_buckets(shingleHashes)` → ARRAY<BIGINT> of `bands` LSH
  * bucket keys (see [[SketchUtil.minHashBandBuckets]]).
  */
case class MinHashBandBuckets(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with LongArrayInput {

  require(numHashes % bands == 0, "numHashes must divide evenly into bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_band_buckets"

  override def nullSafeEval(input: Any): Any =
    SketchUtil.minHashBandBuckets(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.SketchUtil.minHashBandBuckets($c, $numHashes, $bands);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)
}

/** `simhash64(tokenHashes)` → BIGINT (see [[SketchUtil.simHash64]]). */
case class SimHash64(child: Expression) extends UnaryExpression with LongArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SketchUtil.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchUtil.simHash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `hyperplane_band_buckets(embedding)` → ARRAY<BIGINT> of `bands` LSH band
  * keys (see [[SketchUtil.hyperplaneBandBuckets]]).
  */
case class HyperplaneBandBuckets(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, "bits must be in 1..63")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_band_buckets"

  override def nullSafeEval(input: Any): Any =
    SketchUtil.hyperplaneBandBuckets(input.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.SketchUtil.hyperplaneBandBuckets($c, $bands, $bits);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandBuckets =
    copy(child = newChild)
}

/** `cosine_similarity(a, b)` → DOUBLE (see [[SketchUtil.cosineSimilarity]]). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<FLOAT>, ARRAY<FLOAT>)")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    SketchUtil.cosineSimilarity(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val boxed = ctx.freshName("cos")
      s"""
      java.lang.Double $boxed = graft.plans.SketchUtil.cosineSimilarity($l, $r);
      if ($boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $boxed.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(left = newLeft, right = newRight)
}

/** `winnow_fingerprints(sanitizedText)` → STRUCT<n_kgrams INT,
  * fps ARRAY<BIGINT>> (see [[SketchUtil.winnowFingerprints]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_kgrams", IntegerType, nullable = false),
    StructField("fps", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    SketchUtil.winnowFingerprints(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchUtil.winnowFingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** `count_in_static_set(tokens)` → INT: occurrences (duplicates counted) of
  * array elements present in a plan-constant term set. The scale fix for
  * blocklist screening (txt09): `size(filter(t, x -> array_contains(lit,
  * x)))` is O(tokens × |terms|) per row AND interpreted (ArrayFilter is
  * CodegenFallback) — wrong by 2-3 orders of magnitude against a real
  * C4-style list of hundreds of terms. This is one codegen'd static call
  * doing O(tokens) hash probes against a set built once per executor
  * (`@transient lazy`, shipped as the serialized term list), so screening
  * stays scan-bound no matter how long the blocklist grows.
  */
case class CountInStaticSet(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got ${other.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_static_set"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(8, terms.size * 2))
    terms.foreach(t =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    SketchUtil.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("staticTermSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SketchUtil.countInSet($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInStaticSet =
    copy(child = newChild)
}

/** Column-level entry points. */
object SketchCols {
  def minHashBandBuckets(c: Column, numHashes: Int, bands: Int): Column =
    Bridge.column(MinHashBandBuckets(Bridge.expression(c), numHashes, bands))

  def simHash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))

  def hyperplaneBandBuckets(c: Column, bands: Int, bits: Int): Column =
    Bridge.column(HyperplaneBandBuckets(Bridge.expression(c), bands, bits))

  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(c), k, w))

  def wordNGrams(c: Column, n: Int): Column =
    Bridge.column(WordNGrams(Bridge.expression(c), n))

  def cosineSimilarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  def countInStaticSet(c: Column, terms: Seq[String]): Column =
    Bridge.column(CountInStaticSet(Bridge.expression(c), terms))
}
