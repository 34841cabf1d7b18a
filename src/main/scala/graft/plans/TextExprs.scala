package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-lane natives for the text/retrieval family (txt10–txt14): the
  * Column API composes these operators from built-ins, but a SQL-first
  * user (the JDBC/Thrift lane `GraftExtensions` serves) needs them as
  * functions — `word_chunks` packages the chunking projection whole, and
  * `bm25_score` exposes the exact scoring kernel so the full BM25
  * pipeline is expressible in one SQL statement over the corpus stats.
  * Both are codegen'd scalar expressions: no UDF tax, whole-stage spans
  * preserved.
  */
object TextExprsUtil {

  /** Tokenize exactly like `TextOps.tokens` (trim → split `\s+` → drop
    * empties), then emit overlapping chunks of `chunkSize` tokens at
    * stride `chunkSize - overlap`, each re-joined with single spaces —
    * the `chunk_text` column of `TextOps.chunkWindows`, whose chunk_id is
    * the output ordinal (recover start_tok as `1 + id*(size-overlap)`).
    */
  def wordChunks(text: UTF8String, chunkSize: Int, overlap: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val step = chunkSize - overlap
    val out = Array.newBuilder[Any]
    var start = 0
    while (start < toks.length) {
      val end = math.min(start + chunkSize, toks.length)
      out += UTF8String.fromString(toks.slice(start, end).mkString(" "))
      start += step
    }
    new GenericArrayData(out.result())
  }

  /** One query term's BM25 contribution — BIT-IDENTICAL to the Column
    * tree `TextOps.bm25TopKFor` folds (same op ORDER, k1=1.2 b=0.75 as
    * the same literals), so SQL-computed scores hash-match the Column
    * lane:
    * {{{
    *   idf = ((N - df) + 0.5) / (df + 0.5)          // log-free odds form
    *   ldn = double(dl * N) / double(total_tokens)  // exact integer product
    *   idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * ldn)))
    * }}}
    */
  def bm25Score(tf: Long, df: Long, dl: Long, nDocs: Long,
      totalTokens: Long): Double = {
    val tfD = tf.toDouble
    val dfD = df.toDouble
    val idf = ((nDocs.toDouble - dfD) + 0.5) / (dfD + 0.5)
    val ldn = (dl * nDocs).toDouble / totalTokens.toDouble
    idf * ((tfD * 2.2) / (tfD + 1.2 * (0.25 + 0.75 * ldn)))
  }
}

/** `word_chunks(text, chunk_size, overlap)` → ARRAY<STRING> of
  * overlapping token-window chunks (see [[TextExprsUtil.wordChunks]]).
  * The window parameters are construction-time Ints (INT literals in
  * SQL), like every sketch parameter in this package.
  */
case class WordChunks(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression {

  require(chunkSize > 0, "chunk_size must be positive")
  require(overlap >= 0 && overlap < chunkSize,
    s"overlap=$overlap must be in [0, chunk_size=$chunkSize)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_chunks"

  override def nullSafeEval(input: Any): Any =
    TextExprsUtil.wordChunks(input.asInstanceOf[UTF8String], chunkSize, overlap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextExprsUtil.wordChunks($c, $chunkSize, $overlap);")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

/** `bm25_score(tf, df, dl, n_docs, total_tokens)` → DOUBLE — one query
  * term's BM25 contribution at k1=1.2, b=0.75, in the engine's exact
  * log-free-idf formulation (see [[TextExprsUtil.bm25Score]]; sum the
  * per-term calls in query-term order to reproduce `TextOps.bm25TopK`'s
  * scores bit-for-bit).
  */
case class Bm25Score(tf: Expression, df: Expression, dl: Expression,
    nDocs: Expression, totalTokens: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] = Seq(tf, df, dl, nDocs, totalTokens)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects five BIGINT arguments (tf, df, dl, n_docs, " +
        s"total_tokens), got ${children.map(_.dataType.sql).mkString(", ")}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bm25_score"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any, e: Any): Any =
    TextExprsUtil.bm25Score(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long], e.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d, e) =>
      s"${ev.value} = graft.plans.TextExprsUtil.bm25Score($a, $b, $c, $d, $e);")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Bm25Score =
    copy(tf = newChildren(0), df = newChildren(1), dl = newChildren(2),
      nDocs = newChildren(3), totalTokens = newChildren(4))
}
