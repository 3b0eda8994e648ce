package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static vector kernels referenced from generated code (a top-level
  * object with no companion class gets JVM static forwarders, so
  * `graft.functions.VectorOps.cosine(a, b)` is valid generated Java).
  */
object VectorOps {
  /** Element read with a DEFINED null semantics: a NULL array slot counts
    * as 0.0f. Without the isNullAt guard the two ArrayData families
    * disagree (UnsafeArrayData returns an uninitialized 0.0,
    * GenericArrayData throws NPE) — a silently engine-dependent result.
    */
  @inline private def elem(a: ArrayData, i: Int): Double =
    if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble

  /** Cosine similarity of two float vectors held as Catalyst ArrayData —
    * no boxing, no encoder round-trip. 0.0 when either norm is 0; NULL
    * elements count as 0.0 (see `elem`).
    * FP order matches graft.ops.Similarity.cosine bit-for-bit (per-element
    * double multiply, double accumulate) so expression and kernel agree.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += elem(a, i) * elem(b, i)
      i += 1
    }
    var sa = 0.0
    i = 0
    while (i < na) { val v = elem(a, i); sa += v * v; i += 1 }
    var sb = 0.0
    i = 0
    while (i < nb) { val v = elem(b, i); sb += v * v; i += 1 }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += elem(a, i) * elem(b, i)
      i += 1
    }
    s
  }

  /** Euclidean norm, FP-order-identical to the per-side factors inside
    * `cosine` (per-element double multiply, double accumulate, one sqrt) —
    * so cosine == dot(a,b) / (norm(a) * norm(b)) BIT-FOR-BIT, and a plan
    * that precomputes norms once per vector (instead of re-traversing both
    * arrays per pair) returns byte-identical results.
    */
  def vecNorm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = elem(a, i); s += v * v; i += 1 }
    math.sqrt(s)
  }
}

/** `cosine_sim(array<float>, array<float>) -> double` as a native Catalyst
  * expression: stays inside whole-stage codegen (the generated code calls
  * the static kernel directly on ArrayData), vs a Scala UDF which would
  * deserialize both arrays to Seq[Float] per row.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(array<float>, array<float>) -> double`: the raw inner
  * product as a codegen'd expression. Together with `vec_norm` it lets
  * all-pairs similarity plans hoist the per-vector norm OUT of the pair
  * loop (cosine_sim re-traverses both arrays per pair — 3x the work).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `vec_norm(array<float>) -> double` (see VectorOps.vecNorm). */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.vecNorm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.vecNorm($a)")

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Static LM kernel for generated code. */
object LmOps {
  def score(text: UTF8String): Double = graft.lm.Scorer.singleScore(text.toString)
}

/** Static hash kernel for generated code. */
object HashOps {
  // hash the UTF8String's own UTF-8 bytes: identical digest to
  // md5Long(s.toString) (which re-encoded through UTF-16), minus the
  // String round-trip — md5_long sits under every hash-keyed operator,
  // so this is the hot path of the gram/dedup family
  def md5Long(s: UTF8String): Long = {
    val b = s.getBytes
    graft.ops.Hashing.md5Long(b, 0, b.length)
  }
}

/** Static unicode-normalization kernel for generated code. */
object TextNormOps {
  /** Unicode NFC (UAX #15 canonical composition) — the same function
    * DuckDB exposes as `nfc_normalize`, so hash-gate oracles can
    * recompute it. Already-normalized strings (the overwhelming case on
    * real text) return the INPUT UTF8String — isNormalized is a cheap
    * quick-check scan and avoids the String round-trip entirely.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string) -> string`: Unicode NFC as a codegen'd
  * expression (named after DuckDB's identical built-in). Normalization
  * belongs BEFORE any hash-keyed operator — the same visible text in
  * composed vs decomposed form otherwise hashes to different dedup keys,
  * sample draws and shingles. A Scala UDF here would deserialize every
  * row; the expression calls the static kernel on UTF8String directly and
  * returns the input buffer untouched for already-NFC text.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    TextNormOps.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextNormOps.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `md5_long(string) -> bigint`: first 8 bytes of md5, little-endian,
  * signed — the exact value DuckDB's `md5_number_upper` returns (as
  * UBIGINT), see graft.ops.Hashing.md5Long. Codegen'd, so hash-keyed
  * operators (deterministic sampling, n-gram decontamination) stay inside
  * whole-stage codegen AND remain bit-for-bit recomputable inside a SQL
  * gate oracle.
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"

  override protected def nullSafeEval(s: Any): Any =
    HashOps.md5Long(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashOps.md5Long($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

/** `lm_score(string) -> double`: the deterministic char-n-gram LM score
  * (lower = more likely; +Infinity for single-char text, mirroring the
  * reference's `single_score`, dehyphen_wrapper.py:63-69) exposed for
  * ad-hoc SQL debugging of extraction decisions — SURVEY.md §4's optional
  * scalar function (b). Deterministic and codegen'd; the LM table is a
  * lazy per-executor singleton, the LRU a thread-local.
  */
case class LmScore(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lm_score expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "lm_score"

  override protected def nullSafeEval(s: Any): Any =
    LmOps.score(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.LmOps.score($s)")

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
}

/** Registration: directly on a session, or via SparkSessionExtensions
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {
  val cosineSimInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, null, "cosine_sim",
    "_FUNC_(a, b) - cosine similarity of two float vectors", "")

  val lmScoreInfo = new ExpressionInfo(
    classOf[LmScore].getName, null, "lm_score",
    "_FUNC_(text) - deterministic char-n-gram LM score (lower = more likely)", "")

  /** Arity-checked builder: wrong argument counts become a clear message
    * during analysis instead of an IndexOutOfBoundsException from inside
    * the builder lambda (and extra args are rejected, not ignored).
    */
  private[functions] def expecting(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n,
        s"$name expects $n argument(s), got ${exprs.length}")
      f(exprs)
    }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", expecting("cosine_sim", 2)(e => CosineSimilarity(e(0), e(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lm_score", expecting("lm_score", 1)(e => LmScore(e.head)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", expecting("dot_product", 2)(e => DotProduct(e(0), e(1))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", expecting("vec_norm", 1)(e => VecNorm(e.head)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_long", expecting("md5_long", 1)(e => Md5Long(e.head)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize",
      expecting("nfc_normalize", 1)(e => NfcNormalize(e.head)), "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      GraftFunctions.cosineSimInfo,
      GraftFunctions.expecting("cosine_sim", 2)(e => CosineSimilarity(e(0), e(1)))))
    ext.injectFunction((
      FunctionIdentifier("lm_score"),
      GraftFunctions.lmScoreInfo,
      GraftFunctions.expecting("lm_score", 1)(e => LmScore(e.head))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_product",
        "_FUNC_(a, b) - inner product of two float vectors", ""),
      GraftFunctions.expecting("dot_product", 2)(e => DotProduct(e(0), e(1)))))
    ext.injectFunction((
      FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, null, "vec_norm",
        "_FUNC_(a) - euclidean norm of a float vector", ""),
      GraftFunctions.expecting("vec_norm", 1)(e => VecNorm(e.head))))
    ext.injectFunction((
      FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, null, "md5_long",
        "_FUNC_(s) - first 8 md5 bytes, little-endian, as signed bigint", ""),
      GraftFunctions.expecting("md5_long", 1)(e => Md5Long(e.head))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, null, "nfc_normalize",
        "_FUNC_(s) - Unicode NFC canonical composition", ""),
      GraftFunctions.expecting("nfc_normalize", 1)(e => NfcNormalize(e.head))))
  }
}
