package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over float-vector
  * columns — the one scalar in this engine where the built-in surface
  * genuinely can't deliver (SURVEY.md §4; preference order: built-ins >
  * native Expression > UDF): the `aggregate`/`zip_with` HOF lambdas are
  * interpreted per element (~90 s for the sf0.1 all-pairs dedup), and a
  * Scala UDF is an optimizer-opaque box with per-row boxing. This
  * expression takes part in whole-stage codegen — the generated Java is the
  * tight three-accumulator loop a hand-written kernel would be.
  *
  * Lives under org.apache.spark.sql (extension-package pattern) because the
  * Column⇄Expression bridge (`classic.ExpressionUtils`) is private[sql].
  *
  * Determinism contract: accumulation is a strict left-to-right double
  * fold — bit-identical to `LlmVector.cosine` (JVM) and to the DuckDB
  * `list_reduce` oracle mirror (`LlmVector.cosineSql`).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    // min() guard: mismatched lengths truncate instead of reading out of
    // bounds (fixture vectors are uniformly 64-dim, but the expression is
    // a public surface)
    val n = math.min(x.numElements(), y.numElements())
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** DataFrame-API surface for the expression. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  private def info = new ExpressionInfo(
    classOf[CosineSimilarity].getCanonicalName, "graft_cosine")

  private def builder(args: Seq[Expression]): Expression =
    CosineSimilarity(args(0), args(1))

  /** SQL surface: makes `graft_cosine(a, b)` callable from spark.sql.
    * Idempotent; safe to call at query-build time. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_cosine"), info, builder _)
}

/** Session-extension injection (`spark.sql.extensions=org.apache.spark.sql
  * .graft.GraftExtensions`): registers the engine's native functions at
  * session build time — the deployment path for clusters where users only
  * touch SQL. Harness sessions call CosineSimilarity.register instead;
  * same registry either way. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName,
        "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
}
