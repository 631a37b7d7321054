package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
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

/** Shared SimHash kernel — ONE tokenize+vote implementation behind both
  * the [[SimHash64]] expression's eval and codegen paths, so the two are
  * bit-identical by construction (and match the token-level reference
  * `LlmVector.simhash64`, which LlmSpec cross-checks). Tokenization is
  * `String.split(" ")` — interior empties vote, trailing empties don't —
  * because the signature definition is "whatever the documented reference
  * computes", and a subtly different split would silently shift
  * signatures. FNV-1a over UTF-16 code units, then a murmur-style
  * avalanche; no libm anywhere. */
object SimHashImpl extends Serializable {
  def hash(doc: String): Long = {
    val votes = new Array[Int](64)
    doc.split(" ").foreach { w =>
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < w.length) { h ^= w.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
    }
    var acc = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) acc |= (1L << j); j += 1 }
    acc
  }
}

/** 64-bit SimHash of a document as a native codegen expression — replaces
  * the r4 Scala UDF (VERDICT r4 "minor": the signature step was the one
  * non-codegen node in the simhash pipeline; verification was already the
  * built-in `bit_count`). As an Expression it participates in whole-stage
  * codegen and null handling instead of sitting in an optimizer-opaque
  * ScalaUDF box with per-row Row boxing. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(s: Any): Any = SimHashImpl.hash(s.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = ctx.addReferenceObj("simhashImpl", SimHashImpl,
      SimHashImpl.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$impl.hash($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))
}

/** Scoring kernel for [[NearestCells]]: rank all codebook cells by dot
  * product with the row vector (descending, ties to the lower cell index
  * — exactly `LlmVector.topCells`' ordering) and keep the first n.
  * Selection is an O(k·n) insertion into a bounded buffer — n is 1 or
  * nProbe, so no full sort and no per-row allocation beyond the result. */
class NearestCellsImpl(cents: Array[Array[Double]], n: Int)
    extends Serializable {
  def top(v: ArrayData): ArrayData = {
    val k = cents.length
    val m = math.min(n, k)
    val bestIdx = new Array[Int](m)
    val bestScore = new Array[Double](m)
    var filled = 0
    var j = 0
    while (j < k) {
      val c = cents(j)
      var s = 0.0
      var i = 0
      val d = math.min(c.length, v.numElements())
      while (i < d) { s += c(i) * v.getFloat(i); i += 1 }
      // insertion position: strictly-better scores first; equal scores
      // keep the lower cell index (j ascending, so insert after equals)
      var p = filled
      while (p > 0 && bestScore(p - 1) < s) p -= 1
      if (p < m) {
        val last = math.min(filled, m - 1)
        var q = last
        while (q > p) {
          bestIdx(q) = bestIdx(q - 1); bestScore(q) = bestScore(q - 1)
          q -= 1
        }
        bestIdx(p) = j; bestScore(p) = s
        if (filled < m) filled += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bestIdx, filled))
  }
}

/** Scoring kernel for [[HyperplaneBucket]]: sign bit per hyperplane,
  * hyperplanes generated on the fly from the same splitmix-style hash as
  * `LlmVector.hyperplaneSign` (delegated to it — ONE definition), so the
  * expression is bit-identical to the r4 UDF it replaces and the measured
  * LSH recall/scan frontier carries over unchanged. */
class HyperplaneBucketImpl(planes: Int, table: Int) extends Serializable {
  // The signature is an Int bitset: `1 << p` for p > 31 silently wraps
  // (Java shift-mod-32) and aliases plane p with p-32, turning bucket
  // bits into ORs of two sign bits — fail loudly instead (ADVICE r16;
  // LlmVector.orTableParams absorbs growth past the cap into more
  // OR-tables rather than more planes).
  require(planes >= 1 && planes <= 31,
    s"HyperplaneBucket supports 1..31 planes (Int signature), got $planes")
  def bucket(v: ArrayData): Int = {
    var sig = 0
    var p = 0
    val n = v.numElements()
    while (p < planes) {
      var dot = 0.0
      var i = 0
      val plane = table * planes + p
      while (i < n) {
        dot += graft.operators.LlmVector.hyperplaneSign(plane, i) * v.getFloat(i)
        i += 1
      }
      if (dot > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }
}

/** Random-hyperplane sign bucket of an embedding as a native codegen
  * expression — the LSH bucketing step, last remaining non-demo UDF site
  * after [[SimHash64]]/[[NearestCells]] (r5): every hot-path scalar in
  * the engine is now either a built-in or a codegen Expression; the only
  * ScalaUDF left in the registry is fn_udf_scalar, the mandated UDF
  * surface demo. `table` selects an independent hyperplane set so
  * several hash tables can be unioned. */
case class HyperplaneBucket(child: Expression, planes: Int, table: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private lazy val impl = new HyperplaneBucketImpl(planes, table)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_bucket"

  override def nullSafeEval(a: Any): Any =
    impl.bucket(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneBucketImpl", impl,
      classOf[HyperplaneBucketImpl].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bucket($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  def apply(c: Column, planes: Int, table: Int): Column =
    ExpressionUtils.column(
      HyperplaneBucket(ExpressionUtils.expression(c), planes, table))
}

/** Top-n nearest codebook cells (by dot product) for a float-vector
  * column — the IVF cell-assignment step as a native codegen expression,
  * replacing the r4 broadcast-closure UDFs (VERDICT r4 "minor"). The
  * codebook rides inside the expression (serialized once per task with
  * the plan, like a broadcast for the ~25 KB quantizers used here; a
  * MB-scale codebook would go back to an explicit broadcast variable).
  * Returns array<int> so n=1 (corpus assignment, `.getItem(0)`) and
  * n=nProbe (probe fan-out, `explode`) share one surface.
  *
  * The codebook is held as IndexedSeq-of-IndexedSeq, NOT Array-of-Array:
  * case-class equality over Array is referential, which would make two
  * logically identical expressions never `semanticEquals` — silently
  * defeating plan canonicalization and subexpression reuse (ADVICE r5).
  * The kernel still runs on primitive arrays (converted once, lazily). */
case class NearestCells(child: Expression,
    cents: IndexedSeq[IndexedSeq[Double]], n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private lazy val impl =
    new NearestCellsImpl(cents.map(_.toArray).toArray, n)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override def nullSafeEval(a: Any): Any =
    impl.top(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellsImpl", impl,
      classOf[NearestCellsImpl].getName)
    defineCodeGen(ctx, ev, c => s"$ref.top($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  def apply(c: Column, cents: Array[Array[Double]], n: Int): Column =
    ExpressionUtils.column(NearestCells(ExpressionUtils.expression(c),
      cents.map(_.toIndexedSeq).toIndexedSeq, n))
}

/** Product-quantization kernels for the IVF-PQ ANN path
  * (llm_ann_ivfpq): [[encode]] maps a float vector to its m sub-codebook
  * code ids (the 8-byte resident a 100 TB vector store actually holds),
  * [[adc]] is the asymmetric-distance score — the normalized probe
  * dotted with the PQ reconstruction, folded dim-ascending from 0.0 so
  * the DuckDB oracle replays it bit-for-bit (the cosineSql discipline).
  *
  * Determinism contract mirrored by the oracle's generated CTEs:
  * full-vector L2 normalization (dim-ascending norm fold; zero vectors
  * pass through), per-subspace argmin of the L2 distance with ties to
  * the LOWER code (strict `<` over ascending codes), dims past the
  * vector's length SKIPPED on both sides (the SQL join drops them). */
class PqImpl(books: Array[Array[Array[Double]]], subDim: Int)
    extends Serializable {

  private def normalized(v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0; var s = 0.0
    while (i < n) {
      val d = v.getFloat(i).toDouble; x(i) = d; s += d * d; i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm == 0) x
    else { var j = 0; while (j < n) { x(j) /= nrm; j += 1 }; x }
  }

  def encode(v: ArrayData): ArrayData = {
    val x = normalized(v)
    val m = books.length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      var best = Double.PositiveInfinity; var bc = 0; var c = 0
      while (c < book.length) {
        val cent = book(c)
        var s = 0.0; var d = 0
        while (d < subDim && j * subDim + d < x.length) {
          val t = x(j * subDim + d) - cent(d)
          s += t * t
          d += 1
        }
        if (s < best) { best = s; bc = c } // ties keep the lower code
        c += 1
      }
      out(j) = bc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def adc(codes: ArrayData, probe: ArrayData): Double = {
    val p = normalized(probe)
    val m = books.length
    var s = 0.0
    var dim = 0
    val total = m * subDim
    while (dim < total && dim < p.length) {
      val j = dim / subDim
      s += p(dim) * books(j)(codes.getInt(j))(dim % subDim)
      dim += 1
    }
    s
  }
}

/** PQ-encode a float-vector column against trained sub-codebooks —
  * returns array<int> of m code ids. Codebooks ride as IndexedSeq (not
  * Array) for the same semanticEquals reason as [[NearestCells]]. */
case class PqEncode(child: Expression,
    books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], subDim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private lazy val impl =
    new PqImpl(books.map(_.map(_.toArray).toArray).toArray, subDim)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(a: Any): Any =
    impl.encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeImpl", impl,
      classOf[PqImpl].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(c: Column, books: Array[Array[Array[Double]]],
      subDim: Int): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(c),
      books.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq, subDim))
}

/** Asymmetric-distance score of (codes array<int>, probe array<float>)
  * against the same codebooks — see [[PqImpl.adc]]. */
case class PqAdc(left: Expression, right: Expression,
    books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]], subDim: Int)
    extends BinaryExpression with ExpectsInputTypes {

  private lazy val impl =
    new PqImpl(books.map(_.map(_.toArray).toArray).toArray, subDim)

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, probe: Any): Any =
    impl.adc(codes.asInstanceOf[ArrayData], probe.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcImpl", impl, classOf[PqImpl].getName)
    defineCodeGen(ctx, ev, (c, p) => s"$ref.adc($c, $p)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(codes: Column, probe: Column,
      books: Array[Array[Array[Double]]], subDim: Int): Column =
    ExpressionUtils.column(PqAdc(ExpressionUtils.expression(codes),
      ExpressionUtils.expression(probe),
      books.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq, subDim))
}

/** Session-extension injection (`spark.sql.extensions=org.apache.spark.sql
  * .graft.GraftExtensions`): registers the engine's native functions at
  * session build time — the deployment path for clusters where users only
  * touch SQL. Harness sessions call CosineSimilarity.register instead;
  * same registry either way. ([[NearestCells]] is DataFrame-only: its
  * codebook parameter has no SQL literal form.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName,
        "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName,
        "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    // The engine's one optimizer rewrite (see OptimizerRules.scala): the
    // naive unbounded-levenshtein comparison → the banded thresholded
    // kernel. Live sessions install it via ThresholdLevenshtein.install.
    ext.injectOptimizerRule(_ => ThresholdLevenshtein)
  }
}
