package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared shape for binary vector kernels over `array<double>`:
  * single fused primitive loop in both interpreted and codegen paths;
  * null on null input, length mismatch, or (where applicable) a zero
  * denominator. Subclasses supply the loop body and the final fold.
  */
abstract class BinaryVectorExpression extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Fold (accumulated sums) → result; None encodes SQL null. */
  protected def fold(acc: Double): Option[Double]

  /** Per-element accumulation for the interpreted path. */
  protected def accumulate(acc: Double, x: Double, y: Double): Double

  /** Codegen accumulation statement over `acc`, `xv`, `yv`. */
  protected def accumulateCode(acc: String, xv: String, yv: String): String

  /** Codegen fold: assign `ev.value`/`ev.isNull` from `acc`. */
  protected def foldCode(acc: String, ev: ExprCode): String

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc = accumulate(acc, x.getDouble(i), y.getDouble(i)); i += 1 }
    fold(acc).orNull
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xv = $a.getDouble($i);
         |    final double $yv = $b.getDouble($i);
         |    ${accumulateCode(acc, xv, yv)}
         |  }
         |  ${foldCode(acc, ev)}
         |}
       """.stripMargin
    })
}

/** `dot_product(a, b)` — inner product. */
case class DotProduct(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def accumulate(acc: Double, x: Double, y: Double): Double = acc + x * y
  override protected def fold(acc: Double): Option[Double] = Some(acc)
  override protected def accumulateCode(acc: String, xv: String, yv: String): String =
    s"$acc += $xv * $yv;"
  override protected def foldCode(acc: String, ev: ExprCode): String =
    s"${ev.value} = $acc;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** `l2_distance(a, b)` — Euclidean distance. */
case class L2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def accumulate(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def fold(acc: Double): Option[Double] = Some(math.sqrt(acc))
  override protected def accumulateCode(acc: String, xv: String, yv: String): String =
    s"final double ${acc}_d = $xv - $yv; $acc += ${acc}_d * ${acc}_d;" // acc is ctx-fresh → _d suffix can't collide
  override protected def foldCode(acc: String, ev: ExprCode): String =
    s"${ev.value} = java.lang.Math.sqrt($acc);"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Distance =
    copy(left = l, right = r)
  override def prettyName: String = "l2_distance"
}

/** `l2_sq_distance(a, b)` — SQUARED Euclidean distance (no sqrt):
  * the product-quantization/ADC kernel, where per-subspace squared
  * sub-distances add across subspaces and the root is never taken.
  * Accumulation is the same in-order `acc += d·d` loop as
  * [[L2Distance]], so a left-associative `+` chain over the elements
  * (the oracle's spelling) reproduces the exact double. */
case class L2SquaredDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override protected def accumulate(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def fold(acc: Double): Option[Double] = Some(acc)
  override protected def accumulateCode(acc: String, xv: String, yv: String): String =
    s"final double ${acc}_d = $xv - $yv; $acc += ${acc}_d * ${acc}_d;"
  override protected def foldCode(acc: String, ev: ExprCode): String =
    s"${ev.value} = $acc;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SquaredDistance =
    copy(left = l, right = r)
  override def prettyName: String = "l2_sq_distance"
}

/** `quantized_cosine(a, b)` — cosine similarity computed over the
  * symmetric-int8 quantization of both vectors (per-vector max-abs
  * scale, `round(v/scale·127 + 1e-9)` half-away-from-zero — exactly
  * [[graft.operators.Similarity.embedQuantize]]'s mapping, so the
  * DuckDB oracle replays it verbatim).
  *
  * This is the scoring kernel of a production int8 ANN index: the
  * integer dot/norm accumulation is what runs against a quantized
  * vector table at 4× the memory bandwidth of doubles. Here both
  * sides quantize inline (one fused codegen pass, two tight primitive
  * loops per row — no intermediate array materializes) so the
  * operator is a drop-in on `array<double>` and end-to-end
  * oracle-checkable without staging the int8 table; at 100 TB the
  * corpus side reads pre-quantized vectors written by
  * `embed_quantize` and skips the first loop.
  *
  * Scale cancels out of cosine, so the integer arithmetic is exact
  * (values ≤ 127²·dims ≪ 2⁵³) and bit-identical on any engine; only
  * the final sqrt/divide are floating point.
  *
  * Null contract: null on null input, length mismatch, a zero scale
  * (zero vector), or a zero quantized norm.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // round-half-away-from-zero, matching Spark's round() (HALF_UP) and
  // DuckDB's round() — Math.round would differ at negative halves
  @inline private def q(v: Double, scale: Double): Long = {
    val t = v / scale * 127.0 + 1e-9
    if (t >= 0) math.floor(t + 0.5).toLong else math.ceil(t - 0.5).toLong
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sa = 0.0; var sb = 0.0; var i = 0
    while (i < n) {
      sa = math.max(sa, math.abs(x.getDouble(i)))
      sb = math.max(sb, math.abs(y.getDouble(i)))
      i += 1
    }
    if (sa == 0.0 || sb == 0.0) return null
    var dot = 0L; var nx = 0L; var ny = 0L
    i = 0
    while (i < n) {
      val qx = q(x.getDouble(i), sa); val qy = q(y.getDouble(i), sb)
      dot += qx * qy; nx += qx * qx; ny += qy * qy; i += 1
    }
    val denom = math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)
    if (denom == 0.0) null else dot.toDouble / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val tx = ctx.freshName("tx")
      val ty = ctx.freshName("ty")
      val qx = ctx.freshName("qx")
      val qy = ctx.freshName("qy")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sa = 0.0; double $sb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sa = java.lang.Math.max($sa, java.lang.Math.abs($a.getDouble($i)));
         |    $sb = java.lang.Math.max($sb, java.lang.Math.abs($b.getDouble($i)));
         |  }
         |  if ($sa == 0.0 || $sb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $tx = $a.getDouble($i) / $sa * 127.0 + 1e-9;
         |      final double $ty = $b.getDouble($i) / $sb * 127.0 + 1e-9;
         |      final long $qx = (long)($tx >= 0 ? java.lang.Math.floor($tx + 0.5d) : java.lang.Math.ceil($tx - 0.5d));
         |      final long $qy = (long)($ty >= 0 ? java.lang.Math.floor($ty + 0.5d) : java.lang.Math.ceil($ty - 0.5d));
         |      $dot += $qx * $qy; $nx += $qx * $qx; $ny += $qy * $qy;
         |    }
         |    final double $denom = java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = ((double) $dot) / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantized_cosine"
}
