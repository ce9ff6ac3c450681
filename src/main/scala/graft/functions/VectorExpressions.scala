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
