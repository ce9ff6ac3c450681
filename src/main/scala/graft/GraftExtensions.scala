package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2SquaredDistance, MisraGriesAgg, QuantizedCosine, TopKByAgg}

/** Session extensions registering graft's native SQL functions
  * (SURVEY.md §2.4 S3). Install with
  * `spark.sql.extensions=graft.GraftExtensions` (any deployment
  * mechanism — spark-submit conf, builder config) and the functions
  * resolve in plain SQL: `SELECT cosine_similarity(a, b)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // grid rewrite for interval-overlap joins that would otherwise
    // plan as nested loops (kill switch: graft.intervalJoin.enabled)
    ext.injectOptimizerRule(_ => graft.plans.IntervalOverlapRewrite)
    // banded equi-join rewrite for abs-difference joins (kill switch:
    // graft.absBandJoin.enabled)
    ext.injectOptimizerRule(_ => graft.plans.AbsBandJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null,
        "cosine_similarity", "cosine_similarity(a, b) - cosine similarity of two array<double> vectors", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"cosine_similarity expects 2 arguments, got ${children.length}")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null,
        "dot_product", "dot_product(a, b) - inner product of two array<double> vectors", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product expects 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, null,
        "l2_distance", "l2_distance(a, b) - Euclidean distance of two array<double> vectors", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"l2_distance expects 2 arguments, got ${children.length}")
        L2Distance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("l2_sq_distance"),
      new ExpressionInfo(classOf[L2SquaredDistance].getName, null,
        "l2_sq_distance", "l2_sq_distance(a, b) - squared Euclidean distance of two array<double> vectors (the PQ/ADC kernel)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"l2_sq_distance expects 2 arguments, got ${children.length}")
        L2SquaredDistance(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_by"),
      new ExpressionInfo(classOf[TopKByAgg].getName, null,
        "topk_by", "topk_by(score, id, k) - bounded top-k aggregate: best k (score, id) pairs, (score DESC, id ASC)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"topk_by expects 3 arguments, got ${children.length}")
        TopKByAgg(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, null,
        "misra_gries", "misra_gries(key, m) - bounded frequent-items summary: struct<n, items array<struct<token, est>>>, undercount <= n/(m+1)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"misra_gries expects 2 arguments, got ${children.length}")
        MisraGriesAgg(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(classOf[QuantizedCosine].getName, null,
        "quantized_cosine", "quantized_cosine(a, b) - cosine over the symmetric-int8 quantization of two array<double> vectors", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"quantized_cosine expects 2 arguments, got ${children.length}")
        QuantizedCosine(children.head, children(1))
      }))
  }
}
