package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary over string keys, capacity `m`:
  * at most `m` (key, count) counters no matter how many rows or
  * distinct keys stream through.
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *   - every counter UNDERCOUNTS: est(k) ≤ true(k);
  *   - the undercount is bounded: true(k) − est(k) ≤ n/(m+1) where
  *     n is the total stream length — so any key with true frequency
  *     > n/(m+1) is guaranteed to be present in the summary;
  *   - two summaries merge (add counts, then subtract the (m+1)-th
  *     largest count from all and drop the non-positive) into a
  *     summary with the SAME bound over the combined stream, which is
  *     what makes the sketch a valid partial aggregate.
  */
final class MGBuffer(val m: Int) {
  val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  /** Total stream length folded into this buffer — carried so the
    * final output can report the error bound alongside the items. */
  var n: Long = 0L

  def add(key: UTF8String, by: Long = 1L): Unit = {
    n += by
    counts.get(key) match {
      case Some(c) => counts.update(key, c + by)
      case None =>
        if (counts.size < m) {
          // the input UTF8String may alias a reused scan buffer
          counts.update(key.clone(), by)
        } else {
          // decrement-all by the largest amount that still respects
          // the per-step rule: min(by, current minimum) would be the
          // strict textbook step repeated `by` times; one pass with
          // d = min(by, min count) keeps the bound and is O(m)
          val d = math.min(by, counts.valuesIterator.min)
          shrinkBy(d)
          val rest = by - d
          if (rest > 0 && counts.size < m) counts.update(key.clone(), rest)
        }
    }
  }

  /** Subtract `d` from every counter, dropping the non-positive. */
  private def shrinkBy(d: Long): Unit = {
    val dead = counts.iterator.filter(_._2 <= d).map(_._1).toArray
    if (dead.length == counts.size) counts.clear()
    else {
      dead.foreach(counts.remove)
      counts.mapValuesInPlace((_, c) => c - d)
    }
  }

  /** Mergeable-summaries combine: elementwise add, then shrink back
    * to `m` counters by subtracting the (m+1)-th largest count. */
  def mergeIn(other: MGBuffer): Unit = {
    n += other.n
    other.counts.foreach { case (k, c) =>
      counts.get(k) match {
        case Some(c0) => counts.update(k, c0 + c)
        case None     => counts.update(k.clone(), c)
      }
    }
    if (counts.size > m) {
      val sorted = counts.valuesIterator.toArray
      java.util.Arrays.sort(sorted)
      val d = sorted(sorted.length - (m + 1)) // (m+1)-th largest
      shrinkBy(d)
    }
  }

  /** (key, est) pairs sorted (est DESC, key ASC) — deterministic
    * output order regardless of hash-map iteration. */
  def sorted: Array[(UTF8String, Long)] = {
    val out = counts.toArray
    java.util.Arrays.sort(out, new java.util.Comparator[(UTF8String, Long)] {
      override def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    out
  }
}

/** `misra_gries(key, m)` — native bounded frequent-items aggregate
  * (SURVEY.md §2 F2): returns the summary as
  * `struct<n bigint, items array<struct<token string, est bigint>>>`.
  *
  * The scale point: exact heavy hitters via `GROUP BY key` keeps one
  * hash-aggregate entry per DISTINCT key per task — over an open
  * domain (tokens, n-grams, URLs at 100 TB) that state is unbounded
  * and spills. This aggregate's state is O(m) per task regardless of
  * the domain, the exchange carries at most m counters per task, and
  * the guarantee (no key above n/(m+1) is lost) makes it a sound
  * CANDIDATE GENERATOR: a second exact recount over the ≤ m candidate
  * keys turns the sketch into an exact heavy-hitters answer with two
  * bounded passes and no unbounded aggregation state anywhere — the
  * pattern `text_heavy_hitters` ships.
  */
case class MisraGriesAgg(
    key: Expression,
    mExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  private lazy val m: Int = mExpr.eval() match {
    case i: Number if i.intValue() > 0 => i.intValue()
    case other => throw new IllegalArgumentException(
      s"misra_gries: m must be a positive integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(key, mExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.resultType
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (key.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"misra_gries: key must be STRING, got ${key.dataType.simpleString}")
    else if (!mExpr.foldable ||
        !(mExpr.dataType == IntegerType || mExpr.dataType == LongType ||
          mExpr.dataType == ShortType || mExpr.dataType == ByteType))
      TypeCheckResult.TypeCheckFailure("misra_gries: m must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val k = key.eval(input)
    if (k != null) b.add(k.asInstanceOf[UTF8String])
    b
  }

  override def merge(b: MGBuffer, other: MGBuffer): MGBuffer = {
    b.mergeIn(other)
    b
  }

  override def eval(b: MGBuffer): Any = {
    val items = new GenericArrayData(b.sorted.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    }.asInstanceOf[Array[Any]])
    new GenericInternalRow(Array[Any](b.n, items))
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.m)
    out.writeLong(b.n)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (k, c) =>
      val bytes = k.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    buf.n = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.counts.update(UTF8String.fromBytes(kb), in.readLong())
      i += 1
    }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), mExpr = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
}

object MisraGriesAgg {
  val resultType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
      containsNull = false), nullable = false)))

  /** DataFrame-side helper: `misraGries(key, m)` as an aggregate
    * Column returning `struct<n, items>`. */
  def misraGries(key: Column, m: Int): Column =
    ColumnBridge.column(MisraGriesAgg(
      ColumnBridge.expression(key),
      Literal(m)).toAggregateExpression())
}
