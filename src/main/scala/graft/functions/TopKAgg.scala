package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: the best `k` (score, id) pairs
  * under the order (score DESC, id ASC), kept as a binary min-heap
  * whose ROOT is the current worst survivor — insertion is O(log k)
  * and, crucially, the state never exceeds k entries no matter how
  * many rows stream through it.
  *
  * Heap order ("worse-than" = closer to eviction): lower score, then
  * HIGHER id (so the deterministic tiebreak survives: of two equal
  * scores the larger id is evicted first).
  */
final class TopKBuffer(val k: Int) {
  private var heapScores = new Array[Double](math.max(1, math.min(k, 16)))
  private var heapIds = new Array[Long](math.max(1, math.min(k, 16)))
  var size: Int = 0

  /** a strictly worse than b under (score DESC, id ASC)? */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def grow(): Unit = if (size == heapScores.length && size < k) {
    val cap = math.min(k, heapScores.length * 2)
    heapScores = java.util.Arrays.copyOf(heapScores, cap)
    heapIds = java.util.Arrays.copyOf(heapIds, cap)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(heapScores(i), heapIds(i), heapScores(p), heapIds(p))) {
        val ts = heapScores(i); val ti = heapIds(i)
        heapScores(i) = heapScores(p); heapIds(i) = heapIds(p)
        heapScores(p) = ts; heapIds(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < size && worse(heapScores(l), heapIds(l), heapScores(w), heapIds(w))) w = l
      if (r < size && worse(heapScores(r), heapIds(r), heapScores(w), heapIds(w))) w = r
      if (w == i) return
      val ts = heapScores(i); val ti = heapIds(i)
      heapScores(i) = heapScores(w); heapIds(i) = heapIds(w)
      heapScores(w) = ts; heapIds(w) = ti
      i = w
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      grow()
      heapScores(size) = score; heapIds(size) = id
      size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(heapScores(0), heapIds(0), score, id)) {
      heapScores(0) = score; heapIds(0) = id
      siftDown()
    }
  }

  /** (score, id) pairs sorted (score DESC, id ASC) — the output order. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (heapScores(i), heapIds(i)))
    java.util.Arrays.sort(out, new java.util.Comparator[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    out
  }

  def foreachEntry(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(heapScores(i), heapIds(i)); i += 1 }
  }
}

/** `topk_by(score, id, k)` — native bounded top-k aggregate
  * (SURVEY.md §2 F1): returns the k best `(score, id)` pairs of the
  * group as `array<struct<score double, id bigint>>`, ordered
  * (score DESC, id ASC) with the id as deterministic tiebreak.
  *
  * The scale point: Spark expresses per-group top-k as a rank window,
  * which shuffles EVERY candidate row to its group's partition and
  * sorts there — at 100 TB a brute-force ANN scan shuffles the whole
  * corpus × queries score set. This aggregate is partial-aggregating:
  * each map task keeps an O(k) heap per group and the exchange
  * carries at most `k` pairs per (task, group) — candidate volume
  * never crosses the wire. `TypedImperativeAggregate` plans as
  * ObjectHashAggregate (partial → final), the same machinery as
  * `collect_list`/`percentile_approx`, but with a bounded buffer.
  *
  * Determinism: insertion order cannot change the survivor set — the
  * comparator (score DESC, id ASC) is a total order over pairs, the
  * heap keeps the k best under it, and merge() re-inserts elementwise
  * — so the result is a pure function of the group's row set and the
  * DuckDB rank-window oracle replays it exactly.
  */
case class TopKByAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval() match {
    case n: Number if n.intValue() > 0 => n.intValue()
    case other => throw new IllegalArgumentException(
      s"topk_by: k must be a positive integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByAgg.resultType
  override def prettyName: String = "topk_by"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: score must be DOUBLE, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by: id must be BIGINT, got ${id.dataType.simpleString}")
    else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType ||
          kExpr.dataType == ShortType || kExpr.dataType == ByteType))
      TypeCheckResult.TypeCheckFailure("topk_by: k must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreachEntry((s, i) => b.insert(s, i))
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * b.size)
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.size)
    b.foreachEntry { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.insert(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
}

object TopKByAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** DataFrame-side helper: `topKBy(score, id, k)` as an aggregate
    * Column (score cast to double, id to bigint at the call site). */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByAgg(
      ColumnBridge.expression(score),
      ColumnBridge.expression(id),
      Literal(k)).toAggregateExpression())
}
