package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** X32 — streaming Misra-Gries heavy hitters on `transformWithState`
  * with a typed MAP state: the bounded-memory frequent-items sketch
  * maintained INCREMENTALLY across micro-batches, the third state
  * shape of the new API exercised (value → sessionizer X31, timers →
  * idle closer / funnel abandonment, map → here).
  *
  * Layout: tokens shard by their first md5 nibble (16 shards — the
  * stream's key space), and each shard key owns ONE `MapState` of at
  * most `m` counters. The fold is the classical Misra-Gries step
  * (increment if tracked, insert if room, otherwise decrement ALL and
  * evict zeros), so per-key state is O(m) REGARDLESS of stream length
  * or vocabulary — the property that makes the operator deployable
  * against an unbounded token stream where the exact `groupBy(token)`
  * twin ([[Streaming.streamHeavyHitters]]) keeps per-token state.
  *
  * No-miss guarantee (why the recount can be exact): Misra-Gries with
  * `m` counters over a shard stream of length n_s retains every item
  * with shard count > n_s/(m+1). A globally φ-heavy token (count ≥
  * total/φ⁻¹) has shard count ≥ total/φ⁻¹ ≥ n_s/φ⁻¹ > n_s/(m+1)
  * whenever m+1 > φ⁻¹ — guaranteed here by `require(m >= phiInv)` at
  * the call site. Incremental application across batches is exact:
  * Misra-Gries is a one-pass fold, and the MapState carries the fold
  * state between batches, so the final counters equal a single pass
  * over the concatenated stream.
  *
  * Emission: each batch, after folding its rows, a key emits its full
  * surviving candidate set stamped with a per-key generation counter
  * (a `ValueState[Long]`); the reader keeps only each shard's LAST
  * generation — candidates can be EVICTED by later decrements, so
  * unlike monotone folds the final set is not the union of emissions.
  */
object StatefulHeavyHittersTws {

  /** A sharded token occurrence. */
  final case class Tok(shard: Int, token: String)

  /** One surviving Misra-Gries counter as of generation `gen`. */
  final case class Cand(shard: Int, gen: Long, token: String, est: Long)

  private final class MgProcessor(m: Int)
      extends StatefulProcessor[Int, Tok, Cand] {

    @transient private var counters: MapState[String, Long] = _
    @transient private var gen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("mg_counters",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      gen = getHandle.getValueState[Long]("mg_gen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[Tok],
        timerValues: TimerValues): Iterator[Cand] = {
      // hydrate the ≤m-entry store map once, fold the batch locally,
      // then write back only the delta (changed values + evictions)
      val mg = mutable.HashMap.empty[String, Long]
      counters.iterator().foreach { case (k, v) => mg.update(k, v) }
      val before = mg.toMap
      rows.foreach { r =>
        mg.get(r.token) match {
          case Some(c) => mg.update(r.token, c + 1)
          case None if mg.size < m => mg.update(r.token, 1L)
          case None => // decrement all; evict zeros (the MG step)
            mg.keysIterator.toIndexedSeq.foreach { k =>
              val c = mg(k) - 1
              if (c == 0) mg.remove(k) else mg.update(k, c)
            }
        }
      }
      mg.foreach { case (k, v) =>
        if (!before.get(k).contains(v)) counters.updateValue(k, v)
      }
      before.keysIterator.filterNot(mg.contains).foreach(counters.removeKey)
      val g = (if (gen.exists()) gen.get() else 0L) + 1
      gen.update(g)
      mg.iterator.map { case (k, v) => Cand(shard, g, k, v) }
        .toIndexedSeq.sortBy(_.token).iterator
    }
  }

  /** Per-shard Misra-Gries candidates via `transformWithState`;
    * `m >= phiInv` at the call site gives the no-miss guarantee. */
  def heavyHitters(toks: Dataset[Tok], m: Int): Dataset[Cand] = {
    import toks.sparkSession.implicits._
    toks
      .groupByKey(_.shard)
      .transformWithState(new MgProcessor(m),
        TimeMode.None(), OutputMode.Update())
  }
}
