package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import StatefulHeavyHittersTws.{Cand, Tok}

/** X32 — the bounded-state Misra-Gries heavy hitters on
  * `transformWithState` MapState: the sketch fold must equal a
  * single-pass driver-side Misra-Gries over the concatenated stream
  * (incremental exactness), state must stay ≤ m counters per shard at
  * every generation, and the no-miss guarantee must hold so the exact
  * recount loses nothing vs the unbounded-state twin. */
class HeavyHittersTwsSpec extends SparkSpec {

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** Feed token batches through the TWS sketch; returns every emitted
    * (shard, gen, token, est) generation row. */
  private def drain(feeds: Seq[Seq[Tok]], name: String,
      m: Int): Seq[(Int, Long, String, Long)] = withRocksDb {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Tok]
    val out = StatefulHeavyHittersTws.heavyHitters(input.toDS(), m)
    val q = out.toDF().writeStream.outputMode("update").format("memory")
      .queryName(name).start()
    feeds.foreach { batch => input.addData(batch); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toIndexedSeq
  }

  /** Classical one-pass Misra-Gries over a token stream. */
  private def mgReference(toks: Seq[String], m: Int): Map[String, Long] = {
    val mg = scala.collection.mutable.HashMap.empty[String, Long]
    toks.foreach { w =>
      if (mg.contains(w)) mg(w) += 1
      else if (mg.size < m) mg(w) = 1L
      else mg.keys.toIndexedSeq.foreach { k =>
        if (mg(k) == 1) mg.remove(k) else mg(k) -= 1
      }
    }
    mg.toMap
  }

  test("incremental MapState fold == one-pass Misra-Gries, bounded state") {
    val m = 3
    // one shard; crafted so eviction and re-insertion BOTH cross batch
    // boundaries (the MapState carry is what's under test)
    val stream = Seq(
      Seq("a", "a", "b", "c"), // counters full: a=2 b=1 c=1
      Seq("d", "a", "d"),      // d arrives twice: first decrements all
      Seq("e", "e", "a", "b")) // e re-fills the freed slot
    val feeds = stream.map(_.map(Tok(0, _)))
    val rows = drain(feeds, "tws_hh_unit", m)
    // per-generation state bound: ≤ m counters, ever
    rows.groupBy(_._2).foreach { case (g, rs) =>
      assert(rs.size <= m, s"gen $g exceeded $m counters: $rs")
    }
    // final generation equals the single-pass reference over the
    // concatenation — Misra-Gries is a fold, MapState is its carry
    val last = rows.filter(_._2 == rows.map(_._2).max)
      .map(r => r._3 -> r._4).toMap
    assert(last == mgReference(stream.flatten, m),
      s"got $last want ${mgReference(stream.flatten, m)}")
  }

  test("stream_tws_heavy_hitters == the unbounded-state twin on the corpus") {
    val tws = graft.streaming.Streaming.streamTwsHeavyHitters(tables)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val exact = graft.operators.TextAnalysis.textHeavyHitters(tables)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(tws == exact,
      s"onlyTws=${(tws -- exact).take(5)} onlyExact=${(exact -- tws).take(5)}")
    assert(tws.nonEmpty, "no heavy hitters at this SF")
  }

  test("no-miss guarantee: every φ-heavy token survives the final sketch") {
    import spark.implicits._
    val toks = tables.documents
      .select(explode(
        graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
      .as[String].collect().toIndexedSeq
    val total = toks.size.toLong
    val heavy = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * 40 >= total).keySet
    assert(heavy.nonEmpty)
    // shard exactly as the operator does (first md5 nibble)
    def shard(w: String): Int = java.lang.Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(1).map(b => f"$b%02x")
        .mkString.take(1), 16)
    heavy.foreach { h =>
      val sh = shard(h)
      val survivors =
        mgReference(toks.filter(w => shard(w) == sh), m = 64).keySet
      assert(survivors.contains(h),
        s"φ-heavy '$h' evicted from shard $sh — guarantee broken")
    }
  }
}
