package graft.operators

import graft.SparkSpec

/** Randomized equivalence: the engine's custom machinery run over
  * seeded random inputs and compared against straightforward in-memory
  * reference implementations. Deterministic (fixed seeds), but far
  * broader input coverage than the hand-picked spec cases — the
  * property-test complement to the DuckDB oracles, aimed at the code
  * paths DuckDB can't replay (the native as-of exec's merge loop, the
  * prefix-sum recursion's level math, the greedy regex tokenizer).
  */
class RandomizedEquivalenceSpec extends SparkSpec {

  test("native as-of join matches the in-memory reference on random data") {
    val rnd = new scala.util.Random(42)
    val sess = spark
    import sess.implicits._
    val left = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(500).toLong, i.toLong))
    // right deduped on (key, time): tie order inside the merge is an
    // implementation detail, and real feeds (ns event streams) are
    // unique — keep the generator honest about that contract
    val right = (1 to 600).map(i =>
        (rnd.nextInt(20).toLong, rnd.nextInt(500).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val out = graft.plans.AsOfJoinOps.asofJoin(
        left.toDF("k", "t", "lid"), right.toDF("rk", "rt", "rid"),
        "k", "t", "rk", "rt")
      .select("k", "t", "lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val byKey = right.groupBy(_._1)
    val expected = left.map { case (k, t, lid) =>
      val cand = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
      val rid = if (cand.isEmpty) -1L else cand.maxBy(_._2)._3
      (k, t, lid, rid)
    }.toSet
    assert(out == expected)
  }

  test("recursive exclusive prefix sum matches scanLeft at every window bound") {
    val rnd = new scala.util.Random(7)
    val sess = spark
    import sess.implicits._
    val tots = (0L until 300L).map(k => (k, rnd.nextInt(50).toLong + 1L))
    val df = rnd.shuffle(tots).toDF("key", "tot")
    // 1<<20 = single window level; 8 and 4 force 2- and 3-deep recursion
    for (bound <- Seq(1L << 20, 8L, 4L)) {
      val got = TextAnalysis.exclusivePrefixSum(df, 300, fanout = 4,
          maxWindowRows = bound)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var acc = 0L
      tots.foreach { case (k, n) =>
        assert(got(k) == acc, s"key=$k bound=$bound: ${got(k)} != $acc")
        acc += n
      }
    }
  }

  test("greedy regex subword tokenizer matches the iterative greedy reference") {
    val rnd = new scala.util.Random(13)
    val sess = spark
    import sess.implicits._
    val vocabLongestFirst = TextAnalysis.bpeVocab.sortBy(u => (-u.length, u))
    def greedyCount(s: String): Long = {
      var i = 0; var n = 0L
      while (i < s.length) {
        vocabLongestFirst.find(v => s.startsWith(v, i)) match {
          case Some(v) => n += 1; i += v.length
          case None =>
            if (s(i).isLetter || s(i).isDigit) n += 1
            i += 1
        }
      }
      n
    }
    def genString(): String = (1 to 40).map { _ =>
      rnd.nextInt(3) match {
        case 0 => TextAnalysis.bpeVocab(rnd.nextInt(TextAnalysis.bpeVocab.size))
        case 1 => ('a' + rnd.nextInt(26)).toChar.toString
        case 2 => " "
      }
    }.mkString
    val strs = (1 to 100).map(_ => genString())
    val got = strs.toDF("text")
      .select(TextAnalysis.bpeTokenCount.as("n")).collect().map(_.getLong(0))
    got.zip(strs).foreach { case (n, s) =>
      assert(n == greedyCount(s), s"mismatch on: '$s'")
    }
  }
}
