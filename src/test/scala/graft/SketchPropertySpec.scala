package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Sketches

/** Property tests for the sketch buffers themselves (no Spark session):
  * the Spark-level specs (SketchSpec) cover the aggregate plumbing; these
  * drive the buffers directly through random streams and random merge
  * trees, where the invariants must hold for ANY shape — exactly the
  * degrees of freedom Spark's partial-aggregation planner controls. */
class SketchPropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T], n: Int = 120)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var produced = 0
    var i = 0L
    while (produced < n && i < n * 10L) {
      g.apply(params, Seed(i)).foreach { v => body(v); produced += 1 }
      i += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  private val streamGen: Gen[(Int, List[Long], Int)] = for {
    k <- Gen.choose(2, 64)
    len <- Gen.choose(0, 400)
    // small value domain so duplicates and collisions are common
    vals <- Gen.listOfN(len, Gen.choose(-50L, 50L))
    splits <- Gen.choose(1, 8)
  } yield (k, vals, splits)

  test("kmv buffer: any merge tree equals the single-stream sketch equals brute force") {
    forAll(streamGen) { case (k, vals, splits) =>
      def runOne(vs: Seq[Long]): Sketches.KmvBuf = {
        val agg = Sketches.KmvSketch(k)
        vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      }
      val agg = Sketches.KmvSketch(k)
      val whole = agg.finish(runOne(vals)).toSeq
      // split round-robin into `splits` buffers and left-fold merge
      val parts = (0 until splits).map(s =>
        runOne(vals.zipWithIndex.collect { case (v, i) if i % splits == s => v }))
      val merged = agg.finish(parts.reduceLeft(agg.merge)).toSeq
      assert(merged == whole, s"merge tree changed the sketch (k=$k)")
      // brute force: the k smallest distinct sketch-space values
      val exact = vals.map(_ ^ Long.MinValue).distinct.sorted.take(k)
      assert(whole == exact, s"sketch != brute force bottom-$k")
    }
  }

  test("mg buffer: guarantee holds for any stream and any merge split") {
    forAll(streamGen) { case (capRaw, vals, splits) =>
      val cap = math.max(1, capRaw / 4) // small caps force eviction
      val agg = Sketches.SpaceSavingTopK(cap)
      def runOne(vs: Seq[Long]) =
        vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val parts = (0 until splits).map(s =>
        runOne(vals.zipWithIndex.collect { case (v, i) if i % splits == s => v }))
      val merged = parts.reduceLeft(agg.merge)
      val out = agg.finish(merged)
      // finish() trims but does not clear `merged`, so its deducted field
      // is the final bound — readable even when the summary emptied (an
      // empty summary is LEGAL when no count exceeds the deduction, the
      // honest "no heavy hitters at this cap" answer).
      val deducted = merged.deducted
      val truth = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = vals.size.toLong
      assert(out.length <= cap, s"summary exceeded cap: ${out.length} > $cap")
      out.foreach { h =>
        val t = truth(h.key)
        assert(h.err == deducted)
        assert(h.cnt <= t, s"MG must underestimate: ${h.cnt} > $t for ${h.key}")
        assert(h.cnt + h.err >= t,
          s"true count outside [cnt, cnt+err]: $t vs [${h.cnt}, ${h.cnt + h.err}]")
      }
      // Mass argument: every cut is simultaneously subtracted from > cap
      // live entries, so total deduction <= n/(cap+1) REGARDLESS of the
      // merge tree (deductions add across merges, but so does the mass
      // that paid for them).
      assert(deducted <= n / (cap + 1),
        s"deduction bound blown: $deducted > ${n / (cap + 1)} (n=$n cap=$cap)")
      // the MG retention guarantee: true count > deducted => present
      truth.foreach { case (key, t) =>
        if (t > deducted)
          assert(out.exists(_.key == key),
            s"key $key with count $t > deducted $deducted was evicted")
      }
      // absent keys must be explainable by the deduction
      truth.foreach { case (key, t) =>
        if (!out.exists(_.key == key))
          assert(t <= deducted,
            s"key $key with count $t > deducted $deducted missing from summary")
      }
      // output order is (cnt desc, key asc)
      out.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.cnt > b.cnt || (a.cnt == b.cnt && a.key < b.key))
        case _ =>
      }
    }
  }

  test("pct buffer: exact below cap for any merge tree; weight conserved and rank-bounded above") {
    val pctGen: Gen[(Int, List[Double], Int, Double)] = for {
      cap <- Gen.choose(8, 96)
      len <- Gen.choose(0, 800)
      // small domain => heavy duplication; negatives exercise sort order
      vals <- Gen.listOfN(len, Gen.choose(-100, 100).map(_.toDouble))
      splits <- Gen.choose(1, 8)
      q <- Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    } yield (cap, vals, splits, q)
    forAll(pctGen) { case (cap, vals, splits, q) =>
      val agg = Sketches.PctSketch(cap)
      def runOne(vs: Seq[Double]) = vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val parts = (0 until splits).map(s =>
        runOne(vals.zipWithIndex.collect { case (v, i) if i % splits == s => v }))
      val sm = agg.finish(parts.reduceLeft(agg.merge))
      val n = vals.size.toLong
      // Weight conservation is the anchor invariant: compactions and the
      // odd-leftover rule must preserve total weight under ANY merge tree.
      assert(sm.ws.sum == n, s"weight not conserved: ${sm.ws.sum} != $n")
      assert(sm.vs.sorted.toSeq == sm.vs.toSeq, "summary must be value-sorted")
      val est = Sketches.pctFromSketch(sm.vs, sm.ws, q)
      if (n == 0) assert(est == null, "empty sketch must estimate null")
      else {
        val sorted = vals.sorted
        if (n <= cap) {
          // Lossless regime: the builtin interpolation on the multiset,
          // double-for-double (parts never compacted — level 0 holds all).
          val pos = q * (n - 1).toDouble
          val (lo, hi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
          val expect = if (lo == hi) sorted(lo.toInt)
            else (hi - pos) * sorted(lo.toInt) + (pos - lo) * sorted(hi.toInt)
          assert(est.doubleValue == expect, s"lossless mismatch: $est != $expect (q=$q)")
        } else {
          // Saturated regime: the estimate's plausible-rank window
          // [#strictly-below, #at-or-below] must sit within eps*n of the
          // target rank, eps from the per-level compaction count (the
          // alternating offset keeps the constant small; 3 is generous
          // but non-vacuous at these sizes).
          val below = sorted.count(_ < est.doubleValue).toLong
          val atOrBelow = sorted.count(_ <= est.doubleValue).toLong
          val target = q * (n - 1)
          val levels = math.max(1, math.ceil(math.log(n.toDouble / cap) / math.log(2)).toInt)
          val eps = math.min(0.5, 3.0 * levels / cap)
          assert(below - eps * n <= target && target <= atOrBelow + eps * n,
            s"rank window [$below, $atOrBelow] vs target $target " +
              s"(n=$n cap=$cap eps=$eps q=$q)")
        }
      }
    }
  }

  test("weighted pct buffer: equals the replicated multiset exactly below cap rows") {
    val wGen: Gen[(List[(Double, Long)], Int, Double)] = for {
      len <- Gen.choose(0, 60)
      rows <- Gen.listOfN(len, for {
        v <- Gen.choose(-40, 40).map(_.toDouble)
        w <- Gen.choose(0L, 21L) // includes zero weights and multi-bit weights
      } yield (v, w))
      splits <- Gen.choose(1, 5)
      q <- Gen.oneOf(0.0, 0.3, 0.5, 0.9, 1.0)
    } yield (rows, splits, q)
    forAll(wGen) { case (rows, splits, q) =>
      val agg = Sketches.PctSketchWeighted(256) // 60 rows << cap: lossless
      def runOne(rs: Seq[(Double, Long)]) =
        rs.foldLeft(agg.zero)((b, r) => agg.reduce(b, r))
      val parts = (0 until splits).map(s =>
        runOne(rows.zipWithIndex.collect { case (r, i) if i % splits == s => r }))
      val sm = agg.finish(parts.reduceLeft(agg.merge))
      val wTot = rows.map(_._2).sum
      assert(sm.ws.sum == wTot, s"weight not conserved: ${sm.ws.sum} != $wTot")
      val est = Sketches.pctFromSketch(sm.vs, sm.ws, q)
      val replicated = rows.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
      if (replicated.isEmpty) assert(est == null)
      else {
        val pos = q * (replicated.size - 1).toDouble
        val (lo, hi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
        val expect = if (lo == hi) replicated(lo.toInt)
          else (hi - pos) * replicated(lo.toInt) + (pos - lo) * replicated(hi.toInt)
        assert(est.doubleValue == expect,
          s"weighted != replicated: $est vs $expect (q=$q, W=$wTot)")
      }
    }
  }

  test("string mg buffer: exactness below cap on random words") {
    val wordsGen = for {
      len <- Gen.choose(0, 200)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    } yield ws
    forAll(wordsGen) { ws =>
      val agg = Sketches.SpaceSavingTopKStr(16) // 7 distinct < 16 => exact
      val parts = (0 until 3).map(s =>
        ws.zipWithIndex.collect { case (v, i) if i % 3 == s => v }
          .foldLeft(agg.zero)((b, v) => agg.reduce(b, v)))
      val out = agg.finish(parts.reduceLeft(agg.merge))
      val truth = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(out.length == truth.size)
      out.foreach { h =>
        assert(h.err == 0L && h.cnt == truth(h.key))
      }
    }
  }
}
