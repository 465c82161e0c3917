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
