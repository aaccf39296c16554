package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingRetention.{advance, RState}

/** Property pin for the streaming retention's pure state transition:
  * under ANY monotone watermark schedule and legal delivery order, the
  * union of emitted cells equals the batch definition — `(hour(min ts),
  * hours(active hour − cohort))` per distinct active hour, exactly once —
  * which rests on the cohort being final as soon as ANY event finalizes. */
class RetentionPropertySpec extends AnyFunSuite {

  private val HourUs = 3600L * 1000000L

  test("segmented advance ≡ batch cohort/age cells, exactly once, under random cuts") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(24)
      val evs = List.fill(n)((rnd.nextInt(96).toLong * HourUs) / 4) // 24h span, ties common
      val cohort = evs.min / HourUs * HourUs
      val want = evs.map(us => (us / HourUs * HourUs - cohort) / HourUs).distinct.sorted

      val cuts = Vector.fill(1 + rnd.nextInt(6))(
        (rnd.nextInt(120).toLong * HourUs) / 4).sorted.distinct
      var st = RState(Nil, -1L, Nil, 0L) // −1 = cohort unset
      var wm = 0L
      var undelivered = rnd.shuffle(evs)
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (c <- cuts) {
        val (due, rest) = undelivered.partition(_ < c)
        assert(due.forall(_ >= wm), "schedule bug: late event")
        val (outs, next) = advance(7L, st, due, c)
        outs.foreach(o => emitted += ((o.cohort_hour.getTime, o.age)))
        st = next; wm = c; undelivered = rest
      }
      val (outs, _) = advance(7L, st, undelivered, Long.MaxValue)
      outs.foreach(o => emitted += ((o.cohort_hour.getTime, o.age)))

      assert(emitted.distinct.size == emitted.size, s"case $case_: a cell emitted twice")
      assert(emitted.map(_._1).distinct.size == 1 &&
        emitted.head._1 == cohort / 1000L, s"case $case_: cohort drifted")
      assert(emitted.map(_._2).sorted == want,
        s"case $case_ (cuts $cuts): got ${emitted.map(_._2).sorted} want $want")
    }
  }
}
