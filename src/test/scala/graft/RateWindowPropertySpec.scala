package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingRateWindow.{advance, REvent, RWOut, RWState}

/** Property pin for the streaming rate window's pure state transition:
  * under ANY monotone watermark schedule and any legal delivery order
  * (events arrive before the watermark passes them), the union of
  * emissions equals the batch RANGE-frame definition — exactly once per
  * event — despite the buffer pruning to `wm − 1h` between steps. Seeded
  * random cases with timestamps packed inside a few hours so frames
  * overlap, collide, and straddle cut boundaries. */
class RateWindowPropertySpec extends AnyFunSuite {

  private val HourUs = 3600L * 1000000L

  test("segmented advance ≡ batch trailing-hour frames, exactly once, under random cuts") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(24)
      // timestamps inside a 4-hour span, microsecond-quantized to a coarse
      // grid so exact ties and exact 1h-boundary hits both occur
      val evs = (1 to n).map { id =>
        REvent(id.toLong, (rnd.nextInt(48).toLong * HourUs) / 12, rnd.nextInt(1000).toLong)
      }.toList
      // batch definition: frame = same-user events in [ts-1h, ts], inclusive
      def batchOf(e: REvent): (Long, Double) = {
        val f = evs.filter(m => m.tsUs >= e.tsUs - HourUs && m.tsUs <= e.tsUs)
        (f.size.toLong, f.map(_.cents).sum.toDouble / 100.0)
      }

      // random monotone cut schedule over the span (plus the final flush)
      val cuts = Vector.fill(1 + rnd.nextInt(6))(
        (rnd.nextInt(60).toLong * HourUs) / 12).sorted.distinct
      var st = RWState(Nil, Long.MinValue, Long.MinValue) // the twin's initial state
      var wm = 0L
      var undelivered = rnd.shuffle(evs)
      val emitted = scala.collection.mutable.ArrayBuffer.empty[RWOut]
      for (c <- cuts) {
        // deliver (in arrival order) every event the NEXT watermark would
        // make late — each still has ts >= current wm, the legal window
        val (due, rest) = undelivered.partition(_.tsUs < c)
        val legal = due.filter(_.tsUs >= wm)
        assert(legal.size == due.size, "schedule bug: generated a late event")
        val (outs, next) = advance(7L, st, legal, c)
        emitted ++= outs; st = next; wm = c
        undelivered = rest
      }
      val (outs, _) = advance(7L, st, undelivered.filter(_.tsUs >= wm), Long.MaxValue)
      emitted ++= outs

      assert(emitted.map(_.event_id).distinct.size == emitted.size,
        s"case $case_: an event emitted twice")
      val got = emitted.map(o => o.event_id -> ((o.n_last_hour, o.value_last_hour))).toMap
      val want = evs.map(e => e.eventId -> batchOf(e)).toMap
      assert(got == want,
        s"case $case_ (cuts $cuts): got ${got.toSeq.sortBy(_._1).take(4)} " +
          s"want ${want.toSeq.sortBy(_._1).take(4)}")
    }
  }
}
