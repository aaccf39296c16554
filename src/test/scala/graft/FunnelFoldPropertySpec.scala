package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingFunnel.{foldSorted, FEvent, FState}

/** Property pin for the claim BOTH funnel forms rest on (the batch
  * scaladoc's "regardless of how ties order" and the streaming twin's
  * segmented replay): for ANY ts-nondecreasing processing order, the fold
  * computes exactly the declarative min-after-min funnel, and folding a
  * strict-watermark-cut segmentation in sequence equals folding the whole
  * sorted list. Seeded-random cases with dense tie collisions. */
class FunnelFoldPropertySpec extends AnyFunSuite {

  private val Types = Vector("view", "click", "purchase", "scroll", "hover")

  private def fold(evs: Seq[FEvent]): (Long, Long, Long) = {
    val st = foldSorted(FState(Nil, -1L, -1L, -1L, 0L), evs)
    (st.t1, st.t2, st.t3)
  }

  /** The declarative reference: first view; first click strictly after it;
    * first purchase strictly after that. −1 = unset (0 is a legitimate
    * epoch-0 timestamp, and the domain below includes it). */
  private def minAfterMin(evs: Seq[FEvent]): (Long, Long, Long) = {
    val t1 = evs.filter(_.et == "view").map(_.tsUs).minOption.getOrElse(-1L)
    val t2 =
      if (t1 < 0L) -1L
      else evs.filter(e => e.et == "click" && e.tsUs > t1).map(_.tsUs)
        .minOption.getOrElse(-1L)
    val t3 =
      if (t2 < 0L) -1L
      else evs.filter(e => e.et == "purchase" && e.tsUs > t2).map(_.tsUs)
        .minOption.getOrElse(-1L)
    (t1, t2, t3)
  }

  test("fold over any ts-sorted tie order = min-after-min; segmented watermark replay = whole fold") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(20)
      // timestamps from a TINY domain so ties are the norm, not the corner
      val evs = Vector.fill(n)(FEvent(rnd.nextInt(7).toLong, Types(rnd.nextInt(Types.size))))
      val expected = minAfterMin(evs)

      // any ts-nondecreasing order: shuffle, then stable-sort by ts ONLY
      // (tie order = shuffle order, uniformly random across rounds)
      for (_ <- 1 to 5) {
        val order = rnd.shuffle(evs).sortBy(_.tsUs) // stable ⇒ ties keep shuffle order
        val st = order.foldLeft(FState(Nil, -1L, -1L, -1L, 0L)) { (s, e) =>
          val (a, b, c) = graft.streaming.StreamingFunnel.step(s.t1, s.t2, s.t3, e)
          s.copy(t1 = a, t2 = b, t3 = c)
        }
        assert((st.t1, st.t2, st.t3) == expected,
          s"case $case_: order-dependent fold for $order")
      }

      // segmented replay: strict cuts at every possible watermark value —
      // fold each finalized slice in sequence (what the streaming twin does
      // across triggers), ties never straddle a strict cut
      val cuts = rnd.shuffle((2L to 7L).toVector).take(1 + rnd.nextInt(5)).sorted
      var st = FState(Nil, -1L, -1L, -1L, 0L)
      var remaining = evs
      for (w <- cuts) {
        val (fin, keep) = remaining.partition(_.tsUs < w)
        st = foldSorted(st, fin)
        remaining = keep
      }
      st = foldSorted(st, remaining)
      assert((st.t1, st.t2, st.t3) == expected,
        s"case $case_: segmented fold diverged at cuts $cuts for $evs")
    }
    // a deterministic spot case: the classic tie trap (view/click same ts)
    assert(fold(Seq(FEvent(5, "view"), FEvent(5, "click"))) == ((5L, -1L, -1L)))
    assert(fold(Seq(FEvent(5, "view"), FEvent(6, "click"), FEvent(6, "purchase")))
      == ((5L, 6L, -1L)))
    // epoch-0 events are real timestamps, not the unset sentinel
    assert(fold(Seq(FEvent(0, "view"), FEvent(1, "click"))) == ((0L, 1L, -1L)))
  }
}
