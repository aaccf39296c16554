package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TailFileSource.{boundedLineBoundary, lastLineBoundary}

/** Property pin for the admission-control scan the capped tail drain rests
  * on ([[graft.sources.TailFileSource.boundedLineBoundary]]): over random
  * files (random line lengths incl. empty lines, with and without a trailing
  * partial line) and random byte budgets, every poll is line-aligned and
  * within budget (except the documented oversized-first-line progress
  * guarantee), and the iterated drain reaches exactly the uncapped tail
  * position without ever splitting or skipping a line. */
class BoundedDrainPropertySpec extends AnyFunSuite {

  test("capped polls are line-aligned, within budget, and drain to the uncapped tail") {
    val rnd = new scala.util.Random(20260814L)
    for (case_ <- 1 to 300) {
      val nLines = rnd.nextInt(12)
      val body = (0 until nLines).map(i =>
        ("x" * rnd.nextInt(30)) + "\n").mkString +
        (if (rnd.nextBoolean()) "partial-no-newline" else "")
      val f = Files.createTempFile(s"graft-drain-$case_", ".log")
      try {
        Files.write(f, body.getBytes)
        val bytes = body.getBytes
        val boundaries = // every legal line boundary: 0 and each byte after '\n'
          0L +: bytes.zipWithIndex.collect { case (b, i) if b == '\n' => (i + 1).toLong }.toSeq
        val tail = lastLineBoundary(f.toString, 0L) // the uncapped drain target
        assert(tail == boundaries.last, s"case $case_: uncapped tail is the last boundary")

        val cap = 1L + rnd.nextInt(40)
        var from = 0L
        var steps = 0
        while (steps < 1000 && {
          val next = boundedLineBoundary(f.toString, from, cap)
          assert(boundaries.contains(next),
            s"case $case_: poll landed mid-line at $next (boundaries $boundaries)")
          assert(next >= from, s"case $case_: poll regressed $from -> $next")
          if (next > from) {
            val firstLineEnd = boundaries.find(_ > from).get
            assert(next - from <= cap || next == firstLineEnd,
              s"case $case_: $from -> $next exceeds cap $cap beyond the oversized first line")
            from = next; true
          } else false
        }) steps += 1

        assert(from == tail,
          s"case $case_: drain stalled at $from before the tail $tail (cap $cap)")
        // a fully-drained position polls to itself (idempotent at the tail)
        assert(boundedLineBoundary(f.toString, tail, cap) == tail)
        // and an unbounded budget is exactly lastLineBoundary
        assert(boundedLineBoundary(f.toString, 0L, Long.MaxValue) == tail)
      } finally Files.delete(f)
    }
  }

  /** Property pin for the CHUNKED range reader (the scan every delivered
    * line passes through): over random content (multibyte UTF-8, empty
    * lines, partial trailers), random [start, end) sub-ranges on line
    * boundaries, and chunk sizes down to 1 byte, the streamed output is
    * byte-identical to the trivial whole-buffer split — lines spanning
    * refills reassemble exactly, seq = absolute line-start offsets. */
  test("chunked range reader equals the trivial split over random content, ranges, chunk sizes") {
    import graft.sources.{TailRange, TailRangeReader}
    val palette = Seq("x", "yz", "é", "日", "")
    val rnd = new scala.util.Random(20260815L)
    for (case_ <- 1 to 300) {
      val nLines = rnd.nextInt(10)
      val body = (0 until nLines).map(_ =>
        (0 until rnd.nextInt(8)).map(_ =>
          palette(rnd.nextInt(palette.size))).mkString + "\n").mkString +
        (if (rnd.nextBoolean()) "partial-é" else "")
      val bytes = body.getBytes("UTF-8")
      val f = Files.createTempFile(s"graft-reader-$case_", ".log")
      try {
        Files.write(f, bytes)
        val boundaries =
          0L +: bytes.zipWithIndex.collect { case (b, i) if b == '\n' => (i + 1).toLong }.toSeq
        val start = boundaries(rnd.nextInt(boundaries.size))
        val end = // a later boundary, or (archive form) the raw file end
          if (rnd.nextBoolean()) bytes.length.toLong
          else boundaries.filter(_ >= start).maxBy(_ => rnd.nextInt(1000))
        val emitTrailing = rnd.nextBoolean()
        val epoch = rnd.nextInt(4).toLong
        // the trivial split of bytes[start, end) at '\n'
        val expected = {
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
          var ls = start.toInt
          var i = start.toInt
          while (i < end) {
            if (bytes(i) == '\n') {
              out += (((epoch << 44) | ls, new String(bytes, ls, i - ls, "UTF-8")))
              ls = i + 1
            }
            i += 1
          }
          if (emitTrailing && ls < end)
            out += (((epoch << 44) | ls, new String(bytes, ls, end.toInt - ls, "UTF-8")))
          out.toSeq
        }
        val chunk = 1 + rnd.nextInt(24)
        val r = new TailRangeReader(
          TailRange(f.toString, epoch, start, end, emitTrailing), chunk)
        val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        while (r.next()) {
          val row = r.get()
          got += ((row.getLong(0), row.getUTF8String(1).toString))
        }
        r.close()
        assert(got.toSeq == expected,
          s"case $case_ (start=$start end=$end chunk=$chunk trailing=$emitTrailing):\n" +
            s"got $got\nexpected $expected")
      } finally Files.delete(f)
    }
  }
}
