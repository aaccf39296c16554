package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Direct tests of the large-star/small-star connected-components core
  * ([[Dedup.componentsOf]]) on adversarial graph SHAPES the operator-level
  * specs (clique-like near-dup corpora) never produce:
  *
  *   - a deep PATH — worst case for round count (propagation must cross the
  *     whole diameter; plain neighbor-min label propagation would need one
  *     round per hop);
  *   - a giant-fan STAR — the exact shape whose fixpoint was a single
  *     O(|component|) collect_set row under the previous Hash-to-Min loop
  *     (the round-4 ADVICE skew finding); under the edge-list formulation it
  *     is just many O(1) rows;
  *   - messy inputs (reversed duplicates, self-loops, disjoint components,
  *     singletons).
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val idsDf: DataFrame = ids.toDF("id")
    val pairsDf: DataFrame = pairs.toDF("a", "b")
    Dedup.componentsOf(idsDf, pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("deep path: a 2048-node chain labels every node with the path minimum") {
    val n = 2048L
    val ids = (0L until n)
    val pairs = (0L until n - 1).map(i => (i, i + 1))
    val labels = cc(ids, pairs)
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "every chain node must reach the minimum")
  }

  test("giant-fan star: 50k leaves on one hub — the old Hash-to-Min hotspot shape") {
    // hub 0 with 50_000 leaves; edge-list state keeps every row O(1), so
    // this converges without any component-sized row materializing
    val n = 50000L
    val ids = (0L to n)
    val pairs = (1L to n).map(i => (i, 0L))
    val labels = cc(ids, pairs)
    assert(labels.size == n + 1)
    assert(labels.values.forall(_ == 0L))
  }

  test("messy input: reversed duplicates, self-loops, disjoint components, singletons") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L)
    val pairs = Seq(
      (2L, 1L), (1L, 2L), (2L, 2L), // dup both ways + self-loop
      (3L, 2L), // chain onto {1,2}
      (5L, 4L), (4L, 5L), // second component
      (9L, 9L)) // self-loop only => singleton
    val labels = cc(ids, pairs)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L, 9L -> 9L))
  }

  test("two interleaved components partition independently of id order") {
    // odd ids form one path, even ids another — labels must not leak across
    val ids = (0L until 40L)
    val pairs = (0L until 38L).map(i => (i, i + 2)) // connects same-parity ids
    val labels = cc(ids, pairs)
    (0L until 40L).foreach { i =>
      assert(labels(i) == i % 2, s"node $i labeled ${labels(i)}")
    }
  }

  test("empty pair list: every id is its own singleton component") {
    val labels = cc(Seq(10L, 20L, 30L), Seq.empty)
    assert(labels == Map(10L -> 10L, 20L -> 20L, 30L -> 30L))
  }
}
