package graft

import org.apache.spark.sql.functions._
import graft.queries.Graph

/** PageRank semantics pinned on graphs small enough to verify by hand —
  * the declared query's oracle proves cross-engine agreement; this spec
  * proves the MATH (mass conservation, symmetry, convergence target)
  * independent of the fixture. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pagerank conserves mass and respects symmetry on a path graph") {
    // path a-b-c, symmetrized: a<->b, b<->c
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val r = Graph.pagerank(edges, 3).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-12, s"mass not conserved: $r")
    assert(math.abs(r(1L) - r(3L)) < 1e-12, "endpoints must tie by symmetry")
    assert(r(2L) > r(1L), "the center of a path outranks the endpoints")
    // hand-computed: r0 = 1/3 each; endpoints send 1/3 (deg 1), center
    // sends 1/6 each way. r1(end) = 0.05 + 0.85/6, r1(center) = 0.05
    // + 0.85*2/3 ... iterate twice more:
    var end = 1.0 / 3; var mid = 1.0 / 3
    for (_ <- 1 to 3) {
      val e2 = 0.15 / 3 + 0.85 * (mid / 2)
      val m2 = 0.15 / 3 + 0.85 * (end + end)
      end = e2; mid = m2
    }
    assert(math.abs(r(1L) - end) < 1e-12, s"endpoint rank ${r(1L)} != $end")
    assert(math.abs(r(2L) - mid) < 1e-12, s"center rank ${r(2L)} != $mid")
  }

  test("pagerank on a k-regular graph is uniform at every iteration") {
    // 4-cycle: every node has degree 2 — ranks must stay exactly 1/4
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L),
      (2L, 3L), (3L, 2L), (3L, 0L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.pagerank(edges, 4).collect()
    r.foreach(row => assert(math.abs(row.getDouble(1) - 0.25) < 1e-12,
      s"regular graph must stay uniform: ${row}"))
  }

  test("disjoint copies rank identically (the ScaleBench invariant)") {
    // the ×mult probe's premise: id-offset copies do not interact
    val base = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val two = base ++ base.map { case (a, b) => (a + 100, b + 100) }
    val r = Graph.pagerank(two.toDF("src", "dst"), 3).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    base.flatMap(e => Seq(e._1, e._2)).distinct.foreach { n =>
      assert(math.abs(r(n) - r(n + 100)) < 1e-12, s"copy asymmetry at node $n")
    }
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }
}
