package graft

import org.apache.spark.sql.functions._

import graft.operators.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Long] =
    Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b", vertices.toDF("v"), "v")
      .as[(Long, Long)].collect().toMap

  test("clique, path, and singleton resolve to min-id components") {
    val edges = Seq((10L, 11L), (11L, 12L), (10L, 12L), // clique
      (1L, 2L), (2L, 3L)) // path
    val got = cc(edges, Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("a 30-vertex chain converges (propagation spans the diameter)") {
    val n = 30L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = cc(edges, 0L until n)
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("a 300-vertex chain converges well inside maxIter (pointer jump)") {
    // diameter 299 >> maxIter 60: plain min-label propagation would
    // silently return unmerged labels here; the label-of-label jump
    // roughly doubles covered distance per round (~10 rounds)
    val n = 300L
    val edges = (0L until n - 1).map(i => (i, i + 1))
    val got = cc(edges, 0L until n)
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("non-convergence within maxIter fails loudly, never partial labels") {
    val edges = (0L until 29L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] {
      Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b",
        (0L until 30L).toDF("v"), "v", maxIter = 2)
        .collect()
    }
  }

  test("edge endpoints missing from the vertex set do not crash the loop") {
    // vertices drives the universe; an edge to an unknown vertex can
    // still propagate its label without producing a row for it
    val got = cc(Seq((5L, 6L)), Seq(5L))
    assert(got == Map(5L -> 5L))
  }
}
