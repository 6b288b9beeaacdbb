package graft

import graft.operators.Leaves

class LeavesSpec extends SparkSpec {
  import spark.implicits._

  test("leaves flattens nested objects and arrays with dotted paths") {
    val json = """{"a": 1, "b": {"c": "x", "d": [10, 20]}, "e": null}"""
    assert(Leaves.leaves(json).toSet == Set(
      "a" -> "1", "b.c" -> "x", "b.d.0" -> "10", "b.d.1" -> "20"))
  }

  test("leaves tolerates malformed and null input") {
    assert(Leaves.leaves("{not json").isEmpty)
    assert(Leaves.leaves(null).isEmpty)
  }

  test("explodeLeaves generates one row per scalar leaf") {
    val df = Seq(
      (1L, """{"k": 69}"""),
      (2L, """{"a": {"b": true}, "c": [1]}""")).toDF("id", "js")
    val out = Leaves.explodeLeaves(df, "id", "js")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, "k", "69"), (2L, "a.b", "true"), (2L, "c.0", "1")))
  }
}
