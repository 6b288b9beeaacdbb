package graft

class JxJsonSpec extends SparkSpec {
  import spark.implicits._

  test("where + groupby + aggregate + sort compile and execute") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders",
          "where": {"eq": ["o_orderstatus", {"literal": "O"}]},
          "groupby": ["o_orderpriority"],
          "select": [{"name": "n", "aggregate": "count"}],
          "sort": "o_orderpriority"}""")
    val rows = out.as[(String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    assert(rows.forall(_._2 > 0))
  }

  test("plain select with computed expression and limit") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "customer",
          "select": ["c_custkey",
            {"name": "double_bal", "value": {"mult": ["c_acctbal", {"literal": 2}]}}],
          "sort": "c_custkey", "limit": 5}""")
    assert(out.columns.toSeq == Seq("c_custkey", "double_bal"))
    assert(out.count() == 5)
  }

  test("missing/exists/in/prefix/coalesce ops compile") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders",
          "where": {"and": [
            {"exists": "o_orderkey"},
            {"in": ["o_orderstatus", ["O", "F"]]},
            {"not": {"prefix": ["o_orderpriority", {"literal": "5"}]}}]},
          "select": ["o_orderkey"], "sort": "o_orderkey", "limit": 10}""")
    assert(out.count() == 10)
  }

  test("jx missing-tolerant ops match SQL semantics (SURVEY §1.4)") {
    // eq against a value is plain SQL eq; missing is isNull
    val n = JxJson.run(spark, sf0001,
      """{"from": "orders", "where": {"missing": "o_orderkey"},
          "select": ["o_orderkey"]}""").count()
    assert(n == 0)
  }
}
