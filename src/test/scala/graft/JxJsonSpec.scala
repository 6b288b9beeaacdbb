package graft

import graft.sources.Catalog

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

  test("streaming front door equals the declared stream_tumbling twin") {
    val jx = SparkEntry.queries("jx_json_stream")(spark, sf0001)
      .collect().map(r => (r.getTimestamp(1), r.getLong(0))).toSeq
    val direct = SparkEntry.queries("stream_tumbling")(spark, sf0001)
      .select("ws", "n")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    assert(jx.toMap == direct.toMap, s"jx=${jx.size} direct=${direct.size}")
    assert(jx.nonEmpty)
  }

  test("streaming front door refuses unbounded or non-incremental bodies") {
    // no watermark -> unbounded aggregate state: refused at compile
    val e1 = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "events:stream",
          "groupby": [{"name": "ws", "value": "ts", "window": "1 hour"}],
          "select": [{"name": "n", "aggregate": "count"}]}"""))
    assert(e1.getMessage.contains("watermark"), e1.getMessage)
    // batch-only clause over a stream: refused, not silently batch-run
    val e2 = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "events:stream",
          "watermark": {"on": "ts", "delay": "2 hours"},
          "sample": {"rate": 0.5, "on": "event_id"},
          "groupby": [{"name": "ws", "value": "ts", "window": "1 hour"}],
          "select": [{"name": "n", "aggregate": "count"}]}"""))
    assert(e2.getMessage.contains("not supported over a stream"), e2.getMessage)
    // only the events table has an event-time column to stream on
    val e3 = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "orders:stream",
          "watermark": {"on": "ts", "delay": "2 hours"},
          "groupby": [{"name": "ws", "value": "ts", "window": "1 hour"}],
          "select": [{"name": "n", "aggregate": "count"}]}"""))
    assert(e3.getMessage.contains("events"), e3.getMessage)
  }

  test("fused percentiles with duplicate output names resolve by (name, fraction)") {
    // Two exact percentiles over the same column declaring the SAME
    // output name fuse into one array-form percentile(); the
    // post-projection must key slots by (name, fraction), not name
    // alone — each declared column gets its OWN fraction's value,
    // never the first name match's.
    val out = JxJson.run(spark, sf0001,
      """{"from": "lineitem",
          "select": [
            {"name": "p", "aggregate": "percentile", "value": "l_quantity", "percentile": 0.25},
            {"name": "p", "aggregate": "percentile", "value": "l_quantity", "percentile": 0.75}]}""")
    assert(out.columns.toSeq == Seq("p", "p"))
    val row = out.collect().head
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("percentile(l_quantity, 0.25) AS lo",
                  "percentile(l_quantity, 0.75) AS hi")
      .collect().head
    assert(row.getDouble(0) == direct.getDouble(0), "first slot must be the 0.25 fraction")
    assert(row.getDouble(1) == direct.getDouble(1), "second slot must be the 0.75 fraction")
    assert(direct.getDouble(0) != direct.getDouble(1), "fixture must separate the fractions")
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

  test("edges with set domain: dense zero part + NULL overflow part") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "customer",
          "edges": [{"name": "seg", "value": "c_mktsegment",
            "domain": {"type": "set",
              "partitions": ["AUTOMOBILE", "BUILDING", "AEROSPACE"]}}],
          "select": [{"name": "n", "aggregate": "count"}]}""")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    // Every domain part present, even AEROSPACE with zero rows.
    assert(out.keySet.contains(Some("AEROSPACE")))
    assert(out(Some("AEROSPACE")) == 0L)
    assert(out(Some("AUTOMOBILE")) > 0L)
    // Segments outside the domain roll into the NULL overflow part.
    assert(out.getOrElse(None, 0L) > 0L)
  }

  test("edges with range domain: dense numeric buckets, zero-filled") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "customer",
          "edges": [{"name": "lo", "value": "c_acctbal",
            "domain": {"type": "range", "min": -1000, "max": 10000,
                       "interval": 1000}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "sort": "lo"}""")
    val rows = out.collect()
    // 11 dense buckets regardless of which have data.
    assert(rows.count(r => !r.isNullAt(0)) == 11)
    val total = rows.map(_.getLong(1)).sum
    val nCust = Catalog.table(spark, sf0001, "customer").count()
    assert(total == nCust)
  }

  test("edges default domain = distinct values in the data") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders", "edges": ["o_orderstatus"],
          "select": [{"name": "n", "aggregate": "count"}]}""")
    val expected = Catalog.table(spark, sf0001, "orders")
      .select("o_orderstatus").distinct().count()
    assert(out.count() == expected)
  }

  test("window clause: rownum per partition, selectable by name") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders",
          "window": [{"name": "rn", "aggregate": "rownum",
            "edges": ["o_custkey"],
            "sort": ["o_orderdate", "o_orderkey"]}],
          "select": ["o_custkey", "o_orderkey", "rn"],
          "sort": ["o_custkey", "rn"], "limit": 50}""")
    val rows = out.as[(Long, Long, Long)].collect()
    assert(rows.length == 50)
    // rn restarts at 1 for each customer and increments within.
    rows.groupBy(_._1).values.foreach { grp =>
      assert(grp.map(_._3).sorted.toSeq == (1L to grp.length).toSeq)
    }
  }

  test("scalar ops: string/math/conditional compile and evaluate") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "customer",
          "select": ["c_custkey",
            {"name": "l", "value": {"length": "c_name"}},
            {"name": "u", "value": {"uppercase": {"left": ["c_mktsegment", 3]}}},
            {"name": "n", "value": {"number": {"string": "c_custkey"}}},
            {"name": "sgn", "value": {"when": {"lt": ["c_acctbal", {"literal": 0}]},
                                      "then": {"literal": -1}, "else": {"literal": 1}}}],
          "sort": "c_custkey", "limit": 10}""")
    val rows = out.as[(Long, Int, String, Double, Long)].collect()
    assert(rows.length == 10)
    assert(rows.forall(_._2 > 0))
    assert(rows.forall(r => r._3 == r._3.toUpperCase && r._3.length == 3))
    assert(rows.forall(r => r._4 == r._1.toDouble))
    assert(rows.forall(r => r._5 == 1L || r._5 == -1L))
  }

  test("number op is tolerant: unparseable strings become null, not errors") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "customer",
          "select": [{"name": "x", "value": {"number": "c_mktsegment"}}],
          "limit": 5}""")
    assert(out.collect().forall(_.isNullAt(0)))
  }

  test("cube format: dense per-domain arrays + overflow") {
    val cube = JxJson.runCube(spark, sf0001,
      """{"from": "customer",
          "edges": [{"name": "seg", "value": "c_mktsegment",
            "domain": {"type": "set",
              "partitions": ["AUTOMOBILE", "BUILDING", "AEROSPACE"]}}],
          "select": [{"name": "n", "aggregate": "count"}]}""")
    assert(cube.edgeNames == Seq("seg"))
    assert(cube.domains.head.toSet == Set("AUTOMOBILE", "BUILDING", "AEROSPACE"))
    val n = cube.data("n")
    // 3 domain parts + the trailing NULL part (out-of-domain segments
    // exist in the fixture, so the axis carries its overflow slot).
    assert(cube.hasNullPart == Seq(true))
    assert(n.length == 4)
    // Dense: AEROSPACE present with count 0.
    val bySeg = cube.domains.head.zip(n).toMap
    assert(bySeg("AEROSPACE") == 0L)
    assert(bySeg("AUTOMOBILE").asInstanceOf[Long] > 0L)
    // Out-of-domain segments land in the NULL part / overflow corner.
    assert(n.last.asInstanceOf[Long] > 0L)
    assert(cube.overflow("n") == n.last)
  }

  test("cube format: per-edge overflow — a row can overflow one edge and hit a part on another") {
    val cube = JxJson.runCube(spark, sf0001,
      """{"from": "customer",
          "edges": [
            {"name": "seg", "value": "c_mktsegment",
             "domain": {"type": "set", "partitions": ["AUTOMOBILE", "BUILDING"]}},
            {"name": "nat", "value": "c_nationkey"}],
          "select": [{"name": "n", "aggregate": "count"}]}""")
    // Edge 0 overflows (3 segments outside the set); edge 1 is a
    // default domain covering all data — no NULL part.
    assert(cube.hasNullPart == Seq(true, false))
    val grid = cube.data("n").map(_.asInstanceOf[Seq[Any]])
    assert(grid.length == cube.domains(0).size + 1)
    assert(grid.forall(_.length == cube.domains(1).size))
    // The NULL-part row of edge 0 still distributes over edge 1's real
    // parts — per-edge overflow, not one lumped cell.
    val nullRow = grid.last.map(v => if (v == null) 0L else v.asInstanceOf[Long])
    assert(nullRow.count(_ > 0L) > 1, "overflow must spread across nations")
    // Full grid total = all customers (every row lands somewhere).
    val total = grid.flatten.map(v => if (v == null) 0L else v.asInstanceOf[Long]).sum
    assert(total == Catalog.table(spark, sf0001, "customer").count())
  }

  test("cube format: two edges nest in declared order") {
    val cube = JxJson.runCube(spark, sf0001,
      """{"from": "orders",
          "edges": ["o_orderstatus", "o_orderpriority"],
          "select": [{"name": "n", "aggregate": "count"}]}""")
    assert(cube.edgeNames == Seq("o_orderstatus", "o_orderpriority"))
    val grid = cube.data("n")
    assert(grid.length == cube.domains(0).size)
    grid.foreach { row =>
      assert(row.asInstanceOf[Seq[Any]].length == cube.domains(1).size)
    }
    // Total over the grid = total rows (default domains cover all data).
    val total = grid.flatMap(_.asInstanceOf[Seq[Any]])
      .map(v => if (v == null) 0L else v.asInstanceOf[Long]).sum
    assert(total == Catalog.table(spark, sf0001, "orders").count())
  }

  test("dotted from descends into the nested child table") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders_nested.lines",
          "groupby": ["o_orderpriority"],
          "select": [{"name": "n_lines", "aggregate": "count"}],
          "sort": "o_orderpriority"}""")
    val rows = out.as[(String, Long)].collect()
    // Descent = the flat parent/child join, row for row.
    val expect = Catalog.table(spark, sf0001, "orders")
      .join(Catalog.table(spark, sf0001, "lineitem"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == expect.toSeq)
  }

  test("descent errors loudly when a child field shadows a parent column") {
    // Silent shadowing = a data-shape change the caller never asked for.
    val df = Seq((1L, "parent", Seq(("childval", 2.0))))
      .toDF("id", "name", "kids")
      .selectExpr("id", "name",
        "transform(kids, k -> named_struct('name', k._1, 'w', k._2)) AS kids")
    val e = intercept[RuntimeException] { JxJson.descendInto(df, "kids") }
    assert(e.getMessage.contains("collide"))
    assert(e.getMessage.contains("name"))
  }

  test("descent survives a real column named _jx_row (collision-proof alias)") {
    val df = Seq((1L, "keepme", Seq((10L, 2.0)), "shadow-bait"))
      .toDF("id", "_jx_row", "kids", "extra")
      .selectExpr("id", "_jx_row", "extra",
        "transform(kids, k -> named_struct('ck', k._1, 'cv', k._2)) AS kids")
    val out = JxJson.descendInto(df, "kids")
    assert(out.columns.sorted.toSeq ==
      Seq("_jx_row", "ck", "cv", "extra", "id"))
    val row = out.collect().head
    assert(row.getAs[String]("_jx_row") == "keepme")
    assert(row.getAs[Long]("ck") == 10L)
  }

  test("dotted from onto a non-nested column fails with a clear error") {
    val e = intercept[RuntimeException] {
      JxJson.run(spark, sf0001, """{"from": "orders.o_totalprice",
        "select": [{"name": "n", "aggregate": "count"}]}""")
    }
    assert(e.getMessage.contains("descent"))
  }

  test("cube guard: a domain product over the cap fails fast, no collect") {
    // Two high-cardinality default-domain edges over lineitem cross
    // ~thousands × ~thousands of parts — exactly the driver-OOM shape
    // the cap exists for. The error must be the guard's, not an OOM.
    val e = intercept[IllegalArgumentException] {
      JxJson.runCube(spark, sf0001,
        """{"from": "lineitem",
            "edges": ["l_partkey", "l_extendedprice"],
            "select": [{"name": "n", "aggregate": "count"}]}""")
    }
    assert(e.getMessage.contains("cap"))
  }

  test("dotted from composes with edges (descend, then dense-domain group)") {
    val cube = JxJson.run(spark, sf0001,
      """{"from": "orders_nested.lines",
          "edges": [{"name": "status", "value": "o_orderstatus",
            "domain": {"type": "set", "partitions": ["F", "O", "Z"]}}],
          "select": [{"name": "n", "aggregate": "count"}],
          "sort": "status"}""")
    val rows = cube.as[(String, Long)].collect()
    // Dense domain: all three declared parts present, Z zero-filled.
    assert(rows.map(_._1).contains("Z"))
    assert(rows.find(_._1 == "Z").get._2 == 0L)
    val lineCount = Catalog.table(spark, sf0001, "lineitem").count()
    assert(rows.filter(r => r._1 == "F" || r._1 == "O").map(_._2).sum <= lineCount)
    assert(rows.map(_._2).sum > 0)
  }

  test("from as a nested query composes into one fused plan") {
    val out = JxJson.run(spark, sf0001,
      """{"from": {"from": "orders", "groupby": ["o_custkey"],
            "select": [{"name": "n", "aggregate": "count"}]},
          "where": {"gte": ["n", {"literal": 3}]},
          "select": [{"name": "n_cust", "aggregate": "count"}]}""")
    val expect = Catalog.table(spark, sf0001, "orders")
      .groupBy("o_custkey").count().filter($"count" >= 3).count()
    assert(out.collect().head.getLong(0) == expect)
    // Composition is a derived table in ONE plan — the inner query's
    // aggregate and the outer's land in the same physical tree.
    val p = out.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 4, p)
  }

  test("window clause: running sum with explicit rows range") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders",
          "window": [{"name": "run_n", "aggregate": "count",
            "edges": ["o_custkey"], "sort": ["o_orderkey"],
            "range": {"max": 0}}],
          "select": ["o_custkey", "o_orderkey", "run_n"],
          "sort": ["o_custkey", "o_orderkey"], "limit": 20}""")
    val rows = out.as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
    }
  }

  test("sample clause is deterministic, rate-accurate, and composes") {
    import org.apache.spark.sql.functions._
    val out = JxJson.run(spark, sf0001,
      """{"from": "orders",
          "sample": {"rate": 0.25, "on": "o_orderkey"},
          "select": ["o_orderkey"], "sort": "o_orderkey"}""")
    val direct = Catalog.table(spark, sf0001, "orders")
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 4) < "4000")
      .select("o_orderkey").orderBy("o_orderkey")
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
    val n = Catalog.table(spark, sf0001, "orders").count()
    val k = out.count()
    assert(math.abs(k.toDouble / n - 0.25) < 0.05, s"rate drifted: $k/$n")
    // a second run keeps EXACTLY the same rows (content-addressed)
    assert(JxJson.run(spark, sf0001,
      """{"from": "orders",
          "sample": {"rate": 0.25, "on": "o_orderkey"},
          "select": ["o_orderkey"], "sort": "o_orderkey"}""")
      .exceptAll(out).isEmpty)
    intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "orders", "sample": {"rate": 0.25}, "select": ["o_orderkey"]}"""))
    // rate 1.0 keeps EVERY row (the clamped-cut edge would silently
    // drop hash prefix "ffff"); rate 0.0 keeps none
    assert(JxJson.run(spark, sf0001,
      """{"from": "orders", "sample": {"rate": 1.0, "on": "o_orderkey"},
          "select": ["o_orderkey"]}""").count() == n)
    assert(JxJson.run(spark, sf0001,
      """{"from": "orders", "sample": {"rate": 0.0, "on": "o_orderkey"},
          "select": ["o_orderkey"]}""").count() == 0)
  }

  test("dedup clause == TextOps.exactDedup through the front door") {
    val out = JxJson.run(spark, sf0001,
      """{"from": "documents",
          "dedup": {"on": [{"fingerprint": "text"}], "sort": "doc_id"},
          "select": ["doc_id",
            {"name": "fp", "value": {"fingerprint": "text"}}],
          "sort": "doc_id"}""")
    val direct = graft.operators.TextOps.exactDedup(
      Catalog.table(spark, sf0001, "documents"), "doc_id", "text")
      .select("doc_id", "fp").orderBy("doc_id")
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
    // dedup without a deterministic keep order is an error, not luck
    intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "documents",
          "dedup": {"on": [{"fingerprint": "text"}]},
          "select": ["doc_id"]}"""))
  }

  test("streaming dedup clause equals batch count-DISTINCT within the horizon") {
    // dedup on (user_id, hour-window) then count per window == exact
    // count(DISTINCT user_id) per window, restricted to windows fully
    // below the final watermark (max ts - delay)
    val jx = SparkEntry.queries("jx_json_stream_dedup")(spark, sf0001)
      .select("ws", "n_users")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    val ev = Catalog.table(spark, sf0001, "events")
    val mx = ev.agg(org.apache.spark.sql.functions.max("ts")).head.getTimestamp(0)
    val batch = ev
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour")("start").as("ws"))
      .agg(org.apache.spark.sql.functions.countDistinct($"user_id").as("n_users"))
      .where($"ws" + org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR") <=
        org.apache.spark.sql.functions.lit(mx) - org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(jx == batch, s"jx=${jx.size} batch=${batch.size}")
    assert(jx.nonEmpty)
  }

  test("batch join clause: semi/anti forms, nested right side, collision refusal") {
    import org.apache.spark.sql.functions.col
    // anti: customers with no orders == DSL-door anti join
    val anti = JxJson.run(spark, sf0001,
      """{
        "from": "customer",
        "join": {"with": "orders",
                 "on": {"left": "c_custkey", "right": "o_custkey"},
                 "type": "anti"},
        "select": ["c_custkey"],
        "sort": "c_custkey"
      }""")
    val cust = Catalog.table(spark, sf0001, "customer")
    val ords = Catalog.table(spark, sf0001, "orders")
    val expected = cust.join(ords, col("c_custkey") === col("o_custkey"),
      "left_anti").select("c_custkey").orderBy("c_custkey")
    assert(anti.collect().toSeq == expected.collect().toSeq)
    // semi keeps only left columns even though orders shares no names
    val semi = JxJson.run(spark, sf0001,
      """{
        "from": "customer",
        "join": {"with": "orders",
                 "on": {"left": "c_custkey", "right": "o_custkey"},
                 "type": "semi"},
        "select": ["c_custkey"], "sort": "c_custkey"}""")
    assert(semi.columns.toSeq == Seq("c_custkey"))
    // a nested query as the right side composes in the same plan
    val nested = JxJson.run(spark, sf0001,
      """{
        "from": "orders",
        "join": {"with": {"from": "customer",
                          "groupby": ["c_custkey"],
                          "select": [{"name": "n_c", "aggregate": "count"}]},
                 "on": {"left": "o_custkey", "right": "c_custkey"}},
        "select": [{"name": "n", "aggregate": "count"}]
      }""")
    assert(nested.head.getLong(0) == ords.join(cust,
      col("o_custkey") === col("c_custkey")).count())
    // cross-side name collision is refused at compile time
    val e = intercept[IllegalArgumentException](JxJson.run(spark, sf0001,
      """{
        "from": "customer",
        "join": {"with": "customer",
                 "on": {"left": "c_custkey", "right": "c_custkey"}},
        "select": ["c_custkey"]}"""))
    assert(e.getMessage.contains("disjoint"), e.getMessage)
  }

  test("streaming dedup plans the watermark-evicted dedup node") {
    // ADVICE r12: keying a plain dropDuplicates on window(ts)('start')
    // via an alias strips Spark's event-time metadata, so its state is
    // NEVER evicted — results stay correct but state grows without
    // bound on a long-running stream. The front door must compile the
    // dedup clause onto DeduplicateWithinWatermark, whose state is
    // evicted when the watermark passes first-seen event time + delay
    // BY CONSTRUCTION (no metadata-carrying key needed), and must NOT
    // leave a metadata-free plain Deduplicate in the plan.
    import org.apache.spark.sql.catalyst.plans.logical.{
      Deduplicate, DeduplicateWithinWatermark}
    val agg = JxJson.compileStreaming(spark, sf0001,
      org.json4s.jackson.JsonMethods.parse(
        """{
          "from": "events:stream",
          "watermark": {"on": "ts", "delay": "2 hours"},
          "dedup": ["user_id", {"name": "wb", "value": "ts",
                                "window": "1 hour"}],
          "groupby": [{"name": "ws", "value": "ts", "window": "1 hour"}],
          "select": [{"name": "n_users", "aggregate": "count"}]
        }"""))
    val analyzed = agg.queryExecution.analyzed
    val within = analyzed.collect { case d: DeduplicateWithinWatermark => d }
    assert(within.size == 1,
      s"expected one DeduplicateWithinWatermark node:\n$analyzed")
    val unbounded = analyzed.collect {
      case d: Deduplicate
          if !d.keys.exists(_.metadata.contains("spark.watermarkDelayMs")) => d
    }
    assert(unbounded.isEmpty,
      s"metadata-free plain Deduplicate would never evict state:\n$analyzed")
  }

  test("streaming dedup rejects malformed entries loudly") {
    // a window entry missing its duration must error at compile, not
    // silently key on nothing
    val e = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "events:stream",
          "watermark": {"on": "ts", "delay": "2 hours"},
          "dedup": ["user_id", {"name": "wb", "value": "ts"}],
          "groupby": [{"name": "ws", "value": "ts", "window": "1 hour"}],
          "select": [{"name": "n", "aggregate": "count"}]}"""))
    assert(e.getMessage.contains("window"), e.getMessage)
    val e2 = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "events:stream",
          "watermark": {"on": "ts", "delay": "2 hours"},
          "dedup": [42],
          "groupby": [{"name": "ws", "value": "ts", "window": "1 hour"}],
          "select": [{"name": "n", "aggregate": "count"}]}"""))
    assert(e2.getMessage.contains("dedup entry"), e2.getMessage)
  }

  test("streaming groupby rejects unconsumed entries (typo'd window key)") {
    // an object entry whose key is misspelled ("windw") must error, not
    // silently vanish from the grouping — the fail-loudly contract the
    // batch path already enforces
    val e = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "events:stream",
          "watermark": {"on": "ts", "delay": "2 hours"},
          "groupby": [
            {"name": "ws", "value": "ts", "window": "1 hour"},
            {"name": "oops", "value": "ts", "windw": "1 hour"}],
          "select": [{"name": "n", "aggregate": "count"}]}"""))
    assert(e.getMessage.contains("unrecognized streaming groupby"), e.getMessage)
  }

  test("web:archives bound is the documented constant, overridable, never silent") {
    // default slice == an explicit archive_docs at the documented
    // constant (each archive holds several pages, so compare slices,
    // not doc counts)
    def pages(json: String): Long =
      JxJson.run(spark, sf0001, json).collect()(0).getLong(0)
    val dflt = pages(
      """{"from": "web:archives",
          "select": [{"name": "n_pages", "aggregate": "count"}]}""")
    val explicit = pages(
      s"""{"from": "web:archives",
          "archive_docs": ${JxJson.WebArchiveFixtureDocs},
          "select": [{"name": "n_pages", "aggregate": "count"}]}""")
    assert(dflt == explicit && dflt > 0)
    // explicit archive_docs narrows the slice
    val narrow = pages(
      """{"from": "web:archives", "archive_docs": 10,
          "select": [{"name": "n_pages", "aggregate": "count"}]}""")
    assert(narrow > 0 && narrow < dflt)
    // a malformed bound is an error, not a silent default
    val e = intercept[RuntimeException](JxJson.run(spark, sf0001,
      """{"from": "web:archives", "archive_docs": "lots",
          "select": [{"name": "n_pages", "aggregate": "count"}]}"""))
    assert(e.getMessage.contains("archive_docs"), e.getMessage)
  }
}
