package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextOps
import graft.sources.Catalog

/** Property-style tests (SURVEY.md §5.2 item 3) — scalacheck Gens
  * sampled directly (scalatestplus bridge is not in the offline cache).
  */
class OperatorPropsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("json_set_default declared constraint holds: props are flat non-null scalars") {
    // json_set_default (queries/Scalars.scala) is declared over flat
    // scalar non-null props: RFC 7386 merge-patch (the DuckDB oracle)
    // DELETES null-valued keys where map_zip_with keeps them, and
    // nested objects replace wholesale rather than zip. This spec makes
    // a fixture drift outside that domain fail HERE, loudly, instead of
    // as an opaque oracle hash mismatch.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val props = Catalog.table(spark, sf0001, "events")
      .select("event_id", "props").as[(Long, String)].collect()
    assert(props.nonEmpty)
    props.foreach { case (id, p) =>
      JsonMethods.parse(p) match {
        case JObject(fields) =>
          fields.foreach {
            case (k, JNull) => fail(
              s"event $id props key '$k' is JSON null - json_set_default's " +
                "merge-patch oracle deletes it while map_zip_with keeps it")
            case (k, v) if v.isInstanceOf[JObject] || v.isInstanceOf[JArray] =>
              fail(s"event $id props key '$k' is non-scalar - merge-patch " +
                "replaces wholesale, map_zip_with would zip")
            case _ => ()
          }
        case other => fail(s"event $id props is not a JSON object: $other")
      }
    }
  }

  test("topk(k) equals sort.limit(k) for random k") {
    val orders = Catalog.table(spark, sf0001, "orders").cache()
    val all = orders.select("o_orderkey", "o_totalprice")
      .as[(Long, Double)].collect()
      .sortBy { case (key, p) => (-p, key) }
    samples(Gen.choose(1, 50), 5).foreach { k =>
      val a = orders.orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(k).select("o_orderkey").as[Long].collect().toSeq
      assert(a == all.take(k).map(_._1).toSeq, s"k=$k")
    }
  }

  test("dedup is idempotent") {
    val docs = Catalog.table(spark, sf0001, "documents")
    val once = TextOps.exactDedup(docs, "doc_id", "text").drop("fp")
    val twice = TextOps.exactDedup(once, "doc_id", "text").drop("fp")
    assert(once.count() == twice.count())
  }

  test("quantize reconstructs within scale/2; normalize yields unit norm") {
    // llm_embed_quantize: |x - q*scale| ≤ scale/2 element-wise (the
    // defining bound of round-to-nearest symmetric quantization) and
    // codes stay in [-127, 127]. llm_embed_normalize: the fixed-point
    // unit vector has L2 norm 1 ± 1e-4 (micro-unit rounding).
    val q = SparkEntry.queries("llm_embed_quantize")(spark, sf0001)
      .select(col("vec_id"), expr("from_json(q, 'array<bigint>')").as("qs"))
    val emb = Catalog.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // reconstruct with the TRUE scale (the output one is rounded to 6
    // digits for the oracle; the codes were computed pre-rounding)
    val worst = q.join(emb, "vec_id")
      .withColumn("s",
        array_max(transform(col("v"), x => abs(x))) / lit(127.0))
      .select(
        aggregate(zip_with(col("v"), col("qs"),
            (x, c) => abs(x - c * col("s"))),
          lit(0.0), (acc, e) => greatest(acc, e)).as("err"),
        array_max(transform(col("qs"), c => abs(c))).as("qmax"),
        col("s"))
      .agg(max(expr("err / s")).as("rel"), max("qmax").as("qmax"))
      .as[(Double, Long)].head()
    assert(worst._1 <= 0.5 + 1e-9, s"reconstruction err ${worst._1} * scale")
    assert(worst._2 <= 127L)

    val badNorm = SparkEntry.queries("llm_embed_normalize")(spark, sf0001)
      .filter(col("unit_micro").isNotNull)
      .select(expr("from_json(unit_micro, 'array<bigint>')").as("u"))
      .select(sqrt(aggregate(col("u"), lit(0.0),
        (acc, e) => acc + (e / lit(1e6)) * (e / lit(1e6)))).as("n"))
      .filter(abs(col("n") - 1.0) > 1e-4).count()
    assert(badNorm == 0L)
  }

  test("shuffle_shards is a deterministic within-shard permutation") {
    val out = SparkEntry.queries("llm_shuffle_shards")(spark, sf0001)
      .select("shard", "pos").as[(Long, Long)].collect()
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.toSeq == (1L to rows.length).toSeq, s"shard $shard")
    }
    // content-addressed: a second evaluation is bit-identical
    val again = SparkEntry.queries("llm_shuffle_shards")(spark, sf0001)
      .select("shard", "pos").as[(Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("jaccard is symmetric and bounded on random word sets") {
    val wordGen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    val cases = samples(Gen.zip(wordGen, wordGen), 10)
    val df = cases.map { case (x, y) => (x.distinct, y.distinct) }.toDF("x", "y")
    df.select(
        TextOps.jaccard(col("x"), col("y")).as("ab"),
        TextOps.jaccard(col("y"), col("x")).as("ba"))
      .as[(Double, Double)].collect().foreach { case (ab, ba) =>
        assert(math.abs(ab - ba) < 1e-12)
        assert(ab >= 0.0 && ab <= 1.0)
      }
  }

  test("vector exprs: whole-stage codegen and interpreted paths agree") {
    import graft.plans.VectorExprs
    val emb = Catalog.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def run(): Seq[(Long, Double, Double, Long)] = emb.select(col("vec_id"),
        VectorExprs.dot(col("v"), col("v")).as("d"),
        VectorExprs.norm(col("v")).as("nm"),
        VectorExprs.srpSign(col("v"), 16).as("s"))
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1).toSeq
    val withCodegen = run()
    val ws = spark.conf.get("spark.sql.codegen.wholeStage")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        spark.conf.set("spark.sql.codegen.factoryMode", fm)
      }
    assert(withCodegen.nonEmpty && withCodegen == interpreted)
  }

  test("llm_pack_sequences: bin is exactly floor(prefix-tokens / capacity)") {
    val out = SparkEntry.queries("llm_pack_sequences")(spark, sf0001)
      .select("shard", "doc_id", "n_tok", "bin")
      .as[(Long, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      var prefix = 0L
      var lastBin = -1L
      rows.sortBy(_._2).foreach { case (_, _, nTok, bin) =>
        assert(bin == prefix / 256, s"bin must be prefix DIV capacity")
        assert(bin >= lastBin, "bins must be non-decreasing within a shard")
        lastBin = bin
        prefix += nTok
      }
    }
  }

  test("etl_upsert: delta rows win on version, base rows pass through") {
    val orders = Catalog.table(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice").as[(Long, Double)]
      .collect().toMap
    val out = SparkEntry.queries("etl_upsert")(spark, sf0001)
      .as[(Long, Double, Long)].collect()
    assert(out.length == orders.size, "one surviving row per key")
    out.foreach { case (k, price, version) =>
      if (k % 10 == 0) {
        assert(version == 1L && price == orders(k) + 1000.0, s"key $k")
      } else {
        assert(version == 0L && price == orders(k), s"key $k")
      }
    }
  }

  test("bpeTrainMerges agrees with an in-memory reference on random vocabularies") {
    // Reference trainer: the literal Sennrich et al. algorithm in plain
    // Scala — pair counts weighted by word freq, (cnt desc, a, b)
    // argmax, greedy left-to-right non-overlapping rewrite. A 3-letter
    // alphabet forces merged symbols to collide and cascade, the shapes
    // the fixture's 31-word vocab never stresses.
    def reference(vocab: Seq[(String, Long)], k: Int)
        : Seq[(Int, String, String, String, Long)] = {
      var words = vocab.map { case (w, f) =>
        (w.split("").filter(_.nonEmpty).toVector, f)
      }
      (1 to k).flatMap { step =>
        val counts = scala.collection.mutable.Map
          .empty[(String, String), Long]
        words.foreach { case (syms, f) =>
          syms.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
          }
        }
        if (counts.isEmpty) Seq.empty
        else {
          val ((a, b), cnt) = counts.toSeq
            .minBy { case ((x, y), c) => (-c, x, y) }
          words = words.map { case (syms, f) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (out.nonEmpty && out.last == a && x == b)
                out(out.length - 1) = a + b
              else out += x
            }
            (out.toVector, f)
          }
          Seq((step, a, b, a + b, cnt))
        }
      }
    }
    val wordGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    (0 until 3).foreach { round =>
      val vocab = samples(wordGen, 25).distinct.zipWithIndex
        .map { case (w, i) => (w, (i % 5 + 1).toLong) }
      val expected = reference(vocab, 3)
      val got = graft.operators.TextOps
        .bpeTrainMerges(vocab.toDF("word", "freq"), 3)
        .select("step", "left_sym", "right_sym", "merged", "cnt")
        .as[(Int, String, String, String, Long)].collect().toSeq
      assert(got == expected,
        s"round $round vocab=$vocab\n got=$got\n exp=$expected")
    }
  }
}
