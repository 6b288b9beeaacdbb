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
}
