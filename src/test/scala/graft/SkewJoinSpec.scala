package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin equals the plain inner join, including dup keys") {
    // one hot key (k=1, 100 rows), a normal key, and an unmatched key
    val big = ((1 to 100).map(i => (1L, s"row$i")) ++
      Seq((2L, "only"), (99L, "orphan"))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unused"))
      .toDF("j", "name")
    val salted = SkewJoin.saltedInnerJoin(big, small, "k", "j", nSalts = 4)
      .select("k", "payload", "name")
    val plain = big.join(small, col("k") === col("j"))
      .select("k", "payload", "name")
    assert(salted.count() == 101)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt actually spreads a hot key over multiple salt values") {
    val big = (1 to 64).map(i => (1L, i)).toDF("k", "i")
    val nDistinctSalts = big
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(4L)))
      .select("__salt").distinct().count()
    assert(nDistinctSalts > 1)
  }
}
