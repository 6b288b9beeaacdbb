package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev-only probe: per-batch durationMs breakdown for the stream-stream
  * outer join family (r18 headroom work). Not a declared surface.
  */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .config("spark.local.dir", graft.Scratch.dir("spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val ckpt = graft.Scratch.dir("ckpt", s"probe-$tag-${System.nanoTime()}")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val t0 = System.nanoTime()
      val q = mk().writeStream
        .outputMode("append").format("memory")
        .queryName(s"p_$tag")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(); q.stop()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== $tag total ${dt}%.2f s, rows=${spark.table(s"p_$tag").count()}")
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"triggerExec=${dur.get("triggerExecution")} addBatch=${dur.get("addBatch")} " +
          s"getBatch=${dur.get("getBatch")} latestOffset=${dur.get("latestOffset")} " +
          s"queryPlanning=${dur.get("queryPlanning")} walCommit=${dur.get("walCommit")} " +
          s"commitOffsets=${dur.get("commitOffsets")}")
        p.stateOperators.foreach { so =>
          println(s"    state: op=${so.operatorName} commitMs=${so.allUpdatesTimeMs}/" +
            s"${so.commitTimeMs} rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes}")
        }
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.catalog.dropTempView(s"p_$tag")
      graft.streaming.Streams.deleteRecursively(ckpt)
    }

    // warm the machinery once at tiny scale
    once("warm", () => graft.streaming.Streams.viewClickLeftOuterJoin(spark, "/root/testdata/sf0.001"))
    (1 to 2).foreach { i =>
      once(s"left$i", () => graft.streaming.Streams.viewClickLeftOuterJoin(spark, dir))
      once(s"full$i", () => graft.streaming.Streams.viewClickFullOuterJoin(spark, dir))
    }
    spark.stop()
  }
}
