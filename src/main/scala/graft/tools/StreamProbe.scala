package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode
import graft.Scratch
import graft.streaming.Streams

/** Dev probe: where does stream_join's time go? Times the declared
  * query under the bench session config, optionally with the RocksDB
  * state-store provider (SP_ROCKS=1) for comparison. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.dir("spark-local"))
      .config("spark.sql.streaming.minBatchesToRetain", "1")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
    if (sys.env.contains("SP_ROCKS"))
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // knob matrix: streaming shuffle partitions x no-data micro-batches
    for (parts <- Seq("8", "4", "2", "1");
         noData <- Seq("true", "false")) {
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      sys.props("graft.stream.shuffle") = parts
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val out = Streams.runToMemory(
          Streams.clickViewJoin(spark, sfDir),
          s"probe_sj_${System.nanoTime()}", OutputMode.Append())
        val n = out.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"parts=$parts noData=$noData: " +
        times.map(t => f"${t._1}%.2f").mkString(" ") +
        s" rows=${times.map(_._2).distinct.mkString(",")}")
    }
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    // The matrix leaves the knob at its LAST value ("1"); reset to the
    // shipped default so the instrumented run below decomposes the
    // configuration the code actually runs with, and drop the property
    // on exit so nothing later in this JVM inherits a probe setting.
    sys.props("graft.stream.shuffle") = "4"
    // batch-level decomposition: run once more with the progress
    // listener on and dump each micro-batch's duration breakdown
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryProgressEvent): Unit =
          seen.add(s"batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
            s"durations=${e.progress.durationMs}")
        override def onQueryTerminated(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    val t0 = System.nanoTime()
    Streams.runToMemory(Streams.clickViewJoin(spark, sfDir),
      s"probe_sj_${System.nanoTime()}", OutputMode.Append())
    println(f"instrumented run: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    seen.forEach(s => println(s"  $s"))
    sys.props -= "graft.stream.shuffle"
    spark.stop()
  }
}
