package graft.examples

import graft.Sessions
import graft.streaming.EventStreams

/** Replay the events fixture as a stream with Trigger.AvailableNow and print
  * the windowed results — the streaming face of the engine.
  * `runMain graft.examples.StreamingDemo [sfDir]` */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_demo")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"), dir.resolve("part0.parquet"))
    val stream = EventStreams.readEventsStream(spark, dir.toString, s"$sf/events.parquet")
    val windows = EventStreams.runAvailableNow(
      EventStreams.tumblingCounts(stream, "1 hour", "10 minutes"), "demo_tumbling")
    println(s"[demo] tumbling windows rows=${windows.count()}")
    windows.orderBy("window_start", "event_type").show(6, truncate = false)
    spark.stop()
  }
}
