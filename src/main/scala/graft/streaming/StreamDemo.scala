package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.GraftSession

/** Executable example of the streaming pipeline (S3 parse → F5 explode →
  * A4 windowed mean) over an in-memory source — the readStream shape users
  * swap for kafka/file sources in production. Run:
  * `sbt "runMain graft.streaming.StreamDemo"`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[String]
    val pipe = StreamOps.microBatchMean(
      StreamOps.explodeMetrics(StreamOps.parseMessages(in.toDF())),
      "5 minutes", "1 minute")
    val q = pipe.writeStream.format("memory").queryName("demo").outputMode("update").start()

    in.addData(
      """{"ts": 0, "source": "dev1", "value": {"temperature": 20.0, "humidity": 30.0}}""",
      """{"ts": 120, "source": "dev1", "value": {"temperature": 24.0}}""",
      """BROKEN {{{""")
    q.processAllAvailable()
    println("=== A4 windowed means after batch 1 ===")
    spark.table("demo").orderBy("metric", "w_start").show(false)

    in.addData("""{"ts": 400, "source": "dev1", "value": {"temperature": 99.0}}""")
    q.processAllAvailable()
    println("=== after batch 2 (second window appears) ===")
    spark.table("demo").orderBy("metric", "w_start").show(false)
    q.stop()

    // A4 exact-parity path: gap-triggered mean over a typed sample stream.
    val in2 = MemoryStream[StreamSample]
    val q2 = StreamOps.gapTriggeredMean(in2.toDS(), 60.0).toDF()
      .writeStream.format("memory").queryName("demo_gap").outputMode("append").start()
    def at(sec: Long, v: Double) = StreamSample(new java.sql.Timestamp(sec * 1000), "dev1", "temperature", v)
    in2.addData(at(0, 10.0), at(30, 20.0), at(90, 30.0))
    q2.processAllAvailable()
    println("=== gap-triggered means (trigger at 0 and 90; 30s sample buffered into 90's mean) ===")
    spark.table("demo_gap").orderBy("e").show(false)
    q2.stop()
    spark.stop()
  }
}
