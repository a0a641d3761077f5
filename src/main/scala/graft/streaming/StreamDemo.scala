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
    spark.stop()
  }
}
