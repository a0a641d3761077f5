package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{TopicLog, TopicLogOffset, TopicLogWriter}
import graft.streaming.StreamOps

/** S3/S4 as a native DataSource V2: channel-log pub/sub with glob
  * subscription, per-channel byte offsets, rate limiting, and
  * checkpoint-exact restart. */
class TopicLogSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("glob → regex covers the psubscribe subset") {
    def m(g: String, s: String) = TopicLog.globToRegex(g).matcher(s).matches()
    assert(m("*", "anything.at.all"))
    assert(m("dev*", "dev17") && !m("dev*", "mydev"))
    assert(m("dev?", "dev1") && !m("dev?", "dev12"))
    assert(m("dev[01]", "dev0") && m("dev[01]", "dev1") && !m("dev[01]", "dev2"))
    assert(m("a.b", "a.b") && !m("a.b", "axb")) // '.' is literal, not regex
  }

  test("offset JSON round-trips, including names needing escapes") {
    val o = TopicLogOffset(Map("plain" -> 42L, "qu\"ote" -> 0L, "back\\slash" -> 7L))
    assert(TopicLogOffset.fromJson(o.json()) == o)
    assert(TopicLogOffset.fromJson("{}") == TopicLogOffset(Map.empty))
  }

  test("batch read: all channels, byte offsets locate each line") {
    val root = tmp("topiclog_batch")
    TopicLogWriter.publish(root, "dev0", Seq("alpha", "beta"))
    TopicLogWriter.publish(root, "dev1", Seq("gamma"))
    val df = spark.read.format("topiclog").option("path", root).load()
    val rows = df.collect().map(r =>
      (r.getAs[String]("channel"), r.getAs[Long]("offset"), r.getAs[String]("value")))
    assert(rows.toSet == Set(
      ("dev0", 0L, "alpha"), ("dev0", 6L, "beta"), ("dev1", 0L, "gamma")))
  }

  test("pattern subscribe filters channels like psubscribe") {
    val root = tmp("topiclog_pat")
    TopicLogWriter.publish(root, "sensors.a", Seq("1"))
    TopicLogWriter.publish(root, "sensors.b", Seq("2"))
    TopicLogWriter.publish(root, "ctrl", Seq("3"))
    val df = spark.read.format("topiclog")
      .option("path", root).option("pattern", "sensors.*").load()
    assert(df.select("channel").distinct().collect().map(_.getString(0)).toSet ==
      Set("sensors.a", "sensors.b"))
  }

  test("streaming: appends and a brand-new channel arrive exactly once") {
    val root = tmp("topiclog_stream")
    TopicLogWriter.publish(root, "dev0", Seq("m1", "m2"))
    val q = spark.readStream.format("topiclog").option("path", root).load()
      .writeStream.format("memory").queryName("t_toplog").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      TopicLogWriter.publish(root, "dev0", Seq("m3"))
      TopicLogWriter.publish(root, "late", Seq("n1")) // appears mid-stream
      q.processAllAvailable()
      val rows = spark.table("t_toplog").collect()
        .map(r => (r.getAs[String]("channel"), r.getAs[String]("value")))
      assert(rows.length == 4) // exactly once: no replay of m1/m2
      assert(rows.toSet == Set(
        ("dev0", "m1"), ("dev0", "m2"), ("dev0", "m3"), ("late", "n1")))
    } finally q.stop()
  }

  test("maxBytesPerTrigger bounds each micro-batch without losing rows") {
    val root = tmp("topiclog_rate")
    val msgs = (0 until 100).map(i => f"msg$i%03d") // 7 bytes + \n each
    TopicLogWriter.publish(root, "dev0", msgs)
    val q = spark.readStream.format("topiclog").option("path", root)
      .option("maxBytesPerTrigger", "80") // ~10 lines per batch
      .load()
      .writeStream.format("memory").queryName("t_rate").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("t_rate").collect().map(_.getAs[String]("value"))
      assert(got.length == 100 && got.toSet == msgs.toSet)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 5, s"expected chunked batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 11))
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the committed offset, no dupes") {
    val root = tmp("topiclog_ck_src")
    val ck = tmp("topiclog_ck")
    val out = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val dupes = new java.util.concurrent.atomic.AtomicInteger(0)
    def run(): Unit = {
      val q = spark.readStream.format("topiclog").option("path", root).load()
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach { r =>
            if (!out.add(r.getAs[String]("value"))) dupes.incrementAndGet()
          }
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    TopicLogWriter.publish(root, "dev0", Seq("a1", "a2"))
    run()
    TopicLogWriter.publish(root, "dev0", Seq("a3"))
    TopicLogWriter.publish(root, "dev1", Seq("b1"))
    run()
    assert(out.size == 4 && dupes.get == 0,
      s"exactly-once violated: ${out.size} uniques, ${dupes.get} dupes")
  }

  test("publishEpoch: a replayed epoch appends nothing; distinct epochs append") {
    val root = java.nio.file.Files.createTempDirectory("pubep").toString
    def lines(ch: String) = {
      val f = new java.io.File(root, s"$ch.log")
      if (!f.exists) Nil
      else scala.io.Source.fromFile(f).getLines().toList
    }
    assert(TopicLogWriter.publishEpoch(root, "ctl-x", 0L,
      Seq("resp" -> Seq("r0"), "audit" -> Seq("a0"))))
    // crash-replay of the same micro-batch: guard reports seen, no dupes
    assert(TopicLogWriter.epochSeen(root, "ctl-x", 0L))
    assert(!TopicLogWriter.publishEpoch(root, "ctl-x", 0L,
      Seq("resp" -> Seq("r0"), "audit" -> Seq("a0"))))
    assert(TopicLogWriter.publishEpoch(root, "ctl-x", 1L,
      Seq("resp" -> Seq("r1"))))
    assert(lines("resp") == List("r0", "r1") && lines("audit") == List("a0"))
    // a DIFFERENT control loop's epochs are independent
    assert(TopicLogWriter.publishEpoch(root, "ctl-y", 0L,
      Seq("resp" -> Seq("ry"))))
    assert(lines("resp") == List("r0", "r1", "ry"))
  }

  test("batch write: staged segments splice into channel logs, read round-trips") {
    val root = tmp("topiclog_wbatch")
    import spark.implicits._
    val df = Seq(
      ("dev0", "a1"), ("dev0", "a2"), ("dev1", "b1"), ("dev2", "c1"))
      .toDF("channel", "value")
      .repartition(4) // rows scatter across tasks; commit must still splice
    df.write.format("topiclog").mode("append").option("path", root).save()
    val back = spark.read.format("topiclog").option("path", root).load()
      .select("channel", "value").as[(String, String)].collect().toSet
    assert(back == Set(("dev0", "a1"), ("dev0", "a2"), ("dev1", "b1"), ("dev2", "c1")))
    // Append-only contract: a second write appends, never truncates.
    Seq(("dev1", "b2")).toDF("channel", "value")
      .write.format("topiclog").mode("append").option("path", root).save()
    assert(spark.read.format("topiclog").option("path", root).load().count() == 5)
    // No staging residue after commit.
    assert(!Files.exists(java.nio.file.Paths.get(root, ".staging")))
  }

  test("batch write accepts a read-shaped frame (offset ignored) — republish loop") {
    val src = tmp("topiclog_rep_src")
    val dst = tmp("topiclog_rep_dst")
    TopicLogWriter.publish(src, "dev0", Seq("m1", "m2"))
    TopicLogWriter.publish(src, "dev1", Seq("n1"))
    spark.read.format("topiclog").option("path", src).load()
      .write.format("topiclog").mode("append").option("path", dst).save()
    val back = spark.read.format("topiclog").option("path", dst).load()
      .select("channel", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("dev0", "m1"), ("dev0", "m2"), ("dev1", "n1")))
  }

  test("write rejects embedded newlines and path-escaping channel names") {
    import spark.implicits._
    val root = tmp("topiclog_wbad")
    def fails(rows: Seq[(String, String)]): Boolean =
      try {
        rows.toDF("channel", "value").coalesce(1)
          .write.format("topiclog").mode("append").option("path", root).save()
        false
      } catch { case _: Throwable => true }
    assert(fails(Seq(("dev0", "torn\nline"))), "newline value must be rejected")
    assert(fails(Seq(("../escape", "x"))), "path-escaping channel must be rejected")
    assert(fails(Seq((".hidden", "x"))), "dot-prefixed channel must be rejected")
    // Nothing may have reached the logs.
    assert(TopicLog.channelSizes(root, "*").isEmpty)
  }

  test("streaming write: epochs commit exactly once, markers recorded") {
    val srcRoot = tmp("topiclog_ws_src")
    val dstRoot = tmp("topiclog_ws_dst")
    val ck = tmp("topiclog_ws_ck")
    TopicLogWriter.publish(srcRoot, "dev0", Seq("m1", "m2"))
    val q = spark.readStream.format("topiclog").option("path", srcRoot).load()
      .select("channel", "value")
      .writeStream.format("topiclog").option("path", dstRoot)
      .option("checkpointLocation", ck).outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      TopicLogWriter.publish(srcRoot, "dev0", Seq("m3"))
      TopicLogWriter.publish(srcRoot, "dev1", Seq("n1"))
      q.processAllAvailable()
      val back = spark.read.format("topiclog").option("path", dstRoot).load()
        .select("channel", "value").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(back.length == 4, s"exactly-once violated: ${back.mkString(",")}")
      assert(back.toSet == Set(
        ("dev0", "m1"), ("dev0", "m2"), ("dev0", "m3"), ("dev1", "n1")))
      // Within a channel, arrival order is preserved (offsets ascend in
      // publish order — the per-channel ordering the reference relies on).
      val dev0 = spark.read.format("topiclog").option("path", dstRoot).load()
        .where(col("channel") === "dev0").orderBy("offset")
        .select("value").collect().map(_.getString(0)).toSeq
      assert(dev0 == Seq("m1", "m2", "m3"))
      // Epoch markers exist for the committed epochs.
      val epochsDir = java.nio.file.Paths.get(dstRoot, ".epochs")
      assert(Files.isDirectory(epochsDir), "epoch markers missing")
    } finally q.stop()
  }

  test("a replayed epoch commit is a no-op (idempotent splice)") {
    val root = tmp("topiclog_idem")
    import graft.sources.{TopicLogCommit, TopicLogCommitMessage}
    // Stage one segment by hand, then commit the same epoch twice — the
    // second must see the marker and skip the append.
    def stage(): Unit = {
      val dir = java.nio.file.Paths.get(root, ".staging", "q1-e5")
      Files.createDirectories(dir)
      Files.write(dir.resolve("dev0.p0-t0.seg"), "x1\n".getBytes("UTF-8"))
    }
    stage()
    TopicLogCommit.commit(root, "q1-e5",
      Array(TopicLogCommitMessage(0, 0L, Seq("dev0"))), Some(("q1", 5L)))
    stage() // engine-side replay restages the epoch's data
    TopicLogCommit.commit(root, "q1-e5",
      Array(TopicLogCommitMessage(0, 0L, Seq("dev0"))), Some(("q1", 5L)))
    assert(Files.readAllBytes(java.nio.file.Paths.get(root, "dev0.log")).length == 3,
      "replayed epoch appended twice")
  }

  test("C2 over the broker: subscribe → dispatch → response + cmdlog channels") {
    val root = tmp("topiclog_c2")
    TopicLogWriter.publish(root, "c2", Seq("get config"))
    val ctl = new graft.streaming.TopicLogControl(spark, root)
    try {
      ctl.processAllAvailable()
      // Commands arriving mid-stream fold over the SAME param state, in
      // offset order — including a rejected one (logged, not fatal).
      TopicLogWriter.publish(root, "c2",
        Seq("set minDataHoursToRenderBin 5", "frobnicate now"))
      ctl.processAllAvailable()
      assert(ctl.params.minDataHoursToRenderBin == 5)
      val resp = spark.read.format("topiclog").option("path", root)
        .option("pattern", "c2resp").load()
        .orderBy("offset").collect().map(_.getAs[String]("value"))
      assert(resp.length == 3)
      assert(resp(0).contains("\"ok\": true") && resp(0).contains("dayBins"))
      assert(resp(1).contains("minDataHoursToRenderBin=5"))
      assert(resp(2).contains("\"ok\": false"))
      val audit = spark.read.format("topiclog").option("path", root)
        .option("pattern", "cmdlog").load()
        .orderBy("offset").collect().map(_.getAs[String]("value"))
      assert(audit.length == 3 && audit(2).contains("\"valid\": false")
        && audit(1).contains("set minDataHoursToRenderBin 5"))
    } finally ctl.close()
  }

  test("control loop refuses an oversized command batch (enforced human-scale contract)") {
    val root = tmp("topiclog_big")
    // 7 "commands" against a cap of 3: a data stream mis-wired into the
    // control plane must fail the query loudly, not OOM the driver
    TopicLogWriter.publish(root, "c2", (1 to 7).map(i => s"get config $i"))
    val ctl = new graft.streaming.TopicLogControl(spark, root,
      maxCmdsPerBatch = 3)
    try {
      val e = intercept[Exception] { ctl.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("human-scale")), msgs(e).mkString(" | "))
    } finally ctl.close()
  }

  test("end-to-end: topiclog feeds the reference parse→tier stack unchanged") {
    val root = tmp("topiclog_e2e")
    // Reference-shaped wire messages across two sensor channels.
    val wire = (0 until 20).map { i =>
      val ch = s"dev${i % 2}"
      (ch, s"""{"ts": ${600 + i * 30}, "source": "$ch", "value": {"temp": ${i}.5}}""")
    }
    wire.groupBy(_._1).foreach { case (ch, ms) =>
      TopicLogWriter.publish(root, ch, ms.map(_._2))
    }
    val q = StreamOps.minuteTierStream(
      StreamOps.explodeMetrics(StreamOps.parseMessages(
        spark.readStream.format("topiclog").option("path", root).load()
          .select(col("value")))),
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_e2e").outputMode("update")
      .start()
    try {
      q.processAllAvailable()
      // Batch twin of minuteTierStream on the same lines — the
      // source-agnostic proof (same parse/explode/agg expressions).
      val batch = StreamOps.explodeMetrics(StreamOps.parseMessages(
          spark.read.format("topiclog").option("path", root).load()
            .select(col("value"))))
        .groupBy(col("metric"), window(col("ts"), "1 minute"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).as("sv"),
          min("value").as("mn"), max("value").as("mx"))
        .select(col("metric"), col("window.start").as("minute_start"),
          col("n"), col("sv"), col("mn"), col("mx"))
      val streamed = spark.table("t_e2e")
        .select("metric", "minute_start", "mn", "mx", "n").collect().toSet
      val expected = batch
        .select("metric", "minute_start", "mn", "mx", "n").collect().toSet
      assert(streamed == expected && streamed.nonEmpty)
    } finally q.stop()
  }
}
