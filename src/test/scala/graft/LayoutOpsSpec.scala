package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

class LayoutOpsSpec extends SparkSpec {

  test("zValue interleaves bits exactly (known values)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (3L, 5L), // x=0b011, y=0b101 → z=0b100111 = 39
      (0L, 0L), // 0
      (65535L, 0L), // all even positions → 0x55555555
      (0L, 65535L), // all odd positions → 0xAAAAAAAA
      (0x1234L, 0xABCDL)).toDF("x", "y")
    val got = df.select(LayoutOps.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq

    def reference(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    assert(got == Seq((3L, 5L), (0L, 0L), (65535L, 0L), (0L, 65535L),
      (0x1234L, 0xABCDL)).map { case (x, y) => reference(x, y) })
    assert(got(0) == 39L && got(2) == 0x55555555L && got(3) == 0xAAAAAAAAL)
  }

  test("zValue masks inputs above 16 bits instead of corrupting high bits") {
    val s = spark
    import s.implicits._
    val df = Seq((0x12345L, 0x10001L)).toDF("x", "y") // > 16 bits
    val z = df.select(LayoutOps.zValue(col("x"), col("y")).as("z"))
      .head().getLong(0)
    val masked = df.select(LayoutOps.zValue(
      col("x").bitwiseAND(lit(0xFFFFL)),
      col("y").bitwiseAND(lit(0xFFFFL))).as("z")).head().getLong(0)
    assert(z == masked)
  }

  test("scaled z-order layout tolerates empty and constant-key inputs") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(LayoutOps.zorderLayoutScaled(empty, col("x"), col("y"), 4).isEmpty)
    val const = Seq((7L, 7L), (7L, 7L)).toDF("x", "y")
    assert(LayoutOps.zorderLayoutScaled(const, col("x"), col("y"), 4)
      .collect().length == 2)
  }

  test("z-ordered parquet write enables row-group stat pruning end-to-end") {
    // Not a simulation: both layouts are actually written as parquet (one
    // row group per file at this size), read back with a pushed-down
    // second-dimension predicate, and the parquet reader's own footer-stat
    // row-group skipping is observed via task input metrics (recordsRead =
    // rows surviving row-group pruning, before the row-level filter).
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val root = java.nio.file.Files.createTempDirectory("zorder_prune").toString
    LayoutOps.zorderLayoutScaled(li, col("x"), col("y"), 16)
      .write.parquet(s"$root/z")
    li.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$root/lin")

    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    def scanned(path: String): Long = {
      Thread.sleep(300); recordsRead.set(0L)
      spark.read.parquet(path).where(col("y") === 5L).collect()
      Thread.sleep(300)
      recordsRead.get()
    }
    try {
      val total = li.count()
      val linScanned = scanned(s"$root/lin")
      val zScanned = scanned(s"$root/z")
      // 1-d-by-x files all span the full y domain: nothing skips.
      assert(linScanned == total,
        s"x-sorted layout should read everything ($linScanned vs $total)")
      assert(zScanned * 2 <= linScanned,
        s"z-order must let the parquet reader skip 2x+ ($zScanned vs $linScanned)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("z-order layout prunes files under BOTH single-dimension range predicates") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val nFiles = 16

    // Files whose footer [min,max] intersects the predicate range — what a
    // min/max-stats scan planner cannot skip.
    def filesHit(laid: org.apache.spark.sql.DataFrame,
        dim: String, lo: Long, hi: Long): Int =
      LayoutOps.fileBoundingBoxes(laid, col("x"), col("y")).collect().count {
        r => r.getAs[Long](s"${dim}_min") <= hi && r.getAs[Long](s"${dim}_max") >= lo
      }

    val z = LayoutOps.zorderLayoutScaled(li, col("x"), col("y"), nFiles)
      .localCheckpoint(true) // pin the layout: partition ids must not replan
    // 1-d alternative: range-sort by x alone — tight in x, but every file
    // spans the whole y domain, so y predicates read everything.
    val lin = li.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .localCheckpoint(true)

    val yLo = 5L
    val zYHit = filesHit(z, "y", yLo, yLo)
    val linYHit = filesHit(lin, "y", yLo, yLo)
    assert(linYHit == nFiles, "x-sorted layout cannot prune a y predicate")
    assert(zYHit * 2 <= linYHit,
      s"z-order must at least halve y-predicate file reads ($zYHit vs $linYHit)")

    val zXHit = filesHit(z, "x", 0L, 19L) // 10% of the x domain
    assert(zXHit * 2 <= nFiles,
      s"z-order must still prune x predicates ($zXHit of $nFiles files)")
  }

  test("bucketed write co-locates the join: no shuffle on either fact side") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("bkt_join").toString
    try {
      Tables.writeBucketed(
        Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus"),
        "t_bkt_orders", 4, "o_orderkey", Some(s"$root/o"))
      Tables.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        "t_bkt_lineitem", 4, "l_orderkey", Some(s"$root/l"))
      // re-running the same write must REPLACE, not accumulate: DROP
      // TABLE alone leaves external files behind, and a second
      // saveAsTable beside them would silently duplicate every row
      Tables.writeBucketed(
        Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
        "t_bkt_lineitem", 4, "l_orderkey", Some(s"$root/l"))
      assert(spark.table("t_bkt_lineitem").count() ==
        Tables.lineitem(spark, dir).count())
      // a re-run targeting a DIFFERENT path must clean the previous
      // location too (read from the catalog before the drop) — otherwise
      // the old bucket files are stranded forever
      Tables.writeBucketed(
        Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus"),
        "t_bkt_orders", 4, "o_orderkey", Some(s"$root/o2"))
      assert(!new java.io.File(s"$root/o").exists(),
        "previous external location must be cleaned on re-target")
      assert(spark.table("t_bkt_orders").count() ==
        Tables.orders(spark, dir).count())
      Tables.writeBucketed(
        Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus"),
        "t_bkt_orders", 4, "o_orderkey", Some(s"$root/o"))
      val bucketed = spark.table("t_bkt_lineitem").hint("merge")
        .join(spark.table("t_bkt_orders").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the whole point: neither fact side re-shuffles on the join key
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // content identical to the plain path-based join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderstatus")
      assert(bucketed.select("l_orderkey", "l_quantity", "o_orderstatus")
        .collect().map(_.toString).sorted.toSeq ==
        expected.collect().map(_.toString).sorted.toSeq)
      // a non-bucketed twin of the same join DOES shuffle both sides —
      // the counterfactual that proves the bucket spec (not size or luck)
      // removed the exchanges
      val flat = spark.read.parquet(s"$root/l").hint("merge")
        .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
          .hint("merge"), col("l_orderkey") === col("o_orderkey"))
      assert(flat.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning(l_orderkey"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS t_bkt_lineitem")
      graft.sources.SnapshotStore.deleteTree(root)
    }
  }

  test("writeBucketed refuses self-referential rewrites of BOTH doomed locations") {
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("bkt_guard").toString
    try {
      val orders = Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
      Tables.writeBucketed(orders, "t_bkt_guard", 4, "o_orderkey", Some(s"$root/a"))
      // df reads the table's CURRENT location, which the rewrite deletes
      // before df executes — must refuse, data intact
      val fromPrev = spark.read.parquet(s"$root/a")
      intercept[IllegalArgumentException](
        Tables.writeBucketed(fromPrev, "t_bkt_guard", 8, "o_orderkey",
          Some(s"$root/b")))
      // df reads the TARGET location (data staged where the new table
      // goes — e.g. first registration over an existing directory): the
      // call deletes newLoc too, so this must refuse just the same
      orders.write.mode("overwrite").parquet(s"$root/staged")
      val fromTarget = spark.read.parquet(s"$root/staged")
      intercept[IllegalArgumentException](
        Tables.writeBucketed(fromTarget, "t_bkt_guard2", 4, "o_orderkey",
          Some(s"$root/staged")))
      // both refusals left the inputs alive
      assert(spark.read.parquet(s"$root/a").count() == orders.count())
      assert(spark.read.parquet(s"$root/staged").count() == orders.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_bkt_guard")
      spark.sql("DROP TABLE IF EXISTS t_bkt_guard2")
      graft.sources.SnapshotStore.deleteTree(root)
    }
  }
}
