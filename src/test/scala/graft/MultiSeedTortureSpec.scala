package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{JoinView, SnapshotStore}

/** Multi-seed torture sweep:
  * re-runs the two newest surgical surfaces — key-granular
  * rebase and the full-outer join view — under several fresh seeds to
  * hunt latent composition bugs the fixed-seed specs could miss. */
class MultiSeedTortureSpec extends SparkSpec {

  private def df(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, i % 7)).toDF("id", "grp")
  }

  private def idBag(root: String): Seq[Long] =
    SnapshotStore.read(spark, root).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq

  test("key-granular rebase: 4 extra seeds") {
    Seq(11, 222, 3333, 44444).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory(s"kgr$seed").toString
      try {
        val rnd = new scala.util.Random(seed)
        SnapshotStore.append(df(1L to 40L: _*), root)
        var model = (1L to 40L).toSet
        SnapshotStore.createBranch(root, "work")
        val br = SnapshotStore.branchRoot(root, "work")
        var nextB = 1001L; var nextP = 2000L
        (1 to 5).foreach { round =>
          (0 until 1 + rnd.nextInt(2)).foreach { _ =>
            rnd.nextInt(2) match {
              case 0 =>
                val odd = model.filter(_ % 2 == 1)
                if (odd.nonEmpty) {
                  val v = odd.toSeq.sorted.apply(rnd.nextInt(odd.size))
                  SnapshotStore.deleteWhere(spark, br, col("id") === v)
                  model -= v
                }
              case 1 =>
                SnapshotStore.append(df(nextB), br); model += nextB; nextB += 2
            }
          }
          (0 until 1 + rnd.nextInt(2)).foreach { _ =>
            rnd.nextInt(2) match {
              case 0 =>
                val even = model.filter(id => id % 2 == 0 && id < 1000L)
                if (even.nonEmpty) {
                  val v = even.toSeq.sorted.apply(rnd.nextInt(even.size))
                  SnapshotStore.deleteWhere(spark, root, col("id") === v)
                  model -= v
                }
              case 1 =>
                SnapshotStore.append(df(nextP), root); model += nextP; nextP += 2
            }
          }
          SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
          assert(idBag(br) == model.toSeq.sorted, s"seed $seed round $round branch")
          SnapshotStore.mergeBranch(spark, root, "work")
          assert(idBag(root) == model.toSeq.sorted, s"seed $seed round $round parent")
        }
      } finally SnapshotStore.deleteTree(root)
    }
  }

  test("full-outer view: 3 extra seeds") {
    def ordersDF(ids: Long*): DataFrame = {
      val s = spark; import s.implicits._
      ids.map(i => (i, s"cust${i % 3}", i * 10.0)).toDF("o_id", "cust", "total")
    }
    def linesDF(rows: (Long, Long, Double)*): DataFrame = {
      val s = spark; import s.implicits._
      rows.toDF("lo_id", "ln", "qty")
    }
    Seq(77, 888, 9999).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory(s"fot$seed").toString
      val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/V"
      try {
        val s2 = spark
        import s2.implicits._
        def fullTruth(): Seq[String] = {
          val lf = SnapshotStore.read(spark, l)
          val rf = SnapshotStore.read(spark, r)
          lf.join(rf, lf("o_id") === rf("lo_id"), "full_outer")
            .select("o_id", "cust", "total", "lo_id", "ln", "qty")
            .collect().map(_.toString).sorted.toSeq
        }
        def viewNow(): Seq[String] = JoinView.read(spark, v)
          .select("o_id", "cust", "total", "lo_id", "ln", "qty")
          .collect().map(_.toString).sorted.toSeq
        def refresh(): Unit =
          JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")
        val rnd = new scala.util.Random(seed)
        SnapshotStore.append(ordersDF(1L to 25L: _*), l)
        SnapshotStore.append(linesDF((10L to 35L).map(o => (o, 1L, o * 1.0)): _*), r)
        refresh()
        assert(viewNow() == fullTruth(), s"seed $seed bootstrap")
        var nextO = 41L; var nextLn = 2L
        (1 to 12).foreach { step =>
          rnd.nextInt(7) match {
            case 0 =>
              SnapshotStore.append(ordersDF(26L + rnd.nextInt(10), nextO), l)
              nextO += 1
            case 1 =>
              SnapshotStore.append(
                linesDF((1L + rnd.nextInt(9), nextLn, step * 1.0),
                  (10L + rnd.nextInt(10), nextLn, step * 2.0)), r)
              nextLn += 1
            case 2 =>
              SnapshotStore.deleteWhere(spark, l,
                col("o_id") % 8 === (step % 8).toLong)
            case 3 =>
              SnapshotStore.deleteWhere(spark, r, col("qty") > (30.0 - step))
            case 4 =>
              SnapshotStore.upsert(spark,
                linesDF((1L + rnd.nextInt(35), 1L, 500.0 + step)),
                r, Seq("lo_id", "ln"))
            case 5 =>
              SnapshotStore.append(
                Seq((Option.empty[Long], s"cn$step", step * 1.0))
                  .toDF("o_id", "cust", "total"), l)
            case 6 =>
              SnapshotStore.append(
                Seq((Option.empty[Long], 700L + step, step * 1.0))
                  .toDF("lo_id", "ln", "qty"), r)
          }
          refresh()
          assert(viewNow() == fullTruth(), s"seed $seed diverged after step $step")
        }
      } finally SnapshotStore.deleteTree(root)
    }
  }

  test("extents agg-join MV: 3 seeds of random append/delete/upsert churn == re-aggregation") {
    import graft.sources.AggJoinView
    def custT(rows: (Long, String)*): DataFrame = {
      val s = spark; import s.implicits._
      rows.toDF("c_id", "seg")
    }
    def ordT(rows: (Long, String, Option[Double])*): DataFrame = {
      val s = spark; import s.implicits._
      rows.toDF("o_id", "status", "total")
    }
    Seq(13, 555, 7777).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory(s"ajx$seed").toString
      try {
        val l = s"$root/L"; val r = s"$root/R"; val v = s"$root/V"
        val rnd = new scala.util.Random(seed)
        // null segs on some customers: random churn rounds hit BOTH the
        // keyed-replace path and the null-group full-rebuild branch
        SnapshotStore.append(custT((1L to 25L).map(i =>
          (i, if (i % 9 == 0) null else s"s${i % 4}")): _*), l)
        SnapshotStore.append(ordT((1L to 20L).map(i =>
          (i, s"st${i % 2}",
            if (i % 6 == 0) None else Some(i * 1.5))): _*), r)
        def refresh(): Unit = AggJoinView.refreshKeys(spark, l, r, v,
          Seq("c_id"), Seq("o_id"), Seq("seg", "status"), Seq("total"),
          extents = true)
        def fmt(df: DataFrame) = df.collect().map { x =>
          (Option(x.getAs[String](0)).orNull, x.getAs[String](1),
            x.getAs[Long](2),
            Option(x.getAs[java.math.BigDecimal](3))
              .map(_.stripTrailingZeros.toPlainString).orNull,
            Option(x.getAs[java.lang.Double](4)).map(_.toDouble),
            Option(x.getAs[java.lang.Double](5)).map(_.toDouble))
        }.toSet
        def viewNow() = fmt(AggJoinView.read(spark, v).select(
          col("seg"), col("status"), col("cnt"), col("sum_total"),
          col("min_total"), col("max_total")))
        def truth() = {
          val lf = SnapshotStore.read(spark, l)
          val rf = SnapshotStore.read(spark, r)
          fmt(lf.join(rf, lf("c_id") === rf("o_id"))
            .groupBy("seg", "status")
            .agg(count(lit(1)).as("cnt"),
              sum(col("total").cast("decimal(30,2)")).cast("decimal(30,2)")
                .as("st"),
              min(col("total")).as("mn"), max(col("total")).as("mx")))
        }
        refresh()
        assert(viewNow() == truth(), s"seed $seed bootstrap")
        var nextO = 100L; var nextC = 50L
        (1 to 10).foreach { step =>
          (0 until 1 + rnd.nextInt(2)).foreach { _ =>
            rnd.nextInt(5) match {
              case 0 => // new orders, occasionally NULL totals
                SnapshotStore.append(ordT((0 until 3).map(k =>
                  (nextO + k, s"st${rnd.nextInt(2)}",
                    if (rnd.nextInt(4) == 0) None
                    else Some(rnd.nextInt(100) * 1.0))): _*), r)
                nextO += 3
              case 1 => // delete an order band (often holds group extrema)
                SnapshotStore.deleteWhere(spark, r,
                  col("o_id") % 5 === rnd.nextInt(5).toLong)
              case 2 => // keyed upsert rewrites totals (and maybe status)
                val base = 1L + rnd.nextInt(20)
                SnapshotStore.upsert(spark,
                  ordT((base, s"st${rnd.nextInt(2)}",
                    Some(500.0 + step))), r, Seq("o_id"))
              case 3 => // dim churn: drop a customer (maybe a null-seg one)
                SnapshotStore.deleteWhere(spark, l,
                  col("c_id") === (1L + rnd.nextInt(25)))
              case 4 => // dim growth: new customer, sometimes null seg
                SnapshotStore.append(custT((nextC,
                  if (rnd.nextInt(6) == 0) null
                  else s"s${rnd.nextInt(4)}")), l)
                nextC += 1
            }
          }
          refresh()
          assert(viewNow() == truth(), s"seed $seed diverged after step $step")
        }
        AggJoinView.compact(spark, v)
        assert(viewNow() == truth(), s"seed $seed post-compact")
      } finally SnapshotStore.deleteTree(root)
    }
  }
}
