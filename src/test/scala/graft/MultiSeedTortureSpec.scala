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

  // ---- multi-way (snowflake) agg-join MV torture ------------------------
  // Random commit sequences across the FIVE tables of the q9-shaped tree
  // (appends, deletes, group-moving dim upserts — sometimes several
  // tables inside one refresh gap, plus occasional view compactions and a
  // source compaction forcing the rebuild path). After every refresh the
  // merged partials must equal the from-scratch GROUP BY over the current
  // 5-way join — the telescoping identity has no untested composition.
  test("multi-way agg-join MV: 3-seed random-lifecycle torture") {
    import graft.sources.MultiAggJoinView
    import graft.sources.MultiAggJoinView.Edge
    val s = spark
    import s.implicits._
    val edges = Seq(
      Edge(0, Seq("f_pk"), Seq("p_pk")),
      Edge(0, Seq("f_sk"), Seq("s_sk")),
      Edge(2, Seq("s_nk"), Seq("n_nk")))
    val groups = Seq("p_brand", "n_name")
    def factDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, i % 7, i % 5, i * 1.0)).toDF("f_ok", "f_pk", "f_sk", "qty")
    def partDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, s"brand${i % 3}")).toDF("p_pk", "p_brand")
    def suppDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, i % 3)).toDF("s_sk", "s_nk")
    def nationDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, s"nation$i")).toDF("n_nk", "n_name")
    def truth(roots: Seq[String]): Set[String] = {
      val Seq(f, p, su, n) = roots.map(SnapshotStore.read(spark, _))
      f.join(p, f("f_pk") === p("p_pk"))
        .join(su, f("f_sk") === su("s_sk"))
        .join(n, su("s_nk") === n("n_nk"))
        .groupBy("p_brand", "n_name")
        .agg(count(lit(1)).as("cnt"),
          sum(col("qty").cast("decimal(30,2)")).cast("decimal(30,2)").as("sum_qty"))
        .collect().map(_.toString).toSet
    }
    def viewRows(v: String): Set[String] =
      MultiAggJoinView.read(spark, v)
        .select(col("p_brand"), col("n_name"), col("cnt"), col("sum_qty"))
        .collect().map(_.toString).toSet
    Seq(131, 2424, 35353).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory(s"majt$seed").toString
      val roots = Seq(s"$root/F", s"$root/P", s"$root/S", s"$root/N")
      val v = s"$root/V"
      try {
        val rnd = new scala.util.Random(seed)
        SnapshotStore.append(factDF(1L to 50L), roots(0))
        SnapshotStore.append(partDF(0L to 6L), roots(1))
        SnapshotStore.append(suppDF(0L to 4L), roots(2))
        SnapshotStore.append(nationDF(0L to 2L), roots(3))
        MultiAggJoinView.refresh(spark, roots, v, edges, groups, Seq("qty"))
        assert(viewRows(v) == truth(roots), s"seed $seed bootstrap")
        var nextF = 1000L
        (1 to 7).foreach { round =>
          // 1..3 commits land across random tables before ONE refresh
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            rnd.nextInt(6) match {
              case 0 => // fact append
                SnapshotStore.append(
                  factDF(nextF until nextF + 10L), roots(0)); nextF += 10
              case 1 => // fact delete (some slice)
                SnapshotStore.deleteWhere(spark, roots(0),
                  col("f_ok") % 7 === rnd.nextInt(7).toLong)
              case 2 => // group-moving nation upsert
                SnapshotStore.upsert(spark,
                  nationDF(Seq(rnd.nextInt(3).toLong))
                    .withColumn("n_name",
                      concat(col("n_name"), lit(s"_r$round"))),
                  roots(3), Seq("n_nk"))
              case 3 => // supplier re-pointing (moves rows between nations)
                SnapshotStore.upsert(spark,
                  Seq((rnd.nextInt(5).toLong, rnd.nextInt(3).toLong)).toDF("s_sk", "s_nk"),
                  roots(2), Seq("s_sk"))
              case 4 => // part churn: delete then revive a part
                val pk = rnd.nextInt(7).toLong
                SnapshotStore.deleteWhere(spark, roots(1), col("p_pk") === pk)
              case 5 => // part revive/extend
                SnapshotStore.append(partDF(Seq(rnd.nextInt(7).toLong)), roots(1))
            }
          }
          MultiAggJoinView.refresh(spark, roots, v, edges, groups, Seq("qty"))
          assert(viewRows(v) == truth(roots), s"seed $seed round $round")
          if (round == 4) { // fold the signed residue mid-sequence
            MultiAggJoinView.compact(spark, v)
            assert(viewRows(v) == truth(roots), s"seed $seed round $round compact")
          }
        }
        // a source compaction breaks the diff: the next refresh rebuilds
        SnapshotStore.compact(spark, roots(0))
        SnapshotStore.append(factDF(nextF until nextF + 5L), roots(0))
        MultiAggJoinView.refresh(spark, roots, v, edges, groups, Seq("qty"))
        assert(viewRows(v) == truth(roots), s"seed $seed post-compaction")
      } finally SnapshotStore.deleteTree(root)
    }
  }

  test("multi-way NDV MV: 3-seed random-lifecycle torture (bit-equal to the single-pass estimate)") {
    import graft.sources.{MultiNdvJoinView, NdvView}
    import graft.sources.MultiAggJoinView.Edge
    val s = spark
    import s.implicits._
    val edges = Seq(
      Edge(0, Seq("f_pk"), Seq("p_pk")),
      Edge(0, Seq("f_sk"), Seq("s_sk")),
      Edge(2, Seq("s_nk"), Seq("n_nk")))
    val groups = Seq("p_brand", "n_name")
    def factDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, i % 7, i % 5, s"u${i % 13}"))
        .toDF("f_ok", "f_pk", "f_sk", "user_id")
    def partDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, s"brand${i % 3}")).toDF("p_pk", "p_brand")
    def suppDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, i % 3)).toDF("s_sk", "s_nk")
    def nationDF(ids: Seq[Long]): DataFrame =
      ids.map(i => (i, s"nation$i")).toDF("n_nk", "n_name")
    def truth(roots: Seq[String]): Set[String] = {
      val Seq(f, p, su, n) = roots.map(SnapshotStore.read(spark, _))
      f.join(p, f("f_pk") === p("p_pk"))
        .join(su, f("f_sk") === su("s_sk"))
        .join(n, su("s_nk") === n("n_nk"))
        .groupBy("p_brand", "n_name")
        .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(user_id, " +
          s"${NdvView.LgK}))").as("approx_user_id"))
        .collect().map(_.toString).toSet
    }
    def viewRows(v: String): Set[String] =
      MultiNdvJoinView.read(spark, v)
        .select(col("p_brand"), col("n_name"), col("approx_user_id"))
        .collect().map(_.toString).toSet
    Seq(77, 888, 9999).foreach { seed =>
      val root = java.nio.file.Files.createTempDirectory(s"mnjt$seed").toString
      val roots = Seq(s"$root/F", s"$root/P", s"$root/S", s"$root/N")
      val v = s"$root/V"
      try {
        val rnd = new scala.util.Random(seed)
        SnapshotStore.append(factDF(1L to 50L), roots(0))
        SnapshotStore.append(partDF(0L to 6L), roots(1))
        SnapshotStore.append(suppDF(0L to 4L), roots(2))
        SnapshotStore.append(nationDF(0L to 2L), roots(3))
        MultiNdvJoinView.refresh(spark, roots, v, edges, groups, "user_id")
        assert(viewRows(v) == truth(roots), s"seed $seed bootstrap")
        var nextF = 1000L
        (1 to 7).foreach { round =>
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            rnd.nextInt(6) match {
              case 0 =>
                SnapshotStore.append(
                  factDF(nextF until nextF + 10L), roots(0)); nextF += 10
              case 1 =>
                SnapshotStore.deleteWhere(spark, roots(0),
                  col("f_ok") % 7 === rnd.nextInt(7).toLong)
              case 2 =>
                SnapshotStore.upsert(spark,
                  nationDF(Seq(rnd.nextInt(3).toLong))
                    .withColumn("n_name",
                      concat(col("n_name"), lit(s"_r$round"))),
                  roots(3), Seq("n_nk"))
              case 3 =>
                SnapshotStore.upsert(spark,
                  Seq((rnd.nextInt(5).toLong, rnd.nextInt(3).toLong)).toDF("s_sk", "s_nk"),
                  roots(2), Seq("s_sk"))
              case 4 =>
                val pk = rnd.nextInt(7).toLong
                SnapshotStore.deleteWhere(spark, roots(1), col("p_pk") === pk)
              case 5 =>
                SnapshotStore.append(partDF(Seq(rnd.nextInt(7).toLong)), roots(1))
            }
          }
          MultiNdvJoinView.refresh(spark, roots, v, edges, groups, "user_id")
          assert(viewRows(v) == truth(roots), s"seed $seed round $round")
          if (round == 4) {
            MultiNdvJoinView.compact(spark, v)
            assert(viewRows(v) == truth(roots), s"seed $seed round $round compact")
          }
        }
        SnapshotStore.compact(spark, roots(0))
        SnapshotStore.append(factDF(nextF until nextF + 5L), roots(0))
        MultiNdvJoinView.refresh(spark, roots, v, edges, groups, "user_id")
        assert(viewRows(v) == truth(roots), s"seed $seed post-compaction")
      } finally SnapshotStore.deleteTree(root)
    }
  }
}
