package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{JoinView, SnapshotStore}

/** Join-view IVM contract: after ANY commit sequence on either source,
  * the maintained view's content equals the from-scratch join, and each
  * maintenance path publishes the commit KIND it claims (append for
  * deltas, compact for rewrites). */
class JoinViewSpec extends SparkSpec {

  private def ordersDF(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"cust${i % 3}", i * 10.0)).toDF("o_id", "cust", "total")
  }

  private def linesDF(rows: (Long, Long, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (o, ln, q) => (o, ln, q) }.toDF("lo_id", "ln", "qty")
  }

  private def withRoots(f: (String, String, String) => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("jv_spec").toString
    try f(s"$root/L", s"$root/R", s"$root/V")
    finally SnapshotStore.deleteTree(root)
  }

  private def viewRows(v: String): Set[(Long, String, Double, Long, Double)] =
    JoinView.read(spark, v).collect()
      .map(r => (r.getAs[Long]("o_id"), r.getAs[String]("cust"),
        r.getAs[Double]("total"), r.getAs[Long]("ln"), r.getAs[Double]("qty")))
      .toSet

  private def truth(l: String, r: String): Set[(Long, String, Double, Long, Double)] = {
    val lf = SnapshotStore.read(spark, l)
    val rf = SnapshotStore.read(spark, r)
    lf.join(rf, lf("o_id") === rf("lo_id")).collect()
      .map(x => (x.getAs[Long]("o_id"), x.getAs[String]("cust"),
        x.getAs[Double]("total"), x.getAs[Long]("ln"), x.getAs[Double]("qty")))
      .toSet
  }

  private def lastOp(v: String): String =
    SnapshotStore.manifestOp(v, SnapshotStore.currentVersion(v)).getOrElse("?")

  test("bootstrap, left/right/both append deltas — each equals the rejoin") {
    withRoots { (l, r, v) =>
      SnapshotStore.append(ordersDF(1, 2, 3), l)
      SnapshotStore.append(linesDF((1, 1, 5.0), (2, 1, 7.0), (9, 1, 1.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v) == truth(l, r) && viewRows(v).size == 2)

      SnapshotStore.append(ordersDF(9, 10), l) // left-only: 9 now matches
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v) == truth(l, r) && lastOp(v) == "append")

      SnapshotStore.append(linesDF((3, 1, 2.0), (10, 1, 4.0), (10, 2, 6.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v) == truth(l, r) && lastOp(v) == "append")

      // both sides move before one refresh — ΔL⋈ΔR must appear exactly once
      SnapshotStore.append(ordersDF(20), l)
      SnapshotStore.append(linesDF((20, 1, 8.0), (20, 2, 9.0), (1, 2, 3.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v) == truth(l, r) && lastOp(v) == "append")

      // no-change refresh is a no-op (same cursors, same version)
      val before = SnapshotStore.currentVersion(v)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(SnapshotStore.currentVersion(v) == before)
    }
  }

  test("retraction: source deletes/upserts rewrite only dirty keys") {
    withRoots { (l, r, v) =>
      SnapshotStore.append(ordersDF(1L to 20L: _*), l)
      SnapshotStore.append(
        linesDF((1L to 20L).flatMap(o => Seq((o, 1L, o * 1.0), (o, 2L, o * 2.0))): _*), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v).size == 40)

      SnapshotStore.deleteWhere(spark, l, col("o_id") % 5 === 0)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v) == truth(l, r) && viewRows(v).size == 32)
      assert(lastOp(v) == "compact") // the rewrite path, not a blind append

      // keyed upsert on the right: changed rows re-join, others survive
      SnapshotStore.upsert(spark, linesDF((1, 1, 99.0), (21, 1, 21.0)), r,
        Seq("lo_id", "ln"))
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v) == truth(l, r))
      assert(viewRows(v).exists(t => t._1 == 1L && t._4 == 1L && t._5 == 99.0))
    }
  }

  test("a source compaction forces one rebuild; content unchanged") {
    withRoots { (l, r, v) =>
      SnapshotStore.append(ordersDF(1, 2), l)
      SnapshotStore.append(linesDF((1, 1, 1.0), (2, 1, 2.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      val content = viewRows(v)
      SnapshotStore.compact(spark, l)
      SnapshotStore.append(ordersDF(3), l)
      SnapshotStore.append(linesDF((3, 1, 3.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(lastOp(v) == "compact")
      assert(viewRows(v) == truth(l, r) && viewRows(v).size == content.size + 1)
    }
  }

  test("non-key column collision fails loudly at bootstrap") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(Seq((1L, "x")).toDF("o_id", "shared"), l)
      SnapshotStore.append(Seq((1L, "y")).toDF("lo_id", "shared"), r)
      val e = intercept[IllegalArgumentException] {
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      }
      assert(e.getMessage.contains("shared"))
      assert(SnapshotStore.currentVersion(v) == 0) // nothing published
    }
  }

  test("stats-carrying sources: a delta refresh file-prunes the standing side") {
    withRoots { (l, r, v) =>
      // monotone ingest keys, stats recorded per append — the standing
      // side's old files cover key ranges a NEW delta can never match
      (0 until 6).foreach { i =>
        SnapshotStore.appendWithStats(
          ordersDF((i * 100L) until (i * 100L + 100L): _*), l, Seq("o_id"))
        SnapshotStore.appendWithStats(
          linesDF(((i * 100L) until (i * 100L + 100L)).map(o => (o, 1L, 1.0)): _*),
          r, Seq("lo_id"))
      }
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(viewRows(v).size == 600)
      // one new-range left delta: its keys overlap NO existing right file
      // except none — but the join content must still be exact
      SnapshotStore.appendWithStats(ordersDF(100L to 150L: _*), l, Seq("o_id"))
      // the pruned standing read: [100,150] overlaps only dir 1 of 6
      val (sel, total) = SnapshotStore.planFiles(spark, r, -1, "lo_id", 100L, 150L)
      assert(sel.size < total, s"standing side unpruned: ${sel.size} of $total")
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      // duplicate orders for keys 100..150 now: 51 extra join rows each
      assert(viewRows(v) == truth(l, r))
      assert(JoinView.read(spark, v).count() == 651)
    }
  }

  test("mixed-type key pairs and shadowing right keys refuse loudly") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      // int left key vs long right key: the composite bloom hashes by
      // type, so a mixed pair would silently drop matches — refuse
      SnapshotStore.append(Seq((1, "x")).toDF("k", "p"), l) // k: Int
      SnapshotStore.append(Seq((1L, 9.0)).toDF("fk", "q"), r) // fk: Long
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "k", "fk"))
      assert(e.getMessage.contains("dataType"))
      assert(SnapshotStore.currentVersion(v) == 0)
    }
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      // right key 'b' paired with left 'a' while left ALSO has a column
      // named 'b': the rewrite's by-name resolution would serve the
      // wrong column — refuse at bootstrap
      SnapshotStore.append(Seq((1L, 2L)).toDF("a", "b"), l)
      SnapshotStore.append(Seq((1L, 3.0)).toDF("b", "y"), r)
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "a", "b"))
      assert(e.getMessage.contains("shadows"))
      assert(SnapshotStore.currentVersion(v) == 0)
    }
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      // non-key collision check is case-INSENSITIVE like the rewrite's
      // by-name resolution: left 'Amount' vs right 'amount' would
      // collapse to one entry in JoinRewriteRule's lowercased name map —
      // refuse at bootstrap, at the cause
      SnapshotStore.append(Seq((1L, 2.0)).toDF("a", "Amount"), l)
      SnapshotStore.append(Seq((1L, 3.0)).toDF("fk", "amount"), r)
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "a", "fk"))
      assert(e.getMessage.contains("collide"))
      assert(SnapshotStore.currentVersion(v) == 0)
    }
  }

  test("left-outer view: bootstrap, deltas, match arrival, churn — each equals the re-join") {
    withRoots { (l, r, v) =>
      def refresh(): Unit =
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      val cols = Seq("o_id", "cust", "total", "lo_id", "ln", "qty")
      def outerTruth(): Seq[String] = {
        val lf = SnapshotStore.read(spark, l)
        val rf = SnapshotStore.read(spark, r)
        lf.join(rf, lf("o_id") === rf("lo_id"), "left_outer")
          .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      }
      def viewNow(): Seq[String] = JoinView.read(spark, v)
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq

      // bootstrap: orders 1..10, lines only for 1..5 → 5 matched + 5 null
      SnapshotStore.append(ordersDF(1L to 10L: _*), l)
      SnapshotStore.append(linesDF((1L to 5L).map(i => (i, i, i * 2.0)): _*), r)
      refresh()
      assert(viewNow() == outerTruth() && lastOp(v) == "append")
      assert(JoinView.read(spark, v).where(col("lo_id").isNull).count() == 5)

      // left-only delta with unmatched rows: pure append (they null-extend)
      SnapshotStore.append(ordersDF(11L, 12L), l)
      refresh()
      assert(viewNow() == outerTruth() && lastOp(v) == "append")

      // MATCH ARRIVAL: lines for 6 and 7 — their null rows must retract
      SnapshotStore.append(linesDF((6L, 60L, 1.0), (7L, 70L, 1.0)), r)
      refresh()
      assert(viewNow() == outerTruth(), "match arrival left stale null rows")
      assert(lastOp(v) == "compact", "conversion must publish as a rewrite")
      assert(JoinView.read(spark, v)
        .where(col("o_id").isin(6L, 7L) && col("lo_id").isNull).count() == 0)

      // right delta touching only MATCHED (1) and ABSENT (99) keys: no
      // null row converts → the refresh stays a pure O(Δ) append
      SnapshotStore.append(linesDF((1L, 100L, 3.0), (99L, 990L, 9.0)), r)
      refresh()
      assert(viewNow() == outerTruth() && lastOp(v) == "append")
      // the right-only row (99) contributes nothing to a LEFT outer view
      assert(JoinView.read(spark, v).where(col("ln") === 990L).isEmpty)

      // churn: deleting key 6's lines re-null-extends it; deleting left
      // 11 removes its null row; an upsert-style delete+append recomputes
      SnapshotStore.deleteWhere(spark, r, col("lo_id") === 6L)
      SnapshotStore.deleteWhere(spark, l, col("o_id") === 11L)
      refresh()
      assert(viewNow() == outerTruth(), "churn recompute broke outer semantics")
      assert(JoinView.read(spark, v)
        .where(col("o_id") === 6L && col("lo_id").isNull).count() == 1,
        "right-side delete must re-null-extend the left row")

      // a later refresh (with real work pending — a cursor-matched call
      // no-ops before publishing anything) must replay the SAME join type
      SnapshotStore.append(ordersDF(20L), l)
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id"))
      assert(e.getMessage.contains("left_outer"))
    }
    // outer bootstrap refuses shared key names (both key sets are kept)
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(Seq((1L, "x")).toDF("k", "p"), l)
      SnapshotStore.append(Seq((1L, 9.0)).toDF("k", "q"), r)
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "k", "k", "left_outer"))
      assert(e.getMessage.contains("collide"))
      assert(SnapshotStore.currentVersion(v) == 0)
    }
  }

  test("outer view churn maintains NULL-key left rows (delete retracts, insert lands)") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      // a null-key left row (the optional-FK shape): bootstrap must
      // null-extend it like any unmatched row
      SnapshotStore.append(
        Seq((Option.empty[Long], "cnull", 0.0), (Some(1L), "c1", 10.0),
          (Some(2L), "c2", 20.0)).toDF("o_id", "cust", "total"), l)
      SnapshotStore.append(linesDF((1L, 1L, 5.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      assert(JoinView.read(spark, v)
        .where(col("o_id").isNull && col("lo_id").isNull).count() == 1)
      // CHURN deleting the null-key row: the dirty machinery must be
      // able to target it (null-safe key equality) — === would strand
      // it in the view forever
      SnapshotStore.deleteWhere(spark, l, col("o_id").isNull)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      assert(JoinView.read(spark, v).where(col("o_id").isNull).count() == 0,
        "deleted null-key left row stranded in the outer view")
      // a null-key row arriving WITHIN a churn-op refresh range must
      // materialize (the recompute's semi-join must match it too); the
      // real right-side delete both forces the churn path and
      // re-null-extends key 1
      SnapshotStore.deleteWhere(spark, r, col("lo_id") === 1L)
      SnapshotStore.append(
        Seq((Option.empty[Long], "cback", 7.0)).toDF("o_id", "cust", "total"), l)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      assert(JoinView.read(spark, v)
        .where(col("o_id").isNull && col("cust") === "cback").count() == 1,
        "churn-range null-key insert dropped from the outer view")
      // full truth check
      val lf = SnapshotStore.read(spark, l); val rf = SnapshotStore.read(spark, r)
      val want = lf.join(rf, lf("o_id") === rf("lo_id"), "left_outer")
        .select("o_id", "cust", "total", "lo_id", "ln", "qty")
        .collect().map(_.toString).sorted.toSeq
      assert(JoinView.read(spark, v)
        .select("o_id", "cust", "total", "lo_id", "ln", "qty")
        .collect().map(_.toString).sorted.toSeq == want)
    }
  }

  test("a widened source forces ONE rebuild under the new schema; deltas then resume O(Δ)") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(ordersDF(1L, 2L, 3L), l)
      SnapshotStore.append(linesDF((1L, 1L, 5.0), (2L, 1L, 7.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(!JoinView.read(spark, v).columns.contains("note"))
      // the left source widens ADDITIVELY (the evolveSchema contract)
      SnapshotStore.append(
        Seq((4L, "cust1", 40.0, "n4")).toDF("o_id", "cust", "total", "note"), l)
      SnapshotStore.append(linesDF((4L, 1L, 9.0), (3L, 1L, 2.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      // the refresh detected the shape change and rebuilt — not a mixed-
      // schema delta append that a plain read would silently narrow
      assert(lastOp(v) == "compact", "schema change must rebuild, not append")
      val got = JoinView.read(spark, v)
        .select("o_id", "ln", "qty", "note").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
          Option(x.getString(3)))).toSet
      // pre-evolution rows read the new column as null; the widened row
      // carries its value — never dropped
      assert(got == Set((1L, 1L, 5.0, None), (2L, 1L, 7.0, None),
        (3L, 1L, 2.0, None), (4L, 1L, 9.0, Some("n4"))))
      // subsequent appends resume the O(Δ) delta path, and a NARROW
      // post-evolution append (legal: additive contract) still reads the
      // full shape into the view
      SnapshotStore.append(ordersDF(5L), l) // narrow batch, no 'note'
      SnapshotStore.append(linesDF((5L, 2L, 1.0)), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      assert(lastOp(v) == "append", "post-evolution delta lost the O(Δ) path")
      assert(JoinView.read(spark, v).where(col("o_id") === 5L)
        .select("note").collect().map(x => Option(x.getString(0))).toSeq
        == Seq(None))
      // an evolution that INTRODUCES a collision refuses pre-publish
      SnapshotStore.append(
        Seq((9L, 9L, 1.0, "x")).toDF("lo_id", "ln", "qty", "note"), r)
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id"))
      assert(e.getMessage.contains("collide"))
    }
  }

  test("a widened source rebuilds a FULL-outer view once; unmatched rows keep null-filling") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      def refresh(): Unit =
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")
      def fullTruth(): Seq[String] = {
        val lf = SnapshotStore.read(spark, l, mergeSchema = true)
        val rf = SnapshotStore.read(spark, r, mergeSchema = true)
        lf.join(rf, lf("o_id") === rf("lo_id"), "full_outer")
          .select("o_id", "cust", "total", "lo_id", "ln", "qty", "note")
          .collect().map(_.toString).sorted.toSeq
      }
      // bootstrap with unmatched rows on both sides
      SnapshotStore.append(ordersDF(1L, 2L, 3L), l)
      SnapshotStore.append(linesDF((2L, 1L, 5.0), (9L, 1L, 7.0)), r)
      refresh()
      // the RIGHT source widens (the side whose keys the full view keeps)
      SnapshotStore.append(
        Seq((3L, 2L, 9.0, "n3")).toDF("lo_id", "ln", "qty", "note"), r)
      refresh()
      assert(lastOp(v) == "compact",
        "full-outer schema change must rebuild, not append")
      assert(JoinView.read(spark, v)
        .select("o_id", "cust", "total", "lo_id", "ln", "qty", "note")
        .collect().map(_.toString).sorted.toSeq == fullTruth(),
        "full-outer rebuild diverged from the evolved re-join")
      // unmatched-LEFT rows (o_id 1) read the evolved right column as
      // null; the unmatched-RIGHT row (lo_id 9) survived the rebuild
      assert(JoinView.read(spark, v)
        .where(col("o_id") === 1L && col("note").isNull).count() == 1)
      assert(JoinView.read(spark, v).where(col("lo_id") === 9L).count() == 1)
      // a NON-converting narrow delta resumes the O(Δ) append path with
      // null fill — including the full-only unmatched-ΔR term (key 42)
      SnapshotStore.append(linesDF((2L, 9L, 2.0), (42L, 1L, 1.0)), r)
      refresh()
      assert(lastOp(v) == "append",
        "post-evolution non-converting delta lost the O(Δ) path")
      assert(JoinView.read(spark, v)
        .select("o_id", "cust", "total", "lo_id", "ln", "qty", "note")
        .collect().map(_.toString).sorted.toSeq == fullTruth(),
        "post-evolution full-outer delta diverged")
      assert(JoinView.read(spark, v)
        .where(col("lo_id") === 42L && col("o_id").isNull).count() == 1,
        "unmatched narrow ΔR row lost its null extension post-evolution")
      // and a CONVERTING delta (lines land for the waiting o_id 1) still
      // rewrites correctly under the evolved schema
      SnapshotStore.append(linesDF((1L, 3L, 2.0)), r)
      refresh()
      assert(lastOp(v) == "compact",
        "post-evolution match arrival must publish as a rewrite")
      assert(JoinView.read(spark, v)
        .select("o_id", "cust", "total", "lo_id", "ln", "qty", "note")
        .collect().map(_.toString).sorted.toSeq == fullTruth(),
        "post-evolution conversion diverged")
    }
  }

  test("lifecycle torture: view == rejoin after every commit of a mixed sequence") {
    withRoots { (l, r, v) =>
      // a fixed pseudo-random (seeded → deterministic) interleaving of
      // append/delete/upsert on both sides, refreshing and re-checking
      // the invariant after EVERY commit — the paths compose in orders
      // the targeted specs don't enumerate
      val rnd = new scala.util.Random(42)
      SnapshotStore.append(ordersDF(1L to 30L: _*), l)
      SnapshotStore.append(linesDF((1L to 30L).map(o => (o, 1L, o * 1.0)): _*), r)
      var nextO = 31L
      var nextLn = 2L
      (1 to 12).foreach { step =>
        rnd.nextInt(5) match {
          case 0 => // left append
            SnapshotStore.append(ordersDF(nextO, nextO + 1), l); nextO += 2
          case 1 => // right append (mix of new and existing orders)
            SnapshotStore.append(
              linesDF((nextO - 2, nextLn, step * 1.0),
                (1L + rnd.nextInt(20), nextLn, step * 2.0)), r)
            nextLn += 1
          case 2 => // left delete
            SnapshotStore.deleteWhere(spark, l,
              col("o_id") % 7 === (step % 7).toLong)
          case 3 => // right delete
            SnapshotStore.deleteWhere(spark, r,
              col("qty") > (40.0 - step))
          case 4 => // right keyed upsert
            SnapshotStore.upsert(spark,
              linesDF((1L + rnd.nextInt(25), 1L, 1000.0 + step)),
              r, Seq("lo_id", "ln"))
        }
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
        assert(viewRows(v) == truth(l, r), s"diverged after step $step")
      }
    }
  }

  test("OUTER lifecycle torture: view == left re-join after every commit of a mixed sequence") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      // seeded → deterministic interleaving over the LEFT-OUTER view:
      // every inner-torture op plus the outer-only hazards — unmatched
      // left rows, match arrivals converting standing null rows,
      // right-side deletes re-null-extending, and a NULL-key left row
      // churning through the middle of the sequence
      def outerTruth(): Seq[String] = {
        val lf = SnapshotStore.read(spark, l)
        val rf = SnapshotStore.read(spark, r)
        lf.join(rf, lf("o_id") === rf("lo_id"), "left_outer")
          .select("o_id", "cust", "total", "lo_id", "ln", "qty")
          .collect().map(_.toString).sorted.toSeq
      }
      def viewNow(): Seq[String] = JoinView.read(spark, v)
        .select("o_id", "cust", "total", "lo_id", "ln", "qty")
        .collect().map(_.toString).sorted.toSeq
      def refresh(): Unit =
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer")
      val rnd = new scala.util.Random(1337)
      // orders 1..30, lines only for 1..15: half the view null-extends
      SnapshotStore.append(ordersDF(1L to 30L: _*), l)
      SnapshotStore.append(linesDF((1L to 15L).map(o => (o, 1L, o * 1.0)): _*), r)
      refresh()
      assert(viewNow() == outerTruth(), "diverged at bootstrap")
      var nextO = 31L
      var nextLn = 2L
      (1 to 14).foreach { step =>
        rnd.nextInt(6) match {
          case 0 => // left append (new, unmatched → null rows)
            SnapshotStore.append(ordersDF(nextO, nextO + 1), l); nextO += 2
          case 1 => // right append hitting standing UNMATCHED keys: the
                    // match-arrival conversion, plus a duplicate match
            SnapshotStore.append(
              linesDF((16L + rnd.nextInt(14), nextLn, step * 1.0),
                (1L + rnd.nextInt(10), nextLn, step * 2.0)), r)
            nextLn += 1
          case 2 => // left delete (may remove matched AND null rows)
            SnapshotStore.deleteWhere(spark, l,
              col("o_id") % 9 === (step % 9).toLong)
          case 3 => // right delete: survivors must RE-null-extend
            SnapshotStore.deleteWhere(spark, r,
              col("qty") > (25.0 - step))
          case 4 => // right keyed upsert
            SnapshotStore.upsert(spark,
              linesDF((1L + rnd.nextInt(25), 1L, 1000.0 + step)),
              r, Seq("lo_id", "ln"))
          case 5 => // null-key left row in, mid-sequence
            SnapshotStore.append(
              Seq((Option.empty[Long], s"cnull$step", step * 1.0))
                .toDF("o_id", "cust", "total"), l)
        }
        refresh()
        assert(viewNow() == outerTruth(), s"diverged after step $step")
      }
      // end with the null-key rows churning OUT
      SnapshotStore.deleteWhere(spark, l, col("o_id").isNull)
      refresh()
      assert(viewNow() == outerTruth(), "diverged after null-key purge")
    }
  }

  test("full-outer view: bootstrap, deltas, SYMMETRIC match arrival, churn — each equals the re-join") {
    withRoots { (l, r, v) =>
      val cols = Seq("o_id", "cust", "total", "lo_id", "ln", "qty")
      def fullTruth(): Seq[String] = {
        val lf = SnapshotStore.read(spark, l)
        val rf = SnapshotStore.read(spark, r)
        lf.join(rf, lf("o_id") === rf("lo_id"), "full_outer")
          .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      }
      def viewNow(): Seq[String] = JoinView.read(spark, v)
        .select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
      def refresh(): Unit =
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")

      // bootstrap: orders 1..6, lines for 4..9 → 3 matched, 3 null-right
      // (unmatched left 1..3), 3 null-left (unmatched right 7..9)
      SnapshotStore.append(ordersDF(1L to 6L: _*), l)
      SnapshotStore.append(linesDF((4L to 9L).map(i => (i, i, i * 2.0)): _*), r)
      refresh()
      assert(viewNow() == fullTruth() && lastOp(v) == "append")
      assert(JoinView.read(spark, v).where(col("lo_id").isNull).count() == 3)
      assert(JoinView.read(spark, v).where(col("o_id").isNull).count() == 3)

      // LEFT delta converting standing null-LEFT rows (orders 7, 8 land
      // for waiting lines — the ΔL-direction match arrival) plus a new
      // unmatched order: the conversion publishes as a rewrite
      SnapshotStore.append(ordersDF(7L, 8L, 11L), l)
      refresh()
      assert(viewNow() == fullTruth(), "ΔL match arrival left stale null-left rows")
      assert(lastOp(v) == "compact", "ΔL conversion must publish as a rewrite")
      assert(JoinView.read(spark, v)
        .where(col("lo_id").isin(7L, 8L) && col("o_id").isNull).count() == 0)

      // LEFT delta with only new unmatched keys: pure O(Δ) append
      SnapshotStore.append(ordersDF(12L, 13L), l)
      refresh()
      assert(viewNow() == fullTruth() && lastOp(v) == "append")

      // RIGHT delta converting standing null-RIGHT rows (lines for order
      // 1) — the ΔR-direction match arrival
      SnapshotStore.append(linesDF((1L, 100L, 1.0)), r)
      refresh()
      assert(viewNow() == fullTruth(), "ΔR match arrival left stale null-right rows")
      assert(lastOp(v) == "compact")

      // RIGHT delta touching only matched (4) and ABSENT (99) keys: no
      // conversion → pure append; 99 lands null-LEFT (the full-only term)
      SnapshotStore.append(linesDF((4L, 101L, 1.0), (99L, 990L, 9.0)), r)
      refresh()
      assert(viewNow() == fullTruth() && lastOp(v) == "append")
      assert(JoinView.read(spark, v)
        .where(col("ln") === 990L && col("o_id").isNull).count() == 1,
        "unmatched ΔR row must null-extend into a full view")

      // BOTH sides move in ONE refresh and the deltas match EACH OTHER:
      // the pair must appear exactly once (lPart carries ΔL×ΔR; the
      // unmatched-right determination runs against L_new, not L_old)
      SnapshotStore.append(ordersDF(50L), l)
      SnapshotStore.append(linesDF((50L, 500L, 5.0)), r)
      refresh()
      assert(viewNow() == fullTruth(), "same-refresh ΔL×ΔR pair duplicated or null-extended")
      assert(JoinView.read(spark, v).where(col("ln") === 500L).count() == 1)

      // churn, all three full-outer shapes at once: right delete of a
      // matched key re-null-extends LEFT (order 4); left delete of a
      // matched key re-null-extends RIGHT (lines of 5); right delete of
      // an unmatched-right key retracts its null-left row (99 — the
      // coalesce survivor key)
      SnapshotStore.deleteWhere(spark, r, col("lo_id") === 4L)
      SnapshotStore.deleteWhere(spark, l, col("o_id") === 5L)
      refresh()
      assert(viewNow() == fullTruth(), "churn recompute broke full-outer semantics")
      SnapshotStore.deleteWhere(spark, r, col("lo_id") === 99L)
      refresh()
      assert(viewNow() == fullTruth())
      assert(JoinView.read(spark, v).where(col("ln") === 990L).isEmpty,
        "churned unmatched-right row stranded (survivors matched on left key only)")
      assert(JoinView.read(spark, v)
        .where(col("o_id") === 4L && col("lo_id").isNull).count() == 1)
      assert(JoinView.read(spark, v)
        .where(col("lo_id") === 5L && col("o_id").isNull).count() == 1,
        "left delete must re-null-extend the surviving right rows")

      // join-type discipline: a pending refresh under another type refuses
      SnapshotStore.append(ordersDF(60L), l)
      val e = intercept[IllegalArgumentException](
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "left_outer"))
      assert(e.getMessage.contains("full_outer"))
    }
  }

  test("full-outer view churn maintains NULL-key rows on BOTH sides") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
      def refresh(): Unit =
        JoinView.refresh(spark, l, r, v, "o_id", "lo_id", "full_outer")
      def truthNow(): Seq[String] = {
        val lf = SnapshotStore.read(spark, l)
        val rf = SnapshotStore.read(spark, r)
        lf.join(rf, lf("o_id") === rf("lo_id"), "full_outer")
          .select("o_id", "cust", "total", "lo_id", "ln", "qty")
          .collect().map(_.toString).sorted.toSeq
      }
      def viewNow(): Seq[String] = JoinView.read(spark, v)
        .select("o_id", "cust", "total", "lo_id", "ln", "qty")
        .collect().map(_.toString).sorted.toSeq
      // null keys on BOTH sides null-extend independently (null never
      // equi-matches, not even null-to-null)
      SnapshotStore.append(
        Seq((Option.empty[Long], "cnull", 0.0), (Some(1L), "c1", 10.0))
          .toDF("o_id", "cust", "total"), l)
      SnapshotStore.append(
        Seq((Option.empty[Long], 7L, 7.0), (Some(1L), 1L, 5.0))
          .toDF("lo_id", "ln", "qty"), r)
      refresh()
      assert(viewNow() == truthNow(), "null-key bootstrap diverged")
      assert(JoinView.read(spark, v)
        .where(col("o_id").isNull && col("lo_id").isNull).count() == 2,
        "expected one null-extended row per null-key side")
      // churn deleting the null-key RIGHT row: the survivors anti-join
      // must target it through coalesce(lk, rk) <=> null
      SnapshotStore.deleteWhere(spark, r, col("lo_id").isNull)
      refresh()
      assert(viewNow() == truthNow(), "null-key right delete diverged")
      assert(JoinView.read(spark, v).where(col("ln") === 7L).isEmpty,
        "deleted null-key right row stranded in the full view")
      // churn-range null-key RIGHT insert must land (semi-join <=>)
      SnapshotStore.deleteWhere(spark, l, col("o_id") === 1L)
      SnapshotStore.append(
        Seq((Option.empty[Long], 8L, 8.0)).toDF("lo_id", "ln", "qty"), r)
      refresh()
      assert(viewNow() == truthNow(), "churn-range null-key insert diverged")
      assert(JoinView.read(spark, v).where(col("ln") === 8L).count() == 1)
    }
  }

  test("FULL-outer lifecycle torture: view == full re-join after every commit of a mixed sequence") {
    withRoots { (l, r, v) =>
      val s = spark
      import s.implicits._
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
      val rnd = new scala.util.Random(4242)
      // orders 1..30, lines for 11..40: a third unmatched on each side
      SnapshotStore.append(ordersDF(1L to 30L: _*), l)
      SnapshotStore.append(linesDF((11L to 40L).map(o => (o, 1L, o * 1.0)): _*), r)
      refresh()
      assert(viewNow() == fullTruth(), "diverged at bootstrap")
      var nextO = 41L
      var nextLn = 2L
      (1 to 16).foreach { step =>
        rnd.nextInt(7) match {
          case 0 => // left append: may CONVERT a waiting right row (31..40)
                    // and adds a brand-new unmatched order
            SnapshotStore.append(ordersDF(31L + rnd.nextInt(10), nextO), l)
            nextO += 1
          case 1 => // right append hitting standing UNMATCHED orders (the
                    // ΔR conversion) plus a duplicate match
            SnapshotStore.append(
              linesDF((1L + rnd.nextInt(10), nextLn, step * 1.0),
                (11L + rnd.nextInt(10), nextLn, step * 2.0)), r)
            nextLn += 1
          case 2 => // left delete: may re-null-extend surviving right rows
            SnapshotStore.deleteWhere(spark, l,
              col("o_id") % 9 === (step % 9).toLong)
          case 3 => // right delete: survivors re-null-extend left rows,
                    // unmatched-right rows retract outright
            SnapshotStore.deleteWhere(spark, r,
              col("qty") > (35.0 - step))
          case 4 => // right keyed upsert
            SnapshotStore.upsert(spark,
              linesDF((1L + rnd.nextInt(40), 1L, 1000.0 + step)),
              r, Seq("lo_id", "ln"))
          case 5 => // null-key LEFT row in, mid-sequence
            SnapshotStore.append(
              Seq((Option.empty[Long], s"cnull$step", step * 1.0))
                .toDF("o_id", "cust", "total"), l)
          case 6 => // null-key RIGHT row in, mid-sequence
            SnapshotStore.append(
              Seq((Option.empty[Long], 900L + step, step * 1.0))
                .toDF("lo_id", "ln", "qty"), r)
        }
        refresh()
        assert(viewNow() == fullTruth(), s"diverged after step $step")
      }
      // end with the null-key rows churning OUT of both sides
      SnapshotStore.deleteWhere(spark, l, col("o_id").isNull)
      SnapshotStore.deleteWhere(spark, r, col("lo_id").isNull)
      refresh()
      assert(viewNow() == fullTruth(), "diverged after null-key purge")
    }
  }

  test("delta path plan: standing side bloom-prefiltered, no cartesian") {
    withRoots { (l, r, v) =>
      SnapshotStore.append(ordersDF(1L to 50L: _*), l)
      SnapshotStore.append(linesDF((1L to 50L).map(o => (o, 1L, 1.0)): _*), r)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      SnapshotStore.append(ordersDF(51), l)
      JoinView.refresh(spark, l, r, v, "o_id", "lo_id")
      // audit the just-executed shape by rebuilding the delta frame
      val delta = SnapshotStore.incremental(spark, l, 1, 2)
      val pre = graft.operators.RelationalOps.bloomFilteredJoin(
        SnapshotStore.read(spark, r),
        delta.select(col("o_id").as("__bk")).distinct(), "lo_id", "__bk")
      val plan = pre.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no bloom prefilter in:\n$plan")
      assert(!plan.contains("CartesianProduct"))
      assert(viewRows(v) == truth(l, r))
    }
  }
}
