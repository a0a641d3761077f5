package graft

/** Planted-edge-case coverage for the trickiest of the TPC-H family
  * registry entries (q13/q17/q21/q22) — each on a hand-built fixture whose
  * expected answer is derived by hand, so the test pins the SEMANTICS
  * (outer-join zero preservation, strict cross-multiplied thresholds,
  * semi+anti self-join pairing, anti-join non-vacuousness), not just
  * agreement with an oracle.
  */
class TpchEdgeSpec extends SparkSpec {

  /** Write the given mini-tables as `<table>.parquet` under a temp dir the
    * registry queries can read via [[Tables]]. */
  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("tpch_edge_").toString
    tables.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  test("q13: customers with zero qualifying orders survive the left join as count 0") {
    val s = spark
    import s.implicits._
    val dir = fixtureDir(
      "customer" -> Seq(1L, 2L, 3L, 4L).toDF("c_custkey"),
      "orders" -> Seq(
        // cust 1: two qualifying orders
        (100L, 1L, "1-URGENT"), (101L, 1L, "3-MEDIUM"),
        // cust 2: only a 5-LOW order — filtered BEFORE the left join, so
        // the customer must still appear with count 0
        (102L, 2L, "5-LOW"),
        // cust 3: no orders at all
        // cust 4: one qualifying, one filtered
        (103L, 4L, "5-LOW"), (104L, 4L, "2-HIGH")
      ).toDF("o_orderkey", "o_custkey", "o_orderpriority"))
    val got = SparkEntry.queries("q13_order_distribution")(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // counts: cust1→2, cust2→0, cust3→0, cust4→1
    assert(got === Set((0L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("q17: strict cross-multiplied threshold — outlier-driven average, boundary equality excluded") {
    val s = spark
    import s.implicits._
    val part = Seq(
      (1L, "Brand#3", "SMALL"),   // outlier part: 9 small lines qualify
      (2L, "Brand#3", "SMALL"),   // boundary part: qty*cnt*5 == sum → excluded
      (3L, "Brand#9", "SMALL")    // wrong brand → excluded even though a line would qualify
    ).toDF("p_partkey", "p_brand", "p_type")
    val li = (
      // part 1: nine qty-1 lines + one qty-100 outlier; avg = 10.9 so the
      // nine small lines satisfy qty*10*5=50 < 109, the outlier does not
      (1 to 9).map(_ => (1L, 1.0, 10.0)) ++ Seq((1L, 100.0, 999.0)) ++
      // part 2: qty 1 and 9 → sum 10, cnt 2; 1*2*5 = 10 is NOT < 10
      Seq((2L, 1.0, 7.0), (2L, 9.0, 50.0)) ++
      // part 3: same outlier shape but brand-filtered out
      Seq((3L, 1.0, 10.0), (3L, 100.0, 999.0))
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val dir = fixtureDir("part" -> part, "lineitem" -> li)
    val row = SparkEntry.queries("q17_small_quantity")(s, dir).collect().head
    assert(row.getLong(row.fieldIndex("n_items")) === 9L)
    assert(row.getDouble(row.fieldIndex("avg_yearly")) === 90.0 / 7.0)
  }

  test("q21: semi+anti self-join pair — sole-late supplier counts per line, co-late and single-supplier orders drop") {
    val s = spark
    import s.implicits._
    val li = Seq(
      (1L, 10L, "R"), (1L, 20L, "N"), // order 1 F: supplier 10 is sole late → counts
      (2L, 10L, "R"), (2L, 20L, "R"), // order 2 F: BOTH late → anti-join drops both
      (3L, 10L, "R"),                 // order 3 F: single-supplier → EXISTS(other) fails
      (4L, 10L, "R"), (4L, 20L, "N"), // order 4 status O → order-status semi drops
      (5L, 10L, "R"), (5L, 10L, "R"), (5L, 20L, "N") // order 5 F: TWO late lines, both count
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val orders = Seq(
      (1L, "F"), (2L, "F"), (3L, "F"), (4L, "O"), (5L, "F")
    ).toDF("o_orderkey", "o_orderstatus")
    val supp = Seq((10L, "SUP_10"), (20L, "SUP_20")).toDF("s_suppkey", "s_name")
    val dir = fixtureDir("lineitem" -> li, "orders" -> orders, "supplier" -> supp)
    val got = SparkEntry.queries("q21_suppliers_waiting")(s, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    // supplier 10: 1 line from order 1 + 2 lines from order 5 = 3; supplier 20 never waits
    assert(got === List((10L, "SUP_10", 3L)))
  }

  test("q22: idle-balance anti-join is non-vacuous on the real fixture") {
    // Guards the r12 finding: with an unwindowed orders side the fixture has
    // no order-less customer and the anti-join proved nothing. The
    // idle-since-1998 window must keep real rows flowing at the gate SF.
    val rows = SparkEntry.queries("q22_idle_balance")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // pin the fixture's known liveness, not just nonemptiness: at sf0.01
    // exactly the AUTOMOBILE segment survives with 3 idle customers (a
    // tautological count>0 would pass even if the window stopped biting)
    assert(rows === Set(("AUTOMOBILE", 3L)))
  }
}
