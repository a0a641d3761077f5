package graft

import org.apache.spark.sql.functions._
import graft.operators.ValidationOps
import graft.operators.ValidationOps._

/** Data-expectations gate semantics on PLANTED defects — nulls, dups,
  * range/set/regex breaks, dangling fks — which the clean test tables
  * cannot exercise (the registered query pins the clean-table counts
  * against the oracle; this spec pins the rule semantics). */
class ValidationOpsSpec extends SparkSpec {

  private def report(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap

  test("row-level rules: nulls, range, set, regex — one scan, exact counts") {
    val s = spark
    import s.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double, String, String)](
      (1L, 1.0, "A", "ok"),
      (2L, -3.0, "B", "ok"),      // range + set violations
      (null, 7.0, "A", "nope!"),  // null id + range + regex violations
      (4L, 2.0, null, "ok")       // null cat: NOT a set violation
    ).toDF("id", "v", "cat", "s")
    val rep = report(ValidationOps.validate(df, Seq(
      NotNull("id"), InRange("v", 0.0, 5.0), InSet("cat", Seq("A")),
      MatchesRegex("s", "[a-z]+"))).collect().toSeq)
    assert(rep("not_null(id)") == ((1L, 4L, false)))
    assert(rep("in_range(v, 0.0, 5.0)") == ((2L, 4L, false)))
    assert(rep("in_set(cat)") == ((1L, 4L, false)))
    assert(rep("matches_regex(s)") == ((1L, 4L, false)))
    // the four rules fold into a single aggregate: exactly one scan of df
    val plan = ValidationOps.validate(df, Seq(NotNull("id"), InRange("v", 0, 1),
      InSet("cat", Seq("A")), MatchesRegex("s", ".*")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), plan) // one agg, no per-rule legs
  }

  test("unique counts every row of a duplicated key; ref_in counts dangling fks") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "w"))
      .toDF("k", "p")
    val dim = Seq(Tuple1(2L)).toDF("dk")
    val rep = report(ValidationOps.validate(df, Seq(
      Unique(Seq("k")), RefIn("k", dim, "dk"))).collect().toSeq)
    assert(rep("unique(k)") == ((3L, 4L, false))) // all 3 copies of k=1
    assert(rep("ref_in(k)") == ((3L, 4L, false))) // k=1 rows dangle
    // all-pass polarity
    val clean = report(ValidationOps.validate(
      Seq((2L, "w")).toDF("k", "p"),
      Seq(Unique(Seq("k")), RefIn("k", dim, "dk"), NotNull("k"))).collect().toSeq)
    assert(clean.values.forall { case (v, _, p) => v == 0L && p })
  }

  test("report row order follows the rule list even when kinds interleave") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 1.0), (1L, 9.0)).toDF("k", "v")
    val dim = Seq(Tuple1(1L)).toDF("dk")
    // NotNull, Unique, InRange, RefIn — row-level and keyed interleaved
    val names = ValidationOps.validate(df, Seq(
      NotNull("k"), Unique(Seq("k")), InRange("v", 0.0, 5.0),
      RefIn("k", dim, "dk"))).collect().map(_.getString(0)).toSeq
    assert(names == Seq("not_null(k)", "unique(k)",
      "in_range(v, 0.0, 5.0)", "ref_in(k)"))
  }
}
