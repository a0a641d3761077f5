package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars

class ScalarsSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("r")).collect().head.get(0)

  test("X1 deVoweled strips aeiouy") {
    assert(eval1(Scalars.deVoweled(lit("temperature"))) == "tmprtr")
    assert(eval1(Scalars.deVoweled(lit("sky"))) == "sk")
  }

  test("X2 unixToIso renders UTC") {
    assert(eval1(Scalars.unixToIso(lit(0L))) == "1970-01-01 00:00:00")
    assert(eval1(Scalars.unixToIso(lit(1704067199L))) == "2023-12-31 23:59:59")
  }

  test("X3 ts-tuple projection renders iso + value struct") {
    val r = spark.range(1)
      .select(Scalars.tsTupleWithIso(lit(60L), lit(3.5)).as("t"))
      .collect().head.getStruct(0)
    assert(r.getString(0) == "1970-01-01 00:01:00" && r.getDouble(1) == 3.5)
  }

  test("X4 renderers: round-half-up and pressure last-2") {
    assert(eval1(Scalars.renderRounded(lit(12.5))) == 13L)
    assert(eval1(Scalars.renderRounded(lit(12.4))) == 12L)
    assert(eval1(Scalars.renderLast2(lit(1013.2))) == "13")
    assert(eval1(Scalars.renderLast2(lit(1001.0))) == "01")
    assert(eval1(Scalars.renderLast2(lit(7.0))) == "07")
  }

  test("X4 renderFor dispatches pressure to last-2, others to rounded") {
    assert(eval1(Scalars.renderFor(lit("pressure"), lit(1013.2))) == "13")
    assert(eval1(Scalars.renderFor(lit("temperature"), lit(21.6))) == "22")
  }

  test("X5 toBool: numeric strings by truthiness, else == \"true\"") {
    assert(eval1(Scalars.toBool(lit("1"))) == true)
    assert(eval1(Scalars.toBool(lit("0"))) == false)
    assert(eval1(Scalars.toBool(lit("-3"))) == true)
    assert(eval1(Scalars.toBool(lit("true"))) == true)
    assert(eval1(Scalars.toBool(lit("TRUE"))) == false)
    assert(eval1(Scalars.toBool(lit("yes"))) == false)
  }

  test("X6 fixed-width cells") {
    assert(eval1(Scalars.fixedWidth(lit(42), 6)) == "    42")
    assert(eval1(Scalars.labelCell(lit("hum"), 6)) == "hum...")
  }

  test("X7 propsK parses the k field null-safely") {
    assert(eval1(Scalars.propsK(lit("""{"k": 69}"""))) == 69L)
    assert(eval1(Scalars.propsK(lit("garbage"))) == null)
  }

  test("X9 tokenize: head is the verb") {
    assert(eval1(Scalars.verb(lit("set minDataHoursToRenderBin 12"))) == "set")
  }
}
