package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar layer — the reference's helper functions re-expressed as Spark
  * `Column` functions (all codegen'd built-ins, zero UDFs).
  *
  * Reference citations (`/root/reference/trend-o-meter`):
  *  - X1 `deVoweled`             :83      (strip `[aeiouy]` for label abbrev)
  *  - X2 `unixTimeToISOString`   :68      (unix sec → datetime string)
  *  - X3 ts-tuple projection     :74      (tuple → `[iso, val]`)
  *  - X4 `rawValRenderers`       :146-151 (toFixed(0); pressure = last 2 digits)
  *  - X5 `toBool`                :196-205 (numeric-string truthiness else =="true")
  *  - X6 pad / fixed width       :89,345,371
  *  - X7 JSON decode             :290,385
  *  - X8 time arithmetic (:19,59,422) lives inline in TrendOps' band/span math
  *  - X9 command tokenize        :173,237
  */
object Scalars {

  /** X1: strip vowels (and y) — the reference's label abbreviation. */
  def deVoweled(c: Column): Column = regexp_replace(c, "[aeiouy]", "")

  /** X2: epoch-seconds → `yyyy-MM-dd HH:mm:ss` (session TZ = UTC). */
  def unixToIso(epochSec: Column): Column =
    from_unixtime(epochSec, "yyyy-MM-dd HH:mm:ss")

  /** X3: `[ts, val]` tuple with rendered ts — debug projection. */
  def tsTupleWithIso(epochSec: Column, value: Column): Column =
    struct(unixToIso(epochSec).as("iso"), value.as("value"))

  /** X4 (default renderer): numeric → whole-number long (round half-up). */
  def renderRounded(value: Column): Column =
    round(value, 0).cast("long")

  /** X4 (pressure renderer): last two digits of the rounded value,
    * zero-padded — the reference renders barometric pressure mod 100. */
  def renderLast2(value: Column): Column =
    lpad((renderRounded(value) % 100).cast("string"), 2, "0")

  /** X4 (dispatch): the reference's `rawValRenderers` map
    * (trend-o-meter:146-151) — pressure renders as its last two digits,
    * every other metric as the rounded whole number. */
  def renderFor(metric: Column, value: Column): Column =
    when(metric === "pressure", renderLast2(value))
      .otherwise(renderRounded(value).cast("string"))

  /** X5: reference `toBool` — integer strings by truthiness, else == "true".
    * Truthiness = "contains a nonzero digit", not a long cast: a cast
    * overflows to null on integers beyond 64 bits, where the reference's
    * `Number(s)` truthiness is still true. */
  def toBool(c: Column): Column =
    when(c.rlike("^-?[0-9]+$"), c.rlike("[1-9]")).otherwise(c === "true")

  /** X6: fixed-width cell (right-aligned value, left-aligned label). */
  def fixedWidth(c: Column, w: Int): Column = lpad(c.cast("string"), w, " ")
  def labelCell(c: Column, w: Int): Column = rpad(c, w, ".")

  /** X7: parse the `props` JSON payload's integer field `k`.
    * `get_json_object` keeps it null-safe on malformed rows (F3 semantics). */
  def propsK(props: Column): Column =
    get_json_object(props, "$.k").cast("long")

  /** X9: command tokenize — whitespace split, head = verb. */
  def tokenize(c: Column): Column = split(c, "\\s+")
  def verb(c: Column): Column = element_at(tokenize(c), 1)
}
