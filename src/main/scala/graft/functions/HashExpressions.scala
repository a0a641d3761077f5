package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Whole-signature sketch expressions.
  *
  * Why custom Expressions and not compositions of built-ins: the composed
  * forms (64 `sum(when(...))` aggregate columns for SimHash, 64 unrolled
  * dot-product branches for LSH buckets, explode + k `min(xxhash64(...))`
  * aggregates for MinHash) each generate ONE enormous Java method — too big
  * for the JIT's inlining/compilation thresholds, so the hot loop runs in
  * the bytecode interpreter (measured seconds on a few thousand rows).
  * Each expression here computes the full signature in one small, tight,
  * JIT-friendly loop per row, and the MinHash/SimHash forms also delete a
  * whole explode + shuffle + wide-aggregate stage from the plan.
  *
  * Codegen: each `doGenCode` emits a single call into the expression object
  * (`addReferenceObj`), keeping the surrounding stage inside whole-stage
  * codegen while the loop body is a normal JIT-compiled JVM method.
  */
object HashExpressions {

  private val HASH_SEED = 42L

  /** k-MinHash signature of a string array in one pass: each element is
    * xxhash64'd once, then rehashed per hash-function index (a standard
    * public seeded-rehash construction); output = per-index minimum.
    * Empty/absent input yields Long.MaxValue sentinels (only all-empty docs
    * collide on it, and those are exact duplicates anyway). */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"minhash_sig requires array<string>, got ${other.simpleString}")
      }

    def compute(arr: ArrayData): ArrayData = {
      val mins = Array.fill(k)(Long.MaxValue)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val base = XxHash64Function.hash(arr.getUTF8String(i), StringType, HASH_SEED)
          var j = 0
          while (j < k) {
            val h = XxHash64Function.hash(base, LongType, j.toLong)
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 64-bit SimHash of a string array in one pass: per element, its
    * xxhash64 contributes ±1 to each bit position; output bit b is set iff
    * the bit-b sum is positive. Returned as ONE long — downstream blocking
    * and Hamming distance become bit arithmetic (`shiftright`/`bit_count`)
    * instead of 64-element array columns. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"simhash64 requires array<string>, got ${other.simpleString}")
      }

    def compute(arr: ArrayData): Long = {
      val counts = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, HASH_SEED)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simHash", this, classOf[SimHash64].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH bucket ids of a float/double vector for ALL
    * tables in one nested loop: output(t) = bucket id in table t (bit i set
    * iff dot(v, plane(t)(i)) >= 0). Planes are a structural-equality Seq so
    * identical subplans stay semantically equal (exchange reuse). */
  case class HyperplaneBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    require(planes.forall(_.length <= 64),
      "hyperplane_buckets: a table's bucket id is one Long of sign bits — " +
        "more than 64 planes per table would silently alias (1L << b wraps mod 64)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hyperplane_buckets"

    private def isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }

    @transient private lazy val planeArr: Array[Array[Array[Double]]] =
      planes.map(_.map(_.toArray).toArray).toArray
    @transient private lazy val childIsFloat = isFloat

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"hyperplane_buckets requires array<float|double>, got ${other.simpleString}")
      }

    def compute(arr: ArrayData): ArrayData = {
      val tables = planeArr.length
      val out = new Array[Long](tables)
      val n = arr.numElements()
      var t = 0
      while (t < tables) {
        val tp = planeArr(t)
        var id = 0L
        var b = 0
        while (b < tp.length) {
          val p = tp(b)
          val d = math.min(p.length, n)
          var acc = 0.0
          var i = 0
          if (childIsFloat) {
            while (i < d) { acc += arr.getFloat(i).toDouble * p(i); i += 1 }
          } else {
            while (i < d) { acc += arr.getDouble(i) * p(i); i += 1 }
          }
          if (acc >= 0) id |= (1L << b)
          b += 1
        }
        out(t) = id
        t += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hpBuckets", this, classOf[HyperplaneBuckets].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
      copy(child = newChild)
  }

  /** Centroid ids ordered by descending dot(v, centroid) (ties: lower id
    * first), truncated to `take` — IVF list assignment (`take = 1`) and
    * query probing (`take = nprobe`) in one small loop instead of
    * `sort_array` over nlist unrolled dot-product structs. */
  case class TopCentroids(child: Expression, centroids: Seq[Seq[Double]], take: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "top_centroids"

    @transient private lazy val centArr: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    @transient private lazy val childIsFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }

    def compute(arr: ArrayData): ArrayData = {
      val nc = centArr.length
      val scores = new Array[Double](nc)
      val n = arr.numElements()
      var c = 0
      while (c < nc) {
        val p = centArr(c)
        val d = math.min(p.length, n)
        var acc = 0.0
        var i = 0
        if (childIsFloat) {
          while (i < d) { acc += arr.getFloat(i).toDouble * p(i); i += 1 }
        } else {
          while (i < d) { acc += arr.getDouble(i) * p(i); i += 1 }
        }
        scores(c) = acc
        c += 1
      }
      val order = (0 until nc).sortBy(i => (-scores(i), i)).take(take)
      new GenericArrayData(order.toArray)
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("topCentroids", this, classOf[TopCentroids].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): TopCentroids =
      copy(child = newChild)
  }

  // ---- Column API ----------------------------------------------------------

  def minHashSig(tokens: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), k))

  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def hyperplaneBuckets(v: Column, planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(HyperplaneBuckets(
      ColumnBridge.expression(v),
      planes.map(_.map(_.toSeq).toSeq).toSeq))

  def topCentroids(v: Column, centroids: Array[Array[Double]], take: Int): Column =
    ColumnBridge.column(TopCentroids(
      ColumnBridge.expression(v),
      centroids.map(_.toSeq).toSeq, take))
}
