package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality scoring — the model-based filter stage of a
  * pretraining curation pipeline (the learned successor to the
  * [[TextOps.qualityScore]] heuristic): a logistic model over a fixed text
  * feature vector, trained with full-batch gradient descent inside Spark and
  * served as one map-only codegen'd dot product per document.
  *
  * Everything is built for the export-oracle split the sketch and k-means
  * families use: the FEATURES are exactly the arithmetic forms the
  * `text_quality` oracle already proves bit-exact against DuckDB, the fitted
  * WEIGHTS export as a model row, and the scoring stage (logit = w·x via the
  * pinned left-to-right [[SimilarityOps.dot]] fold = `list_dot_product`) is
  * fully SQL-replicable. Only the training loop itself — whose sigmoid has no
  * bit-stable SQL twin — stays outside the oracle, exactly like Lloyd
  * iterations in `kmeans_assign`.
  *
  * Scale shape: training is `iters` passes over the corpus, each ONE
  * map-side-combined aggregate producing an (nFeatures)-row gradient — the
  * model, not the data, reaches the driver. Gradient components accumulate
  * as exact decimals, so the fitted weights are independent of partitioning
  * and shuffle order (the determinism contract every trained-model export
  * here relies on). Scoring is embarrassingly parallel.
  */
object QualityModel {
  import TextOps._

  /** Number of features (incl. the leading bias term). */
  val numFeatures = 5

  /** The fixed feature vector, array<double> in this order:
    * `[bias=1, min(tokens/100, 1), stopword_ratio, punct_ratio,
    * mean_token_len/10]`. Every component is one of the arithmetic forms
    * the `text_quality` oracle pins bit-exactly (integer counts, one
    * double division each; the /10 rescale keeps the token-length feature
    * in the same unit ballpark as the ratios so one global learning rate
    * behaves). */
  def features(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    array(
      lit(1.0),
      least(n / lit(100.0), lit(1.0)),
      stopwordRatio(text),
      punctRatio(text),
      meanTokenLen(text) / lit(10.0))
  }

  /** The weak-supervision label the model learns to mimic — a deterministic
    * rule over the same proven expressions (decent length & low punctuation
    * via [[TextOps.qualityScore]], plus real English function-word
    * evidence). Weak labels stand in for human ratings exactly as in
    * production curation: the value of the learned model over the rule is
    * a smooth, thresholdable score. */
  def weakLabel(text: Column): Column =
    (qualityScore(text) >= 0.5 && stopwordHits(text, stopwordsEn) >= 3)
      .cast("int").cast("double")

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch logistic-regression gradient descent over `docs(text)`.
    *
    * Per iteration: one pass computes `g = Σ_rows (σ(w·x) − y)·x` with the
    * per-component sums in exact decimal (each row's term is a
    * deterministic double; the decimal fold makes the SUM order-free), then
    * the driver applies `w ← w − lr·g/n`. `iters` is small and fixed —
    * this is a 5-weight model; the point is the distributed-training
    * SHAPE, which is identical at 100 TB (gradient rows = nFeatures,
    * never data-sized).
    *
    * @return fitted weights, length [[numFeatures]]
    */
  def trainLogistic(docs: DataFrame, iters: Int = 12, lr: Double = 2.0): Array[Double] = {
    // Cache the FEATURE relation, not the text: the regex/tokenize work
    // happens once, and each of the `iters` passes aggregates a slim
    // (5 doubles + label) frame — at cluster scale this is the standard
    // materialize-features-then-iterate layout of distributed GD.
    val fx = docs.select(features(col("text")).as("x"), weakLabel(col("text")).as("y"))
      .cache()
    try {
      val n = fx.count().toDouble
      require(n > 0, "cannot train on an empty corpus")
      var w = Array.fill(numFeatures)(0.0)
      for (_ <- 1 to iters) {
        val wl = typedlit(w.toSeq)
        val g = fx
          .select(posexplode(transform(col("x"),
            xi => xi * (sigmoid(SimilarityOps.dot(col("x"), wl)) - col("y")))))
          .toDF("pos", "gx")
          .groupBy("pos")
          .agg(sum(col("gx").cast("decimal(28,12)")).cast("double").as("g"))
          .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
        require(g.length == numFeatures, s"gradient arity ${g.length}")
        w = Array.tabulate(numFeatures)(i => w(i) - lr * g(i) / n)
      }
      w
    } finally fx.unpersist(false)
  }

  /** Mean logistic loss of `w` on the corpus — the training-progress gauge
    * the spec asserts decreases (driver-side double; diagnostics, not an
    * oracle surface). */
  def meanLoss(docs: DataFrame, w: Array[Double]): Double = {
    val wl = typedlit(w.toSeq)
    val z = SimilarityOps.dot(features(col("text")), wl)
    val y = weakLabel(col("text"))
    // Numerically-stable form: log(1+e^z) − y·z, computed per row.
    docs.select(
        (log(lit(1.0) + exp(z)) - y * z).as("l"))
      .agg(avg(col("l"))).head.getDouble(0)
  }

  /** Score the corpus with an EXPLICIT weight model — the export-oracle
    * stage (weights are exported, read back, and scored with here, so
    * DuckDB's `list_dot_product` over the same parquet model must
    * reproduce every logit bit-for-bit and every keep decision).
    *
    * @return (doc_id, logit, keep = logit > 0)
    */
  def score(docs: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == numFeatures, s"weight arity ${w.length}")
    docs.select(col("doc_id"),
        SimilarityOps.dot(features(col("text")), typedlit(w.toSeq)).as("logit"))
      .withColumn("keep", col("logit") > 0.0)
  }
}
