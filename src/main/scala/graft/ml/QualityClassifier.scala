package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{QualityClfFns, QualityClfModel}

/** Model-based quality scoring: a distributed fastText-style linear
  * classifier over hashed bag-of-ngrams — the TRAINED complement to the
  * rule-based filters ([[TextAnalysis.qualityProfile]]'s Gopher/C4
  * rules catch garbage; this ranks *quality* of what survives, the
  * standard pairing in modern pretraining curation). No analog in the
  * reference (beyond-reference ML surface, like [[NgramLm]]).
  *
  * Architecture (the 100 TB shape):
  *  - TRAIN: hashed-bag logistic regression by full-batch gradient
  *    descent — ONE aggregation per epoch. Per-row feature counts come
  *    pre-counted from the codegen kernel
  *    ([[QualityClfModel.featureCountsKernel]]), the bias rides as a
  *    sentinel bucket, and the explode → groupBy(bucket) gradient
  *    shuffles at most 2^logBuckets+1 keys after map-side partial
  *    aggregation. Gradient sums are decimal(38,18) (the repo's exact-
  *    decimal float-agg discipline) so training is BIT-DETERMINISTIC
  *    under any partitioning — same data, same model, any cluster.
  *  - SCORE: a zero-exchange narrow map (the LangId kernel pattern —
  *    weights embedded in the plan via addReferenceObj). At 100 TB it
  *    runs at scan speed; stream-native for the same reason.
  *
  * The scoring arithmetic is oracle-able: the logit is two IEEE
  * left-folds in token order plus the bias (contract pinned in
  * [[QualityClfModel]]), replayed bit-for-bit by DuckDB `list_reduce`
  * (gate `q_quality_clf` — synthetic formula weights so the oracle
  * derives them inline; TRAINED-weight behavior is spec-verified on a
  * labeled fixture, since iterative training is not SQL-expressible).
  */
object QualityClassifier {

  /** The gate's pinned weight formula — portable01-style integer
    * arithmetic both engines compute exactly:
    * w(b) = ((b·2654435761 + 12345) mod 2^32) / 2^32 − 0.5. */
  def syntheticWeights(logBuckets: Int): Array[Double] =
    Array.tabulate(1 << logBuckets)(b =>
      ((b.toLong * 2654435761L + 12345L) % 4294967296L).toDouble /
        4294967296.0 - 0.5)

  /** Train by full-batch logistic gradient descent. `labelCol` must be
    * 0/1 (checked). Returns the embedded-model form [[score]] consumes.
    *
    * One agg per epoch: rows → (error, exploded feature counts + bias
    * sentinel) → groupBy(bucket) partial-agg → ≤ buckets+1 decimal sums
    * drained with the bounded-take contract. The labeled frame is
    * localCheckpointed once so epochs re-scan materialized rows, not the
    * source plan. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      logBuckets: Int = 12, bigrams: Boolean = true, epochs: Int = 20,
      lr: Double = 0.5, l2: Double = 0.0): QualityClfModel = {
    require(epochs >= 1 && epochs <= 1000, s"epochs must be 1..1000, got $epochs")
    require(lr > 0, s"lr must be positive, got $lr")
    val buckets = 1 << logBuckets

    val base = labeled.select(
      col(s"`$labelCol`").cast("double").as("y"),
      QualityClfFns.clfFeatureCounts(col(s"`$textCol`"), logBuckets, bigrams)
        .as("f"))
      .filter(col("y").isNotNull && size(col("f")) > 0)
      .localCheckpoint()
    val badLabel = base.filter(col("y") =!= 0.0 && col("y") =!= 1.0).take(1)
    require(badLabel.isEmpty,
      s"QualityClassifier.train: $labelCol must be 0/1, found ${
        if (badLabel.isEmpty) "" else badLabel.head.getDouble(0)}")

    var weights = new Array[Double](buckets)
    var bias = 0.0
    for (_ <- 0 until epochs) {
      val model = QualityClfModel(weights, logBuckets, bigrams, bias)
      // dot product from the pre-counted features (training-side only —
      // IEEE order here need not match the kernel; scoring does)
      val wref = model
      val logit = aggregate(col("f"), lit(bias),
        (acc: Column, x: Column) => acc +
          element_at(typedlit(wref.weights), x.getField("bucket") + 1) *
            x.getField("cnt"))
      // sigmoid error; the bias gradient rides as sentinel bucket -1
      // with cnt 1 so ONE aggregation carries everything
      val grad = base
        .select((lit(1.0) / (lit(1.0) + exp(-logit)) - col("y")).as("e"),
          explode(concat(col("f"),
            array(struct(lit(-1).as("bucket"), lit(1).as("cnt"))))).as("fb"))
        .groupBy(col("fb.bucket").as("bucket"))
        .agg(sum((col("e") * col("fb.cnt")).cast("decimal(38,18)")).as("g"),
          sum(col("fb.cnt").cast("long")).as("n"))
      val rows = grad.take(buckets + 2)
      require(rows.length <= buckets + 1,
        "gradient returned more buckets than the model has — kernel drift")
      var n = 1L
      rows.foreach { r =>
        if (r.getInt(0) == -1) n = math.max(1L, r.getLong(2))
      }
      val next = weights.clone()
      var gBias = 0.0
      rows.foreach { r =>
        val b = r.getInt(0)
        val g = r.getDecimal(1).doubleValue / n
        if (b == -1) gBias = g
        else next(b) = next(b) - lr * (g + l2 * next(b))
      }
      weights = next
      bias = bias - lr * gBias
    }
    QualityClfModel(weights, logBuckets, bigrams, bias)
  }

  /** Zero-exchange scoring: adds `outCol` (double logit; null for
    * token-less text — score-then-filter decides its fate explicitly).
    * Positive logit = model says `label=1` side. */
  def score(df: DataFrame, textCol: String, model: QualityClfModel,
      outCol: String = "quality_logit"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"QualityClassifier.score: output column '$outCol' already exists — " +
        "rename or drop it first")
    df.withColumn(outCol, QualityClfFns.clfLogit(col(s"`$textCol`"), model))
  }

  /** Fraction of labeled rows the model classifies correctly (logit > 0
    * ⇔ label 1); token-less rows are excluded. Spec/tuning helper. */
  def accuracy(labeled: DataFrame, textCol: String, labelCol: String,
      model: QualityClfModel): Double = {
    val scored = score(labeled, textCol, model, "__graft_clf_logit")
      .filter(col("__graft_clf_logit").isNotNull)
    val agg = scored.agg(
      sum(when((col("__graft_clf_logit") > 0) ===
        (col(s"`$labelCol`").cast("double") === 1.0), 1L).otherwise(0L)),
      count(lit(1))).head()
    if (agg.getLong(1) == 0L) 0.0
    else agg.getLong(0).toDouble / agg.getLong(1)
  }

  /** Persist (tmp+rename like the seen stores): weights parquet rows
    * (bucket, weight) + a `_clf_meta` JSON sidecar (logBuckets, bigrams,
    * bias). */
  def save(spark: SparkSession, model: QualityClfModel, path: String): Unit = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp-" +
      java.util.UUID.randomUUID().toString)
    model.weights.zipWithIndex.map { case (w, b) => (b, w) }.toSeq
      .toDF("bucket", "weight")
      .repartition(1)
      .write.mode("overwrite").parquet(new org.apache.hadoop.fs.Path(tmp, "weights").toString)
    val meta = s"""{"log_buckets":${model.logBuckets},"bigrams":${model.bigrams},"bias":${
      String.format(java.util.Locale.ROOT, "%.17g", Double.box(model.bias))}}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(tmp, "_clf_meta"), true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    if (fs.exists(fs0(path))) fs.delete(fs0(path), true)
    require(fs.rename(tmp, fs0(path)),
      s"QualityClassifier.save: could not commit $path")
  }

  private def fs0(p: String) = new org.apache.hadoop.fs.Path(p)

  def load(spark: SparkSession, path: String): QualityClfModel = {
    val fs = fs0(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, "_clf_meta"))
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(name: String): String = {
      val m = java.util.regex.Pattern.compile("\"" + name + "\":([^,}]+)")
        .matcher(meta)
      require(m.find(), s"QualityClassifier.load: _clf_meta missing $name")
      m.group(1)
    }
    val logBuckets = field("log_buckets").trim.toInt
    val bigrams = field("bigrams").trim.toBoolean
    val bias = field("bias").trim.toDouble
    val rows = spark.read.parquet(s"$path/weights")
      .select(col("bucket").cast("int"), col("weight").cast("double"))
      .take((1 << logBuckets) + 1)
    require(rows.length == (1 << logBuckets),
      s"QualityClassifier.load: expected ${1 << logBuckets} weights, " +
        s"found ${rows.length}")
    val w = new Array[Double](1 << logBuckets)
    rows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    QualityClfModel(w, logBuckets, bigrams, bias)
  }
}
