package graft

import graft.functions.VecOps.vecDot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact fixtures from the reference's ML test suite, driven through the
  * Spark-side surfaces (FIXTURES.md §7 — the checked-in resource files):
  *
  *  - `vd_file_sample.txt` parsed by the VectorDoubleFileInputFormat
  *    analogue (label>f1 f2 f3 → (vector, label);
  *    ml/.../regression/VectorDoubleFileInputFormatTest.java:29-45 expects
  *    first record ((2,3,4), 1.0));
  *  - hypothesis/cost values from LinearRegressionModelTest.java:24-41 and
  *    LogisticRegressionModelTest.java:24-44, computed via the codegen'd
  *    vecDot the declared queries use;
  *  - full-batch GD over the reference's REAL datasets
  *    (linear_regression_data.txt: 60 rows × 15 features;
  *    logistic_regression_data.txt: 768 rows × 8 features) with the
  *    FIXTURES §7 oracle: cost strictly decreases every iteration.
  */
class RegressionFixturesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val res = "/root/reference/ml/src/test/resources"

  test("vd_file_sample.txt parses to the reference's (vector, label) records") {
    val rows = spark.read.text(s"$res/vd_file_sample.txt")
      .select(split(col("value"), ">").as("kv"))
      .select(element_at(col("kv"), 1).cast("double").as("label"),
        transform(split(trim(element_at(col("kv"), 2)), "\\s+"),
          x => x.cast("double")).as("features"))
      .orderBy("label")
      .as[(Double, Seq[Double])].collect().toSeq
    assert(rows == Seq((1.0, Seq(2.0, 3.0, 4.0)), (5.0, Seq(6.0, 7.0, 8.0))))
  }

  test("linear hypothesis and per-item cost match the reference's exact values") {
    // LinearRegressionModelTest: x=(2,3,4), y=1, theta=(1,1,1), m=2 →
    // hypothesis θ·x = 9, cost (h−y)²/(2m) = 16
    val df = Seq((Seq(2.0, 3.0, 4.0), 1.0, Seq(1.0, 1.0, 1.0))).toDF("x", "y", "theta")
    val (h, cost) = df.select(
        vecDot(col("theta"), col("x")).as("h"),
        (pow(vecDot(col("theta"), col("x")) - col("y"), 2) / (2 * 2)).as("cost"))
      .as[(Double, Double)].head()
    assert(h == 9.0)
    assert(cost == 16.0)
  }

  test("logistic hypothesis and per-item cost match the reference's values") {
    // LogisticRegressionModelTest: same x/y/theta → h = sigmoid(9) ≈
    // 0.9998766054240138, cost −y·ln(h)/m ≈ 6.170109486162941e-5 (m=2)
    val df = Seq((Seq(2.0, 3.0, 4.0), 1.0, Seq(1.0, 1.0, 1.0))).toDF("x", "y", "theta")
    val (h, cost) = df.select(
        (lit(1.0) / (lit(1.0) + exp(-vecDot(col("theta"), col("x"))))).as("h"),
        (-col("y") * log(lit(1.0) / (lit(1.0) + exp(-vecDot(col("theta"), col("x"))))) / 2).as("cost"))
      .as[(Double, Double)].head()
    assert(math.abs(h - 0.9998766054240137) < 1e-6)
    assert(math.abs(cost - 6.170109486162941e-5) < 1e-6)
  }

  /** max-normalized (features, y) frame from a parsed raw (features, y). */
  private def normalized(raw: DataFrame, d: Int): DataFrame = {
    val maxes = raw.select(
      (0 until d).map(j => max(abs(element_at(col("features"), j + 1))).as(s"m$j")): _*)
      .head().toSeq.map { case v: Double => math.max(v, 1e-12) }
    raw.select(transform(col("features"),
        (x, i) => x / element_at(typedLit(maxes), (i + 1).cast("int"))).as("features"),
      col("y"))
  }

  /** full-batch GD, θ held on the driver (the reference's master-peer
    * exchange is O(d) per round — GradientDescentBSP.java:151-256), the
    * gradient one distributed aggregate; returns per-iteration costs. */
  private def gdCosts(data: DataFrame, d: Int, alpha: Double, iters: Int,
      logistic: Boolean): Seq[Double] = {
    val cached = data.cache()
    val m = cached.count().toDouble
    var theta = Seq.fill(d + 1)(0.0) // bias + d weights
    val costs = (1 to iters).map { _ =>
      val z = lit(theta.head) + vecDot(col("features"), typedLit(theta.tail))
      val h = if (logistic) lit(1.0) / (lit(1.0) + exp(-z)) else z
      val err = h - col("y")
      val costCol =
        if (logistic)
          sum(-col("y") * log(greatest(h, lit(1e-15)))
            - (lit(1.0) - col("y")) * log(greatest(lit(1.0) - h, lit(1e-15)))) / m
        else sum(err * err) / (2 * m)
      val aggs = costCol.as("cost") +: sum(err).as("g0") +:
        (0 until d).map(j => sum(err * element_at(col("features"), j + 1)).as(s"g${j + 1}"))
      val r = cached.agg(aggs.head, aggs.tail: _*).head()
      val cost = r.getDouble(0)
      theta = theta.zipWithIndex.map { case (t, j) => t - alpha * r.getDouble(j + 1) / m }
      cost
    }
    cached.unpersist()
    costs
  }

  test("GD on the reference's linear dataset: cost strictly decreases") {
    val raw = spark.read.text(s"$res/linear_regression_data.txt")
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(transform(split(trim(col("value")), "\\s+"), x => x.cast("double")).as("t"))
      // row: index, 15 features, y (death rate) — x28.txt layout
      // y (death rate, ~900-1000) scaled to O(1) like the features: GD
      // step bounds depend on the data scale, and the oracle is the
      // DESCENT property, not the fit units
      .select(slice(col("t"), 2, 15).as("features"),
        (element_at(col("t"), -1) / 1000.0).as("y"))
    val costs = gdCosts(normalized(raw, 15), 15, alpha = 0.1, iters = 5, logistic = false)
    assert(costs.length == 5)
    costs.sliding(2).foreach { w => assert(w(1) < w(0), s"cost rose: $costs") }
  }

  test("GD on the reference's logistic dataset (pima): cost strictly decreases") {
    val raw = spark.read.text(s"$res/logistic_regression_data.txt")
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(transform(split(trim(col("value")), ","), x => x.cast("double")).as("t"))
      .select(slice(col("t"), 1, 8).as("features"), element_at(col("t"), -1).as("y"))
    val costs = gdCosts(normalized(raw, 8), 8, alpha = 0.5, iters = 5, logistic = true)
    assert(costs.length == 5)
    costs.sliding(2).foreach { w => assert(w(1) < w(0), s"cost rose: $costs") }
  }
}
