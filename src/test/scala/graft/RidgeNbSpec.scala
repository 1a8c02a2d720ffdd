package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Model-quality invariants for the closed-form ridge and Naive Bayes
  * rows (the engine-vs-oracle hash compare is Verify + check.py).
  * NOTE: the synthetic testdata carries no real signal — lineitem columns
  * are mutually independent and document lang labels are random — so these
  * specs check ALGEBRAIC invariants (normal equations) and behavior on
  * constructed corpora with genuine class signal, not fit quality on the
  * testdata. */
class RidgeNbSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("ridge coefficients satisfy the normal equations (X'X+lambdaI)theta = X'y") {
    val r = q("q_ml_ridge").head
    val th = Array(r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val s = Tables(spark, TestSpark.sf0, "lineitem").select(
        (col("l_quantity") / 50.0).as("x1"),
        (col("l_discount") * 10.0).as("x2"),
        (col("l_extendedprice") / 100000.0).as("y"))
      .agg(count(lit(1)).cast("double"), sum("x1"), sum("x2"),
        sum(col("x1") * col("x1")), sum(col("x1") * col("x2")),
        sum(col("x2") * col("x2")),
        sum("y"), sum(col("x1") * col("y")), sum(col("x2") * col("y"))).head
    val Seq(n, s1, s2, s11, s12, s22, sy, s1y, s2y) =
      (0 until 9).map(s.getDouble)
    val lam = 0.1
    val a = Array(
      Array(n + lam, s1, s2),
      Array(s1, s11 + lam, s12),
      Array(s2, s12, s22 + lam))
    val b = Array(sy, s1y, s2y)
    (0 until 3).foreach { i =>
      val lhs = (0 until 3).map(j => a(i)(j) * th(j)).sum
      assert(math.abs(lhs - b(i)) < 0.05 * (1 + math.abs(b(i))),
        s"row $i: $lhs vs ${b(i)}")
    }
  }

  test("ridge path: SSE is non-decreasing in lambda and lambda=0.1 matches q_ml_ridge") {
    val path = q("q_ml_ridge_path").collect().sortBy(_.getDouble(0))
    assert(path.length == 4)
    // more regularization can only fit the training data worse (or equal)
    path.map(_.getDouble(4)).sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-6, s"SSE decreased: $a -> $b")
      case _ =>
    }
    val at01 = path.find(r => math.abs(r.getDouble(0) - 0.1) < 1e-12).get
    val single = q("q_ml_ridge").head
    (1 to 3).foreach(i =>
      assert(math.abs(at01.getDouble(i) - single.getDouble(i - 1)) < 1e-9))
  }

  private def toyDocs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "lang", "text")

  test("naive bayes separates classes with disjoint vocabularies perfectly") {
    val train = toyDocs(
      (0L, "aa", "red red blue red green red"),
      (2L, "aa", "red blue red red"),
      (4L, "bb", "cat dog cat cat fish"),
      (6L, "bb", "dog dog cat fish"))
    val test = toyDocs(
      (1L, "?", "red red blue"),
      (3L, "?", "cat dog fish"),
      (5L, "?", "red cat red red")) // majority-red mixed doc
    val preds = operators.ML.naiveBayes(train, test.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "aa")
    assert(preds(3L) == "bb")
    assert(preds(5L) == "aa")
  }

  test("naive bayes falls back to the prior (tie to smaller lang) on OOV-only docs") {
    val train = toyDocs(
      (0L, "aa", "red blue"), (2L, "bb", "cat dog"))
    val test = toyDocs((1L, "?", "zebra unseen tokens"))
    val preds = operators.ML.naiveBayes(train, test.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // equal priors, zero in-vocab tokens -> equal scores -> smaller lang
    assert(preds(1L) == "aa")
  }

  test("naive bayes prior dominates when classes are imbalanced and text is neutral") {
    val train = toyDocs(
      (0L, "aa", "word"), (2L, "bb", "word"), (4L, "bb", "word"), (6L, "bb", "word"))
    val test = toyDocs((1L, "?", "word"))
    val preds = operators.ML.naiveBayes(train, test.select("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "bb")
  }

  test("ridge CV: 5 folds, coefficients near the full-data solve, positive SSEs") {
    val cv = q("q_ml_ridge_cv").collect().sortBy(_.getInt(0))
    assert(cv.map(_.getInt(0)).toSeq == (0 to 4))
    val full = q("q_ml_ridge").head
    cv.foreach { r =>
      // each fold trains on 80% of the data; coefficients must sit close
      // to the full-data solution (same lambda)
      (1 to 3).foreach(i =>
        assert(math.abs(r.getDouble(i) - full.getDouble(i - 1)) < 0.05,
          s"fold ${r.getInt(0)} th${i - 1} far from full solve"))
      assert(r.getDouble(4) > 0.0)
    }
  }

  test("stump gains are non-negative and bounded by the parent entropy") {
    val rows = q("q_ml_stump").collect()
    assert(rows.length == 31) // 24 hour + 7 dow thresholds
    // parent entropy of the binary label
    val ev = Tables(spark, TestSpark.sf0, "events")
    val n = ev.count().toDouble
    val p = ev.filter(col("event_type") === "purchase").count().toDouble
    val h = { val q1 = p / n; val q0 = 1 - q1; -(q1 * math.log(q1) + q0 * math.log(q0)) }
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= -1e-6, s"negative gain $g")
      assert(g <= h + 1e-6, s"gain $g exceeds parent entropy $h")
    }
  }

  test("naive bayes predicts every held-out doc with a known language") {
    val langs = Tables(spark, TestSpark.sf0, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    val preds = q("q_ml_nb").collect()
    val nTest = Tables(spark, TestSpark.sf0, "documents")
      .filter(col("doc_id") % 2 =!= 0).count()
    assert(preds.length == nTest)
    preds.foreach(r => assert(langs.contains(r.getString(1))))
  }
}
