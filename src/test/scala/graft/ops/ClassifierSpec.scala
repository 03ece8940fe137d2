package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** NB quality filter + eval metrics: hand-computed rank statistics,
  * planted-signal separability, prior-only scoring of empty docs, and
  * the save/load artifact roundtrip. The DuckDB oracle (qc_*) gates the
  * bulk arithmetic; these pin the semantics the oracle can't see. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // a corpus with a REAL signal: positives speak vocab A, negatives
  // vocab B, with a thin shared stopword layer
  private lazy val planted = {
    val pos = (0L until 40L).map(i =>
      (i, s"alpha beta gamma delta the alpha beta epsilon$i", true))
    val neg = (100L until 140L).map(i =>
      (i, s"omega sigma tau rho the omega sigma kappa$i", false))
    (pos ++ neg).toDF("doc_id", "text", "label")
  }

  test("planted signal: train/score separates, AUC ~ 1, confusion clean") {
    val train = planted.where(col("doc_id") % 2 === 0)
    val test = planted.where(col("doc_id") % 2 =!= 0)
    val scored = Classifier.trainScore(
        train.where(col("label")), train.where(!col("label")),
        test, "doc_id", "text")
      .join(test.select(col("doc_id").as("id"), col("label")), Seq("id"))
    val auc = Eval.rocAuc(scored, col("label"), col("logodds"))
      .head().getAs[Double]("auc")
    assert(auc > 0.99, s"planted-signal AUC should be ~1, got $auc")
    val c = Eval.confusion(scored, col("label"), col("logodds"), 0.0).head()
    assert(c.getAs[Long]("fp") == 0 && c.getAs[Long]("fn") == 0)
    assert(c.getAs[Double]("f1") == 1.0)
  }

  test("empty and unseen-vocab docs score on the prior, not NaN") {
    val train = planted
    val m = Classifier.trainNb(train.where(col("label")),
      train.where(!col("label")), "text")
    val odd = Seq((1000L, ""), (1001L, "zzz qqq unseen vocab")).toDF("doc_id", "text")
    val out = Classifier.score(odd, "doc_id", "text", m)
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("n_grams") == 0L)
    // empty doc: exactly the rounded prior log-odds
    assert(out(0).getAs[Double]("logodds") ==
      BigDecimal(m.bias).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // unseen vocab: every bucket takes defaultW — finite, defined
    assert(!out(1).getAs[Double]("logodds").isNaN)
    assert(out(1).getAs[Long]("n_grams") == 7L) // 4 unigrams + 3 bigrams
  }

  test("model save/load roundtrip reproduces scores bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    val train = planted.where(col("doc_id") % 2 === 0)
    val m = Classifier.trainNb(train.where(col("label")),
      train.where(!col("label")), "text")
    m.save(dir)
    val m2 = Classifier.load(spark, dir)
    assert(m2.bias == m.bias && m2.defaultW == m.defaultW && m2.buckets == m.buckets)
    val test = planted.where(col("doc_id") % 2 =!= 0)
    val a = Classifier.score(test, "doc_id", "text", m)
      .orderBy("id").collect().map(_.toSeq)
    val b = Classifier.score(test, "doc_id", "text", m2)
      .orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("fused scorer ≡ explode-and-join scorer, including empty/unseen docs") {
    val train = planted.where(col("doc_id") % 2 === 0)
    val m = Classifier.trainNb(train.where(col("label")),
      train.where(!col("label")), "text")
    val probe = planted.select(col("doc_id"), col("text"))
      .union(Seq((1000L, ""), (1001L, "zzz qqq unseen vocab rows")).toDF("doc_id", "text"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(rows(Classifier.score(probe, "doc_id", "text", m)) ==
      rows(Classifier.scoreViaJoin(probe, "doc_id", "text", m)))
    // and the fused plan has no shuffle at all below the scorer
    val plan = Classifier.score(probe, "doc_id", "text", m)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"fused scoring must not shuffle:\n$plan")
  }

  test("rocAuc: hand-computed midrank tie case") {
    // scores: pos {3, 2, 2}, neg {2, 1}; ranks (asc, midrank):
    // 1 -> 1; the three 2s -> 3; 3 -> 5
    // rank-sum(pos) = 5 + 3 + 3 = 11; U = 11 - 3*4/2 = 5; AUC = 5/6
    val df = Seq((3.0, true), (2.0, true), (2.0, true), (2.0, false), (1.0, false))
      .toDF("s", "label")
    val r = Eval.rocAuc(df, col("label"), col("s")).head()
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Double]("auc") == BigDecimal(5.0 / 6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rocAucBinned equals exact AUC when scores are already on the grid") {
    val df = Seq((0.95, true), (0.65, true), (0.65, false), (0.15, false),
      (0.35, true), (0.35, false)).toDF("p", "label")
    val exact = Eval.rocAuc(df, col("label"), col("p")).head().getAs[Double]("auc")
    val binned = Eval.rocAucBinned(df, col("label"), col("p"), bins = 10)
      .head().getAs[Double]("auc_binned")
    assert(binned == exact)
  }

  test("calibration clamps p = 1.0 into the last bin; rates exact") {
    val df = Seq((1.0, true), (0.95, true), (0.92, false), (0.05, false))
      .toDF("p", "label")
    val rows = Eval.calibration(df, col("label"), col("p"), bins = 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 9L))
    val last = rows(1)
    assert(last.getAs[Long]("n") == 3 &&
      last.getAs[Double]("pos_rate") == BigDecimal(2.0 / 3)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("classReport: hand-computed multiclass metrics, never-predicted class kept") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), // a: tp 2, fn 1
      ("b", "a"), ("b", "b"),             // b: tp 1, fp 1 (from a), fn 1
      ("c", "a"))                          // c never predicted
      .toDF("actual", "predicted")
    val r = Eval.classReport(df, col("actual"), col("predicted"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("a", 3L, 4L, 2L), ("b", 2L, 2L, 1L), ("c", 1L, 0L, 0L)))
    val rows = Eval.classReport(df, col("actual"), col("predicted")).collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0).getAs[Double]("precision") == 0.5) // 2/4
    assert(rows(0).getAs[Double]("recall") == r6(2.0 / 3))
    assert(rows(0).getAs[Double]("f1") == r6(4.0 / 7)) // 2tp/(na+np)
    assert(rows(2).isNullAt(rows(2).fieldIndex("precision")), "0 predictions -> null")
    assert(rows(2).getAs[Double]("recall") == 0.0)
    val cm = Eval.confusionMatrix(df, col("actual"), col("predicted")).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(cm.toSeq == Seq(("a", "a", 2L), ("a", "b", 1L), ("b", "a", 1L),
      ("b", "b", 1L), ("c", "a", 1L)))
  }

  test("classSummary: macro means over observed classes only; null precision counts 0") {
    val df = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"),
      ("a", "y"), // y is predicted-only: must not dilute the macro means
      ("b", "a"), ("b", "b"),
      ("c", "a")) // c never predicted: precision null -> 0 in the macro
      .toDF("actual", "predicted")
    val s = Eval.classSummary(df, col("actual"), col("predicted")).head()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getAs[Long]("n") == 7)
    assert(s.getAs[Double]("accuracy") == r6(3.0 / 7))
    // observed classes (a, b, c): precision a 2/4, b 1/2, c 0 (null->0)
    assert(s.getAs[Double]("macro_precision") == r6((0.5 + 0.5 + 0.0) / 3))
    // recall: a 2/4, b 1/2, c 0 — class y (never actual) excluded
    assert(s.getAs[Double]("macro_recall") == r6((0.5 + 0.5 + 0.0) / 3))
  }

  test("confusion: degenerate one-class input yields null metrics, not NaN") {
    val df = Seq((0.9, true), (0.2, true)).toDF("s", "label")
    val r = Eval.confusion(df, col("label"), col("s"), 0.5).head()
    assert(r.getAs[Long]("tp") == 1 && r.getAs[Long]("fn") == 1)
    assert(r.isNullAt(r.fieldIndex("precision")) == false) // tp+fp=1, defined
    val allNeg = Eval.confusion(df.where(lit(false)), col("label"), col("s"), 0.5).head()
    assert(allNeg.isNullAt(allNeg.fieldIndex("accuracy")))
  }

  test("join-path scoring broadcasts the model (corpus never shuffles)") {
    val train = planted
    val m = Classifier.trainNb(train.where(col("label")),
      train.where(!col("label")), "text")
    val plan = Classifier.scoreViaJoin(planted, "doc_id", "text", m)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"model join should broadcast:\n$plan")
  }
}
