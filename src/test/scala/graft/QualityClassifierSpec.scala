package graft

import graft.functions.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {

  test("ridge probe distills the heuristic: high holdout agreement") {
    val r = QualityClassifier.qlTrainReport(spark, sf).collect().head
    assert(r.getAs[Long]("n_train") > 0)
    assert(r.getAs[Long]("n_holdout") > 0)
    assert(r.getAs[Double]("train_acc") >= 0.9,
      s"train accuracy collapsed: $r")
    assert(r.getAs[Double]("holdout_acc") >= 0.9,
      s"holdout accuracy collapsed: $r")
  }

  test("degenerate (constant-zero) features get exactly zero weight " +
    "through the ridge term") {
    // this corpus is lowercase alnum+space: punct_ratio (dim 3) and
    // digit_ratio (dim 6) are identically zero columns. Without ridge
    // the Gram matrix would be singular; with it their pivots are λ
    // and the solved weights are exactly 0.0.
    val w = QualityClassifier.qlWeights(spark, sf).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Double]("weight")).toMap
    assert(w(3) === 0.0d)
    assert(w(6) === 0.0d)
    // the distilled heuristic loads on the stopword ratio (its 0.5
    // component) — the probe must find it
    assert(math.abs(w(2)) > 1.0d, s"stopword weight suspicious: $w")
  }

  test("trained weights are bit-identical across input layouts") {
    val docs = Tables.documents(spark, sf)
    val (w1, n1) = QualityClassifier.fitRidge(docs.repartition(7))
    val (w2, n2) = QualityClassifier.fitRidge(docs.repartition(3)
      .sortWithinPartitions(desc("doc_id")))
    assert(n1 === n2)
    assert(w1.toSeq === w2.toSeq,
      "scaled-long Gram fold must make training layout-stable")
  }

  test("classifier rows are consistent: predicted = score>0, correct " +
    "= agreement, and the report's accuracy matches the rows") {
    val rows = QualityClassifier.qlClassifier(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("predicted") ===
        (r.getAs[Double]("score") > 0.0d))
      assert(r.getAs[Boolean]("correct") ===
        (r.getAs[Boolean]("predicted") === r.getAs[Boolean]("is_good")))
    }
    val acc = rows.count(_.getAs[Boolean]("correct")).toDouble / rows.length
    val rep = QualityClassifier.qlTrainReport(spark, sf).collect().head
    assert(math.abs(acc - rep.getAs[Double]("holdout_acc")) < 1e-12)
  }
}
