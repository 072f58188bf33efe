package graft.functions

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A TRAINED document-quality classifier — the linear filter every
  * production LLM data pipeline runs (CCNet/fastText score the crawl
  * with one; RefinedWeb/Gopher gate on the score). The realistic
  * bootstrap implemented here: DISTILL the existing hand-tuned
  * heuristic ([[TextAnalysis.qualityScoreCol]] at a fixed threshold)
  * into a model over a wider surface-feature set — the standard move
  * when a rule-based filter exists and a trainable scorer is wanted.
  *
  * The fit is a RIDGE LEAST-SQUARES linear probe solved by exact
  * normal equations — deliberately NOT an iterative optimizer:
  * - ONE corpus pass accumulates `XᵀX` and `Xᵀy` as
  *   `floor(v·2³² + 0.5)` scaled longs up a treeAggregate (the
  *   [[Ivf.lloydStep]] device, third application) — long sums commute,
  *   so the Gram matrix is bit-identical across partitionings. With
  *   |feature| ≤ 1 by construction, a cell overflows int64 only past
  *   ~2³¹ rows; train on a bounded sample beyond that, like every
  *   quality classifier.
  * - The (Dims×Dims) system solves DRIVER-SIDE by Gauss–Jordan in a
  *   fixed operation order with no pivoting — safe because the ridge
  *   term makes the matrix positive definite even when a feature is
  *   degenerate (this corpus has constant-zero punct/digit ratios;
  *   λ keeps those pivots nonzero and their weights at exactly 0).
  * - Scoring is a literal-weight projection folded in ascending index
  *   order — zero shuffle, codegen-friendly.
  *
  * Every step is plain deterministic arithmetic, so DuckDB can REPEAT
  * the training: the Gram sums are exact integer aggregates and the
  * elimination unrolls into Dims chained CTE steps mirroring the same
  * IEEE operations. The trained WEIGHTS, the fit report, and every
  * holdout score are hash-exact oracle rows (`ql_weights`,
  * `ql_train_report`, `ql_classifier`) — a trained-model family with
  * end-to-end SQL oracles.
  */
object QualityClassifier {

  val Dims = 6
  val Lambda = 0.000001d // ridge: positive-definite Gram, degenerate-safe
  val Threshold = 0.44d // heuristic verdict cut (≈ corpus median)
  private val Scale = 4294967296.0d // 2^32, the shared fold scale

  /** Feature columns over `text` — every device already oracle-proven
    * in [[TextAnalysis]]. Index order is the contract (the Gram fold,
    * scoring, and the SQL oracle all run ascending). */
  private def featureExprs(text: Column): Seq[Column] = {
    val toks = TextAnalysis.wsTokens(text)
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks,
      t => t.isInCollection(TextAnalysis.Stopwords))).cast("double")
    val nPunct = length(regexp_replace(text, "[a-z0-9\\s]", ""))
      .cast("double")
    val nDigit = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val nChars = length(text).cast("double")
    Seq(
      lit(1.0d),
      nStop / nTok,
      nPunct / nChars,
      least(nChars / nTok / lit(10.0d), lit(1.0d)),
      least(nTok / lit(100.0d), lit(1.0d)),
      nDigit / nChars)
  }

  /** docs → (doc_id, is_good: the heuristic verdict to distill,
    * x: array<double>[Dims]). */
  def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      (TextAnalysis.qualityScoreCol(col("text")) >= Threshold)
        .as("is_good"),
      array(featureExprs(col("text")): _*).as("x"))

  /** Train rows: 80% by the pure doc_id rule; the held-out 20% is what
    * [[qlClassifier]] scores. */
  private def trainSplit(f: DataFrame): DataFrame =
    f.filter(pmod(col("doc_id"), lit(5L)) =!= 4L)

  /** Fit the ridge probe. Returns (weights, n_train). Memoized per
    * (docs plan, λ) like the IVF/PQ model memos — the three declared
    * queries share one fit per session. */
  private val modelMemo = new graft.util.Caches.PlanMemo[
    Double, (Array[Double], Long)](maxEntries = 8)

  def fitRidge(docs: DataFrame, lambda: Double = Lambda)
      : (Array[Double], Long) =
    modelMemo.get(docs, lambda) {
      val d = Dims
      val data = trainSplit(features(docs)).select(
          when(col("is_good"), 1.0d).otherwise(-1.0d).as("y"), col("x"))
        .rdd.map { r =>
          val xs = r.getSeq[Double](1)
          val a = new Array[Double](d)
          var i = 0
          while (i < d) { a(i) = xs(i); i += 1 }
          (r.getDouble(0), a)
        }
      // one pass: XᵀX (d·d cells; symmetric, folded densely for loop
      // simplicity) + Xᵀy (d cells) + row count, all exact longs
      val (xtx, xty, n) = data.treeAggregate(
        (new Array[Long](d * d), new Array[Long](d), 0L))(
        seqOp = { case ((xx, xy, nn), (y, x)) =>
          var i = 0
          while (i < d) {
            var j = 0
            while (j < d) {
              xx(i * d + j) +=
                math.floor(x(i) * x(j) * Scale + 0.5d).toLong
              j += 1
            }
            xy(i) += math.floor(y * x(i) * Scale + 0.5d).toLong
            i += 1
          }
          (xx, xy, nn + 1L)
        },
        combOp = { case ((a1, b1, n1), (a2, b2, n2)) =>
          var i = 0
          while (i < a1.length) { a1(i) += a2(i); i += 1 }
          i = 0
          while (i < b1.length) { b1(i) += b2(i); i += 1 }
          (a1, b1, n1 + n2)
        })
      // augmented [XᵀX + λI | Xᵀy] in doubles, then Gauss–Jordan in a
      // FIXED operation order (normalize pivot row by division, then
      // subtract f·prow from every other row) — the order the SQL
      // oracle replays verbatim. No pivoting: ridge guarantees nonzero
      // pivots.
      val a = Array.tabulate(d) { i =>
        val row = new Array[Double](d + 1)
        var j = 0
        while (j < d) {
          row(j) = xtx(i * d + j).toDouble / Scale
          if (i == j) row(j) = row(j) + lambda
          j += 1
        }
        row(d) = xty(i).toDouble / Scale
        row
      }
      var p = 0
      while (p < d) {
        val piv = a(p)(p)
        var j = 0
        while (j <= d) { a(p)(j) = a(p)(j) / piv; j += 1 }
        var i = 0
        while (i < d) {
          if (i != p) {
            val f = a(i)(p)
            var k = 0
            while (k <= d) { a(i)(k) = a(i)(k) - f * a(p)(k); k += 1 }
          }
          i += 1
        }
        p += 1
      }
      (Array.tabulate(d)(i => a(i)(d)), n)
    }

  private def scoreCol(w: Array[Double]): Column =
    (0 until Dims).map(i => lit(w(i)) * col("x")(i)).reduce(_ + _)

  /** Declared query: the trained MODEL — (dim, weight) rows,
    * hash-exact against the oracle's in-SQL solve. */
  def qlWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (w, _) = fitRidge(Tables.documents(spark, dir))
    w.toSeq.zipWithIndex.map { case (wt, i) => (i + 1, wt) }
      .toDF("dim", "weight").orderBy("dim")
  }

  /** Declared query: the fit report — split sizes, class balance, and
    * train/holdout accuracy of the distilled model vs the heuristic it
    * distills. One hash-exact row. */
  def qlTrainReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (w, _) = fitRidge(docs)
    features(docs)
      .withColumn("is_train", pmod(col("doc_id"), lit(5L)) =!= 4L)
      .withColumn("ok",
        ((scoreCol(w) > 0.0d) === col("is_good")).cast("long"))
      .agg(
        sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(col("is_train") && col("is_good"), 1L).otherwise(0L))
          .as("n_good_train"),
        (sum(when(col("is_train"), col("ok")).otherwise(0L))
          .cast("double") /
          sum(when(col("is_train"), 1L).otherwise(0L)).cast("double"))
          .as("train_acc"),
        sum(when(!col("is_train"), 1L).otherwise(0L)).as("n_holdout"),
        (sum(when(!col("is_train"), col("ok")).otherwise(0L))
          .cast("double") /
          sum(when(!col("is_train"), 1L).otherwise(0L)).cast("double"))
          .as("holdout_acc"))
  }

  /** Declared query: holdout scoring — every 20%-split document with
    * its margin (the model's QUALITY SCORE a pipeline thresholds on),
    * the binary verdict, the heuristic label, and agreement. */
  def qlClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val (w, _) = fitRidge(docs)
    features(docs)
      .filter(pmod(col("doc_id"), lit(5L)) === 4L)
      .select(col("doc_id"), scoreCol(w).as("score"),
        (scoreCol(w) > 0.0d).as("predicted"), col("is_good"),
        ((scoreCol(w) > 0.0d) === col("is_good")).as("correct"))
      .orderBy("doc_id")
  }

  // ── the SQL oracle: exact Gram sums + unrolled Gauss–Jordan ─────────
  private def featsSqlCtes: String = {
    val stop = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""feats AS MATERIALIZED (
       |  SELECT doc_id,
       |    (n_stop / n_tok) * 0.5 + (1.0 - n_punct / n_chars) * 0.3
       |      + least(n_chars / n_tok / 10.0, 1.0) * 0.2 >= $Threshold
       |      AS is_good,
       |    [1.0,
       |    n_stop / n_tok,
       |    n_punct / n_chars,
       |    least(n_chars / n_tok / 10.0, 1.0),
       |    least(n_tok / 100.0, 1.0),
       |    n_digit / n_chars] AS x
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(regexp_split_to_array(text, '\\s+')) AS DOUBLE)
       |        AS n_tok,
       |      CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
       |        t -> t IN ($stop))) AS DOUBLE) AS n_stop,
       |      CAST(length(regexp_replace(text, '[a-z0-9\\s]', '', 'g'))
       |        AS DOUBLE) AS n_punct,
       |      CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
       |        AS DOUBLE) AS n_digit,
       |      CAST(length(text) AS DOUBLE) AS n_chars
       |    FROM documents) t),
       |train AS MATERIALIZED (
       |  SELECT CASE WHEN is_good THEN 1.0 ELSE -1.0 END AS y, x
       |  FROM feats WHERE doc_id % 5 <> 4),
       |xt AS MATERIALIZED (
       |  SELECT i.i, j.j,
       |    CAST(SUM(CAST(floor(x[i.i] * x[j.j] * 4294967296.0 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s
       |  FROM train,
       |    unnest(generate_series(1, $Dims)) AS i(i),
       |    unnest(generate_series(1, $Dims)) AS j(j)
       |  GROUP BY i.i, j.j),
       |xy AS MATERIALIZED (
       |  SELECT i.i,
       |    CAST(SUM(CAST(floor(y * x[i.i] * 4294967296.0 + 0.5)
       |      AS BIGINT)) AS BIGINT) AS s
       |  FROM train, unnest(generate_series(1, $Dims)) AS i(i)
       |  GROUP BY i.i),
       |a0 AS MATERIALIZED (
       |  SELECT xt.i AS r,
       |    list_append(
       |      list(CAST(xt.s AS DOUBLE) / 4294967296.0
       |        + CASE WHEN xt.i = xt.j THEN $Lambda ELSE 0.0 END
       |        ORDER BY xt.j),
       |      CAST(xy.s AS DOUBLE) / 4294967296.0) AS v
       |  FROM xt JOIN xy ON xy.i = xt.i GROUP BY xt.i, xy.s)"""
      .stripMargin
  }

  /** One Gauss–Jordan step around 1-based pivot `p`, mirroring the
    * Scala elimination's operation order exactly. */
  private def gjStep(p: Int): String =
    s"""a$p AS MATERIALIZED (
       |  SELECT r, CASE WHEN r = $p THEN prow
       |    ELSE list_transform(range(1, ${Dims + 2}),
       |      j -> v[j] - v[$p] * prow[j]) END AS v
       |  FROM (
       |    SELECT a.r, a.v, p.prow
       |    FROM a${p - 1} a, (
       |      SELECT list_transform(v, e -> e / v[$p]) AS prow
       |      FROM a${p - 1} WHERE r = $p) p) t)""".stripMargin

  private def trainedCtes: String =
    s"""WITH $featsSqlCtes,
       |${(1 to Dims).map(gjStep).mkString(",\n")},
       |wts AS MATERIALIZED (
       |  SELECT list(v[${Dims + 1}] ORDER BY r) AS w FROM a$Dims)"""
      .stripMargin

  private val scoreSql =
    s"list_reduce(list_transform(range(1, ${Dims + 1}), " +
      "i -> w.w[i] * f.x[i]), (a, b) -> a + b)"

  val qlWeightsSql: String =
    s"""$trainedCtes
       |SELECT CAST(r AS INT) AS dim, v[${Dims + 1}] AS weight
       |FROM a$Dims ORDER BY dim""".stripMargin

  val qlTrainReportSql: String =
    s"""$trainedCtes,
       |scored AS (
       |  SELECT f.doc_id, f.is_good, f.doc_id % 5 <> 4 AS is_train,
       |    CASE WHEN ($scoreSql > 0) = f.is_good THEN 1 ELSE 0 END AS ok
       |  FROM feats f, wts w)
       |SELECT
       |  CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_train,
       |  CAST(SUM(CASE WHEN is_train AND is_good THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_good_train,
       |  CAST(CAST(SUM(CASE WHEN is_train THEN ok ELSE 0 END) AS BIGINT)
       |      AS DOUBLE)
       |    / CAST(CAST(SUM(CASE WHEN is_train THEN 1 ELSE 0 END)
       |      AS BIGINT) AS DOUBLE) AS train_acc,
       |  CAST(SUM(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_holdout,
       |  CAST(CAST(SUM(CASE WHEN NOT is_train THEN ok ELSE 0 END)
       |      AS BIGINT) AS DOUBLE)
       |    / CAST(CAST(SUM(CASE WHEN NOT is_train THEN 1 ELSE 0 END)
       |      AS BIGINT) AS DOUBLE) AS holdout_acc
       |FROM scored""".stripMargin

  val qlClassifierSql: String =
    s"""$trainedCtes,
       |scored AS (
       |  SELECT f.doc_id, $scoreSql AS score, f.is_good
       |  FROM feats f, wts w WHERE f.doc_id % 5 = 4)
       |SELECT doc_id, score, score > 0 AS predicted, is_good,
       |  (score > 0) = is_good AS correct
       |FROM scored ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ql_weights" -> (qlWeights _),
    "ql_train_report" -> (qlTrainReport _),
    "ql_classifier" -> (qlClassifier _))

  val oracles: Map[String, String] = Map(
    "ql_weights" -> qlWeightsSql,
    "ql_train_report" -> qlTrainReportSql,
    "ql_classifier" -> qlClassifierSql)
}
