package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into k-means cells, probe only the `nprobe` cells nearest to
  * each query. The coarse quantizer is Lloyd's algorithm expressed as
  * DataFrame operations — each iteration is one broadcast-assign pass
  * (narrow) plus one per-dimension average (a (cid, dim) shuffle), so
  * it scales to any corpus the cluster can scan.
  *
  * At 100 TB the cell assignment becomes the partition key of the
  * vector table (write bucketed by `cid`), and a query touches
  * nprobe/k of the data — this sandbox build computes assignments on
  * the fly but keeps exactly that join shape.
  */
object Ivf {

  /** Squared L2 distance between two float/double array columns —
    * native codegen ([[SqL2Distance]]). */
  private def sqDist(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = VectorFunctions.sq_l2(a, b)

  /** Deterministic seeds: the k lowest vec_ids. */
  def seedCentroids(corpus: DataFrame, k: Int): DataFrame =
    corpus.orderBy("vec_id").limit(k)
      .withColumn("cid", row_number().over(
        Window.orderBy("vec_id")) - 1)
      .select(col("cid"),
        transform(col("embedding"), _.cast("double")).as("centroid"))

  /** One Lloyd iteration: assign → per-dimension mean. */
  def lloydStep(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val assigned = assign(corpus, centroids)
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cid", "dim").agg(avg(col("v").cast("double")).as("m"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cid"), transform(col("dm"), x => x("m")).as("centroid"))
  }

  /** Nearest-centroid assignment (broadcast centroids, narrow pass). */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id")
      .orderBy(col("__d"), col("cid"))
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("embedding"), col("centroid")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__d", "__rk", "centroid")
  }

  def trainCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame =
    (1 to iters).foldLeft(seedCentroids(corpus, k)) {
      (c, _) => lloydStep(corpus, c)
    }

  /** ANN top-k: probe the `nprobe` nearest cells per query, exact
    * cosine rank within the probed cells. */
  def topKIvf(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cells = assign(corpus, centroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        col("cid"))
    val probeW = Window.partitionBy("vec_id").orderBy(col("__d"), col("cid"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("embedding"), col("centroid")))
      .withColumn("__rk", row_number().over(probeW))
      .filter(col("__rk") <= nprobe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        col("cid"))
    val rankW = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("c_id"))
    probes.join(cells, Seq("cid"))
      .withColumn("cos", Similarity.cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("q_id", "c_id", "cos", "rank")
  }

  def simIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val centroids = trainCentroids(emb, k = 8, iters = 2)
    topKIvf(emb.filter(col("vec_id") < 10), emb, centroids, k = 5,
      nprobe = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_ann" -> (simIvf _))

  val oracles: Map[String, String] = Map.empty
}
