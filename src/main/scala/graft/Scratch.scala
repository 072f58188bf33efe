package graft

import graft.functions.Dedup
import org.apache.spark.sql.functions._

/** Throwaway local smoke runs while iterating (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("32")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warmup")(docs.count())
    val withH = Dedup.withShingleHashes(docs)
    time("shingle_hashes")(withH.select(sum(size(col("shingle_hashes")))).collect())
    val signed = time("signature")(
      Dedup.withSignature(withH).select("doc_id", "signature"))
    time("signature collect")(signed.count())
    val buckets = Dedup.lshBuckets(
      Dedup.withSignature(withH).select("doc_id", "shingle_hashes", "signature"))
    time("buckets")(buckets.count())
    val cands = buckets.alias("x").join(buckets.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
    println("candidates: " + time("cands")(cands.count()))
    time("full pairs")(Dedup.minhashDuplicatePairs(docs, 0.2).count())
    spark.stop()
  }
}
