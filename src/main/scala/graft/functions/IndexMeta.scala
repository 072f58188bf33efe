package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared membership/fingerprint bookkeeping for the persisted ANN
  * artifacts (IVF cell store, PQ codes, Hamming signature store) —
  * the [[GramIndex]] maintenance device factored out for vector
  * corpora, so every persisted index family exposes the same
  * noop/append/rebuild contract under one nightly CLI
  * ([[graft.BuildIndex]]).
  *
  * Membership rows are (vec_id, h = xxhash64(vec_id, embedding)):
  * any membership change or in-place vector edit flips the XOR-folded
  * corpus fingerprint, so delta detection is an id-sized anti-join
  * and freshness is a three-scalar compare. Appends run the
  * family's cheap no-retrain path (assign/encode/sign against the
  * STORED model); anything mutated falls back to the family's full
  * rebuild — tombstone bookkeeping the read path would pay for
  * forever is the alternative, and ingest here is append-shaped
  * (CDC streams).
  *
  * Writes are crash-fail-safe in the [[GramIndex]] way: a sentinel
  * fingerprint (n_vecs = -1, which can never validate) lands BEFORE
  * the first data write and the real fingerprint LAST, so a crash
  * anywhere between leaves an artifact that never validates and
  * rebuilds on the next touch — never one that silently serves or
  * double-appends. */
object IndexMeta {

  /** (vec_id, h) membership row; h covers the full embedding so an
    * in-place vector edit is detected, not just membership churn. */
  def memberDf(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id").cast("long").as("vec_id"),
      xxhash64(col("vec_id").cast("long"), col("embedding")).as("h"))

  /** Order-independent corpus digest: (count, XOR ids, XOR hashes). */
  def fingerprint(vecs: DataFrame): (Long, Long, Long) = {
    val r = memberDf(vecs)
      .agg(count(lit(1)), expr("bit_xor(vec_id)"), expr("bit_xor(h)"))
      .collect()(0)
    (r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1),
      if (r.isNullAt(2)) 0L else r.getLong(2))
  }

  private def writeFp(spark: SparkSession, dir: String, nVecs: Long,
      idXor: Long, hXor: Long): Unit = {
    import spark.implicits._
    Seq((nVecs, idXor, hXor)).toDF("n_vecs", "id_xor", "h_xor")
      .write.mode("overwrite").parquet(s"$dir/fingerprint")
  }

  private def writeSentinel(spark: SparkSession, dir: String): Unit =
    writeFp(spark, dir, -1L, 0L, 0L)

  private def readFp(spark: SparkSession, dir: String)
      : Option[(Long, Long, Long)] =
    try {
      spark.read.parquet(s"$dir/fingerprint").collect().headOption
        .filter(_.getAs[Long]("n_vecs") >= 0L)
        .map(r => (r.getAs[Long]("n_vecs"), r.getAs[Long]("id_xor"),
          r.getAs[Long]("h_xor")))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }

  /** Full rebuild with fail-safe ordering: sentinel → family body →
    * members → real fingerprint. The CLI's plain-build path and
    * [[update]]'s fallback both route here so metadata always exists. */
  def rebuild(vecs: DataFrame, dir: String)(body: () => Unit): String = {
    val spark = vecs.sparkSession
    writeSentinel(spark, dir)
    body()
    memberDf(vecs).write.mode("overwrite").parquet(s"$dir/members")
    val (n, i, h) = fingerprint(vecs)
    writeFp(spark, dir, n, i, h)
    "rebuild"
  }

  /** Classify the current corpus against the stored membership and run
    * the family callbacks: `append` receives the DELTA vectors (the
    * family assigns/encodes/signs them against its stored model —
    * never retraining); `rebuildBody` re-trains and rewrites the whole
    * artifact. Returns "noop" | "append" | "rebuild". */
  def update(vecs: DataFrame, dir: String)(append: DataFrame => Unit)(
      rebuildBody: () => Unit): String = {
    val spark = vecs.sparkSession
    def full(): String = rebuild(vecs, dir)(rebuildBody)
    readFp(spark, dir) match {
      case None => full() // missing, sentinel, or crashed prior write
      case Some(fp) =>
        if (fingerprint(vecs) == fp) "noop"
        else {
          val members =
            try spark.read.parquet(s"$dir/members")
            catch {
              case _: org.apache.spark.sql.AnalysisException => null
            }
          if (members == null) full()
          else {
            val mutated = members
              .join(memberDf(vecs), Seq("vec_id", "h"), "left_anti")
              .limit(1).count() > 0
            if (mutated) full()
            else {
              // LAZY anti-join against the members parquet: all
              // delta-dependent work (fingerprint fold, the family
              // append) must run before the members append below
              val delta = vecs.join(members.select("vec_id"),
                Seq("vec_id"), "left_anti")
              val (dn, di, dh) = fingerprint(delta)
              writeSentinel(spark, dir)
              append(delta)
              memberDf(delta).write.mode("append")
                .parquet(s"$dir/members")
              writeFp(spark, dir, fp._1 + dn, fp._2 ^ di, fp._3 ^ dh)
              "append"
            }
          }
        }
    }
  }
}
