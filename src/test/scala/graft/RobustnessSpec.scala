package graft

import graft.functions.{AvroCodec, Dedup, Envelope, Similarity}
import org.apache.spark.sql.functions._

/** Edge cases: unicode through the wire format, empty inputs, and
  * exactness of the cosine near-dup against a driver-side computation. */
class RobustnessSpec extends SparkSpec {

  test("unicode and empty strings survive the avro envelope") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      ("héllo wörld 中文 🎉", "t1", 1, "", Map("k" -> "日本語"),
        Map.empty[String, Long]),
      ("", "t2", 2, "a.b", Map.empty[String, String], Map("n" -> -1L)))
      .toDF("database", "tbl", "table_id", "pk", "strings", "longs")
      .withColumn("integers",
        map().cast("map<string,int>"))
      .withColumn("record", struct(col("database"), col("tbl"),
        col("table_id"), col("pk"), col("integers"), col("strings"),
        col("longs")))
    val back = df.withColumn("bin",
        AvroCodec.encode(col("record"), Envelope.genericSchemaV1))
      .select(AvroCodec.decode(col("bin"), Envelope.genericSchemaV1,
        Envelope.genericStructV1).as("d"))
      .select("d.database", "d.strings", "d.longs")
      .collect()
    assert(back(0).getString(0) === "héllo wörld 中文 🎉")
    assert(back(0).getAs[Map[String, String]]("strings") ===
      Map("k" -> "日本語"))
    assert(back(1).getAs[Map[String, Long]]("longs") === Map("n" -> -1L))
  }

  test("dedup operators tolerate empty and single-token documents") {
    val sparkS = spark
    import sparkS.implicits._
    val docs = Seq((1L, "solo", "s0"), (2L, "", "s0"),
      (3L, "two words", "s0")).toDF("doc_id", "text", "source")
    // single-token and empty docs have no bigrams → null signature, no
    // crash, and they simply can't pair
    val signed = Dedup.withSignature(Dedup.withShingleHashes(docs))
    assert(signed.count() === 3)
    assert(signed.filter(col("doc_id") === 3)
      .select("signature").collect().head.getSeq[Long](0).nonEmpty)
    val sims = Dedup.withSimhash(docs)
    assert(sims.count() === 3)
  }

  test("cosine near-dup pairs equal brute force restricted to LSH buckets") {
    val sparkS = spark
    import sparkS.implicits._
    val emb = Tables.embeddings(spark, sf)
    // driver-side oracle: all pairs SHARING A BUCKET with cos >= t —
    // the operator's declared semantics (bucket-restricted candidates)
    val rows = Similarity
      .withLshKey(emb.select("vec_id", "embedding"), "embedding",
        Similarity.autoBits(emb))
      .select("vec_id", "lsh_key", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      (i, ki, vi) <- rows; (j, kj, vj) <- rows
      if i < j && ki == kj && cos(vi, vj) >= 0.3
    } yield (i, j)).toSet
    val got = Similarity.nearDupPairs(emb, 0.3)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty, "declared near-dup query must not be vacuous")
  }

  test("splitter edge cases: single key, negative domains, huge limits") {
    import graft.sources.Snapshot
    assert(Snapshot.splitRanges(5, 5, 4) === Seq((5L, 5L)))
    assert(Snapshot.splitRanges(-10, -1, 2) === Seq((-10L, -6L), (-5L, -1L)))
    assert(Snapshot.splitRanges(0, 9, 3, splitLimit = 1000) ===
      Snapshot.splitRanges(0, 9, 3))
    assert(Snapshot.splitRanges(1, 0, 3) === Seq.empty)
  }
}
