package graft

import graft.functions.{HashFunctions, ShingleFunctions}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The single-pass shingle expression must be indistinguishable from
  * the compositional formulation: split("\s+") → zip-adjacent →
  * concat with " " → rolling_hash → array_distinct. */
class ShingleExpressionsSpec extends SparkSpec {

  private def compositional(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("__toks", split(col("s"), "\\s+"))
      .withColumn("expected", array_distinct(transform(
        expr("transform(slice(__toks, 1, size(__toks) - 1), " +
          "(t, i) -> concat(t, ' ', element_at(__toks, i + 2)))"),
        b => HashFunctions.rolling_hash(b))))
      .withColumn("got", ShingleFunctions.bigram_shingle_hashes(col("s")))

  private def assertAgree(strings: Seq[String]): Unit = {
    val sparkS = spark
    import sparkS.implicits._
    val rows = compositional(strings.toDF("s"))
      .select("s", "expected", "got").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"mismatch for input '${r.getString(0)}'")
    }
  }

  test("edge cases: empty, single token, leading/trailing/multiple spaces") {
    assertAgree(Seq("", "solo", "a b", " a b", "a b ", "  a   b  c ",
      "\ta\nb\r c", "a a a a", "héllo wörld 中文 🎉 end"))
  }

  test("random strings agree with the compositional formulation") {
    val gen = Gen.listOf(Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.const(' ')), (1, Gen.const('\t'))))
      .map(_.mkString)
    val samples = Iterator.continually(gen.sample).flatten.take(200).toSeq
    assertAgree(samples)
  }

  test("real corpus agrees and is faster-path equivalent for minhash") {
    val docs = Tables.documents(spark, sf).select(col("text").as("s"))
    val bad = compositional(docs)
      .filter(not(col("expected") === col("got"))).count()
    assert(bad === 0)
  }
}
