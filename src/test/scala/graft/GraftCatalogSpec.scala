package graft

import graft.functions.HashFunctions

class GraftCatalogSpec extends SparkSpec {

  test("installed catalog serves views and native functions to pure SQL") {
    GraftCatalog.install(spark, sf)
    val fp = spark.sql(
      "SELECT doc_id, rolling_hash(text) AS h FROM documents ORDER BY doc_id LIMIT 3")
      .collect()
    val refText = spark.sql(
      "SELECT text FROM documents ORDER BY doc_id LIMIT 3")
      .collect().map(_.getString(0))
    assert(fp.map(_.getLong(1)).toSeq ===
      refText.map(HashFunctions.rollingHashRef(_)).toSeq)

    val sim = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |  dot_product(a.embedding, b.embedding) AS dp,
        |  sq_l2(a.embedding, b.embedding) AS d2
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin).collect().head
    assert(!sim.isNullAt(2) && sim.getDouble(3) > 0)

    val sh = spark.sql(
      "SELECT size(bigram_shingle_hashes(text)) AS n, simhash64(bigram_shingle_hashes(text)) AS s FROM documents LIMIT 5")
      .collect()
    assert(sh.forall(r => r.getInt(0) > 0))
  }
}
