package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up testdata derivation: build sfN from a driver-generated base
  * directory by K perturbed copies — `sbt "runMain graft.GenScale
  * /root/testdata/sf0.1 .scale/sf1 10"`. The driver's own scaling
  * pattern is mirrored (verified against sf0.01→sf0.1: contiguous ids,
  * 10× rows, the SAME 30-day event window with 10× users), and the
  * perturbations are chosen so each workload family keeps its sf0.1
  * SHAPE at 10× the volume rather than degenerating:
  *
  *  - documents: EVERY copy k (including 0) rewrites every EVEN
  *    position token with a copy-tagged form (`concat(t,'x',k)`).
  *    Every bigram therefore contains at least one copy-tagged token,
  *    so two DISTINCT copies share ZERO bigrams (hence zero n-grams
  *    for any n ≥ 2) for ALL copy pairs — duplicate/near-dup
  *    structure scales LINEARLY (10× the groups, same group sizes).
  *    Two earlier rules failed this invariant and the sf1 runs caught
  *    both: every-5th-token on copies k ≥ 1 left cross-copy bigram
  *    Jaccard ≈ 0.2-0.45 (inflating TRUE pairs ~100×, 8 GB spill in
  *    the candidate join), and (position + k) mod 3 left copy pairs
  *    with k1 ≡ k2 (mod 3) sharing exactly the bigrams at positions
  *    ≡ 1-k (mod 3) — a third of them, Jaccard ≈ 0.195, straddling
  *    the 0.2 dd_ngram_jaccard threshold. The parity rule has no such
  *    residue-class collision: the tagged token is in every bigram of
  *    every copy. Exact duplicates inside the base remain exact
  *    duplicates inside each copy (the rewrite is position-keyed,
  *    identical for both).
  *  - embeddings: per-dimension deterministic jitter of ±0.35 on the
  *    unit-norm 64-d vectors — |ε|² ≈ 2.6, so base↔copy cosine lands
  *    ≈ 0.53 and copy↔copy ≈ 0.3: copies are NOT semantic duplicates
  *    (a ±0.01 first cut left them at cos ≈ 0.9999, and SemDeDup at
  *    sf1 then — correctly — dropped >90 % of the corpus, tripping
  *    its drop-fraction gate; the gate was right, the corpus was
  *    degenerate), while ANN/recall structure still scales 10×.
  *  - TPC-H relations: key-offset copies (the standard dbgen shape);
  *    nation/region stay fixed dimension tables.
  *  - events: same time window, user/event ids offset — densifies the
  *    rolling windows exactly like the driver's own sf steps.
  *
  * Copy 0 keeps the base's ids and relational values (documents' text
  * carries copy 0's own token rewrite — the zero-overlap rule needs
  * every copy's even positions tagged with its own k). Everything is
  * deterministic (position/id/copy-keyed expressions, no rand()). */
object GenScale {

  val AllTables: Set[String] = Set("region", "nation", "documents",
    "embeddings", "events", "lineitem", "orders", "customer", "part",
    "supplier")

  /** Optional trailing args restrict WHICH tables are derived —
    * `runMain graft.GenScale .scale/sf1 .scale/sf10 10 documents
    * events part orders lineitem` builds only the tables the
    * steep-slope watch-list queries read (VERDICT r12 item 3: the
    * sf10 decade exists to pin those six queries' slopes, not to pay
    * for a full corpus copy). Every perturbation rule COMPOSES across
    * decades: re-tagging an already-tagged even-position token
    * (`thex3` → `thex3x7`) keeps every bigram carrying the new
    * copy's own tag, so distinct sf10 copies again share zero
    * n-grams; key-offset and same-window rules are closed under
    * repetition by construction. */
  def main(args: Array[String]): Unit = {
    val (base, out) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val tables = if (args.length > 3) args.drop(3).toSet else AllTables
    val unknown = tables.diff(AllTables)
    require(unknown.isEmpty, s"unknown tables: $unknown")
    val spark = GraftSession.get()
    generate(spark, base, out, copies, tables)
    spark.stop()
  }

  def generate(spark: SparkSession, base: String, out: String,
      copies: Int, tables: Set[String] = AllTables): Unit = {
    val ks = spark.range(copies).select(col("id").as("k"))
    def read(t: String) = spark.read.parquet(s"$base/$t.parquet")
    def fan(df: DataFrame) = df.crossJoin(broadcast(ks))
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect()(0).getLong(0) + 1L
    def write(df: DataFrame, t: String, parts: Int): Unit =
      if (tables(t)) df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")

    // dimension tables: unchanged
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    if (tables("documents")) {
      val docs = read("documents")
      val dStride = stride(docs, "doc_id")
      write(fan(docs).select(
        (col("doc_id") + col("k") * dStride).as("doc_id"),
        expr("""concat_ws(' ', transform(split(text, ' '),
          |  (t, i) -> CASE WHEN i % 2 = 0
          |            THEN concat(t, 'x', k) ELSE t END))"""
          .stripMargin).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long")),
        "documents", 8)
    }

    if (tables("embeddings")) {
      val emb = read("embeddings")
      val vStride = stride(emb, "vec_id")
      write(fan(emb).select(
        (col("vec_id") + col("k") * vStride).as("vec_id"),
        expr("""transform(embedding, (x, i) -> CAST(x +
          |  CASE WHEN k > 0
          |  THEN (pmod(xxhash64(vec_id, k, i), 1000) - 500) / 1429.0
          |  ELSE 0.0 END AS FLOAT))""".stripMargin).as("embedding"),
        col("label")), "embeddings", 8)
    }

    if (tables("events")) {
      val ev = read("events")
      val eStride = stride(ev, "event_id")
      val uStride = stride(ev, "user_id")
      write(fan(ev).select(
        (col("event_id") + col("k") * eStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("k") * uStride).as("user_id"),
        col("event_type"), col("value"), col("props")), "events", 8)
    }

    // key strides shared across the TPC-H relations (computed from the
    // BASE tables, so a filtered derivation still offsets consistently)
    lazy val oStride = stride(read("orders"), "o_orderkey")
    lazy val cStride = stride(read("customer"), "c_custkey")
    lazy val pStride = stride(read("part"), "p_partkey")
    lazy val sStride = stride(read("supplier"), "s_suppkey")

    if (tables("lineitem"))
      write(fan(read("lineitem")).select(
        (col("l_orderkey") + col("k") * oStride).as("l_orderkey"),
        (col("l_partkey") + col("k") * pStride).as("l_partkey"),
        (col("l_suppkey") + col("k") * sStride).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")), "lineitem", 16)

    if (tables("orders"))
      write(fan(read("orders")).select(
        (col("o_orderkey") + col("k") * oStride).as("o_orderkey"),
        (col("o_custkey") + col("k") * cStride).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")), "orders", 8)

    if (tables("customer"))
      write(fan(read("customer")).select(
        (col("c_custkey") + col("k") * cStride).as("c_custkey"),
        when(col("k") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("-"), col("k")))
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
        "customer", 4)

    if (tables("part"))
      write(fan(read("part")).select(
        (col("p_partkey") + col("k") * pStride).as("p_partkey"),
        when(col("k") === 0, col("p_name"))
          .otherwise(concat(col("p_name"), lit(" k"), col("k")))
          .as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")), "part", 4)

    if (tables("supplier"))
      write(fan(read("supplier")).select(
        (col("s_suppkey") + col("k") * sStride).as("s_suppkey"),
        when(col("k") === 0, col("s_name"))
          .otherwise(concat(col("s_name"), lit("-"), col("k")))
          .as("s_name"),
        col("s_nationkey"), col("s_acctbal")), "supplier", 2)

    println(s"[gen-scale] wrote $out ($copies x $base, " +
      s"${tables.toSeq.sorted.mkString(",")})")
  }
}
