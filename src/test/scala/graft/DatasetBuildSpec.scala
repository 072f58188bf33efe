package graft

import graft.functions.{DatasetBuild, Dedup, TrainPrep}
import org.apache.spark.sql.functions._

class DatasetBuildSpec extends SparkSpec {

  test("manifest: only funnel survivors appear, and every survivor " +
    "that clears the leak guard appears exactly once") {
    val manifest = DatasetBuild.tpDatasetBuild(spark, sf).collect()
    val ids = manifest.map(_.getAs[Long]("doc_id"))
    assert(ids.length === ids.distinct.length, "one row per doc")
    val surv = TrainPrep.funnelFlags(Tables.documents(spark, sf))
      .filter(col("c4")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.forall(surv), "every manifest doc survived the funnel")
    // val/test survivors are never dropped by the leak guard
    val nonTrainSurv = surv.count(id => {
      val h = ((id % 1000003L + 1000003L) % 1000003L) * 2654435761L % 100L
      h >= 80
    })
    val nonTrainInManifest =
      manifest.count(r => r.getAs[String]("split") != "train")
    assert(nonTrainInManifest === nonTrainSurv,
      "all val/test survivors present")
  }

  test("manifest: bins are contiguous per (split, shard) and respect " +
    "capacity (multi-doc bins) — greedy-fold semantics") {
    val capacity = 128
    val manifest = DatasetBuild.tpDatasetBuild(spark, sf).collect()
    manifest.groupBy(r =>
      (r.getAs[String]("split"), r.getAs[Long]("shard"))).foreach {
      case ((split, shard), rows) =>
        val byBin = rows.groupBy(_.getAs[Long]("bin"))
        val bins = byBin.keys.toSeq.sorted
        assert(bins === (0L until bins.length).toSeq,
          s"($split,$shard) bins contiguous from 0")
        byBin.foreach { case (bin, docs) =>
          val tot = docs.map(_.getAs[Long]("n_tok")).sum
          assert(tot <= capacity || docs.length === 1,
            s"($split,$shard,$bin) over capacity with ${docs.length} docs")
        }
        // replay the greedy fold on the sorted docs: same assignment
        val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
        var bin = 0L; var fill = 0L; var first = true
        sorted.foreach { r =>
          val tok = r.getAs[Long]("n_tok")
          if (first) { fill = tok; first = false }
          else if (fill + tok <= capacity) fill += tok
          else { bin += 1; fill = tok }
          assert(r.getAs[Long]("bin") === bin,
            s"doc ${r.getAs[Long]("doc_id")} bin")
        }
    }
  }

  test("manifest: kept train docs share no residual n-gram hash with " +
    "any test doc (leak guard holds on CLEANED text)") {
    val manifest = DatasetBuild.tpDatasetBuild(spark, sf)
    val cleaned = DatasetBuild.cleanedCorpus(
      Tables.documents(spark, sf), 3, 8)
    val grams = cleaned.select(col("doc_id"), col("split"),
      explode(TrainPrep.ngramHashes(col("residual"), 5)).as("g"))
    val testG = grams.filter(col("split") === "test")
      .select("g").distinct()
    val leakedTrain = grams.filter(col("split") === "train")
      .join(testG, "g").select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val keptTrain = manifest.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0))
    assert(keptTrain.nonEmpty, "train survivors exist")
    assert(keptTrain.forall(id => !leakedTrain(id)),
      "no leaked train doc in the manifest")
  }

  test("manifest: residual hashes match dd_span_excise run on the " +
    "survivor corpus (excision stage is the shared operator)") {
    val surv = TrainPrep.funnelFlags(Tables.documents(spark, sf))
      .filter(col("c4")).select("doc_id", "text")
    val twin = Dedup.ddSpanExciseFrom(surv)
      .select("doc_id", "residual_hash", "residual_len")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("residual_hash"), r.getAs[Long]("residual_len"))))
      .toMap
    DatasetBuild.tpDatasetBuild(spark, sf).collect().foreach { r =>
      val (h, l) = twin(r.getAs[Long]("doc_id"))
      assert(r.getAs[String]("residual_hash") === h)
      assert(r.getAs[Long]("residual_len") === l)
    }
  }

  test("report: 7 stages, funnel counts monotone, excise preserves " +
    "docs, pack preserves tokens, manifest reconciles") {
    val rep = DatasetBuild.tpDatasetBuildReport(spark, sf).collect()
    assert(rep.length === 7)
    assert(rep.map(_.getAs[String]("stage")).toSeq === Seq("gopher",
      "repetition", "decontaminate", "quality", "excise", "leak_guard",
      "pack"))
    val n = rep.map(_.getAs[Long]("n_units"))
    assert(n(0) >= n(1) && n(1) >= n(2) && n(2) >= n(3),
      "funnel stages only shrink")
    assert(n(4) === n(3), "excision drops no docs")
    assert(n(5) <= n(4), "leak guard only shrinks")
    val tok = rep.map(_.getAs[Long]("tok_sum"))
    assert(tok(4) <= tok(3), "excision removes tokens, never adds")
    assert(tok(6) === tok(5), "pack preserves tokens")
    assert(rep(6).isNullAt(rep(6).fieldIndex("id_sum")),
      "pack stage has no id checksum")
    val manifest = DatasetBuild.tpDatasetBuild(spark, sf).collect()
    assert(manifest.length.toLong === n(5), "manifest rows = kept docs")
    val bins = manifest.map(r => (r.getAs[String]("split"),
      r.getAs[Long]("shard"), r.getAs[Long]("bin"))).distinct.length
    assert(bins.toLong === n(6), "report bin count = manifest bins")
    assert(manifest.map(_.getAs[Long]("n_tok")).sum === tok(5),
      "manifest tokens = kept tokens")
  }

  test("pack sharding: doubling nShards refines shards in place and " +
    "every new group folds exactly as if packed alone (per-group " +
    "locality — the deriveShards sizing rule's correctness premise)") {
    val docs = Tables.documents(spark, sf)
    val at8 = DatasetBuild.tpDatasetBuildFrom(docs, nShards0 = 8)
      .collect()
    val at16 = DatasetBuild.tpDatasetBuildFrom(docs, nShards0 = 16)
      .collect()
    // same doc set regardless of shard count
    assert(at8.map(_.getAs[Long]("doc_id")).sorted.toSeq ===
      at16.map(_.getAs[Long]("doc_id")).sorted.toSeq)
    // mod-16 refines mod-8: every 16-shard group is a subset of the
    // 8-shard group with shard % 8
    at16.foreach { r =>
      assert(r.getAs[Long]("shard") % 8 ===
        at8.find(_.getAs[Long]("doc_id") === r.getAs[Long]("doc_id"))
          .get.getAs[Long]("shard"))
    }
    // per-group locality: each (split, shard) group's assignment at
    // EITHER shard count equals the pure fold of just that group
    Seq(at8, at16).foreach { manifest =>
      manifest.groupBy(r =>
        (r.getAs[String]("split"), r.getAs[Long]("shard"))).foreach {
        case ((split, shard), rows) =>
          val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
          val alone = DatasetBuild.packAssign(
            sorted.iterator.map(r => (split, shard,
              r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
              r.getAs[Long]("residual_len"),
              r.getAs[String]("residual_hash"))), 128)
            .map(t => t._1 -> t._4).toMap
          sorted.foreach(r => assert(
            r.getAs[Long]("bin") === alone(r.getAs[Long]("doc_id")),
            s"($split,$shard) doc ${r.getAs[Long]("doc_id")}"))
      }
    }
  }

  test("deriveShards: power of two, 16 floor, docsPerShard honored, " +
    "monotone in corpus size") {
    assert(DatasetBuild.deriveShards(0L) === 16)
    assert(DatasetBuild.deriveShards(1L << 20) === 16)  // 16*128k = 2^21
    assert(DatasetBuild.deriveShards(1L << 22) === 32)
    assert(DatasetBuild.deriveShards(10L * 1000L * 1000L * 1000L)
      === (1 << 17), "the 100 TB sizing example in the scaladoc")
    var prev = 0
    for (e <- 10 to 34) {
      val n = DatasetBuild.deriveShards(1L << e)
      assert((n & (n - 1)) === 0, s"2^$e gives non-power-of-two $n")
      assert(n >= prev, "monotone")
      assert(n >= 16)
      prev = n
    }
    // auto mode wires through: nShards0 <= 0 derives (tiny corpus -> 16
    // shards, same as the default, so the manifest matches exactly)
    val docs = Tables.documents(spark, sf)
    val auto = DatasetBuild.tpDatasetBuildFrom(docs, nShards0 = 0)
      .collect().map(_.toSeq).toSeq
    val fixed = DatasetBuild.tpDatasetBuildFrom(docs, nShards0 = 16)
      .collect().map(_.toSeq).toSeq
    assert(auto === fixed)
  }

  test("plan: no cartesian, no sort-merge join, pack exchange carries " +
    "no text column") {
    val df = DatasetBuild.tpDatasetBuild(spark, sf)
    graft.util.SpillAudit.executeOwnPlan(df)
    val p = graft.Plans.finalPlanOnly(
      df.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "id joins must broadcast:\n" + p.take(3000))
    // the repartition feeding the pack fold must not carry raw text
    val packExchange = p.split("\n")
      .filter(_.contains("Exchange hashpartitioning(split"))
    assert(packExchange.nonEmpty, "pack repartition present")
    assert(!packExchange.exists(_.contains("residual#")),
      "pack shuffle carries hashes, not text")
  }
}
