package graft

import graft.operators.Relational

/** Physical-plan audits: these lock in the plan shapes that make the
  * queries scale — a regression that drops a pushdown or inflates a
  * broadcast into a shuffle join should fail CI, not show up at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: predicates are pushed into the parquet scan") {
    val p = plan(Relational.q6ForecastRevenue(spark, sf))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), "shipdate filter reaches the scan")
    // column pruning: scan must not read the unused columns
    assert(p.contains("ReadSchema"))
    assert(!p.split("ReadSchema")(1).split("\n")(0).contains("l_returnflag"),
      "unused column not read")
  }

  test("q1: aggregation is partial (map-side) before the shuffle") {
    val p = plan(Relational.q1PricingSummary(spark, sf))
    assert(p.contains("partial_"), "partial aggregation present:\n" + p)
    assert(p.contains("Exchange hashpartitioning(l_returnflag"),
      "single shuffle keyed on the group columns")
  }

  test("q3: customer dimension is broadcast, not shuffled") {
    val p = plan(Relational.q3ShippingPriority(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 uses TakeOrdered, not a global sort")
  }

  test("q5: all dimension joins are broadcast; only the fact side shuffles") {
    val p = plan(Relational.q5LocalSupplier(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    // orders⋈lineitem + final agg only
    assert(shuffles <= 3, s"too many shuffles ($shuffles):\n$p")
  }

  test("q9: part/supplier/nation broadcast; one fact-side shuffle join") {
    val p = plan(graft.operators.RelationalMore.q9ProductProfit(spark, sf))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$p")
    assert(p.contains("PushedFilters"), "p_name filter reaches the part scan")
  }

  test("q13: orders aggregate broadcasts into customer (no fact-through-join)") {
    val p = plan(graft.operators.RelationalMore
      .q13CustomerDistribution(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), "order counts map-side combined")
  }

  test("q18: the HAVING aggregate joins back via broadcast, fact scans once") {
    val p = plan(graft.operators.RelationalMore.q18LargeOrders(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), "top-100 uses TakeOrdered")
    assert(p.contains("partial_"), "quantity aggregate is map-side combined")
  }

  test("change feed decode is a pure narrow projection (no shuffle)") {
    // the declared s2 query adds a final presentation orderBy for the
    // oracle hash; the operator itself must stay narrow
    val p = plan(graft.sources.ChangeFeed.fromEvents(spark, sf)
      .select("event_id", "op", "mtype", "database", "tbl", "table_id",
        "pk", "ts_us"))
    assert(!p.contains("Exchange"), "decode must not shuffle:\n" + p)
  }

  test("IVF assignment is zero-shuffle (broadcast-literal argmin)") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = graft.functions.Ivf.seedCentroids(emb, 4)
    val p = plan(graft.functions.Ivf.assign(emb, centroids))
    assert(!p.contains("Exchange"),
      "cell assignment must not shuffle the corpus:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "no corpus×centroids join:\n" + p)
  }

  test("banded simhash candidates come from a hash join, not all-pairs") {
    val p = plan(graft.functions.Dedup.simhashPairsBanded(
      Tables.documents(spark, sf), 3))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on band keys:\n" + p)
    assert(p.contains("Join"), p)
  }

  test("cosine near-dup candidates come from a hash join on lsh_key") {
    val p = plan(graft.functions.Similarity.nearDupPairs(
      Tables.embeddings(spark, sf), 0.3))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "no unblocked all-pairs join:\n" + p)
    assert(p.contains("lsh_key"), p)
  }

  test("simhash/fingerprint path stays inside whole-stage codegen") {
    // pre-repartitioned input: Par.widen (r16) is then a no-op, so the
    // audit sees the pure fingerprint stage — the assert's target is
    // that simhash64/rolling_hash stay codegen (no fallback), not the
    // input-parallelism exchange widen adds on byte-small scans
    val df = graft.functions.Dedup.withSimhash(
      Tables.documents(spark, sf).repartition(2))
    df.collect() // tiny at this SF; finalizes df's own AQE plan
    // final section only — the toString repeats the initial plan below
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("*("), "codegen stage present:\n" + p)
    assert("Exchange".r.findAllIn(p).length <= 1,
      "only the input repartition exchanges:\n" + p)
  }

  test("q4: lateness EXISTS is a semi join, not a fan-out join") {
    val p = plan(graft.operators.RelationalThird.q4OrderPriority(spark, sf))
    assert(p.contains("LeftSemi"), "EXISTS planned as semi join:\n" + p)
    assert(p.contains("PushedFilters"),
      "order-date filter reaches the orders scan")
  }

  test("q8: every dimension broadcasts; lineitem never rides two shuffles") {
    val p = plan(graft.operators.RelationalThird.q8MarketShare(spark, sf))
    val broadcasts = ("BroadcastHashJoin".r.findAllIn(p).length +
      "BroadcastExchange".r.findAllIn(p).length)
    assert(broadcasts >= 4, s"expected broadcast dimensions, got:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 3, s"too many shuffles ($shuffles):\n$p")
  }

  test("q19: disjunctive predicate halves push below the broadcast join") {
    val p = plan(graft.operators.RelationalThird
      .q19DiscountedRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    // Catalyst's CNF extraction sends the l_quantity OR-envelope to the
    // lineitem side; the scan must see SOME pushed filter
    assert(p.contains("PushedFilters: ["), p)
  }

  test("q21: sole-late-supplier is ONE grouped pass — lineitem scans once") {
    val p = plan(graft.operators.RelationalThird
      .q21WaitingSuppliers(spark, sf))
    val liScans = "lineitem\\.parquet".r.findAllIn(p).length
    assert(liScans == 1,
      s"textbook Q21 self-joins lineitem 3x; this plan must scan it once, got $liScans:\n$p")
    assert(p.contains("partial_"), "per-order counts map-side combined")
  }

  test("q22: threshold is a broadcast scalar; lapsed check is an anti join") {
    val p = plan(graft.operators.RelationalThird.q22GlobalSales(spark, sf))
    assert(p.contains("LeftAnti"), "NOT EXISTS planned as anti join:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "1-row threshold must broadcast:\n" + p)
  }

  test("tp_packing: prefix sums shuffle once on the shard key") {
    val p = plan(graft.functions.TrainPrep.tpPacking(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"per-shard packing needs exactly one shuffle, got $shuffles:\n$p")
    assert(!p.contains("Exchange SinglePartition") ||
      p.contains("TakeOrdered"),
      "no single-partition global window:\n" + p)
  }

  test("ta_repetition: gram counts partial-aggregate before the shuffle") {
    val p = plan(graft.functions.TextAnalysis.taRepetition(spark, sf))
    assert(p.contains("partial_"), "map-side combine present:\n" + p)
  }

  test("a1_array_hof: one grouped collect is the only hash shuffle") {
    val p = plan(graft.operators.RelationalFifth.a1ArrayHof(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"array algebra is post-aggregation projection; got $shuffles:\n$p")
  }

  test("m2_date_functions: pure narrow projection (no hash shuffle)") {
    // the only exchange allowed is the final presentation sort
    val p = plan(graft.operators.RelationalFifth.m2DateFunctions(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"),
      "date scalar library must not shuffle:\n" + p)
  }

  test("j2_full_outer: both sides aggregate before the join") {
    val p = plan(graft.operators.RelationalFifth.j2FullOuter(spark, sf))
    assert(p.contains("FullOuter"), "full outer join planned:\n" + p)
    assert(p.contains("partial_"),
      "side aggregates are map-side combined:\n" + p)
  }

  test("cd_merge_apply: single shuffle, no join anywhere in the plan") {
    val p = plan(graft.operators.CdcAnalytics.mergeApply(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"join-free merge needs exactly one PK shuffle, got $shuffles:\n$p")
    assert(!p.contains("Join"), "merge must not plan a join:\n" + p)
  }

  test("sim_rrf_fusion: heap rankings over one cached scoring pass; " +
    "every exchange carries survivor-sized data") {
    val p = plan(graft.functions.Similarity.simRrfFusion(spark, sf))
    // two partial+final TopKPerKey pairs over the persisted scored
    // pairs (InMemoryTableScan), fused by union + hash aggregate —
    // the shuffles that remain carry <= |Q| x 2 x topK rows (the heap
    // survivors, the fusion groups, the final window), never the
    // |Q| x corpus pair stream the old triple-window form exchanged
    assert("TopKPerKey".r.findAllIn(p).length >= 4,
      "both rankings run partial+final heaps:\n" + p)
    assert(p.contains("InMemoryTableScan"),
      "pairs are scored once through the cache:\n" + p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "query side must broadcast:\n" + p)
  }

  test("ts_reservoir_topk: native partial heap prunes before the one shuffle") {
    val p = plan(graft.functions.TrainPrep.tsReservoirTopk(spark, sf))
    // partial + final TopKPerKey around exactly one stratum shuffle —
    // the map-side heap bounds what the exchange carries, replacing
    // the old two-level (shard + stratum) window form's second pass
    assert("TopKPerKey".r.findAllIn(p).length >= 2,
      s"expected partial+final TopKPerKey:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 1,
      s"one stratum shuffle between the heap phases, got $shuffles:\n$p")
  }

  test("ta_bm25: corpus stats are one broadcast row; tf side never shuffles") {
    val p = plan(graft.functions.TextAnalysis.taBm25(spark, sf))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      "1-row stats must broadcast back:\n" + p)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles == 0,
      s"tf computation is per-row; expected no hash shuffle, got $shuffles:\n$p")
  }

  test("set1: the set ops fold in one pass — no join, one key shuffle") {
    val p = plan(graft.operators.RelationalExt.set1Ops(spark, sf))
    assert(!p.contains("Join"),
      "flag-fold replaces the semi/anti joins:\n" + p)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 2, // key fold + tiny tag fold
      s"expected <=2 hash shuffles, got $shuffles:\n$p")
  }

  test("q21: no Expand — the dual distinct counts fold at (order,supp) grain") {
    val p = plan(graft.operators.RelationalThird
      .q21WaitingSuppliers(spark, sf))
    assert(!p.contains("Expand"),
      "two-level aggregation must not plan an Expand:\n" + p)
    assert(p.contains("partial_"), "map-side partials present")
  }

  test("sim_knn_graph: per-source top-k prunes partially before the shuffle") {
    val p = plan(graft.functions.Similarity.simKnnGraph(spark, sf))
    // native heap operator, partial (pre-shuffle) + final phases
    assert("TopKPerKey".r.findAllIn(p).length >= 2,
      "per-source top-k runs on the partial+final TopKPerKey heap:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      "candidates come from the bucket hash join:\n" + p)
  }

  test("gr_pagerank: rank vector broadcasts; edges never shuffle in rounds") {
    // audit the LAZY iteration plan — the public query materializes it
    // to a checkpoint leaf inside the r16 loop scope
    val p = plan(graft.operators.Stats.grPagerankParts(spark, sf)._1)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "rounds stay sort-free under the static planner:\n" + p)
  }

  test("gr_triangles: wedge/closure joins are sort-free on the " +
    "checkpointed edge list (r17)") {
    val p = plan(graft.functions.Similarity.grTriangles(spark, sf))
    assert(p.contains("ShuffledHashJoin"),
      "hinted joins plan as shuffled-hash:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "no static SMJ on the unknown-stats checkpoint leaves:\n" + p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
  }

  test("p15_unpivot: one Expand, combine happens map-side in the scan stage") {
    val p = plan(graft.operators.RelationalExt.p15Unpivot(spark, sf))
    assert("Expand".r.findAllIn(p).length === 1,
      "unpivot plans exactly one Expand:\n" + p)
    assert(p.contains("partial_"),
      "profile aggregates partially before the (4-row) shuffle:\n" + p)
  }

  test("dd_prefix_jaccard: no unblocked join shapes anywhere") {
    val p = plan(graft.functions.Dedup.ddPrefixJaccard(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      "candidates come from the prefix-gram hash join:\n" + p)
  }

  test("aj2_asof_forward: one key shuffle, no range-join explosion") {
    val p = plan(graft.operators.AsOfJoin.aj2AsofForward(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop") && !p.contains("SortMergeJoin"),
      "forward as-of composes via union + window, never a range join:\n" + p)
  }

  test("j3_bloom_semi: bloom test evaluates in the scan stage, pre-join") {
    val p = plan(graft.operators.RuntimeFilter.j3BloomSemi(spark, sf))
    // the literal-bitset membership test plans as a data Filter below
    // the join, not as a join condition
    val joinAt = p.indexOf("Join")
    val filterAt = p.indexOf("Filter")
    assert(joinAt >= 0 && filterAt > joinAt,
      "bloom Filter sits under the join in the plan tree:\n" + p)
    assert(p.contains("shiftleft"), "bitset test is integer algebra:\n" + p)
    // PROBE SIDE ONLY (VERDICT r13 finding 1): without the
    // ConstraintBarrier, InferFiltersFromConstraints clones the test
    // through the semi-join equality onto the orders scan, shipping
    // the bitset literal in a second stage's task binary. Exactly one
    // plan node (the probe-side Filter) may carry the bitset test.
    val bloomNodes = p.split("\n").count(_.contains("xxhash64"))
    assert(bloomNodes == 1,
      s"bloom test must sit on the probe side only, found it in " +
        s"$bloomNodes plan nodes:\n$p")
    assert(p.split("\n").count(_.contains("no_infer")) == 1,
      "barrier-wrapped filter present exactly once:\n" + p)
  }

  test("suite-wide: BroadcastNestedLoopJoin only where the build is a 1-row scalar") {
    // A BNLJ is O(left·right) per task — acceptable ONLY when one side
    // is a 1-row aggregate (a global count, a threshold, corpus stats).
    // Every headline plan is enumerated; any BNLJ outside this
    // whitelist is a scale regression, not a style issue.
    val scalarBuildWhitelist = Set(
      "q22_global_sales", // global threshold row joined back to cohort
      "ta_bm25", // corpus avg-length row
      "ts_temperature", // mixture normalizer row
      "sim_rrf_fusion", // query row with its int8 codes
      "ta_tfidf", // corpus doc-count row
      "lay_file_skip", // corpus z-bounds row
      "tp_quality_calibration", // score quantile row
      "tc_surprisal", // corpus token-total row
      "ix_rank_search", // corpus (n_docs, sum_dl) stats row
      "ts_dsir_weights", // corpus (T, R, V) scalars row
      "sk_join_size", // three 1-row builds: sizes, exact, estimate
      "sk_approx_percentiles", // 1-row percentile-estimates build
      "sim_rank_metrics", // broadcast query rows, non-equi self filter
      "emb_jl_recall", // broadcast query rows, non-equi self filter
      "dc3_semantic_decontamination", // bounded eval-set broadcast
      "sim_hamming_ann", // broadcast query panel (non-equi) + corpus-count scalar row
      "tp_epoch_plan", // 1-row corpus-totals build over the #sources table
      "sim_matryoshka_recall", // broadcast query panel (non-equi self filter)
      "hy_hybrid_rrf", // broadcast query panel (non-equi) + corpus-stats scalar row
      "sim_mmr", // broadcast query panel (non-equi self filter)
      "ts_cluster_balance", // quota normalizer row (Σweight, n_total)
      "ql_lm_buckets" // vocab-size scalar row (the add-one smoothing V)
    )
    val offenders = graft.Plans.sections(spark, sf).flatMap {
      case (name, _, df) =>
        val p = plan(df)
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
        if (bnlj > 0 && !scalarBuildWhitelist.exists(name.startsWith))
          Some(s"$name ($bnlj BNLJ)")
        else None
    }
    assert(offenders.isEmpty,
      s"non-scalar BroadcastNestedLoopJoin in headline plans: $offenders")
    // CartesianProduct is never acceptable in a headline plan
    val cartesian = graft.Plans.sections(spark, sf).flatMap {
      case (name, _, df) =>
        if (plan(df).contains("CartesianProduct")) Some(name) else None
    }
    assert(cartesian.isEmpty, s"CartesianProduct in: $cartesian")
  }

  test("suite-wide: SortMergeJoin only on the gr_triangles edge-closing joins") {
    // Round 9 removed every sort-merge join from the headline plans
    // except the O(E) edge-closing joins in gr_triangles (both sides
    // are the derived directed-edge table — too big to broadcast by
    // contract, bounded by E, and AQE may still demote them). An SMJ
    // anywhere else means a fusion/report join lost its broadcast or
    // union-aggregate shape — a sort+exchange regression at corpus
    // scale, so the claim is enforced rather than prose.
    // judged on the EXECUTED plan (AQE-final): checkpoint-leaf inputs
    // carry default (huge) stats, so a static render shows SMJs the
    // runtime demotes to broadcast the moment real sizes are known —
    // the claim is about what actually runs
    val smjWhitelist = Set("gr_triangles")
    val offenders = graft.Plans.sections(spark, sf).flatMap {
      case (name, _, df) =>
        graft.util.SpillAudit.executeOwnPlan(df)
        val p = graft.Plans.finalPlanOnly(plan(df))
        val smj = "SortMergeJoin".r.findAllIn(p).length
        if (smj > 0 && !smjWhitelist.exists(name.startsWith))
          Some(s"$name ($smj SMJ)")
        else None
    }
    assert(offenders.isEmpty,
      s"sort-merge joins outside the gr_triangles whitelist: $offenders")
  }

  test("suite-wide: no headline query spills memory when executed") {
    // Executes every headline plan and reads the spill SQL metrics off
    // the executed tree (SpillAudit) — the class of silent-degradation
    // bug behind the round-5 bench blowups becomes a CI failure. Spill
    // legitimately appears only when data outgrows executor memory;
    // at spec scale ANY spill means a plan asked for one (e.g. an
    // unbounded sort buffer), which is a scale defect.
    val spilled = graft.Plans.sections(spark, sf).flatMap {
      case (name, _, df) =>
        // read metrics off the QueryExecution that ran (df.count()
        // would execute a derived plan and leave df's metrics zero)
        val counted = df.groupBy().count()
        counted.collect()
        val sp = graft.util.SpillAudit.spillBytes(counted)
        if (sp > 0) Some(s"$name ($sp B)") else None
    }
    assert(spilled.isEmpty, s"headline queries spilled: $spilled")
  }
}
