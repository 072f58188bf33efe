package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Writes PLANS.md: the formatted physical plans of the headline
  * queries, with the scale-relevant features called out. Regenerate
  * with: sbt "runMain graft.Plans PLANS.md" */
object Plans {
  /** The headline plans — shared by the PLANS.md writer and
    * PlanAuditSpec's whole-suite audits (BNLJ whitelist). */
  def sections(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(String, String, org.apache.spark.sql.DataFrame)] = Seq(
      ("q1_pricing_summary",
        "single scan; partial (map-side) aggregation before one 6-key shuffle",
        operators.Relational.q1PricingSummary(spark, dir)),
      ("q3_shipping_priority",
        "customer broadcast; one fact shuffle; TakeOrderedAndProject top-10",
        operators.Relational.q3ShippingPriority(spark, dir)),
      ("q5_local_supplier",
        "all four dimensions broadcast; only orders⋈lineitem shuffles",
        operators.Relational.q5LocalSupplier(spark, dir)),
      ("q6_forecast_revenue",
        "all predicates pushed to parquet (PushedFilters); 2-column ReadSchema",
        operators.Relational.q6ForecastRevenue(spark, dir)),
      ("t9_latest_image",
        "one shuffle on the pk ordering domain; rank inside partitions",
        operators.TxOps.t9LatestImage(spark, dir)),
      ("dd_simhash (fingerprint stage)",
        "zero-shuffle: rolling_hash + simhash64 fused in one codegen stage",
        functions.Dedup.withSimhash(Tables.documents(spark, dir))),
      ("aj_asof_join",
        "as-of via union + ignore-nulls window: one key shuffle, no range explosion",
        operators.AsOfJoin.ajAsofJoin(spark, dir)),
      ("q9_product_profit",
        "part/supplier/nation broadcast; lineitem⋈orders is the only fact shuffle",
        operators.RelationalMore.q9ProductProfit(spark, dir)),
      ("q18_large_orders",
        "HAVING aggregate broadcast back into orders; TakeOrdered top-100",
        operators.RelationalMore.q18LargeOrders(spark, dir)),
      ("ivf_assign (zero-shuffle)",
        "literal centroid arrays + codegen argmin: no crossJoin, no window, no Exchange",
        functions.Ivf.assign(Tables.embeddings(spark, dir),
          functions.Ivf.seedCentroids(Tables.embeddings(spark, dir), 8))),
      ("dd_simhash (banded pairing)",
        "pigeonhole bands → hash join on (band, bits, source); no all-pairs block scan",
        functions.Dedup.simhashPairsBanded(Tables.documents(spark, dir), 3)),
      ("sim_neardup_cosine (LSH-blocked)",
        "hash join on the 8-bit hyperplane bucket key; cosine only on candidates",
        functions.Similarity.nearDupPairs(Tables.embeddings(spark, dir), 0.3)),
      ("q2_min_cost_supplier",
        "dimensions broadcast; one grouped shuffle of the filtered fact; min-cost cut as a window over the tiny supply relation",
        operators.RelationalFourth.q2MinCostSupplier(spark, dir)),
      ("dd_span_dedup",
        "span hashes from one codegen scan; both shuffles carry 8-byte gram keys, no gram strings",
        functions.Dedup.ddSpanDedup(spark, dir)),
      ("ev4_transitions",
        "one user_id shuffle for the lead window, then a small transition-matrix aggregate",
        operators.RelationalFourth.ev4Transitions(spark, dir)),
      ("cd_merge_apply",
        "join-free MERGE: base and delta images reduce as conditional struct-max in ONE grouped pass — a single PK shuffle, no base×delta join",
        operators.CdcAnalytics.mergeApply(spark, dir)),
      ("a1_array_hof",
        "one grouped collect; fold/map/filter run as codegen'd higher-order array expressions after the shuffle",
        operators.RelationalFifth.a1ArrayHof(spark, dir)),
      ("ta_rare_bigrams",
        "singleton grams self-identify their doc via min(doc_id) — per-doc rare counts come from re-grouping, never a gram-level self-join",
        functions.TextAnalysis.taRareBigrams(spark, dir)),
      ("sim_rrf_fusion",
        "both rankings and the fusion share ONE q_id shuffle; query side broadcast with its int8 codes",
        functions.Similarity.simRrfFusion(spark, dir)),
      ("ts_reservoir_topk",
        "two-level top-k: pre-rank within (stratum, shard) caps each stratum at shards·k rows before the stratum rank",
        functions.TrainPrep.tsReservoirTopk(spark, dir)),
      ("ev5_anomaly",
        "volume aggregates to (type, day) BEFORE the expanding window — the stats window sees ~150 rows, never the raw stream",
        operators.RelationalFourth.ev5Anomaly(spark, dir)),
      ("j3_bloom_semi",
        "explicit Bloom runtime filter: the 16 KB literal bitset test runs in the scan stage, so non-candidates die before the join",
        operators.RuntimeFilter.j3BloomSemi(spark, dir)),
      ("gr_triangles",
        "degree-ordered wedge enumeration + one closure hash join — out-degree bounded by O(sqrt(E)), each triangle generated once",
        functions.Similarity.grTriangles(spark, dir)),
      ("p15_unpivot",
        "native unpivot plans ONE Expand; the metric profile partial-aggregates map-side in the same stage",
        operators.RelationalExt.p15Unpivot(spark, dir)),
      ("dd_prefix_jaccard",
        "exact corpus-wide similarity join: candidates only from the prefix-gram hash join (256 candidates vs 12.5M pairs at sf0.1), verified by one array_intersect",
        functions.Dedup.ddPrefixJaccard(spark, dir)),
      ("aj2_asof_forward",
        "forward as-of with tolerance: same tag-union + descending window, one key shuffle, bound applied on the carried struct",
        operators.AsOfJoin.aj2AsofForward(spark, dir)),
      ("cd_ivm_join",
        "delta-join view maintenance: three broadcast delta terms folded into the stored view; base-join-base never re-runs",
        operators.CdcAnalytics.ivmJoin(spark, dir)),
      ("dc2_fuzzy_decontamination",
        "cross-set prefix-filtered similarity join: candidates only where train and eval prefix grams meet",
        functions.TrainPrep.dc2FuzzyDecontamination(spark, dir)),
      ("tp_boilerplate_prune",
        "C4-style corpus rewrite: tile doc-frequency is a gram-space agg on 8-byte hashes; the verdict returns as one hash join; reassembly rides the per-doc groupBy",
        functions.CorpusOps.tpBoilerplatePrune(spark, dir)),
      ("ts_priority_sample",
        "sequential Poisson weighted sampling: TakeOrderedAndProject — per-partition heaps, one k-row merge, no corpus shuffle",
        functions.CorpusOps.tsPrioritySample(spark, dir)),
      ("dd_corpus_overlap",
        "pairwise corpus Jaccard in shingle space: distinct (source, gram-hash) self-join fans out per gram by #sources, never by doc frequency",
        functions.CorpusOps.ddCorpusOverlap(spark, dir)),
      ("tc_surprisal",
        "integer perplexity-filter: word-count agg on token hashes, occurrences⋈vocab hash join, 1-row total broadcast; surprisal is bitlength algebra in codegen",
        functions.CorpusOps.tcSurprisal(spark, dir)),
      ("ix_postings",
        "inverted phrase index: stats from one word-count agg; lists collected only for band terms behind a semi-join, so no buffer ever holds a stop-band posting",
        functions.SearchIndex.ixPostings(spark, dir)),
      ("ix_conj_search",
        "conjunctive search: resolved query broadcasts onto occurrences, per-doc count implements the AND, top-k is TakeOrderedAndProject",
        functions.SearchIndex.ixConjSearch(spark, dir)),
      ("ix_rank_search",
        "BM25 disjunction: log-free idf, per-term scores round to scaled longs so the per-doc sum commutes; query+stats broadcast, top-k heaps",
        functions.SearchIndex.ixRankSearch(spark, dir)),
      ("ts_dsir_weights",
        "DSIR importance weights: doc-term and vocabulary aggs map-side combine; scoring is a word hash join re-aggregated per doc; T/R/V scalars broadcast as one row",
        functions.Dsir.tsDsirWeights(spark, dir)),
      ("sim_semdedup",
        "SemDeDup: literal-centroid argmin assignment (zero shuffle), capped within-cell self-join, kill-set left join rides the cell agg",
        functions.Ivf.simSemDedup(spark, dir)),
      ("sk_join_size",
        "join-size estimate: both sides fold to D·W sketch cells (word-count shape); the inner product joins cell tables, never fact rows",
        operators.Sketches.skJoinSize(spark, dir)),
      ("sim_rank_metrics",
        "index-quality eval: one broadcast pass scores both rankings; windows and final agg share the q_id exchange",
        functions.Similarity.simRankMetrics(spark, dir)),
      ("emb_jl_recall",
        "JL shortlist+rerank recall: 32 codegen sign-dots per row (no shuffle), then the recall-trio broadcast/window shape",
        functions.Pca.embJlRecall(spark, dir)),
      ("ct_typed_envelope",
        "full-ColumnType envelope roundtrip: decimal/date/blob cells through Avro encode/frame/decode — codec expressions sit at the scan edge, everything else codegen",
        functions.SpecificEnvelope.ctTypedEnvelope(spark, dir)),
      ("sk_approx_percentiles",
        "GK percentile rank-check: one agg builds the 1-row estimates (whitelisted BNLJ broadcast), one pass ranks them; no sort anywhere",
        operators.Sketches.skApproxPercentiles(spark, dir)),
      ("sk_heavy_hitters",
        "CMS bound-check: sketch and exact counts are both map-side-combined aggs; the tiny estimate table broadcasts back",
        operators.Sketches.skHeavyHitters(spark, dir)),
      ("dc3_semantic_decontamination",
        "semantic contamination gate: bounded eval set broadcast across one train scan (whitelisted non-equi broadcast), max/argmax via one t_id window",
        functions.Similarity.dc3SemanticDecontamination(spark, dir)),
      ("tp_pack_greedy",
        "prefix-dependent fold as secondary sort: one shard exchange, in-partition sort, streaming mapPartitions emitting bins in-pass — no group materialization, no aggregation shuffle",
        functions.TrainPrep.tpPackGreedy(spark, dir)),
      ("ts_curriculum",
        "schedule slots as pure expressions over per-source ranked windows; distinct-source index broadcasts — no corpus-wide sort or single-partition window",
        functions.TrainPrep.tsCurriculum(spark, dir)),
      ("ix_phrase_search",
        "positional phrase AND: 1-row query broadcasts onto the positional index twice (each side one term), adjacency joins candidate-sized streams on (doc, pos); TakeOrdered top-k",
        functions.SearchIndex.ixPhraseSearch(spark, dir)),
      ("dd_minhash_recall",
        "LSH recall audit: exact truth is a gram hash join INSIDE the constant-capped panel; the corpus-scale LSH side reuses the banded pipeline — neither side all-pairs",
        functions.Dedup.ddMinhashRecall(spark, dir)),
      ("ta_gopher_filters",
        "rule battery as one narrow codegen projection over the scan; no shuffle before the output sort",
        functions.TextAnalysis.taGopherFilters(spark, dir, stopFloor = 1)),
      ("sim_hamming_ann",
        "8-byte sign signatures; query panel broadcast; XOR+POPCNT prefilter, cosine only on the top-C candidates (C from a 1-row corpus-count scalar)",
        functions.Similarity.simHammingAnn(spark, dir)),
      ("t14_stream_join",
        "stream-stream interval join operator in batch: one user_id shuffle, interval predicate inside the join, bounded per-user aggregate",
        streaming.WindowedAgg.t14StreamJoin(spark, dir)),
      ("t16_stream_dedup",
        "watermarked dropDuplicates in batch: one position-key shuffle, then a 5-row aggregate",
        streaming.WindowedAgg.t16StreamDedup(spark, dir)),
      ("tp_epoch_plan",
        "epoch planning on the #sources-row aggregate: corpus agg, then scalar-row broadcast and pure integer projections",
        functions.TrainPrep.tpEpochPlan(spark, dir)),
      ("sim_matryoshka_recall",
        "three truncated-dim rankings + full-dim truth over one broadcast query panel; overlap joins are (dim x Q x k)-sized",
        functions.Similarity.simMatryoshkaRecall(spark, dir)),
      ("fj2_damerau_join",
        "blocked fuzzy join: first-token equi-key hash join; codegen'd Damerau DP only inside blocks, never all-pairs",
        functions.FuzzyMatch.fj2DamerauJoin(spark, dir)),
      ("dc5_overlap_fraction",
        "contamination fractions: per-doc distinct-gram totals map-side combinable; eval set joins once; LEFT join keeps clean docs",
        functions.TrainPrep.dc5OverlapFraction(spark, dir)),
      ("hy_hybrid_rrf",
        "hybrid retrieval: BM25 channel joins panel terms BY TERM (postings shape); vector channel panel-broadcast; fusion full-outer touches 2*topC rows/query",
        functions.SearchIndex.hyHybridRrf(spark, dir)),
      ("w9_native_topk",
        "custom TopKPerKeyExec: one key hash exchange, bounded heap per key, NO per-partition sort (the WindowExec sort the operator exists to remove)",
        operators.ScaleOps.w9NativeTopk(spark, dir)),
      ("ev10_top_paths",
        "journeys: native topk selects first-K per user sort-free; path assembly sorts <=K structs/user; TakeOrdered top-N",
        operators.RelationalFourth.ev10TopPaths(spark, dir)),
      ("t17_stream_topk",
        "continuous leaderboard operator in batch: one key shuffle into transformWithState (StateKernel), O(k)-per-key state, snapshot-on-change emission",
        streaming.WindowedAgg.t17StreamTopk(spark, dir)),
      ("tp_source_quota",
        "per-source caps on the native heap: partial+final TopKPerKey bounds the exchange at cap rows per (source, partition); report joins are #sources-sized",
        functions.TrainPrep.tpSourceQuota(spark, dir)),
      ("dc6_span_ladder",
        "span-severity ladder: one full-corpus gram join at the base rung; upper rungs share one pass over base-flagged docs (monotone prune); eval gram sets from one eval-slice scan",
        functions.TrainPrep.dc6SpanLadder(spark, dir)),
      ("sim_mmr",
        "single-pass MMR: shortlist on the native heap, short^2 pairwise sims folded into a per-query map, greedy argmax chain as one HOF aggregate over |Q| rows — no driver rounds",
        functions.Similarity.simMmr(spark, dir)),
      ("gr_cc",
        "connected components: static edge table hash-partitioned once; each round is union + map-side-partial min aggregate + pointer-jump join over the pair list only",
        operators.Stats.grCc(spark, dir)),
      ("dd_span_excise",
        "cleaned corpus: dup windows classified on 8-byte gram-hash shuffles; span merge, char offsets and residual build are per-doc HOFs — no corpus window, no gram strings shuffled",
        functions.Dedup.ddSpanExcise(spark, dir)),
      ("ql_classifier",
        "trained linear probe scoring: literal-weight projection, zero shuffle past the scan; training itself is one treeAggregate pass (not in this plan)",
        functions.QualityClassifier.qlClassifier(spark, dir)),
      ("ts_cluster_balance",
        "cell quotas: zero-shuffle literal-centroid assignment, k-row quota table broadcast back, keep decision a narrow hash filter — the only corpus shuffle is the final k-group aggregate",
        functions.Ivf.tsClusterBalance(spark, dir)),
      ("ta_gopher_repetition",
        "Gopher repetition battery: ALL 14 statistics from one native single-pass kernel — a zero-shuffle map-only projection (the explode+groupBy alternative shuffles ~n x corpus tokens)",
        functions.TextAnalysis.taGopherRepetition(spark, dir)),
      ("ql_lm_buckets",
        "CCNet perplexity tiles: LM train/score as hash joins on the bigram count table, then NTILE over the doc-level SCORE rows only — the per-language sort never sees the corpus",
        functions.LangModel.qlLmBuckets(spark, dir)),
      ("tp_filter_funnel",
        "curation funnel: ALL flag batteries in ONE projection over one corpus scan (battery verdicts as column expressions); the one corpus-sized shuffle is the decontamination gram semi-join; the report aggregates a x4 boolean explode map-side",
        functions.TrainPrep.tpFilterFunnel(spark, dir)),
      ("ts_split_decontaminated",
        "leakage-free split: test gram set (~10% of docs) broadcast into the train-side hash semi-join; no doc x doc comparison, split assignment is pure integer hashing at scan",
        functions.TrainPrep.tsSplitDecontaminated(spark, dir)),
      ("tp_dataset_build",
        "end-to-end corpus build (funnel -> excision -> leak-guarded split -> pack): exactly three gram-volume shuffles, each over the prior stage's shrunken output; contaminated/leaked id sets broadcast back; the pack exchange carries ids+hashes, never text",
        functions.DatasetBuild.tpDatasetBuild(spark, dir)),
      ("tp_dataset_build_report",
        "stage audit of the same pipeline: boundaries checkpoint SCALARS only (flags as doc_id+raw_tok+c1..c4; residual dropped past the leak guard) and survivor text re-joins from the column-pruned source scan by id - broadcast here, a shuffled id join at 100 TB, never a second funnel pass",
        functions.DatasetBuild.tpDatasetBuildReport(spark, dir)))

  /** An executed AdaptiveSparkPlanExec renders BOTH the final plan and
    * the pre-execution "== Initial Plan ==" — the latter full of
    * sort-merge shapes AQE already demoted. Keep only what ran. */
  def finalPlanOnly(rendered: String): String =
    rendered.split("== Initial Plan ==")(0)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PLANS.md")
    val spark = GraftSession.get("8")
    val dir = "/root/testdata/sf0.01"
    val md = new StringBuilder
    md.append("# Physical plans of headline queries\n\n")
    md.append("Generated by `graft.Plans` at sf0.01. The `*(n)` prefix ")
    md.append("marks operators fused into WholeStageCodegen; these shapes ")
    md.append("are locked by `PlanAuditSpec`.\n")
    val secs = sections(spark, dir)
    secs.foreach { case (name, note, df) =>
      // execute this exact plan first so the dump is the AQE-FINAL
      // tree — the one that actually ran — not the static guess over
      // default-stats leaves (checkpoint-backed inputs would otherwise
      // render SMJs that the runtime demotes to broadcast)
      graft.util.SpillAudit.executeOwnPlan(df)
      md.append(s"\n## $name\n\n_${note}_\n\n```\n")
      md.append(
        finalPlanOnly(df.queryExecution.executedPlan.toString).take(4000))
      md.append("\n```\n")
    }
    // self-asserting section count (VERDICT r12 item 6: SURVEY said
    // "73 sections" over a 72-header file — the artifact must carry
    // its own count so prose can never drift from it)
    val nSections = secs.size
    val written = md.toString
    val headers = written.linesIterator.count(_.startsWith("## "))
    require(headers == nSections,
      s"PLANS.md header count $headers != ${nSections} sections")
    Files.write(Paths.get(out),
      (written + s"\n---\n$nSections sections.\n")
        .getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote $out ($nSections sections)")
    spark.stop()
  }
}
