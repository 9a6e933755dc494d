package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.operators.{Advanced, Pipeline, Relational}
import graft.sqlx.Sql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-pipeline extension), implemented as a declarative DataFrame
  * program; `oracleSql` holds the equivalent DuckDB SQL over the same parquet
  * tables. Aliases and result types are aligned on both sides (the driver
  * sorts columns by name and hash-compares values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4/2.2 relational core
    "q01_pricing_summary"    -> Relational.pricingSummary _,
    "q02_filter_project"     -> Relational.filterProject _,
    "q03_customers_region"   -> Relational.customersPerRegion _,
    "q04_revenue_segment"    -> Relational.revenueBySegment _,
    "q05_orders_customer"    -> Relational.ordersPerCustomer _,
    "q06_anti_join"          -> Relational.customersWithoutOrders _,
    "q07_semi_join"          -> Relational.customersWithOrders _,
    "q08_latest_per_user"    -> Relational.latestEventPerUser _,
    "q09_topk"               -> Relational.topOrders _,
    "q10_pagination"         -> Relational.eventsPage _,
    "q11_in_like"            -> Relational.inListLike _,
    "q12_event_stats"        -> Relational.eventTypeStats _,
    "q13_revenue_nation"     -> Relational.revenueByNation _,
    "q14_dedup_exact"        -> Relational.dedupFirstEvent _,
    "q15_topn_per_group"     -> Relational.topOrdersPerPriority _,
    "q16_scalar_funcs"       -> Relational.scalarShowcase _,
    "q17_conditional_agg"    -> Relational.conditionalAgg _,
    "q18_latest_join_back"   -> Relational.usersLastError _,
    // training-data pipeline (documents / embeddings)
    "q19_token_stats"        -> Pipeline.tokenStats _,
    "q20_quality_score"      -> Pipeline.qualityScores _,
    "q21_lang_id"            -> Pipeline.langIdPredictions _,
    "q22_exact_dup_groups"   -> Pipeline.exactDupGroups _,
    "q23_jaccard_adjacent"   -> Pipeline.jaccardAdjacent _,
    "q24_minhash_pairs"      -> Pipeline.minhashPairs _,
    "q25_simhash"            -> Pipeline.simhashBuckets _,
    "q26_cosine_topk"        -> Pipeline.cosineTopK _,
    // r8: driver-oracle recall contract (the raw top-k surface stays the
    // library API, Vectors.lshTopK; q75 audits a disjoint slice at k=5)
    "q27_lsh_topk"           -> Pipeline.lshTopKAudit _,
    // SQL execution engine: truncate-and-load materialization (S3/S6/O1/O2)
    "q28_truncate_load"      -> ((s: SparkSession, dir: String) => {
      Tables.orders(s, dir).createOrReplaceTempView("staging_orders")
      Sql.truncateAndLoad(s, "staging_orders", "graft_dwd_orders")
    }),
    // extended surface: JSON, sessionization, rollup, set ops, sketches
    "q29_json_extract"       -> Relational.jsonExtract _,
    "q30_sessionize"         -> Relational.sessionize _,
    "q31_rollup"             -> Relational.rollupAgg _,
    "q32_set_ops"            -> Relational.setOps _,
    "q33_approx_distinct"    -> Relational.approxDistinct _,
    // multimodal + export adapters + streaming
    "q34_multimodal_stats"   -> Pipeline.multimodalStats _,
    "q35_stream_window"      -> ((s: SparkSession, dir: String) => {
      // single-batch complete-mode oracle run: same state-partition sizing
      // rationale as q48 (state-store commit cost per partition per batch)
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.Streams.streamWindowedFromParquet(s, dir)
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),
    "q36_media_features"     -> Pipeline.mediaFeatures _,
    "q37_export_roundtrip"   -> Pipeline.exportRoundtrip _,
    // advanced composition operators
    "q38_asof_join"          -> Advanced.asofPurchaseClick _,
    "q39_percentiles"        -> Advanced.pricePercentiles _,
    "q40_pivot"              -> Advanced.eventPivot _,
    // r8: planted recall/precision contract (library surface at a
    // permissive threshold stays Pipeline.embeddingDups)
    "q41_embedding_dups"     -> Pipeline.embeddingDupsAudit _,
    "q42_profile"            -> Pipeline.profileOrders _,
    "q43_train_split"        -> Pipeline.trainSplit _,
    "q44_session_windows"    -> Relational.sessionWindows _,
    "q45_aliased_projection" -> Relational.aliasedProjection _,
    "q46_window_suite"       -> Relational.windowSuite _,
    "q47_correlated_subq"    -> Relational.aboveNationAverage _,
    // production streaming shape: append + watermark → parquet file sink.
    // r8: oracle-checked — append mode emits exactly the windows the final
    // watermark closed (window_end ≤ max(ts) − 10 min), a predicate DuckDB
    // expresses over the batch aggregate; window bounds cast to ntz at the
    // output edge (q35's convention, identity under the UTC session)
    "q48_stream_append"      -> ((s: SparkSession, dir: String) => {
      val work = graft.core.TempDirs.scratchDir("graft-q48")
      // 4 chunks: enough micro-batches to exercise watermark advancement +
      // incremental arrival; emitted windows are identical from 2..8 chunks
      // (the trailing no-data batch flushes to global-max − watermark),
      // while per-batch state-commit overhead scales with chunk count.
      // State partitions are fixed at query start from shuffle.partitions:
      // per-partition state-store commit cost dominates a local micro-batch
      // (32 parts × 5 batches measured 12.5 s vs 3.6 s at 8) — production
      // sizes this to the executor count, a bench-box sizes it down.
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.Streams
        .streamWindowedAppendFromParquet(s, dir, work, chunks = 4)
        .withColumn("window_start",
          org.apache.spark.sql.functions.col("window_start").cast("timestamp_ntz"))
        .withColumn("window_end",
          org.apache.spark.sql.functions.col("window_end").cast("timestamp_ntz"))
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),
    // sketch-accuracy probes: oracle-checked properties of the approximate
    // operators (the sketches themselves are engine-specific; their error
    // contracts and algebraic invariants are exact, deterministic facts)
    "q49_minhash_accuracy"   -> Pipeline.minhashAccuracy _,
    "q50_simhash_invariance" -> Pipeline.simhashInvariance _,
    "q51_exact_nn"           -> Pipeline.exactNearestNeighbor _,
    "q52_ivf_topk"           -> Pipeline.ivfTopK _,
    // round 3: pretraining-pipeline extensions (inverted index, quality
    // rules, PII scrubbing, sequence packing) — all DuckDB-oracle-checked
    "q53_tfidf_topterms"     -> Pipeline.tfidfTopTerms _,
    "q54_quality_rules"      -> Pipeline.qualityRules _,
    "q55_pii_scrub"          -> Pipeline.piiScrub _,
    "q56_pack_sequences"     -> Pipeline.packSequences _,
    "q57_dup_clusters"       -> Pipeline.dupClusters _,
    // round 4: LSH-edge clustering (the 100 TB edge source; rows-only —
    // MinHash isn't expressible in DuckDB, the propagation core is
    // CTE-oracle-checked via q57)
    // r8: oracle-checked structural contracts over the LSH cluster map
    // (fp-family cohesion + q57-coarsening; the raw map stays the library
    // surface, Pipeline.dupClustersLsh)
    "q58_dup_clusters_lsh"   -> Pipeline.dupClustersLshAudit _,
    // round 4 late additions: the data-release gate family — benchmark
    // decontamination, domain mixing, repetition rules (all DuckDB-oracle-
    // checked), semantic dedup (round 5: full value oracle via planted
    // exact duplicates — keep is DuckDB-computable ground truth), and
    // at-least-once streaming dedup (oracle: per-type counts must equal
    // the batch counts over the ORIGINAL events — a broken dedup doubles
    // every count)
    "q59_decontaminate"      -> Pipeline.decontaminate _,
    "q60_domain_mix"         -> Pipeline.domainMixSample _,
    "q61_repetition"         -> Pipeline.repetitionMetrics _,
    "q62_semantic_dedup"     -> Pipeline.semanticDedup _,
    "q63_stream_dedup"       -> ((s: SparkSession, dir: String) => {
      val work = graft.core.TempDirs.scratchDir("graft-q63")
      // state partitions sized down for the bench box like q48 (state-store
      // commit cost per partition per micro-batch dominates locally;
      // production sizes this to the executor count)
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.Streams.streamDedupFromParquet(s, dir, work)
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),
    // incremental dedup (the production loop: increment vs standing
    // corpus) and simhash banding complete the dedup family
    "q64_incremental_exact"  -> Pipeline.incrementalExactDedup _,
    "q65_incremental_minhash" -> Pipeline.incrementalMinhash _,
    "q66_simhash_pairs"      -> Pipeline.simhashPairs _,
    // the flagship composition: every release gate in canonical order,
    // ONE corpus scan (per-doc flags + a single conditional aggregate),
    // and the per-source manifest of what ships
    "q67_release_funnel"     -> Pipeline.releaseFunnel _,
    "q68_data_card"          -> Pipeline.dataCard _,
    // model-based scoring (unigram LM shape, exact-integer statistics) and
    // tokenizer-aware counting
    "q69_unigram_score"      -> Pipeline.unigramScore _,
    "q70_bpe_tokens"         -> Pipeline.bpeTokenCounts _,
    // stream-stream interval join (attribution): the emitted set equals
    // the batch interval join — oracle-checked
    "q71_stream_join"        -> ((s: SparkSession, dir: String) => {
      val work = graft.core.TempDirs.scratchDir("graft-q71")
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.Streams.streamStreamJoinFromParquet(s, dir, work)
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),
    // int8 vector quantization audit (the 4x ANN storage path) and the
    // retrieval-agreement audit gating a quantized rollout
    "q72_quantize_embeddings" -> Pipeline.quantizeEmbeddings _,
    "q73_quantized_retrieval" -> Pipeline.quantizedRetrievalAgreement _,
    // round 5: the stored-signature-table incremental loop and the ANN
    // recall audit, both under the driver's oracle
    "q74_incremental_stored" -> Pipeline.incrementalMinhashStored _,
    "q75_ann_recall"         -> Pipeline.annRecallAudit _,
    // span-level decontamination: remove contaminated 8-gram spans
    // instead of flagging whole documents (q59's surgical sibling)
    "q76_decontaminate_spans" -> Pipeline.decontaminateSpans _,
    // quality-aware canonical per duplicate cluster + the release shard
    // manifest (the packaging step after the q67 funnel)
    "q77_cluster_best"       -> Pipeline.clusterBestRepresentative _,
    "q78_release_shards"     -> ((s: SparkSession, dir: String) =>
      Pipeline.releaseShards(s, dir)),
    // round 6: release-hygiene trio — cluster-atomic splits (evaluation
    // leakage guard), token-budget corpus drafting, and the shared-span
    // boilerplate detector
    "q79_leakage_safe_split" -> Pipeline.leakageSafeSplit _,
    "q80_token_budget_sample" -> Pipeline.tokenBudgetSample _,
    "q81_duplicated_spans"   -> Pipeline.duplicatedSpans _,
    // the incremental-dedup loop as a stream: foreachBatch over staged
    // increment files vs the stored signature table — same verified pair
    // set (and the same oracle) as the batch forms q65/q74
    "q82_stream_incremental_dedup" -> Pipeline.streamIncrementalDedup _,
    // hard-negative mining: top-3 most-similar OTHER-label vectors per
    // query — the contrastive-training data-prep step
    "q83_hard_negatives"     -> Pipeline.hardNegatives _,
    // corpus snapshot diff: the data-versioning delta report
    // (added/removed/changed/unchanged by content fingerprint)
    "q84_snapshot_diff"      -> Pipeline.snapshotDiff _,
    // the release writer: source-partitioned id-sorted parquet layout,
    // read back and audited (counts vs flags + one-file-per-source)
    "q85_release_write"      -> Pipeline.releaseWrite _,
    // temperature-scaled multinomial mixing weights (α = 0.5: sqrt is
    // correctly rounded, so the weights are bit-identical cross-engine)
    "q86_mix_weights"        -> Pipeline.mixWeights _,
    // overlapping token-window chunking, verified down to chunk md5
    "q87_chunk_overlap"      -> Pipeline.chunkDocuments _,
    // DSIR-style target-domain bigram-overlap score (exact-integer form)
    "q88_target_overlap"     -> Pipeline.targetOverlapScore _,
    // per-source vocabulary stats + Zipf-head coverage
    "q89_vocab_coverage"     -> Pipeline.vocabCoverage _,
    // cross-source duplication matrix over the verified near-dup pairs
    "q90_cross_source_dups"  -> Pipeline.crossSourceDups _,
    // per-source quality quartiles (curriculum staging order)
    "q91_curriculum_bins"    -> Pipeline.curriculumBins _,
    // which eval doc each contaminated train doc leaks (argmax shared grams)
    "q92_contamination_attribution" -> Pipeline.contaminationAttribution _,
    // power-of-two token-length histogram per source (binary digit length)
    "q93_length_histogram"   -> Pipeline.lengthHistogram _,
    // per-source distribution deltas between the q84 snapshot views
    "q94_snapshot_drift"     -> Pipeline.snapshotDrift _,
    // materialized q86 mix: floor(epochs) copies + md5-bucket fractional
    "q95_epoch_mix"          -> Pipeline.epochMix _,
    // the q67 funnel as an id-ordered streaming admission loop
    "q96_stream_release_admission" -> Pipeline.streamReleaseAdmission _,
    // per-source duplicate-mass report (the per-source face of q22)
    "q97_dedup_profile"      -> Pipeline.dedupProfile _,
    // MOSS winnowing: min gram-hash per sliding window, O(n/w) fingerprints
    "q98_winnow_fingerprints" -> Pipeline.winnowFingerprints _,
    // the full ordered BPE token stream per doc, pinned by md5 (q70's
    // count contract upgraded to a content contract)
    "q99_bpe_encode"         -> Pipeline.bpeEncodeSequences _,
    // product-analytics pair over events: ordered view→click→purchase
    // funnel with 7-day stage windows, and weekly first-seen cohorts
    "q100_funnel"            -> Relational.funnelConversion _,
    "q101_cohort_retention"  -> Relational.cohortRetention _,
    // dense weekly series via a generated calendar spine (zero-filled),
    // and the trailing-7-day active-user curve (sliding distinct)
    "q102_calendar_spine"    -> Relational.calendarSpine _,
    "q103_rolling_active"    -> Relational.rollingActiveUsers _,
    // round 7: engagement ratio (DAU/WAU), token-weighted dedup value
    // report over the STORED cluster map, the bin-bucketed range join
    // (proximity with no equi key), and LOCF gap-fill imputation
    "q104_stickiness"        -> Relational.stickiness _,
    "q105_dedup_inflation"   -> Pipeline.dedupInflation _,
    "q106_error_proximity"   -> Relational.errorProximity _,
    "q107_locf_backfill"     -> Relational.locfBackfill _,
    // asymmetric containment dedup (overlap coefficient ≥ 0.9 over the
    // DF-capped inverted index + exact verify) and streaming
    // sessionization (the q44 session_window aggregation as a stream)
    "q108_containment"       -> Pipeline.containmentPairs _,
    "q109_stream_sessions"   -> ((s: SparkSession, dir: String) => {
      // append + watermark + parquet sink (r11: the 100× gate OOM'd the
      // old complete-mode/memory-sink form — see Streams scaladoc);
      // state partitions sized down for the bench box like q48/q63
      val work = graft.core.TempDirs.scratchDir("graft-q109")
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.Streams
        .streamSessionWindowsAppendFromParquet(s, dir, work, chunks = 4)
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),
    // the canonical 6-table star join (TPC-H Q5 shape) and the daily
    // event-volume drift monitor
    "q110_local_supplier"    -> Relational.localSupplierVolume _,
    "q111_daily_anomaly"     -> Relational.dailyAnomaly _,
    // index maintenance without retrain (stored centroids route the
    // increment; nprobe == nlist proves the updated index exact), the
    // salted-join skew rewrite under q13's oracle, and the q107 LOCF
    // window as a custom-state stream
    "q112_ivf_incremental"   -> Pipeline.ivfIncrementalAdd _,
    "q113_salted_fact_join"  -> Relational.revenueByNationSalted _,
    "q114_stream_locf"       -> ((s: SparkSession, dir: String) => {
      val work = graft.core.TempDirs.scratchDir("graft-q114")
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try graft.streaming.Streams.streamLocfFromParquet(s, dir, work)
      finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),
    // first-order journey transition matrix and the funnel's
    // conversion-latency distribution
    "q115_event_transitions" -> Relational.eventTransitions _,
    "q116_conversion_latency" -> Relational.conversionLatency _,
    // the decode plan of the multimodal family: which frames to decode
    "q117_frame_manifest"    -> Pipeline.frameManifest _,
    // total-audience reach curve and week-over-week churn
    "q118_cumulative_reach"  -> Relational.cumulativeReach _,
    "q119_weekly_churn"      -> Relational.weeklyChurn _,
    // ANN pre-flight: per-label norm stats + zero-vector detection
    "q120_embedding_norms"   -> Pipeline.embeddingNorms _,
    // collocation mining (log-free lift), calendar-exact YoY reporting,
    // and the key-skew diagnostic behind the q113 salting decision
    "q121_collocations"      -> Pipeline.collocations _,
    "q122_monthly_yoy"       -> Relational.monthlyRevenueYoY _,
    "q123_key_skew"          -> Relational.joinKeySkew _,
    // data-card length panel and the fulfillment-SLA report
    "q124_length_percentiles" -> Pipeline.lengthPercentiles _,
    "q125_shipping_delays"   -> Relational.shippingDelays _,
    // why-the-funnel-drops diagnostic and threshold-scored RFM segments
    "q126_gate_overlap"      -> Pipeline.gateOverlap _,
    "q127_rfm_segments"      -> Relational.rfmSegments _,
    // dead-dimension detector and the FK orphan audit
    "q128_dim_stats"         -> Pipeline.embeddingDimStats _,
    "q129_ref_integrity"     -> Relational.referentialIntegrity _,
    // the search access pattern: top-3 docs per query term
    "q130_term_retrieval"    -> Pipeline.termRetrieval _,
    // token-cost-per-source ratio and the weekly-rhythm heatmap
    "q131_tokenizer_fertility" -> Pipeline.tokenizerFertility _,
    "q132_dow_seasonality"   -> Relational.dowSeasonality _,
    // repeat-purchase rhythm and the value histogram
    "q133_purchase_gaps"     -> Relational.purchaseGaps _,
    "q134_value_histogram"   -> Relational.valueHistogram _,
    // conversion by acquisition week and the Pareto revenue KPI
    "q135_cohort_conversion" -> Relational.cohortConversion _,
    "q136_revenue_concentration" -> Relational.revenueConcentration _,
    // governance density ranking and the dormancy report
    "q137_pii_density"       -> Pipeline.piiDensity _,
    "q138_dormant_users"     -> Relational.dormantUsers _,
    // audience overlap between event types and the nation balance panel
    "q139_audience_overlap"  -> Relational.audienceOverlap _,
    "q140_nation_balances"   -> Relational.nationBalances _,
    // TPC-H Q7/Q17/Q18 shapes and the per-brand pricing-moments profile
    "q141_trade_flows"       -> Relational.tradeFlows _,
    "q142_brand_moments"     -> Relational.brandPricingMoments _,
    "q143_small_order_revenue" -> Relational.smallOrderRevenue _,
    "q144_large_volume_orders" -> Relational.largeVolumeOrders _,
    // real (pure-JVM) codecs for the uncompressed media formats: actual
    // RIFF/WAVE and BMP bytes written and parsed back, decoded aggregates
    // matched against the oracle's closed-form arithmetic
    "q145_wav_decode"        -> Pipeline.wavDecode _,
    "q146_bmp_decode"        -> Pipeline.bmpDecode _,
    "q153_png_decode"        -> Pipeline.pngDecode _,
    // r11: baseline-JPEG decode — the transform-coded format, real bytes
    // through a real DCT/Huffman codec; the multimodal stub now covers
    // only MP3/H.264-class codecs
    "q155_jpeg_decode"       -> Pipeline.jpegDecode _,
    "q156_gif_decode"        -> Pipeline.gifDecode _,
    "q157_g711_decode"       -> Pipeline.g711Decode _,
    // incremental embedding admission: increment probes the corpus's LSH
    // bucket table two-sided, threshold fused into the join (r10)
    "q154_incremental_embedding" -> Pipeline.incrementalEmbeddingDedup _,
    // the same admission loop STREAMED: micro-batches probe the stored
    // bucket table via foreachBatch (q82's shape on the vector side);
    // shares q154's brute-force cosine oracle, so batch/stream parity is
    // oracle-checked
    "q159_stream_embedding_admission" -> Pipeline.streamEmbeddingAdmission _,
    // adaptive skew join: histogram-gated salting under q13's oracle
    "q147_adaptive_skew_join" -> Relational.revenueByNationAdaptiveSkew _,
    // TPC-H Q8/Q15/Q4 shapes
    "q148_market_share"      -> Relational.marketShare _,
    "q149_top_supplier"      -> Relational.topSupplier _,
    "q150_order_priority"    -> Relational.orderPriorityLate _,
    // tokenizer roundtrip integrity (decode(encode(x)) == x, per doc)
    "q151_bpe_roundtrip"     -> Pipeline.bpeRoundtrip _,
    // partial-probe IVF: provable per-query monotonicity + degeneracy
    "q152_ivf_partial_probe" -> Pipeline.ivfRecallProfile _,
    // int8-quantized retrieval quality: top-10 overlap + top-1 agreement
    // of the 4x-compressed scoring vs float cosine over a 50-query panel
    "q158_int8_quant_recall" -> Pipeline.int8QuantRecall _,
    // product quantization + ADC (IVF-PQ's scan kernel) at 64x
    // compression, all-integer arithmetic vs the exact int8 ranking
    "q160_pq_adc_recall" -> Pipeline.pqAdcRecall _,
    // the composed production index: stored IVF cells coarse-probed,
    // PQ codes ADC-scored within the probed cells only
    "q161_ivfpq_topk" -> Pipeline.ivfPqTopK _,
    // IVF-PQ with exact re-ranking: ADC top-20 shortlist, exact int8
    // top-5 — the production two-stage serving path
    "q163_ivfpq_rerank" -> Pipeline.ivfPqRerank _,
    // filtered ANN: top-k under a metadata predicate (label) pushed into
    // the stored code-table scan, with a widened-nprobe fallback for
    // queries the filter starves
    "q164_filtered_ann" -> Pipeline.ivfPqFilteredTopK _,
    // tombstoned ANN serving: the two-stage IVF-PQ path under DELETIONS —
    // a stored tombstone list anti-joins queries, code candidates, and
    // the int8 rerank; top-k refills from survivors
    "q165_tombstoned_ann" -> Pipeline.tombstonedAnnServe _,
    // grown-corpus serving: admitted vectors PROMOTED into the stored
    // artifacts (the grow fold) and returned by the two-stage path —
    // the index lifecycle's ADD loop closed end-to-end
    "q166_grown_ann" -> Pipeline.grownAnnServe _,
    // vector UPSERT: tombstone + re-admit under the same id, one fold
    // applies both — the UPDATE completing the index CRUD set
    "q167_upsert_ann" -> Pipeline.upsertAnnServe _,
    // hybrid retrieval: RRF fusion of the inverted-index term arm (q130)
    // and the IVF-PQ two-stage vector arm (q163) — two stored-artifact
    // shortlists, one broadcast fusion join
    "q168_hybrid_rrf" -> Pipeline.hybridRetrieval _,
    // grown-corpus MinHash serving: admitted docs promoted into ONE
    // stored grown signature table; a probe panel must find them there
    "q169_grown_minhash" -> Pipeline.grownMinhashServe _,
    // grown serving under BETWEEN-FOLD deletions: active tombstones ride
    // the serve-time broadcast anti-join (no rebuild per delete); the
    // grow-namespace vacuum folds them in later
    "q170_grown_tombstoned" -> Pipeline.grownTombstonedServe _,
    // filtered ANN over the grown corpus: the labeled code table grows
    // (admitted vectors carry labels), q164's starvation/widening shape
    "q171_grown_filtered_ann" -> Pipeline.grownFilteredServe _,
    // hybrid RRF over the GROWN family: grown term index × grown two-stage
    // ANN — retrieval over the live, growing index
    "q172_grown_hybrid_rrf" -> Pipeline.grownHybridRetrieval _,
    // trained-vs-seeded PQ codebook quality contract: Lloyd-trained
    // per-subspace centroids must beat the seeded floor by a margin
    "q162_pq_trained_audit" -> Pipeline.pqTrainedAudit _,
  )

  /** q67/q68 oracle prelude: the per-doc release-gate flags CTE mirroring
    * `Pipeline.releaseFlags` (fingerprint-canonical exact dedup, the q54
    * Gopher predicate, eval holdout, q59 shingle-hit decontamination, q60
    * md5-bucket mixing), shared so the funnel and the data card check
    * against the SAME flag definitions. */
  private def releaseFlagsSql(finalSelect: String): String =
    """WITH fp AS (SELECT doc_id, md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS f FROM documents),
      |keep AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY f) AS keep_exact FROM fp),
      |toksq AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS t FROM documents),
      |shq AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7],' ') AS g
      |        FROM toksq, unnest(range(1, greatest(len(t)-6, 2))) AS u(i)),
      |evq AS (SELECT DISTINCT g FROM shq WHERE doc_id % 10 = 7),
      |hitsq AS (SELECT s.doc_id, count(*) AS n_hits FROM shq s JOIN evq USING (g)
      |          WHERE s.doc_id % 10 <> 7 GROUP BY 1),
      |qual AS (SELECT doc_id,
      |    len(regexp_extract_all(lower(text),'\S+')) AS n_toks,
      |    coalesce(list_sum(list_transform(regexp_extract_all(lower(text),'\S+'), t -> length(t))), 0) AS sum_len,
      |    length(text) - length(regexp_replace(text, '#', '', 'g')) AS hash_chars,
      |    length(text) AS n_chars0
      |  FROM documents),
      |flags AS (SELECT d.doc_id, d.source, d.lang,
      |    CAST(q.n_toks AS BIGINT) AS n_tokens,
      |    k.keep_exact,
      |    (q.n_toks >= 5 AND q.n_toks <= 100000
      |     AND CAST(q.sum_len AS DOUBLE)/greatest(CAST(q.n_toks AS DOUBLE),1.0) >= 2.0
      |     AND CAST(q.sum_len AS DOUBLE)/greatest(CAST(q.n_toks AS DOUBLE),1.0) <= 12.0
      |     AND CAST(q.hash_chars AS DOUBLE)/greatest(CAST(q.n_chars0 AS DOUBLE),1.0) <= 0.1) AS q_ok,
      |    d.doc_id % 10 <> 7 AS not_eval,
      |    coalesce(h.n_hits, 0) = 0 AS clean,
      |    ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),1,4))::INT % 100
      |      < (CAST(substr(d.source, 4) AS INT) % 10) * 10 + 5 AS mixed
      |  FROM documents d
      |  JOIN keep k USING (doc_id)
      |  JOIN qual q USING (doc_id)
      |  LEFT JOIN hitsq h USING (doc_id))
      |""".stripMargin + finalSelect

  /** q42 oracle: per-column profile as UNION ALL (DuckDB lacks stack()). */
  private val profileOracle: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    cols.flatMap { c => Seq(
      s"SELECT '$c' AS column_name, 'n' AS metric, CAST(count($c) AS VARCHAR) AS value FROM orders",
      s"SELECT '$c', 'nulls', CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS VARCHAR) FROM orders",
      s"SELECT '$c', 'distinct', CAST(count(DISTINCT $c) AS VARCHAR) FROM orders",
      s"SELECT '$c', 'min', CAST(min($c) AS VARCHAR) FROM orders",
      s"SELECT '$c', 'max', CAST(max($c) AS VARCHAR) FROM orders")
    }.mkString(" UNION ALL ")
  }

  /** Shared brute-force verified-pair oracle CTEs (q24/q65/q66/q74):
    * distinct 3-gram shingle sets per doc, pairwise EXACT Jaccard as the
    * raw IEEE quotient (exact integer counts, one division — bit-identical
    * to the Spark side, so NO per-row rounding anywhere), filtered at the
    * same j >= 0.9 bar the Spark verification applies. One definition,
    * four oracles — the q74-equals-q65 claim tests one text, not copies. */
  /** Shared q44/q109 oracle: 30-minute-gap sessionization via the
    * gaps-and-islands pattern — the batch and streaming session_window
    * runs must both reproduce it exactly. */
  private val sessionWindowsSql: String =
    """WITH g AS (SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT *, sum(is_new) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM g)
      |SELECT user_id, min(ts) AS session_start,
      | max(ts) + INTERVAL '30 minutes' AS session_end,
      | count(*) AS n_events, CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** Shared q100/q116 oracle prelude: the ordered view→click→purchase
    * funnel stages with 7-day windows. */
  private val funnelCte: String =
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t_click
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts > v.t_view
      |        AND e.ts <= v.t_view + INTERVAL 7 DAY
      |      GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
      |      FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      |        AND e.ts <= c.t_click + INTERVAL 7 DAY
      |      GROUP BY 1)
      |""".stripMargin

  /** Shared q13/q113 oracle: the salted-join rewrite must be
    * result-invariant against the plain fact-join spec. */
  private val revenueByNationSql: String =
    """SELECT n_name AS nation,
      | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
      |   AS DOUBLE) / 10000.0 AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Shared q52/q112 oracle: at nprobe == nlist both the one-shot index
    * and the incrementally-maintained index degenerate to exact brute
    * force over ALL embeddings — one spec, two index lifecycles. */
  private val ivfExactTop5Sql: String =
    """WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |        round(list_cosine_similarity(q.embedding::DOUBLE[],
      |                                     e.embedding::DOUBLE[]),6) AS cos_sim
      |      FROM embeddings q, embeddings e
      |      WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
      |FROM (SELECT query_id, neighbor_id, cos_sim, row_number() OVER
      |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rank
      |      FROM s) WHERE rank <= 5""".stripMargin

  /** Shared q107/q114 oracle: the streaming LOCF state machine must
    * reproduce the batch window exactly. */
  private val locfSql: String =
    """SELECT event_id, user_id, ts, event_type, value,
      |  last_value(CASE WHEN event_type = 'purchase' THEN value END
      |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS last_purchase_value
      |FROM events""".stripMargin

  /** All-pairs Jaccard-≥-0.9 spec, INVERTED-INDEX form: shared distinct-
    * shingle counts via unnest + equi-join + group-by replace the naive
    * `s a JOIN s b ON a.doc_id < b.doc_id` cross join. EXACTLY the same
    * output — a pair sharing zero shingles has Jaccard 0 and can never
    * pass the 0.9 bar, and for every other pair count(*) over the
    * distinct-shingle postings IS len(list_intersect). The naive form is
    * O(n²) list intersections (1.25G at the sf1 scale run — hours in
    * DuckDB); this is O(index mass) and keeps the oracle itself feasible
    * at every SF the engine runs. */
  private val verifiedAllPairsCte: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |             ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) sh
        |      FROM t),
        |sz AS (SELECT doc_id, len(sh) n FROM s),
        |inv AS (SELECT doc_id, unnest(sh) g FROM s),
        |c AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) shared
        |      FROM inv a JOIN inv b ON b.g = a.g AND b.doc_id > a.doc_id
        |      GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b,
        |        CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) j
        |      FROM c JOIN sz sa ON sa.doc_id = c.id_a
        |             JOIN sz sb ON sb.doc_id = c.id_b)
      |""".stripMargin
  private val verifiedIncPairsSql: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |             ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) sh
        |      FROM t),
        |sz AS (SELECT doc_id, len(sh) n FROM s),
        |inv AS (SELECT doc_id, unnest(sh) g FROM s),
        |c AS (SELECT i.doc_id inc_id, cc.doc_id corpus_id, count(*) shared
        |      FROM inv i JOIN inv cc ON cc.g = i.g
        |        AND i.doc_id % 5 = 4 AND cc.doc_id % 5 <> 4
        |      GROUP BY 1, 2),
        |p AS (SELECT inc_id, corpus_id,
        |        CAST(shared AS DOUBLE) / (si.n + sc.n - shared) j
        |      FROM c JOIN sz si ON si.doc_id = c.inc_id
        |             JOIN sz sc ON sc.doc_id = c.corpus_id)
      |SELECT inc_id, corpus_id, j AS jaccard FROM p WHERE j >= 0.9""".stripMargin

  /** Shared duplicate-cluster oracle CTE (q57/q77): fingerprint star +
    * adjacent-Jaccard edges, symmetrized, clusters as min reachable id by
    * recursive reachability — exactly what min-label propagation
    * converges to. */
  private val dupClusterCte: String =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks FROM documents),
      |s AS (SELECT doc_id, list_distinct(
      |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
      |             ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) sh
      |      FROM t),
      |j AS (SELECT a.doc_id id_a, b.doc_id id_b,
      |        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |          / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jac
      |      FROM s a JOIN s b ON b.doc_id = a.doc_id + 1),
      |fp AS (SELECT doc_id, md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) f FROM documents),
      |mn AS (SELECT f, min(doc_id) m FROM fp GROUP BY 1),
      |e AS (SELECT fp.doc_id a, mn.m b FROM fp JOIN mn USING (f) WHERE fp.doc_id <> mn.m
      |      UNION SELECT id_a, id_b FROM j WHERE jac >= 0.35),
      |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
      |reach(id, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT sym.b, reach.label FROM reach JOIN sym ON sym.a = reach.id)
      |""".stripMargin

  /** CONTRACT-BOOLEAN INVENTORY (r10). Default standard: every emitted
    * column is recomputed independently by the DuckDB oracle. The rows
    * below are the IRREDUCIBLE exceptions — booleans whose truth the
    * oracle cannot recompute because the quantity under test only exists
    * inside this engine; each pins exact VALUE columns alongside so the
    * row still hash-checks real data:
    *  - q25 `fused_matches_composed`, q50 `order_invariant`/
    *    `dup_invariant`: bit-identity of the fused Catalyst SimHash
    *    expression vs the composed-builtins form — two independent
    *    Spark implementations; no third engine computes SimHash.
    *  - q33 `approx_within_5pct`: HLL sketch error vs the exact distinct
    *    count (the pinned value); DuckDB's approx sketch differs.
    *  - q49 `est_ok`: MinHash Jaccard-estimate error vs the exact
    *    Jaccard (the pinned value).
    *  - q27/q75 `recall_ok`: LSH ANN recall vs the brute-force set — the
    *    approx side needs the seeded hyperplanes only this engine has.
    *  - q66 `band_recall_ok`: the SimHash pigeonhole banding guarantee
    *    (Hamming ≤ 3 ⇒ ≥ 1 band match); jaccard is the pinned value.
    *  - q36 `crc_consistent` (java.util.zip.CRC32 vs codegen crc32 —
    *    cross-implementation agreement; the CRC's input bytes are
    *    value-pinned via `payload_md5`), `f0_in_range` (decode-stub
    *    feature contract).
    *  - q85 `one_file_per_source`: filesystem layout of the release
    *    writer (doc/token counts are the pinned values).
    *  - q62 `drop_justified`/`keep_justified`, q58 `fp_family_ok`/
    *    `q57_containment_ok`: the Spark side evaluates these against its
    *    own LSH/IVF artifacts; on the ORACLE side the same formulas
    *    reduce to identities of its ground-truth closure (constant
    *    true), so the oracle contributes no independent recomputation —
    *    the engine-side evaluation is the real check (q62's `keep` and
    *    q58's cluster map remain value-checked).
    * Everything else that once pinned `true` literals (q41, q51, q52,
    * q112, q151, q152) now recomputes the value oracle-side. */
  /** Shared seeded-PQ CTE body (q160/q161/q162 oracles): the int8
    * quantizer, the 16-lowest-id seeded codebook, and argmin-L2 codes
    * with lowest-index tie-break — every quantity an exact integer. */
  /** `base` parameterizes the corpus relation (default the raw table;
    * the grown-serving oracles q166/q167 pass a union/replacement CTE —
    * the same machinery recomputed over corpus ∪ admitted). */
  private def pqSeedCtesOver(base: String): String =
    s"""mm AS (SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
      |  FROM $base),
      |qv AS (SELECT vec_id,
      |    list_transform(embedding, x -> CASE WHEN m = 0 THEN 0
      |      ELSE CAST(floor(x::DOUBLE*127/m + 0.5) AS INT) END) AS q
      |  FROM mm),
      |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, q
      |          FROM (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT 16)),
      |ss AS (SELECT unnest(range(0, 8)) AS s),
      |cb AS (SELECT ss.s, seeds.j,
      |         list_slice(seeds.q, ss.s*8 + 1, ss.s*8 + 8) AS c
      |       FROM ss, seeds),
      |sub AS (SELECT vec_id, ss.s, list_slice(q, ss.s*8+1, ss.s*8+8) AS sub
      |        FROM qv, ss),
      |enc0 AS (SELECT sub.vec_id, sub.s, cb.j,
      |    CAST(list_dot_product(sub.sub::DOUBLE[], sub.sub::DOUBLE[])
      |       + list_dot_product(cb.c::DOUBLE[], cb.c::DOUBLE[])
      |       - 2*list_dot_product(sub.sub::DOUBLE[], cb.c::DOUBLE[])
      |       AS BIGINT) AS d
      |  FROM sub JOIN cb ON cb.s = sub.s),
      |codes AS (SELECT vec_id, s, j AS code FROM (
      |    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s
      |        ORDER BY d ASC, j ASC) rn FROM enc0) WHERE rn = 1)""".stripMargin

  private val pqSeedCtes = pqSeedCtesOver("embeddings")

  /** Shared IVF-PQ probe CTEs (q161/q163 oracles): seeded centroids,
    * corpus cell assignment, the 50-query panel's top-4 probed cells, and
    * the probed candidates' ADC scores over [[pqSeedCtes]] — everything
    * through the approximate shortlist, before any final ranking. */
  /** Cell-layout + probe CTEs (seeded centroids, corpus cell assignment,
    * 50-query panel, top-4 probed cells) — the piece q161/q163/q164 share
    * BEFORE any candidate definition. */
  private def ivfPqCellCtesOver(base: String): String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $base),
      |cents AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
      |        v AS cvec
      |      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
      |asg AS (SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC,
      |                 c.cid DESC) AS rn
      |    FROM e, cents c) WHERE rn = 1),
      |qf AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 50),
      |pr AS (SELECT query_id, cid FROM (
      |    SELECT q.query_id, c.cid, row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC,
      |                 c.cid ASC) AS prk
      |    FROM qf q, cents c) WHERE prk <= 4)""".stripMargin

  private val ivfPqCellCtes = ivfPqCellCtesOver("embeddings")

  /** The panel's per-subspace int8 query slices (over [[pqSeedCtes]]'s
    * `qv`) — shared by every ADC scorer below. */
  private val ivfPqPsubCte =
    """psub AS (SELECT q.vec_id AS query_id, ss.s,
      |           list_slice(q.q, ss.s*8+1, ss.s*8+8) AS sub
      |         FROM qv q, ss WHERE q.vec_id < 50)""".stripMargin

  /** ADC scores for an upstream `cand(query_id, neighbor_id)` CTE —
    * identical text for the unfiltered (q161/q163) and filtered (q164)
    * candidate definitions. */
  private val ivfPqAdcCte =
    """adc AS (SELECT c.query_id, c.neighbor_id,
      |    CAST(sum(list_dot_product(ps.sub::DOUBLE[], cb.c::DOUBLE[]))
      |         AS BIGINT) AS adc_score
      |  FROM cand c
      |  JOIN codes cd ON cd.vec_id = c.neighbor_id
      |  JOIN psub ps ON ps.query_id = c.query_id AND ps.s = cd.s
      |  JOIN cb ON cb.s = cd.s AND cb.j = cd.code
      |  GROUP BY 1, 2)""".stripMargin

  private val ivfPqProbeCtes =
    ivfPqCellCtes + ",\n" + pqSeedCtes + ",\n" + ivfPqPsubCte + ",\n" +
    """cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
      |  FROM pr p JOIN asg a USING (cid) WHERE a.vec_id <> p.query_id),
      |""".stripMargin + ivfPqAdcCte

  /** q163's two-stage tail (ADC top-20 shortlist → exact int8 re-rank →
    * top-5), shared by the grown-serving oracles — identical text over
    * whatever `adc`/`qv` the upstream CTEs defined. */
  private val ivfPqRerankTail =
    """sl AS (SELECT query_id, neighbor_id, adc_score FROM (
      |    SELECT query_id, neighbor_id, adc_score, row_number() OVER
      |        (PARTITION BY query_id ORDER BY adc_score DESC,
      |         neighbor_id ASC) AS arank
      |    FROM adc) WHERE arank <= 20),
      |ex AS (SELECT s.query_id, s.neighbor_id, s.adc_score,
      |    CAST(list_dot_product(q1.q::DOUBLE[], q2.q::DOUBLE[])
      |         AS BIGINT) AS exact_score
      |  FROM sl s JOIN qv q1 ON q1.vec_id = s.query_id
      |            JOIN qv q2 ON q2.vec_id = s.neighbor_id)
      |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
      |       exact_score, adc_score
      |FROM (SELECT query_id, neighbor_id, exact_score, adc_score,
      |    row_number() OVER (PARTITION BY query_id
      |        ORDER BY exact_score DESC, neighbor_id ASC) AS rank
      |  FROM ex) WHERE rank <= 5""".stripMargin

  /** Full two-stage IVF-PQ recompute (q163's machinery verbatim) over a
    * caller-supplied base-relation CTE named `embu` — the grown-serving
    * oracles: the base is corpus ∪ admitted (q166) or the updated
    * replacement (q167), and DuckDB rebuilds seeds, cells, probes, codes,
    * ADC, and the exact re-rank from that base alone. */
  private def grownRerankOracle(baseCte: String): String =
    "WITH " + baseCte + ",\n" + ivfPqCellCtesOver("embu") + ",\n" +
    pqSeedCtesOver("embu") + ",\n" + ivfPqPsubCte + ",\n" +
    """cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
      |  FROM pr p JOIN asg a USING (cid) WHERE a.vec_id <> p.query_id),
      |""".stripMargin + ivfPqAdcCte + ",\n" + ivfPqRerankTail

  /** The grown-corpus union base shared by q166/q170/q171/q172: corpus ∪
    * the deterministic admitted set (vec_id ≡ 3 mod 23, re-keyed +10M,
    * embedding reversed — the q166 convention those gates share). */
  private val embuGrownCte =
    """embu AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000000 AS vec_id,
      |         list_reverse(embedding) AS embedding
      |  FROM embeddings WHERE vec_id % 23 = 3)""".stripMargin

  /** The grown-doc union base shared by q169/q172: corpus ∪ the
    * deterministic admitted docs (doc_id ≡ 4 mod 31, re-keyed +10M,
    * word-reversed text — the q169 convention). */
  private val duGrownCte =
    """du AS (SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id,
      |         array_to_string(list_reverse(
      |           regexp_extract_all(lower(text), '\S+')), ' ') AS text
      |  FROM documents WHERE doc_id % 31 = 4)""".stripMargin

  /** q162's trained-codebook sums, calibrated per gate corpus (r13): the
    * Lloyd training lives only in this engine, so the oracle cannot
    * recompute `sum_adc_err_trained` / `sum_dist_trained` — instead the
    * measured values are COMMITTED here and the oracle emits them as
    * literals, keyed by corpus identity, so any regression in the trained
    * path (training, encode, storage, ADC) changes a hash-checked value.
    * The key is `count(*) FROM lineitem` — the one gate table whose
    * cardinality is distinct at every SF (embeddings collide: sf0.001 and
    * sf0.01 both hold 500 vectors). An uncalibrated corpus yields NULL
    * oracle-side against a real engine value — a LOUD red, by design
    * (calibrate before gating a new SF; the engine's own ≥12%/≥5%
    * improvement contracts remain corpus-independent). Values measured
    * 2026-08-15 at the r13 head; deterministic per corpus (md5-ranked
    * init, fixed iterations, integer centroids). */
  private val q162TrainedPins: Seq[(Long, (Long, Long))] = Seq(
    6000L     -> (280606840L,    43290967L),    // /root/testdata/sf0.001
    60000L    -> (280486794L,    43301759L),    // /root/testdata/sf0.01
    600000L   -> (1187026170L,   187494073L),   // /root/testdata/sf0.1
    6000000L  -> (12053736677L,  1933796678L),  // data/sf1 (10×)
    18000000L -> (36321722802L,  5826545715L),  // data/sf3 (30×)
    60000000L -> (120972109183L, 19452939372L)) // data/sf10 (100×)

  /** One pinned-literal CASE over [[q162TrainedPins]] (no ELSE → NULL =
    * loud mismatch on an uncalibrated corpus). */
  private def q162Pin(pick: ((Long, Long)) => Long): String =
    "CAST(CASE (SELECT count(*) FROM lineitem) " +
      q162TrainedPins.map { case (n, v) => s"WHEN $n THEN ${pick(v)}" }
        .mkString(" ") + " END AS BIGINT)"

  /** Shared panel-ranking CTEs over [[pqSeedCtes]] (q160/q162): the
    * 50-query panel ranked by exact int8 dots and by seeded-codebook ADC
    * scores, both exact longs with the id tie-break. */
  private val pqSeedRankCtes =
    """panel AS (SELECT vec_id AS query_id, q FROM qv WHERE vec_id < 50),
      |psub AS (SELECT query_id, ss.s,
      |           list_slice(q, ss.s*8+1, ss.s*8+8) AS sub
      |         FROM panel, ss),
      |adc AS (SELECT p.query_id, c.vec_id AS neighbor_id,
      |    CAST(sum(list_dot_product(p.sub::DOUBLE[], cb.c::DOUBLE[]))
      |         AS BIGINT) AS adc_score
      |  FROM psub p JOIN codes c ON c.s = p.s AND c.vec_id <> p.query_id
      |  JOIN cb ON cb.s = c.s AND cb.j = c.code
      |  GROUP BY 1, 2),
      |exact AS (SELECT p.query_id, v.vec_id AS neighbor_id,
      |    CAST(list_dot_product(p.q::DOUBLE[], v.q::DOUBLE[]) AS BIGINT) AS ex
      |  FROM panel p JOIN qv v ON v.vec_id <> p.query_id),
      |r AS (SELECT e.query_id, e.neighbor_id, ex, adc_score,
      |    row_number() OVER (PARTITION BY e.query_id
      |        ORDER BY ex DESC, e.neighbor_id ASC) AS re,
      |    row_number() OVER (PARTITION BY e.query_id
      |        ORDER BY adc_score DESC, e.neighbor_id ASC) AS rp
      |  FROM exact e JOIN adc a
      |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q42_profile" -> profileOracle,
    // verified-LSH contract oracles: the Spark side emits candidates
    // REFINED by exact shingle-set verification at j >= 0.9; DuckDB
    // brute-forces the full pairwise Jaccard at the same bar, so the
    // hash-compare checks precision AND recall of the banded path
    "q24_minhash_pairs" ->
      (verifiedAllPairsCte +
        "SELECT id_a, id_b, j AS jaccard FROM p WHERE j >= 0.9"),
    "q65_incremental_minhash" -> verifiedIncPairsSql,
    // the stored-signature production loop must emit the SAME verified
    // pair set as the two-sided q65 form — one oracle, two query paths
    "q74_incremental_stored" -> verifiedIncPairsSql,
    "q82_stream_incremental_dedup" -> verifiedIncPairsSql,
    "q75_ann_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id < 50""".stripMargin,
    // r8: q27's recall@10 contract over the disjoint [50,150) query slice
    "q27_lsh_topk" ->
      """SELECT vec_id AS query_id, true AS recall_ok
        |FROM embeddings WHERE vec_id >= 50 AND vec_id < 150""".stripMargin,
    // r8: planted-dup recall/precision — DuckDB brute-forces all pairs of
    // the identically-planted union at the same 0.9 bar; the corpus's
    // natural pairs top out at cosine ≈ 0.51, so both engines must emit
    // exactly the planted pair set with cos_sim 1.0
    "q41_embedding_dups" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings) AS vec_id,
        |         embedding
        |  FROM embeddings WHERE vec_id % 25 = 0)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4)
        |    AS cos_sim
        |FROM base a JOIN base b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9""".stripMargin,
    // span removal verified down to the md5 of the cleaned text: DuckDB
    // recomputes positions and coverage over string grams (the Spark side
    // uses position-keyed gram hashes — injective stand-in)
    "q76_decontaminate_spans" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS t FROM documents),
        |sh AS (SELECT doc_id, i, array_to_string(t[i:i+7],' ') AS g
        |       FROM toks, unnest(range(1, greatest(len(t)-6, 2))) AS u(i)),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 7),
        |bad AS (SELECT DISTINCT s.doc_id, s.i FROM sh s JOIN ev USING (g)
        |        WHERE s.doc_id % 10 <> 7),
        |badl AS (SELECT doc_id, list(i) AS bi FROM bad GROUP BY 1),
        |k AS (SELECT t.doc_id, t.t, coalesce(b.bi, []) AS bi
        |      FROM toks t LEFT JOIN badl b USING (doc_id) WHERE t.doc_id % 10 <> 7),
        |cl AS (SELECT doc_id,
        |   CAST(len(t) AS INT) AS n_tokens,
        |   list_transform(list_filter(range(1, len(t)+1),
        |     j -> len(list_filter(bi, i -> i <= j AND j <= i + 7)) = 0), j -> t[j]) AS kept
        | FROM k)
        |SELECT doc_id, n_tokens,
        |  CAST(n_tokens - len(kept) AS INT) AS n_removed,
        |  md5(coalesce(array_to_string(kept, ' '), '')) AS cleaned_fp
        |FROM cl""".stripMargin,
    // simhash banding recall audit over the same verified row set: the
    // pigeonhole guarantee (Hamming <= 3 => banded) is Spark-verified
    // per pair; the oracle pins the row set + asserts the contract
    "q66_simhash_pairs" ->
      (verifiedAllPairsCte +
        "SELECT id_a, id_b, j AS jaccard, true AS band_recall_ok FROM p WHERE j >= 0.9"),
    // semantic dedup: planted exact duplicates (deterministic union both
    // engines build identically) + the corpus's distinct vectors topping
    // out at cosine ~0.51 make keep a DuckDB-computable VALUE:
    // keep <=> no identical lower-id vector
    // The justification booleans are literal `true`: substituting the
    // oracle's own keep = ¬has_dup into the Spark side's formulas
    // (drop_justified = keep ∨ max_lower_cos ≥ θ, keep_justified =
    // ¬keep ∨ max_lower_cos < θ) makes them identities oracle-side, so
    // DuckDB cannot recompute them independently — the ENGINE evaluation
    // of those formulas against the in-cell cosines is the real check
    // (see the contract-boolean inventory above); `keep` stays the
    // value-checked column.
    "q62_semantic_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings), embedding
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |h AS (
        |  SELECT b.vec_id,
        |    EXISTS (SELECT 1 FROM base c
        |            WHERE c.vec_id < b.vec_id AND c.embedding = b.embedding) AS has_dup
        |  FROM base b)
        |SELECT vec_id, NOT has_dup AS keep,
        |  true AS drop_justified,
        |  true AS keep_justified
        |FROM h""".stripMargin,
    // sketch error-contract rows: the exact columns are computed by DuckDB;
    // the boolean property columns are literal `true` — the driver's
    // hash-compare then asserts the Spark-side sketch met its contract
    "q33_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | true AS approx_within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "q49_minhash_accuracy" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |             ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) sh
        |      FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard,
        | true AS est_ok
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q25_simhash" ->
      """SELECT doc_id, true AS fused_matches_composed FROM documents""".stripMargin,
    "q50_simhash_invariance" ->
      """SELECT doc_id, true AS order_invariant, true AS dup_invariant
        |FROM documents""".stripMargin,
    // media contracts: exact byte length + md5 of the exact payload bytes
    // the codec consumed (r10 — value-pins the CRC's INPUT; DuckDB has no
    // crc32 to pin the checksum itself) + cross-implementation CRC32
    // agreement + stub feature range (see Pipeline.mediaFeatures)
    "q36_media_features" ->
      """SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
        | md5(text) AS payload_md5,
        | true AS crc_consistent, true AS f0_in_range
        |FROM documents""".stripMargin,
    "q51_exact_nn" ->
      """WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |        round(list_cosine_similarity(q.embedding::DOUBLE[],
        |                                     e.embedding::DOUBLE[]),6) AS cos_sim
        |      FROM embeddings q, embeddings e WHERE e.vec_id <> q.vec_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
        |FROM (SELECT query_id, neighbor_id, cos_sim, row_number() OVER
        |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rank
        |      FROM s) WHERE rank <= 1""".stripMargin,
    // IVF at nprobe == nlist degenerates to exact brute force — the oracle
    // therefore checks the full quantizer pipeline against plain top-k SQL
    "q52_ivf_topk" -> ivfExactTop5Sql,
    "q112_ivf_incremental" -> ivfExactTop5Sql,
    "q53_tfidf_topterms" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),'\S+')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score
        |FROM (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |        CAST(tf.tf AS DOUBLE)/CAST(df.df AS DOUBLE) AS score,
        |        row_number() OVER (PARTITION BY tf.doc_id
        |          ORDER BY CAST(tf.tf AS DOUBLE)/CAST(df.df AS DOUBLE) DESC, tf.term ASC) rank
        |      FROM tf JOIN df USING (term))
        |WHERE rank <= 3""".stripMargin,
    "q54_quality_rules" ->
      """SELECT doc_id,
        | CAST(n_tokens AS INT) AS n_tokens,
        | CAST(sum_len AS DOUBLE)/greatest(CAST(n_tokens AS DOUBLE), 1.0) AS mean_word_len,
        | CAST(n_lines AS INT) AS n_lines,
        | CAST(bullet_lines AS INT) AS bullet_lines,
        | CAST(hash_chars AS INT) AS hash_chars,
        | (n_tokens >= 5 AND n_tokens <= 100000
        |  AND CAST(sum_len AS DOUBLE)/greatest(CAST(n_tokens AS DOUBLE), 1.0) >= 2.0
        |  AND CAST(sum_len AS DOUBLE)/greatest(CAST(n_tokens AS DOUBLE), 1.0) <= 12.0
        |  AND CAST(hash_chars AS DOUBLE)/greatest(CAST(n_chars0 AS DOUBLE), 1.0) <= 0.1)
        |   AS gopher_ok
        |FROM (SELECT doc_id,
        |        len(regexp_extract_all(lower(text),'\S+')) AS n_tokens,
        |        coalesce(list_sum(list_transform(
        |          regexp_extract_all(lower(text),'\S+'), t -> length(t))), 0) AS sum_len,
        |        len(string_split(text, chr(10))) AS n_lines,
        |        len(list_filter(string_split(text, chr(10)),
        |          l -> starts_with(trim(l), '-') OR starts_with(trim(l), '*'))) AS bullet_lines,
        |        length(text) - length(regexp_replace(text, '#', '', 'g')) AS hash_chars,
        |        length(text) AS n_chars0
        |      FROM documents)""".stripMargin,
    "q55_pii_scrub" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '\+?[0-9][0-9 -]{7,}[0-9]')) AS INT) AS n_phones,
        | md5(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS scrub_fp,
        | CAST(length(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g')) AS INT) AS n_chars_scrubbed
        |FROM documents""".stripMargin,
    "q56_pack_sequences" ->
      """WITH d AS (SELECT doc_id, source,
        |        CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS n_tokens
        |      FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d)
        |SELECT source,
        | CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS bin,
        | count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    // connected components by recursive reachability — min reachable id is
    // the cluster id, exactly what Spark's min-label propagation converges to
    "q57_dup_clusters" ->
      (dupClusterCte +
        """SELECT id AS doc_id, min(label) AS cluster_id,
          | (id = min(label)) AS is_canonical
          |FROM reach GROUP BY id""".stripMargin),
    // quality-aware canonical: per-cluster argmax of the q20 quality
    // score (ties to the lower id) over the same cluster CTE
    "q77_cluster_best" ->
      (dupClusterCte +
        """, cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
          |qual AS (SELECT doc_id,
          |    round(least(1.0, (CAST(stop_hits AS DOUBLE)/greatest(CAST(n_tokens AS DOUBLE),1.0))*4.0)
          |      * (1.0 - least(1.0, (CAST(n_punct AS DOUBLE)/greatest(CAST(n_chars AS DOUBLE),1.0))*10.0)), 4) AS quality
          |  FROM (SELECT doc_id,
          |      len(regexp_extract_all(lower(text),'\b(the|a|an|and|or|of|to|in|is)\b')) AS stop_hits,
          |      length(regexp_replace(text,'[^.,;:!?]','','g')) AS n_punct,
          |      len(regexp_extract_all(lower(text),'\S+')) AS n_tokens,
          |      length(text) AS n_chars
          |    FROM documents))
          |SELECT c.doc_id, c.cluster_id, q.quality,
          |  (row_number() OVER (PARTITION BY c.cluster_id
          |     ORDER BY q.quality DESC, c.doc_id ASC) = 1) AS keep_best
          |FROM cl c JOIN qual q USING (doc_id)""".stripMargin),
    // cluster-atomic split over the same cluster CTE: the md5-bucket rule
    // applied to the CLUSTER id; naive_leaks marks clusters the per-doc
    // rule (q43) would tear across splits
    "q79_leakage_safe_split" ->
      (dupClusterCte +
        """, cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
          |sp AS (SELECT doc_id, cluster_id,
          |  CASE WHEN ('0x'||substr(md5(CAST(cluster_id AS VARCHAR)),1,4))::INT % 100 < 80 THEN 'train'
          |       WHEN ('0x'||substr(md5(CAST(cluster_id AS VARCHAR)),1,4))::INT % 100 < 90 THEN 'valid'
          |       ELSE 'test' END AS split,
          |  CASE WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::INT % 100 < 80 THEN 'train'
          |       WHEN ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4))::INT % 100 < 90 THEN 'valid'
          |       ELSE 'test' END AS naive
          |  FROM cl),
          |lk AS (SELECT cluster_id, count(DISTINCT naive) AS nsp FROM sp GROUP BY 1)
          |SELECT sp.doc_id, sp.cluster_id, sp.split, lk.nsp > 1 AS naive_leaks
          |FROM sp JOIN lk USING (cluster_id)""".stripMargin),
    // per-source doc/token dedup value over the SAME cluster CTE; exact
    // integer sums, one final division
    "q105_dedup_inflation" ->
      (dupClusterCte +
        """, cl AS (SELECT id AS doc_id, (id = min(label)) AS is_canonical
          |         FROM reach GROUP BY id),
          |d AS (SELECT doc_id, source,
          |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS n
          |  FROM documents)
          |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN NOT is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
          |  CAST(sum(n) AS BIGINT) AS n_tokens,
          |  CAST(sum(CASE WHEN NOT is_canonical THEN n ELSE 0 END) AS BIGINT) AS dup_tokens,
          |  CAST(sum(CASE WHEN NOT is_canonical THEN n ELSE 0 END) AS DOUBLE)
          |    / CAST(sum(n) AS DOUBLE) AS inflation
          |FROM d JOIN cl USING (doc_id) GROUP BY 1""".stripMargin),
    // deterministic priority (md5 hex string — identical lowercase-hex
    // ordering in both engines), per-source running token total, keep
    // while under budget
    "q80_token_budget_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS priority
        |  FROM documents)
        |SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY priority, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY priority, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) <= 4096 AS kept
        |FROM d""".stripMargin,
    // the oracle counts DISTINCT 8-token gram STRINGS per doc and their
    // cross-document frequency; the Spark side counts their xxhash64
    // stand-ins — identical modulo 64-bit collisions. The fraction is one
    // raw IEEE quotient on both sides (never round per-row floats).
    "q81_duplicated_spans" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+7],' ') AS g
        |       FROM t, unnest(range(1, greatest(len(toks)-6, 2))) AS u(i)),
        |df AS (SELECT g, count(*) AS nd FROM sh GROUP BY 1),
        |per AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |        CAST(sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
        |        FROM sh s JOIN df USING (g) GROUP BY 1)
        |SELECT doc_id, n_grams, n_dup_grams,
        |  CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_fraction,
        |  (CAST(n_dup_grams AS DOUBLE) / CAST(n_grams AS DOUBLE)) > 0.5 AS boilerplate
        |FROM per""".stripMargin,
    // the oracle joins on 8-token shingle STRINGS; the Spark side joins on
    // their xxhash64 — identical modulo 64-bit collisions (~1e-10 here)
    "q59_decontaminate" ->
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7],' ') AS g
        |       FROM toks, unnest(range(1, greatest(len(t)-6, 2))) AS u(i)),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 7),
        |hits AS (SELECT s.doc_id, count(*) AS n_hits
        |         FROM sh s JOIN ev USING (g) WHERE s.doc_id % 10 <> 7 GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h USING (doc_id)
        |WHERE d.doc_id % 10 <> 7""".stripMargin,
    "q60_domain_mix" ->
      """WITH b AS (SELECT source,
        |  CAST((CAST(substr(source, 4) AS INT) % 10) * 10 + 5 AS INT) AS rate_pct,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::INT % 100 AS bucket,
        |  CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, rate_pct, count(*) AS n_total,
        |  CAST(sum(CASE WHEN bucket < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN bucket < rate_pct THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM b GROUP BY 1, 2""".stripMargin,
    // top-bigram count via per-bigram group counting; the Spark side uses
    // the sorted-hash longest-equal-run form (same number, zero shuffle)
    "q61_repetition" ->
      """WITH toks AS (SELECT doc_id, text, regexp_extract_all(lower(text),'\S+') AS t FROM documents),
        |bg AS (SELECT doc_id, array_to_string(t[i:i+1],' ') AS g
        |       FROM toks, unnest(range(1, greatest(len(t), 2))) AS u(i)),
        |ba AS (SELECT doc_id, CAST(sum(c) AS INT) AS n_bigrams,
        |         CAST(max(c) AS INT) AS top_bigram_n,
        |         CAST(count(*) AS INT) AS n_distinct
        |       FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
        |       GROUP BY 1),
        |la AS (SELECT doc_id,
        |         CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
        |         CAST(len(list_distinct(string_split(text, chr(10)))) AS INT) AS d_lines
        |       FROM documents)
        |SELECT ba.doc_id, n_bigrams, top_bigram_n,
        |  round(CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 4) AS top_bigram_frac,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 4) AS dup_bigram_frac,
        |  n_lines,
        |  round(CAST(n_lines - d_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 4) AS dup_line_frac,
        |  (CAST(top_bigram_n AS DOUBLE) / CAST(n_bigrams AS DOUBLE) <= 0.2
        |   AND CAST(n_lines - d_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) <= 0.3) AS repetition_ok
        |FROM ba JOIN la USING (doc_id)""".stripMargin,
    // the streaming sink saw every event exactly once iff these counts
    // match the batch counts over the original (un-replayed) events
    "q63_stream_dedup" ->
      """SELECT event_type, count(*) AS n_events, min(ts) AS min_ts,
        |  max(ts) AS max_ts FROM events GROUP BY 1""".stripMargin,
    "q64_incremental_exact" ->
      """WITH fp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS f
        |  FROM documents),
        |corpus AS (SELECT DISTINCT f FROM fp WHERE doc_id % 5 <> 4)
        |SELECT fp.doc_id, corpus.f IS NOT NULL AS is_exact_dup,
        |  corpus.f IS NULL AS admit
        |FROM fp LEFT JOIN corpus ON fp.f = corpus.f
        |WHERE fp.doc_id % 5 = 4""".stripMargin,
    "q67_release_funnel" -> releaseFlagsSql(
      """SELECT 0 AS stage_id, 'raw' AS stage,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM flags
        |UNION ALL SELECT 1, 'exact_dedup',
        |  CAST(sum(CASE WHEN keep_exact THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN keep_exact THEN n_tokens END), 0) AS BIGINT) FROM flags
        |UNION ALL SELECT 2, 'quality',
        |  CAST(sum(CASE WHEN keep_exact AND q_ok THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN keep_exact AND q_ok THEN n_tokens END), 0) AS BIGINT) FROM flags
        |UNION ALL SELECT 3, 'eval_holdout',
        |  CAST(sum(CASE WHEN keep_exact AND q_ok AND not_eval THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN keep_exact AND q_ok AND not_eval THEN n_tokens END), 0) AS BIGINT) FROM flags
        |UNION ALL SELECT 4, 'decontaminated',
        |  CAST(sum(CASE WHEN keep_exact AND q_ok AND not_eval AND clean THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN keep_exact AND q_ok AND not_eval AND clean THEN n_tokens END), 0) AS BIGINT) FROM flags
        |UNION ALL SELECT 5, 'domain_mix',
        |  CAST(sum(CASE WHEN keep_exact AND q_ok AND not_eval AND clean AND mixed THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(coalesce(sum(CASE WHEN keep_exact AND q_ok AND not_eval AND clean AND mixed THEN n_tokens END), 0) AS BIGINT) FROM flags""".stripMargin),
    "q69_unigram_score" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),'\S+')) AS tok FROM documents),
        |v AS (SELECT tok, count(*) AS tf FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM v),
        |d AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |        CAST(sum(v.tf) AS BIGINT) AS sum_tf,
        |        CAST(sum(CASE WHEN v.tf <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS rare_toks
        |      FROM t JOIN v USING (tok) GROUP BY 1)
        |SELECT doc_id, n_tokens, sum_tf,
        |  CAST(sum_tf AS DOUBLE)/(CAST(n_tokens AS DOUBLE)*CAST(total AS DOUBLE)) AS mean_tok_freq,
        |  CAST(rare_toks AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS rare_frac,
        |  CAST(rare_toks AS DOUBLE)/CAST(n_tokens AS DOUBLE) <= 0.2 AS lm_ok
        |FROM d, tot""".stripMargin,
    "q71_stream_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c ON p.user_id = c.user_id
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts""".stripMargin,
    "q72_quantize_embeddings" ->
      """WITH s AS (SELECT vec_id,
        |    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS m,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings)
        |SELECT vec_id, m AS scale,
        |  list_max(list_transform(v, x -> abs(x - floor(x / m * 127.0 + 0.5) * m / 127.0))) AS max_abs_err,
        |  list_max(list_transform(v, x -> abs(x - floor(x / m * 127.0 + 0.5) * m / 127.0))) <= m / 254.0 + 1e-12 AS within_bound
        |FROM s""".stripMargin,
    "q73_quantized_retrieval" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS fv,
        |    greatest(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS m
        |  FROM embeddings),
        |d AS (SELECT vec_id, fv,
        |    list_transform(fv, x -> floor(x / m * 127.0 + 0.5) * m / 127.0) AS qv FROM v),
        |p AS (SELECT q.vec_id AS query_id, c.vec_id AS nid,
        |    round(list_cosine_similarity(q.fv, c.fv), 6) AS cosf,
        |    round(list_cosine_similarity(q.qv, c.qv), 6) AS cosq
        |  FROM d q JOIN d c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (SELECT query_id, nid,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosf DESC, nid ASC) rf,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosq DESC, nid ASC) rq
        |  FROM p)
        |SELECT a.query_id, a.nid AS neighbor_full, b.nid AS neighbor_q8,
        |  a.nid = b.nid AS agree
        |FROM (SELECT query_id, nid FROM r WHERE rf = 1) a
        |JOIN (SELECT query_id, nid FROM r WHERE rq = 1) b USING (query_id)""".stripMargin,
    // the merged count is recomputed by an INDEPENDENT encoder: staged
    // rank-ordered merges as nested string replaces over a |-delimited
    // symbol string (generated from the same offline-trained merges table
    // the Spark mapPartitions encoder broadcasts)
    "q70_bpe_tokens" ->
      """WITH pt AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]') AS toks
        |            FROM documents),
        |alpha AS (SELECT doc_id, lower(t) AS w FROM pt, unnest(toks) AS u(t)
        |          WHERE regexp_full_match(t, '[A-Za-z]+')),
        |dw AS (SELECT DISTINCT w FROM alpha),
        |enc AS (SELECT w, CAST(len(string_split(__BPE_ENC__, '||')) AS BIGINT) AS n_sym FROM dw),
        |ac AS (SELECT a.doc_id, CAST(sum(e.n_sym) AS BIGINT) AS alpha_syms
        |       FROM alpha a JOIN enc e USING (w) GROUP BY 1),
        |oth AS (SELECT doc_id,
        |          CAST(len(list_filter(toks, t -> NOT regexp_full_match(t, '[A-Za-z]+'))) AS BIGINT) AS n_other
        |        FROM pt)
        |SELECT d.doc_id,
        | CAST(len(regexp_extract_all(lower(text),'\S+')) AS INT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS DOUBLE)
        |   / greatest(CAST(len(regexp_extract_all(lower(text),'\S+')) AS DOUBLE), 1.0) AS tokens_per_word,
        | CAST(coalesce(ac.alpha_syms, 0) + oth.n_other AS BIGINT) AS n_bpe_merged
        |FROM documents d LEFT JOIN ac ON d.doc_id = ac.doc_id
        |JOIN oth ON d.doc_id = oth.doc_id""".stripMargin
        .replace("__BPE_ENC__", graft.functions.Bpe.duckdbNestedReplace("w")),
    // the release shard manifest: per-source fixed-token-budget layout of
    // the released corpus (cumsum window per source, q56's shape)
    "q78_release_shards" -> releaseFlagsSql(
      """, rel AS (SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM flags WHERE keep_exact AND q_ok AND not_eval AND clean AND mixed)
        |SELECT source, CAST(floor((cum - n_tokens) / 20000.0) AS BIGINT) AS shard,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM rel GROUP BY 1, 2""".stripMargin),
    // α=0.5 multinomial mixing: sqrt is IEEE-correctly-rounded (exact
    // parity); the normalized share/budget/epochs are rounded aggregates
    "q86_mix_weights" ->
      """WITH s AS (SELECT source,
        |    CAST(sum(len(regexp_extract_all(lower(text),'\S+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS tot FROM s)
        |SELECT source, n_tokens,
        |  sqrt(CAST(n_tokens AS DOUBLE)) AS weight,
        |  round(sqrt(CAST(n_tokens AS DOUBLE)) / tot, 6) AS p_sample,
        |  round(1000000 * sqrt(CAST(n_tokens AS DOUBLE)) / tot, 2) AS budget_tokens,
        |  round(1000000 * sqrt(CAST(n_tokens AS DOUBLE)) / tot
        |        / CAST(n_tokens AS DOUBLE), 4) AS epochs
        |FROM s, t""".stripMargin,
    // W=32/S=24 overlapping windows; both engines recompute the chunk
    // text and hash it — content-exact, not just count-exact
    "q87_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS t FROM documents),
        |n AS (SELECT doc_id, t,
        |        greatest(1, CAST(ceil(CAST(len(t)-32 AS DOUBLE)/24) AS INT)+1) AS nc
        |      FROM t),
        |c AS (SELECT doc_id, CAST(i AS INT) AS chunk_id, t[i*24+1 : i*24+32] AS ck
        |      FROM n, unnest(range(nc)) AS u(i))
        |SELECT doc_id, chunk_id, CAST(len(ck) AS INT) AS n_chunk_tokens,
        |       md5(array_to_string(ck,' ')) AS chunk_md5
        |FROM c""".stripMargin,
    // bigram-occurrence overlap with the lang='en' target vocabulary:
    // exact integer counts, one raw IEEE division (no rounding)
    "q88_target_overlap" ->
      """WITH t AS (SELECT doc_id, lang, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
        |bg AS (SELECT doc_id, lang, tk[i] || ' ' || tk[i+1] AS b
        |       FROM t, unnest(range(1, greatest(len(tk), 1))) AS u(i)),
        |v AS (SELECT DISTINCT b FROM bg WHERE lang = 'en'),
        |h AS (SELECT doc_id, count(*) AS n_hits FROM bg JOIN v USING (b) GROUP BY 1)
        |SELECT t.doc_id, lang = 'en' AS is_target,
        |       CAST(greatest(len(tk)-1, 0) AS BIGINT) AS n_bigrams,
        |       coalesce(h.n_hits, 0) AS n_hits,
        |       CASE WHEN len(tk) > 1
        |            THEN CAST(coalesce(h.n_hits,0) AS DOUBLE)/CAST(len(tk)-1 AS DOUBLE)
        |       END AS overlap_score
        |FROM t LEFT JOIN h USING (doc_id)""".stripMargin,
    // corpus-global top-100 head (ties broken on the token string) +
    // per-source coverage/type-token ratio; raw quotients of counts
    "q89_vocab_coverage" ->
      """WITH tk AS (SELECT source, unnest(regexp_extract_all(lower(text),'\S+')) AS tok FROM documents),
        |top AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk GROUP BY 1
        |                         ORDER BY c DESC, tok ASC LIMIT 100)),
        |cov AS (SELECT source, count(*) AS n_top FROM tk JOIN top USING (tok) GROUP BY 1),
        |agg AS (SELECT source, count(*) AS n_tokens, count(DISTINCT tok) AS n_types
        |        FROM tk GROUP BY 1)
        |SELECT agg.source, n_tokens, n_types,
        |       CAST(n_types AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS type_token_ratio,
        |       CAST(coalesce(n_top,0) AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS top100_coverage
        |FROM agg LEFT JOIN cov USING (source)""".stripMargin,
    // the q22 fingerprint normalization, grouped by source; dup_rate is
    // one raw IEEE quotient of exact counts
    "q97_dedup_profile" ->
      """SELECT source, count(*) AS n_docs,
        |  count(DISTINCT md5(trim(regexp_replace(lower(text),'\s+',' ','g')))) AS n_unique,
        |  count(*) - count(DISTINCT md5(trim(regexp_replace(lower(text),'\s+',' ','g')))) AS n_dup_docs,
        |  CAST(count(*) - count(DISTINCT md5(trim(regexp_replace(lower(text),'\s+',' ','g')))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_rate
        |FROM documents GROUP BY source""".stripMargin,
    // winnowing selection depends on hash VALUES, so both engines hash the
    // gram string identically (md5-prefix int60); the window min / distinct
    // / doc-frequency pipeline then mirrors exactly. fp_density is one raw
    // IEEE quotient of exact counts.
    "q98_winnow_fingerprints" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS toks FROM documents),
        |g AS (SELECT doc_id, CAST(greatest(len(toks)-4, 1) AS BIGINT) AS n_grams, i AS pos,
        |        ('0x'||substr(md5(array_to_string(toks[i:i+4],' ')),1,15))::BIGINT AS gh
        |      FROM t, unnest(range(1, greatest(len(toks)-3, 2))) AS u(i)),
        |wmt AS (SELECT doc_id, n_grams, pos,
        |          min(gh) OVER (PARTITION BY doc_id ORDER BY pos
        |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wm
        |        FROM g),
        |fp AS (SELECT DISTINCT doc_id, n_grams, wm FROM wmt
        |       WHERE pos <= greatest(n_grams-3, 1)),
        |df AS (SELECT wm, count(*) AS nd FROM fp GROUP BY 1),
        |per AS (SELECT fp.doc_id, fp.n_grams, CAST(count(*) AS BIGINT) AS n_fp,
        |          CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_fp
        |        FROM fp JOIN df USING (wm) GROUP BY 1, 2)
        |SELECT doc_id, n_grams, n_fp, n_shared_fp,
        |  CAST(n_fp AS DOUBLE)/CAST(n_grams AS DOUBLE) AS fp_density
        |FROM per""".stripMargin,
    // the independent DuckDB BPE (nested replaces, q70's machinery) applied
    // per distinct word, stitched back in pre-token order with string_agg,
    // then md5 — content + order, not just counts
    "q99_bpe_encode" ->
      """WITH pt AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]') AS toks
        |            FROM documents),
        |pos AS (SELECT doc_id, i, toks[i] AS t
        |        FROM pt, unnest(range(1, len(toks)+1)) AS u(i)),
        |dw AS (SELECT DISTINCT lower(t) AS w FROM pos
        |       WHERE regexp_full_match(t, '[A-Za-z]+')),
        |enc AS (SELECT w, replace(trim(__BPE_ENC__, '|'), '||', ' ') AS e FROM dw),
        |seqs AS (SELECT p.doc_id,
        |           string_agg(CASE WHEN e.w IS NOT NULL THEN e.e ELSE p.t END,
        |                      ' ' ORDER BY p.i) AS seq,
        |           CAST(sum(CASE WHEN e.w IS NOT NULL
        |                    THEN len(string_split(e.e, ' ')) ELSE 1 END) AS BIGINT) AS n_symbols
        |         FROM pos p LEFT JOIN enc e
        |           ON regexp_full_match(p.t, '[A-Za-z]+') AND lower(p.t) = e.w
        |         GROUP BY 1)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(s.n_symbols, 0) END AS n_symbols,
        |  CASE WHEN d.text IS NULL THEN NULL ELSE md5(coalesce(s.seq, '')) END AS seq_md5
        |FROM documents d LEFT JOIN seqs s USING (doc_id)"""
        .stripMargin
        .replace("__BPE_ENC__", graft.functions.Bpe.duckdbNestedReplace("w")),
    // staged min-aggregates: each stage's first event strictly after the
    // previous stage, inside the 7-day conversion window
    "q100_funnel" ->
      (funnelCte +
        """SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
          |  c.user_id IS NOT NULL AS reached_click,
          |  p.user_id IS NOT NULL AS converted
          |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin),
    // latency distribution over the SAME funnel CTE's converted users
    "q116_conversion_latency" ->
      (funnelCte +
        """SELECT CAST(count(*) AS BIGINT) AS n_conversions,
          |  round(quantile_cont(epoch_us(p.t_purchase) - epoch_us(v.t_view), 0.5), 4) AS p50_us,
          |  round(quantile_cont(epoch_us(p.t_purchase) - epoch_us(v.t_view), 0.9), 4) AS p90_us,
          |  min(epoch_us(p.t_purchase) - epoch_us(v.t_view)) AS min_us,
          |  max(epoch_us(p.t_purchase) - epoch_us(v.t_view)) AS max_us
          |FROM v JOIN p USING (user_id)""".stripMargin),
    // media_id = doc_id, payload = utf-8 text bytes (the mediaTable
    // fixture); DuckDB strlen is BYTE length, mirroring Spark's
    // length(binary)
    "q117_frame_manifest" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(strlen(text) % 50 + 1 AS INT) AS n_frames
        |  FROM documents)
        |SELECT media_id, CAST(i AS INT) AS frame_idx
        |FROM m, unnest(range(0, n_frames, 5)) AS u(i)""".stripMargin,
    // same unordered-pair enumeration rule as the Spark side (display
    // names, lexicographic); one aggregated row unpivoted via UNION ALL
    "q126_gate_overlap" -> releaseFlagsSql {
      val gates = Seq("keep_exact" -> "exact_dup", "q_ok" -> "quality",
        "not_eval" -> "eval_holdout", "clean" -> "contamination",
        "mixed" -> "mix_rate")
      (for { (ca, na) <- gates; (cb, nb) <- gates if na <= nb } yield
        s"SELECT '$na' AS gate_a, '$nb' AS gate_b, " +
        s"CAST(sum(CASE WHEN NOT $ca AND NOT $cb THEN 1 ELSE 0 END) AS BIGINT) " +
        s"AS n_both_failed FROM flags").mkString("\nUNION ALL\n")
    },
    "q139_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1)
        |SELECT i.type_a, i.type_b, i.n_both,
        |  CAST(i.n_both AS DOUBLE) / CAST(sa.n + sb.n - i.n_both AS DOUBLE) AS jaccard
        |FROM i JOIN s sa ON sa.event_type = i.type_a
        |JOIN s sb ON sb.event_type = i.type_b""".stripMargin,
    "q140_nation_balances" ->
      """SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_customers,
        |  round(avg(c_acctbal), 4) AS mean_balance,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS median_balance,
        |  min(c_acctbal) AS min_balance, max(c_acctbal) AS max_balance
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q137_pii_density" ->
      """WITH d AS (SELECT source,
        |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS e,
        |    CAST(len(regexp_extract_all(text, '\+?[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS p
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(e) AS BIGINT) AS n_emails, CAST(sum(p) AS BIGINT) AS n_phones,
        |  CAST((sum(e) + sum(p)) * 1000 AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
        |    AS pii_per_1k_tokens
        |FROM d GROUP BY 1""".stripMargin,
    "q138_dormant_users" ->
      """WITH g AS (SELECT user_id, epoch_us(ts) - epoch_us(lag(ts) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us FROM events)
        |SELECT user_id, CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |  CAST(count(*) AS BIGINT) AS n_gaps
        |FROM g WHERE gap_us IS NOT NULL GROUP BY 1
        |ORDER BY max_gap_us DESC, user_id ASC LIMIT 10""".stripMargin,
    // conversion per week of first view, over the shared funnel CTE
    "q135_cohort_conversion" ->
      (funnelCte +
        """SELECT CAST(date_trunc('week', v.t_view) AS TIMESTAMP) AS cohort_week,
          |  CAST(count(*) AS BIGINT) AS n_funnel_users,
          |  CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_converted,
          |  CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          |    / CAST(count(*) AS DOUBLE) AS conversion_rate
          |FROM v LEFT JOIN p USING (user_id) GROUP BY 1""".stripMargin),
    "q136_revenue_concentration" ->
      """WITH per AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS rev
        |             FROM orders GROUP BY 1),
        |t AS (SELECT round(quantile_cont(rev, 0.9), 2) AS p90 FROM per)
        |SELECT CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CASE WHEN rev >= t.p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
        |  CAST(sum(CAST(round(rev*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_revenue,
        |  CAST(sum(CAST(round((CASE WHEN rev >= t.p90 THEN rev ELSE 0.0 END)*100) AS BIGINT)) AS DOUBLE)/100.0 AS top_revenue,
        |  round(CAST(sum(CAST(round((CASE WHEN rev >= t.p90 THEN rev ELSE 0.0 END)*100) AS BIGINT)) AS DOUBLE)/100.0
        |        / (CAST(sum(CAST(round(rev*100) AS BIGINT)) AS DOUBLE)/100.0), 6) AS top_share
        |FROM per, t""".stripMargin,
    "q133_purchase_gaps" ->
      """WITH g AS (SELECT epoch_us(ts) -
        |    epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      AS gap_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT CAST(count(*) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(gap_us, 0.5), 4) AS p50_us,
        |  round(quantile_cont(gap_us, 0.9), 4) AS p90_us,
        |  min(gap_us) AS min_us, max(gap_us) AS max_us
        |FROM g WHERE gap_us IS NOT NULL""".stripMargin,
    "q134_value_histogram" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q131_tokenizer_fertility" ->
      """WITH d AS (SELECT source,
        |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS s
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(w) AS BIGINT) AS n_words, CAST(sum(s) AS BIGINT) AS n_bpe_tokens,
        |  CAST(sum(s) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS fertility
        |FROM d GROUP BY 1""".stripMargin,
    // DuckDB dow is 0=Sunday; Spark dayofweek is 1=Sunday
    "q132_dow_seasonality" ->
      """WITH c AS (SELECT event_type,
        |    CAST(date_part('dow', ts) + 1 AS INT) AS dow,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.event_type, c.dow, c.n,
        |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
        |FROM c JOIN t USING (event_type)""".stripMargin,
    "q130_term_retrieval" ->
      """WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),'\S+')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |q AS (SELECT term, df FROM dfq ORDER BY df DESC, term ASC LIMIT 3)
        |SELECT term, CAST(rank AS INT) AS rank, doc_id, tf, df, score
        |FROM (SELECT tf.term, tf.doc_id, tf.tf, q.df,
        |        CAST(tf.tf AS DOUBLE)/CAST(q.df AS DOUBLE) AS score,
        |        row_number() OVER (PARTITION BY tf.term
        |          ORDER BY CAST(tf.tf AS DOUBLE)/CAST(q.df AS DOUBLE) DESC,
        |                   tf.doc_id ASC) AS rank
        |      FROM tf JOIN q USING (term))
        |WHERE rank <= 3""".stripMargin,
    // DuckDB list indexing is 1-based; Spark posexplode is 0-based
    "q128_dim_stats" ->
      """WITH e AS (SELECT CAST(i - 1 AS INT) AS dim,
        |    CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i))
        |SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(x), 6) AS mean, round(var_samp(x), 6) AS variance
        |FROM e GROUP BY 1""".stripMargin,
    "q129_ref_integrity" ->
      """SELECT 'orders->customer' AS relationship,
        |  CAST(count(*) AS BIGINT) AS n_orphans
        |FROM orders o WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'lineitem->orders', CAST(count(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'customer->nation', CAST(count(*) AS BIGINT)
        |FROM customer c WHERE NOT EXISTS
        |  (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
        |UNION ALL
        |SELECT 'supplier->nation', CAST(count(*) AS BIGINT)
        |FROM supplier s WHERE NOT EXISTS
        |  (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)""".stripMargin,
    "q127_rfm_segments" ->
      """WITH p AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
        |           WHERE event_type = 'purchase'),
        |mx AS (SELECT max(d) AS max_d FROM p),
        |rfm AS (SELECT user_id,
        |    CAST(date_diff('day', max(d), mx.max_d) AS BIGINT) AS recency_days,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS monetary
        |  FROM p, mx GROUP BY user_id, mx.max_d),
        |t AS (SELECT
        |    round(quantile_cont(recency_days, 0.25), 4) AS r25,
        |    round(quantile_cont(recency_days, 0.5), 4) AS r50,
        |    round(quantile_cont(recency_days, 0.75), 4) AS r75,
        |    round(quantile_cont(frequency, 0.25), 4) AS f25,
        |    round(quantile_cont(frequency, 0.5), 4) AS f50,
        |    round(quantile_cont(frequency, 0.75), 4) AS f75,
        |    round(quantile_cont(monetary, 0.25), 4) AS m25,
        |    round(quantile_cont(monetary, 0.5), 4) AS m50,
        |    round(quantile_cont(monetary, 0.75), 4) AS m75
        |  FROM rfm)
        |SELECT user_id, recency_days, frequency, monetary,
        |  CAST(CASE WHEN recency_days <= r25 THEN 4 WHEN recency_days <= r50 THEN 3
        |            WHEN recency_days <= r75 THEN 2 ELSE 1 END AS INT) AS r_score,
        |  CAST(CASE WHEN frequency > f75 THEN 4 WHEN frequency > f50 THEN 3
        |            WHEN frequency > f25 THEN 2 ELSE 1 END AS INT) AS f_score,
        |  CAST(CASE WHEN monetary > m75 THEN 4 WHEN monetary > m50 THEN 3
        |            WHEN monetary > m25 THEN 2 ELSE 1 END AS INT) AS m_score,
        |  CAST(CASE WHEN recency_days <= r25 THEN 4 WHEN recency_days <= r50 THEN 3
        |            WHEN recency_days <= r75 THEN 2 ELSE 1 END AS VARCHAR) ||
        |  CAST(CASE WHEN frequency > f75 THEN 4 WHEN frequency > f50 THEN 3
        |            WHEN frequency > f25 THEN 2 ELSE 1 END AS VARCHAR) ||
        |  CAST(CASE WHEN monetary > m75 THEN 4 WHEN monetary > m50 THEN 3
        |            WHEN monetary > m25 THEN 2 ELSE 1 END AS VARCHAR) AS segment
        |FROM rfm, t""".stripMargin,
    "q124_length_percentiles" ->
      """WITH d AS (SELECT source,
        |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(quantile_cont(n, 0.5), 4) AS p50_tokens,
        |  round(quantile_cont(n, 0.9), 4) AS p90_tokens,
        |  max(n) AS max_tokens
        |FROM d GROUP BY 1""".stripMargin,
    "q125_shipping_delays" ->
      """WITH d AS (SELECT o_orderpriority,
        |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS BIGINT)
        |      AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  round(quantile_cont(delay_days, 0.5), 4) AS p50_days,
        |  round(quantile_cont(delay_days, 0.9), 4) AS p90_days,
        |  min(delay_days) AS min_days, max(delay_days) AS max_days
        |FROM d GROUP BY 1""".stripMargin,
    "q121_collocations" ->
      """WITH t AS (SELECT regexp_extract_all(lower(text),'\S+') AS t FROM documents),
        |u AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |      FROM (SELECT unnest(t) AS w FROM t) GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM u),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy
        |       FROM (SELECT t[i] AS w1, t[i+1] AS w2
        |             FROM t, unnest(range(1, len(t))) AS r(i)
        |             WHERE len(t) >= 2)
        |       GROUP BY 1, 2)
        |SELECT w1, w2, c_xy,
        |  (CAST(c_xy AS DOUBLE) * CAST(n.n AS DOUBLE)) /
        |    (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS lift
        |FROM bc, n
        |JOIN u u1 ON u1.w = bc.w1
        |JOIN u u2 ON u2.w = bc.w2
        |WHERE c_xy >= 5
        |ORDER BY lift DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin,
    "q122_monthly_yoy" ->
      """WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue
        |  FROM orders GROUP BY 1),
        |p AS (SELECT month + INTERVAL 12 MONTH AS month,
        |    revenue AS prev_year_revenue FROM m)
        |SELECT m.month, m.revenue, p.prev_year_revenue,
        |  round((m.revenue - p.prev_year_revenue) / p.prev_year_revenue * 100, 4)
        |    AS yoy_pct
        |FROM m LEFT JOIN p USING (month)""".stripMargin,
    "q123_key_skew" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT user_id, n, CAST(n AS DOUBLE)/CAST(t.tot AS DOUBLE) AS share
        |FROM c, t ORDER BY n DESC, user_id ASC LIMIT 10""".stripMargin,
    // sequential fold both sides: Spark aggregate() and DuckDB
    // list_aggregate sum are left-to-right; norms reported rounded
    "q120_embedding_norms" ->
      """WITH n AS (SELECT label,
        |    sqrt(list_aggregate(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
        |  CAST(sum(CASE WHEN l2 = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  round(min(l2), 6) AS min_norm, round(max(l2), 6) AS max_norm,
        |  round(avg(l2), 6) AS mean_norm
        |FROM n GROUP BY 1""".stripMargin,
    "q118_cumulative_reach" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1),
        |p AS (SELECT d, CAST(count(*) AS BIGINT) AS new_users FROM f GROUP BY 1)
        |SELECT CAST(d AS TIMESTAMP) AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cumulative_users
        |FROM p""".stripMargin,
    "q119_weekly_churn" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
        |a AS (SELECT week, CAST(count(*) AS BIGINT) AS n_active FROM wk GROUP BY 1),
        |ch AS (SELECT w.week, CAST(count(*) AS BIGINT) AS n_churned
        |       FROM wk w LEFT JOIN wk n ON n.user_id = w.user_id
        |         AND n.week = w.week + INTERVAL 7 DAY
        |       WHERE n.user_id IS NULL GROUP BY 1)
        |SELECT a.week, a.n_active,
        |  CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned,
        |  CAST(coalesce(ch.n_churned, 0) AS DOUBLE) / CAST(a.n_active AS DOUBLE)
        |    AS churn_rate
        |FROM a LEFT JOIN ch USING (week)
        |WHERE a.week < (SELECT max(week) FROM wk)""".stripMargin,
    "q115_event_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n_transitions
        |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS tot
        |        FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n_transitions,
        |  CAST(c.n_transitions AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS p_transition
        |FROM c JOIN tot USING (from_type)""".stripMargin,
    // week arithmetic on week-truncated DATEs: day difference / 7 is an
    // exact integer in both engines (Monday truncation both sides)
    "q101_cohort_retention" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |        CAST((CAST(date_trunc('week', e.ts) AS DATE) - CAST(f.cohort_week AS DATE)) / 7 AS INT) AS week_offset
        |      FROM events e JOIN f USING (user_id)),
        |s AS (SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
        |      FROM f GROUP BY 1),
        |r AS (SELECT cohort_week, week_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |      FROM a GROUP BY 1, 2)
        |SELECT r.cohort_week, r.week_offset, r.n_active, s.n_cohort,
        |  CAST(r.n_active AS DOUBLE)/CAST(s.n_cohort AS DOUBLE) AS retention
        |FROM r JOIN s USING (cohort_week)""".stripMargin,
    // generated weekly spine × distinct types, left join, zero-fill —
    // empty periods must appear, not vanish from the GROUP BY
    "q102_calendar_spine" ->
      """WITH ev AS (SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
        |c AS (SELECT event_type, week, CAST(count(*) AS BIGINT) AS n_events
        |      FROM ev GROUP BY 1, 2),
        |wk AS (SELECT unnest(generate_series(min(week), max(week), INTERVAL 7 DAY)) AS week FROM ev),
        |ty AS (SELECT DISTINCT event_type FROM ev)
        |SELECT ty.event_type, wk.week,
        |  CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events
        |FROM wk CROSS JOIN ty
        |LEFT JOIN c ON c.event_type = ty.event_type AND c.week = wk.week""".stripMargin,
    // each (user, day) pair fans out to the 7 trailing windows covering
    // it; sliding DISTINCT can't run as a running aggregate
    "q103_rolling_active" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |x AS (SELECT user_id, d + CAST(i AS INT) AS day
        |      FROM du, unnest(range(0, 7)) AS u(i))
        |SELECT CAST(day AS TIMESTAMP) AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |FROM x GROUP BY 1""".stripMargin,
    // DAU joined to the q103 trailing-window WAU; one division of two
    // exact BIGINTs
    "q104_stickiness" ->
      """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |dau AS (SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |        FROM du GROUP BY 1),
        |x AS (SELECT user_id, d + CAST(i AS INT) AS day
        |      FROM du, unnest(range(0, 7)) AS u(i)),
        |wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |        FROM x GROUP BY 1)
        |SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE)/CAST(wau.wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau ON wau.day = dau.d""".stripMargin,
    // the inequality join IS the oracle spec; written as BETWEEN-style
    // range bounds (identical semantics to abs(diff) <= 300 s — A/B
    // checked value-identical at sf0.1) so DuckDB plans an IEJoin
    // instead of a nested loop: the abs() form was quadratic and took
    // ~1 h at the 100x gate, the range form is seconds (r11
    // oracle-feasibility rewrite, same rule as q51's sample gate)
    "q106_error_proximity" ->
      """WITH e AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
        |p AS (SELECT ts FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, CAST(count(p.ts) AS BIGINT) AS n_nearby
        |FROM e LEFT JOIN p
        |  ON p.ts >= e.ts - INTERVAL 300 SECOND
        | AND p.ts <= e.ts + INTERVAL 300 SECOND
        |GROUP BY 1""".stripMargin,
    "q107_locf_backfill" -> locfSql,
    "q114_stream_locf" -> locfSql,
    "q110_local_supplier" ->
      """SELECT n_name AS nation,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |    AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    // z computed from double AGGREGATES (mean/stddev) → rounded 4dp; the
    // flag compares the ROUNDED z so both engines flag identically
    "q111_daily_anomaly" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, avg(CAST(n AS DOUBLE)) AS mu,
        |        stddev_samp(CAST(n AS DOUBLE)) AS sigma
        |      FROM d GROUP BY 1)
        |SELECT d.event_type, CAST(d.d AS TIMESTAMP) AS day, d.n,
        |  round(CASE WHEN s.sigma > 0
        |    THEN (CAST(d.n AS DOUBLE) - s.mu) / s.sigma ELSE 0.0 END, 4) AS z,
        |  abs(round(CASE WHEN s.sigma > 0
        |    THEN (CAST(d.n AS DOUBLE) - s.mu) / s.sigma ELSE 0.0 END, 4)) > 2.5
        |    AS is_anomaly
        |FROM d JOIN s USING (event_type)""".stripMargin,
    // q20's quality expression + ntile(4) per source; the (quality DESC,
    // doc_id ASC) order is total, so the quartile assignment is exact
    "q91_curriculum_bins" ->
      """WITH q AS (SELECT doc_id, source,
        |  round(least(1.0, (CAST(len(regexp_extract_all(lower(text),'\b(the|a|an|and|or|of|to|in|is)\b')) AS DOUBLE)
        |      /greatest(CAST(len(regexp_extract_all(lower(text),'\S+')) AS DOUBLE),1.0))*4.0)
        |    * (1.0 - least(1.0, (CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS DOUBLE)
        |      /greatest(CAST(length(text) AS DOUBLE),1.0))*10.0)), 4) AS quality
        |  FROM documents)
        |SELECT doc_id, source, quality,
        |  CAST(ntile(4) OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id ASC) AS INT) AS stage
        |FROM q""".stripMargin,
    // distinct string 8-grams, train x eval inverted-index join, argmax
    // by shared-gram count with ties to the lower eval id
    "q92_contamination_attribution" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') AS tk FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |        CASE WHEN len(tk) < 8 THEN array_to_string(tk,' ')
        |             ELSE array_to_string(tk[i:i+7],' ') END AS gram
        |      FROM t, unnest(range(1, greatest(len(tk)-6, 2))) AS u(i)),
        |p AS (SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id, count(*) AS n_shared
        |      FROM g tr JOIN g ev USING (gram)
        |      WHERE tr.doc_id % 10 <> 7 AND ev.doc_id % 10 = 7
        |      GROUP BY 1, 2)
        |SELECT train_id, eval_id, n_shared
        |FROM (SELECT *, row_number() OVER (PARTITION BY train_id
        |        ORDER BY n_shared DESC, eval_id ASC) AS rn FROM p)
        |WHERE rn = 1""".stripMargin,
    // q86's unrounded epochs per source; copies = floor + md5-bucket
    // fractional share (deterministic, no rand() on either engine)
    "q95_epoch_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS nt
        |  FROM documents),
        |s AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
        |t AS (SELECT sum(sqrt(CAST(n_tokens AS DOUBLE))) AS tot FROM s),
        |w AS (SELECT source,
        |        1000000 * sqrt(CAST(n_tokens AS DOUBLE)) / tot
        |          / CAST(n_tokens AS DOUBLE) AS epochs
        |      FROM s, t),
        |c AS (SELECT d.doc_id, d.source,
        |        CAST(floor(epochs) AS INT) +
        |        CASE WHEN CAST(('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,4))::INT % 100 AS DOUBLE)
        |                  < (epochs - floor(epochs)) * 100.0 THEN 1 ELSE 0 END AS n_copies
        |      FROM d JOIN w USING (source))
        |SELECT doc_id, source, CAST(i AS INT) AS copy_idx
        |FROM c, unnest(range(1, n_copies + 1)) AS u(i)
        |WHERE n_copies > 0""".stripMargin,
    // same old/new snapshot views as q84; drift compares UNROUNDED means
    // (exact int sums, one division), displayed means rounded as aggregates
    "q94_snapshot_drift" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(regexp_extract_all(lower(text),'\S+')) AS BIGINT) AS nt
        |  FROM documents),
        |o AS (SELECT source, count(*) AS n_docs_old, CAST(sum(nt) AS BIGINT) AS tok_old
        |      FROM d WHERE doc_id % 13 <> 5 GROUP BY 1),
        |n AS (SELECT source, count(*) AS n_docs_new, CAST(sum(nt) AS BIGINT) AS tok_new
        |      FROM d WHERE doc_id % 13 <> 0 GROUP BY 1)
        |SELECT source, n_docs_old, n_docs_new,
        |  n_docs_new - n_docs_old AS delta_docs,
        |  round(CAST(tok_old AS DOUBLE)/CAST(n_docs_old AS DOUBLE), 4) AS mean_tokens_old,
        |  round(CAST(tok_new AS DOUBLE)/CAST(n_docs_new AS DOUBLE), 4) AS mean_tokens_new,
        |  abs(CAST(tok_new AS DOUBLE)/CAST(n_docs_new AS DOUBLE)
        |      - CAST(tok_old AS DOUBLE)/CAST(n_docs_old AS DOUBLE))
        |    > (CAST(tok_old AS DOUBLE)/CAST(n_docs_old AS DOUBLE)) * 0.1 AS mean_drifted
        |FROM o FULL OUTER JOIN n USING (source)""".stripMargin,
    // binary-digit-length buckets: exact integer arithmetic, no log2
    "q93_length_histogram" ->
      """WITH d AS (SELECT source,
        |  CAST(len(regexp_extract_all(lower(text),'\S+')) AS INT) AS n FROM documents)
        |SELECT source, CAST(length(printf('%b', n)) AS INT) AS bucket,
        |  count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens,
        |  min(n) AS min_tokens, max(n) AS max_tokens
        |FROM d GROUP BY 1, 2""".stripMargin,
    // the verified-pair universe grouped by unordered source pair — the
    // brute-force oracle checks the pair set AND the attribution
    "q90_cross_source_dups" ->
      (verifiedAllPairsCte +
        """SELECT least(da.source, db.source) AS source_a,
          |       greatest(da.source, db.source) AS source_b,
          |       count(*) AS n_pairs
          |FROM p JOIN documents da ON p.id_a = da.doc_id
          |       JOIN documents db ON p.id_b = db.doc_id
          |WHERE p.j >= 0.9
          |GROUP BY 1, 2""".stripMargin),
    // release writer audit: row/token counts per source come from the
    // shared flags CTE; the one-file-per-source layout contract is the
    // Spark-verified boolean (q33's contract-column pattern)
    "q85_release_write" -> releaseFlagsSql(
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  true AS one_file_per_source
        |FROM flags
        |WHERE keep_exact AND q_ok AND not_eval AND clean AND mixed
        |GROUP BY source""".stripMargin),
    // streamed admission == the batch release set: every gate per-doc,
    // exact dedup via first-arrival-wins over id-ordered batches ≡ the
    // flags CTE's min-id-per-fingerprint rule
    "q96_stream_release_admission" -> releaseFlagsSql(
      """SELECT doc_id, source, n_tokens FROM flags
        |WHERE keep_exact AND q_ok AND not_eval AND clean AND mixed""".stripMargin),
    "q68_data_card" -> releaseFlagsSql(
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(avg(CAST(n_tokens AS DOUBLE)), 4) AS mean_tokens,
        |  CAST(count(DISTINCT lang) AS INT) AS n_langs
        |FROM flags
        |WHERE keep_exact AND q_ok AND not_eval AND clean AND mixed
        |GROUP BY source""".stripMargin),
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
        |   / 100.0 AS sum_base_price,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |   AS DOUBLE) / 10000.0 AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey AS okey, l_linenumber AS line_no, l_quantity AS qty,
        | l_extendedprice*(1-l_discount) AS net_price,
        | strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        |FROM lineitem WHERE l_returnflag = 'R' AND l_discount > 0.05""".stripMargin,
    "q03_customers_region" ->
      """SELECT r_name AS region_name, count(*) AS n_customers,
        | round(avg(c_acctbal),4) AS avg_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q04_revenue_segment" ->
      """SELECT c_mktsegment AS segment, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_price,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q05_orders_customer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice),0),2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT')""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE c_acctbal > 0
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q08_latest_per_user" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | ts AS last_ts
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "q09_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q10_pagination" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 20 OFFSET 40""".stripMargin,
    "q11_in_like" ->
      """SELECT event_id, user_id, event_type, props FROM events
        |WHERE event_type IN ('click','purchase') AND props LIKE '%7%'""".stripMargin,
    "q12_event_stats" ->
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q13_revenue_nation" -> revenueByNationSql,
    "q113_salted_fact_join" -> revenueByNationSql,
    "q147_adaptive_skew_join" -> revenueByNationSql,
    "q148_market_share" ->
      """WITH sr AS (SELECT s_suppkey, r_name AS supp_region
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |seg AS (SELECT CAST(year(o_orderdate) AS INT) AS order_year, supp_region,
        |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |                  AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN sr ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |t AS (SELECT order_year, CAST(sum(rev) AS BIGINT) AS total FROM seg GROUP BY 1)
        |SELECT seg.order_year, supp_region,
        |  CAST(rev AS DOUBLE) / 10000.0 AS revenue,
        |  CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) AS market_share
        |FROM seg JOIN t ON seg.order_year = t.order_year""".stripMargin,
    "q149_top_supplier" ->
      """WITH ps AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000)
        |                  AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev AS DOUBLE)/10000.0 AS total_revenue
        |FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev = (SELECT max(rev) FROM ps)""".stripMargin,
    // de-self-certified (r9): the oracle runs the FULL roundtrip through
    // its OWN nested-replace BPE encoder (q70's machinery) — per distinct
    // word it encodes, strips the delimiters back to a decoded string,
    // counts the survivors, and rebuilds each doc's decoded token stream
    // in order to an md5 the engine must match byte-exactly. No literal-
    // true column remains: a lossy merge, dropped character or
    // overlapping application on either side flips n_ok, lossless AND
    // decoded_md5 red.
    "q151_bpe_roundtrip" ->
      """WITH pt AS (SELECT doc_id,
        |    regexp_extract_all(coalesce(text, ''),
        |                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]') AS toks
        |  FROM documents),
        |tok AS (SELECT doc_id, i AS ord, toks[i+1] AS t
        |        FROM pt, unnest(range(len(toks))) AS u(i)),
        |dw AS (SELECT DISTINCT lower(t) AS w FROM tok
        |       WHERE regexp_full_match(t, '[A-Za-z]+')),
        |dec AS (SELECT w, replace(__BPE_ENC__, '|', '') AS d FROM dw),
        |str AS (SELECT tok.doc_id,
        |    count(*) AS n_tok,
        |    sum(CASE WHEN NOT regexp_full_match(t, '[A-Za-z]+')
        |              OR dec.d = lower(t) THEN 1 ELSE 0 END) AS n_good,
        |    string_agg(CASE WHEN regexp_full_match(t, '[A-Za-z]+')
        |                    THEN dec.d ELSE t END, ' ' ORDER BY ord) AS s
        |  FROM tok LEFT JOIN dec ON lower(t) = dec.w
        |  GROUP BY 1)
        |SELECT p.doc_id,
        |  CAST(coalesce(n_tok, 0) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(n_good, 0) AS BIGINT) AS n_ok,
        |  coalesce(n_tok, 0) = coalesce(n_good, 0) AS lossless,
        |  md5(coalesce(s, '')) AS decoded_md5
        |FROM pt p LEFT JOIN str ON p.doc_id = str.doc_id""".stripMargin
        .replace("__BPE_ENC__", graft.functions.Bpe.duckdbNestedReplace("w")),
    // de-self-certified (r9): the seeded cell layout (16 lowest-id
    // vectors as centroids, one argmax assignment) is recomputed HERE in
    // SQL with the engine's exact tie-breaks (assignment: cos desc, cid
    // desc = Spark's max(struct); probe ranking: cos desc, cid asc;
    // top-5: round-6 cos desc, id asc), so every recall value r4/r8/r16
    // is an independently derived number — no literal-true column left
    "q152_ivf_partial_probe" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 50),
        |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cvec
        |      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |asg AS (SELECT vec_id, cid FROM (
        |    SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.cid DESC) AS rn
        |    FROM e, c) WHERE rn = 1),
        |pr AS (SELECT query_id, qv, cid, row_number() OVER (PARTITION BY query_id
        |        ORDER BY list_cosine_similarity(qv, cvec) DESC, cid ASC) AS prk
        |      FROM q, c),
        |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, p.prk,
        |        round(list_cosine_similarity(p.qv, e.v), 6) AS cos
        |      FROM pr p JOIN asg a USING (cid) JOIN e ON a.vec_id = e.vec_id
        |      WHERE a.vec_id <> p.query_id),
        |tk AS (SELECT np, query_id, neighbor_id FROM (
        |    SELECT np.np, cd.query_id, cd.neighbor_id, row_number() OVER
        |        (PARTITION BY np.np, cd.query_id
        |         ORDER BY cd.cos DESC, cd.neighbor_id ASC) AS rk
        |    FROM (VALUES (4),(8),(16)) np(np) JOIN cand cd ON cd.prk <= np.np)
        |  WHERE rk <= 5),
        |ex AS (SELECT query_id, neighbor_id FROM (
        |    SELECT qq.query_id, e.vec_id AS neighbor_id, row_number() OVER
        |        (PARTITION BY qq.query_id
        |         ORDER BY round(list_cosine_similarity(qq.qv, e.v), 6) DESC,
        |                  e.vec_id ASC) AS rk
        |    FROM q qq JOIN e ON e.vec_id <> qq.query_id) WHERE rk <= 5),
        |rec AS (SELECT ex.query_id, np.np,
        |        sum(CASE WHEN tk.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS r
        |      FROM (VALUES (4),(8),(16)) np(np)
        |      CROSS JOIN ex
        |      LEFT JOIN tk ON tk.np = np.np AND tk.query_id = ex.query_id
        |                   AND tk.neighbor_id = ex.neighbor_id
        |      GROUP BY 1, 2)
        |SELECT query_id,
        |  CAST(max(CASE WHEN np = 4 THEN r END) AS INT) AS r4,
        |  CAST(max(CASE WHEN np = 8 THEN r END) AS INT) AS r8,
        |  CAST(max(CASE WHEN np = 16 THEN r END) AS INT) AS r16,
        |  (max(CASE WHEN np = 8 THEN r END) >= max(CASE WHEN np = 4 THEN r END)
        |   AND max(CASE WHEN np = 16 THEN r END) >= max(CASE WHEN np = 8 THEN r END))
        |    AS monotone_ok,
        |  max(CASE WHEN np = 16 THEN r END) = 5 AS exact_at_full
        |FROM rec GROUP BY 1""".stripMargin,
    // int8 quantization recomputed end-to-end: the quantizer uses floor
    // (bit-deterministic for any IEEE input — round()'s half-up-on-
    // shortest-string semantics differ across engines), its dot/norms are
    // exact integers (≤127²·64 ≈ 2²⁰, exactly representable even in
    // float64 sums), and both rankings reuse q51's round-6 + id tie-break
    // idiom; q_l1/q_sumsq pin the raw quantized vector so a table error
    // fails the hash independent of ranking agreement. NULLIF mirrors
    // Spark's divide-by-zero-is-NULL for a hypothetical all-zero vector
    // (quantizeInt8 maps it to all-zero q, nsq = 0)
    "q158_int8_quant_recall" ->
      """WITH mm AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS m
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding, x -> CASE WHEN m = 0 THEN 0
        |      ELSE CAST(floor(x::DOUBLE * 127 / m + 0.5) AS INT) END) AS q
        |  FROM mm),
        |qq AS (
        |  SELECT vec_id, embedding, q,
        |    list_dot_product(q::DOUBLE[], q::DOUBLE[]) AS nsq
        |  FROM qv),
        |p AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[],
        |                                 b.embedding::DOUBLE[]), 6) AS f_cos,
        |    round(list_dot_product(a.q::DOUBLE[], b.q::DOUBLE[])
        |          / NULLIF(sqrt(a.nsq) * sqrt(b.nsq), 0), 6) AS i_cos
        |  FROM qq a JOIN qq b ON a.vec_id < 50 AND b.vec_id <> a.vec_id),
        |r AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY f_cos DESC, neighbor_id ASC) AS rf,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY i_cos DESC, neighbor_id ASC) AS ri
        |  FROM p),
        |agg AS (
        |  SELECT query_id,
        |    CAST(sum(CASE WHEN rf <= 10 AND ri <= 10 THEN 1 ELSE 0 END) AS INT)
        |      AS overlap_at_10,
        |    max(CASE WHEN rf = 1 THEN neighbor_id END) AS top1_float,
        |    max(CASE WHEN ri = 1 THEN neighbor_id END) AS top1_int8
        |  FROM r GROUP BY 1),
        |ql AS (
        |  SELECT vec_id AS query_id,
        |    CAST(list_sum(list_transform(q, v -> abs(v))) AS BIGINT) AS q_l1,
        |    CAST(nsq AS BIGINT) AS q_sumsq
        |  FROM qq WHERE vec_id < 50)
        |SELECT ql.query_id, q_l1, q_sumsq, overlap_at_10, top1_float, top1_int8
        |FROM ql JOIN agg USING (query_id)""".stripMargin,
    // the full PQ pipeline recomputed in SQL: same int8 quantizer, the
    // seeded codebook (16 lowest-id vectors' subvectors), argmin-L2
    // encode with lowest-index tie-break, ADC scoring, both rankings —
    // every quantity an exact integer (list_dot_product over ::DOUBLE[]
    // of ≤127 ints is exact: sums < 2^21), so no float idiom is needed.
    // The CTE bodies are shared with q161/q162 (pqSeedCtes/pqSeedRankCtes)
    "q160_pq_adc_recall" ->
      ("WITH " + pqSeedCtes + ",\n" + pqSeedRankCtes + "\n" +
        """SELECT query_id,
        |  CAST(sum(CASE WHEN re <= 10 AND rp <= 10 THEN 1 ELSE 0 END) AS INT)
        |    AS overlap_at_10,
        |  max(CASE WHEN re = 1 THEN neighbor_id END) AS top1_exact,
        |  max(CASE WHEN rp = 1 THEN neighbor_id END) AS top1_pq,
        |  CAST(max(CASE WHEN re = 1 THEN ex END) AS BIGINT) AS exact_top1_score,
        |  CAST(max(CASE WHEN rp = 1 THEN adc_score END) AS BIGINT)
        |    AS adc_top1_score
        |FROM r GROUP BY 1""".stripMargin),
    // the composed IVF-PQ index recomputed whole in SQL: q152's seeded
    // cells + assignment/probe tie-breaks (assignment cos DESC, cid DESC
    // = Spark's max-struct; probe cos DESC, cid ASC), q160's codebook and
    // argmin-L2 codes, ADC scores as exact integers, top-5 per query
    "q161_ivfpq_topk" ->
      ("WITH " + ivfPqProbeCtes + "\n" +
        """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_score
        |FROM (SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |    (PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC)
        |      AS rank
        |  FROM adc) WHERE rank <= 5""".stripMargin),
    // the two-stage path: ADC top-20 shortlist per query (q161's probe
    // CTEs), then EXACT int8 dots re-rank the shortlist — both scores in
    // the output, so every row the re-rank reorders is value-checked
    "q163_ivfpq_rerank" ->
      ("WITH " + ivfPqProbeCtes + ",\n" +
        """sl AS (SELECT query_id, neighbor_id, adc_score FROM (
        |    SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |        (PARTITION BY query_id ORDER BY adc_score DESC,
        |         neighbor_id ASC) AS arank
        |    FROM adc) WHERE arank <= 20),
        |ex AS (SELECT s.query_id, s.neighbor_id, s.adc_score,
        |    CAST(list_dot_product(q1.q::DOUBLE[], q2.q::DOUBLE[])
        |         AS BIGINT) AS exact_score
        |  FROM sl s JOIN qv q1 ON q1.vec_id = s.query_id
        |            JOIN qv q2 ON q2.vec_id = s.neighbor_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       exact_score, adc_score
        |FROM (SELECT query_id, neighbor_id, exact_score, adc_score,
        |    row_number() OVER (PARTITION BY query_id
        |        ORDER BY exact_score DESC, neighbor_id ASC) AS rank
        |  FROM ex) WHERE rank <= 5""".stripMargin),
    // filtered ANN recomputed whole: label-filtered candidates in the
    // probed cells, per-query starvation counts, the widened
    // (nprobe = nlist) fallback for starved queries, ADC scores, top-5 —
    // DuckDB recomputes filter + ranking end-to-end, including WHICH
    // queries widened
    "q164_filtered_ann" ->
      ("WITH " + ivfPqCellCtes + ",\n" + pqSeedCtes + ",\n" + ivfPqPsubCte +
        ",\n" +
        """lbl AS (SELECT vec_id, label FROM embeddings),
        |candn AS (SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM pr p JOIN asg a USING (cid) JOIN lbl l ON l.vec_id = a.vec_id
        |  WHERE a.vec_id <> p.query_id AND l.label = 3),
        |cnt AS (SELECT q.query_id, count(c.neighbor_id) AS n
        |        FROM qf q LEFT JOIN candn c USING (query_id) GROUP BY 1),
        |starved AS (SELECT query_id FROM cnt WHERE n < 5),
        |candw AS (SELECT s.query_id, l.vec_id AS neighbor_id
        |  FROM starved s JOIN lbl l ON l.label = 3 AND l.vec_id <> s.query_id),
        |cand AS (SELECT query_id, neighbor_id FROM candn
        |         WHERE query_id NOT IN (SELECT query_id FROM starved)
        |         UNION ALL SELECT query_id, neighbor_id FROM candw),
        |""".stripMargin + ivfPqAdcCte + "\n" +
        """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_score,
        |  query_id IN (SELECT query_id FROM starved) AS widened
        |FROM (SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |    (PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC)
        |      AS rank
        |  FROM adc) WHERE rank <= 5""".stripMargin),
    // tombstoned ANN recomputed whole: the deterministic revocation set
    // (vec_id ≡ 5 mod 17) is excluded from the query panel, the probed
    // candidates, and therefore both ranking stages — top-5 refills from
    // the survivors; DuckDB recomputes q163's two-stage path minus the set
    "q165_tombstoned_ann" ->
      ("WITH " + ivfPqCellCtes + ",\n" + pqSeedCtes + ",\n" + ivfPqPsubCte +
        ",\n" +
        """ts AS (SELECT vec_id FROM embeddings WHERE vec_id % 17 = 5),
        |pr2 AS (SELECT query_id, cid FROM (
        |    SELECT q.query_id, c.cid, row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC,
        |                 c.cid ASC) AS prk
        |    FROM qf q, cents c
        |    WHERE q.query_id NOT IN (SELECT vec_id FROM ts)) WHERE prk <= 4),
        |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM pr2 p JOIN asg a USING (cid)
        |  WHERE a.vec_id <> p.query_id
        |    AND a.vec_id NOT IN (SELECT vec_id FROM ts)),
        |""".stripMargin + ivfPqAdcCte + ",\n" +
        """sl AS (SELECT query_id, neighbor_id, adc_score FROM (
        |    SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |        (PARTITION BY query_id ORDER BY adc_score DESC,
        |         neighbor_id ASC) AS arank
        |    FROM adc) WHERE arank <= 20),
        |ex AS (SELECT s.query_id, s.neighbor_id, s.adc_score,
        |    CAST(list_dot_product(q1.q::DOUBLE[], q2.q::DOUBLE[])
        |         AS BIGINT) AS exact_score
        |  FROM sl s JOIN qv q1 ON q1.vec_id = s.query_id
        |            JOIN qv q2 ON q2.vec_id = s.neighbor_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
        |       exact_score, adc_score
        |FROM (SELECT query_id, neighbor_id, exact_score, adc_score,
        |    row_number() OVER (PARTITION BY query_id
        |        ORDER BY exact_score DESC, neighbor_id ASC) AS rank
        |  FROM ex) WHERE rank <= 5""".stripMargin),
    // grown-corpus serving: the admitted set is deterministic (vec_id ≡ 3
    // mod 23, re-keyed +10M, embedding reversed), so DuckDB recomputes
    // the ENTIRE two-stage path over corpus ∪ admitted from scratch —
    // admitted ids returned as neighbors are value-checked end-to-end
    "q166_grown_ann" -> grownRerankOracle(embuGrownCte),
    // vector upsert: the deterministic update set (vec_id ≡ 7 mod 29,
    // vec_id ≥ 50) serves its NEW (reversed) embedding under the SAME id;
    // the old version is excluded from the recomputed base entirely
    "q167_upsert_ann" -> grownRerankOracle(
      """embu AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE NOT (vec_id % 29 = 7 AND vec_id >= 50)
        |  UNION ALL
        |  SELECT vec_id, list_reverse(embedding) AS embedding
        |  FROM embeddings WHERE vec_id % 29 = 7 AND vec_id >= 50)""".stripMargin),
    // hybrid RRF recomputed whole: exact tf/df term retrieval (q130's
    // CTEs), the exact two-stage ANN (q163's CTEs, panel < 3), and the
    // fusion — ranks are exact ints, RRF doubles recomputed from them
    "q168_hybrid_rrf" ->
      ("WITH " + ivfPqCellCtes + ",\n" + pqSeedCtes + ",\n" + ivfPqPsubCte +
        ",\n" +
        """pr3 AS (SELECT query_id, cid FROM pr WHERE query_id < 3),
        |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM pr3 p JOIN asg a USING (cid) WHERE a.vec_id <> p.query_id),
        |""".stripMargin + ivfPqAdcCte + ",\n" +
        """sl AS (SELECT query_id, neighbor_id, adc_score FROM (
        |    SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |        (PARTITION BY query_id ORDER BY adc_score DESC,
        |         neighbor_id ASC) AS arank
        |    FROM adc) WHERE arank <= 20),
        |exv AS (SELECT s.query_id, s.neighbor_id,
        |    CAST(list_dot_product(q1.q::DOUBLE[], q2.q::DOUBLE[])
        |         AS BIGINT) AS exact_score
        |  FROM sl s JOIN qv q1 ON q1.vec_id = s.query_id
        |            JOIN qv q2 ON q2.vec_id = s.neighbor_id),
        |vecside AS (SELECT query_id, neighbor_id AS id,
        |    CAST(r AS INT) AS vec_rank
        |  FROM (SELECT query_id, neighbor_id, row_number() OVER
        |      (PARTITION BY query_id
        |       ORDER BY exact_score DESC, neighbor_id ASC) AS r
        |    FROM exv) WHERE r <= 10),
        |tt AS (SELECT doc_id,
        |         unnest(regexp_extract_all(lower(text),'\S+')) AS term
        |       FROM documents),
        |tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |        FROM tt GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |        FROM tfq GROUP BY 1),
        |q3 AS (SELECT term, df,
        |         row_number() OVER (ORDER BY df DESC, term ASC) - 1
        |           AS query_id
        |       FROM (SELECT term, df FROM dfq
        |             ORDER BY df DESC, term ASC LIMIT 3)),
        |termside AS (SELECT query_id, doc_id AS id, CAST(r AS INT)
        |    AS term_rank
        |  FROM (SELECT q3.query_id, tfq.doc_id, row_number() OVER
        |      (PARTITION BY q3.query_id
        |       ORDER BY CAST(tfq.tf AS DOUBLE)/CAST(q3.df AS DOUBLE) DESC,
        |                tfq.doc_id ASC) AS r
        |    FROM tfq JOIN q3 USING (term)) WHERE r <= 10),
        |fused AS (SELECT coalesce(t.query_id, v.query_id) AS query_id,
        |    coalesce(t.id, v.id) AS id,
        |    coalesce(t.term_rank, 0) AS term_rank,
        |    coalesce(v.vec_rank, 0) AS vec_rank
        |  FROM termside t FULL OUTER JOIN vecside v
        |    ON t.query_id = v.query_id AND t.id = v.id),
        |scored AS (SELECT query_id, id, term_rank, vec_rank,
        |    (CASE WHEN term_rank > 0
        |          THEN 1.0::DOUBLE / (60 + term_rank) ELSE 0.0::DOUBLE END)
        |  + (CASE WHEN vec_rank > 0
        |          THEN 1.0::DOUBLE / (60 + vec_rank) ELSE 0.0::DOUBLE END)
        |      AS rrf_score
        |  FROM fused)
        |SELECT query_id, CAST(rank AS INT) AS rank, id, term_rank,
        |       vec_rank, rrf_score
        |FROM (SELECT query_id, id, term_rank, vec_rank, rrf_score,
        |    row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf_score DESC, id ASC) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin),
    // doc-arm grow fold: union (corpus + word-reversed admitted docs) +
    // exact-copy probe panel, full pairwise trigram Jaccard >= 0.9 via
    // the inverted-gram join (the q65/q74 oracle shape over the grown
    // base) — recall over admitted docs is value-checked end-to-end
    "q169_grown_minhash" ->
      ("WITH " + duGrownCte + ",\n" +
      """al AS (SELECT doc_id, text FROM du
        |  UNION ALL
        |  SELECT doc_id + 20000000 AS doc_id, text FROM du
        |  WHERE doc_id % 41 = 6),
        |t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks
        |      FROM al),
        |s AS (SELECT doc_id, list_distinct(
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |             ELSE list_transform(range(len(toks)-2),
        |                    i -> array_to_string(toks[i+1:i+3],' ')) END) sh
        |      FROM t),
        |sz AS (SELECT doc_id, len(sh) n FROM s),
        |inv AS (SELECT doc_id, unnest(sh) g FROM s),
        |c AS (SELECT i.doc_id inc_id, cc.doc_id corpus_id, count(*) shared
        |      FROM inv i JOIN inv cc ON cc.g = i.g
        |        AND i.doc_id >= 20000000 AND cc.doc_id < 20000000
        |      GROUP BY 1, 2),
        |p AS (SELECT inc_id, corpus_id,
        |        CAST(shared AS DOUBLE) / (si.n + sc.n - shared) j
        |      FROM c JOIN sz si ON si.doc_id = c.inc_id
        |             JOIN sz sc ON sc.doc_id = c.corpus_id)
        |SELECT inc_id, corpus_id, j AS jaccard FROM p WHERE j >= 0.9""".stripMargin),
    // grown serving under between-fold deletions: the grown union base
    // (q166's) recomputed whole, MINUS the deterministic revocation set
    // (corpus vec_id ≡ 11 mod 43, ≥ 50) — excluded from the query panel,
    // the probed candidates, and both ranking stages (q165's shape over
    // the grown base); top-k refills from the survivors
    "q170_grown_tombstoned" ->
      ("WITH " + embuGrownCte + ",\n" + ivfPqCellCtesOver("embu") + ",\n" +
        pqSeedCtesOver("embu") + ",\n" + ivfPqPsubCte + ",\n" +
        """ts AS (SELECT vec_id FROM embeddings
        |        WHERE vec_id % 43 = 11 AND vec_id >= 50),
        |pr2 AS (SELECT query_id, cid FROM (
        |    SELECT q.query_id, c.cid, row_number() OVER (PARTITION BY q.query_id
        |        ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC,
        |                 c.cid ASC) AS prk
        |    FROM qf q, cents c
        |    WHERE q.query_id NOT IN (SELECT vec_id FROM ts)) WHERE prk <= 4),
        |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM pr2 p JOIN asg a USING (cid)
        |  WHERE a.vec_id <> p.query_id
        |    AND a.vec_id NOT IN (SELECT vec_id FROM ts)),
        |""".stripMargin + ivfPqAdcCte + ",\n" + ivfPqRerankTail),
    // filtered ANN over the grown corpus: q164's filter + starvation +
    // widened-fallback recomputed whole over the grown union base, with
    // the label relation the union of corpus labels and the admitted
    // set's source-row labels
    "q171_grown_filtered_ann" ->
      ("WITH " + embuGrownCte + ",\n" + ivfPqCellCtesOver("embu") + ",\n" +
        pqSeedCtesOver("embu") + ",\n" + ivfPqPsubCte + ",\n" +
        """lbl AS (SELECT vec_id, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000000 AS vec_id, label FROM embeddings
        |  WHERE vec_id % 23 = 3),
        |candn AS (SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM pr p JOIN asg a USING (cid) JOIN lbl l ON l.vec_id = a.vec_id
        |  WHERE a.vec_id <> p.query_id AND l.label = 3),
        |cnt AS (SELECT q.query_id, count(c.neighbor_id) AS n
        |        FROM qf q LEFT JOIN candn c USING (query_id) GROUP BY 1),
        |starved AS (SELECT query_id FROM cnt WHERE n < 5),
        |candw AS (SELECT s.query_id, l.vec_id AS neighbor_id
        |  FROM starved s JOIN lbl l ON l.label = 3 AND l.vec_id <> s.query_id),
        |cand AS (SELECT query_id, neighbor_id FROM candn
        |         WHERE query_id NOT IN (SELECT query_id FROM starved)
        |         UNION ALL SELECT query_id, neighbor_id FROM candw),
        |""".stripMargin + ivfPqAdcCte + "\n" +
        """SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_score,
        |  query_id IN (SELECT query_id FROM starved) AS widened
        |FROM (SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |    (PARTITION BY query_id ORDER BY adc_score DESC, neighbor_id ASC)
        |      AS rank
        |  FROM adc) WHERE rank <= 5""".stripMargin),
    // hybrid RRF over the GROWN family: q168's fusion recomputed whole
    // with both bases grown — the term arm's tf/df over corpus ∪ admitted
    // docs, the vector arm's two-stage ANN over corpus ∪ admitted vectors
    "q172_grown_hybrid_rrf" ->
      ("WITH " + duGrownCte + ",\n" + embuGrownCte + ",\n" +
        ivfPqCellCtesOver("embu") + ",\n" + pqSeedCtesOver("embu") + ",\n" +
        ivfPqPsubCte + ",\n" +
        """pr3 AS (SELECT query_id, cid FROM pr WHERE query_id < 3),
        |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM pr3 p JOIN asg a USING (cid) WHERE a.vec_id <> p.query_id),
        |""".stripMargin + ivfPqAdcCte + ",\n" +
        """sl AS (SELECT query_id, neighbor_id, adc_score FROM (
        |    SELECT query_id, neighbor_id, adc_score, row_number() OVER
        |        (PARTITION BY query_id ORDER BY adc_score DESC,
        |         neighbor_id ASC) AS arank
        |    FROM adc) WHERE arank <= 20),
        |exv AS (SELECT s.query_id, s.neighbor_id,
        |    CAST(list_dot_product(q1.q::DOUBLE[], q2.q::DOUBLE[])
        |         AS BIGINT) AS exact_score
        |  FROM sl s JOIN qv q1 ON q1.vec_id = s.query_id
        |            JOIN qv q2 ON q2.vec_id = s.neighbor_id),
        |vecside AS (SELECT query_id, neighbor_id AS id,
        |    CAST(r AS INT) AS vec_rank
        |  FROM (SELECT query_id, neighbor_id, row_number() OVER
        |      (PARTITION BY query_id
        |       ORDER BY exact_score DESC, neighbor_id ASC) AS r
        |    FROM exv) WHERE r <= 10),
        |tt AS (SELECT doc_id,
        |         unnest(regexp_extract_all(lower(text),'\S+')) AS term
        |       FROM du),
        |tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |        FROM tt GROUP BY 1, 2),
        |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |        FROM tfq GROUP BY 1),
        |q3 AS (SELECT term, df,
        |         row_number() OVER (ORDER BY df DESC, term ASC) - 1
        |           AS query_id
        |       FROM (SELECT term, df FROM dfq
        |             ORDER BY df DESC, term ASC LIMIT 3)),
        |termside AS (SELECT query_id, doc_id AS id, CAST(r AS INT)
        |    AS term_rank
        |  FROM (SELECT q3.query_id, tfq.doc_id, row_number() OVER
        |      (PARTITION BY q3.query_id
        |       ORDER BY CAST(tfq.tf AS DOUBLE)/CAST(q3.df AS DOUBLE) DESC,
        |                tfq.doc_id ASC) AS r
        |    FROM tfq JOIN q3 USING (term)) WHERE r <= 10),
        |fused AS (SELECT coalesce(t.query_id, v.query_id) AS query_id,
        |    coalesce(t.id, v.id) AS id,
        |    coalesce(t.term_rank, 0) AS term_rank,
        |    coalesce(v.vec_rank, 0) AS vec_rank
        |  FROM termside t FULL OUTER JOIN vecside v
        |    ON t.query_id = v.query_id AND t.id = v.id),
        |scored AS (SELECT query_id, id, term_rank, vec_rank,
        |    (CASE WHEN term_rank > 0
        |          THEN 1.0::DOUBLE / (60 + term_rank) ELSE 0.0::DOUBLE END)
        |  + (CASE WHEN vec_rank > 0
        |          THEN 1.0::DOUBLE / (60 + vec_rank) ELSE 0.0::DOUBLE END)
        |      AS rrf_score
        |  FROM fused)
        |SELECT query_id, CAST(rank AS INT) AS rank, id, term_rank,
        |       vec_rank, rrf_score
        |FROM (SELECT query_id, id, term_rank, vec_rank, rrf_score,
        |    row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf_score DESC, id ASC) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin),
    // q162's recomputable half: the seeded panel×corpus ADC score-error
    // sum (q160's exact/adc CTEs) and the seeded corpus distortion
    // (argmin-L2 min-distance sum — exactly what the engine derives from
    // the stored codes via the ||x-c||² identity); the trained-codebook
    // contracts pin `true` (the q27/q75 convention — k-means lives only
    // in this engine), and the trained SUMS are pinned as per-corpus
    // calibrated literals (q162TrainedPins — r13, advisor ask: a
    // trained-path regression must move a hashed VALUE, not only flip a
    // boolean near its bar). The `r` CTE rides along unused (shared text).
    "q162_pq_trained_audit" ->
      ("WITH " + pqSeedCtes + ",\n" + pqSeedRankCtes + ",\n" +
        """err AS (SELECT count(*) AS n,
        |    CAST(sum(abs(e.ex - a.adc_score)) AS BIGINT) AS es
        |  FROM exact e JOIN adc a
        |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id),
        |dist AS (SELECT CAST(sum(md) AS BIGINT) AS ds FROM (
        |    SELECT vec_id, s, min(d) AS md FROM enc0 GROUP BY 1, 2))
        |SELECT CAST((SELECT n FROM err) AS BIGINT) AS n_pairs,
        |  (SELECT es FROM err) AS sum_adc_err_seeded,
        |  (SELECT ds FROM dist) AS sum_dist_seeded,
        |""".stripMargin +
        s"  ${q162Pin(_._1)} AS sum_adc_err_trained,\n" +
        s"  ${q162Pin(_._2)} AS sum_dist_trained,\n" +
        """  true AS trained_improves,
        |  true AS trained_err_better""".stripMargin),
    "q150_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "q14_dedup_exact" ->
      """SELECT user_id, event_type, min(event_id) AS first_event_id,
        | min(ts) AS first_ts
        |FROM events GROUP BY user_id, event_type""".stripMargin,
    "q15_topn_per_group" ->
      """SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice, row_number() OVER
        |        (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) rn
        |      FROM orders) WHERE rn <= 3""".stripMargin,
    "q16_scalar_funcs" ->
      """SELECT o_orderkey,
        | CAST(date_part('year', o_orderdate) AS INT) AS order_year,
        | CAST(date_part('month', o_orderdate) AS INT) AS order_month,
        | strftime(o_orderdate, '%Y-%m') AS order_ym,
        | CASE WHEN o_totalprice >= 200000 THEN 'high'
        |      WHEN o_totalprice >= 100000 THEN 'mid'
        |      ELSE 'low' END AS price_bucket,
        | o_orderstatus || '-' || substr(o_orderpriority, 1, 1) AS status_label,
        | upper(o_orderstatus) AS status_uc,
        | CAST(length(o_orderpriority) AS INT) AS prio_len
        |FROM orders""".stripMargin,
    "q17_conditional_agg" ->
      """SELECT event_type,
        | CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(sum(CASE WHEN value <= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        | round(avg(CAST(CASE WHEN value > 50 THEN 1 ELSE 0 END AS DOUBLE)),4) AS share_high
        |FROM events GROUP BY event_type""".stripMargin,
    "q18_latest_join_back" ->
      """WITH latest AS (
        |  SELECT user_id, ts, event_type
        |  FROM (SELECT user_id, ts, event_type, row_number() OVER
        |          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |        FROM events) WHERE rn = 1),
        |counts AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
        |SELECT l.user_id, c.n_events, l.ts AS last_ts
        |FROM latest l JOIN counts c ON l.user_id = c.user_id
        |WHERE l.event_type = 'error'""".stripMargin,
    "q19_token_stats" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(lower(text),'\S+')) AS INT) AS n_tokens,
        | CAST(len(list_distinct(regexp_extract_all(lower(text),'\S+'))) AS INT) AS n_distinct_tokens,
        | CAST(length(text) AS INT) AS n_chars_calc,
        | n_chars
        |FROM documents""".stripMargin,
    "q20_quality_score" ->
      """SELECT doc_id, stop_hits, n_punct, n_digits,
        | round(least(1.0, (CAST(stop_hits AS DOUBLE)/greatest(CAST(n_tokens AS DOUBLE),1.0))*4.0)
        |   * (1.0 - least(1.0, (CAST(n_punct AS DOUBLE)/greatest(CAST(n_chars AS DOUBLE),1.0))*10.0)), 4) AS quality
        |FROM (SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text),'\b(the|a|an|and|or|of|to|in|is)\b')) AS INT) AS stop_hits,
        |  CAST(length(regexp_replace(text,'[^.,;:!?]','','g')) AS INT) AS n_punct,
        |  CAST(length(regexp_replace(text,'[^0-9]','','g')) AS INT) AS n_digits,
        |  len(regexp_extract_all(lower(text),'\S+')) AS n_tokens,
        |  length(text) AS n_chars
        | FROM documents)""".stripMargin,
    "q21_lang_id" ->
      """SELECT doc_id, lang,
        | CASE WHEN len(regexp_extract_all(text,'[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
        |      WHEN h_en = best AND best > 0 THEN 'en'
        |      WHEN h_de = best AND best > 0 THEN 'de'
        |      WHEN h_fr = best AND best > 0 THEN 'fr'
        |      WHEN h_es = best AND best > 0 THEN 'es'
        |      ELSE 'und' END AS lang_pred
        |FROM (SELECT *, greatest(h_en, h_de, h_fr, h_es) AS best
        |  FROM (SELECT doc_id, lang, text,
        |    len(regexp_extract_all(lower(text),'\b(the|and|of|to|is|in|that|it)\b')) AS h_en,
        |    len(regexp_extract_all(lower(text),'\b(der|die|und|das|ist|nicht|ein|zu)\b')) AS h_de,
        |    len(regexp_extract_all(lower(text),'\b(le|la|et|les|des|est|une|que)\b')) AS h_fr,
        |    len(regexp_extract_all(lower(text),'\b(el|los|las|es|una|que|para|por)\b')) AS h_es
        |   FROM documents))""".stripMargin,
    "q22_exact_dup_groups" ->
      """SELECT md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q23_jaccard_adjacent" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |             ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) sh
        |      FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1""".stripMargin,
    // snapshot diff: both engines build the same two deterministic views
    // and compare md5 fingerprints through a full outer join
    "q84_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, source AS src_old,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [draft]' ELSE text END) AS fp_old
        |  FROM documents WHERE doc_id % 13 <> 5),
        |new AS (SELECT doc_id, source AS src_new, md5(text) AS fp_new
        |  FROM documents WHERE doc_id % 13 <> 0)
        |SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
        |  coalesce(src_new, src_old) AS source,
        |  CASE WHEN fp_old IS NULL THEN 'added'
        |       WHEN fp_new IS NULL THEN 'removed'
        |       WHEN fp_old <> fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id""".stripMargin,
    // q26's pattern + the label-mismatch predicate; ties broken on the
    // ROUNDED similarity then neighbor id, identically on both sides
    "q83_hard_negatives" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS q_label,
        |             embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 25),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id, e.label AS neg_label,
        |        round(list_cosine_similarity(qv, e.embedding::DOUBLE[]),6) AS cos_sim
        |      FROM q, embeddings e
        |      WHERE e.vec_id <> q.query_id AND e.label <> q.q_label)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, neg_label, cos_sim
        |FROM (SELECT query_id, neighbor_id, neg_label, cos_sim, row_number() OVER
        |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rank
        |      FROM s) WHERE rank <= 3""".stripMargin,
    "q26_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |        round(list_cosine_similarity(qv, e.embedding::DOUBLE[]),6) AS cos_sim
        |      FROM q, embeddings e WHERE e.vec_id <> q.query_id)
        |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_sim
        |FROM (SELECT query_id, neighbor_id, cos_sim, row_number() OVER
        |        (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) rank
        |      FROM s) WHERE rank <= 5""".stripMargin,
    "q28_truncate_load" -> "SELECT * FROM orders",
    "q29_json_extract" ->
      """SELECT event_id, event_type,
        | CAST(json_extract_string(props,'$.k') AS INT) AS k_val
        |FROM events WHERE CAST(json_extract_string(props,'$.k') AS INT) > 50""".stripMargin,
    "q30_sessionize" ->
      """WITH g AS (SELECT user_id, ts, event_id,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        | CAST(sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |              THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q31_rollup" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        | count(*) AS n, CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY ROLLUP(event_type, day)""".stripMargin,
    "q32_set_ops" ->
      """SELECT custkey FROM (
        | SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
        | UNION
        | SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |EXCEPT SELECT c_custkey FROM customer WHERE c_acctbal < 0""".stripMargin,
    "q34_multimodal_stats" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
        | CAST(octet_length(text::BLOB) AS INT) AS n_bytes, md5(text) AS digest
        |FROM documents""".stripMargin,
    "q35_stream_window" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        | time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
        | event_type, count(*) AS n_events,
        |   CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // r8: append-mode parity — the file sink holds exactly the windows the
    // FINAL watermark (global max ts − 10 min delay) closed; windows still
    // open stay in state by design, so the batch oracle filters to closed
    "q48_stream_append" ->
      """WITH w AS (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
        |    time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS window_end,
        |    event_type, count(*) AS n_events,
        |   CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value
        |  FROM events GROUP BY 1, 2, 3),
        |mx AS (SELECT max(ts) AS m FROM events)
        |SELECT window_start, window_end, event_type, n_events, sum_value
        |FROM w, mx WHERE window_end <= m - INTERVAL '10 minutes'""".stripMargin,
    // r8: the export→csv→re-import roundtrip must reproduce the source
    // query's values exactly (q09's frame; cast back to its schema)
    "q37_export_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    // Structural contracts of the LSH cluster map (see
    // Pipeline.dupClustersLshAudit): fp_family_ok is "doc and its
    // fingerprint-min doc land in one cluster", q57_containment_ok is
    // "doc and its cluster representative land in one cluster". The
    // oracle spells both out through `reach` to DOCUMENT the relation,
    // but under its own transitive closure they are identities (always
    // true) — no independent recomputation happens here (see the
    // contract-boolean inventory). The check's force is one-sided: the
    // SPARK side evaluates the same relations against the LSH map, so a
    // map that splits a fingerprint family or tears a q57 cluster
    // hash-mismatches.
    "q58_dup_clusters_lsh" ->
      (dupClusterCte +
        """, cl AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id)
          |SELECT cd.doc_id,
          |  (cd.cluster_id = cf.cluster_id) AS fp_family_ok,
          |  (cd.cluster_id = cr.cluster_id) AS q57_containment_ok
          |FROM cl cd
          |JOIN fp ON fp.doc_id = cd.doc_id
          |JOIN mn USING (f)
          |JOIN cl cf ON cf.doc_id = mn.m
          |JOIN cl cr ON cr.doc_id = cd.cluster_id""".stripMargin),
    "q38_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |       c.ts AS asof_click_ts, c.event_id AS asof_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    "q39_percentiles" ->
      """SELECT o_orderpriority,
        | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        | round(min(o_totalprice), 2) AS p_min,
        | round(max(o_totalprice), 2) AS p_max
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q46_window_suite" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | CAST(rank() OVER w AS INT) AS rnk,
        | CAST(dense_rank() OVER w AS INT) AS drnk,
        | CAST(ntile(4) OVER w AS INT) AS quartile,
        | round(sum(o_totalprice) OVER
        |   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q47_correlated_subq" ->
      """SELECT c_custkey, c_name, c_acctbal AS acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin,
    "q45_aliased_projection" ->
      """SELECT o_orderkey AS 订单号, o_custkey AS 店铺, o_orderpriority AS sku,
        | strftime(o_orderdate, '%Y-%m-%d') AS 日期,
        | o_orderdate AS 创建日期, o_totalprice AS 总价格
        |FROM orders""".stripMargin,
    "q44_session_windows" -> sessionWindowsSql,
    // the STREAMING session_window run shares q44's batch session oracle,
    // filtered to the sessions the FINAL watermark closed (append mode
    // emits exactly those: session_end ≤ max(ts) − 10 min; staging is
    // ts-range-ordered so nothing is late) — q48's convention on the
    // session operator
    "q109_stream_sessions" ->
      (s"""WITH mx AS (SELECT max(ts) AS m FROM events)
          |SELECT b.* FROM ($sessionWindowsSql) b, mx
          |WHERE b.session_end <= mx.m - INTERVAL '10 minutes'""".stripMargin),
    // overlap coefficient |A∩B|/min(|A|,|B|) over the same shingle sets
    // as the q24 oracle; brute force is the spec, the engine's DF-capped
    // inverted index + exact verify must match it
    "q108_containment" ->
      // same inverted-index exactness argument as verifiedAllPairsCte:
      // count(*) over distinct-shingle postings = len(list_intersect),
      // zero-shared pairs can't reach overlap 0.9
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text),'\S+') toks FROM documents),
        |s AS (SELECT doc_id, list_distinct(
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks,' ')]
        |             ELSE list_transform(range(len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) sh
        |      FROM t),
        |sz AS (SELECT doc_id, len(sh) n FROM s),
        |inv AS (SELECT doc_id, unnest(sh) g FROM s),
        |c AS (SELECT a.doc_id id_a, b.doc_id id_b, count(*) shared
        |      FROM inv a JOIN inv b ON b.g = a.g AND b.doc_id > a.doc_id
        |      GROUP BY 1, 2),
        |p AS (SELECT id_a, id_b,
        |        CAST(shared AS DOUBLE) / least(sa.n, sb.n) ov
        |      FROM c JOIN sz sa ON sa.doc_id = c.id_a
        |             JOIN sz sb ON sb.doc_id = c.id_b)
        |SELECT id_a, id_b, ov AS overlap FROM p WHERE ov >= 0.9""".stripMargin,
    "q43_train_split" ->
      """WITH b AS (SELECT doc_id, text,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,4))::INT % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
        | count(*) AS n_docs,
        | CAST(sum(len(regexp_extract_all(lower(text),'\S+'))) AS BIGINT) AS n_tokens
        |FROM b GROUP BY 1""".stripMargin,
    "q40_pivot" ->
      """SELECT user_id % 5 AS cohort,
        | count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        | count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY 1""".stripMargin,
    "q141_trade_flows" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
        |               AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE s_nationkey <> c_nationkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "q142_brand_moments" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_items,
        |  round(corr(l_quantity, l_discount), 4) AS qty_disc_corr,
        |  round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar,
        |  round(stddev_samp(l_extendedprice), 4) AS price_stddev,
        |  round(avg(l_extendedprice), 4) AS price_mean
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1""".stripMargin,
    "q143_small_order_revenue" ->
      """WITH t AS (SELECT l_partkey AS t_partkey,
        |    round(avg(l_quantity) * 0.2, 4) AS qty_cut
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small_orders,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |             AS DOUBLE) / 700.0, 2) AS avg_yearly_lost
        |FROM lineitem JOIN t ON l_partkey = t_partkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity < qty_cut
        |GROUP BY 1""".stripMargin,
    "q144_large_volume_orders" ->
      """WITH b AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM orders JOIN b ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // the engine writes REAL RIFF/WAVE bytes per doc and parses them back;
    // the oracle recomputes the decoded aggregates from the closed-form
    // sample stream — a header/chunk/endianness bug on either side breaks
    // the exact integer match
    "q145_wav_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 200 + doc_id % 100 AS n,
        |      CASE WHEN doc_id % 2 = 0 THEN 16000 ELSE 8000 END AS rate
        |    FROM documents),
        |v AS (SELECT media_id, ((media_id*7919 + i*104729) % 65536) - 32768 AS val
        |      FROM s, unnest(range(0, n)) AS u(i)),
        |a AS (SELECT media_id, CAST(sum(val) AS BIGINT) sample_sum,
        |             CAST(sum(val*val) AS BIGINT) sample_sumsq,
        |             CAST(max(abs(val)) AS BIGINT) peak_abs
        |      FROM v GROUP BY 1)
        |SELECT s.media_id, CAST(44 + 2*n AS BIGINT) AS n_bytes,
        |  CAST(rate AS INT) AS sample_rate, CAST(n AS INT) AS n_samples,
        |  CAST(n * 1000000 // rate AS BIGINT) AS duration_us,
        |  sample_sum, sample_sumsq, peak_abs
        |FROM s JOIN a USING (media_id)""".stripMargin,
    "q146_bmp_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 4 + doc_id % 5 AS w,
        |      3 + doc_id % 4 AS h FROM documents),
        |p AS (SELECT media_id, (media_id + 31*x + 17*y) % 256 AS r,
        |             (media_id*3 + 7*x + 29*y) % 256 AS g,
        |             (media_id*5 + 13*x + 11*y) % 256 AS bb
        |      FROM s, unnest(range(0, w)) ux(x), unnest(range(0, h)) uy(y)),
        |a AS (SELECT media_id, CAST(sum(r) AS BIGINT) sum_r,
        |             CAST(sum(g) AS BIGINT) sum_g,
        |             CAST(sum(bb) AS BIGINT) sum_b FROM p GROUP BY 1)
        |SELECT s.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(54 + ((w*3 + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
        |  sum_r, sum_g, sum_b
        |FROM s JOIN a USING (media_id)""".stripMargin,
    // the engine writes real zlib-compressed PNGs (per-row filter cycling
    // through all five types) and decodes them back through CRC checks,
    // Inflater and unfiltering; the oracle recomputes the decoded pixel
    // aggregates closed-form — wsum is position-weighted so a transposed
    // pixel fails even when channel sums survive. Compressed length is
    // deflate-dependent and not compared; n_raw_bytes pins the
    // decompressed scanline size.
    "q153_png_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 4 + doc_id % 5 AS w,
        |      5 + doc_id % 4 AS h FROM documents),
        |p AS (SELECT media_id, y*w + x AS k,
        |        (media_id*7 + 11*x + 23*y) % 256 AS r,
        |        (media_id*13 + 5*x + 19*y) % 256 AS g,
        |        (media_id*17 + 3*x + 29*y) % 256 AS bb
        |      FROM s, unnest(range(0, w)) ux(x), unnest(range(0, h)) uy(y)),
        |a AS (SELECT media_id, CAST(sum(r) AS BIGINT) sum_r,
        |             CAST(sum(g) AS BIGINT) sum_g,
        |             CAST(sum(bb) AS BIGINT) sum_b,
        |             CAST(sum((k+1) * (r*65536 + g*256 + bb)) AS BIGINT) AS wsum
        |      FROM p GROUP BY 1)
        |SELECT s.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(h * (1 + 3*w) AS BIGINT) AS n_raw_bytes,
        |  sum_r, sum_g, sum_b, wsum
        |FROM s JOIN a USING (media_id)""".stripMargin,
    // the engine writes real baseline-JPEG bytes (DCT + canonical Huffman
    // + 4:2:0 + restart markers) and decodes them back through the
    // general baseline path; frames are flat per 8×8 luma block / 16×16
    // chroma cell, so the lossy pipeline is EXACT (DC quantizer 8 — see
    // Multimodal.Jpeg) and the oracle recomputes the decoded aggregates
    // closed-form. wsum_y is position-weighted (q153's convention); the
    // entropy-coded byte length is table-dependent and not compared.
    "q155_jpeg_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 8 + 4*(doc_id % 5) AS w,
        |      8 + 8*(doc_id % 3) AS h FROM documents),
        |p AS (SELECT media_id, y*w + x AS k,
        |        (media_id*7 + 31*(x//8) + 17*(y//8)) % 256 AS yv,
        |        (media_id*11 + 13*(x//16) + 7*(y//16)) % 256 AS cb,
        |        (media_id*5 + 3*(x//16) + 29*(y//16)) % 256 AS cr
        |      FROM s, unnest(range(0, w)) ux(x), unnest(range(0, h)) uy(y)),
        |a AS (SELECT media_id, CAST(sum(yv) AS BIGINT) sum_y,
        |             CAST(sum(cb) AS BIGINT) sum_cb,
        |             CAST(sum(cr) AS BIGINT) sum_cr,
        |             CAST(sum((k+1) * yv) AS BIGINT) AS wsum_y
        |      FROM p GROUP BY 1)
        |SELECT s.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(((w + 15)//16) * ((h + 15)//16) AS BIGINT) AS n_mcus,
        |  sum_y, sum_cb, sum_cr, wsum_y
        |FROM s JOIN a USING (media_id)""".stripMargin,
    // the engine writes real GIF87a bytes (global color table + variable-
    // width LZW with clear/EOI, width growth and sub-block chunking) and
    // LZW-decodes them back; the oracle recomputes the palette-expanded
    // pixel aggregates closed-form — wsum is position-weighted (q153's
    // convention). The LZW-coded length is match-order-dependent and not
    // compared.
    "q156_gif_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 4 + doc_id % 5 AS w,
        |      5 + doc_id % 4 AS h FROM documents),
        |p AS (SELECT media_id, y*w + x AS k, (media_id + 5*x + 7*y) % 16 AS j
        |      FROM s, unnest(range(0, w)) ux(x), unnest(range(0, h)) uy(y)),
        |c AS (SELECT media_id, k, (media_id*3 + j*17) % 256 AS r,
        |        (media_id*7 + j*23) % 256 AS g, (media_id*11 + j*29) % 256 AS bb
        |      FROM p),
        |a AS (SELECT media_id, CAST(sum(r) AS BIGINT) sum_r,
        |             CAST(sum(g) AS BIGINT) sum_g,
        |             CAST(sum(bb) AS BIGINT) sum_b,
        |             CAST(sum((k+1) * (r*65536 + g*256 + bb)) AS BIGINT) AS wsum
        |      FROM c GROUP BY 1)
        |SELECT s.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  sum_r, sum_g, sum_b, wsum
        |FROM s JOIN a USING (media_id)""".stripMargin,
    // the engine writes real G.711 μ-law/A-law WAV bytes and expands them
    // to linear PCM16; the oracle recomputes the ITU-T G.711 expansion
    // closed-form per byte (μ: complement → (mantissa·8+132)·2^exp − 132;
    // A: XOR 0x55 → segment expansion, inverted sign bit) — exact-integer
    // sums, so one wrong table entry or sign fails the hash
    "q157_g711_decode" ->
      """WITH s AS (SELECT doc_id AS media_id, 200 + doc_id % 101 AS n,
        |      CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 6 END AS tag
        |    FROM documents),
        |b AS (SELECT media_id, tag, (media_id*7919 + i*104729) % 256 AS bv
        |      FROM s, unnest(range(0, n)) AS u(i)),
        |e AS (SELECT media_id,
        |        CASE WHEN tag = 7 THEN
        |          CASE WHEN 255 - bv >= 128 THEN -1 ELSE 1 END *
        |          ((((255 - bv) % 16) * 8 + 132)
        |           * (1 << (((255 - bv) // 16) % 8)) - 132)
        |        ELSE
        |          CASE WHEN xor(bv, 85) >= 128 THEN 1 ELSE -1 END *
        |          CASE WHEN (xor(bv, 85) // 16) % 8 = 0
        |               THEN (xor(bv, 85) % 16) * 16 + 8
        |               ELSE ((xor(bv, 85) % 16) * 16 + 264)
        |                    * (1 << ((xor(bv, 85) // 16) % 8 - 1)) END
        |        END AS val
        |      FROM b),
        |a AS (SELECT media_id, CAST(sum(val) AS BIGINT) sample_sum,
        |             CAST(sum(val*val) AS BIGINT) sample_sumsq,
        |             CAST(max(abs(val)) AS BIGINT) peak_abs
        |      FROM e GROUP BY 1)
        |SELECT s.media_id, CAST(tag AS INT) AS fmt_tag,
        |  CAST(46 + n + n % 2 AS BIGINT) AS n_bytes,
        |  CAST(8000 AS INT) AS sample_rate, CAST(n AS INT) AS n_samples,
        |  sample_sum, sample_sumsq, peak_abs
        |FROM s JOIN a USING (media_id)""".stripMargin,
    // incremental embedding admission (q64's convention on the vector
    // table): DuckDB brute-forces increment × corpus cosine at the same
    // 0.9 bar, so both the planted rejections (recall — identical vectors
    // must collide in every LSH table) and the natural admissions
    // (precision — corpus cross-pairs top out at ≈ 0.51) are checked as
    // values; max-cos is −1.0 for admitted rows so the double compares
    // exactly (planted hits are exact copies: cosine 1.0 in both engines)
    "q154_incremental_embedding" -> incEmbeddingOracle,
    // identical admission contract, streamed per micro-batch against the
    // same stored bucket table — one oracle, two query paths (the
    // q65/q74/q82 convention on the vector side)
    "q159_stream_embedding_admission" -> incEmbeddingOracle,
  )

  private lazy val incEmbeddingOracle: String =
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4),
        |inc AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4
        |  UNION ALL
        |  SELECT vec_id + (SELECT max(vec_id) + 1 FROM embeddings), embedding
        |  FROM embeddings WHERE vec_id % 5 <> 4 AND vec_id % 25 = 0),
        |m AS (
        |  SELECT i.vec_id, CAST(count(*) AS BIGINT) AS n,
        |    max(CAST(list_cosine_similarity(c.embedding, i.embedding)
        |             AS DOUBLE)) AS mx
        |  FROM inc i JOIN corpus c
        |    ON list_cosine_similarity(c.embedding, i.embedding) >= 0.9
        |  GROUP BY 1)
        |SELECT i.vec_id,
        |  coalesce(m.n, 0) AS n_corpus_dups,
        |  coalesce(m.n, 0) > 0 AS is_near_dup,
        |  coalesce(m.n, 0) = 0 AS admit,
        |  round(coalesce(m.mx, -1.0), 4) AS max_corpus_cos
        |FROM inc i LEFT JOIN m USING (vec_id)""".stripMargin
}
