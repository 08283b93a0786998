package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shuffle budget regression guard: at 100 TB the shuffle count is the
  * scarce resource, so the minimal counts observed at round 1 (see
  * graft.ShuffleAudit, AQE off) are pinned as ceilings. A refactor that
  * adds an Exchange to a flagship query fails here, not in production.
  */
class ShuffleAuditSpec extends SparkSpec {

  private def shuffles(name: String): Int = {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan
      .collect { case e: ShuffleExchangeExec => e }.size
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  // exact pins: agg+sort pipelines shuffle once per re-key, never more
  private val pinned = Map(
    "q01_wordcount" -> 2,      // groupBy(word) + orderBy
    "q03_grep" -> 1,           // orderBy only (filter is scan-local)
    "q04_topk_words" -> 1,     // groupBy; top-k is TakeOrdered, no sort shuffle
    "q08_global_agg" -> 1,     // partial agg → single-partition final
    "q09_pricing_summary" -> 2,
    "q20_rank_window" -> 2,    // r11 TopKRows hash agg (<=3 pairs per
                               // group per partition cross the exchange
                               // — no window, no per-group sort) + orderBy
    "q35_embedding_neardup" -> 1, // broadcast pair-join; orderBy only
    "q40_asof_join" -> 2,      // union re-key by user + orderBy
    "q44_sessionize" -> 2,     // ONE shuffle by user_id serves window AND
                               // groupBy(user_id, sid) (subset rule) + orderBy
    "q47_range_frame" -> 2,
    "q57_lm_xent" -> 5,    // explode-agg + vocab agg + un-hinted vocab join
                           // (shuffle-join worst case re-keys the compacted
                           // (doc_id, word, c) aggregate) + groupBy(doc_id)
                           // + orderBy; AQE broadcasts the vocab side at
                           // test SFs, removing the join exchange
    "q69_window_nav" -> 2, // ONE o_custkey window exchange serves all four
                           // navigation functions + orderBy
    "q70_sliding_window" -> 2, // TimeWindowing explode is scan-local; one
                               // (window, event_type) agg + orderBy
    "q73_approx_percentiles" -> 2, // GK sketch partial+final + orderBy
    "q60_bm25" -> 2,       // corpus stats agg only; scoring is scan-local,
                           // top-20 is TakeOrdered (no sort shuffle)
    "q61_length_outliers" -> 2, // per-lang band agg + output sort; the
                                // flagging join is broadcast
    "q62_funnel" -> 2,     // r11 auto-routed: the uniform fixture takes
                           // the DENSE fold (user collect + orderBy);
                           // the chunked twin is pinned below
    "q76_theta_rank_join" -> 5, // ONE data shuffle (bucket window) + orderBy;
                                // the other exchanges move only the ≤nBuckets
                                // prefix rows (bucket agg + bounded global
                                // window); the nested-loop q19 form this
                                // replaces at scale shuffles less but
                                // compares O(|L|x|R|) pairs
    "q77_theta_agg_join" -> 5,  // same bucket shape as q76: the running SUM
                                // rides the SAME window exchange as the count
    "q78_theta_band_join" -> 5, // and the inclusive-op running MIN/MAX too —
                                // op variants change sort order, not exchanges
    "q54_repetition_filter" -> 2, // the whole computation is ONE codegen
                                  // projection over the scan (native
                                  // bigram_hash_stats + has_min_words gate);
                                  // hash repartition + range sort only
    "q55_boilerplate_ngrams" -> 3, // native word_ngrams Generate over the
                                   // scan; COUNT(DISTINCT doc_id) is a
                                   // two-phase agg — (shingle, doc_id)
                                   // dedup exchange then (shingle) —
                                   // + orderBy
    "q83_dup_spans" -> 5, // q55's two COUNT(DISTINCT) exchanges + the
                          // positions side re-keyed on shingle for the
                          // un-hinted join (flagged side reuses its agg
                          // partitioning) + ONE doc_id exchange serving
                          // window AND groupBy(doc_id, island) + orderBy
    "q84_span_cut" -> 6,  // q83's first three exchanges + covered-set
                          // groupBy(doc_id) + the docs side of the left
                          // join (covered side reuses its agg
                          // partitioning) + orderBy
    "q85_pivot" -> 4,     // orders⋈customer SMJ re-keys (2, AQE may
                          // broadcast at test SFs) + ONE pivot hash agg
                          // (explicit value list → no distinct-values
                          // job) + orderBy; nation is broadcast
    "q86_unpivot" -> 2,   // ONE flag agg; unpivot is an Expand inside
                          // the scan stage (zero shuffle) + orderBy
    "q87_ann_pq" -> 3,    // codes scan + broadcast ADC join shuffle
                          // NOTHING; one qid exchange for the bounded
                          // candidate TopKPairs agg, one for the (tiny)
                          // re-rank agg, + the output orderBy
    "q88_ann_ivfpq" -> 3, // same three: the cell-pruned broadcast join
                          // adds no exchange
    "q89_zorder" -> 1,    // scan → one codegen'd projection → the
                          // total-order range exchange; the interleave
                          // itself shuffles nothing
    "q90_merge_upsert" -> 3, // changes ∪ (base ▷ changes): the un-hinted
                             // anti join broadcasts at test SFs (1 orderBy
                             // exchange); budget leaves room for the
                             // shuffled-anti shape AQE picks at scale
                             // (both sides re-key on k)
    "q91_gapfill" -> 3,   // daily agg keys (user_id, day); spine agg +
                          // left join + BOTH windows re-key on user_id
                          // and share ONE exchange (subset rule) + orderBy
    "q92_fuzzy_join" -> 2, // deletion-key self-join (one exchange pair
                           // collapses: both sides same frame) at test SF
                           // broadcasts; candidate distinct + orderBy
    "q93_decontam_bloom" -> 6, // bench distinct + bloom agg feed the
                               // filter; train (doc_id, sh) dedup +
                               // doc_id counts + candidate verify join +
                               // n_hit agg + orderBy — the bloom prefilter
                               // itself is scan-local (zero exchanges)
    "q94_token_pack" -> 4, // ONE shard window exchange + shard totals agg
                           // (the serial prefix scan is over #shards rows)
                           // + offsets join back + orderBy
    "q95_stats_agg" -> 2,  // all five moments ride ONE partial+final hash
                           // agg (single-pass DeclarativeAggregates)
                           // + orderBy
    "q96_cdc_compact" -> 4, // ONE k-keyed window exchange + orderBy at
                            // test SFs (anti join broadcasts); headroom
                            // for the shuffled-anti shape at scale
    "q97_cms_heavy_hitters" -> 2, // exact top-10 rides ONE word agg
                                  // (top-k is TakeOrdered); the CMS build
                                  // is a separate sketch-merge job with
                                  // zero exchanges
    "q99_table_checksum" -> 2, // commutative folds ride ONE partial+final
                               // source agg (map-side exact on any
                               // partitioning — that's the point) + orderBy
    "q100_setsim_join" -> 4, // r11 post-checkpoint plan (q48 rule): the
                             // doc-set agg materializes at the
                             // localCheckpoint cut; downstream = freq
                             // agg + the candidate sh-join re-keys +
                             // orderBy; verify is scan-local
                             // array_intersect (no intersection agg,
                             // no size-table joins, no dedup exchange
                             // — collect_set dedups in-aggregate)
    "q101_incremental_agg" -> 4, // state agg + delta agg exchanges (the
                                 // split scans), the key-wise merge agg
                                 // reuses their partitioning at test SF
                                 // (headroom for a re-key) + orderBy
    "q102_chunk_overlap" -> 1, // the chunk flatten (tokenize → sequence
                               // → posexplode → slice) is entirely
                               // scan-local; orderBy only
    "q103_kl_divergence" -> 4, // linear chain: ONE data-sized
                               // (source, word) agg + the word-keyed
                               // window re-key + the per-source fold;
                               // the corpus-total window + orderBy ride
                               // the #sources-row tail (single tiny
                               // exchange) — no branch re-reads the
                               // aggregate, so no exchange-reuse bet
    "q104_fuzzy_join_lev2" -> 2, // q92's shape at depth 2: the key
                                 // self-join collapses/broadcasts at
                                 // test SF; candidate distinct + orderBy
    "q105_profile" -> 5,   // r12: two tag-unioned value-keyed aggregates
                           // (string cols; numeric cols) + their
                           // |columns|-keyed rollups + orderBy — every
                           // exchange moves per-task-NDV-sized rows.
                           // Replaced the 2-exchange Expand rewrite
                           // whose map side pushed 5× the scan through
                           // ONE wide-key hash agg (measured: a single
                           // 6.2 s task at sf0.1)
    "q106_retention" -> 3, // ONE user-keyed collect_set exchange (the
                           // only data-sized one), the matrix-sized
                           // (cohort, week) agg + orderBy
    "q107_transitions" -> 4, // r11 auto-routed dense: ONE event-sized
                             // user lag window; the (src, dst) agg +
                             // prob/rank windows + orderBy move
                             // |event types|^2 rows only
    "q108_ohlc" -> 2,      // min_by/max_by keep OHLC inside ONE hash
                           // agg exchange (no window sort) + orderBy
    "q109_winnow" -> 1,    // r12: the winnow_fps kernel computes each
                           // doc's distinct fingerprint set inside the
                           // scan task — the gram explode, doc window,
                           // DISTINCT, and digest agg all disappeared;
                           // orderBy is the only exchange left
    "q110_bpe_pairs" -> 1, // pair keyspace <= 26^2: map-side partials
                           // collapse before ONE exchange; top-100 is
                           // TakeOrdered, no sort shuffle
    "q117_triangles" -> 5, // r12 pin: per-order collect_set + scan-local
                           // posexplode pair fan-out (the old DISTINCT +
                           // ok-keyed self-join re-exchanged the table
                           // twice more); then edge distinct, deg agg,
                           // the two deg attaches, node agg — top-20 is
                           // TakeOrdered (exchanges behind the two
                           // localCheckpoint cuts are counted by their
                           // own segments, not here)
    "q114_contain_join" -> 4, // r11 post-checkpoint plan (q100's
                              // restructure one-sided): freq agg +
                              // candidate re-keys + orderBy; verify is
                              // scan-local array_intersect, dedup rides
                              // the checkpointed collect_set agg
    "q115_rolling_median" -> 2, // r11 auto-routed dense: ONE user
                                // frame-window exchange (<=7-element
                                // frames scan-local) + orderBy
    "q111_histogram" -> 3, // 1-row bounds agg (broadcast back) + the
                           // <=20-key histogram agg + orderBy; bucket
                           // math is scan-local integer arithmetic
    "q112_ewma" -> 2,      // r11 auto-routed dense: ONE user collect
                           // exchange (flat fold scan-local) + orderBy
    "q113_char_entropy" -> 1, // no explode, no agg: one scan-local
                              // entropy_sum kernel pass (r12 — was 26
                              // replace-counts + an interpreted HOF
                              // fold) — orderBy is the only exchange
    "q98_interval_join" -> 4, // distinct-users agg + the bucketized
                              // equi-join at test SFs broadcasts the
                              // interval-days side (headroom for the
                              // shuffled shape) + the (user, lo) agg
                              // + orderBy; the day fan-out is scan-local
    "q119_pmi_collocations" -> 2, // pair flatten is scan-local; ONE
                                  // vocab²-keyed pair agg, then the
                                  // marginal/total WINDOW sums ride one
                                  // vocab²-sized exchange (the 3-branch
                                  // re-agg join form measured 8)
    "q120_vocab_coverage" -> 2,   // unigram agg + the vocab-sized
                                  // single-partition rank/cumsum window
                                  // (dimension-sized by design)
    "q121_mad_outliers" -> 3,     // two #sources-row percentile aggs
                                  // (med, then MAD) + orderBy; both stat
                                  // joins broadcast the source dimension
    "q122_neardup_matrix" -> 5,   // q26's pair pipeline with source
                                  // RIDING the keys (no doc→source join
                                  // after pair generation) + the
                                  // ≤|sources|² matrix agg + orderBy
    "q123_snapshot_diff" -> 3,    // ONE key-keyed full-outer join (each
                                  // snapshot hashes once — the minimal
                                  // movement any diff needs) + orderBy;
                                  // classify/compare are scan-local
    "q124_skyline" -> 2,          // distinct-point agg + ONE sort shared
                                  // by both dominance range frames (the
                                  // NOT EXISTS oracle form is O(n²) and
                                  // never runs here)
    "q125_quantile_binning" -> 3, // 1-row decile agg broadcast back +
                                  // the ≤10-key bin stats agg + orderBy;
                                  // assignment is a scan-local array
                                  // filter-count
    "q126_threshold_curve" -> 5,  // ONE τ=0.5 pair pipeline; the sweep
                                  // is a scan-local ≤10-literal fan-out
                                  // into a ≤10-key agg — ten thresholds
                                  // never cost ten pair joins
    "q127_cluster_sizes" -> 3,    // post-checkpoint plan: the two
                                  // histogram aggs (component- then
                                  // size-count-sized) + orderBy; the
                                  // pair/components stages are cut by
                                  // localCheckpoint like q48
    "q128_embed_cov" -> 1,        // r12: ONE GramMatrix typed aggregate
                                  // (each map partition ships a single
                                  // (n, Σxᵢ, Σxᵢxⱼ) buffer) replaces the
                                  // 3-branch explode/hash-agg plan; the
                                  // 2,080 output rows are generated from
                                  // the 1-row state, already single-
                                  // partition, so even the orderBy needs
                                  // no exchange
    "q129_fk_audit" -> 5,         // key-sized FK agg + its dim join +
                                  // the uniqueness key agg + the three
                                  // 1-row check aggs' exchanges +
                                  // 3-row orderBy; fact rows never
                                  // reach a join
    "q130_acf" -> 2,              // ONE date agg is the only corpus-
                                  // sized exchange; the days-sized
                                  // series folds to one array row and
                                  // all 7 lags are scan-local slices
    "q131_cooccur_lift" -> 5,     // ONE user-keyed set agg (check-
                                  // pointed — three consumers, one
                                  // corpus scan) + k²-key pair agg +
                                  // k-key marginal agg + 1-row count +
                                  // orderBy; marginals attach via
                                  // broadcast
    "q132_leakage_split" -> 2,    // post-checkpoint plan like q48: the
                                  // doc-keyed label left-join + orderBy;
                                  // pair/components stages cut by
                                  // localCheckpoint
    "q133_psi_drift" -> 4,        // decile agg + source-keyed grid agg
                                  // (10 conditional sums → complete
                                  // grid, no grid join) + 1-row corpus
                                  // fold + orderBy; totals broadcast
    "q134_rank_fusion" -> 1,      // ONE corpus exchange (the term agg);
                                  // both rankings end in TakeOrdered,
                                  // and the rank windows + full join +
                                  // final top-20 run on 50-row frames
    "q135_quantile_norm" -> 3,    // source-keyed rank window + rank agg
                                  // + the rank-keyed join re-key; the
                                  // output sort rides TakeOrdered-free
                                  // range partitioning counted in the 3
    "q136_padding_waste" -> 2,    // scan-local token count + bucket id;
                                  // ONE log-bounded-key agg + orderBy
    "q137_weighted_sample" -> 5,  // q94's two-level prefix shape: shard
                                  // window + shard-offset agg + its
                                  // tiny serial window + the offs join
                                  // + orderBy; total is a broadcast
    "q138_kappa" -> 2,            // q28's doc-keyed marker agg + ONE
                                  // 1-row global conditional-sum agg —
                                  // the contingency matrix is never
                                  // materialized
    "q139_centroid_sim" -> 4,     // ONE corpus exchange (the 640-key
                                  // (label,dim) mean, checkpointed for
                                  // its three consumers) + norm agg +
                                  // dim-keyed centroid self-join agg +
                                  // orderBy; norms attach by broadcast
    "q140_mixture_alloc" -> 3,    // ONE source-keyed token agg (count
                                  // scan-local, map-side folded) + the
                                  // 1-row normalizer agg + orderBy on
                                  // the #sources-row recipe table
    "q141_curriculum" -> 4,       // source-keyed rank window + the
                                  // sources dim distinct + its tiny
                                  // global index window; pos is a
                                  // FORMULA — no global data window,
                                  // top-100 is TakeOrdered
    "q142_window_funnel" -> 3,    // r11 auto-routed dense: ONE
                                  // event-sized user collect (clock
                                  // fold scan-local) + the ≤4-row
                                  // report agg + its cum window/sort
    "q143_user_growth" -> 3,      // user-keyed min agg + day-keyed
                                  // count + the DAYS-sized running
                                  // sum (calendar-bounded, q130
                                  // posture)
    "q144_gini" -> 2,             // ONE source-keyed rank window whose
                                  // partitioning the source agg reuses
                                  // (subset rule) + orderBy on
                                  // #sources rows
    "q145_cluster_cap" -> 3,      // label join + cluster-keyed rank
                                  // window + orderBy; the q48 pair
                                  // pipeline is behind its checkpoint
    "q146_zipf" -> 1,             // word agg only: top-100 is
                                  // TakeOrdered, the rank window and
                                  // regression run on a 100-row frame
    "q147_stickiness" -> 4,       // (user, day) distinct + the ONE
                                  // Expand-based multi-distinct agg
                                  // (2 exchanges) over the ≤7× cover
                                  // table + orderBy — no DAU⋈WAU join,
                                  // never a range self-join
    "q148_burstiness" -> 3,       // (word, doc) count + word-keyed
                                  // moment fold + orderBy on 20 rows;
                                  // top-20 is TakeOrdered, corpus size
                                  // attaches by 1-row broadcast
    "q149_auc" -> 2,              // ONE value-keyed agg touches the
                                  // corpus; the rank-sum window + the
                                  // final fold run on the score-value
                                  // histogram (no global row sort, no
                                  // pos x neg pairs)
    "q150_ks_test" -> 2,          // same histogram posture: one value-
                                  // keyed conditional-count agg + the
                                  // CDF windows/argmax on the value
                                  // histogram
    "q151_jw_vocab" -> 2,         // vocab distinct + orderBy; the
                                  // conditioned self-join broadcasts
                                  // the vocab-sized side, and the JW
                                  // kernel runs inside codegen
    "q152_changepoint" -> 2,      // ONE date agg touches the corpus;
                                  // CUSUM windows + argmax run on the
                                  // calendar-bounded day series
    "q153_benford" -> 2,          // digit extraction scan-local into
                                  // ONE 9-key agg; all double math on
                                  // the 9-row digit table
    "q154_seq_pattern" -> 3,      // r11 auto-routed dense: ONE
                                  // event-sized user exchange builds
                                  // code strings; ≤2-key final agg +
                                  // orderBy
    "q155_scd2" -> 2,             // r11 auto-routed dense: ONE user
                                  // exchange serves lag + post-filter
                                  // row_number/lead (subset rule) +
                                  // orderBy
    "q156_bad_records" -> 2,      // mangle + PERMISSIVE parse are
                                  // scan-local; ONE |types|-keyed agg
                                  // with map-side partials + orderBy
    "q157_ab_test" -> 3)          // user-keyed conversion fold + the
                                  // 2-key variant agg + the 1-row
                                  // z-combine; all double math on 2
                                  // rows

  pinned.foreach { case (name, budget) =>
    test(s"$name stays within its $budget-shuffle budget") {
      val got = shuffles(name)
      assert(got <= budget, s"$name now shuffles $got times (budget $budget)")
    }
  }

  // The skew (chunked) twins no longer run on the uniform fixture —
  // routeBySkew picks the dense plan there — so their budgets are
  // pinned on the library functions directly (r10-measured values):
  // each chunked form keeps exactly ONE event-sized exchange, the
  // (user, day) keyed one; everything else moves user-DAY rows.
  private def shufflesOf(df: org.apache.spark.sql.DataFrame): Int = {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
      .collect { case e: ShuffleExchangeExec => e }.size
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }
  private lazy val chunkedDelta = 3L * 24 * 3600 * 1000000
  private lazy val chunkedPinned: Seq[(String, Int,
      org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] =
    Seq(
      ("sessionizeChunked", 6, graft.operators.Advanced.sessionizeChunked),
      ("funnelDepthChunked", 3, graft.operators.Advanced.funnelDepthChunked),
      ("funnelDepthsChunked", 2,
        graft.operators.Advanced.funnelDepthsChunked(_, chunkedDelta)),
      ("transitionsChunked", 6, graft.operators.Advanced.transitionsChunked),
      ("ewmaChunked", 3, graft.operators.Advanced.ewmaChunked),
      ("rollingMedianChunked", 4,
        graft.operators.Advanced.rollingMedianChunked),
      ("twapChunked", 5, graft.operators.Advanced.twapChunked),
      ("seqPatternChunked", 4, graft.operators.Advanced.seqPatternChunked),
      ("scd2Chunked", 6, graft.operators.Advanced.scd2Chunked))

  chunkedPinned.foreach { case (name, budget, fn) =>
    test(s"$name (skew path) stays within its $budget-shuffle budget") {
      val got = shufflesOf(fn(Tables.events(spark, sf0001)))
      assert(got <= budget, s"$name now shuffles $got times (budget $budget)")
    }
  }

  test("no registered query exceeds 6 shuffles (suite-wide ceiling)") {
    val over = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = shuffles(name)
      if (n > 6) Some(s"$name=$n") else None
    }
    assert(over.isEmpty, s"over budget: ${over.mkString(", ")}")
  }
}
