package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: pin the properties that make these
  * queries scale (pushdown, broadcast, codegen) so a refactor that silently
  * loses one fails CI, not the 100 TB run.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir).queryExecution.executedPlan.toString

  test("s3_pruned_scan pushes the ts range into the parquet scan") {
    val p = plan("s3_pruned_scan")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts range must reach the scan:\n$p")
  }

  test("q3 star join broadcasts the nation dim and scans minimal columns") {
    val p = plan("q3_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      s"lineitem scan must be pruned to 3 columns:\n$p")
  }

  test("a1 flagship aggregates with partial+final hash aggregation") {
    val p = plan("a1_daily_counts")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final agg:\n$p")
  }

  test("j2 anti-join stays a join, not a driver-side set difference") {
    val p = plan("j2_id_anti")
    assert(p.contains("LeftAnti"), s"expected anti-join:\n$p")
  }

  test("q6 pushes every predicate into the parquet scan") {
    val p = SparkEntry.queries("q6_forecast_revenue")(spark, TestSpark.sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
      "LessThan(l_quantity,24.0)").foreach { f =>
      assert(p.contains(f), s"predicate $f must reach the scan:\n$p")
    }
  }

  test("q4 correlated EXISTS plans as a left-semi join") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), s"expected semi-join:\n$p")
  }

  test("q19 pushes the whole OR-of-ANDs disjunction into both scans") {
    val p = SparkEntry.queries("q19_disjunctive_pred")(spark, TestSpark.sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      s"quantity bands must reach the lineitem scan:\n$p")
    assert(p.contains("Or(Or(And(EqualTo(p_brand,Brand#12)"),
      s"brand/size bands must reach the part scan:\n$p")
  }

  test("q10 top-20 plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("stratified sample limits rows per group before the shuffle (WindowGroupLimit)") {
    val p = plan("x_stratified_sample")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final group-limit so only <=100 rows/group shuffle:\n$p")
  }

  test("k2 hive-layout read prunes to the one matching partition directory") {
    val p = plan("k2_partition_pruned_read")
    assert(p.contains("PartitionFilters") && p.contains("2024-01-05"),
      s"day predicate must prune partition directories, not filter rows:\n$p")
  }

  test("s2 catalog-table read prunes partitions through the recovered catalog") {
    val p = plan("s2_catalog_scan")
    assert(p.contains("PartitionFilters") && p.contains("2024-01-10"),
      s"catalog read must prune recovered partition directories, not filter rows:\n$p")
  }

  test("j12 bloom pre-filter is the native might_contain expression, not a Scala UDF") {
    val p = plan("j12_bloom_anti")
    assert(!p.contains("UDF"), s"bloom probe must not be a ScalaUDF (breaks codegen):\n$p")
    assert(p.contains("might_contain"), s"expected native BloomFilterMightContain:\n$p")
  }

  test("q11 aggregates lineitem once: the per-part value table is cached and reused") {
    val p = plan("q11_important_values")
    assert(p.contains("InMemoryTableScan"),
      s"v must be cached so the global-total pass reuses it:\n$p")
  }

  test("simhash signatures are a pure projection: no explode, no aggregate") {
    val sigs = graft.ext.Dedup.simhashSignatures(
      graft.sources.Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id", "text")
    val p = sigs.queryExecution.executedPlan.toString
    assert(!p.contains("Generate") && !p.contains("HashAggregate"),
      s"signature build must stay map-shaped:\n$p")
  }

  test("q1 aggregates with map-side partial aggregation before the one exchange") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final agg:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"one semantic shuffle (the group-by) expected:\n$p")
  }

  test("q21 plans the exists/not-exists pair as semi + anti joins, never subquery re-scans per row") {
    val p = plan("q21_sole_failing_supplier")
    assert(p.contains("LeftSemi"), s"EXISTS must be a semi-join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must be an anti-join:\n$p")
  }

  test("k6 ORC read-back pushes the day filter into the ORC scan") {
    val p = plan("k6_orc_roundtrip")
    assert(p.contains("Format: ORC") || p.contains("orc"), s"expected an ORC scan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(day), GreaterThanOrEqual(day,2024-01-10)]"),
      s"day range must reach the ORC reader (stripe stats pruning):\n$p")
  }

  test("k10 clustered read pushes the value range into the parquet scan") {
    val p = plan("k10_clustered_write")
    assert(p.contains("GreaterThanOrEqual(value,40.0)") && p.contains("LessThan(value,60.0)"),
      s"value range must reach the scan so file stats can skip row groups:\n$p")
  }

  test("x_seq_packing never plans a single-partition window (distributed prefix-sum)") {
    val df = SparkEntry.queries("x_seq_packing")(spark, TestSpark.sfDir)
    import org.apache.spark.sql.catalyst.plans.logical
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the token-offset cumsum must be partitioned by prefix bucket, not global")
  }

  test("no declared query in the bounded-grid window family plans an UNKEYED WindowExec") {
    // Windows over bounded grids (day tables, count histograms, top-K
    // lists) are keyed on a constant partition — explicit intent, and the
    // pin below means an UNBOUNDED input can never silently serialize
    // through an unkeyed global window (it would have to be added without
    // a partitionSpec, which this test rejects).
    import org.apache.spark.sql.catalyst.plans.logical
    val boundedGridWindowQueries = Seq(
      "w2_moving_avg", "x_skyline", "x_cochran_q", "x_psm_att",
      "x_quantile_norm", "x_mannwhitney", "x_kruskal_wallis", "x_mcnemar",
      "x_zipf_fit", "x_theilsen", "x_vocab_coverage", "x_gini", "x_ks_test",
      "x_auc", "x_sprt", "x_binseg", "x_anomaly_iqr", "x_gains_table",
      "x_outlier_mad", "x_rolling_corr", "x_uplift_tlearner", "x_rake_keywords")
    boundedGridWindowQueries.foreach { name =>
      val df = SparkEntry.queries(name)(spark, TestSpark.sfDir)
      val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$name plans a window with an empty partitionSpec — key bounded-grid " +
          "windows on a constant partition (or a real key) instead")
    }
  }

  test("x_decontaminate probes the benchmark grams with a broadcast join (corpus never shuffles)") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
    import org.apache.spark.sql.functions.col
    val p = graft.ext.Decontaminate.contaminatedDocs(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0),
      "doc_id", "text", n = 4).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"gram probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the corpus side must not sort-merge for candidates:\n$p")
  }

  test("native cosine expression generates its fused loop inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(graft.functions.VectorFunctions.cosine(col("embedding"), col("embedding")).as("c"))
    val gen = org.apache.spark.sql.execution.debug.codegenStringSeq(df.queryExecution.executedPlan)
    // locals are freshName'd (<prefix>_na_N) so two instances can share a
    // generated method — match the fused-loop shape, not a fixed name
    assert(gen.exists(g => g._2.contains("Math.sqrt(") && g._2.contains("_na_") && g._2.contains("_nb_")),
      "expected the fused dot/norm loop in generated code")
  }

  test("x_boilerplate probes the hot-segment set with a broadcast join (corpus never shuffles)") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text")
    val p = graft.ext.Scrub.removeBoilerplate(docs, "doc_id", "text", m = 4, minDf = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"hot-set probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the corpus side must not sort-merge:\n$p")
  }

  test("pii redaction, winnowing and entropy are pure projections: no Exchange") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
    val projections = Seq(
      graft.ext.Scrub.redactPii(docs, "text"),
      docs.select(graft.functions.TextFunctions.winnowFingerprints(col("text"), 3, 4)),
      docs.select(graft.functions.TextFunctions.charEntropy(col("text"))))
    projections.foreach { df =>
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"expected a shuffle-free scan projection:\n$p")
    }
  }

  test("x_bm25_search probes posting lists via a broadcast of the query terms, no global window") {
    val p = plan("x_bm25_search")
    assert(p.contains("BroadcastHashJoin"), s"query-term probe must broadcast:\n$p")
    // the only windows are the 20-row constant-partition rank and the
    // per-query top-k — never an empty partition spec over corpus data
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      s"no unpartitioned window over corpus data:\n$p")
  }

  test("x_maxip_topk phase-1 band is a TakeOrdered, not a global sort") {
    val p = plan("x_maxip_topk")
    assert(p.contains("TakeOrderedAndProject"), s"norm band must be a partial top-B:\n$p")
  }

  test("x_late_interaction broadcasts the probe side and group-limits before its one shuffle") {
    val p = plan("x_late_interaction")
    // probe side is an IdentityBroadcast cross join: the corpus NEVER
    // shuffles into the scoring join
    assert(p.contains("BroadcastNestedLoopJoin") && p.contains("BroadcastExchange"),
      s"corpus-side scoring must stream against a broadcast probe set:\n$p")
    // partial + final WindowGroupLimit: each map task ships <=5 rows per
    // query, so the ranking exchange is queries-bounded at any corpus size
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final group-limit before the rank exchange:\n$p")
  }

  test("x_scd2 builds all segment windows on ONE custkey partitioning") {
    val p = plan("x_scd2")
    // lag -> running segment sum -> lead: a single hashpartitioning on
    // o_custkey serves the whole gaps-and-islands chain; a second
    // key-partitioned exchange would mean the windows re-shuffled
    assert("hashpartitioning\\(o_custkey".r.findAllIn(p).size <= 1,
      s"SCD2 windows must share the custkey exchange:\n$p")
  }

  test("x_label_noise rides the IVF cell equi-join, never a corpus-vs-query nested loop") {
    val p = plan("x_label_noise")
    // the brute form's signature is a CONDITIONED BroadcastNestedLoopJoin
    // (query set vs whole corpus on query_id != neighbor_id — fine for 100
    // queries, not for an all-corpus audit); the headline plan must be the
    // candidate equi-join on the coarse cell id. The only BNLJs allowed are
    // the condition-less 1-row scalar attaches (broadcast centroid array).
    assert(!"BroadcastNestedLoopJoin [^\\n]*NOT \\(".r.findFirstIn(p).isDefined
        && !p.contains("CartesianProduct"),
      s"label-noise audit must not nested-loop the corpus against the queries:\n$p")
    assert(p.contains("cell"), s"candidates must come from the IVF cell join:\n$p")
  }

  test("embed-retrieval queries broadcast the BOUNDED query side, never the corpus") {
    // decode→embed→retrieve (image and audio forms): the corpus embedding
    // scan must stay the streamed side of the non-equi join — a corpus
    // broadcast would OOM the driver at scale — and the per-query top-k
    // must plan the rank-limit pushdown (WindowGroupLimit), not a full
    // window over all scored pairs
    for (name <- Seq("x_image_embed_topk", "x_audio_embed_topk")) {
      val p = plan(name)
      val bnlj = "BroadcastNestedLoopJoin BuildRight".r.findAllIn(p).size +
        "BroadcastNestedLoopJoin BuildLeft".r.findAllIn(p).size
      assert(bnlj >= 1, s"$name: the bounded query side must broadcast:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"$name: per-query top-k must push the rank limit map-side:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name: no cartesian:\n$p")
    }
  }

  test("x_audio_pitch plans the per-clip argmax as a pushed rank limit over ONE window shuffle") {
    // the lag sweep is a scan-shaped flatMap; the rnk=1 filter must plan
    // WindowGroupLimit (map-side rank pruning — at scale the window input
    // is 15 lag rows per clip and only the winner should survive the
    // shuffle), and the only exchanges are the window hash + output sort
    val p = plan("x_audio_pitch")
    assert(p.contains("WindowGroupLimit"),
      s"per-clip argmax must push the rank limit map-side:\n$p")
    val exchanges = "Exchange ".r.findAllIn(p).size
    assert(exchanges <= 2, s"only the window hash + output sort may shuffle:\n$p")
  }

  test("x_video_bitrate reuses ONE doc-hash partitioning for both windows and the aggregate") {
    // the per-sample window, the (doc, gop) window and the per-doc groupBy
    // must all ride the same hashpartitioning(doc_id) — HashPartitioning(a)
    // satisfies ClusteredDistribution(a, b), so a second hash exchange
    // means the composition regressed; only the cosmetic sort may add one
    val p = plan("x_video_bitrate")
    val hash = "Exchange hashpartitioning".r.findAllIn(p).size
    val range = "Exchange rangepartitioning".r.findAllIn(p).size
    assert(hash == 1 && range == 1,
      s"expected exactly one hash + one range exchange, got $hash/$range:\n$p")
  }

  test("x_robots_filter broadcasts the bounded host-rule table; the URL scan never shuffles") {
    // 50 hosts of parsed disallow prefixes must reach the corpus as a
    // broadcast probe — a hash exchange here would shuffle the whole URL
    // scan at production scale for a 50-row rule table
    val p = plan("x_robots_filter")
    assert(p.contains("BroadcastHashJoin"), s"rule table must broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"the URL scan must not shuffle:\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"only the cosmetic sort may exchange:\n$p")
  }

  test("x_crawl_funnel is scan-shaped end-to-end: one broadcast probe, no corpus shuffle") {
    // WARC -> HTTP -> charset -> HTML -> canonicalize -> robots as ONE
    // pipeline: the 50-host rule table broadcasts onto the kernel's
    // output and the corpus reaches the cosmetic sort without a single
    // hash exchange — the property that makes the funnel a pure
    // streaming pass over 100 TB of segments
    val p = plan("x_crawl_funnel")
    assert(p.contains("BroadcastHashJoin"), s"rule table must broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty,
      s"the funnel must not shuffle the corpus:\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"only the cosmetic sort may exchange:\n$p")
  }

  test("x_link_graph combines edges map-side: one hash shuffle + the cosmetic sort") {
    // outlink extraction and canonicalization fuse into the scan; the
    // only data movement is the site->site edge aggregate (partial+
    // final) — at corpus scale the shuffle carries EDGE GROUPS, not
    // pages
    val p = plan("x_link_graph")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"edge aggregate must be partial+final:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1
        && "Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"expected one hash + one range exchange:\n$p")
  }

  test("x_redirect_resolve: each doubling round is one plan deep (corpus read once)") {
    // the self-join rounds are checkpointed: an unbroken lineage would
    // re-derive the scan 2^rounds times. The FINAL plan must hang off
    // the last checkpoint, never re-reading documents.parquet
    val p = plan("x_redirect_resolve")
    assert(!p.contains("documents.parquet"),
      s"final round must read the checkpoint, not re-scan the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), s"doubling must stay an equi-join:\n$p")
  }

  test("x_fetch_schedule: broadcast delay table, ONE per-host window shuffle") {
    // politeness is inherently per-host sequential: the only hash
    // exchange allowed is the host-partitioned rank window (hosts
    // parallelize across the cluster); the 50-row delay table must
    // broadcast, and the cosmetic sort adds the single range exchange
    val p = plan("x_fetch_schedule")
    assert(p.contains("BroadcastHashJoin"), s"delay table must broadcast:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the per-host window may hash-shuffle:\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"only the cosmetic sort may range-shuffle:\n$p")
  }

  test("x_audio_onset combines block energies map-side before its one shuffle") {
    // per-block energy rows reduce per clip: the aggregate must be
    // partial+final (map-side combine), with one hash exchange + the sort
    val p = plan("x_audio_onset")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1
        && "Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"expected one hash + one range exchange:\n$p")
  }

  test("multimodal decode queries are scan-shaped: no shuffle before the cosmetic sort") {
    // audio stats, video frame decode, audio downsample, the MP4
    // sample-table walk and the WARC record walk are maps over the
    // documents scan; the ONLY exchange allowed is the final orderBy's
    // range partitioning
    for (name <- Seq("x_multimodal_audio", "x_multimodal_video",
        "x_audio_resample", "x_video_samples", "x_warc_ingest",
        "x_warc_members", "x_http_extract", "x_url_canonicalize",
        "x_sitemap_parse", "x_sitemap_index",
        "x_html_extract", "x_charset_detect", "x_main_content", "x_etld1",
        "x_jsonld_extract")) {
      val p = plan(name)
      val exchanges = "Exchange ".r.findAllIn(p).size
      val range = "Exchange rangepartitioning".r.findAllIn(p).size
      assert(exchanges == range && range >= 1,
        s"$name: decode must not shuffle (only the output sort may):\n$p")
    }
  }

  test("x_pdf_extract and x_warc_zstd stay scan-shaped: only the output sort exchanges") {
    for (name <- Seq("x_pdf_extract", "x_warc_zstd")) {
      val p = plan(name)
      val exchanges = "Exchange ".r.findAllIn(p).size
      val range = "Exchange rangepartitioning".r.findAllIn(p).size
      assert(exchanges == range && range >= 1,
        s"$name: the codec kernel must not shuffle (only the output sort may):\n$p")
    }
  }

  test("round-14 codec/extraction kernels stay scan-shaped") {
    // the 1.5 PDF round trip, WAT envelope build+from_json, segmented
    // in-stream reassembly, perceptual hashes, table/date/governance
    // extraction: all per-row kernels over the documents scan — the
    // ONLY exchange allowed is the output sort's range partitioning
    for (name <- Seq("x_pdf_xrefstream", "x_wat_extract", "x_warc_segmented",
        "x_image_phash", "x_image_phash_dct", "x_html_tables",
        "x_date_extract", "x_canonical_url", "x_meta_robots",
        "x_mime_sniff", "x_robots_sitemap")) {
      val p = plan(name)
      val exchanges = "Exchange ".r.findAllIn(p).size
      val range = "Exchange rangepartitioning".r.findAllIn(p).size
      assert(exchanges == range && range >= 1,
        s"$name: the kernel must not shuffle (only the output sort may):\n$p")
    }
  }

  test("distributed reassembly and index merge shuffle exactly once before the sort") {
    // x_warc_reassemble_dist: ONE hash exchange co-locates each chain;
    // x_cdx_merge: ONE hash exchange for the (surt, ts) dedup, then the
    // deliberate range exchanges (merge: repartitionByRange + orderBy)
    val pr = plan("x_warc_reassemble_dist")
    assert("Exchange hashpartitioning".r.findAllIn(pr).size == 1,
      s"reassembly gets ONE chain co-location shuffle:\n$pr")
    val pm = plan("x_cdx_merge")
    assert("Exchange hashpartitioning".r.findAllIn(pm).size == 1,
      s"merge gets ONE dedup shuffle:\n$pm")
    assert(pm.contains("max_by") || pm.contains("partial_max_by")
      || "HashAggregate".r.findAllIn(pm).size >= 2,
      s"last-gen-wins must partial-aggregate map-side:\n$pm")
    // the image pair join buckets by (chunk, cv) — hash exchanges only
    // on the chunked signatures, never a cartesian
    val pp = plan("x_image_dedup_pairs")
    assert(!pp.contains("CartesianProduct") && !pp.contains("BroadcastNestedLoopJoin"),
      s"pair candidates must come from the chunk equi-join:\n$pp")
  }

  test("x_etld1_fullpsl probes the 9,500-rule table with a broadcast join, never a sort-merge") {
    val p = plan("x_etld1_fullpsl")
    assert(p.contains("BroadcastHashJoin"), s"rule table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join against the rule table:\n$p")
    // the candidate reduction is a real partial+final aggregate, not a window
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).nonEmpty,
      s"candidate max must aggregate:\n$p")
  }

  test("x_warc_revisit resolution join keys on the refers-to pointer") {
    val p = SparkEntry.queries("x_warc_revisit")(spark, TestSpark.sfDir)
      .queryExecution.optimizedPlan.toString
    // the revisit side projects only (doc_id, refers_to, digest) into the
    // resolution join — raw text never crosses it (content stats ride the
    // response side, already reduced to two longs)
    assert(p.contains("refers_to"), s"resolution join must key on refers_to:\n$p")
    val joinLines = p.linesIterator.filter(_.contains("Join ")).toSeq
    assert(joinLines.nonEmpty && !joinLines.exists(_.contains("text")),
      s"no join may consume the raw text column:\n$p")
  }

  test("q18 having-clause aggregate feeds the joins from ONE lineitem scan") {
    val p = plan("q18_large_orders")
    // TPC-H Q18's classic trap is re-scanning lineitem for the HAVING
    // subquery; our plan aggregates lineitem once and joins the (filtered)
    // aggregate to orders/customer
    assert("lineitem\\.parquet".r.findAllIn(p).size <= 1,
      s"q18 must scan lineitem exactly once:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"total-qty aggregate must be partial+final:\n$p")
  }
}
