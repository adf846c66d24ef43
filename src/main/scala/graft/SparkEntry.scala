package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Exprs
import graft.llm.{Ann, Dedup, TextAnalysis}
import graft.pipeline.{Fixtures, OrthologPipeline}

/** Driver contract - see /root/repo/SURVEY.md section 7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md
  * section 2 (the name prefix states which) through the engine's own
  * column helpers / operators over the driver test tables; `oracleSql`
  * holds the DuckDB-equivalent SQL. Column names and types are aligned
  * on both sides (the driver compare sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    // events.ts is TIMESTAMP(NANOS), which Spark's parquet reader rejects
    // at schema inference; give an explicit schema for the columns we use
    if (name == "events")
      s.read.schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$dir/$name.parquet")
    else s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the full --species pipeline (resolve -> group -> cascade ->
    * merge -> weak sync) over ortholog-shaped fixtures derived from the
    * sf0.001 test tables; returns the strong-ortholog picks. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val st = Fixtures.state(spark, dir)
    val rel = Fixtures.relations(spark, dir)
    val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    OrthologPipeline.runSpecies(rel, st, graft.model.Species.RAT, runTs).strongPicks
  }

  // decimal-exact sum: cast before and after so Spark and DuckDB agree
  // on both value and arrow type (decimal(18,2))
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DecimalType(18, 2))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- S2/F1/F2/F4: scan + predicate pushdown + projection ----
    "q_f2_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    "q_f4_projection" -> ((s, dir) =>
      t(s, dir, "part").filter(col("p_size") > 20)
        .select(col("p_partkey"), upper(col("p_brand")).as("brand_uc"),
          col("p_size"))),

    // F5/F6: type exclusion + status predicate
    "q_f5_exclusion" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(!col("o_orderstatus").isin("F") &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))),

    // F3/X13: set filter + broadcast dimension join
    "q_f3_set_filter" -> ((s, dir) =>
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_mktsegment"), col("n_name"))),

    // ---- J1: resolution join with multiplicity classification ----
    "q_j1_resolution" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_acctbal") > 0)
      t(s, dir, "nation")
        .join(cust, col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("active_c"),
          max(col("c_custkey")).as("max_cust"))
        .select(col("n_nationkey"), col("n_name"), col("active_c"),
          when(col("active_c") === 0, "unmatched")
            .when(col("active_c") === 1, "matched")
            .otherwise("multiple").as("outcome"),
          when(col("active_c") === 1, col("max_cust")).as("resolved_id"))
    }),

    // J2: withdrawn -> replacement (MAX over history shape)
    "q_j2_replacement" -> ((s, dir) => {
      val repl = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey")).agg(max(col("o_orderkey")).as("replacement"))
      t(s, dir, "customer")
        .join(repl, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("replacement"))
    }),

    // J4: existence as semi join
    "q_j4_semi" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    // J10: genes-without-orthologs as anti join
    "q_j10_anti" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // J8/A9/U5/O1: cross-linked report (HAVING>2 legs, union, ci-order)
    "q_j8_crosslinked" -> ((s, dir) => {
      def leg(df: DataFrame, key: String) =
        df.groupBy(col(key).as("n_nationkey")).count()
          .filter(col("count") > 2).select(col("n_nationkey"))
      leg(t(s, dir, "supplier"), "s_nationkey")
        .union(leg(t(s, dir, "customer"), "c_nationkey")).distinct()
        .join(t(s, dir, "nation"), Seq("n_nationkey"))
        .select(col("n_nationkey"), col("n_name"))
        .orderBy(lower(col("n_name")))
    }),

    // J11/O3: multimap with sorted-first deterministic pick
    "q_j11_multimap" -> ((s, dir) =>
      t(s, dir, "customer").groupBy(col("c_nationkey"))
        .agg(element_at(sort_array(collect_list(col("c_custkey"))), 1)
          .as("first_id"),
          count(lit(1)).as("n"))),

    // J9: partner report with best-score post-filter (window anyBest)
    "q_j9_partner_filter" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("is_best", (col("o_orderstatus") === "O").cast("int"))
      val w = Window.partitionBy(col("o_custkey"))
      o.withColumn("any_best", max(col("is_best")).over(w))
        .filter(col("any_best") === 0 || col("is_best") === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("is_best"))
    }),

    // ---- A1/A5: group aggregation (TPC-H Q1 shape) ----
    // exact cross-engine arithmetic: l_quantity is integer-valued (sum of
    // doubles is order-independent below 2^53); prices go through
    // floor(x*100) -> BIGINT cents so both engines sum exact integers
    "q_a1_groupagg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
          min(col("l_discount")).as("min_disc"),
          max(col("l_discount")).as("max_disc"))),

    // A3/O4/X2: evidence-token merge (collect_set + sort + concat_ws)
    "q_a3_merge" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(concat_ws(", ", array_sort(collect_set(col("l_returnflag"))))
          .as("flags"))),

    // A4: evidence count over a CSV column
    "q_a4_evidence_count" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        Exprs.evidenceCount(translate(col("p_name"), " ", ",")).as("ev_count"))),

    // A5: scalar counts + freshness max (X9 shape)
    "q_a5_counts" -> ((s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        max(col("o_orderdate")).as("max_date"))),

    // A7/J6: sync diff as one full-outer join + classification
    "q_a7_sync_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val incoming = o.filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey").as("k"), lit(1).as("inc"))
      val inRgd = o.filter(col("o_totalprice") > 150000)
        .select(col("o_orderkey").as("k"), lit(1).as("old"))
      incoming.join(inRgd, Seq("k"), "full_outer")
        .select(col("k"),
          when(col("inc").isNotNull && col("old").isNotNull, "match")
            .when(col("old").isNull, "insert").otherwise("delete").as("cls"))
        .groupBy(col("cls")).agg(count(lit(1)).as("n"))
    }),

    // A8/X12: threshold-guarded stale delete (scalar guard math)
    "q_a8_threshold" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.agg(
        count(lit(1)).as("total"),
        sum(when(col("o_orderdate") < lit("1998-01-01"), 1).otherwise(0))
          .cast("long").as("stale"))
        .select(col("total"), col("stale"),
          (col("total") / lit(10)).cast("long").as("max_deletable"),
          (col("stale") <= col("total") / lit(10)).cast("int").as("guard_ok"))
    }),

    // A9: HAVING-filtered count
    "q_a9_having" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_custkey")).count()
        .filter(col("count") > 12)
        .select(col("o_custkey"), col("count").as("n"))),

    // ---- W1: priority-ranked dedupe (row_number window) ----
    "q_w1_dedupe" -> ((s, dir) => {
      val src = Exprs.sourcePriority(
        when(col("l_returnflag") === "R", "RGD")
          .when(col("l_returnflag") === "A", "Alliance").otherwise("NCBI"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data:
      // the ordering must be total or the rn>1 set is nondeterministic
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(src.desc, col("l_linenumber").asc, col("l_suppkey").asc,
          col("l_partkey").asc, col("l_extendedprice").asc)
      t(s, dir, "lineitem").withColumn("rn", row_number().over(w))
        .filter(col("rn") > 1 && col("l_suppkey") % 2 === 0) // pipeline-owned analog
        .select(col("l_orderkey"), col("l_linenumber"))
    }),

    // W2: best-fit top-1 pick (argmax window)
    "q_w2_bestfit" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_quantity").desc, col("l_linenumber").asc)
      t(s, dir, "lineitem").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // W4: tier cascade with conflict invalidation (>1 in top tier -> none)
    "q_w4_cascade" -> ((s, dir) => {
      val tier = when(col("l_returnflag") === "R", 3)
        .when(col("l_returnflag") === "A", 2).otherwise(1)
      val w = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem").withColumn("tier", tier)
        .withColumn("top_tier", max(col("tier")).over(w))
        .filter(col("tier") === col("top_tier"))
        .withColumn("n_top", count(lit(1)).over(w))
        .filter(col("n_top") === 1)
        .select(col("l_orderkey"), col("l_linenumber"), col("tier"))
    }),

    // ---- O1/X5: case-insensitive sort ----
    "q_o1_sort" -> ((s, dir) =>
      t(s, dir, "supplier").orderBy(lower(col("s_name")))
        .select(col("s_suppkey"), col("s_name"))),

    // O4: sorted-set canonicalization
    "q_o4_canonicalize" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        Exprs.canonicalizeList(col("p_name"), "\\s+", ", ").as("canon"))),

    // ---- U1: union + distinct ----
    "q_u1_union" -> ((s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
        .union(t(s, dir, "customer").filter(col("c_nationkey") < 5)
          .select(col("c_custkey")))
        .distinct()),

    // U2: reverse-relation synthesis (symmetrization)
    "q_u2_reverse" -> ((s, dir) => {
      val sn = t(s, dir, "supplier")
        .select(col("s_suppkey").as("a"), col("s_nationkey").cast("bigint").as("b"))
      sn.union(sn.select(col("b").as("a"), col("a").as("b"))).distinct()
    }),

    // U6: list difference (detach) as anti join / EXCEPT
    "q_u6_difference" -> ((s, dir) =>
      t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
        .except(t(s, dir, "orders").filter(col("o_totalprice") < 100000)
          .select(col("o_orderkey")))),

    // ---- X4: Greek transliteration ----
    "q_x4_translit" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        Exprs.transliterateGreek(concat(col("p_name"), lit(" αβΔκ")))
          .as("symbol"))),

    // X6: prefix strip + cast
    "q_x6_prefix" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        Exprs.stripPrefixToInt(col("c_name"), 9).cast("bigint").as("parsed_id"))),

    // X8 + X5: quote trim + case-insensitive equality
    "q_x8_quotetrim" -> ((s, dir) =>
      t(s, dir, "part").select(col("p_partkey"),
        Exprs.unquoteTrim(concat(lit("\""), col("p_name"), lit("\"")))
          .as("unquoted"),
        Exprs.symbolMatches(col("p_name"), upper(col("p_name"))).cast("int")
          .as("ci_match"))),

    // M3: ortholog-type assignment CASE
    "q_m3_type_assign" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
        when(col("c_nationkey") <= 2, graft.model.Species.directOrthologTypeKey)
          .otherwise(graft.model.Species.transitiveOrthologTypeKey)
          .as("type_key"))),

    // M7: canonical rewrite with strictly-shorter change detection
    "q_m7_fixxref" -> ((s, dir) => {
      val orig = concat(col("p_name"), lit(" "), col("p_name"))
      val canon = concat_ws(", ", array_sort(array_distinct(split(orig, "\\s+", -1))))
      t(s, dir, "part")
        .select(col("p_partkey"), orig.as("orig"), canon.as("canon"))
        .filter(col("canon") =!= col("orig") &&
          length(col("canon")) < length(col("orig")))
    }),

    // X10: age-in-days freshness math (datediff)
    "q_x10_age_days" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"),
        datediff(lit("2026-08-12"), col("o_orderdate")).as("age_days"))),

    // X11: signed-diff report format
    "q_x11_signed_diff" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          format_string("%+d", col("n") - 1000).as("diff"))),

    // D6: symbol QC - rows whose two symbol columns disagree case-insens
    "q_d6_symbol_qc" -> ((s, dir) =>
      t(s, dir, "part")
        .filter(!(lower(col("p_name")) <=> lower(col("p_type"))))
        .select(col("p_partkey"), col("p_name"), col("p_type"))),

    // M6: touch-seen + cutoff sweep (xref QC shape): touched rows get the
    // run timestamp, untouched stale rows drop out
    "q_m6_touch_sweep" -> ((s, dir) => {
      val touched = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey")).distinct()
      t(s, dir, "customer")
        .join(touched, col("c_custkey") === col("o_custkey"), "left")
        .withColumn("mod_date",
          when(col("o_custkey").isNotNull, lit("2026-08-01"))
            .otherwise(lit("2026-01-01")))
        .filter(col("mod_date") >= "2026-06-01")
        .select(col("c_custkey"), col("mod_date"))
    }),

    // ---- events: per-entity aggregation (A2/A5 shape on the stream table) ----
    "q_e_user_stats" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100).cast("long")).as("sum_value_cents"),
          countDistinct(col("event_type")).as("n_types"))),

    // ---- LLM-pipeline operators over documents/embeddings ----
    "q_d_exact_dedup" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"))),

    "q_d_norm_dedup" -> ((s, dir) =>
      Dedup.normalized(t(s, dir, "documents"))),

    "q_t_quality" -> ((s, dir) =>
      TextAnalysis.withQualityFeatures(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_words"), col("punct_ratio"),
          col("digit_ratio"), col("stopword_ratio"))),

    "q_t_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(t(s, dir, "documents"))
        .select(col("doc_id"), col("lang_pred"),
          col("lang_score").cast("int").as("lang_score"))),

    "q_t_fingerprint" -> ((s, dir) =>
      TextAnalysis.withFingerprint(t(s, dir, "documents"))
        .select(col("doc_id"), col("content_md5"))),

    "q_t_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.wordCount(col("text")).as("n_ws_tokens"),
        TextAnalysis.tokenCountBpeIsh(col("text")).as("n_bpe_tokens"))),

    // rows-only checks (not SQL-expressible in DuckDB): LSH pipelines
    "q_d_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), threshold = 0.5)
        .select(col("id_a"), col("id_b"))),

    // maxHamming=3 is the standard 64-bit SimHash near-dup radius (4x16-bit
    // chunk blocking); the chunk count is derived from the radius so any
    // setting keeps the pigeonhole completeness guarantee
    "q_d_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 3)
        .select(col("id_a"), col("id_b"), col("hamming"))),

    // full two-stage near-dup: MinHash-LSH candidates + exact shingle
    // Jaccard verification
    "q_d_ngram_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), threshold = 0.6)
        .select(col("id_a"), col("id_b"), col("jaccard"))),

    "q_ann_bruteforce" -> ((s, dir) => {
      val dim = 64
      val query = Ann.hyperplanes(dim, 1, seed = 7L).head
      Ann.cosineTopK(t(s, dir, "embeddings"), query, 10)
        .select(col("vec_id"))
    }),

    "q_ann_lsh" -> ((s, dir) => {
      val dim = 64
      val query = Ann.hyperplanes(dim, 1, seed = 7L).head
      Ann.annTopK(t(s, dir, "embeddings"), query, 10, dim, bits = 6)
        .select(col("vec_id"))
    }),

    "q_ann_ivf_topk" -> ((s, dir) => {
      val dim = 64
      val query = Ann.hyperplanes(dim, 1, seed = 7L).head
      val centroids = Ann.hyperplanes(dim, 8, seed = 11L)
      Ann.ivfTopK(t(s, dir, "embeddings"), query, 10, centroids, nprobe = 2)
        .select(col("vec_id"))
    }),

    "q_ann_neardup" -> ((s, dir) =>
      Ann.cosineNearDupPairs(t(s, dir, "embeddings"), dim = 64,
        threshold = 0.4, bits = 4)
        .select(col("id_a"), col("id_b"))),

    // multimodal plumbing (rows-only): asset metadata projection (binary
    // column pruned from the scan) and video frame sampling
    "q_mm_assets_meta" -> ((s, dir) =>
      graft.llm.Multimodal.metadataOnly(
        graft.llm.Multimodal.syntheticAssets(t(s, dir, "documents"), "doc_id", "text"))),

    "q_mm_frames" -> ((s, dir) =>
      graft.llm.Multimodal.sampleFrames(
        graft.llm.Multimodal.syntheticAssets(t(s, dir, "documents"), "doc_id", "text"),
        everyMs = 60000)
        .select(col("asset_id"), col("frame_idx"), col("frame_ts_ms"))),

    // IVF coarse quantization (rows-only): cell histogram under
    // deterministic centroids
    "q_ann_ivf" -> ((s, dir) => {
      val centroids = Ann.hyperplanes(64, 8, seed = 11L)
      Ann.ivfAssign(t(s, dir, "embeddings"), centroids)
        .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n"))
    }),

    // Structured Streaming surfaced in the registry: file-source stream
    // over the events table (explicit schema - the parquet ts column is
    // TIMESTAMP(NANOS), so event time is derived), watermarked tumbling
    // windows, AvailableNow trigger draining to a memory sink. The same
    // code runs unbounded against a directory that keeps receiving files.
    "q_stream_windowed" -> ((s, dir) => {
      val name = "stream_counts_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      val src = s.readStream
        .schema("event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .option("pathGlobFilter", "events.parquet") // file source wants a dir
        .parquet(dir)
        .withColumn("ts", timestamp_seconds(pmod(col("event_id"), lit(86400L))))
      val q = graft.streaming.EventStream.windowedTypeCounts(src)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).select(col("window.start").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
    }),

    // flagship pipeline as a registered (rows-only) query
    "q_pipeline_e2e" -> ((s, dir) => {
      val st = Fixtures.state(s, dir)
      val rel = Fixtures.relations(s, dir)
      val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
      OrthologPipeline.runSpecies(rel, st, graft.model.Species.RAT, runTs)
        .strongPicks
        .select(col("groupId"), col("srcRgdId"), col("destRgdId"),
          col("xrefDataSrc"), col("xrefDataSet"), col("tier"), col("method"))
    }),

    // --agrOrthologs flow end-to-end as a registered (rows-only) query:
    // M5 curie cascade (symbol + special-id branches) -> S9 upsert ->
    // A8 guard -> M6 curie QC
    "q_agr_e2e" -> ((s, dir) => {
      val st = Fixtures.state(s, dir)
      val runTs = java.sql.Timestamp.valueOf("2026-08-01 12:00:00")
      val cutoff = java.sql.Timestamp.valueOf("2026-08-01 11:00:00")
      graft.pipeline.AgrPipeline.run(
        Fixtures.allianceLines(s, dir), st.agrOrthologs, st.xrefs,
        st.genes, st.rgdIds, runTs, cutoff)
        .agrOrthologs
        .select(col("geneRgdId1"), col("geneRgdId2"),
          col("isBestScore"), col("isBestRevScore"), col("methodsMatched"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_f2_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         WHERE l_returnflag='R' AND l_linestatus='F'""",

    "q_f4_projection" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc, p_size FROM part
         WHERE p_size > 20""",

    "q_f5_exclusion" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
         WHERE o_orderstatus NOT IN ('F')
           AND o_orderpriority IN ('1-URGENT','2-HIGH')""",

    "q_f3_set_filter" ->
      """SELECT c_custkey, c_mktsegment, n_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')""",

    "q_j1_resolution" ->
      """SELECT n_nationkey, n_name, active_c,
             CASE WHEN active_c = 0 THEN 'unmatched'
                  WHEN active_c = 1 THEN 'matched'
                  ELSE 'multiple' END AS outcome,
             CASE WHEN active_c = 1 THEN max_cust END AS resolved_id
         FROM (
           SELECT n_nationkey, n_name,
                  count(c_custkey) AS active_c, max(c_custkey) AS max_cust
           FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0) c
             ON c.c_nationkey = n_nationkey
           GROUP BY n_nationkey, n_name)""",

    "q_j2_replacement" ->
      """SELECT c_custkey, r.replacement
         FROM customer LEFT JOIN (
           SELECT o_custkey, max(o_orderkey) AS replacement
           FROM orders WHERE o_orderstatus='O' GROUP BY o_custkey) r
         ON c_custkey = r.o_custkey""",

    "q_j4_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q_j10_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q_j8_crosslinked" ->
      """SELECT n.n_nationkey, n.n_name FROM (
           SELECT s_nationkey AS n_nationkey FROM supplier
           GROUP BY s_nationkey HAVING count(*) > 2
           UNION
           SELECT c_nationkey FROM customer
           GROUP BY c_nationkey HAVING count(*) > 2) x
         JOIN nation n ON n.n_nationkey = x.n_nationkey
         ORDER BY lower(n.n_name)""",

    "q_j11_multimap" ->
      """SELECT c_nationkey, CAST(min(c_custkey) AS BIGINT) AS first_id,
             count(*) AS n
         FROM customer GROUP BY c_nationkey""",

    "q_j9_partner_filter" ->
      """SELECT o_orderkey, o_custkey, is_best FROM (
           SELECT o_orderkey, o_custkey,
                  CAST(o_orderstatus = 'O' AS INT) AS is_best,
                  MAX(CAST(o_orderstatus = 'O' AS INT))
                    OVER (PARTITION BY o_custkey) AS any_best
           FROM orders)
         WHERE any_best = 0 OR is_best = 1""",

    "q_a1_groupagg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
             min(l_discount) AS min_disc, max(l_discount) AS max_disc
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q_a3_merge" ->
      """SELECT l_orderkey,
             string_agg(l_returnflag, ', ' ORDER BY l_returnflag) AS flags
         FROM (SELECT DISTINCT l_orderkey, l_returnflag FROM lineitem)
         GROUP BY l_orderkey""",

    "q_a4_evidence_count" ->
      """SELECT p_partkey,
             CASE WHEN p_name IS NULL OR p_name = '' THEN 0
                  ELSE CAST(len(string_split(p_name, ' ')) AS INT) END AS ev_count
         FROM part""",

    "q_a5_counts" ->
      """SELECT count(*) AS n_orders,
             count(DISTINCT o_custkey) AS n_custs,
             max(o_orderdate) AS max_date
         FROM orders""",

    "q_a7_sync_diff" ->
      """SELECT cls, count(*) AS n FROM (
           SELECT CASE WHEN i.k IS NOT NULL AND r.k IS NOT NULL THEN 'match'
                       WHEN r.k IS NULL THEN 'insert'
                       ELSE 'delete' END AS cls
           FROM (SELECT o_orderkey AS k FROM orders WHERE o_orderstatus='O') i
           FULL OUTER JOIN
                (SELECT o_orderkey AS k FROM orders WHERE o_totalprice>150000) r
           ON i.k = r.k)
         GROUP BY cls""",

    "q_a8_threshold" ->
      """SELECT total, stale, CAST(total // 10 AS BIGINT) AS max_deletable,
             CAST(stale <= total // 10 AS INT) AS guard_ok
         FROM (
           SELECT count(*) AS total,
                  CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS stale
           FROM orders)""",

    "q_a9_having" ->
      """SELECT o_custkey, count(*) AS n FROM orders
         GROUP BY o_custkey HAVING count(*) > 12""",

    "q_w1_dedupe" ->
      """SELECT l_orderkey, l_linenumber FROM (
           SELECT l_orderkey, l_linenumber, l_suppkey,
                  ROW_NUMBER() OVER (PARTITION BY l_orderkey
                    ORDER BY CASE l_returnflag WHEN 'R' THEN 4
                             WHEN 'A' THEN 3 ELSE 1 END DESC,
                             l_linenumber ASC, l_suppkey ASC, l_partkey ASC,
                             l_extendedprice ASC) AS rn
           FROM lineitem)
         WHERE rn > 1 AND l_suppkey % 2 = 0""",

    "q_w2_bestfit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
                  ROW_NUMBER() OVER (PARTITION BY l_orderkey
                    ORDER BY l_quantity DESC, l_linenumber ASC) AS rn
           FROM lineitem)
         WHERE rn = 1""",

    "q_w4_cascade" ->
      """SELECT l_orderkey, l_linenumber, tier FROM (
           SELECT l_orderkey, l_linenumber, tier,
                  count(*) OVER (PARTITION BY l_orderkey) AS n_top
           FROM (
             SELECT l_orderkey, l_linenumber, tier,
                    MAX(tier) OVER (PARTITION BY l_orderkey) AS top_tier
             FROM (SELECT l_orderkey, l_linenumber,
                     CASE l_returnflag WHEN 'R' THEN 3 WHEN 'A' THEN 2
                          ELSE 1 END AS tier
                   FROM lineitem))
           WHERE tier = top_tier)
         WHERE n_top = 1""",

    "q_o1_sort" ->
      """SELECT s_suppkey, s_name FROM supplier ORDER BY lower(s_name)""",

    "q_o4_canonicalize" ->
      """SELECT p_partkey,
             array_to_string(list_sort(list_distinct(
               string_split_regex(p_name, '\s+'))), ', ') AS canon
         FROM part""",

    "q_u1_union" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal < 0
         UNION
         SELECT c_custkey FROM customer WHERE c_nationkey < 5""",

    "q_u2_reverse" ->
      """SELECT a, b FROM (
           SELECT s_suppkey AS a, CAST(s_nationkey AS BIGINT) AS b FROM supplier
           UNION
           SELECT CAST(s_nationkey AS BIGINT) AS a, s_suppkey AS b FROM supplier)""",

    "q_u6_difference" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus='F'
         EXCEPT
         SELECT o_orderkey FROM orders WHERE o_totalprice < 100000""",

    "q_x4_translit" ->
      """SELECT p_partkey,
             replace(replace(replace(replace(p_name || ' αβΔκ',
               'α','alpha'), 'β','beta'), 'Δ','DELTA'), 'κ','kappa') AS symbol
         FROM part""",

    "q_x6_prefix" ->
      """SELECT c_custkey,
             CAST(CAST(substr(c_name, 10) AS INT) AS BIGINT) AS parsed_id
         FROM customer""",

    "q_x8_quotetrim" ->
      """SELECT p_partkey, trim(p_name) AS unquoted,
             CAST(lower(p_name) = lower(upper(p_name)) AS INT) AS ci_match
         FROM part""",

    "q_m3_type_assign" ->
      """SELECT c_custkey,
             CASE WHEN c_nationkey <= 2 THEN 11 ELSE 13 END AS type_key
         FROM customer""",

    "q_m7_fixxref" ->
      """SELECT p_partkey, orig, canon FROM (
           SELECT p_partkey, p_name || ' ' || p_name AS orig,
                  array_to_string(list_sort(list_distinct(
                    string_split_regex(p_name || ' ' || p_name, '\s+'))), ', ')
                    AS canon
           FROM part)
         WHERE canon <> orig AND len(canon) < len(orig)""",

    "q_x10_age_days" ->
      """SELECT o_orderkey,
             CAST(datediff('day', o_orderdate, TIMESTAMP '2026-08-12') AS INT)
               AS age_days
         FROM orders""",

    "q_x11_signed_diff" ->
      """SELECT o_orderstatus, printf('%+d', n - 1000) AS diff FROM (
           SELECT o_orderstatus, count(*) AS n FROM orders
           GROUP BY o_orderstatus)""",

    "q_d6_symbol_qc" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE NOT (lower(p_name) = lower(p_type))""",

    "q_m6_touch_sweep" ->
      """SELECT c_custkey,
             CASE WHEN o_custkey IS NOT NULL THEN '2026-08-01'
                  ELSE '2026-01-01' END AS mod_date
         FROM customer LEFT JOIN
           (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O') o
           ON c_custkey = o_custkey
         WHERE CASE WHEN o_custkey IS NOT NULL THEN '2026-08-01'
                    ELSE '2026-01-01' END >= '2026-06-01'""",

    "q_e_user_stats" ->
      """SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
               AS sum_value_cents,
             count(DISTINCT event_type) AS n_types
         FROM events GROUP BY user_id""",

    "q_d_exact_dedup" ->
      """SELECT text, min(doc_id) AS keep_id, count(*) AS dup_count
         FROM documents GROUP BY text""",

    "q_d_norm_dedup" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
               AS norm_md5,
             min(doc_id) AS keep_id, count(*) AS dup_count
         FROM documents
         GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))""",

    "q_t_quality" ->
      """SELECT doc_id,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INT)
               AS n_words,
             CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
               AS DOUBLE) / length(text) AS punct_ratio,
             CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS DOUBLE) / length(text) AS digit_ratio,
             CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
               w -> list_contains(['the','a','an','and','or','of','to','in','is',
                 'it','that','for','on','with','as','was','at','by'], w)))
               AS DOUBLE)
               / len(string_split_regex(lower(trim(text)), '\s+'))
               AS stopword_ratio
         FROM documents""",

    "q_t_langid" ->
      """SELECT doc_id,
             CASE WHEN best = 0 THEN 'und'
                  WHEN s_en = best THEN 'en'
                  WHEN s_de = best THEN 'de'
                  WHEN s_fr = best THEN 'fr'
                  WHEN s_es = best THEN 'es'
                  ELSE 'it' END AS lang_pred,
             CAST(best AS INT) AS lang_score
         FROM (
           SELECT doc_id, s_en, s_de, s_fr, s_es, s_it,
                  greatest(s_en, s_de, s_fr, s_es, s_it) AS best
           FROM (
             SELECT doc_id,
               len(list_filter(string_split_regex(lower(trim(text)), '\W+'),
                 w -> list_contains(['the','and','of','to','is','that','for','with'], w))) AS s_en,
               len(list_filter(string_split_regex(lower(trim(text)), '\W+'),
                 w -> list_contains(['der','die','und','das','ist','nicht','mit','ein'], w))) AS s_de,
               len(list_filter(string_split_regex(lower(trim(text)), '\W+'),
                 w -> list_contains(['le','la','les','et','est','que','pour','dans'], w))) AS s_fr,
               len(list_filter(string_split_regex(lower(trim(text)), '\W+'),
                 w -> list_contains(['el','los','las','es','que','para','con','una'], w))) AS s_es,
               len(list_filter(string_split_regex(lower(trim(text)), '\W+'),
                 w -> list_contains(['il','di','che','per','con','della','sono','una'], w))) AS s_it
             FROM documents))""",

    "q_t_fingerprint" ->
      """SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
               AS content_md5
         FROM documents""",

    "q_t_tokens" ->
      """SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
               AS n_ws_tokens,
             CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'),
                    t -> t <> ''))
               + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
               AS INT) AS n_bpe_tokens
         FROM documents"""
  )
}
