package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Physical-plan shape assertions — the properties that decide whether a
  * query survives a 100×/1000× scale-up: filters and projections must
  * reach the parquet scan, small dimension joins must broadcast, and an
  * operator must not shuffle more often than its algebra requires.
  * `.explain("formatted")` by hand is how these were first checked; the
  * spec pins them against regressions.
  *
  * Scan assertions read the pre-AQE `sparkPlan` (scan pushdown/pruning
  * is decided at planning); join/exchange assertions read the final
  * adaptive plan's rendering, because AQE wraps stages in leaf
  * QueryStageExec nodes that tree-collect does not descend into.
  */
class PlanShapeSpec extends SparkSpec {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case s: FileSourceScanExec => s }

  private def finalPlanString(df: DataFrame): String = {
    df.collect() // force execution so AQE finalizes the plan
    // drop the "== Initial Plan ==" echo — only the executed stages count
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("P4: the temporal cutoff is pushed down to the lineitem scan") {
    val df = graft.catalog.Relational.queries("p4_temporal_cutoff")(spark, sfDir)
    val ss = scans(df)
    assert(ss.nonEmpty)
    val pushed = ss.map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("LessThanOrEqual(l_shipdate"),
      s"cutoff not pushed to scan: $pushed")
  }

  test("P10: projection prunes the lineitem read schema to used columns") {
    val df = graft.catalog.Relational.queries("p10_projection_rename")(spark, sfDir)
    val ss = scans(df)
    assert(ss.nonEmpty)
    val read = ss.head.metadata.getOrElse("ReadSchema", "")
    // l_partkey sits right after l_orderkey in table order: if the scan
    // read full rows it would appear; the projection uses 6 of 12+ cols
    assert(read.contains("l_orderkey") && !read.contains("l_partkey"),
      s"unpruned read schema: $read")
  }

  test("J5: the feature-lookup joins broadcast the dimension sides") {
    val df = graft.catalog.Relational.queries("j5_feature_lookup_join")(spark, sfDir)
    val plan = finalPlanString(df)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected customer+part broadcast joins, plan:\n$plan")
  }

  test("J6: purchased exclusion broadcasts the per-slice build sides") {
    val df = graft.catalog.Relational.queries("j6_purchased_exclusion")(spark, sfDir)
    val plan = finalPlanString(df)
    // the customer semi-join AND the anti-join build side must broadcast:
    // at 100 TB the full purchased history neither broadcasts nor should
    // it be computed — only the queried slice's history is
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected semi-join + anti-join broadcasts, plan:\n$plan")
  }

  test("J9: feature injection pre-aggregates before the join (no row explosion)") {
    val df = graft.catalog.Relational.queries("j9_feature_injection")(spark, sfDir)
    val plan = finalPlanString(df)
    // the orders side must be reduced by a partial (map-side) aggregate
    // before any exchange — joining raw orders first would carry every
    // order row through the shuffle
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregate before the feature join:\n$plan")
  }

  test("R2: the candidate cap plans as a global top-k, not a full sort") {
    val df = graft.catalog.Relational.queries("r2_candidate_cap")(spark, sfDir)
    val plan = finalPlanString(df)
    // orderBy+limit must fuse into TakeOrderedAndProject — a full sort
    // followed by limit would shuffle-sort the whole candidate corpus
    assert(plan.contains("TakeOrderedAndProject"),
      s"cap did not fuse into top-k:\n$plan")
  }

  test("J11: the as-of join costs exactly one data shuffle plus the output sort") {
    val df = graft.catalog.ScaleOps.queries("j11_asof_join")(spark, sfDir)
    val plan = finalPlanString(df)
    // one hash partition on user_id for the window; one range partition
    // for the deterministic output order — a per-row inequality join
    // would add a join exchange (or worse, a broadcast nested loop)
    val exchanges = "\\+- Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 2, s"as-of join shuffles more than once ($exchanges):\n$plan")
    assert(!plan.contains("NestedLoop"), s"as-of degenerated to a nested loop:\n$plan")
    assert(plan.contains("Window"), s"no running window in plan:\n$plan")
  }

  test("J12: the band join bounds fan-out via bucket Generate, no nested loop") {
    val df = graft.catalog.ScaleOps.queries("j12_range_join")(spark, sfDir)
    val plan = finalPlanString(df)
    assert(plan.contains("Generate"), s"no bucket explode in plan:\n$plan")
    assert(!plan.contains("NestedLoop"),
      s"band join degenerated to a nested loop:\n$plan")
  }

  test("J11/J12: event-type predicates reach the events scan") {
    val df = graft.catalog.ScaleOps.queries("j11_asof_join")(spark, sfDir)
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("EqualTo(event_type,click)") &&
      pushed.contains("EqualTo(event_type,purchase)"),
      s"event-type filters not pushed: $pushed")
  }

  test("D7: incremental dedup candidate generation shuffles signatures, not text") {
    val df = graft.catalog.TextSim.queries("d7_incremental_dedup")(spark, sfDir)
    val plan = finalPlanString(df)
    // the documents scan feeding the signature table must not read the
    // raw text into any exchange: the only text read happens before the
    // localCheckpoint; downstream exchanges carry doc ids + signatures
    val afterCheckpoint = plan // checkpointed scan shows as ExistingRDD/Scan
    assert(!afterCheckpoint.contains("BroadcastNestedLoop"),
      s"dedup degenerated to nested-loop:\n$plan")
  }

  test("PQ ADC: codebook joins broadcast (never shuffle the candidate set per subspace)") {
    val df = graft.catalog.TextSim.queries("sim_pq_adc_topk")(spark, sfDir)
    val plan = finalPlanString(df)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 8, s"expected 8 broadcast codebook joins, got $bhj:\n$plan")
  }

  test("E1: windowed event aggregation shuffles at most twice") {
    val df = graft.catalog.Analytics.queries("e1_event_windows")(spark, sfDir)
    val plan = finalPlanString(df)
    // one exchange for the group-by, one range partitioning for the
    // final orderBy — anything more means the aggregation re-shuffles
    val exchanges = "\\+- Exchange ".r.findAllIn(plan).size
    assert(exchanges <= 2, s"too many shuffles ($exchanges):\n$plan")
  }

  test("Q5: the 6-table join broadcasts its dimension sides and pushes the date filter") {
    val df = graft.catalog.Relational.queries("sql_q5_local_supplier")(spark, sfDir)
    val plan = finalPlanString(df)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 3, s"expected supplier/nation/region broadcasts, got $bhj:\n$plan")
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("o_orderdate"), s"date filter not pushed: $pushed")
  }

  test("Q7: nation broadcasts for both its roles and the shipdate filter is pushed") {
    val df = graft.catalog.Relational.queries("sql_q7_volume_shipping")(spark, sfDir)
    val plan = finalPlanString(df)
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected both nation roles (and supplier) to broadcast, got $bhj:\n$plan")
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("l_shipdate"), s"shipdate filter not pushed: $pushed")
  }

  test("Q6: every predicate reaches the lineitem scan; no join, single aggregate") {
    val df = graft.catalog.Relational.queries("sql_q6_forecast_revenue")(spark, sfDir)
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"predicates not pushed: $pushed")
    val plan = finalPlanString(df)
    assert(!plan.contains("Join"), s"Q6 must be join-free:\n$plan")
  }

  test("Q4: the EXISTS subquery plans as a LeftSemi join with the quarter pushed") {
    val df = graft.catalog.Relational.queries("sql_q4_order_priority")(spark, sfDir)
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("o_orderdate"), s"quarter not pushed: $pushed")
    val plan = finalPlanString(df)
    assert(plan.contains("LeftSemi"), s"EXISTS not decorrelated to a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"subquery degenerated:\n$plan")
  }

  test("Q12: shipdate range is pushed to the lineitem scan; aggregate is conditional counts") {
    val df = graft.catalog.Relational.queries("sql_q12_priority_shipping")(spark, sfDir)
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("l_shipdate"), s"shipdate range not pushed: $pushed")
    val plan = finalPlanString(df)
    // l_shipdate > o_orderdate is a join-side comparison — it must run
    // post-join, but the join itself stays an equi hash join on the key
    assert(plan.contains("HashJoin"), s"expected an equi hash join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"join degenerated:\n$plan")
  }

  test("Q19: common-factor part predicates are pushed; the disjunction doesn't break the equi-join") {
    val df = graft.catalog.Relational.queries("sql_q19_disjunctive_revenue")(spark, sfDir)
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    // Catalyst factors `p_brand IN (...)` (and In(l_quantity-bounds on
    // the other side) out of the OR-of-ANDs — those must reach the scans
    assert(pushed.contains("p_brand"), s"brand common factor not pushed: $pushed")
    val plan = finalPlanString(df)
    assert(plan.contains("HashJoin"), s"expected an equi hash join on partkey:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"disjunction broke the join:\n$plan")
  }

  test("Q10: returnflag + orderdate filters are pushed and the top-20 is a TakeOrdered") {
    val df = graft.catalog.Relational.queries("sql_q10_returned_items")(spark, sfDir)
    val plan = finalPlanString(df)
    val pushed = scans(df).map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("l_returnflag"), s"returnflag not pushed: $pushed")
    assert(pushed.contains("o_orderdate"), s"orderdate not pushed: $pushed")
    // the LIMIT 20 must plan as a top-N (TakeOrderedAndProject), never a
    // global sort of every customer group
    assert(plan.contains("TakeOrderedAndProject"), s"top-N not planned:\n$plan")
  }

  test("Q9: the supply-cost lookup de-correlates to one broadcast aggregate") {
    val df = graft.catalog.Relational.queries("sql_q9_product_profit")(spark, sfDir)
    val plan = finalPlanString(df)
    // the per-(part,supplier) min-cost proxy must be a single aggregate
    // joined back (5 dims/derived sides broadcast at this SF) — never a
    // correlated re-scan of lineitem per row or a cartesian
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 5,
      s"expected the snowflake + supply agg as broadcast joins:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"supply lookup degenerated:\n$plan")
  }

  test("Q11: the importance threshold filters ABOVE the partkey aggregate") {
    val df = graft.catalog.Relational.queries("sql_q11_important_stock")(spark, sfDir)
    // read the pre-AQE plan: at runtime the scalar subquery and the main
    // branch share the partkey aggregate via ReusedExchange, so the join
    // subtree is hidden inside a materialized stage in the final render
    val plan = df.queryExecution.sparkPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"dimension joins not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"threshold degenerated:\n$plan")
    // the Σ-threshold compare applies to aggregated rows (agg below the
    // subquery filter), never per input row
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"threshold not planned as a scalar subquery:\n$plan")
    val fin = finalPlanString(df)
    assert(fin.contains("ReusedExchange"),
      s"the stock CTE should be computed once and reused:\n$fin")
  }

  test("Q16: NOT IN plans as a broadcast anti join; distinct count is two-level") {
    val df = graft.catalog.Relational.queries("sql_q16_supplier_relation")(spark, sfDir)
    // pre-AQE plan: when the complaint list happens to be EMPTY at a
    // given SF, AQE's empty-relation propagation eliminates the anti
    // join outright (observed at sf0.001) — correct, but the property
    // under test is how Catalyst PLANS the NOT IN
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("LeftAnti"),
      s"NOT IN not planned as an anti join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"null-aware NOT IN degenerated to a nested loop:\n$plan")
    // count(DISTINCT l_suppkey) expands to the standard two-level aggregate
    assert("HashAggregate".r.findAllIn(plan).size >= 3,
      s"distinct count not expanded two-level:\n$plan")
  }

  test("Q20: the promotion predicate is a semi join over ONE conditional aggregate") {
    val df = graft.catalog.Relational.queries("sql_q20_part_promotion")(spark, sfDir)
    val plan = finalPlanString(df)
    assert(plan.contains("LeftSemi"),
      s"IN-subquery not planned as a semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"promotion subquery degenerated:\n$plan")
    // both the 1996 share and the lifetime total are sums over the SAME
    // (supp, part) group — one grouped aggregate (partial+final), not two
    // separate lineitem passes: exactly one Exchange keyed on the pair
    val pairExchanges = "Exchange hashpartitioning\\(l_suppkey".r.findAllIn(plan).size
    assert(pairExchanges <= 1, s"conditional sums split into two passes:\n$plan")
  }

  test("SIM incremental: arrivals meet only the broadcast centroid table") {
    val df = graft.catalog.TextSim.queries("sim_ivf_incremental")(spark, sfDir)
    val plan = finalPlanString(df)
    // the 16-row centroid table must broadcast (nested-loop is fine for
    // a cross join against a broadcast side); the standing corpus must
    // never hash-shuffle against the arrivals
    assert(plan.contains("BroadcastExchange"),
      s"centroid table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"arrivals sort-merge-joined against the corpus:\n$plan")
  }

  test("SIM persisted: the serve stage reads only the index artifacts, centroids broadcast") {
    // build once (writes the artifacts), then inspect the returned
    // serve plan: every scan must be an artifact read — the embeddings
    // corpus file must not appear anywhere in the serve stage
    val df = graft.catalog.TextSim.queries("sim_ivf_persisted")(spark, sfDir)
    val plan = finalPlanString(df)
    assert(plan.contains("BroadcastExchange"), s"centroid table not broadcast:\n$plan")
    val scanned = scans(df).flatMap(_.metadata.get("Location")).mkString
    assert(scanned.contains("graft_artifacts"), s"no artifact scan found: $scanned")
    assert(!scanned.contains("embeddings.parquet"),
      s"serve stage rescans the corpus: $scanned")
  }

  test("SIM trained: the KMeans index serves from artifacts only, centroids broadcast") {
    val df = graft.catalog.TextSim.queries("sim_ivf_trained")(spark, sfDir)
    val plan = finalPlanString(df)
    assert(plan.contains("BroadcastExchange"), s"centroid table not broadcast:\n$plan")
    val scanned = scans(df).flatMap(_.metadata.get("Location")).mkString
    assert(scanned.contains("graft_artifacts"), s"no artifact scan found: $scanned")
    assert(!scanned.contains("embeddings.parquet"),
      s"serve stage rescans the corpus: $scanned")
  }

  test("SIM filtered: label predicate pre-filters the list scan, centroids broadcast") {
    val df = graft.catalog.TextSim.queries("sim_filtered_ivf")(spark, sfDir)
    val plan = finalPlanString(df)
    assert(plan.contains("BroadcastExchange"), s"centroid table not broadcast:\n$plan")
    val scanned = scans(df).flatMap(_.metadata.get("Location")).mkString
    assert(scanned.contains("graft_artifacts"), s"no artifact scan found: $scanned")
    assert(!scanned.contains("embeddings.parquet"),
      s"serve stage rescans the corpus: $scanned")
    // the label equality must sit BELOW the top-k ranking window (a
    // pre-filter of the list scan); a plan that ranks first and filters
    // after would silently return < k rows per query
    val lines = plan.split("\n")
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("label"))
    val windowIdx = lines.indexWhere(l => l.contains("Window") && l.contains("cos"))
    assert(filterIdx >= 0, s"no label filter in plan:\n$plan")
    assert(windowIdx >= 0 && windowIdx < filterIdx,
      s"label filter not below the ranking window (window@$windowIdx filter@$filterIdx):\n$plan")
  }

  test("R9: leakage candidate generation shuffles band signatures, never text") {
    val df = graft.catalog.TextSim.queries("r9_split_leakage")(spark, sfDir)
    val plan = finalPlanString(df)
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(!exchanges.exists(_.contains("text")),
      s"document text reaches a shuffle:\n${exchanges.mkString("\n")}")
    assert(!plan.contains("BroadcastNestedLoop"),
      s"leakage check degenerated to nested-loop:\n$plan")
  }

  test("D10: contamination joins 32-byte gram hashes, never document text") {
    // the catalog entry memoizes a checkpoint-truncated frame; audit the
    // raw pipeline plan underneath it
    val df = graft.catalog.TextSim.contaminationPairsPlan(spark, sfDir)
    val plan = finalPlanString(df)
    // both JOIN inputs are (doc_id, md5(gram)) projections — if `text`
    // or `toks` reaches a gram-keyed exchange the shuffle width blows up
    // at scale. The one exchange allowed to carry text is the
    // conditional doc_id map-spread (Tables.spreadForMap), which is a
    // no-op whenever the scan has real splits.
    val exchanges = plan.split("\n")
      .filter(l => l.contains("Exchange hashpartitioning") ||
        l.contains("BroadcastExchange"))
    assert(exchanges.nonEmpty)
    val textEx = exchanges.filter(l => l.contains("text") || l.contains("toks"))
    assert(textEx.forall(l => l.contains("doc_id")),
      s"document text reaches a non-spread exchange:\n${textEx.mkString("\n")}")
    // the join itself keys on the md5 gram (broadcast when one side is
    // small, gram-hash shuffle otherwise) — never on anything text-sized
    assert(plan.split("\n").exists(l => l.contains("Join [gram") ||
      (l.contains("Join") && l.contains("[gram"))),
      s"no gram-keyed join found:\n$plan")
  }

  test("A27: correlation is ONE scan with a partial/final aggregate pair — no joins") {
    val df = graft.catalog.Analytics.queries("a27_feature_correlation")(spark, sfDir)
    val plan = finalPlanString(df)
    // the moment sums combine map-side; the exchange carries 6 longs per
    // group per partition, never rows
    assert(plan.split("\n").count(_.contains("Scan parquet")) === 1,
      s"more than one scan:\n$plan")
    assert(!plan.contains("Join"), s"correlation should not join:\n$plan")
    assert(plan.contains("partial_") || plan.contains("HashAggregate"),
      s"no partial aggregate phase:\n$plan")
    val hashEx = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1, s"moment rollup should shuffle exactly once:\n$plan")
  }

  test("J10B: AQE marks and splits the skewed sort-merge join in the executed plan") {
    val df = graft.catalog.ScaleOps.queries("j10b_aqe_skew_join")(spark, sfDir)
    val rows = df.collect() // AQE decisions exist only after execution
    assert(rows.length === 3, "skew split changed the answer shape")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"),
      s"j10b must sort-merge (broadcast disabled):\n$plan")
    assert(plan.contains("skew") || plan.contains("Skew"),
      s"AQE did not mark the skewed join partition:\n$plan")
  }

  test("T13: the quality-rule scan is one map-only codegen stage (no shuffle before sort)") {
    val df = graft.catalog.TextSim.queries("t13_quality_rules")(spark, sfDir)
    val plan = finalPlanString(df)
    // the only exchange allowed is the final orderBy's range partitioning
    val hashEx = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 0, s"rule scan shuffles before the sort:\n$plan")
  }

  test("T12: the pack cumsum shards by doc_id range — no corpus-sized window partition") {
    val df = graft.catalog.TextSim.queries("t12_pack_sequences")(spark, sfDir)
    val plan = finalPlanString(df)
    // the within-shard cumsum partitions by the range shard; the only
    // constant-keyed (single-partition) window runs over the shard
    // TOTALS — corpus/span rows — never over documents
    val winLines = plan.split("\n").filter(_.contains("Window ["))
    assert(winLines.exists(_.contains("shard")), s"no sharded cumsum:\n$plan")
    winLines.foreach(l => assert("\\], \\[".r.findAllIn(l).size >= 2,
      s"empty-spec window in t12:\n$l"))
  }

  test("WINDOWS: every catalog window declares its partition (empty-spec WindowExec extinct)") {
    // the four historical empty-spec sites — t12's global cumsum and the
    // three share-of-total frames (a11/a12/r8) — now carry explicit
    // keys: t12 shards its cumsum by doc_id range, the others ride
    // boundedGlobalAgg over provably grouped (bounded) inputs. A window
    // line in a final plan renders `[exprs], [partition], [order]`; an
    // empty spec DROPS the partition group (a foldable literal key is
    // optimizer-stripped to the same shape). Rendering: `[exprs]` +
    // optional `[partition]` + optional `[order]` — so a window is
    // empty-spec iff it has one group, or two where the second is an
    // ordering (contains ASC/DESC).
    def emptySpec(l: String): Boolean = {
      val groups = l.split("\\], \\[")
      groups.length == 1 || (groups.length == 2 &&
        (groups(1).contains(" ASC") || groups(1).contains(" DESC")))
    }
    val sites = Seq("t12_pack_sequences", "a11_target_encoding",
      "a12_class_distribution", "r8_temperature_mix",
      "a4_degree_percentile", "w2_topn_by_score")
    sites.foreach { name =>
      val plan = finalPlanString(SparkEntry.queries(name)(spark, sfDir))
      val winLines = plan.split("\n").filter(_.contains("Window ["))
      winLines.foreach(l =>
        assert(!emptySpec(l), s"$name runs an empty-spec window:\n$l"))
    }
  }

  test("REC: candidates stay customer-partitioned; the strategy pipeline is exchange-free") {
    import org.apache.spark.sql.functions._
    val filter = pmod(col("c_custkey"), lit(50)) === 1
    // the checkpointed candidate table must carry hashpartitioning(customer)
    // — that is what makes every downstream strategy window exchange-free
    val cands = graft.recommend.Recommend.candidates(spark, sfDir, filter, 2000)
    val part = cands.queryExecution.executedPlan.outputPartitioning.toString
    assert(part.toLowerCase.contains("hashpartitioning(customer"),
      s"candidate checkpoint lost its partitioning: $part")
    // the full strategy pipeline (score → cap → softmax → top-n) over it
    // must plan with ZERO exchanges of any kind
    val q1 = graft.recommend.Recommend.topK(spark, sfDir, "diverse",
      customerFilter = filter, queryMonth = 12)
    val plan = finalPlanString(q1)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges === 0, s"strategy pipeline shuffles ($exchanges):\n$plan")
  }
}
