package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operators from SURVEY.md §2 — scans, filters, joins,
  * aggregations, set ops, sorts, windows — re-targeted at the driver's
  * synthetic tables so every query has a DuckDB oracle.
  *
  * Each query mirrors a concrete operator of the reference
  * (`/root/reference/parse_clean_and_csv.py`, `case_study_osm.pdf` SQL) and is
  * written plan-first: filters/projections sit directly on the parquet scan
  * (pushdown + pruning), small dimensions are broadcast, aggregates rely on
  * Catalyst's partial (map-side) aggregation, and no query collects to the
  * driver. All numeric outputs are integer-typed (counts / integral sums) so
  * the driver's hash compare is float-safe.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** A1 — plain COUNT(*) (ref: `SELECT COUNT(*) FROM ways`, pdf p.8). */
  def countStar(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem.agg(count(lit(1)).as("cnt"))

  /** A2 + U1 — COUNT(DISTINCT uid) over a UNION ALL of two relations
    * (ref: distinct users over nodes ∪ ways, pdf p.8). Spark `union` is
    * UNION ALL; the distinct-count shuffles once on uid. */
  def distinctUnion(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders.select(col("o_custkey").as("uid"))
      .union(t.customer.select(col("c_custkey").as("uid")))
      .agg(countDistinct(col("uid")).as("n_users"))
  }

  /** A3 — GROUP BY key COUNT(*) (ref: per-uid update/contribution counts,
    * pdf p.10). Partial aggregation makes this one shuffle of (key, partial). */
  def groupbyCount(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** A4 + O2 — value_counts: frequency histogram, descending
    * (ref: phone-tag key histogram, audit_phone_numbers.py:184). */
  def valueCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("event_type"))

  /** A5 — distinct-character census (ref: list_chars,
    * audit_phone_numbers.py:164-174; set semantics, not first-seen order). */
  def charCensus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).part
      .select(explode(split(col("p_name"), "")).as("ch"))
      .distinct()

  /** A6 — exact duplicate removal via DISTINCT (ref: O(n²) `row not in list`
    * dedup at parse_clean_and_csv.py:321-326 → hash-based distinct here). */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents.select(col("lang"), col("source")).distinct()

  /** F5/F8 — IN-list predicate on a scan (ref: key ∈ PHONE_KEYS,
    * parse_clean_and_csv.py:531-533). Pushed into the parquet reader. */
  def filterIn(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** F6 — regex shape predicate (ref: tolerant phone regexes,
    * audit_phone_numbers.py:30-55). `rlike` is unanchored, like re.search. */
  def filterRlike(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .filter(col("text").rlike("join [a-z]+ join"))
      .select(col("doc_id"))

  /** J1/J4 + A3 — fact⋈dim equi-join then aggregate. `part` is the small
    * side → explicit broadcast (ref: official-list dict lookup as a
    * broadcast hash join, parse_clean_and_csv.py:358-374,411-424). */
  def joinAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("qty"))
  }

  /** Blocked fuzzy entity match over part names: probes are the names
    * with the last character dropped (edit distance 1 from their
    * source), except every 7th part, which gets an out-of-vocabulary
    * "zzz "-prefixed name — those land in an empty block and exercise
    * the unmatched (null) path. Blocking on the FIRST token is complete
    * here because a trailing-character edit cannot touch it. */
  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir).part
    val tok1 = split(col("p_name"), " ").getItem(0)
    val build = p.select(col("p_partkey").as("b_id"),
      col("p_name").as("b_text"), tok1.as("block"))
    val dirty = when(col("p_partkey") % 7 === 0,
        concat(lit("zzz "), col("p_name")))
      .otherwise(expr("substring(p_name, 1, length(p_name) - 1)"))
    val probe = p.select((col("p_partkey") + 10000000L).as("p_id"),
      dirty.as("p_text"),
      split(dirty, " ").getItem(0).as("block"))
    graft.ops.Fuzzy.blockedFuzzyJoin(probe, build, maxDist = 2)
  }

  /** J5 — LEFT JOIN of two aggregated subqueries (ref: per-uid updates LEFT
    * JOIN per-uid contributions, pdf p.10). */
  def leftJoinAggs(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
    val errors = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_errors"))
    purchases.join(errors, Seq("user_id"), "left")
  }

  /** J7 — semi join / IN-subquery (ref: `id IN (SELECT DISTINCT id …)`,
    * pdf p.12). Catalyst plans LeftSemi; customer side broadcasts. */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val building = t.customer
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    t.orders
      .join(broadcast(building), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
  }

  /** J8 — anti join / NOT IN (ref: `id NOT IN (…)`, pdf p.12; keys are
    * non-null so null-aware semantics coincide with LeftAnti). */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val building = t.customer
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    t.orders
      .join(broadcast(building), col("o_custkey") === col("c_custkey"),
        "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
  }

  /** The skew-path dual of [[joinAgg]]: the same fact⋈dim join through
    * [[graft.ops.Salting.saltedJoin]] — salt on the big side, dim
    * replicated ×nSalts, join on (key, salt) — so the hot-key straggler
    * never forms. The oracle IS the plain-join SQL: the salted plan must be
    * result-identical to the unsalted join. */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val dim = t.supplier
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    graft.ops.Salting
      .saltedJoin(t.lineitem, dim, keyCol = "l_suppkey",
        spreadCol = "l_orderkey")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).cast("long").as("qty"))
  }

  /** Extension: point-in-time join — for each purchase, the latest click
    * by the same user at or before it (ops.AsOf: union + ONE running
    * window per user, not a per-probe subquery). The oracle restates it
    * as max-ts-then-max-id in two grouped left joins. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir).events
    graft.ops.AsOf
      .asOfLatest(
        probe = ev.filter(col("event_type") === "purchase"),
        build = ev.filter(col("event_type") === "click"),
        keyCol = "user_id", probeTsCol = "ts", probeIdCol = "event_id",
        buildTsCol = "ts", buildIdCol = "event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof_event_id").as("click_id"))
  }

  /** J6 — "has all three tags" triple-self-join, re-expressed as one
    * aggregation with max(CASE) flags (ref: ways_tags a⋈b⋈c on id, pdf p.12
    * — the groupBy form does ONE shuffle instead of three joins). */
  def havingFlags(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "click", 1).otherwise(0)).as("f_click"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("f_buy"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("f_err"))
      .filter(col("f_click") === 1 && col("f_buy") === 1 && col("f_err") === 1)
      .select(col("user_id"))

  /** J3 — uniqueness via per-value counts instead of the reference's
    * O(n²) XOR-conflict self-scan (parse_clean_and_csv.py:331-339).
    * Shape: partial-aggregated groupBy census + broadcast semi join on
    * the unique values — NOT count() OVER (PARTITION BY n_chars), whose
    * WindowExec would serialize every row of a hot value into one task
    * (n_chars has a bounded domain, so at corpus scale every value is
    * hot). The census output is bounded by the value domain, hence
    * broadcastable; the analytic-window surface stays demonstrated by
    * the ORDERED windows (q_sessionize / q_rolling / q_event_deltas),
    * which is the shape that genuinely needs WindowExec. */
  def windowUnique(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documents
    val unique = docs.groupBy(col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") === 1)
      .select(col("n_chars"))
    docs.join(broadcast(unique), Seq("n_chars"), "left_semi")
      .select(col("doc_id"), col("n_chars"))
  }

  /** P3 — tag-key split at the first colon, default type 'regular'
    * (ref: FIRST_COLON_RE, parse_clean_and_csv.py:135-141). The key column
    * is synthesized from documents so the oracle sees identical input. */
  def keySplit(s: SparkSession, dir: String): DataFrame = {
    val k = when(col("doc_id") % 3 === 0, col("source"))
      .otherwise(concat_ws(":", col("lang"), col("source")))
    val hasColon = col("k").contains(":")
    Tables(s, dir).documents
      .select(col("doc_id"), k.as("k"))
      .select(
        col("doc_id"),
        col("k"),
        when(hasColon, regexp_extract(col("k"), "^(.*?):(.*)$", 1))
          .otherwise("regular").as("tag_type"),
        when(hasColon, regexp_extract(col("k"), "^(.*?):(.*)$", 2))
          .otherwise(col("k")).as("tag_key"))
  }

  /** O1 — deterministic top-k by aggregate (ref: ORDER BY contributions
    * DESC, pdf p.10; user_id tie-break keeps the result hash-stable).
    * orderBy+limit compiles to TakeOrderedAndProject — a per-partition
    * top-k combine, unlike an unpartitioned row_number window which drags
    * every group through ONE partition. */
  def topK(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("user_id"))
      .limit(10)
      .select(col("user_id"), col("n"))

  /** Semi-structured extraction: parse the JSON `props` payload with a
    * projected schema (`from_json` — typed, codegen'd, null-safe on
    * malformed rows) and aggregate the extracted field. The scan prunes to
    * (event_type, props); the parse never leaves the row. At 100 TB this
    * is the log-ingestion shape: schema-on-read without a staging rewrite. */
  def jsonAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .select(col("event_type"),
        from_json(col("props"), lit("k INT")).getField("k").cast("long")
          .as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"))

  /** Pivot: per-user event-type counts as columns. The value list is
    * EXPLICIT — omitting it makes Spark run a blocking collect-distinct
    * job over the full table before planning, a hidden driver round-trip
    * at scale. With literal values the pivot compiles to one partial-
    * aggregated groupBy of max(CASE) columns, same as the SQL oracle. */
  def pivotCounts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      // absent (user, type) = 0, matching SUM(CASE) semantics; fill ONLY the
      // pivot columns so a NULL group key survives as the SQL NULL group
      .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
      .select(col("user_id"), col("click"), col("view"), col("purchase"),
        col("signup"), col("error"))

  /** ROLLUP region → nation: hierarchical subtotals + grand total in ONE
    * pass (grouping-set expansion at the partial-aggregate level — not
    * three queries, not three shuffles). Dimensions join broadcast (25
    * nations / 5 regions); integral measures keep the oracle float-free. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_custkey")).cast("long").as("sum_key"))
  }

  /** CUBE region × market segment: all four grouping sets in ONE pass
    * (partial-aggregate expansion, one shuffle — not four queries).
    * Same broadcast-dimension shape as [[rollupAgg]]. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region),
        col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_custkey")).cast("long").as("sum_key"))
  }

  /** Bloom-pruned semi join (ops.BloomJoin): lineitem ⋉ a supplier subset.
    * The oracle is the PLAIN semi join — the bloom must only prune, never
    * change the result. Grouped output keeps the compare compact. */
  def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    graft.ops.BloomJoin.semiJoin(
        t.lineitem, col("l_suppkey"),
        t.supplier.filter(col("s_nationkey") < 5), col("s_suppkey"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_orderkey")).cast("long").as("sum_ok"))
  }

  /** Explicit GROUPING SETS — only the two single-dimension marginals, no
    * cross cells and no grand total (the sets rollup/cube can't express).
    * Still ONE pass / one shuffle via grouping-set expansion. */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer
      .join(broadcast(t.nation),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region),
        col("n_regionkey") === col("r_regionkey"))
      .groupingSets(Seq(Seq(col("r_name")), Seq(col("c_mktsegment"))),
        col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_custkey")).cast("long").as("sum_key"))
  }

  /** FULL OUTER join of two asymmetric key sets (high-quantity part keys
    * vs every-third part key): unmatched rows survive from BOTH sides,
    * NULL-padded. Completes the join-shape inventory next to inner /
    * left / semi / anti / as-of / salted / bloom-pruned / bucketed. */
  def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val sold = t.lineitem.filter(col("l_quantity") > 45)
      .select(col("l_partkey")).distinct()
    val tracked = t.part.filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey"))
    sold.join(tracked, col("l_partkey") === col("p_partkey"), "full_outer")
      .select(coalesce(col("l_partkey"), col("p_partkey")).as("partkey"),
        col("l_partkey").isNotNull.as("hot_seller"),
        col("p_partkey").isNotNull.as("tracked"))
  }

  /** Five-table star join (the TPC-H Q5 shape): facts shuffle on their
    * join keys, the nation/region dims broadcast, and Catalyst reorders
    * freely because the plan is declarative. Aggregates stay integral
    * (count + integral quantity) for float-free oracle parity. */
  def starJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum(col("l_quantity")).cast("long").as("qty"))
  }

  /** Per-user inter-event gaps via lag — the feature-engineering window
    * a behavioral model consumes. One shuffle on user_id; NULL gap marks
    * each user's first event. */
  def eventDeltas(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir).events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("_prev", lag(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        (unix_millis(col("ts")) - unix_millis(col("_prev"))).as("gap_ms"))
  }

  /** Co-partitioned join via bucketed layout (sources.PartitionedStore):
    * customer and orders are written ONCE as external parquet tables
    * bucketed by custkey — the write-time shuffle a pipeline pays so
    * every later equi-join on the key reads the layout with ZERO shuffle
    * exchanges (PartitionedStoreSpec plan-asserts both this and the
    * one-sided incremental digest shape). Per (session, dir) the write
    * happens once (SessionScoped — rebuilt on release); the oracle is the
    * plain join over the raw parquet, since layout must be invisible to
    * results. */
  private val bucketed = new graft.ops.SessionScoped[(String, String)]
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (custT, ordT) = bucketed.getOrCompute(s, dir) {
      // ONE naming scheme (PartitionedStore.storeNames): collision-safe
      // suffix, so distinct dirs can never share a bucketed layout
      val (ct, cPath) =
        graft.sources.PartitionedStore.storeNames("customer", dir)
      val (ot, oPath) =
        graft.sources.PartitionedStore.storeNames("orders", dir)
      graft.sources.PartitionedStore.writeBucketed(
        Tables(s, dir).customer
          .select(col("c_custkey"), col("c_mktsegment")),
        ct, cPath, "c_custkey", 8, Seq("c_custkey"))
      graft.sources.PartitionedStore.writeBucketed(
        Tables(s, dir).orders.select(col("o_custkey"), col("o_orderkey")),
        ot, oPath, "o_custkey", 8, Seq("o_custkey"))
      (ct, ot)
    }
    s.table(custT)
      .join(s.table(ordT), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum(col("o_orderkey")).cast("long").as("sum_okey"))
  }

  /** Integer-scaled PageRank (3 rounds) over the symmetrized
    * customer↔supplier bipartite graph derived from orders⋈lineitem
    * (supplier ids offset by 10⁶ into the customer id space). */
  def pageRank(s: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(s, dir)
    val pairs = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("cust"),
        (col("l_suppkey").cast("long") + 1000000L).as("supp"))
      .distinct()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .union(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    graft.ops.Graph.pageRank(edges, iters = 3)
  }

  /** INTERSECT and EXCEPT — the distinct set operations beyond UNION:
    * negative-balance customers split by whether they ever placed a
    * >300k order, each set tagged and unioned into one relation (121 / 1
    * rows at sf0.01 — both branches populated). Spark lowers
    * intersect/except to distinct + left-semi/anti hash joins: the same
    * partial-aggregated equi-join shuffles as any join, no sort, both
    * sides key-pruned to one column before the shuffle. */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(s, dir)
    val neg = t.customer.filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    val big = t.orders.filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("custkey"))
    neg.intersect(big).withColumn("tag", lit("ordered_big"))
      .union(neg.except(big).withColumn("tag", lit("no_big_order")))
  }

  /** Z-order layout audit: Morton-interleave the low 8 bits of
    * (l_partkey, l_suppkey), split the Z domain into 16 equal ranges,
    * and report each range's row count and per-dimension bounding box —
    * the min/max-stats relation a file-skipping reader consults
    * ([[graft.ops.Layout]]). With 8-bit dims the 16 buckets are exact
    * 64×64 quadrants of the 256×256 grid: tight on BOTH columns, which
    * a single-column sort cannot do. The mod-256 fold keeps the value
    * range matched to `bits` at every scale factor. */
  def zorderStats(s: SparkSession, dir: String): DataFrame =
    graft.ops.Layout.zorderStats(
      graft.Tables(s, dir).lineitem.select(
        (col("l_partkey") % 256).as("px"),
        (col("l_suppkey") % 256).as("sy")),
      "px", "sy", bits = 8, nBuckets = 16)

  val queries: Map[String, Q] = Map(
    "q_set_ops" -> setOps,
    "q_zorder" -> zorderStats,
    "q_pagerank" -> pageRank,
    "q_bucketed_join" -> bucketedJoin,
    "q_star_join" -> starJoin,
    "q_event_deltas" -> eventDeltas,
    "q_full_outer" -> fullOuterJoin,
    "q_grouping_sets" -> groupingSetsAgg,
    "q_cube" -> cubeAgg,
    "q_bloom_join" -> bloomJoin,
    "q_count_star" -> countStar,
    "q_json_agg" -> jsonAgg,
    "q_pivot" -> pivotCounts,
    "q_rollup" -> rollupAgg,
    "q_distinct_union" -> distinctUnion,
    "q_groupby_count" -> groupbyCount,
    "q_value_counts" -> valueCounts,
    "q_char_census" -> charCensus,
    "q_dedup_exact" -> dedupExact,
    "q_filter_in" -> filterIn,
    "q_filter_rlike" -> filterRlike,
    "q_join_agg" -> joinAgg,
    "q_fuzzy_match" -> fuzzyMatch,
    "q_salted_join" -> saltedJoin,
    "q_asof_join" -> asofJoin,
    "q_left_join_aggs" -> leftJoinAggs,
    "q_semi_join" -> semiJoin,
    "q_anti_join" -> antiJoin,
    "q_having_flags" -> havingFlags,
    "q_window_unique" -> windowUnique,
    "q_key_split" -> keySplit,
    "q_topk" -> topK,
  )

  /** The 3 PageRank rounds unrolled as chained CTEs — per-edge integer
    * division before the order-independent integer sum, exactly the
    * engine's arithmetic. In lockstep with Graph.pageRank's staged
    * `(src, dst, deg)` shape: degree is folded onto the edge relation
    * ONCE (`ed`), so each round is a single edge⋈rank join. */
  private lazy val duckPageRankSql: String = {
    def round(k: Int): String =
      s"r$k AS (SELECT n.id, 150000 + (850 * coalesce(s.s, 0)) // 1000 " +
        "AS rank FROM n LEFT JOIN (SELECT e.dst AS id, " +
        s"CAST(sum(r.rank // e.deg) AS BIGINT) AS s FROM ed e " +
        s"JOIN r${k - 1} r ON r.id = e.src GROUP BY e.dst) s USING (id))"
    "WITH p AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS cust, " +
      "CAST(l_suppkey AS BIGINT) + 1000000 AS supp FROM orders " +
      "JOIN lineitem ON o_orderkey = l_orderkey), " +
      "e AS (SELECT cust AS src, supp AS dst FROM p " +
      "UNION SELECT supp, cust FROM p), " +
      "n AS (SELECT DISTINCT src AS id FROM e " +
      "UNION SELECT DISTINCT dst FROM e), " +
      "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e " +
      "GROUP BY src), " +
      "ed AS (SELECT e.src, e.dst, d.deg FROM e " +
      "JOIN deg d ON d.src = e.src), " +
      "r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS rank FROM n), " +
      (1 to 3).map(round).mkString(", ") + " " +
      "SELECT id, rank FROM r3"
  }

  /** The same literal-unrolled Morton interleave as Layout.zValue. */
  private lazy val duckZorderSql: String = {
    val interleave = (0 until 8).map(i =>
      s"(((x >> $i) & 1) << ${2 * i}) + (((y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    val span = (1L << 16) / 16
    "WITH d AS (SELECT CAST(l_partkey AS BIGINT) % 256 AS x, " +
      "CAST(l_suppkey AS BIGINT) % 256 AS y FROM lineitem), " +
      s"z AS (SELECT x, y, $interleave AS zval FROM d) " +
      s"SELECT zval // $span AS bucket, " +
      "CAST(count(*) AS BIGINT) AS n_rows, " +
      "min(x) AS min_x, max(x) AS max_x, " +
      "min(y) AS min_y, max(y) AS max_y " +
      "FROM z GROUP BY bucket"
  }

  val oracle: Map[String, String] = Map(
    "q_set_ops" ->
      ("WITH neg AS (SELECT c_custkey AS custkey FROM customer " +
        "WHERE c_acctbal < 0), " +
        "big AS (SELECT o_custkey AS custkey FROM orders " +
        "WHERE o_totalprice > 300000) " +
        "SELECT custkey, 'ordered_big' AS tag FROM " +
        "(SELECT custkey FROM neg INTERSECT SELECT custkey FROM big) " +
        "UNION ALL " +
        "SELECT custkey, 'no_big_order' AS tag FROM " +
        "(SELECT custkey FROM neg EXCEPT SELECT custkey FROM big)"),
    "q_zorder" -> duckZorderSql,
    "q_pagerank" -> duckPageRankSql,
    "q_bucketed_join" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_okey " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment"),
    "q_full_outer" ->
      ("SELECT coalesce(l_partkey, p_partkey) AS partkey, " +
        "l_partkey IS NOT NULL AS hot_seller, " +
        "p_partkey IS NOT NULL AS tracked FROM " +
        "(SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity > 45) a " +
        "FULL OUTER JOIN " +
        "(SELECT p_partkey FROM part WHERE p_partkey % 3 = 0) b " +
        "ON l_partkey = p_partkey"),
    "q_grouping_sets" ->
      ("SELECT r_name, c_mktsegment, count(*) AS n_cust, " +
        "CAST(sum(c_custkey) AS BIGINT) AS sum_key " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY GROUPING SETS ((r_name), (c_mktsegment))"),
    "q_cube" ->
      ("SELECT r_name, c_mktsegment, count(*) AS n_cust, " +
        "CAST(sum(c_custkey) AS BIGINT) AS sum_key " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY CUBE (r_name, c_mktsegment)"),
    // the plain semi join: bloom pruning must be result-invisible
    "q_bloom_join" ->
      ("SELECT l_suppkey, count(*) AS cnt, " +
        "CAST(sum(l_orderkey) AS BIGINT) AS sum_ok FROM lineitem " +
        "WHERE l_suppkey IN (SELECT s_suppkey FROM supplier " +
        "WHERE s_nationkey < 5) GROUP BY l_suppkey"),
    "q_count_star" ->
      "SELECT count(*) AS cnt FROM lineitem",
    // ->> extracts as text; CAST matches Spark's projected-schema parse
    "q_json_agg" ->
      ("SELECT event_type, count(k) AS n_with_k, " +
        "CAST(sum(k) AS BIGINT) AS sum_k FROM (SELECT event_type, " +
        "CAST(props ->> '$.k' AS BIGINT) AS k FROM events) GROUP BY 1"),
    "q_pivot" ->
      ("SELECT user_id, " +
        "count(CASE WHEN event_type = 'click' THEN 1 END) AS click, " +
        "count(CASE WHEN event_type = 'view' THEN 1 END) AS \"view\", " +
        "count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase, " +
        "count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup, " +
        "count(CASE WHEN event_type = 'error' THEN 1 END) AS \"error\" " +
        "FROM events GROUP BY user_id"),
    "q_rollup" ->
      ("SELECT r_name, n_name, count(*) AS n_cust, " +
        "CAST(sum(c_custkey) AS BIGINT) AS sum_key " +
        "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name)"),
    "q_distinct_union" ->
      ("SELECT count(DISTINCT uid) AS n_users FROM " +
        "(SELECT o_custkey AS uid FROM orders " +
        "UNION ALL SELECT c_custkey AS uid FROM customer)"),
    "q_groupby_count" ->
      "SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id",
    "q_value_counts" ->
      ("SELECT event_type, count(*) AS cnt FROM events " +
        "GROUP BY event_type ORDER BY cnt DESC, event_type"),
    "q_char_census" ->
      "SELECT DISTINCT unnest(string_split(p_name, '')) AS ch FROM part",
    "q_dedup_exact" ->
      "SELECT DISTINCT lang, source FROM documents",
    "q_filter_in" ->
      ("SELECT event_id, user_id, event_type FROM events " +
        "WHERE event_type IN ('click', 'purchase')"),
    "q_filter_rlike" ->
      "SELECT doc_id FROM documents WHERE regexp_matches(text, 'join [a-z]+ join')",
    "q_join_agg" ->
      ("SELECT p_brand, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS qty " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand"),
    // semantics-first restatement: the oracle verifies within first-token
    // blocks like the engine (blocking completeness is the documented
    // contract, not an approximation to hide)
    "q_fuzzy_match" ->
      ("WITH build AS (SELECT p_partkey AS b_id, p_name AS b_text, " +
        "string_split(p_name, ' ')[1] AS block FROM part), " +
        // the block derives from the SAME dirty text as the engine's
        // (split(dirty)[0]) — not from the original p_name, whose first
        // token only coincides because TPC-H names are multi-token
        // (ADVICE r10: a single-token name would diverge engine/oracle)
        "probe AS (SELECT p_partkey + 10000000 AS p_id, p_text, " +
        "string_split(p_text, ' ')[1] AS block FROM (" +
        "SELECT p_partkey, CASE WHEN p_partkey % 7 = 0 " +
        "THEN 'zzz ' || p_name " +
        "ELSE substring(p_name, 1, length(p_name) - 1) END AS p_text " +
        "FROM part)), " +
        "m AS (SELECT DISTINCT pn.p_text, block, bn.b_text, " +
        "levenshtein(pn.p_text, bn.b_text) AS dist " +
        "FROM (SELECT DISTINCT p_text, block FROM probe) pn " +
        "JOIN (SELECT DISTINCT b_text, block FROM build) bn " +
        "USING (block) WHERE levenshtein(pn.p_text, bn.b_text) <= 2), " +
        "bd AS (SELECT p_text, block, min(dist) AS d FROM m " +
        "GROUP BY p_text, block), " +
        "best AS (SELECT m.p_text, m.block, min(m.b_text) AS match_text, " +
        "CAST(bd.d AS BIGINT) AS dist FROM m JOIN bd " +
        "ON m.p_text = bd.p_text AND m.block = bd.block " +
        "AND m.dist = bd.d GROUP BY m.p_text, m.block, bd.d), " +
        "rep AS (SELECT b_text AS match_text, block, min(b_id) " +
        "AS match_id FROM build GROUP BY b_text, block) " +
        "SELECT p.p_id, rep.match_id, best.match_text, best.dist " +
        "FROM probe p LEFT JOIN best ON p.p_text = best.p_text " +
        "AND p.block = best.block " +
        "LEFT JOIN rep ON best.match_text = rep.match_text " +
        "AND best.block = rep.block"),
    "q_star_join" ->
      ("SELECT r_name, n_name, count(*) AS n_items, " +
        "CAST(sum(l_quantity) AS BIGINT) AS qty FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE c_nationkey = s_nationkey GROUP BY r_name, n_name"),
    "q_event_deltas" ->
      ("SELECT user_id, event_id, epoch_ms(ts) - epoch_ms(lag(ts, 1) " +
        "OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms " +
        "FROM events"),
    // the salted two-phase join must produce exactly the plain-join answer
    "q_salted_join" ->
      ("SELECT s_nationkey, count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS qty " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_nationkey"),
    // as-of restated as max-ts-then-max-id (ties keep the max click id,
    // matching the window's deterministic tie-break)
    "q_asof_join" ->
      ("WITH pur AS (SELECT event_id AS purchase_id, user_id, ts " +
        "FROM events WHERE event_type = 'purchase'), " +
        "cl AS (SELECT event_id, user_id, ts FROM events " +
        "WHERE event_type = 'click'), " +
        "j AS (SELECT p.purchase_id, p.user_id, max(c.ts) AS best_ts " +
        "FROM pur p LEFT JOIN cl c ON c.user_id = p.user_id " +
        "AND c.ts <= p.ts GROUP BY 1, 2) " +
        "SELECT j.purchase_id, j.user_id, max(c2.event_id) AS click_id " +
        "FROM j LEFT JOIN cl c2 ON c2.user_id = j.user_id " +
        "AND c2.ts = j.best_ts GROUP BY 1, 2"),
    "q_left_join_aggs" ->
      ("SELECT a.user_id AS user_id, a.n_purchases AS n_purchases, " +
        "b.n_errors AS n_errors FROM " +
        "(SELECT user_id, count(*) AS n_purchases FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id) a LEFT JOIN " +
        "(SELECT user_id, count(*) AS n_errors FROM events " +
        "WHERE event_type = 'error' GROUP BY user_id) b " +
        "ON a.user_id = b.user_id"),
    "q_semi_join" ->
      ("SELECT o_orderkey, o_orderstatus FROM orders WHERE o_custkey IN " +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"),
    "q_anti_join" ->
      ("SELECT o_orderkey, o_orderstatus FROM orders WHERE o_custkey NOT IN " +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"),
    "q_having_flags" ->
      ("SELECT user_id FROM events GROUP BY user_id HAVING " +
        "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1 AND " +
        "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1 AND " +
        "max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) = 1"),
    "q_window_unique" ->
      ("SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars, " +
        "count(*) OVER (PARTITION BY n_chars) AS c FROM documents) WHERE c = 1"),
    "q_key_split" ->
      ("SELECT doc_id, k, " +
        "CASE WHEN k LIKE '%:%' THEN regexp_extract(k, '^(.*?):(.*)$', 1) " +
        "ELSE 'regular' END AS tag_type, " +
        "CASE WHEN k LIKE '%:%' THEN regexp_extract(k, '^(.*?):(.*)$', 2) " +
        // concat_ws, not ||: the engine's concat_ws SKIPS a NULL lang
        // (yielding just `source`) while || propagates NULL — a latent
        // hash mismatch on any corpus with NULL lang/source
        "ELSE k END AS tag_key FROM (SELECT doc_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN source " +
        "ELSE concat_ws(':', lang, source) END AS k FROM documents)"),
    "q_topk" ->
      ("SELECT user_id, n FROM (SELECT user_id, count(*) AS n, " +
        "row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn " +
        "FROM events GROUP BY user_id) WHERE rn <= 10"),
  )
}
