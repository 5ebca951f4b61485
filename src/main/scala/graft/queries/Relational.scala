package graft.queries

import graft.Tables
import graft.functions.GraftFunctions.sum_dec_exact
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational query surface (SURVEY.md §2.2).
  *
  * The reference (sheetreader-duckdb) delegates all querying to DuckDB's SQL
  * engine; this object re-expresses that surface Spark-first with the
  * DataFrame API so Catalyst handles pushdown/pruning/join strategy.
  *
  * Oracle-matching rules (driver hash-compares against DuckDB at sf0.01):
  *   - money/qty aggregates are summed as DECIMAL so the result is exact and
  *     independent of partition/merge order (double sums are not);
  *   - averages are expressed as cast(decimal_sum as double)/count so both
  *     engines perform the identical IEEE division;
  *   - every computed column is aliased identically on both sides;
  *   - top-k queries carry a unique tiebreak column in the ordering.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 #17: grouped aggregation with multiple agg functions (TPC-H Q1 shape)
    "q01_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" <= "1998-09-02 00:00:00")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum_dec_exact($"l_quantity", 2).cast("double").as("sum_qty"),
          sum_dec_exact($"l_extendedprice", 2).cast("double").as("sum_base_price"),
          sum_dec_exact($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).cast("double").as("sum_disc_price"),
          (sum_dec_exact($"l_quantity", 2).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // §2.2 #16: filter + projection pushdown (TPC-H Q6 shape)
    "q06_filter_revenue" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01 00:00:00" &&
                $"l_shipdate" < "1997-01-01 00:00:00" &&
                $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(sum_dec_exact($"l_extendedprice" * $"l_discount", 4).cast("double").as("revenue"))
    }),

    // §2.2 #19: inner equi-join + agg + top-k (TPC-H Q3 shape)
    "q03_shipping_priority" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.load(s, dir, "orders").filter($"o_orderdate" < "1998-01-01 00:00:00")
      val li = Tables.load(s, dir, "lineitem").filter($"l_shipdate" > "1998-01-01 00:00:00")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum_dec_exact($"l_extendedprice" * (lit(1) - $"l_discount"), 4).cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // §2.2 #20: multi-way join, broadcast small dims (TPC-H Q5 shape)
    "q05_local_supplier" -> ((s, dir) => {
      import s.implicits._
      val region = Tables.load(s, dir, "region").filter($"r_name" === "ASIA")
      val nation = Tables.load(s, dir, "nation")
      val cust = Tables.load(s, dir, "customer")
      val supp = Tables.load(s, dir, "supplier")
      val ord = Tables.load(s, dir, "orders")
        .filter($"o_orderdate" >= "1996-01-01 00:00:00" && $"o_orderdate" < "1998-01-01 00:00:00")
      val li = Tables.load(s, dir, "lineitem")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(supp, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(sum_dec_exact($"l_extendedprice" * (lit(1) - $"l_discount"), 4).cast("double").as("revenue"))
    }),

    // §2.2 #18: conditional aggregation / CASE WHEN (TPC-H Q14 shape)
    "q14_promo_share" -> ((s, dir) => {
      import s.implicits._
      val part = Tables.load(s, dir, "part")
      val li = Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1997-01-01 00:00:00" && $"l_shipdate" < "1997-04-01 00:00:00")
      li.join(part, $"l_partkey" === $"p_partkey")
        .agg(
          sum(when($"p_type" === "PROMO", dec4($"l_extendedprice" * (lit(1) - $"l_discount")))
            .otherwise(dec4(lit(0.0)))).cast("double").as("promo_revenue"),
          sum_dec_exact($"l_extendedprice" * (lit(1) - $"l_discount"), 4).cast("double").as("total_revenue"))
    }),

    // §2.2 #28: per-group average threshold via self-aggregation (TPC-H Q17
    // shape). The hash-agg + join-back formulation is deliberate: an
    // unbounded window over l_partkey measures the same locally but forces
    // a full per-partition SORT of the fact table, while this shape stays
    // hash-based end-to-end (map-side-combined agg, shuffled hash join).
    // avg comparison rewritten multiplicatively (qty*cnt*5 < sum) so both
    // engines compare exact integers — no float-avg boundary nondeterminism.
    "q17_small_qty" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val perPart = li.groupBy($"l_partkey".as("pk"))
        .agg(sum_dec_exact($"l_quantity", 2).as("s"), count(lit(1)).as("c"))
      li.join(perPart, $"l_partkey" === $"pk")
        .filter($"l_quantity" * $"c" * 5 < $"s".cast("double"))
        .agg(sum_dec_exact($"l_extendedprice", 2).cast("double").as("total_price"), count(lit(1)).as("n_items"))
    }),

    // §2.2 #21: left outer join preserving unmatched rows
    "q_outer_join" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter($"o_totalprice" > 150000.0)
      cust.join(ord, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_big_orders"))
    }),

    // §2.2 #22: semi join (EXISTS)
    "q_semi_join" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem").filter($"l_quantity" >= 48)
      ord.join(li, $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_totalprice")
    }),

    // §2.2 #23: anti join (NOT EXISTS)
    "q_anti_join" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem").filter($"l_quantity" >= 48)
      ord.join(li, $"o_orderkey" === $"l_orderkey", "left_anti")
        .agg(count(lit(1)).as("n_orders"), sum_dec_exact($"o_totalprice", 2).cast("double").as("total"))
    }),

    // §2.2 #24: distinct + count distinct
    "q_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .agg(countDistinct($"l_partkey").as("n_parts"),
             countDistinct($"l_suppkey").as("n_supps"),
             countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"))
    }),

    // §2.2 #25: order by + limit (top-k) with unique tiebreak
    "q_topk" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(15)
    }),

    // §2.2 #26: window rank partitioned, top-3 per group
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
      Tables.load(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"p_brand", $"p_partkey", $"p_retailprice", $"rn")
    }),

    // §2.2 #27: window running aggregate (exact decimal running sum)
    "q_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("running_value", sum_dec_exact($"value", 4).over(w).cast("double"))
        .select($"user_id", $"event_id", $"running_value")
    }),

    // §2.2 #29: union all
    "q_union" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      val hi = ord.filter($"o_totalprice" > 300000.0)
        .select($"o_orderkey", lit("high").as("bucket"))
      val lo = ord.filter($"o_totalprice" < 10000.0)
        .select($"o_orderkey", lit("low").as("bucket"))
      hi.union(lo).groupBy($"bucket").agg(count(lit(1)).as("n"))
    }),

    // §2.6: INTERSECT — set semantics (distinct), shuffle on the full row.
    // Customers ordered in both halves of the date range.
    "q_intersect" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      ord.filter($"o_orderdate" < "1994-01-01 00:00:00").select($"o_custkey")
        .intersect(
          ord.filter($"o_orderdate" >= "1994-01-01 00:00:00").select($"o_custkey"))
    }),

    // §2.6: EXCEPT — customers ordering ONLY in the early half.
    "q_except" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      ord.filter($"o_orderdate" < "1994-01-01 00:00:00").select($"o_custkey")
        .except(
          ord.filter($"o_orderdate" >= "1994-01-01 00:00:00").select($"o_custkey"))
    }),

    // §2.6: scalar math functions, restricted to the IEEE-exact set so the
    // hash compare holds: floor/ceil/abs/sqrt/mul/mod are bit-identical in
    // any IEEE engine; round() / log() / pow() are NOT (BigDecimal-string
    // rounding vs numeric tricks, libm ulp differences), so "round half up
    // to 1 decimal" is spelled floor(x*10 + 0.5)/10 in both dialects —
    // the same trick quantizeInt8 uses.
    "q_math_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey",
          (floor($"o_totalprice" * 10.0 + 0.5) / 10.0).as("r1"),
          floor($"o_totalprice").cast("double").as("fl"),
          ceil($"o_totalprice").cast("double").as("ce"),
          abs($"o_totalprice" * lit(-1.0)).as("ab"),
          sqrt($"o_totalprice").as("sq"),
          ($"o_totalprice" * $"o_totalprice").as("p2"),
          ($"o_orderkey" % 7).as("m7"))
    }),

    // §2.12: TPC-H Q19 shape — DISJUNCTIVE predicate (OR of conjunctive
    // brand/size/quantity bands) over a fact⋈dim join: the pushdown case
    // the conjunctive faces never exercise (Catalyst must keep the OR
    // intact, split the common l_partkey/p_partkey conjuncts, and push
    // per-side residuals)
    "q19_disjunctive" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part"), $"l_partkey" === $"p_partkey")
        .filter(
          ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
            $"l_quantity".between(1, 11)) ||
          ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
            $"l_quantity".between(10, 20)) ||
          ($"p_brand" === "Brand#34" && $"p_size".between(1, 15) &&
            $"l_quantity".between(20, 30)))
        .agg(count(lit(1)).as("n"),
          sum_dec_exact($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
            .cast("double").as("revenue"))
    }),

    // §2.12: TPC-H Q10 shape — returned-item revenue per customer across
    // a 4-way join, top 20. Ordering runs on the EXACT decimal sum (a
    // double sort could flip near-ties cross-engine); the output casts to
    // double after selection.
    "q10_returned_items" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem").filter($"l_returnflag" === "R")
        .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(Tables.load(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(sum_dec_exact($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("__rev"))
        .orderBy($"__rev".desc, $"c_custkey")
        .limit(20)
        .select($"c_custkey", $"c_name", $"n_name",
          $"__rev".cast("double").as("revenue"))
    }),

    // §2.12: array higher-order functions — transform/filter/aggregate/
    // sort/distinct/slice over an integer array derived from the token
    // stream, all integer-exact (the cross-engine lambda-surface parity
    // face; array-valued outputs are folded to integer sums because the
    // driver compare stringifies arrays engine-specifically)
    "q_array_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          transform(split(lower($"text"), " +"), w => length(w)).as("lens"))
        .select($"doc_id",
          size($"lens").as("n"),
          array_max($"lens").as("max_len"),
          array_min($"lens").as("min_len"),
          aggregate($"lens", lit(0L), (a, x) => a + x).as("sum_len"),
          size(array_distinct($"lens")).as("n_distinct"),
          size(filter($"lens", x => x > 4)).as("n_long"),
          aggregate(slice(sort_array($"lens"), 1, 3), lit(0L), (a, x) => a + x)
            .as("sum_smallest3"),
          exists($"lens", x => x === 1).as("has_single"))
    }),

    // §2.12: array functions tier 2 — set algebra (intersect/overlap/
    // has-all), element search, zip_with + positional weighting, slicing.
    // DuckDB's list_intersect/list_distinct return UNORDERED lists, so
    // every array-valued result reduces through an order-free scalar
    // (size/sum) or an explicit sort before stringifying.
    "q_array_funcs2" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", split(lower($"text"), " +").as("ws"))
        .select($"doc_id",
          size(array_intersect($"ws",
            array(Seq("the", "of", "and", "to", "in", "a").map(lit): _*)))
            .as("n_stop_shared"),
          arrays_overlap($"ws",
            array(Seq("the", "of", "and", "to", "in", "a").map(lit): _*))
            .as("has_stop"),
          expr("forall(array('the', 'of'), x -> array_contains(ws, x))")
            .as("has_the_of"),
          array_position($"ws", "the").cast("long").as("pos_the"),
          aggregate(
            zip_with(transform($"ws", w => length(w).cast("long")),
              sequence(lit(1L), size($"ws").cast("long")),
              (x, i) => x * i),
            lit(0L), (a, x) => a + x).as("wsum"),
          concat_ws(",", slice(sort_array($"ws"), 2, 2)).as("mid2"))
    }),

    // §2.2: DISTINCT aggregates in WINDOW functions — DuckDB runs
    // count(DISTINCT x) OVER (...) natively, both partition-wide and as a
    // RUNNING frame; Spark supports neither. The scale-honest translation
    // is first-occurrence flags: rd = running sum of [first time this
    // (customer, priority) appears], and the partition-wide count = the
    // running count's maximum — no collect_set, no per-row set state,
    // two plain windows that the engine treats like any running sum.
    "q_window_distinct" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byPair = Window.partitionBy($"o_custkey", $"o_orderpriority")
        .orderBy($"o_orderdate", $"o_orderkey")
      val run = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
      val full = Window.partitionBy($"o_custkey")
      Tables.load(s, dir, "orders")
        .withColumn("first_seen",
          when(row_number().over(byPair) === 1, 1L).otherwise(0L))
        .select($"o_orderkey", $"o_custkey",
          sum($"first_seen").over(run).cast("long").as("prio_distinct_todate"),
          max(sum($"first_seen").over(run)).over(full).cast("long")
            .as("prio_distinct_all"))
    }),

    // §2.2: DuckDB LIST COMPREHENSIONS — `[f(x) FOR x IN l IF p(x)]` is
    // the spelling a migrating user's list code actually arrives in;
    // Spark's twin is transform∘filter. The numeric branch pins the
    // generate_series ↔ sequence trap: the upper bound stays ≥ 1 here
    // because sequence(1, 0) yields a DESCENDING [1, 0] where DuckDB's
    // generate_series(1, 0) is empty (the weightedSample divergence).
    // Both list results reduce through array_join per the stringify rule
    // above (comprehension order is well-defined: source order), so the
    // face emits scalar columns only.
    "q_list_comprehension" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          expr("array_join(transform(" +
            "filter(split(text, ' '), x -> length(x) > 4)," +
            " x -> upper(x)), ' ')").as("long_upper"),
          expr("array_join(transform(sequence(1, cast(doc_id % 5 + 1 as int))," +
            " j -> cast(cast(j as bigint) * j as string)), ',')").as("squares"))
    }),

    // §2.12: IGNORE NULLS navigation — the gap-fill idiom: last non-null
    // before me (forward fill) and first non-null from me on (backward
    // fill). Spark spells IGNORE NULLS as the boolean arg of first/last
    // over explicit frames; DuckDB as the SQL modifier. NULLs are planted
    // deterministically (error events), order is total per user.
    "q_ignore_nulls" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val ev = Tables.load(s, dir, "events")
        .filter($"user_id" <= 300)
        .withColumn("v", when($"event_type" === "error", lit(null)
          .cast("double")).otherwise($"value"))
      ev.select($"user_id", $"event_id", $"v",
        last($"v", ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("ffill"),
        first($"v", ignoreNulls = true)
          .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("bfill"))
    }),

    // §2.12: ordered string aggregation (LISTAGG WITHIN GROUP — the
    // reporting staple): per market segment, the first 5 customer names in
    // key order, pipe-joined. Explicit ORDER BY makes the concatenation
    // deterministic cross-engine.
    "q_string_agg" -> ((s, dir) => {
      import s.implicits._
      val top5 = Tables.load(s, dir, "customer")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"c_mktsegment").orderBy($"c_custkey")))
        .filter($"rn" <= 5)
      top5.groupBy($"c_mktsegment")
        .agg(expr("listagg(c_name, '|') within group (order by c_custkey)")
            .as("names"),
          count(lit(1)).as("n"))
    }),

    // §2.15: DuckDB `histogram(x)` MAP aggregate — value→count maps are
    // the spelling DuckDB profiling snippets arrive in; the Spark twin
    // builds a GENUINE MapType (map_from_entries over the sorted cell
    // list) and flattens it back with explode, so both the construction
    // and the flattening direction of the map surface are pinned. Counts
    // come from one exact aggregate; the map layer is bounded by the
    // value dictionary, never the data.
    "q_histogram_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_linestatus".as("st"), $"l_returnflag".as("flag"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"st")
        .agg(map_from_entries(
          sort_array(collect_list(struct($"flag", $"cnt")))).as("m"))
        .select($"st", explode($"m").as(Seq("flag", "cnt")))
    }),

    // §2.15: `product()` aggregate — DuckDB's multiplicative fold (here:
    // compound remaining-value share Π(1 − discount) per flag/month).
    // Double multiplication is NOT associative-under-rounding, so the
    // portable spelling folds in an EXPLICIT total order on both engines
    // (list_reduce over list(... ORDER BY) ≡ aggregate over sort_array)
    // — DuckDB's bare product() folds in scan order and can differ from
    // itself across runs. The sort key includes v: the testdata's
    // (orderkey, linenumber) is NOT unique (11.8k dup pairs at sf0.01),
    // and any order ambiguity left after v is between EQUAL multiplicands
    // — bit-neutral. Group state is month-bounded; at corpus scale
    // the log-domain sum (one exp at the end) is the documented
    // alternative when exactness is traded for mergeability.
    "q_product_agg" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_returnflag".as("flag"),
          date_trunc("month", $"l_shipdate").cast("date").as("month"),
          $"l_orderkey", $"l_linenumber",
          (lit(1.0) - $"l_discount").as("v"))
        .groupBy($"flag", $"month")
        .agg(count(lit(1)).as("n_items"),
          sort_array(collect_list(struct($"l_orderkey", $"l_linenumber",
            $"v"))).as("vs"))
        .selectExpr("flag", "month", "n_items",
          "aggregate(vs, cast(1.0 as double), (a, x) -> a * x.v)" +
            " AS value_share")
    }),

    // §2.15: FROM-first syntax — the DuckDB dialect a migrating user's
    // ad-hoc queries actually arrive in (`FROM t SELECT ... GROUP BY
    // ALL`); Spark has no FROM-first parse, so the translation is the
    // standard SELECT with the same GROUP BY ALL inference. The oracle
    // runs the genuine FROM-first spelling.
    "q_from_first" -> ((s, dir) => {
      import s.implicits._
      val d284 = DecimalType(28, 4)
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag".as("flag"), $"l_linestatus".as("st"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum($"l_quantity".cast(d284)).cast("double").as("qty"))
    }),

    // §2.15: COLLATE NOCASE translation — DuckDB attaches collations to
    // expressions (grouping, equality, ordering under NOCASE); Spark has
    // no collation clause at this surface, so the translation keys on
    // lower(x) while the class REPRESENTATIVE stays the binary min (a
    // deterministic member — an arbitrary-representative output would
    // hash-differ run to run). Case noise is PLANTED from doc_id (the
    // corpus ships lowercase); the oracle runs the genuine
    // `GROUP BY x COLLATE NOCASE` + a NOCASE equality.
    "q_collate" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          when($"doc_id" % 3 === 0, upper($"lang")).otherwise($"lang")
            .as("lang2"))
        .groupBy(lower($"lang2").as("key_ci"))
        .agg(min($"lang2").as("class_rep"),
          count(lit(1)).as("n_docs"),
          sum(when($"lang2" === "en", 1L).otherwise(0L)).cast("long")
            .as("n_exact_en"))
        .withColumn("is_en_nocase", lower($"class_rep") === "en")
    }),

    // §2.12: argmin/argmax + bitwise aggregates — min_by/max_by keyed by
    // the UNIQUE o_orderkey (ties impossible ⇒ deterministic), bit
    // AND/OR/XOR folds over the key set (associative+commutative integer
    // ops, shuffle-order-proof)
    "q_argminmax" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(
          min_by($"o_orderdate", $"o_orderkey").as("first_date"),
          max_by($"o_orderdate", $"o_orderkey").as("last_date"),
          min($"o_orderkey").as("min_key"),
          bit_and($"o_orderkey").as("key_and"),
          bit_or($"o_orderkey").as("key_or"),
          bit_xor($"o_orderkey").as("key_xor"))
    }),

    // §2.2 #30: having / post-aggregation filter
    "q_having" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum_dec_exact($"o_totalprice", 2).cast("double").as("spend"))
        .filter($"n_orders" >= 3)
    }),

    // §2.2 #31: string functions
    "q_string_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .filter($"c_name".like("%1%"))
        .select(
          $"c_custkey",
          upper($"c_name").as("name_upper"),
          substring($"c_name", 1, 8).as("name_prefix"),
          length($"c_name").as("name_len"),
          concat($"c_mktsegment", lit("/"), $"c_name").as("seg_name"))
    }),

    // The SECOND string tier a migrating user hits within the hour:
    // split_part / reverse / lpad / translate / repeat / position — all
    // ASCII-deterministic over customer. split_part and strpos/instr
    // carry the same 1-based conventions on both engines.
    "q_string_funcs2" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .select(
          $"c_custkey",
          expr("split_part(c_name, '#', 2)").as("name_num"),
          reverse($"c_mktsegment").as("seg_rev"),
          lpad($"c_mktsegment", 12, "*").as("seg_pad"),
          translate($"c_mktsegment", "AEIOU", "aeiou").as("seg_tr"),
          expr("repeat(substring(c_mktsegment, 1, 2), 3)").as("seg_rep"),
          expr("CAST(instr(c_name, '#') AS BIGINT)").as("hash_pos"))
    }),

    // §2.2: printf-style formatting — report/label generation.
    // Spark `format_string` and DuckDB `printf` share C printf
    // semantics for %s / zero-padded %d / %x (both lowercase hex via
    // the same conversion), so the translation is spelling-only.
    // Integer conversions only: %f rounding is engine-library-defined
    // (Java HALF_UP vs fmt round-half-even) and belongs to the
    // decimal-cast discipline every agg face already follows.
    "q_format_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 1000)
        .select(
          $"o_orderkey",
          format_string("ORD-%08d", $"o_orderkey").as("order_tag"),
          format_string("%s/%d", $"o_orderpriority",
            year($"o_orderdate")).as("prio_year"),
          lower(hex($"o_orderkey")).as("key_hex"),
          format_string("%x", $"o_custkey").as("cust_hex"),
          concat(expr("repeat('#', CAST(o_orderkey % 5 AS INT) + 1)"),
            lit("|")).as("bar"))
    }),

    // §2.2: edit distance — fuzzy matching's scalar core, native on both
    // engines with identical unit-cost semantics (`levenshtein`). The
    // candidate-pair framing (dd_editdist) owns the scale story; this is
    // the scalar function-parity face, including the Spark 3.5+ bounded
    // form (threshold k ⇒ early-exit, -1 past k) spelled portably via
    // CASE for the oracle.
    "q_levenshtein" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .filter($"c_custkey" <= 500)
        .select(
          $"c_custkey",
          expr("CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT)")
            .as("d_ref"),
          expr("CAST(levenshtein(c_mktsegment, c_name) AS BIGINT)")
            .as("d_cols"),
          expr("""CAST(CASE WHEN levenshtein(c_mktsegment, 'BUILDING') <= 3
                       THEN levenshtein(c_mktsegment, 'BUILDING')
                       ELSE -1 END AS BIGINT)""").as("d_capped"))
    }),

    // §2.2: string-similarity scalar family — the fuzzy-matching functions
    // a DuckDB user calls by name (jaro/jaro-winkler, UNRESTRICTED
    // damerau-levenshtein, hamming, char-set jaccard) that Spark's builtin
    // surface lacks. Native codegen expressions (functions/StringSim.scala)
    // with semantics pinned bit-exact to the oracle engine by a 20k-pair
    // fuzz; doubles ship unrounded because the operation order matches.
    "q_string_similarity" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.GraftFunctions._
      Tables.load(s, dir, "part")
        .filter($"p_partkey" <= 600)
        .select(
          $"p_partkey",
          jaro_similarity($"p_name", $"p_type").as("jaro_name_type"),
          jaro_winkler_similarity($"p_name", lit("goldenrod lavender spring"))
            .as("jw_ref"),
          damerau_levenshtein($"p_brand", lit("Brand#13")).cast("long")
            .as("dl_brand"),
          damerau_levenshtein($"p_type", lit("STANDARD ANODIZED TIN"))
            .cast("long").as("dl_type"),
          hamming(rpad($"p_name", 6, "_"), rpad($"p_type", 6, "_"))
            .cast("long").as("ham6"),
          char_jaccard($"p_name", $"p_type").as("jac_name_type"))
    }),

    // §2.2: time-INTERVAL RANGE frames — the trailing-window idiom
    // ("7-day running total per user") as a native interval frame on BOTH
    // engines (verbatim SQL; q_window_range owns the numeric-RANGE form).
    // Peers by event time include ties identically; decimal-exact sum.
    "q_window_time_range" -> ((s, dir) => {
      Tables.load(s, dir, "events").createOrReplaceTempView("graft_ev_tr")
      s.sql(
        """SELECT user_id, event_id,
                  CAST(CAST(sum(cast(value AS decimal(18,4))) OVER (
                    PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
                    AS STRING) AS DOUBLE) AS v7d
           FROM graft_ev_tr""")
    }),

    // §2.2: strftime token translation — DuckDB's %-tokens ↔ Spark's
    // DateTimeFormatter patterns (%Y-%m-%d %H:%M:%S → yyyy-MM-dd HH:mm:ss,
    // %A → EEEE, %b → MMM, %j → DDD); ISO week (%V) maps to weekofyear()
    // + lpad, NOT date_format('w') which is locale-dependent week-of-year.
    "q_strftime" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 2000)
        .select($"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("ymd"),
          date_format($"o_orderdate", "EEEE").as("dayname"),
          date_format($"o_orderdate", "MMM dd, yyyy").as("pretty"),
          date_format($"o_orderdate", "DDD").as("doy"),
          lpad(weekofyear($"o_orderdate").cast("string"), 2, "0")
            .as("isoweek"))
    }),

    // §2.2: strptime TOKEN translation — parsing, the migration twin of
    // q_strftime's rendering: DuckDB C-style %-tokens ↔ Spark
    // DateTimeFormatter patterns (%d/%m/%Y %H:%M ↔ dd/MM/yyyy HH:mm,
    // %Y-%m-%dT%H:%M:%S ↔ yyyy-MM-dd'T'HH:mm:ss, %b %d, %Y ↔
    // MMM dd, yyyy — English month abbreviations on both engines).
    // Round-tripped: each engine parses strings it RENDERED itself with
    // the certified q_strftime translation, so a token drift on either
    // side of either direction breaks the face.
    "q_strptime" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 2000)
        .select($"o_orderkey",
          date_format($"o_orderdate", "dd/MM/yyyy HH:mm").as("s1"),
          date_format($"o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").as("s2"),
          date_format($"o_orderdate", "MMM dd, yyyy").as("s3"))
        .select($"o_orderkey", $"s1", $"s2", $"s3",
          to_timestamp($"s1", "dd/MM/yyyy HH:mm").as("t1"),
          to_timestamp($"s2", "yyyy-MM-dd'T'HH:mm:ss").as("t2"),
          to_date($"s3", "MMM dd, yyyy").as("d3"))
    }),

    // §2.2: regexp_replace SEMANTICS translation — the two migration
    // traps: DuckDB replaces the FIRST match unless 'g' (Spark always
    // replaces all; first-only spells as a lazy-prefix whole-string
    // rewrite with (?s) so newlines can't break the anchor), and
    // backreferences are \1 in DuckDB vs $1 in Spark.
    "q_regexp_replace" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          regexp_replace($"text", "[0-9]+", "#").as("all_nums"),
          regexp_replace($"text", "(?s)^(.*?)[0-9]+(.*)$", "$1#$2")
            .as("first_num"),
          regexp_replace($"text", "(\\w+) (\\w+)", "$2 $1")
            .as("swapped"))
    }),

    // §2.2: Unicode scalar surface — strip_accents (native expression;
    // Spark has no builtin), codepoint round trips (ascii ↔ unicode on
    // BMP chars, char ↔ chr).
    "q_unicode_funcs" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.GraftFunctions.strip_accents
      Tables.load(s, dir, "customer")
        .filter($"c_custkey" <= 500)
        .select($"c_custkey",
          strip_accents(concat(lit("Café Münster naïve — "), $"c_name"))
            .as("plain"),
          ascii(substring($"c_name", 1, 1)).cast("long").as("cp_first"),
          expr("char(65 + CAST(c_custkey % 26 AS INT))").as("letter"))
    }),

    // §2.2: BLOCKED fuzzy join — record linkage's standard shape: a cheap
    // equi-join on a blocking key (first name word) bounds the candidate
    // set, then the expensive similarity (native jaro-winkler, bit-exact
    // cross-engine) filters within blocks. Never O(n²): candidates =
    // Σ C(block,2), and the blocking key is an ordinary shuffle/broadcast
    // equi-join key at any scale.
    "q_fuzzy_join" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.GraftFunctions._
      // fixed-size probe slice at every SF: the linkage OUTPUT grows
      // quadratically within blocks (20k parts → 3.1M pairs at this
      // threshold), and a verification face must stay comparison-sized —
      // the scale story is the blocked plan shape, not output volume
      val p = Tables.load(s, dir, "part")
        .filter($"p_partkey" <= 2000)
        .select($"p_partkey", $"p_name",
          substring_index($"p_name", " ", 1).as("blk"))
      val a = p.select($"p_partkey".as("a_key"), $"p_name".as("a_name"), $"blk")
      val b = p.select($"p_partkey".as("b_key"), $"p_name".as("b_name"), $"blk")
      a.join(b, Seq("blk"))
        .filter($"a_key" < $"b_key")
        .withColumn("jw", jaro_winkler_similarity($"a_name", $"b_name"))
        .filter($"jw" > 0.92)
        .select($"a_key", $"b_key", $"jw")
    }),

    // §2.2: scalar bitwise surface — shifts, and/or/xor/not, popcount.
    // (q_argminmax owns the bitwise AGGREGATES; these are the scalar
    // ops.) Both engines define them on BIGINT two's complement, so
    // results are exact integers.
    "q_bitwise_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 1000)
        .select(
          $"o_orderkey",
          shiftleft($"o_orderkey", 3).as("shl3"),
          shiftright($"o_orderkey", 2).as("shr2"),
          ($"o_orderkey".bitwiseAND($"o_custkey")).as("k_and"),
          ($"o_orderkey".bitwiseOR($"o_custkey")).as("k_or"),
          ($"o_orderkey".bitwiseXOR($"o_custkey")).as("k_xor"),
          expr("~o_orderkey").as("k_not"),
          expr("CAST(bit_count(o_orderkey) AS BIGINT)").as("popcnt"))
    }),

    // §2.2 #32: date/time bucketing on the events stream table
    "q_time_bucket" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n_events"), sum_dec_exact($"value", 4).cast("double").as("total_value"))
    }),

    // §2.2 #33: null handling — outer-join nulls through coalesce/null-safe agg
    "q_null_handling" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val ord = Tables.load(s, dir, "orders").filter($"o_totalprice" > 250000.0)
      cust.join(ord, $"c_custkey" === $"o_custkey", "left")
        .select(
          $"c_custkey",
          coalesce($"o_orderpriority", lit("NO-BIG-ORDER")).as("priority"),
          when($"o_orderkey".isNull, 0).otherwise(1).as("has_big_order"))
        .groupBy($"priority")
        .agg(count(lit(1)).as("n"), sum($"has_big_order").as("n_matched"))
    }),

    // §2.2 #34: rollup (hierarchical grouping sets)
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), sum_dec_exact($"l_quantity", 2).cast("double").as("qty"))
    }),

    // §2.2 #35: same surface via spark.sql over registered views
    "q_sql_api" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT n_name,
               count(*) AS n_customers,
               CAST(CAST(sum(cast(c_acctbal AS decimal(18,2))) AS STRING) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
      """)
    }),

    // §2.15: ATTACH / multi-database queries (r14 VERDICT missing #4,
    // the last item) — DuckDB's `ATTACH ... AS att` + `att.t` qualified
    // identifiers ↔ Spark's catalog databases: a second database is
    // CREATEd at its own location, dim tables land in it via
    // saveAsTable, and ONE statement joins across database boundaries
    // (att.nation_dim ⋈ att.region_dim ⋈ the session-catalog fact
    // view). The oracle runs the genuine ATTACH ':memory:' AS att and
    // the same cross-database join. Catalyst plans the qualified scans
    // like any other relation — the dims broadcast under AQE exactly as
    // the single-catalog q05 shape does.
    "q_attach_join" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      // create the database (and its location) only once per catalog —
      // CREATE DATABASE IF NOT EXISTS ignores a new LOCATION anyway, so
      // an unconditional temp dir would just orphan one per invocation
      // (r15 review)
      if (!s.catalog.databaseExists("att")) {
        val loc = graft.Scratch
          .dir("graft_att_db_").toString
        s.sql(s"CREATE DATABASE IF NOT EXISTS att LOCATION '$loc'")
      }
      Tables.load(s, dir, "nation")
        .write.mode("overwrite").saveAsTable("att.nation_dim")
      Tables.load(s, dir, "region")
        .write.mode("overwrite").saveAsTable("att.region_dim")
      s.sql("""
        SELECT r.r_name,
               count(*) AS n_customers,
               CAST(CAST(sum(cast(c_acctbal AS decimal(18,2))) AS STRING)
                 AS DOUBLE) AS total_acctbal
        FROM customer c
        JOIN att.nation_dim n ON c.c_nationkey = n.n_nationkey
        JOIN att.region_dim r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
      """)
    }),

    // LIMIT/OFFSET pagination over a TOTAL order — the API-backend
    // staple; OFFSET landed in Spark 3.4, so the statement runs verbatim
    // on both engines. The (o_orderdate, o_orderkey) order is total, so
    // page 3 is the same 20 rows everywhere.
    "q_pagination" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        ORDER BY o_orderdate, o_orderkey
        LIMIT 20 OFFSET 40
      """)
    }),

    // NULL ORDERING pinned explicitly — the silent migration gotcha:
    // Spark defaults to NULLS FIRST on ASC, DuckDB to NULLS LAST, so any
    // unannotated ORDER BY over a nullable key silently reorders between
    // engines. The face takes the defaults OFF the table: both
    // directions annotated, positions emitted as row numbers, nullable
    // key derived so the data genuinely exercises it. Since r12 the
    // positions ride [[graft.operators.Ranked.withGlobalRowNumber]] —
    // the range partitioner carries the same NULLS FIRST/LAST SortOrder
    // as the per-slice window, so the global ranks honor the annotated
    // ordering with no unpartitioned window.
    "q_null_ordering" -> ((s, dir) => {
      val k = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("o_orderkey") % 100).as("nk"))
      graft.operators.Ranked.withGlobalRowNumber(
        graft.operators.Ranked.withGlobalRowNumber(k, "pos_nulls_first",
          Seq(col("nk").asc_nulls_first, col("o_orderkey").asc)),
        "pos_nulls_last",
        Seq(col("nk").asc_nulls_last, col("o_orderkey").asc))
        .select(col("o_orderkey"), col("nk"), col("pos_nulls_first"),
          col("pos_nulls_last"))
    }),

    // The NOT IN / NOT EXISTS NULL trap, pinned as data: the same
    // "orders with no matching high-balance customer" question asked
    // both ways over a subquery that CONTAINS a NULL key. Standard SQL
    // (both engines): NOT IN returns UNKNOWN for every probe once the
    // list holds a NULL → zero rows; NOT EXISTS ignores the NULL row →
    // the real answer. The face emits both counts so the migration trap
    // is a verified fact, not a footnote.
    "q_not_in_nulls" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        WITH keys AS (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
          FROM customer WHERE c_acctbal < 0 OR c_acctbal > 9000
        )
        SELECT
          (SELECT count(*) FROM orders
           WHERE o_custkey NOT IN (SELECT k FROM keys)) AS not_in_n,
          (SELECT count(*) FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = o.o_custkey))
            AS not_exists_n
      """)
    }),

    // RELATIONAL DIVISION — "users who did ALL five event types": the
    // classic ÷ operator compiles to one distinct-pair aggregate +
    // HAVING count = |divisor| (no N-way self-join). The divisor count
    // derives from the data on both sides, so the face survives schema
    // growth.
    "q_rel_division" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT user_id,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events
        GROUP BY user_id
        HAVING count(DISTINCT event_type) =
               (SELECT count(DISTINCT event_type) FROM events)
      """)
    }),

    // GROUP BY ALL — the DuckDB-originated sugar a migrating user types
    // on day one; Spark adopted it in 3.4, so the SAME statement runs on
    // both engines (the oracle uses the sugar too). Plans identically to
    // the explicit GROUP BY (analysis-time rewrite).
    "q_group_by_all" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(CAST(sum(cast(l_extendedprice * (1 - l_discount)
                 AS decimal(18,4))) AS STRING) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY ALL
      """)
    }),

    // §2.8: lead/lag navigation — per-user inter-event gaps (the
    // sessionization primitive expressed as a window). Gaps stay in exact
    // microsecond longs: a seconds division would round differently across
    // engines.
    "q_window_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("prev_id", lag($"event_id", 1).over(w))
        .withColumn("gap_us",
          unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        .select($"user_id", $"event_id", $"prev_id", $"gap_us")
    }),

    // §2.8: GROUPING SETS beyond rollup/cube — the two marginals without
    // the (flag, status) cross, plus grouping_id to disambiguate the nulls
    "q_grouping_sets" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS bigint) AS gid,
               count(*) AS n,
               CAST(CAST(sum(cast(l_quantity AS decimal(18,2))) AS STRING) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      """)
    }),

    // §2.8: correlated scalar subqueries — orders above 1.5x their
    // customer's average order value (each decorrelates to an aggregate +
    // join under Catalyst). The comparison is INTEGER-EXACT on both
    // engines: price > 1.5*avg rewritten as 2*n*cents > 3*sum_cents, so a
    // boundary-hitting order can't flip on cross-engine float rounding.
    "q_scalar_subquery" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT o_orderkey, o_custkey,
               cast(o_totalprice AS double) AS price
        FROM orders o
        WHERE cast(round(o_totalprice * 100) AS bigint)
              * (SELECT 2 * count(*) FROM orders o2
                 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT 3 * sum(cast(round(o2.o_totalprice * 100) AS bigint))
                 FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      """)
    }),

    // §2.9: unpivot (melt) — the inverse of q_pivot: a wide per-flag
    // aggregate melts to (id, metric, value) rows through Spark's native
    // Expand (one pass, rows × metrics, no join).
    "q_unpivot" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          sum_dec_exact($"l_quantity", 2).cast("double").as("sum_qty"),
          sum_dec_exact($"l_extendedprice", 2).cast("double").as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
        .unpivot(Array($"l_returnflag"),
          Array($"sum_qty", $"sum_price", $"n_items"), "metric", "value")
    }),

    // §2.2: DYNAMIC unpivot — DuckDB `UNPIVOT t ON COLUMNS(* EXCLUDE
    // (id))` melts every non-id column WITHOUT naming them (the
    // schema-evolution-proof spelling; q_unpivot pins the explicit-list
    // form). Spark's twin derives the value-column list from the runtime
    // schema — the same two-pass posture as dynamic PIVOT (#397).
    "q_unpivot_dynamic" -> ((s, dir) => {
      import s.implicits._
      val wide = Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(round($"o_totalprice" * 100).cast("long")).cast("long")
            .as("cents"),
          countDistinct($"o_custkey").cast("long").as("n_custs"))
      val values = wide.columns.filterNot(_ == "o_orderpriority")
      wide.unpivot(Array($"o_orderpriority"), values.map(col),
        "metric", "val")
    }),

    // §2.9: batch MERGE/upsert — matched keys take the update's price,
    // new keys insert, everything else carries over; exactly one
    // full-outer shuffle join. Updates are every 10th order with an
    // integer-exact +1000.00 price bump; every 1000th updates under a
    // shifted key so inserts exercise the unmatched-update path.
    "q_upsert" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
      val updates = ord.filter($"o_orderkey" % 10 === 0)
        .select(
          ($"o_orderkey" + when($"o_orderkey" % 1000 === 0, 10000000L).otherwise(0L))
            .as("o_orderkey"),
          (dec2($"o_totalprice") + lit(BigDecimal("1000.00"))).cast("double")
            .as("o_totalprice"))
      graft.operators.Upsert.upsert(
          ord.select($"o_orderkey", $"o_totalprice", $"o_orderpriority"),
          updates, keys = Seq("o_orderkey"))
        .select($"o_orderkey", $"o_totalprice".cast("double").as("o_totalprice"),
          $"o_orderpriority")
    }),

    // §2.9: semi-structured JSON extraction — schema-on-read over the
    // events.props JSON strings (from_json with an explicit schema, the
    // idiomatic Spark shape: parse once in the projection, then plain
    // columnar aggregation; integer-exact aggregates for the oracle).
    "q_json_extract" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .withColumn("k", from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"),
          count(when($"k" >= 50, 1)).as("n_hi"))
    }),

    // §2.13: JSON tier 2 — nested paths, array subscripts, array length,
    // key listing. The document is CONSTRUCTED identically on both
    // engines (literal concat; engine JSON serializers differ in
    // whitespace/key order) and then pulled apart with each engine's
    // native path functions (get_json_object/json_object_keys ↔
    // json_extract_string/json_keys).
    "q_json_funcs2" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" <= 2000)
        .withColumn("j", concat(
          lit("{\"id\": "), $"o_orderkey",
          lit(", \"tags\": [\""), $"o_orderpriority",
          lit("\", \""), $"o_orderstatus",
          lit("\"], \"cust\": {\"key\": "), $"o_custkey", lit("}}")))
        .select($"o_orderkey",
          get_json_object($"j", "$.cust.key").as("cust_key"),
          get_json_object($"j", "$.tags[1]").as("tag2"),
          json_array_length(get_json_object($"j", "$.tags"))
            .cast("long").as("n_tags"),
          concat_ws(",", json_object_keys($"j")).as("keys"))
    }),

    // §2.9: window distribution/navigation family — ntile, percent_rank,
    // cume_dist, first/last/nth_value. The order key includes the unique
    // p_partkey so every function is deterministic, and percent_rank /
    // cume_dist are exact small-integer divisions — bit-identical IEEE
    // doubles in any engine. last/nth use an explicit full frame (the
    // default RANGE frame stops at CURRENT ROW).
    "q_window_dist" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "part")
        .withColumn("tile4", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("first_pk", first($"p_partkey").over(w))
        .withColumn("last_pk", last($"p_partkey").over(wFull))
        .withColumn("second_pk", nth_value($"p_partkey", 2).over(wFull))
        .select($"p_brand", $"p_partkey", $"p_retailprice",
          $"tile4", $"pct_rank", $"cume", $"first_pk", $"last_pk", $"second_pk")
    }),

    // §2.13: recursive CTE (WITH RECURSIVE → Catalyst UnionLoop) — the
    // iterative-query surface in ONE declarative statement instead of a
    // driver-side loop: walk the implicit part hierarchy (parent =
    // p_partkey DIV 10) from the roots and aggregate per depth. The
    // recursion depth is data-bounded (4 levels at every SF), far under
    // spark.sql.cteRecursionLevelLimit; each iteration is one hash join,
    // so the plan scales exactly like the bounded-round graph sweeps.
    "q_recursive_cte" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        WITH RECURSIVE chain AS (
          SELECT p_partkey AS id, 0 AS depth FROM part WHERE p_partkey < 10
          UNION ALL
          SELECT p.p_partkey AS id, c.depth + 1 AS depth
          FROM part p JOIN chain c ON p.p_partkey DIV 10 = c.id
          WHERE p.p_partkey >= 10
        )
        SELECT depth, count(*) AS n_parts,
               cast(sum(id) AS bigint) AS sum_id
        FROM chain GROUP BY depth
      """)
    }),

    // §2.13: TPC-H Q21 shape — the double-correlated EXISTS + NOT EXISTS
    // on the SAME table: suppliers whose returned ('R') line is the only
    // returned line in a multi-supplier finished order. Expressed with
    // left-semi + left-anti joins (exactly what Catalyst decorrelates
    // EXISTS subqueries into), so the plan is two shuffled semi/anti hash
    // joins on l_orderkey — no per-row subquery re-execution.
    "q21_waiting_supplier" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val l1 = li.filter($"l_returnflag" === "R")
        .join(Tables.load(s, dir, "orders").filter($"o_orderstatus" === "F"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_orderkey", $"l_suppkey")
      val l2 = li.select($"l_orderkey".as("k2"), $"l_suppkey".as("s2"))
      val l3 = li.filter($"l_returnflag" === "R")
        .select($"l_orderkey".as("k3"), $"l_suppkey".as("s3"))
      l1.join(l2, $"l_orderkey" === $"k2" && $"l_suppkey" =!= $"s2", "left_semi")
        .join(l3, $"l_orderkey" === $"k3" && $"l_suppkey" =!= $"s3", "left_anti")
        .join(Tables.load(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
        .limit(20)
    }),

    // §2.13: TPC-H Q22 shape — scalar aggregate subquery feeding the
    // outer filter + NOT EXISTS anti join, grouped on a string suffix.
    // The above-average comparison is DECIMAL-EXACT (bal·n > sum as
    // decimals — a double average could flip a boundary customer across
    // engines); the one-row aggregate broadcasts, the anti join runs on
    // the urgent-order keys only.
    "q22_idle_customers" -> ((s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val stats = cust.filter($"c_acctbal" > 0.0)
        .agg(sum_dec_exact($"c_acctbal", 2).as("bal_sum"),
          count(lit(1)).as("bal_n"))
        .withColumn("__k", expr("pmod(bal_n, 1)"))
      val urgent = Tables.load(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      // 1-row stats frame joins on a DERIVED zero key — a keyless cross
      // join degrades to the BNLJ the audit flags
      cust.withColumn("__k", expr("pmod(cast(c_custkey as bigint), 1)"))
        .join(broadcast(stats), "__k")
        .filter(dec2($"c_acctbal") * $"bal_n" > $"bal_sum")
        .join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy(expr("substring(c_name, length(c_name), 1)").as("cgroup"))
        .agg(count(lit(1)).as("numcust"),
          sum_dec_exact($"c_acctbal", 2).cast("double").as("totacctbal"))
    }),

    // §2.13: TPC-H Q15 shape — aggregate, then select the rows attaining
    // the aggregate's MAX (the "create view revenue" query). The max is a
    // 1-row broadcast on a derived pmod key (BHJ, not BNLJ) and the
    // equality compares DECIMALS — a double max could miss the argmax row
    // cross-engine by one ulp.
    "q15_top_supplier" -> ((s, dir) => {
      import s.implicits._
      val rev = Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1997-01-01 00:00:00" &&
          $"l_shipdate" < "1997-04-01 00:00:00")
        .groupBy($"l_suppkey")
        .agg(sum_dec_exact($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
          .as("total_rev"))
      val mx = rev.agg(max($"total_rev").as("mx"))
        .withColumn("__k", expr("pmod(cast(mx as bigint), 1)"))
      rev.withColumn("__k", expr("pmod(cast(total_rev as bigint), 1)"))
        .join(broadcast(mx), "__k")
        .filter($"total_rev" === $"mx")
        .join(Tables.load(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          $"total_rev".cast("double").as("total_revenue"))
    }),

    // §2.13: TPC-H Q20 shape — nested grouped aggregation against a
    // correlated per-group total: suppliers carrying more than a fifth
    // of some part's shipped quantity. Decorrelates to two aggregates over
    // the same scan joined on the part key; the comparison is 5·sq > tq
    // in DECIMALS (boundary-exact), the supplier filter a semi join.
    "q20_dominant_supplier" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val perSupp = li.groupBy($"l_partkey", $"l_suppkey")
        .agg(sum_dec_exact($"l_quantity", 2).as("sq"))
      val perPart = li.groupBy($"l_partkey")
        .agg(sum_dec_exact($"l_quantity", 2).as("tq"))
      val dominant = perSupp.join(perPart, "l_partkey")
        .filter($"sq" * 5 > $"tq")
        .select($"l_suppkey").distinct()
      Tables.load(s, dir, "supplier")
        .join(dominant, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
    }),

    // §2.13: SLIDING (hopping) windows — every event lands in BOTH 2-hour
    // windows that cover it (hop 1 h), through Spark's native
    // window(ts, "2 hours", "1 hour") Expand (map-side fan-out, then one
    // grouped aggregate — never a range join). DuckDB mirrors by
    // unnesting the two covering window starts. Value sums in decimals.
    "q_hopping_window" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum_dec_exact($"value", 4).cast("double").as("total_value"))
        .select($"window.start".as("ws"), $"event_type",
          $"n_events", $"total_value")
    }),

    // §2.13: TPC-H Q4 shape — EXISTS over the fact table folded into a
    // per-priority count: the order-priority checking query (semi join +
    // group), with the date range pushed to the orders scan.
    "q04_order_priority" -> ((s, dir) => {
      import s.implicits._
      val ord = Tables.load(s, dir, "orders")
        .filter($"o_orderdate" >= "1997-01-01 00:00:00" &&
          $"o_orderdate" < "1997-04-01 00:00:00")
      val big = Tables.load(s, dir, "lineitem").filter($"l_quantity" > 45)
      ord.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    }),

    // §2.13: TPC-H Q18 shape — the large-volume-customer query: a grouped
    // HAVING subquery gates the fact table (semi join on the qualifying
    // order keys), then the surviving orders re-aggregate across a 3-way
    // join. The HAVING threshold and the re-aggregated quantity both sum
    // as DECIMALS; ordering runs on the exact decimal total price with a
    // key tiebreak.
    "q18_large_orders" -> ((s, dir) => {
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem")
      val bigKeys = li.groupBy($"l_orderkey")
        .agg(sum_dec_exact($"l_quantity", 2).as("__q"))
        .filter($"__q" > 230)
        .select($"l_orderkey".as("bk"))
      Tables.load(s, dir, "orders")
        .join(bigKeys, $"o_orderkey" === $"bk", "left_semi")
        .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .groupBy($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice")
        .agg(sum_dec_exact($"l_quantity", 2).as("__sumq"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
        .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
          $"o_totalprice".cast("double").as("total_price"),
          $"__sumq".cast("double").as("sum_qty"))
    }),

    // §2.13: NULL-SAFE equality join (<=> / IS NOT DISTINCT FROM) — plain
    // `=` drops every NULL-keyed row from a join silently; the null-safe
    // form matches NULL to NULL, which aggregation-to-aggregation
    // reconciliation over a nullable key genuinely needs. The key is made
    // nullable deterministically (nullif(k % 10, 7)), so the NULL group
    // must survive the join on both engines.
    "q_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select(expr("nullif(cast(get_json_object(props, '$.k') as bigint) % 10, 7)")
          .as("k"), $"event_type")
      val a = e.groupBy($"k").agg(count(lit(1)).as("n_all"))
      val b = e.filter($"event_type" === "click")
        .groupBy($"k".as("kb")).agg(count(lit(1)).as("n_click"))
      a.join(b, $"k" <=> $"kb", "left")
        .select($"k", $"n_all", $"n_click")
    }),

    // §2.13: EXCEPT ALL / INTERSECT ALL — the MULTISET set ops (plain
    // EXCEPT/INTERSECT dedup; the ALL forms subtract multiplicities),
    // folded to per-op row/key counts so the compare is order-free.
    "q_multiset_ops" -> ((s, dir) => {
      import s.implicits._
      // EXCEPT ALL / INTERSECT ALL as MULTIPLICITY ARITHMETIC: because the
      // R side is a filter of the same stream, per-key (n_all, n_ret)
      // determines both ops — except_all multiplicity = n_all − n_ret,
      // intersect_all = min(n_all, n_ret) — so ONE key-shuffle aggregate
      // replaces exceptAll + intersectAll (each a full-row shuffle) plus a
      // countDistinct Expand: 3 lineitem-sized exchanges → 1 (the second
      // groupBy moves only per-key count rows). Same oracle rows.
      val g = Tables.load(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_all"),
          sum(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("n_ret"))
      g.select(explode(array(
          struct(lit("except_all").as("op"),
            ($"n_all" - $"n_ret").as("m"),
            when($"n_all" > $"n_ret", 1L).otherwise(0L).as("k")),
          struct(lit("intersect_all").as("op"),
            least($"n_all", $"n_ret").as("m"),
            when($"n_ret" > 0L, 1L).otherwise(0L).as("k")))).as("x"))
        .groupBy($"x.op".as("op"))
        .agg(sum($"x.m").cast("long").as("n_rows"),
          sum($"x.k").cast("long").as("n_keys"))
    }),

    // §2.14: TPC-H Q2 shape — the MIN-COST SUPPLIER query: a correlated
    // min subquery over a 4-way join (part ⋈ offers ⋈ supplier ⋈ nation ⋈
    // region), decorrelated to a per-part min aggregate joined back on
    // (part, cost). The testdata has no partsupp table, so the offer cost
    // is derived: per (partkey, suppkey) the MINIMUM observed extended
    // price in lineitem, as an exact DECIMAL so the min and the equality
    // join back are boundary-exact. Ordering totalizes through
    // (s_acctbal DESC, s_name, p_partkey) — (s_name, p_partkey) is unique
    // per row, so the LIMIT cut is deterministic.
    "q02_min_cost" -> ((s, dir) => {
      import s.implicits._
      // dimension filters apply BEFORE the per-(part, supplier) cost
      // aggregate — min over the filtered subset equals filtering the
      // per-key mins (the keys are the join keys), and the fact aggregate
      // then runs over ~1/10th the rows. At 100 TB this ordering is the
      // difference between aggregating the corpus and aggregating the
      // selection.
      val supp = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.load(s, dir, "region")
          .filter($"r_name" === "ASIA")), $"n_regionkey" === $"r_regionkey")
      val pf = Tables.load(s, dir, "part")
        .filter($"p_size" <= 15 && $"p_type" === "STANDARD")
      val offers = Tables.load(s, dir, "lineitem")
        .join(pf.select($"p_partkey"), $"l_partkey" === $"p_partkey", "left_semi")
        .join(supp.select($"s_suppkey".as("__sk")), $"l_suppkey" === $"__sk",
          "left_semi")
        .groupBy($"l_partkey", $"l_suppkey")
        .agg(min(dec2($"l_extendedprice")).as("cost"))
        .join(pf, $"l_partkey" === $"p_partkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
      val minCost = offers.groupBy($"p_partkey".as("mk"))
        .agg(min($"cost").as("mc"))
      offers.join(minCost, $"p_partkey" === $"mk" && $"cost" === $"mc")
        .orderBy($"s_acctbal".desc, $"s_name", $"p_partkey")
        .limit(20)
        .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey",
          $"cost".cast("double").as("min_cost"))
    }),

    // §2.14: TPC-H Q7 shape — the VOLUME SHIPPING query: bidirectional
    // trade flow between two nations (customer side and supplier side each
    // resolve a nation through their own dimension copy), revenue by
    // (supp_nation, cust_nation, year). The two 25-row nation copies ride
    // broadcast; the OR of the two directions stays one filter, not a
    // union of two five-way joins.
    "q07_volume_shipping" -> ((s, dir) => {
      import s.implicits._
      val n1 = Tables.load(s, dir, "nation")
        .select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01 00:00:00" &&
          $"l_shipdate" < "1998-01-01 00:00:00")
        .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(Tables.load(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n1), $"c_nationkey" === $"ck")
        .join(broadcast(n2), $"s_nationkey" === $"sk")
        .filter(($"cust_nation" === "NATION_1" && $"supp_nation" === "NATION_2") ||
          ($"cust_nation" === "NATION_2" && $"supp_nation" === "NATION_1"))
        .groupBy($"supp_nation", $"cust_nation",
          year($"l_shipdate").cast("long").as("l_year"))
        .agg(sum_dec_exact($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
          .cast("double").as("revenue"))
    }),

    // §2.14: TPC-H Q8 shape — the MARKET SHARE query: within one region's
    // market for one part type, the share of revenue supplied by one
    // nation, per order year. The share ratio is emitted as its exact
    // numerator/denominator pair (both decimal sums cast to double at the
    // boundary) — a cross-engine decimal DIVISION would hang the compare
    // on rounding-rule differences, the two sums cannot.
    "q08_market_share" -> ((s, dir) => {
      import s.implicits._
      val custNation = Tables.load(s, dir, "nation")
        .join(broadcast(Tables.load(s, dir, "region")
          .filter($"r_name" === "AMERICA")), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("ck"))
      val suppNation = Tables.load(s, dir, "nation")
        .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part").filter($"p_type" === "ECONOMY"),
          $"l_partkey" === $"p_partkey")
        .join(Tables.load(s, dir, "orders")
          .filter($"o_orderdate" >= "1996-01-01 00:00:00" &&
            $"o_orderdate" < "1998-01-01 00:00:00"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables.load(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(custNation), $"c_nationkey" === $"ck")
        .join(Tables.load(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(suppNation), $"s_nationkey" === $"sk")
        .groupBy(year($"o_orderdate").cast("long").as("o_year"))
        .agg(
          sum_dec_exact(when($"supp_nation" === "NATION_6",
            $"l_extendedprice" * (lit(1) - $"l_discount"))
            .otherwise(lit(0.0)), 4).cast("double").as("mkt_num"),
          sum_dec_exact($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
            .cast("double").as("mkt_den"))
    }),

    // §2.14: TPC-H Q9 shape — the PRODUCT TYPE PROFIT query: profit =
    // revenue − cost per (supplier nation, order year) over a 5-way join,
    // part selection by substring. With no partsupp, cost proxies as 10%
    // of retail price × quantity; the whole per-row amount computes in
    // DOUBLE (bit-identical IEEE on both engines) and is cast to DECIMAL
    // BEFORE the sum, so the aggregate is shuffle-order-proof.
    "q09_product_profit" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part").filter($"p_name".contains("gear")),
          $"l_partkey" === $"p_partkey")
        .join(Tables.load(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(Tables.load(s, dir, "nation")),
          $"s_nationkey" === $"n_nationkey")
        .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name".as("nation"),
          year($"o_orderdate").cast("long").as("o_year"))
        .agg(sum_dec_exact($"l_extendedprice" * (lit(1) - $"l_discount") -
          $"p_retailprice" * $"l_quantity" * lit(0.1), 4)
          .cast("double").as("sum_profit"))
    }),

    // §2.14: TPC-H Q11 shape — the IMPORTANT STOCK query: per-part value
    // held by one nation's suppliers, kept where the group value exceeds a
    // fraction of the GLOBAL total (group HAVING vs global scalar). The
    // global total rides a 1-row broadcast on a pmod-derived key (a
    // literal key would constant-fold to a nested-loop join), and the
    // threshold compares value·1000 > total in exact decimals — no
    // fraction, no float boundary.
    "q11_important_parts" -> ((s, dir) => {
      import s.implicits._
      val vals = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "supplier")
          .join(broadcast(Tables.load(s, dir, "nation")
            .filter($"n_name" === "NATION_3")), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey"),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"l_partkey")
        .agg(sum_dec_exact($"l_extendedprice", 2).as("value"))
      val tot = vals.agg(sum($"value").as("total"))
        .withColumn("__k", expr("pmod(cast(total as bigint), 1)"))
      vals.withColumn("__k", expr("pmod(l_partkey, 1)"))
        .join(broadcast(tot), "__k")
        .filter($"value" * 1000 > $"total")
        .select($"l_partkey", $"value".cast("double").as("value"))
    }),

    // §2.14: TPC-H Q12 shape — the SHIPPING CHANNELS query: two-channel
    // CASE counts. The testdata has no shipmode/commitdate, so the channel
    // derives from the line number parity and the lateness predicate is
    // shipped ≥ 60 days after ordering — same shape: one fact join, one
    // group, two conditional counts per group.
    "q12_ship_channels" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1997-01-01 00:00:00" &&
          $"l_shipdate" < "1998-01-01 00:00:00")
        .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy(when($"l_linenumber" % 2 === 0, "EVEN").otherwise("ODD")
          .as("channel"))
        .agg(
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).cast("long").as("high_line_count"),
          sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).cast("long").as("low_line_count"))
    }),

    // §2.14: TPC-H Q13 shape — the CUSTOMER ORDER-COUNT DISTRIBUTION: a
    // LEFT join whose per-customer count(o_orderkey) keeps zero-order
    // customers (count of the null-extended column is 0, count(*) would
    // be 1 — the classic Q13 trap), re-grouped into a histogram of
    // customers per order count.
    "q13_order_distribution" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders")
          .filter($"o_orderpriority" =!= "4-NOT SPECIFIED"),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // §2.14: TPC-H Q16 shape — the PARTS/SUPPLIER RELATIONSHIP query:
    // distinct (part, supplier) pairs from the fact table, part-attribute
    // NOT-filters plus a size IN-list, suppliers NOT IN a derived
    // exclusion set (negative balance — the "complaints" stand-in) as an
    // anti join, then supplier counts per (brand, type, size) via
    // two-level aggregation (distinct-then-count — no countDistinct
    // Expand over the wide group key).
    "q16_parts_suppliers" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_partkey", $"l_suppkey")
        .join(Tables.load(s, dir, "part")
          .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
            $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34)),
          $"l_partkey" === $"p_partkey")
        .join(Tables.load(s, dir, "supplier")
          .filter($"s_acctbal" < 0).select($"s_suppkey".as("xk")),
          $"l_suppkey" === $"xk", "left_anti")
        .select($"p_brand", $"p_type", $"p_size".cast("long").as("p_size"),
          $"l_suppkey")
        .distinct()
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(count(lit(1)).as("supplier_cnt"))
    }),

    // §2.14: MAP-typed column surface — per user, pivot the event stream
    // into MAPS (event_type → count, event_type → value cents) and drive
    // the map higher-order family: map_filter (hot types), map_keys +
    // array_sort (canonical listing), map_zip_with (per-type integer
    // average), aggregate over map_values (folds). Output flattens to
    // scalars both engines compute exactly; all per-type division is
    // integral on POSITIVE operands (events.value > 0 — Spark `div`
    // truncates toward zero while DuckDB `//` floors, so a negative
    // operand would diverge). The maps build from ONE user-keyed
    // aggregate; every map op after that is map-side.
    "q_map_funcs" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(expr("cast(floor(value * 100) as bigint)")).as("cents"))
        .groupBy($"user_id")
        .agg(
          map_from_entries(collect_list(struct($"event_type", $"cnt")))
            .as("cm"),
          map_from_entries(collect_list(struct($"event_type", $"cents")))
            .as("vm"))
        .select($"user_id",
          size($"cm").cast("long").as("n_types"),
          expr("cast(size(map_filter(cm, (k, v) -> v >= 5)) as bigint)")
            .as("n_big"),
          expr("array_join(array_sort(map_keys(" +
            "map_filter(cm, (k, v) -> v >= 5))), ',')").as("big_types"),
          expr("aggregate(map_values(cm), cast(0 as bigint), " +
            "(a, x) -> a + x)").as("n_events"),
          expr("aggregate(map_values(map_zip_with(vm, cm, " +
            "(k, v, c) -> v div c)), cast(0 as bigint), (a, x) -> a + x)")
            .as("avg_cents_sum"))
    }),

    // §2.14: LATERAL explode-join — the semi-structured fan-out DuckDB
    // users spell as unnest: positions materialize through posexplode
    // (map-side Generate, no shuffle until the final aggregate), the
    // exploded tokens join a BROADCAST literal dimension, and the
    // aggregate keys on the parent row. Spark's split(" ") regex equals
    // DuckDB's string_split(' ') byte-for-byte (empty runs included), so
    // positions agree; the oracle mirrors with a zipped unnest +
    // generate_subscripts.
    "q_explode_join" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(("join", 1L), ("hash", 2L), ("scan", 3L),
        ("filter", 4L), ("merge", 5L), ("vector", 6L)).toDF("tok", "w")
      Tables.load(s, dir, "documents")
        .select($"doc_id", posexplode(split($"text", " ")))
        .withColumnRenamed("col", "tok")
        .filter($"pos" < 8)
        .join(broadcast(dim), "tok")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_hits"),
          sum($"w").cast("long").as("w_sum"),
          min($"pos").cast("long").as("min_pos"))
    }),

    // §2.14: positional (zip) join — DuckDB's POSITIONAL JOIN aligns two
    // relations row-by-row; the Spark translation that stays DETERMINISTIC
    // under partitioning is rank-by-explicit-order on each side joined on
    // the rank (monotonically_increasing_id is partition-dependent and
    // silently misaligns — the trap this face documents). Here: the top-N
    // and bottom-N order prices zipped per rank into a spread ladder; both
    // orderings totalize through the key tiebreak, and the rank windows
    // run over N-row limits, not the table.
    "q_positional_join" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val o = Tables.load(s, dir, "orders")
      val hi = o.orderBy($"o_totalprice".desc, $"o_orderkey").limit(100)
        .withColumn("rn", row_number().over(
          Window.orderBy($"o_totalprice".desc, $"o_orderkey")).cast("long"))
        .select($"rn", $"o_orderkey".as("hi_key"), $"o_totalprice".as("hi"))
      val lo = o.orderBy($"o_totalprice".asc, $"o_orderkey").limit(100)
        .withColumn("rn", row_number().over(
          Window.orderBy($"o_totalprice".asc, $"o_orderkey")).cast("long"))
        .select($"rn", $"o_orderkey".as("lo_key"), $"o_totalprice".as("lo"))
      hi.join(lo, "rn")
        .select($"rn", $"hi_key", $"lo_key",
          (dec2($"hi") - dec2($"lo")).cast("double").as("spread"))
    }),

    // §2.14: grouped limit — the per-group top-k pattern a DuckDB migrant
    // writes as `QUALIFY row_number() <= k`, spelled through spark.sql
    // (Spark has no QUALIFY clause; the subquery-filter form is the
    // canonical translation and plans identically: one key-partitioned
    // window, rank short-circuited by the filter). The ordering totalizes
    // via (o_totalprice DESC, o_orderkey), so the kept rows are unique;
    // RelationalPlanSpec pins row-identity against the native
    // per-partition top-k aggregate path.
    "q_group_limit" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("glim_orders")
      Tables.load(s, dir, "customer").createOrReplaceTempView("glim_customer")
      s.sql("""
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
          SELECT c_mktsegment, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY c_mktsegment
                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM glim_orders JOIN glim_customer ON o_custkey = c_custkey) t
        WHERE rn <= 3""")
    }),

    // §2.14: regexp surface — extraction (first match / capture group),
    // boolean match, and match counting, the most common string verbs in
    // data cleaning after split (r11 VERDICT "What's missing" #1). The
    // patterns stay in the character-class/quantifier subset Java regex
    // (Spark) and RE2 (DuckDB) interpret identically; no-match extraction
    // returns '' on both engines. Map-only — one codegen'd projection.
    "q_regexp_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "[A-Za-z]+", 0).as("first_word"),
          regexp_extract(col("text"), "([A-Za-z]+) ([A-Za-z]+)", 2)
            .as("second_word"),
          col("text").rlike("[0-9]").as("has_digit"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_numbers"))),

    // §2.14: correlated LATERAL subquery in FROM — the greatest-n-per-
    // group idiom a DuckDB migrant writes as `, LATERAL (SELECT ...
    // WHERE inner.k = outer.k ORDER BY ... LIMIT n)` (r11 VERDICT
    // "What's missing" #2). Spark 4 parses and DECORRELATES it: the
    // per-nation ORDER BY/LIMIT plans as one key-partitioned window with
    // a rank filter — no per-outer-row re-execution, same plan as
    // q_group_limit's QUALIFY translation. Dimension-keyed at any SF.
    "q_lateral_subquery" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM nation, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      """)
    }),

    // §2.14: TABLESAMPLE translation — DuckDB's `USING SAMPLE 10%` (and
    // Spark's own TABLESAMPLE) are engine-seeded and NONDETERMINISTIC, so
    // the migration-safe spelling both engines agree on is a key-hash
    // threshold: md5 of the row key, first 8 hex digits as an integer,
    // mod 100 against the sample percent (r11 VERDICT "What's missing"
    // #3). Deterministic across engines, runs, AND cluster layouts —
    // which no native TABLESAMPLE guarantees — and the predicate pushes
    // into the scan as a codegen'd filter.
    "q_tablesample" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(expr("pmod(CAST(conv(substring(md5(CAST(o_orderkey AS " +
          "STRING)), 1, 8), 16, 10) AS BIGINT), 100) < 10"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))),

    // §2.14: SELECT * EXCLUDE / REPLACE — DuckDB-only projection sugar
    // with no Spark twin (r11 VERDICT "What's missing" #4). The
    // translation a migrating user needs: EXCLUDE (c) = `.drop("c")`,
    // REPLACE (e AS c) = `.withColumn("c", e)` — position-preserving on
    // both engines. The oracle runs the literal EXCLUDE/REPLACE spelling
    // so the equivalence is pinned cross-engine, not just documented.
    "q_select_exclude" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .drop("c_name")
        .withColumn("c_acctbal",
          round(col("c_acctbal") * 100).cast("long"))),

    // §2.16: CREATE MACRO ↔ SQL UDF — the most common migration artifact
    // in real DuckDB codebases (r13 VERDICT "What's missing" #1). DuckDB
    // scalar macros (CREATE MACRO f(x) AS expr) and table macros
    // (... AS TABLE SELECT ...) translate to Spark 4 SQL UDFs:
    // CREATE TEMPORARY FUNCTION ... RETURNS <type> RETURN <expr> and
    // RETURNS TABLE(...) RETURN SELECT .... Both engines define the SAME
    // two macros and run the same statement through them; the oracle runs
    // the DuckDB-native spelling (the q_select_exclude convention). SQL
    // UDFs inline into the plan at analysis, so the scalar macro costs
    // nothing at runtime and the table macro plans exactly like its view.
    "q_create_macro" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_net_cents(
                 p DOUBLE, d DOUBLE, q DOUBLE)
               RETURNS BIGINT
               RETURN CAST(round(p * (1 - d) * q * 100) AS BIGINT)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_line_statuses(
                 flag STRING)
               RETURNS TABLE(l_linestatus STRING, n BIGINT)
               RETURN SELECT l_linestatus, count(*) AS n FROM lineitem
                      WHERE l_returnflag = flag GROUP BY l_linestatus""")
      s.sql("""SELECT m.l_linestatus, m.n, t.cents
               FROM graft_line_statuses('R') m
               JOIN (SELECT l_linestatus,
                            CAST(sum(graft_net_cents(
                              l_extendedprice, l_discount, l_quantity))
                              AS BIGINT) AS cents
                     FROM lineitem WHERE l_returnflag = 'R'
                     GROUP BY l_linestatus) t
               USING (l_linestatus)""")
    }),

    // §2.16: CREATE SEQUENCE / nextval ↔ distributed global ids — DuckDB
    // hands out surrogate keys with a sequence; the Spark translation is
    // the certified Ranked machinery (#327): a global row_number over the
    // same total order IS the dense id assignment, planned as the
    // distributed range-prefix, never a single-task window. The oracle
    // pins the equivalence by drawing nextval over the identical ORDER BY.
    "q_sequence" -> ((s, dir) =>
      graft.operators.Ranked.withGlobalRowNumber(
        Tables.load(s, dir, "documents").select(col("doc_id")),
        "id", Seq(col("doc_id").asc))),

    // §2.16: ENUM ↔ ordered dictionary — DuckDB enum columns are an
    // ordered value dictionary; the Spark translation keeps the SAME
    // dictionary as an array literal: encode = 1-based position, decode =
    // element_at. Schema-port fidelity: the codes equal DuckDB's
    // enum_range positions, so data written by either engine round-trips.
    "q_enum" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val dict = typedLit(langs)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          array_position(dict, col("lang")).as("code"))
        .withColumn("decoded",
          when(col("code") >= 1,
            element_at(dict, col("code").cast("int"))))
    }),

    // §2.16: COLUMNS('regex') pattern selection — completes the COLUMNS
    // family (#355 pins COLUMNS(*)): DuckDB applies one aggregate to
    // every column whose NAME matches a regex, with the "\0" rename
    // lambda; Spark's twin filters df.columns by the same regex and
    // builds the aliased aggregates programmatically. min/max move no
    // accumulated floats, so doubles compare exactly.
    "q_columns_regex" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val pat = java.util.regex.Pattern.compile("l_.*(price|discount|tax)")
      val cols = li.columns.filter(c => pat.matcher(c).matches()).toSeq
      val aggs = cols.map(c => min(col(c)).as(s"min_$c")) ++
        cols.map(c => max(col(c)).as(s"max_$c")) :+
        count(lit(1)).as("n")
      li.agg(aggs.head, aggs.tail: _*)
    }),

    // §2.16: grouped TOP-N VALUE aggregate — "the 3 largest/smallest
    // amounts per group" as an aggregate, not a rank window (DuckDB
    // spells it list_sort(list(x))[1:n]; 1.1+ has max(x, n) sugar).
    // Sorted VALUES are deterministic under ties, unlike top-n ROWS.
    // Spark translation here is the oracle-matching collect_list +
    // sort_array + element_at (group-sized state); the certified
    // k-bounded partial top-k aggregate (functions.topk_select, the ANN
    // selection) is the scale path when groups are corpus-sized.
    "q_arg_topn" -> ((s, dir) => {
      val c = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val desc = sort_array(collect_list(col("cents")), asc = false)
      val asc = sort_array(collect_list(col("cents")))
      c.groupBy(col("l_returnflag"))
        .agg(element_at(desc, 1).as("top1"), element_at(desc, 2).as("top2"),
          element_at(desc, 3).as("top3"),
          element_at(asc, 1).as("bot1"), element_at(asc, 2).as("bot2"),
          element_at(asc, 3).as("bot3"))
    }),

    // §2.16: UPDATE ... FROM — the join-update DML a migrating user's
    // maintenance scripts rely on (q_update pins the plain predicate
    // form). DuckDB updates rows in place from a joined source; the
    // Spark translation is the standard left join + conditional replace
    // (exactly what MERGE compiles to for matched-update-only), planned
    // as one shuffle-free broadcast or hash equi-join — no row-at-a-time
    // mutation.
    "q_update_from" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val corr = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      base.join(corr, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("n").isNotNull && col("o_orderstatus") === "F",
            col("cents") + col("n")).otherwise(col("cents")).as("cents"))
    }),

    // §2.16: DELETE ... USING — the join-delete twin of q_update_from
    // (q_delete pins the plain predicate form). DuckDB deletes the rows
    // that match a joined source; the Spark translation is a LEFT ANTI
    // join against the delete-key set — the retention-pipeline shape
    // pipeline_forget uses at the digest level, here as plain DML.
    "q_delete_using" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val victims = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")).distinct()
      base.join(victims, col("o_orderkey") === col("l_orderkey"),
        "left_anti")
    }),

    // §2.16: dynamic PIVOT — DuckDB's PIVOT without an IN-list infers the
    // value set from the data; Spark's DataFrame pivot(col) without a
    // values list runs the same two-pass inference (distinct scan, then
    // the pivot). q_pivot_sql pins the explicit-IN form; this pins the
    // inferred one. DuckDB emits 0 for empty cells where Spark emits
    // NULL — the coalesce is applied to the RUNTIME column list, keeping
    // the value set fully data-inferred.
    "q_pivot_dynamic" -> ((s, dir) => {
      val p = Tables.load(s, dir, "documents")
        .groupBy(col("source")).pivot("lang").count()
      p.select(p.columns.map(c =>
        if (c == "source") col(c)
        else coalesce(col(c), lit(0L)).as(c)): _*)
    }),

    // §2.14: struct construction + field access + unnest-of-struct — the
    // nested-type round trip (DuckDB struct_pack / u.field / unnest(list
    // of structs) ↔ Spark named_struct / rec.field / inline) that
    // completes the nested tier next to q_json_extract (read-side),
    // q_array_funcs (lambdas) and q_map_funcs. Bounded fan-out (2 rows
    // per order), exact int64 cents.
    "q_struct_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .select(col("o_orderkey"),
          expr("named_struct('status', o_orderstatus, 'cents', cents)")
            .as("rec"))
        .select(col("o_orderkey"), col("rec.status").as("status"),
          expr("inline(array(" +
            "named_struct('part', 'full', 'amt', rec.cents), " +
            "named_struct('part', 'half', 'amt', rec.cents div 2)))"))),

    // §2.15: UNION ALL BY NAME — DuckDB's by-name set op over drifted
    // schemas (reordered columns, one side missing a column → NULL).
    // Spark twin: `unionByName(…, allowMissingColumns = true)` — the
    // day-one operation for unioning snapshots whose schema evolved
    // (q_schema_evolution covers the read side only; this pins the set
    // op itself, r12 VERDICT "What's missing" #1).
    "q_union_by_name" -> ((s, dir) => {
      val a = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), col("o_orderstatus").as("status"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val b = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") % 11 === 0)
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
          col("o_orderkey"))
      a.unionByName(b, allowMissingColumns = true)
    }),

    // §2.15: ORDER BY ALL — the ordering twin of GROUP BY ALL (#291),
    // present in both engines; LIMIT makes the ordering semantically
    // observable to the oracle compare (the kept prefix depends on it).
    // (o_orderstatus, o_orderpriority) is unique per group, so ORDER BY
    // ALL is a total order and the LIMIT is deterministic (r12 VERDICT
    // "What's missing" #2).
    "q_order_by_all" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 9
      """)
    }),

    // §2.15: plain UPDATE — the first DML a warehouse user types. The
    // lake translation is copy-on-write: a conditional projection over
    // the full table (map-only, no shuffle); MERGE (#162) and CDC (#174)
    // already cover the keyed forms. The oracle runs DuckDB's literal
    // `UPDATE … WHERE` on a temp copy, pinning the translation against
    // the native DML, not against another SELECT (r12 VERDICT "What's
    // missing" #3).
    "q_update" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("cents",
          when(col("o_orderstatus") === "F" && col("o_orderkey") % 3 === 0,
            col("cents") + 500).otherwise(col("cents")))),

    // §2.15: plain DELETE — same posture as q_update: the translation is
    // an anti-filter that keeps rows where the predicate is FALSE *or
    // NULL* (DELETE only removes TRUE rows — the NOT IN trap's cousin,
    // q_not_in_nulls #298); the oracle runs DuckDB's literal `DELETE …
    // WHERE` on a temp copy.
    "q_delete" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(!coalesce(
          col("o_orderstatus") === "O" && col("o_orderkey") % 2 === 0,
          lit(false)))),

    // §2.15: window frame EXCLUDE (CURRENT ROW / GROUP / TIES) + GROUPS
    // mode translation. Spark has neither; the Spark spelling derives
    // each exclusion arithmetically from the base RANGE frame plus the
    // peer group's own aggregate (sum/count over PARTITION BY brand,
    // size), with count-based NULL handling for emptied frames. The
    // oracle runs DuckDB's NATIVE `EXCLUDE` clauses for the three
    // exclusion faces; GROUPS mode DuckDB 1.0 does not implement, so
    // both engines pin the dense_rank RANGE spelling that defines it
    // (r12 VERDICT "What's missing" #4).
    "q_frame_exclude" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          col("p_size").cast("long").as("p_size"),
          round(col("p_retailprice") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
        .rangeBetween(-5, 0)
      val peers = Window.partitionBy(col("p_brand"), col("p_size"))
      val g = Window.partitionBy(col("p_brand")).orderBy(col("p_size"))
      base
        .withColumn("s", sum(col("cents")).over(w))
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("peer_s", sum(col("cents")).over(peers))
        .withColumn("peer_n", count(lit(1)).over(peers))
        .withColumn("grp", dense_rank().over(g).cast("long"))
        .withColumn("gs", sum(col("cents")).over(
          Window.partitionBy(col("p_brand")).orderBy(col("grp"))
            .rangeBetween(-1, 0)))
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("cents"), col("gs"),
          when(col("cnt") > 1, col("s") - col("cents")).as("x_cur"),
          when(col("cnt") > col("peer_n"), col("s") - col("peer_s"))
            .as("x_grp"),
          (col("s") - col("peer_s") + col("cents")).as("x_ties"))
    }),

    // §2.15: window-function FILTER clause — DuckDB/Postgres allow
    // `agg(x) FILTER (WHERE c) OVER w`; Spark only allows FILTER on
    // GROUP BY aggregates (q_agg_filters). The translation: conditional
    // projection inside the window aggregate — count FILTER ⇒ running sum
    // of 0/1 (never NULL: the frame is never empty), sum FILTER ⇒
    // sum(CASE WHEN c THEN x END) (NULL until the first matching row,
    // exactly the FILTER semantics). Oracle runs the literal FILTER.
    "q_window_filter" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"), round(col("value") * 100).cast("long").as("cents"))
        .withColumn("n_buy",
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .over(w))
        .withColumn("v_cents",
          sum(when(col("event_type") === "view", col("cents"))).over(w))
        .select(col("user_id"), col("event_id"), col("n_buy"),
          col("v_cents"))
    }),

    // §2.15: named WINDOW clause — the `WINDOW w AS (...)` SQL sugar both
    // engines parse; run verbatim on both so a migrating user's window
    // definitions port untouched.
    "q_named_window" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""
        SELECT l_orderkey, l_linenumber,
               rank() OVER w AS rnk,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                 OVER w2 AS BIGINT) AS run_cents
        FROM lineitem
        WHERE l_orderkey <= 2000
        WINDOW w  AS (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice, l_orderkey, l_linenumber),
               w2 AS (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      """)
    }),

    // §2.15: COLUMNS(*) star-expressions — DuckDB applies one aggregate
    // to EVERY column with a rename lambda (`min(COLUMNS(*)) AS
    // "min_\0"`); Spark's twin is a programmatic map over df.columns.
    // The translation a migrating user needs for per-column profiling
    // one-liners; q_profile_full owns the deep version.
    "q_columns_star" -> ((s, dir) => {
      val df = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          col("p_size").cast("long").as("p_size"),
          round(col("p_retailprice") * 100).cast("long").as("cents"))
      val aggs = df.columns.map(c => min(col(c)).as(s"min_$c")) ++
        df.columns.map(c => max(col(c)).as(s"max_$c"))
      df.agg(aggs.head, aggs.tail: _*)
    }),

    // §2.15: timezone conversion — `convert_timezone` ↔ `AT TIME ZONE`,
    // the one calendar surface q_date_funcs/q_interval_funcs left
    // unpinned. Wall-clock hour in America/New_York (DST-crossing zone)
    // from UTC-pinned event timestamps; both engines resolve the same
    // IANA rules or the per-hour counts split (r12 VERDICT "What's
    // missing" #5).
    "q_timezone" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(expr("convert_timezone('UTC', 'America/New_York', " +
          "CAST(ts AS TIMESTAMP_NTZ))").as("ny_ts"))
        .groupBy(hour(col("ny_ts")).cast("long").as("ny_hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("ny_hour"), col("n")))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(CAST(sum(cast(l_quantity AS decimal(18,2))) AS STRING) AS DOUBLE) AS sum_qty,
         CAST(CAST(sum(cast(l_extendedprice AS decimal(18,2))) AS STRING) AS DOUBLE) AS sum_base_price,
         CAST(CAST(sum(cast(l_extendedprice*(1.0-l_discount) AS decimal(18,4))) AS STRING) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(sum(cast(l_quantity AS decimal(18,2))) AS STRING) AS DOUBLE)/count(*) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q06_filter_revenue" ->
      """SELECT CAST(CAST(sum(cast(l_extendedprice*l_discount AS decimal(18,4))) AS STRING) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
           AND l_shipdate < timestamp '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q03_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
         CAST(CAST(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS STRING) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < timestamp '1998-01-01 00:00:00'
           AND l_shipdate > timestamp '1998-01-01 00:00:00'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q05_local_supplier" ->
      """SELECT n_name,
         CAST(CAST(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS STRING) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= timestamp '1996-01-01 00:00:00'
           AND o_orderdate < timestamp '1998-01-01 00:00:00'
         GROUP BY n_name""",
    "q14_promo_share" ->
      """SELECT
         CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN cast(l_extendedprice*(1-l_discount) AS decimal(18,4))
             ELSE cast(0.0 AS decimal(18,4)) END) AS STRING) AS DOUBLE) AS promo_revenue,
         CAST(CAST(sum(cast(l_extendedprice*(1-l_discount) AS decimal(18,4))) AS STRING) AS DOUBLE) AS total_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
           AND l_shipdate < timestamp '1997-04-01 00:00:00'""",
    "q17_small_qty" ->
      """WITH per_part AS (
           SELECT l_partkey AS pk, sum(cast(l_quantity AS decimal(18,2))) AS s, count(*) AS c
           FROM lineitem GROUP BY l_partkey)
         SELECT CAST(CAST(sum(cast(l_extendedprice AS decimal(18,2))) AS STRING) AS DOUBLE) AS total_price, count(*) AS n_items
         FROM lineitem JOIN per_part ON l_partkey = pk
         WHERE l_quantity * c * 5 < cast(s AS double)""",
    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders
         FROM customer LEFT JOIN (
           SELECT * FROM orders WHERE o_totalprice > 150000.0) o
         ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 48)""",
    "q_anti_join" ->
      """SELECT count(*) AS n_orders, CAST(CAST(sum(cast(o_totalprice AS decimal(18,2))) AS STRING) AS DOUBLE) AS total
         FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_quantity >= 48)""",
    "q_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps,
                count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
         FROM lineitem""",
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
           SELECT p_brand, p_partkey, p_retailprice,
                  row_number() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey) AS rn
           FROM part) t WHERE rn <= 3""",
    "q_window_running" ->
      """SELECT user_id, event_id,
                CAST(CAST(sum(cast(value AS decimal(18,4)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running_value
         FROM events""",
    "q_union" ->
      """SELECT bucket, count(*) AS n FROM (
           SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 300000.0
           UNION ALL
           SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 10000.0) t
         GROUP BY bucket""",
    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
                CAST(CAST(sum(cast(o_totalprice AS decimal(18,2))) AS STRING) AS DOUBLE) AS spend
         FROM orders GROUP BY o_custkey HAVING count(*) >= 3""",
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate < '1994-01-01'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderdate >= '1994-01-01'""",
    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderdate < '1994-01-01'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderdate >= '1994-01-01'""",
    "q_math_funcs" ->
      """SELECT o_orderkey,
                floor(o_totalprice * 10.0 + 0.5) / 10.0 AS r1,
                floor(o_totalprice) AS fl,
                ceil(o_totalprice) AS ce,
                abs(o_totalprice * -1.0) AS ab,
                sqrt(o_totalprice) AS sq,
                o_totalprice * o_totalprice AS p2,
                o_orderkey % 7 AS m7
         FROM orders WHERE o_orderkey % 100 = 0""",
    "q19_disjunctive" ->
      """SELECT count(*) AS n,
                CAST(CAST(sum(cast(l_extendedprice * (1 - l_discount)
                              AS decimal(18,4))) AS STRING) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
    "q10_returned_items" ->
      """WITH agg AS (
           SELECT c_custkey, c_name, n_name,
                  sum(cast(l_extendedprice * (1 - l_discount)
                           AS decimal(18,4))) AS rev_d
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE l_returnflag = 'R'
           GROUP BY 1, 2, 3)
         SELECT c_custkey, c_name, n_name, cast(rev_d AS double) AS revenue
         FROM agg ORDER BY rev_d DESC, c_custkey LIMIT 20""",
    "q_array_funcs" ->
      """WITH t AS (
           SELECT doc_id,
                  list_transform(string_split_regex(lower(text), ' +'),
                                 w -> length(w)) AS lens
           FROM documents)
         SELECT doc_id,
                len(lens) AS n,
                list_max(lens) AS max_len,
                list_min(lens) AS min_len,
                CAST(list_sum(lens) AS BIGINT) AS sum_len,
                len(list_distinct(lens)) AS n_distinct,
                len(list_filter(lens, x -> x > 4)) AS n_long,
                CAST(list_sum(list_sort(lens)[1:3]) AS BIGINT) AS sum_smallest3,
                list_contains(lens, 1) AS has_single
         FROM t""",
    // list_intersect/list_distinct are unordered in DuckDB: results
    // reduce through size/sum or sort before stringifying. list_position
    // returns 0 when absent in BOTH engines (verified by probe).
    "q_array_funcs2" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(text), ' +') AS ws
           FROM documents)
         SELECT doc_id,
                len(list_intersect(ws,
                    ['the', 'of', 'and', 'to', 'in', 'a'])) AS n_stop_shared,
                list_has_any(ws,
                    ['the', 'of', 'and', 'to', 'in', 'a']) AS has_stop,
                list_has_all(ws, ['the', 'of']) AS has_the_of,
                CAST(list_position(ws, 'the') AS BIGINT) AS pos_the,
                CAST(list_sum(list_transform(list_zip(
                    list_transform(ws, w -> length(w)),
                    generate_series(1, len(ws))),
                  x -> x[1] * x[2])) AS BIGINT) AS wsum,
                array_to_string(list_slice(list_sort(ws), 2, 3), ',') AS mid2
         FROM t""",
    // the genuine DISTINCT-window spellings on the oracle side
    "q_window_distinct" ->
      """SELECT o_orderkey, o_custkey,
                CAST(count(DISTINCT o_orderpriority) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS prio_distinct_todate,
                CAST(count(DISTINCT o_orderpriority) OVER (
                  PARTITION BY o_custkey) AS BIGINT) AS prio_distinct_all
         FROM orders""",
    // the genuine comprehension syntax on the oracle side
    "q_list_comprehension" ->
      """SELECT doc_id,
                array_to_string(
                  [upper(x) FOR x IN string_split(text, ' ')
                   IF length(x) > 4], ' ') AS long_upper,
                array_to_string(
                  [j * j FOR j IN generate_series(1, doc_id % 5 + 1)], ',')
                  AS squares
         FROM documents""",
    // IGNORE NULLS is the SQL modifier in DuckDB, the boolean arg of
    // first/last in Spark; frames spelled identically
    "q_ignore_nulls" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN event_type = 'error' THEN NULL
                       ELSE value END AS v
           FROM events WHERE user_id <= 300)
         SELECT user_id, event_id, v,
                last_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS ffill,
                first_value(v IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                  AS bfill
         FROM e""",
    "q_string_agg" ->
      """WITH t AS (
           SELECT c_mktsegment, c_name, c_custkey,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_custkey) AS rn
           FROM customer)
         SELECT c_mktsegment,
                string_agg(c_name, '|' ORDER BY c_custkey) AS names,
                count(*) AS n
         FROM t WHERE rn <= 5 GROUP BY 1""",
    // the genuine MAP aggregate, flattened back out via parallel unnest
    "q_histogram_agg" ->
      """WITH h AS (
           SELECT l_linestatus AS st, histogram(l_returnflag) AS m
           FROM lineitem GROUP BY 1),
         u AS (
           SELECT st, unnest(map_keys(m)) AS flag,
                  unnest(map_values(m)) AS cnt
           FROM h)
         SELECT st, flag, CAST(cnt AS BIGINT) AS cnt FROM u""",
    // product() is scan-order sugar; the portable spelling is the fold
    // in an explicit total order — identical rounding on both engines
    "q_product_agg" ->
      """WITH t AS (
           SELECT l_returnflag AS flag,
                  CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
                  l_orderkey, l_linenumber,
                  CAST(1.0 AS DOUBLE) - l_discount AS v
           FROM lineitem)
         SELECT flag, month, count(*)::BIGINT AS n_items,
                list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                  list(v ORDER BY l_orderkey, l_linenumber, v)),
                  (a, x) -> a * x) AS value_share
         FROM t GROUP BY 1, 2""",
    // the genuine FROM-first spelling with GROUP BY ALL inference
    "q_from_first" ->
      """FROM lineitem
         SELECT l_returnflag AS flag, l_linestatus AS st,
                count(*)::BIGINT AS n,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,4))) AS STRING)
                  AS DOUBLE) AS qty
         GROUP BY ALL""",
    // the genuine collation clause: NOCASE grouping + NOCASE equality;
    // the representative is the binary min over the class
    "q_collate" ->
      """WITH src AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 THEN upper(lang) ELSE lang END
                    AS lang2
           FROM documents)
         SELECT lower(min(lang2)) AS key_ci,
                min(lang2) AS class_rep,
                count(*)::BIGINT AS n_docs,
                CAST(sum(CASE WHEN lang2 = 'en' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_exact_en,
                (min(lang2) COLLATE NOCASE = 'en') AS is_en_nocase
         FROM src GROUP BY lang2 COLLATE NOCASE""",
    "q_argminmax" ->
      """SELECT o_custkey,
                arg_min(o_orderdate, o_orderkey) AS first_date,
                arg_max(o_orderdate, o_orderkey) AS last_date,
                min(o_orderkey) AS min_key,
                bit_and(o_orderkey) AS key_and,
                bit_or(o_orderkey) AS key_or,
                bit_xor(o_orderkey) AS key_xor
         FROM orders GROUP BY 1""",
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
                substr(c_name, 1, 8) AS name_prefix,
                length(c_name) AS name_len,
                c_mktsegment || '/' || c_name AS seg_name
         FROM customer WHERE c_name LIKE '%1%'""",
    "q_string_funcs2" ->
      """SELECT c_custkey,
                split_part(c_name, '#', 2) AS name_num,
                reverse(c_mktsegment) AS seg_rev,
                lpad(c_mktsegment, 12, '*') AS seg_pad,
                translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
                repeat(substring(c_mktsegment, 1, 2), 3) AS seg_rep,
                CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
         FROM customer""",
    // printf ↔ format_string; DuckDB hex() is uppercase and Spark's is
    // too, but %x is lowercase on both — the face pins both spellings
    "q_format_funcs" ->
      """SELECT o_orderkey,
                printf('ORD-%08d', o_orderkey) AS order_tag,
                printf('%s/%d', o_orderpriority,
                       EXTRACT(year FROM o_orderdate)) AS prio_year,
                lower(hex(o_orderkey)) AS key_hex,
                printf('%x', o_custkey) AS cust_hex,
                repeat('#', CAST(o_orderkey % 5 AS INT) + 1) || '|' AS bar
         FROM orders WHERE o_orderkey <= 1000""",
    // levenshtein is native with identical unit-cost semantics on both
    // engines; the bounded (threshold) form spells as CASE portably
    "q_levenshtein" ->
      """SELECT c_custkey,
                CAST(levenshtein(c_name, 'Customer#000000001') AS BIGINT)
                  AS d_ref,
                CAST(levenshtein(c_mktsegment, c_name) AS BIGINT) AS d_cols,
                CAST(CASE WHEN levenshtein(c_mktsegment, 'BUILDING') <= 3
                     THEN levenshtein(c_mktsegment, 'BUILDING')
                     ELSE -1 END AS BIGINT) AS d_capped
         FROM customer WHERE c_custkey <= 500""",
    // the string-similarity family runs DuckDB's native functions on the
    // oracle side and graft's pinned-semantics expressions on the Spark
    // side; doubles compare bit-exact (no rounding)
    "q_string_similarity" ->
      """SELECT p_partkey,
                jaro_similarity(p_name, p_type) AS jaro_name_type,
                jaro_winkler_similarity(p_name, 'goldenrod lavender spring')
                  AS jw_ref,
                damerau_levenshtein(p_brand, 'Brand#13') AS dl_brand,
                damerau_levenshtein(p_type, 'STANDARD ANODIZED TIN')
                  AS dl_type,
                hamming(rpad(p_name, 6, '_'), rpad(p_type, 6, '_')) AS ham6,
                jaccard(p_name, p_type) AS jac_name_type
         FROM part WHERE p_partkey <= 600""",
    // identical verbatim interval-frame SQL
    "q_window_time_range" ->
      """SELECT user_id, event_id,
                CAST(CAST(sum(cast(value AS decimal(18,4))) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
                  AS STRING) AS DOUBLE) AS v7d
         FROM events""",
    // %-tokens on the oracle side; ISO week via %V
    "q_strftime" ->
      """SELECT o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS ymd,
                strftime(o_orderdate, '%A') AS dayname,
                strftime(o_orderdate, '%b %d, %Y') AS pretty,
                strftime(o_orderdate, '%j') AS doy,
                strftime(o_orderdate, '%V') AS isoweek
         FROM orders WHERE o_orderkey <= 2000""",
    // each engine parses strings it rendered itself (round trip)
    "q_strptime" ->
      """WITH r AS (
           SELECT o_orderkey,
                  strftime(o_orderdate, '%d/%m/%Y %H:%M') AS s1,
                  strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS s2,
                  strftime(o_orderdate, '%b %d, %Y') AS s3
           FROM orders WHERE o_orderkey <= 2000)
         SELECT o_orderkey, s1, s2, s3,
                strptime(s1, '%d/%m/%Y %H:%M') AS t1,
                strptime(s2, '%Y-%m-%dT%H:%M:%S') AS t2,
                CAST(strptime(s3, '%b %d, %Y') AS DATE) AS d3
         FROM r""",
    // DuckDB replaces FIRST unless 'g'; backrefs are \1 not $1
    "q_regexp_replace" ->
      """SELECT doc_id,
                regexp_replace(text, '[0-9]+', '#', 'g') AS all_nums,
                regexp_replace(text, '[0-9]+', '#') AS first_num,
                regexp_replace(text, '(\w+) (\w+)', '\2 \1', 'g') AS swapped
         FROM documents""",
    "q_unicode_funcs" ->
      """SELECT c_custkey,
                strip_accents('Café Münster naïve — ' || c_name) AS plain,
                CAST(unicode(substring(c_name, 1, 1)) AS BIGINT) AS cp_first,
                chr(65 + CAST(c_custkey % 26 AS INT)) AS letter
         FROM customer WHERE c_custkey <= 500""",
    // DuckDB spells the blocking key split_part, Spark substring_index —
    // identical on non-empty names; jw compares bit-exact unrounded
    "q_fuzzy_join" ->
      """SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
                jaro_winkler_similarity(a.p_name, b.p_name) AS jw
         FROM part a JOIN part b
           ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
          AND a.p_partkey < b.p_partkey
         WHERE a.p_partkey <= 2000 AND b.p_partkey <= 2000
           AND jaro_winkler_similarity(a.p_name, b.p_name) > 0.92""",
    // infix operators in DuckDB (<< >> & | xor() ~) ↔ named functions
    // in the Spark DataFrame API; semantics identical on BIGINT
    "q_bitwise_funcs" ->
      """SELECT o_orderkey,
                o_orderkey << 3 AS shl3,
                o_orderkey >> 2 AS shr2,
                o_orderkey & o_custkey AS k_and,
                o_orderkey | o_custkey AS k_or,
                xor(o_orderkey, o_custkey) AS k_xor,
                ~o_orderkey AS k_not,
                CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt
         FROM orders WHERE o_orderkey <= 1000""",
    "q_time_bucket" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
                count(*) AS n_events,
                CAST(CAST(sum(cast(value AS decimal(18,4))) AS STRING) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2""",
    "q_null_handling" ->
      """SELECT coalesce(o_orderpriority, 'NO-BIG-ORDER') AS priority,
                count(*) AS n,
                cast(sum(CASE WHEN o_orderkey IS NULL THEN 0 ELSE 1 END) AS bigint) AS n_matched
         FROM customer LEFT JOIN (
           SELECT * FROM orders WHERE o_totalprice > 250000.0) o
         ON c_custkey = o_custkey
         GROUP BY 1""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                CAST(CAST(sum(cast(l_quantity AS decimal(18,2))) AS STRING) AS DOUBLE) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_sql_api" ->
      """SELECT n_name, count(*) AS n_customers,
                CAST(CAST(sum(cast(c_acctbal AS decimal(18,2))) AS STRING) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    // the genuine ATTACH + qualified cross-database join on the oracle
    // side (att is in-memory; dims copied in, fact stays in the main
    // catalog — the same shape the Spark face runs)
    "q_attach_join" ->
      """ATTACH IF NOT EXISTS ':memory:' AS att;
         CREATE OR REPLACE TABLE att.nation_dim AS SELECT * FROM nation;
         CREATE OR REPLACE TABLE att.region_dim AS SELECT * FROM region;
         SELECT r.r_name, count(*) AS n_customers,
                CAST(CAST(sum(cast(c_acctbal AS decimal(18,2))) AS STRING)
                  AS DOUBLE) AS total_acctbal
         FROM customer c
         JOIN att.nation_dim n ON c.c_nationkey = n.n_nationkey
         JOIN att.region_dim r ON n.n_regionkey = r.r_regionkey
         GROUP BY r.r_name""",
    // verbatim statement; the order is total so the page is stable
    "q_pagination" ->
      """SELECT o_orderkey, o_custkey,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders
         ORDER BY o_orderdate, o_orderkey
         LIMIT 20 OFFSET 40""",
    // identical annotations — the defaults differ, the annotations agree
    "q_null_ordering" ->
      """WITH k AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0 THEN NULL
                       ELSE o_orderkey % 100 END AS nk
           FROM orders WHERE o_orderkey <= 500)
         SELECT o_orderkey, nk,
                CAST(row_number() OVER
                  (ORDER BY nk ASC NULLS FIRST, o_orderkey) AS BIGINT)
                  AS pos_nulls_first,
                CAST(row_number() OVER
                  (ORDER BY nk ASC NULLS LAST, o_orderkey) AS BIGINT)
                  AS pos_nulls_last
         FROM k""",
    // identical statement — standard three-valued logic on both engines
    "q_not_in_nulls" ->
      """WITH keys AS (
           SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
           FROM customer WHERE c_acctbal < 0 OR c_acctbal > 9000)
         SELECT
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_custkey NOT IN (SELECT k FROM keys)) AS not_in_n,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = o.o_custkey))
             AS not_exists_n""",
    "q_rel_division" ->
      """SELECT user_id,
                CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
         FROM events
         GROUP BY user_id
         HAVING count(DISTINCT event_type) =
                (SELECT count(DISTINCT event_type) FROM events)""",
    // the same sugar, verbatim — DuckDB invented it
    "q_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
                count(*) AS n,
                CAST(CAST(sum(cast(l_extendedprice * (1 - l_discount)
                  AS decimal(18,4))) AS STRING) AS DOUBLE) AS revenue
         FROM lineitem
         GROUP BY ALL""",
    "q_window_lag" ->
      """SELECT user_id, event_id,
                lag(event_id) OVER w AS prev_id,
                epoch_us(date_trunc('microseconds', ts))
                  - epoch_us(date_trunc('microseconds', lag(ts) OVER w)) AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS bigint) AS gid,
                count(*) AS n,
                CAST(CAST(sum(cast(l_quantity AS decimal(18,2))) AS STRING) AS DOUBLE) AS qty
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, cast(o_totalprice AS double) AS price
         FROM orders o
         WHERE cast(round(o_totalprice * 100) AS bigint)
               * (SELECT 2 * count(*) FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey)
               > (SELECT 3 * sum(cast(round(o2.o_totalprice * 100) AS bigint))
                  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""",
    "q_unpivot" ->
      """WITH wide AS (
           SELECT l_returnflag,
                  CAST(CAST(sum(cast(l_quantity AS decimal(18,2))) AS STRING) AS DOUBLE) AS sum_qty,
                  CAST(CAST(sum(cast(l_extendedprice AS decimal(18,2))) AS STRING) AS DOUBLE) AS sum_price,
                  cast(count(*) AS double) AS n_items
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
         UNION ALL
         SELECT l_returnflag, 'sum_price', sum_price FROM wide
         UNION ALL
         SELECT l_returnflag, 'n_items', n_items FROM wide""",
    // the genuine dynamic spelling on the oracle side
    "q_unpivot_dynamic" ->
      """WITH wide AS (
           SELECT o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
                  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
           FROM orders GROUP BY 1)
         UNPIVOT wide ON COLUMNS(* EXCLUDE (o_orderpriority))
         INTO NAME metric VALUE val""",
    "q_upsert" ->
      """WITH upd AS (
           SELECT o_orderkey
                    + CASE WHEN o_orderkey % 1000 = 0 THEN 10000000 ELSE 0 END
                    AS o_orderkey,
                  cast(cast(o_totalprice AS decimal(18,2)) + 1000.00 AS double)
                    AS o_totalprice
           FROM orders WHERE o_orderkey % 10 = 0)
         SELECT coalesce(u.o_orderkey, t.o_orderkey) AS o_orderkey,
                CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                     ELSE t.o_totalprice END AS o_totalprice,
                t.o_orderpriority AS o_orderpriority
         FROM orders t FULL OUTER JOIN upd u ON t.o_orderkey = u.o_orderkey""",
    "q_json_funcs2" ->
      """WITH t AS (
           SELECT o_orderkey,
                  '{"id": ' || o_orderkey || ', "tags": ["'
                    || o_orderpriority || '", "' || o_orderstatus
                    || '"], "cust": {"key": ' || o_custkey || '}}' AS j
           FROM orders WHERE o_orderkey <= 2000)
         SELECT o_orderkey,
                json_extract_string(j, '$.cust.key') AS cust_key,
                json_extract_string(j, '$.tags[1]') AS tag2,
                CAST(json_array_length(j, '$.tags') AS BIGINT) AS n_tags,
                array_to_string(json_keys(j), ',') AS keys
         FROM t""",
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
                cast(sum(cast(json_extract_string(props, '$.k') AS BIGINT)) AS bigint) AS sum_k,
                min(cast(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                max(cast(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                cast(sum(CASE WHEN cast(json_extract_string(props, '$.k') AS BIGINT) >= 50
                              THEN 1 ELSE 0 END) AS bigint) AS n_hi
         FROM events GROUP BY event_type""",
    "q_window_dist" ->
      """SELECT p_brand, p_partkey, p_retailprice,
                ntile(4) OVER w AS tile4,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cume,
                first_value(p_partkey) OVER w AS first_pk,
                last_value(p_partkey) OVER wf AS last_pk,
                nth_value(p_partkey, 2) OVER wf AS second_pk
         FROM part
         WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey),
                wf AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "q_recursive_cte" ->
      """WITH RECURSIVE chain AS (
           SELECT p_partkey AS id, 0 AS depth FROM part WHERE p_partkey < 10
           UNION ALL
           SELECT p.p_partkey AS id, c.depth + 1 AS depth
           FROM part p JOIN chain c ON p.p_partkey // 10 = c.id
           WHERE p.p_partkey >= 10
         )
         SELECT CAST(depth AS INTEGER) AS depth,
                CAST(count(*) AS BIGINT) AS n_parts,
                CAST(sum(id) AS BIGINT) AS sum_id
         FROM chain GROUP BY depth""",
    "q21_waiting_supplier" ->
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM supplier
         JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q22_idle_customers" ->
      """WITH stats AS (
           SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_sum,
                  count(*) AS bal_n
           FROM customer WHERE c_acctbal > 0.0)
         SELECT substr(c_name, length(c_name), 1) AS cgroup,
                CAST(count(*) AS BIGINT) AS numcust,
                CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS totacctbal
         FROM customer, stats
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_sum
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderpriority = '1-URGENT')
         GROUP BY 1""",
    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  sum(cast(l_extendedprice * (1 - l_discount)
                           AS decimal(18,4))) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rev = (SELECT max(total_rev) FROM rev)""",
    "q20_dominant_supplier" ->
      """WITH per_supp AS (
           SELECT l_partkey, l_suppkey,
                  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
           FROM lineitem GROUP BY 1, 2),
         per_part AS (
           SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
           FROM lineitem GROUP BY 1)
         SELECT s_suppkey, s_name
         FROM supplier
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM per_supp JOIN per_part USING (l_partkey)
           WHERE sq * 5 > tq)""",
    "q04_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         FROM orders
         WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1997-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY 1""",
    "q18_large_orders" ->
      """WITH bk AS (
           SELECT l_orderkey
           FROM lineitem GROUP BY 1
           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 230),
         agg AS (
           SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sumq
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           WHERE o_orderkey IN (SELECT l_orderkey FROM bk)
           GROUP BY 1, 2, 3, 4, 5)
         SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                CAST(o_totalprice AS DOUBLE) AS total_price,
                CAST(sumq AS DOUBLE) AS sum_qty
         FROM agg ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q_nullsafe_join" ->
      """WITH e AS (
           SELECT nullif(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10,
                         7) AS k,
                  event_type
           FROM events),
         a AS (SELECT k, CAST(count(*) AS BIGINT) AS n_all FROM e GROUP BY 1),
         b AS (SELECT k, CAST(count(*) AS BIGINT) AS n_click
               FROM e WHERE event_type = 'click' GROUP BY 1)
         SELECT a.k, a.n_all, b.n_click
         FROM a LEFT JOIN b ON a.k IS NOT DISTINCT FROM b.k""",
    "q_hopping_window" ->
      """WITH w AS (
           SELECT unnest([date_trunc('hour', ts),
                          date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
                  event_type, value
           FROM events)
         SELECT ws, event_type, count(*) AS n_events,
                CAST(CAST(sum(cast(value AS decimal(18,4))) AS STRING) AS DOUBLE) AS total_value
         FROM w GROUP BY 1, 2""",
    "q_multiset_ops" ->
      """WITH ea AS (
           SELECT l_orderkey FROM lineitem
           EXCEPT ALL
           SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
         ia AS (
           SELECT l_orderkey FROM lineitem
           INTERSECT ALL
           SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
         SELECT op, CAST(count(*) AS BIGINT) AS n_rows,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys
         FROM (SELECT 'except_all' AS op, l_orderkey FROM ea
               UNION ALL
               SELECT 'intersect_all' AS op, l_orderkey FROM ia) t
         GROUP BY op""",
    "q02_min_cost" ->
      """WITH cost AS (
           SELECT l_partkey, l_suppkey,
                  min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
           FROM lineitem GROUP BY 1, 2),
         offers AS (
           SELECT p_partkey, s_acctbal, s_name, n_name, cost
           FROM cost
           JOIN part ON l_partkey = p_partkey
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA' AND p_size <= 15 AND p_type = 'STANDARD')
         SELECT s_acctbal, s_name, n_name, p_partkey,
                CAST(cost AS DOUBLE) AS min_cost
         FROM offers o
         WHERE cost = (SELECT min(cost) FROM offers i
                       WHERE i.p_partkey = o.p_partkey)
         ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 20""",
    "q07_volume_shipping" ->
      """SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
           AND l_shipdate < timestamp '1998-01-01 00:00:00'
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         GROUP BY 1, 2, 3""",
    "q08_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_6'
                  THEN CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))
                  ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS STRING) AS DOUBLE) AS mkt_num,
                CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS mkt_den
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region ON n1.n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
           AND o_orderdate >= timestamp '1996-01-01 00:00:00'
           AND o_orderdate < timestamp '1998-01-01 00:00:00'
         GROUP BY 1""",
    "q09_product_profit" ->
      """SELECT n_name AS nation,
                CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(CAST(sum(CAST(l_extendedprice*(1-l_discount)
                  - p_retailprice*l_quantity*0.1 AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%gear%'
         GROUP BY 1, 2""",
    "q11_important_parts" ->
      """WITH vals AS (
           SELECT l_partkey,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_3'
           GROUP BY 1)
         SELECT l_partkey, CAST(value AS DOUBLE) AS value
         FROM vals
         WHERE value * 1000 > (SELECT sum(value) FROM vals)""",
    "q12_ship_channels" ->
      """SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'EVEN' ELSE 'ODD' END
                  AS channel,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= timestamp '1997-01-01 00:00:00'
           AND l_shipdate < timestamp '1998-01-01 00:00:00'
           AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
         GROUP BY 1""",
    "q13_order_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
               FROM customer
               LEFT JOIN orders ON c_custkey = o_custkey
                 AND o_orderpriority <> '4-NOT SPECIFIED'
               GROUP BY c_custkey) c
         GROUP BY c_count""",
    "q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
                CAST(count(*) AS BIGINT) AS supplier_cnt
         FROM (SELECT DISTINCT p_brand, p_type,
                      CAST(p_size AS BIGINT) AS p_size, l_suppkey
               FROM lineitem
               JOIN part ON l_partkey = p_partkey
               WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
                 AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
                 AND l_suppkey NOT IN (
                   SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)) t
         GROUP BY 1, 2, 3""",
    "q_map_funcs" ->
      """WITH per AS (
           SELECT user_id, event_type,
                  CAST(count(*) AS BIGINT) AS cnt,
                  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                    AS cents
           FROM events GROUP BY 1, 2)
         SELECT user_id,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CASE WHEN cnt >= 5 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_big,
                coalesce(string_agg(CASE WHEN cnt >= 5 THEN event_type END,
                  ',' ORDER BY event_type), '') AS big_types,
                CAST(sum(cnt) AS BIGINT) AS n_events,
                CAST(sum(cents // cnt) AS BIGINT) AS avg_cents_sum
         FROM per GROUP BY user_id""",
    "q_explode_join" ->
      """WITH t AS (
           SELECT doc_id,
                  unnest(string_split(text, ' ')) AS tok,
                  generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
           FROM documents),
         dim AS (SELECT * FROM (VALUES ('join', 1), ('hash', 2), ('scan', 3),
                  ('filter', 4), ('merge', 5), ('vector', 6)) v(tok, w))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                CAST(sum(w) AS BIGINT) AS w_sum,
                CAST(min(pos) AS BIGINT) AS min_pos
         FROM t JOIN dim USING (tok)
         WHERE pos < 8
         GROUP BY doc_id""",
    "q_group_limit" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice,
                CAST(row_number() OVER (PARTITION BY c_mktsegment
                  ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
         FROM orders JOIN customer ON o_custkey = c_custkey
         QUALIFY rn <= 3""",
    "q_positional_join" ->
      """WITH hi AS (
           SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC,
                    o_orderkey) AS BIGINT) AS rn,
                  o_orderkey AS hi_key, o_totalprice AS hi
           FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100),
         lo AS (
           SELECT CAST(row_number() OVER (ORDER BY o_totalprice ASC,
                    o_orderkey) AS BIGINT) AS rn,
                  o_orderkey AS lo_key, o_totalprice AS lo
           FROM orders ORDER BY o_totalprice ASC, o_orderkey LIMIT 100)
         SELECT rn, hi_key, lo_key,
                CAST(CAST(hi AS DECIMAL(18,2)) - CAST(lo AS DECIMAL(18,2))
                  AS DOUBLE) AS spread
         FROM hi JOIN lo USING (rn)""",
    "q_regexp_funcs" ->
      """SELECT doc_id,
                regexp_extract(text, '[A-Za-z]+', 0) AS first_word,
                regexp_extract(text, '([A-Za-z]+) ([A-Za-z]+)', 2)
                  AS second_word,
                regexp_matches(text, '[0-9]') AS has_digit,
                CAST(len(regexp_extract_all(text, '[0-9]+', 0)) AS BIGINT)
                  AS n_numbers
         FROM documents""",
    "q_lateral_subquery" ->
      """SELECT n_name, t.c_custkey, t.c_acctbal
         FROM nation, LATERAL (
           SELECT c_custkey, c_acctbal FROM customer
           WHERE c_nationkey = n_nationkey
           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""",
    // the same first-8-hex-digits-of-md5 integer as Spark's conv(); DuckDB
    // spells hex parsing via the q_table_checksum list_reduce idiom
    "q_tablesample" ->
      """WITH h AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                  md5(CAST(o_orderkey AS VARCHAR)) AS hh
           FROM orders)
         SELECT o_orderkey, o_orderstatus, cents
         FROM h
         WHERE list_reduce(list_prepend(0::BIGINT,
                 list_transform(generate_series(1, 8),
                   i -> (instr('0123456789abcdef', substr(hh, i, 1)) - 1)::BIGINT)),
                 (acc, x) -> acc * 16 + x) % 100 < 10""",
    // the literal DuckDB-only sugar — the Spark face is its translation
    "q_select_exclude" ->
      """SELECT * EXCLUDE (c_name)
                  REPLACE (CAST(round(c_acctbal * 100) AS BIGINT) AS c_acctbal)
         FROM customer""",
    // DuckDB-native macros (scalar + table), same bodies as the Spark SQL
    // UDFs; the final statement is byte-identical on both engines
    "q_create_macro" ->
      """CREATE OR REPLACE MACRO graft_net_cents(p, d, q) AS
           CAST(round(p * (1 - d) * q * 100) AS BIGINT);
         CREATE OR REPLACE MACRO graft_line_statuses(flag) AS TABLE
           SELECT l_linestatus, count(*) AS n FROM lineitem
           WHERE l_returnflag = flag GROUP BY l_linestatus;
         SELECT m.l_linestatus, m.n, t.cents
         FROM graft_line_statuses('R') m
         JOIN (SELECT l_linestatus,
                      CAST(sum(graft_net_cents(
                        l_extendedprice, l_discount, l_quantity))
                        AS BIGINT) AS cents
               FROM lineitem WHERE l_returnflag = 'R'
               GROUP BY l_linestatus) t
         USING (l_linestatus)""",
    // nextval over the ordered subquery assigns ids in scan order, which
    // the ORDER BY pins to doc_id order — the dense-id equivalence the
    // Spark Ranked translation reproduces distributed
    "q_sequence" ->
      """CREATE OR REPLACE SEQUENCE graft_seq START 1;
         SELECT doc_id, nextval('graft_seq') AS id
         FROM (SELECT doc_id FROM documents ORDER BY doc_id)""",
    // genuine ENUM machinery on the oracle side: the inline enum type's
    // range order IS the dictionary the Spark side encodes against
    "q_enum" ->
      """SELECT doc_id,
                list_position(enum_range(
                  NULL::ENUM('de','en','es','fr','zh')), lang) AS code,
                CAST(CAST(lang AS ENUM('de','en','es','fr','zh'))
                     AS VARCHAR) AS decoded
         FROM documents""",
    // DuckDB's dynamic PIVOT infers the IN-list from the data, exactly
    // like Spark's pivot(col) without values
    "q_pivot_dynamic" ->
      """PIVOT documents ON lang USING count(*) GROUP BY source""",
    // the native COLUMNS('regex') spelling with the \0 rename lambda
    "q_columns_regex" ->
      """SELECT min(COLUMNS('l_.*(price|discount|tax)')) AS "min_\0",
                max(COLUMNS('l_.*(price|discount|tax)')) AS "max_\0",
                count(*)::BIGINT AS n
         FROM lineitem""",
    // DuckDB's native list-aggregate top-n spelling
    "q_arg_topn" ->
      """WITH c AS (SELECT l_returnflag,
                           CAST(round(l_extendedprice * 100) AS BIGINT)
                             AS cents
                    FROM lineitem)
         SELECT l_returnflag,
                (list_sort(list(cents), 'DESC'))[1] AS top1,
                (list_sort(list(cents), 'DESC'))[2] AS top2,
                (list_sort(list(cents), 'DESC'))[3] AS top3,
                (list_sort(list(cents)))[1] AS bot1,
                (list_sort(list(cents)))[2] AS bot2,
                (list_sort(list(cents)))[3] AS bot3
         FROM c GROUP BY 1""",
    // the genuine join-delete DML on the oracle side
    "q_delete_using" ->
      """CREATE OR REPLACE TEMP TABLE graft_du AS
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders;
         DELETE FROM graft_du USING (
             SELECT DISTINCT l_orderkey FROM lineitem
             WHERE l_returnflag = 'R') u
           WHERE graft_du.o_orderkey = u.l_orderkey;
         SELECT * FROM graft_du""",
    // the genuine join-update DML on the oracle side
    "q_update_from" ->
      """CREATE OR REPLACE TEMP TABLE graft_uf AS
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders;
         UPDATE graft_uf SET cents = cents + u.n
           FROM (SELECT l_orderkey, count(*) AS n
                 FROM lineitem GROUP BY 1) u
           WHERE graft_uf.o_orderkey = u.l_orderkey
             AND graft_uf.o_orderstatus = 'F';
         SELECT * FROM graft_uf""",
    "q_struct_funcs" ->
      """WITH base AS (
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders WHERE o_orderkey <= 500),
         rec AS (SELECT o_orderkey,
                        struct_pack(status := o_orderstatus, cents := cents)
                          AS r
                 FROM base)
         SELECT o_orderkey, r.status AS status, u.part AS part, u.amt AS amt
         FROM rec, unnest([struct_pack(part := 'full', amt := r.cents),
                           struct_pack(part := 'half', amt := r.cents // 2)])
                   AS t(u)""",
    "q_union_by_name" ->
      """SELECT o_orderkey, o_orderstatus AS status,
                CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL BY NAME
         SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                o_orderkey
         FROM orders WHERE o_orderkey % 11 = 0""",
    "q_order_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
         FROM orders
         GROUP BY ALL
         ORDER BY ALL
         LIMIT 9""",
    "q_update" ->
      """CREATE OR REPLACE TEMP TABLE graft_upd AS
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders;
         UPDATE graft_upd SET cents = cents + 500
           WHERE o_orderstatus = 'F' AND o_orderkey % 3 = 0;
         SELECT * FROM graft_upd""",
    "q_delete" ->
      """CREATE OR REPLACE TEMP TABLE graft_del AS
           SELECT o_orderkey, o_orderstatus,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders;
         DELETE FROM graft_del
           WHERE o_orderstatus = 'O' AND o_orderkey % 2 = 0;
         SELECT * FROM graft_del""",
    "q_frame_exclude" ->
      """WITH base AS (
           SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS cents
           FROM part),
         grouped AS (
           SELECT *, CAST(dense_rank() OVER
                    (PARTITION BY p_brand ORDER BY p_size) AS BIGINT) AS grp
           FROM base)
         SELECT p_partkey, p_brand, p_size, cents,
                CAST(sum(cents) OVER (PARTITION BY p_brand ORDER BY grp
                  RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT) AS gs,
                CAST(sum(cents) OVER (PARTITION BY p_brand ORDER BY p_size
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
                  EXCLUDE CURRENT ROW) AS BIGINT) AS x_cur,
                CAST(sum(cents) OVER (PARTITION BY p_brand ORDER BY p_size
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
                  EXCLUDE GROUP) AS BIGINT) AS x_grp,
                CAST(sum(cents) OVER (PARTITION BY p_brand ORDER BY p_size
                  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW
                  EXCLUDE TIES) AS BIGINT) AS x_ties
         FROM grouped""",
    "q_window_filter" ->
      """SELECT user_id, event_id,
                count(*) FILTER (WHERE event_type = 'purchase') OVER w
                  AS n_buy,
                CAST(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (WHERE event_type = 'view') OVER w AS BIGINT)
                  AS v_cents
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_named_window" ->
      """SELECT l_orderkey, l_linenumber,
                rank() OVER w AS rnk,
                CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  OVER w2 AS BIGINT) AS run_cents
         FROM lineitem
         WHERE l_orderkey <= 2000
         WINDOW w  AS (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber),
                w2 AS (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_columns_star" ->
      """WITH base AS (
           SELECT p_partkey, p_name, p_brand,
                  CAST(p_size AS BIGINT) AS p_size,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS cents
           FROM part)
         SELECT min(COLUMNS(*)) AS "min_\0", max(COLUMNS(*)) AS "max_\0"
         FROM base""",
    "q_timezone" ->
      """SELECT CAST(EXTRACT(hour FROM
                  (ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'))
                AS BIGINT) AS ny_hour,
                count(*) AS n
         FROM events
         GROUP BY 1"""
  )
}
