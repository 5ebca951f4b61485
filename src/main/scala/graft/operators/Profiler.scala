package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.GraftFunctions.sum_dec_exact
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Whole-schema column profiler — the QA pass a pipeline runs before
  * training (null rates, ranges, sums/means) for EVERY column of a table in
  * ONE job.
  *
  * Scale shape: a single hash aggregate with map-side partial merge — the
  * per-column stats are all algebraic (min/max/sum/count), so executors
  * reduce 100 TB to one row of fixed width and the driver never sees data.
  * Deliberately NO exact per-column distinct counts: that would put an
  * Expand (one row copy per column) under the aggregate; cardinality at
  * scale is `q_approx_distinct`'s HLL++ sketch instead.
  *
  * Output: one row per column — (col_name, n_nulls, n_notnull, min_num,
  * max_num, sum_num, mean_num, min_str, max_str). Numeric columns fill the
  * `_num` fields (sums through decimal(38,6) so the value is
  * order-independent and oracle-exact); strings fill min/max_str (binary
  * collation on both engines); timestamps profile as epoch millis.
  */
object Profiler {

  private def dec(c: Column) = c.cast(DecimalType(38, 6))

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    val nullD = lit(null).cast(DoubleType)
    val nullS = lit(null).cast(StringType)

    // n_nulls = count(*) - count(col): two cheap counters instead of a
    // conditional sum per column (count(*) is shared across all columns)
    val aggs = count(lit(1)).as("__n_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(c).as(s"${f.name}__cnt"))
      f.dataType match {
        // integral sums stay in long arithmetic (exact, and an order of
        // magnitude cheaper than the >18-digit decimal path)
        case ByteType | ShortType | IntegerType | LongType => base ++ Seq(
          min(c).cast(DoubleType).as(s"${f.name}__min"),
          max(c).cast(DoubleType).as(s"${f.name}__max"),
          sum(c).cast(DoubleType).as(s"${f.name}__sum"))
        case _: NumericType => base ++ Seq(
          min(c).cast(DoubleType).as(s"${f.name}__min"),
          max(c).cast(DoubleType).as(s"${f.name}__max"),
          // sum_dec_exact: same DECIMAL(38,6)-exact sum, BigDecimal-free
          // per row (r17, functions/DecExpressions.scala). Per-row bound
          // |x| < 10^12 for the compact (18,6) cast — every profiled
          // column in the corpus is orders of magnitude below it.
          sum_dec_exact(c, 6).cast(DoubleType).as(s"${f.name}__sum"))
        // booleans profile as 0/1 numerics: sum = true count, mean = true rate
        case BooleanType => base ++ Seq(
          min(c.cast(IntegerType)).cast(DoubleType).as(s"${f.name}__min"),
          max(c.cast(IntegerType)).cast(DoubleType).as(s"${f.name}__max"),
          sum(c.cast(LongType)).cast(DoubleType).as(s"${f.name}__sum"))
        // NTZ (how Spark reads naive parquet timestamps) casts through
        // TimestampType: with the UTC session zone that is the same
        // wall-clock→epoch reading DuckDB's epoch_ms gives naive timestamps
        case TimestampType | TimestampNTZType => base ++ Seq(
          unix_millis(min(c).cast(TimestampType)).cast(DoubleType).as(s"${f.name}__min"),
          unix_millis(max(c).cast(TimestampType)).cast(DoubleType).as(s"${f.name}__max"))
        case StringType | DateType => base ++ Seq(
          min(c).cast(StringType).as(s"${f.name}__mins"),
          max(c).cast(StringType).as(s"${f.name}__maxs"))
        case _ => base // opaque types: null counts only
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)

    val structs = fields.map { f =>
      val (minN, maxN, sumN, meanN, minS, maxS) = f.dataType match {
        case dt if dt.isInstanceOf[NumericType] || dt == BooleanType =>
          val s = col(s"${f.name}__sum")
          (col(s"${f.name}__min"), col(s"${f.name}__max"), s,
            s / col(s"${f.name}__cnt"), nullS, nullS)
        case TimestampType | TimestampNTZType =>
          (col(s"${f.name}__min"), col(s"${f.name}__max"), nullD, nullD, nullS, nullS)
        case StringType | DateType =>
          (nullD, nullD, nullD, nullD, col(s"${f.name}__mins"), col(s"${f.name}__maxs"))
        case _ => (nullD, nullD, nullD, nullD, nullS, nullS)
      }
      struct(
        lit(f.name).as("col_name"),
        (col("__n_rows") - col(s"${f.name}__cnt")).as("n_nulls"),
        col(s"${f.name}__cnt").as("n_notnull"),
        minN.as("min_num"), maxN.as("max_num"),
        sumN.as("sum_num"), meanN.as("mean_num"),
        minS.as("min_str"), maxS.as("max_str"))
    }
    one.select(explode(array(structs.toIndexedSeq: _*)).as("p")).select("p.*")
  }

  /** DuckDB oracle for `profile` over a table with the given (name, type)
    * columns; types: "num", "bool", "ts", "str". One aggregate SELECT per
    * column, UNION ALL — the single-pass Spark plan and this N-pass SQL
    * agree bit-exactly because every stat is order-independent. */
  def oracleSqlFor(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (c, kind) =>
      val (minN, maxN, sumN, meanN, minS, maxS) = kind match {
        case "num" =>
          (s"cast(min($c) AS double)", s"cast(max($c) AS double)",
            s"cast(sum(cast($c AS decimal(38,6))) AS double)",
            s"cast(sum(cast($c AS decimal(38,6))) AS double) / count($c)",
            "cast(NULL AS varchar)", "cast(NULL AS varchar)")
        case "bool" =>
          (s"cast(min(cast($c AS int)) AS double)",
            s"cast(max(cast($c AS int)) AS double)",
            s"cast(sum(cast($c AS bigint)) AS double)",
            s"cast(sum(cast($c AS bigint)) AS double) / count($c)",
            "cast(NULL AS varchar)", "cast(NULL AS varchar)")
        case "ts" =>
          (s"cast(epoch_ms(min($c)) AS double)", s"cast(epoch_ms(max($c)) AS double)",
            "cast(NULL AS double)", "cast(NULL AS double)",
            "cast(NULL AS varchar)", "cast(NULL AS varchar)")
        case _ =>
          ("cast(NULL AS double)", "cast(NULL AS double)",
            "cast(NULL AS double)", "cast(NULL AS double)",
            s"min($c)", s"max($c)")
      }
      s"""SELECT '$c' AS col_name,
            cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_nulls,
            cast(count($c) AS bigint) AS n_notnull,
            $minN AS min_num, $maxN AS max_num,
            $sumN AS sum_num, $meanN AS mean_num,
            $minS AS min_str, $maxS AS max_str
          FROM $table"""
    }.mkString("\n        UNION ALL\n")

  /** EXACT per-group percentiles by sort-based rank interpolation — the
    * scale-safe replacement for Spark's `percentile` aggregate, whose
    * buffer holds EVERY value of a group (3 `l_returnflag` groups × a
    * 100×-scale corpus = billions of doubles in three aggregation
    * buffers). Here the values are SORTED instead: one hash partition +
    * external sort per group (spillable — memory stays bounded no matter
    * the group size), `row_number`/`lead` stream over the sorted run, and
    * the row sitting at each percentile's rank emits the interpolated
    * value, reduced by a trivial map-side-combinable `max`.
    *
    * The interpolation replicates Spark's `Percentile.getPercentile`
    * arithmetic term for term (pos = p·(n−1); lo = ⌊pos⌋; result =
    * x_lo·(⌈pos⌉−pos) + x_hi·(pos−⌊pos⌋), doubles throughout) so results
    * are bit-identical to the aggregate it replaces — and to DuckDB's
    * `quantile_cont` on the oracle side. Nulls are ignored (as the
    * aggregate does); a group with only nulls keeps its row with null
    * percentiles. `ps` = (output column, fraction in [0,1]).
    *
    * Parallelism profile: the window hash-partitions by GROUP, so each
    * group's sort runs in one (spillable, disk-bounded) task — the right
    * trade when groups are plentiful (work spreads across them) or
    * moderate. For the few-huge-groups extreme (3 groups × 100 TB) the
    * upgrade path is a range-partitioned global sort on (group, value)
    * plus a per-partition count pass to turn partition offsets into
    * global ranks — same interpolation arithmetic, sort spread across
    * every core; the window form stays the default because its plan is
    * declarative end-to-end and memory-safe at any group size. */
  /** Shannon entropy of categorical columns — the balance/skew signal a
    * data-QA pass reports next to null rates: near-zero entropy flags a
    * degenerate column (one value dominates), entropy near log2(distinct)
    * flags uniform spread. Computed in the algebraic one-agg form
    * H = log2(n) − Σ c·log2(c) / n over the per-value counts, which both
    * engines spell identically (the naive −Σ p·log2 p needs p = c/n inside
    * the sum and doubles the division count); rounded to 6 dp because the
    * partial-sum ORDER of a distributed double sum is nondeterministic at
    * the ulp. Normalized entropy divides by log2(n_distinct) (0 for a
    * single-valued column).
    *
    * Scale shape: one map-side-combinable count aggregate per column (the
    * heavy pass — value cardinality rows out of 100 TB), then a one-row
    * reduction. Columns profile independently; union of per-column rows. */
  def entropy(df: DataFrame, colNames: Seq[String]): DataFrame =
    colNames.map { c =>
      df.select(col(c).cast("string").as("v"))
        .groupBy("v").agg(count(lit(1)).as("c"))
        .agg(
          count(lit(1)).as("n_distinct"),
          sum("c").as("n"),
          sum(col("c").cast("double") * log2(col("c").cast("double")))
            .as("clog"))
        .select(
          lit(c).as("column_name"),
          col("n_distinct"),
          col("n"),
          round(log2(col("n").cast("double")) - col("clog") / col("n"), 6)
            .as("entropy_bits"),
          when(col("n_distinct") > 1,
            round((log2(col("n").cast("double")) - col("clog") / col("n")) /
              log2(col("n_distinct").cast("double")), 6))
            .otherwise(lit(0.0)).as("norm_entropy"))
    }.reduce(_ unionAll _)

  /** DuckDB twin of [[entropy]] for the oracle — same algebraic form,
    * same rounding, generated per (table, column) so the two sides cannot
    * drift in spelling. */
  def entropyOracleSql(specs: Seq[(String, String)]): String =
    specs.map { case (t, c) =>
      val h = s"""log2(CAST(sum(c) AS DOUBLE)) -
                    sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) /
                    CAST(sum(c) AS DOUBLE)"""
      s"""SELECT '$c' AS column_name,
                count(*) AS n_distinct,
                cast(sum(c) AS BIGINT) AS n,
                round($h, 6) AS entropy_bits,
                CASE WHEN count(*) > 1
                     THEN round(($h) / log2(CAST(count(*) AS DOUBLE)), 6)
                     ELSE 0.0 END AS norm_entropy
         FROM (SELECT CAST($c AS VARCHAR) AS v, count(*) AS c
               FROM $t GROUP BY 1)"""
    }.mkString("\n UNION ALL\n")

  def exactPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val counts = df.groupBy(col(groupCol))
      .agg(count(col(valueCol)).as("__n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(broadcast(counts), Seq(groupCol))
      .withColumn("__rn", row_number().over(w).cast("double") - 1.0)
      .withColumn("__nxt", lead(col("__v"), 1).over(w))
    val aggs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("__n").cast("double") - 1.0)
      val lo = floor(pos)
      val hi = ceil(pos)
      max(when(col("__rn") === lo,
        when(lo === hi, col("__v"))
          .otherwise(col("__v") * (hi - pos) + col("__nxt") * (pos - lo))))
        .as(name)
    }
    // left join back so all-null groups survive with null percentiles,
    // exactly as the percentile aggregate would return them
    counts.select(col(groupCol))
      .join(ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*),
        Seq(groupCol), "left")
  }

  /** [[exactPercentiles]] for the FEW-HUGE-GROUPS extreme (3 groups ×
    * 100 TB): the values range-partition on (group, value) so the sort
    * spreads across EVERY core instead of one task per group, then a
    * per-(partition, group) count pass turns partition offsets into
    * global ranks and a second pass emits only the rows sitting at each
    * percentile's rank — the driver ever holds partitions × groups count
    * cells and |groups| × |ps| picked values, never data. Interpolation
    * arithmetic is identical to [[exactPercentiles]] (and to Spark's
    * `Percentile`), and equal values make tie placement irrelevant, so
    * the two forms return bit-identical results (spec-asserted).
    * `groupCol` must be string-typed here (it keys driver-side maps). */
  def exactPercentilesRanged(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)], partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 })
    val nPart = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val allGroups = df.select(col(groupCol).cast("string").as("g"))
      .distinct().as[String].collect().sorted
    val sorted = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("double").as("v"))
      .repartitionByRange(nPart, col("g"), col("v"))
      .sortWithinPartitions(col("g"), col("v"))
      .as[(String, Double)]
      .persist()
    try {
      // pass 1: per-(partition, group) counts — partitions × groups cells
      val counts: Array[(Int, String, Long)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { case (g, _) => m.update(g, m.getOrElse(g, 0L) + 1L) }
          m.iterator.map { case (g, c) => (pid, g, c) }
        }.collect()
      val totals: Map[String, Long] =
        counts.groupBy(_._2).map { case (g, cs) => g -> cs.map(_._3).sum }
      val offsets: Map[(Int, String), Long] = {
        val m = scala.collection.mutable.HashMap.empty[(Int, String), Long]
        counts.groupBy(_._2).foreach { case (g, cs) =>
          var acc = 0L
          cs.sortBy(_._1).foreach { case (pid, _, c) =>
            m.put((pid, g), acc); acc += c
          }
        }
        m.toMap
      }
      // 0-based global ranks each percentile needs: floor/ceil of p·(n−1)
      val needed: Map[String, Set[Long]] = totals.map { case (g, n) =>
        g -> ps.flatMap { case (_, p) =>
          val pos = p * (n - 1)
          Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
        }.toSet
      }
      val bcOff = spark.sparkContext.broadcast(offsets)
      val bcNeed = spark.sparkContext.broadcast(needed)
      // pass 2: walk each partition's sorted run, emit only target ranks
      val picked: Array[(String, Long, Double)] =
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          val off = bcOff.value
          val need = bcNeed.value
          val idx = scala.collection.mutable.HashMap.empty[String, Long]
          it.flatMap { case (g, v) =>
            val i = idx.getOrElse(g, off.getOrElse((pid, g), 0L))
            idx.update(g, i + 1)
            if (need.getOrElse(g, Set.empty).contains(i)) Some((g, i, v))
            else None
          }
        }.collect()
      val byRank: Map[(String, Long), Double] =
        picked.map(t => (t._1, t._2) -> t._3).toMap
      val rows: Seq[org.apache.spark.sql.Row] = allGroups.toSeq.map { g =>
        val vals: Seq[Any] = totals.get(g) match {
          case None => ps.map(_ => null) // all-null group: null percentiles
          case Some(n) => ps.map { case (_, p) =>
            val pos = p * (n - 1)
            val lo = math.floor(pos).toLong
            val hi = math.ceil(pos).toLong
            if (lo == hi) byRank((g, lo))
            else byRank((g, lo)) * (hi - pos) + byRank((g, hi)) * (pos - lo)
          }
        }
        org.apache.spark.sql.Row.fromSeq(g +: vals)
      }
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(groupCol,
          org.apache.spark.sql.types.StringType) +:
        ps.map { case (name, _) => org.apache.spark.sql.types.StructField(
          name, org.apache.spark.sql.types.DoubleType) })
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
    } finally { sorted.unpersist(); () }
  }
}
