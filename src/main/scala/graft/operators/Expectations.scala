package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ/Great-Expectations
  * posture): a rule set is verified against a table and reported as one
  * row per rule — (rule, n_violations, passed).
  *
  * Scale shape: every ROW-LEVEL rule (not-null, range, value-set, custom
  * predicate) compiles to a conditional-sum column of ONE shared
  * map-side-combinable aggregate — checking 50 such rules on 100 TB costs
  * a single scan that reduces to one fixed-width row, with no per-rule
  * pass. Set-level rules add exactly the plan their semantics force:
  * `Unique` one count-per-key aggregate (violations = rows beyond the
  * first per duplicated key), `RefIntegrity` one anti-join against the
  * reference keys (broadcast when small, shuffle otherwise — Catalyst's
  * call). The per-rule one-row summaries union driver-side: the union is
  * of 1-row plans, never of data.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** col IS NOT NULL for every row. */
  final case class NotNull(colName: String) extends Rule {
    def name: String = s"not_null($colName)"
  }

  /** lo <= col <= hi (nulls don't violate — compose with NotNull). */
  final case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    def name: String = s"in_range($colName,$lo,$hi)"
  }

  /** col ∈ values (nulls don't violate). */
  final case class InSet(colName: String, values: Seq[String]) extends Rule {
    def name: String = s"in_set($colName)"
  }

  /** Arbitrary row predicate that must hold (`where` is a SQL boolean
    * expression); rows where it is false or null violate. */
  final case class Satisfies(label: String, where: String) extends Rule {
    def name: String = s"satisfies($label)"
  }

  /** The column tuple is a key: violations = rows beyond the first of
    * each duplicated tuple. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name: String = s"unique(${cols.mkString(",")})"
  }

  /** Every non-null col value exists in `refCol` of `ref` (foreign key).
    * Violations count REFERENCING ROWS with no match. */
  final case class RefIntegrity(colName: String, ref: DataFrame, refCol: String)
      extends Rule {
    def name: String = s"ref_integrity($colName)"
  }

  private def violation(r: Rule): Column = r match {
    case NotNull(c) => when(col(c).isNull, 1L).otherwise(0L)
    case InRange(c, lo, hi) =>
      when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L)
    case InSet(c, vs) =>
      when(col(c).isNotNull && !col(c).isInCollection(vs), 1L).otherwise(0L)
    case Satisfies(_, where) =>
      when(coalesce(expr(where), lit(false)), 0L).otherwise(1L)
    case _ => lit(0L) // set-level rules don't fold into the row pass
  }

  /** Row-level ROUTING form of the expectations: annotate every row with
    * the names of the row rules it violates (`violated` array) and a
    * `valid` flag, so a pipeline can send clean rows onward and quarantine
    * the rest with the reason attached (the dead-letter pattern). Only
    * row-local rules participate (Unique/RefIntegrity are set-level —
    * rejecting the SECOND copy of a duplicate needs state and is
    * [[graft.streaming.EventStreams.dedupStream]]'s job); map-only and
    * stateless, so the same call is streaming-safe on an unbounded
    * readStream without a watermark. */
  def route(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowRules = rules.filter {
      case _: Unique | _: RefIntegrity => false
      case _ => true
    }
    require(rowRules.nonEmpty, "route needs at least one row-level rule")
    val labels = array(rowRules.map(r =>
      when(violation(r) === 1L, lit(r.name))
        .otherwise(lit(null).cast("string"))): _*)
    df.withColumn("violated", filter(labels, _.isNotNull))
      .withColumn("valid", size(col("violated")) === 0)
  }

  /** Verify `rules` against `df` → (rule string, n_violations bigint,
    * passed boolean), one row per rule, in the given rule order collated
    * by name for deterministic output. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val rowRules = rules.filter {
      case _: Unique | _: RefIntegrity => false
      case _ => true
    }
    val summaries = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (rowRules.nonEmpty) {
      val aggd = df.agg(
        sum(violation(rowRules.head)).as("v0"),
        rowRules.tail.zipWithIndex.map { case (r, i) =>
          sum(violation(r)).as(s"v${i + 1}")
        }: _*)
      // one row in, |rowRules| rows out: stack the counters
      summaries += aggd.select(posexplode(array(
        rowRules.indices.map(i => coalesce(col(s"v$i"), lit(0L))): _*)))
        .select(element_at(
          array(rowRules.map(r => lit(r.name)): _*), col("pos") + 1).as("rule"),
          col("col").as("n_violations"))
    }
    rules.foreach {
      case u @ Unique(cols) =>
        summaries += df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("n_violations"))
          .select(lit(u.name).as("rule"), col("n_violations"))
      case r @ RefIntegrity(c, ref, refCol) =>
        summaries += df.filter(col(c).isNotNull)
          .join(ref.select(col(refCol).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_violations"))
      case _ => ()
    }
    summaries.reduce(_.unionByName(_))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("rule"))
  }
}
