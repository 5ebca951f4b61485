package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType, DataType}

/** Registry-wide output-shape lint (r14 VERDICT #1): the driver's DuckDB
  * comparator sorts face output columns with pandas, and a raw
  * ArrayType/MapType/StructType column crashes `sort_values`
  * ("unhashable type: numpy.ndarray") — the face reads `err` in
  * CORRECTNESS regardless of answer correctness (q_list_comprehension,
  * r14's one red row). The repo's own rule (Relational.scala, array
  * tier comments) is that every nested result reduces through an
  * order-free scalar or an explicit sort + stringify before leaving a
  * face. This spec makes the rule structural: EVERY registered face's
  * analyzed schema must be flat (atomic columns only), so the next
  * array-shaped face fails `sbt test` instead of the driver gate.
  *
  * Construction-only: each face fn is invoked (eager side effects like
  * memoized index builds run at sf0.001) but the returned frame is
  * never executed — the lint reads the ANALYZED schema.
  */
class FaceSchemaLintSpec extends SparkSpec {

  private def nested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("no registered face emits ArrayType/MapType/StructType columns") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema =
        try fn(spark, sf).schema
        catch { case e: Throwable =>
          fail(s"face $name failed to construct at sf0.001: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      val bad = schema.fields.filter(f => nested(f.dataType))
      if (bad.nonEmpty)
        offenders += s"$name(${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")})"
    }
    assert(offenders.isEmpty,
      s"faces with nested output columns (driver comparator crashes on " +
        s"these — stringify via array_join/to_json per the registry " +
        s"rule): ${offenders.mkString("; ")}")
  }

  test("face output column NAMES are clean identifiers and appear in the " +
      "oracle SQL (r15 VERDICT #8)") {
    // Two failure classes the driver's sorted-by-name hash compare turns
    // into silent mismatches: (1) an unaliased aggregate leaks Spark's
    // auto-generated name ("sum(l_quantity)" vs the oracle's alias);
    // (2) a renamed face column whose oracle side kept the old alias.
    // Class 1 = identifier shape; class 2 = the name must occur in the
    // oracle text (aliases are always literal there; skipped for oracles
    // that project `*`, where column names come from the table).
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val cols = fn(spark, sf).schema.fieldNames
      cols.filterNot(c => ident.pattern.matcher(c).matches())
        .foreach(c => offenders += s"$name: non-identifier column '$c'")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        val lower = sql.toLowerCase
        // generated-name spellings can't carry their aliases literally:
        // SELECT * (table columns), COLUMNS(...) star-expansions (DuckDB
        // mints min_/max_-prefixed names mechanically), dynamic PIVOT
        // (per-value columns) — those faces' name agreement is what the
        // driver compare itself certifies
        val generated = lower.contains("select *") ||
          lower.contains("columns(") || lower.contains("pivot")
        if (!generated)
          cols.filterNot(c => lower.contains(c.toLowerCase))
            .foreach(c => offenders += s"$name: column '$c' absent from " +
              "oracle SQL (alias drift)")
      }
    }
    assert(offenders.isEmpty,
      s"face/oracle column-name drift: ${offenders.mkString("; ")}")
  }
}
