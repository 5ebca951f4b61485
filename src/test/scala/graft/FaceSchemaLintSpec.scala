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
}
