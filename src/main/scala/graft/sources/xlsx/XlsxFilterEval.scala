package graft.sources.xlsx

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level evaluation of pushed-down filters inside the xlsx reader.
  *
  * The reader skips non-matching rows before they ever become InternalRows
  * for Spark ("PushedFilters" in explain). All filters are ALSO returned to
  * Spark as residuals (pushFilters returns its input), so this evaluation
  * is a pure early-skip optimization — correctness never depends on it.
  * Comparisons follow Spark semantics: any comparison with NULL is false.
  */
object XlsxFilterEval {

  /** Filters we can evaluate: simple comparisons on scan columns. */
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case In(a, _) => schema.fieldNames.contains(a)
    case And(l, r) => supported(schema, l) && supported(schema, r)
    case _ => false
  }

  /** External (filter-literal) value → the Catalyst representation the
    * reader produces, for comparability. */
  private def normalize(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case n: java.lang.Number => n
    case other => other
  }

  private def cmp(row: Any, lit: Any): Option[Int] = (row, normalize(lit)) match {
    case (null, _) => None
    case (a: UTF8String, b: UTF8String) => Some(a.compareTo(b))
    case (a: java.lang.Number, b: java.lang.Number) =>
      Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case _ => None
  }

  /** Evaluate one filter against a row accessor (attribute name → Catalyst
    * value, null when the column is missing from the produced row). */
  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v) => cmp(get(a), v).contains(0)
    case GreaterThan(a, v) => cmp(get(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(get(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(get(a), v).exists(_ <= 0)
    case IsNull(a) => get(a) == null
    case IsNotNull(a) => get(a) != null
    case In(a, vs) => vs.exists(v => cmp(get(a), v).contains(0))
    case And(l, r) => eval(l, get) && eval(r, get)
    case _ => true // unsupported → don't skip; Spark evaluates the residual
  }
}
