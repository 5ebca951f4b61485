package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity scalar family — the fuzzy-matching functions a DuckDB
  * user calls by name (`jaro_similarity`, `jaro_winkler_similarity`,
  * `damerau_levenshtein`, `hamming`/`mismatch`, `jaccard`) that Spark does
  * not ship (Spark's builtin surface stops at `levenshtein`). Native codegen
  * expressions so record-linkage scoring stays inside WholeStageCodegen.
  *
  * Semantics are pinned to DuckDB's, verified bit-exact by a 20k-pair
  * random fuzz against the oracle engine (StringSimSpec re-pins the probe
  * vectors):
  *  - jaro: match window `max(|a|,|b|)/2 - 1` (floor, min 0), transposition
  *    count halved by INTEGER division (the float-t variant diverges on
  *    2.5k of 20k pairs), `(m/|a| + m/|b| + (m-t)/m) / 3` in exactly that
  *    operation order — double arithmetic is order-sensitive and the oracle
  *    compare is bit-exact;
  *  - jaro-winkler: prefix boost `sim + l*0.1*(1-sim)` with l = common
  *    prefix capped at 4, applied only when jaro > 0.7;
  *  - damerau_levenshtein: UNRESTRICTED Lowrance-Wagner (with the da[]
  *    dictionary), not OSA — `dl("ca","abc") = 2` where OSA says 3 (OSA
  *    mismatched DuckDB on 251 of 20k fuzz pairs);
  *  - hamming: equal length required, mismatching inputs raise (DuckDB
  *    errors too — a silent null would diverge from the oracle);
  *  - jaccard: similarity of the DISTINCT-byte sets (not bigrams), case
  *    sensitive, raises on empty input like DuckDB's "argument too short".
  *
  * All operate on UTF-8 BYTES (DuckDB's `hamming('café','cafz')` errors on
  * byte-length mismatch, proving its byte orientation); multibyte text
  * compares byte-wise on both engines, identically.
  */
abstract class StringSimBinary extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
}

case class JaroSim(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaro(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaro($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_similarity"
}

case class JaroWinklerSim(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaroWinkler($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler_similarity"
}

case class DamerauLevenshtein(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.damerau(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.damerau($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
  override def prettyName: String = "damerau_levenshtein"
}

case class HammingDist(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.hamming(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.hamming($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(left = l, right = r)
  override def prettyName: String = "hamming"
}

case class CharSetJaccard(left: Expression, right: Expression) extends StringSimBinary {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaccard(a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaccard($a.getBytes(), $b.getBytes())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharSetJaccard =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard"
}

object StringSim {
  /** Jaro similarity over bytes; integer transposition halving (DuckDB). */
  def jaro(a: Array[Byte], b: Array[Byte]): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    var window = math.max(la, lb) / 2 - 1
    if (window < 0) window = 0
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      var j = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var found = false
      while (!found && j <= hi) {
        if (!bm(j) && a(i) == b(j)) { am(i) = true; bm(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var t = 0; i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    // operation order matters: the oracle compare is bit-exact on doubles
    (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
  }

  /** Winkler prefix boost, applied only above jaro 0.7 (DuckDB). */
  def jaroWinkler(a: Array[Byte], b: Array[Byte]): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a(l) == b(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Unrestricted Damerau-Levenshtein (Lowrance-Wagner), byte alphabet. */
  def damerau(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length; val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    val da = new Array[Int](256) // last row each byte value was seen in `a`
    d(0) = maxd
    var i = 0
    while (i <= la) { d((i + 1) * w) = maxd; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = maxd; d(w + j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = da(b(j - 1) & 0xff)
        val l = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        d((i + 1) * w + j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  /** Positional mismatch count; equal byte length required (DuckDB errors
    * likewise — a silent null here would diverge from the oracle). */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    if (a.length != b.length) throw new IllegalArgumentException(
      s"hamming: strings must be of equal length (${a.length} vs ${b.length})")
    var t = 0; var i = 0
    while (i < a.length) { if (a(i) != b(i)) t += 1; i += 1 }
    t
  }

  /** Jaccard similarity of the distinct-byte sets; empty input raises
    * (DuckDB: "argument too short"). */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.length == 0 || b.length == 0) throw new IllegalArgumentException(
      "jaccard: arguments must be non-empty")
    val sa = new Array[Boolean](256)
    val sb = new Array[Boolean](256)
    var i = 0
    while (i < a.length) { sa(a(i) & 0xff) = true; i += 1 }
    i = 0
    while (i < b.length) { sb(b(i) & 0xff) = true; i += 1 }
    var inter = 0; var union = 0
    i = 0
    while (i < 256) {
      if (sa(i) && sb(i)) inter += 1
      if (sa(i) || sb(i)) union += 1
      i += 1
    }
    inter.toDouble / union
  }
}
