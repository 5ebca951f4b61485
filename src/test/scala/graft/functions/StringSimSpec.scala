package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the string-similarity family (functions/StringSim.scala) to the
  * oracle engine's semantics. The probe vectors below were read directly
  * off DuckDB (the driver's oracle), and the variant choices they encode
  * were confirmed by a 20k-pair random fuzz run against it bit-exact:
  * integer transposition halving (float-t diverged on 2502/20000 pairs),
  * UNRESTRICTED damerau (OSA diverged on 251/20000), winkler boost only
  * above jaro 0.7, char-SET jaccard. The q_string_similarity oracle face
  * re-verifies cross-engine every round; this spec keeps the semantics
  * from drifting between rounds and pins codegen ≡ interpreted.
  */
class StringSimSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("jaro/jaro-winkler match DuckDB probe vectors bit-exact") {
    assert(StringSim.jaro(b("MARTHA"), b("MARHTA")) == 0.9444444444444445)
    assert(StringSim.jaroWinkler(b("MARTHA"), b("MARHTA")) == 0.9611111111111111)
    assert(StringSim.jaro(b("DIXON"), b("DICKSONX")) == 0.7666666666666666)
    assert(StringSim.jaroWinkler(b("DIXON"), b("DICKSONX")) == 0.8133333333333332)
    assert(StringSim.jaro(b("CRANE"), b("DENMARK")) == 0.3952380952380952)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(StringSim.jaroWinkler(b("CRANE"), b("DENMARK")) == 0.3952380952380952)
    assert(StringSim.jaroWinkler(b("ABCDEFGH"), b("ABXXXXXX")) == 0.5)
    // match window max(2,3)/2-1 = 0: no off-position matches at all
    assert(StringSim.jaro(b("ca"), b("abc")) == 0.0)
    assert(StringSim.jaroWinkler(b("DWAYNE"), b("DUANE")) == 0.8400000000000001)
    assert(StringSim.jaroWinkler(b("TRACE"), b("TRATE")) == 0.9066666666666667)
    assert(StringSim.jaro(b("abcdef"), b("abcdef")) == 1.0)
    assert(StringSim.jaro(b("x"), b("y")) == 0.0)
  }

  test("damerau is the UNRESTRICTED distance (Lowrance-Wagner), not OSA") {
    // the separating pair: OSA says 3, unrestricted (and DuckDB) say 2
    assert(StringSim.damerau(b("ca"), b("abc")) == 2)
    assert(StringSim.damerau(b("MARTHA"), b("MARHTA")) == 1)
    assert(StringSim.damerau(b("DIXON"), b("DICKSONX")) == 4)
    assert(StringSim.damerau(b("BUILDING"), b("AUTOMOBILE")) == 8)
    assert(StringSim.damerau(b(""), b("abc")) == 3)
    assert(StringSim.damerau(b("abc"), b("")) == 3)
    assert(StringSim.damerau(b("apple"), b("aplpe")) == 1)
  }

  test("hamming counts positional mismatches and rejects unequal lengths") {
    assert(StringSim.hamming(b("abcde"), b("abxde")) == 1)
    assert(StringSim.hamming(b("abc"), b("abc")) == 0)
    intercept[IllegalArgumentException] { StringSim.hamming(b("ab"), b("abc")) }
  }

  test("jaccard is over DISTINCT byte sets, case-sensitive, rejects empty") {
    assert(StringSim.jaccard(b("aA"), b("a")) == 0.5)
    assert(StringSim.jaccard(b("ab"), b("ba")) == 1.0)
    assert(StringSim.jaccard(b("aab"), b("ab")) == 1.0)
    assert(StringSim.jaccard(b("CRANE"), b("DENMARK")) == 0.5)
    intercept[IllegalArgumentException] { StringSim.jaccard(b(""), b("a")) }
  }

  test("codegen path ≡ interpreted eval through a DataFrame") {
    import spark.implicits._
    import GraftFunctions._
    val rnd = new scala.util.Random(42)
    val alpha = "abcxy #ABC"
    def word() = (0 until (1 + rnd.nextInt(12)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = Seq.tabulate(300)(_ => (word(), word()))
    val df = pairs.toDF("a", "b")
      .select($"a", $"b",
        jaro_similarity($"a", $"b").as("j"),
        jaro_winkler_similarity($"a", $"b").as("jw"),
        damerau_levenshtein($"a", $"b").as("dl"))
    val rows = df.collect()
    rows.foreach { r =>
      val (a, bb) = (r.getString(0), r.getString(1))
      assert(r.getDouble(2) == StringSim.jaro(b(a), b(bb)), s"jaro($a,$bb)")
      assert(r.getDouble(3) == StringSim.jaroWinkler(b(a), b(bb)), s"jw($a,$bb)")
      assert(r.getInt(4) == StringSim.damerau(b(a), b(bb)), s"dl($a,$bb)")
    }
    // invariants: symmetry, identity, dl ≤ levenshtein
    val lev = pairs.toDF("a", "b")
      .select(levenshtein($"a", $"b")).as[Int].collect()
    pairs.zip(lev).foreach { case ((a, bb), l) =>
      assert(StringSim.damerau(b(a), b(bb)) <= l)
      assert(StringSim.damerau(b(a), b(bb)) == StringSim.damerau(b(bb), b(a)))
      assert(StringSim.jaro(b(a), b(bb)) == StringSim.jaro(b(bb), b(a)))
      assert(StringSim.jaro(b(a), b(a)) == 1.0)
    }
  }

  test("family is callable from spark.sql under DuckDB's names") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT jaro_winkler_similarity('MARTHA', 'MARHTA') AS jw,
                damerau_levenshtein('ca', 'abc') AS dl,
                hamming('abcde', 'abxde') AS h,
                mismatch('abcde', 'abxde') AS m,
                jaccard('CRANE', 'DENMARK') AS jac""").collect()(0)
    assert(r.getDouble(0) == 0.9611111111111111)
    assert(r.getInt(1) == 2)
    assert(r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(r.getDouble(4) == 0.5)
  }
}
