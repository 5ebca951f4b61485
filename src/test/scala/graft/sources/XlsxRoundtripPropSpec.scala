package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.time.LocalDate

import graft.SparkSpec
import graft.sources.xlsx.XlsxWriter
import graft.sources.xlsx.XlsxWriter.SheetSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style roundtrip: seeded ScalaCheck generators produce
  * adversarial rows (XML specials, quotes, CJK, newlines/tabs/CRs, huge and
  * tiny doubles, NaN/Inf, boundary dates) and every generated value must
  * survive write → parse exactly. Deterministic (fixed seed) so failures
  * reproduce.
  */
class XlsxRoundtripPropSpec extends SparkSpec {

  private val strGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('&', '<', '>', '"', '\'', '\n', '\t', '\r', 'a', '漢', 'ß', '€'))
      .map(_.mkString),
    Gen.const(""),
    Gen.const("=cmd|danger"), // formula-looking text stays text
    Gen.listOf(Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString))

  private val dblGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12),
    Gen.chooseNum(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1e-300, 1e300, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.MinPositiveValue))

  private val dateGen: Gen[LocalDate] = Gen.chooseNum(-40000L, 80000L)
    .map(LocalDate.ofEpochDay) // ~1860..2189

  private val rowGen: Gen[(String, Double, Boolean, LocalDate)] =
    for (s <- strGen; d <- dblGen; b <- Gen.oneOf(true, false); dt <- dateGen)
      yield (s, d, b, dt)

  /** What the writer is SPECIFIED to preserve: XML-1.0-unrepresentable
    * control chars become U+FFFD; everything else is exact. */
  private def expected(s: String): String =
    s.map(c => if (c < ' ' && c != '\t' && c != '\n' && c != '\r') '�' else c)

  test("100 seeded random rows roundtrip through write + DSv2 read exactly") {
    val rows: Seq[(String, Double, Boolean, LocalDate)] =
      (0 until 100).map { i =>
        rowGen(Gen.Parameters.default, Seed(42L + i)).get
      }
    // canonical first data row pins type inference
    val all = ("seed", 1.5, true, LocalDate.of(2020, 1, 1)) +: rows
    val f = Files.createTempFile("graft_prop_", ".xlsx")
    val out = new FileOutputStream(f.toFile)
    try XlsxWriter.write(out, Seq(SheetSpec("p", Some(Seq("s", "d", "b", "dt")),
      all.iterator.map { case (s, d, b, dt) => Seq[Any](s, d, b, dt) })))
    finally out.close()

    val back = spark.read.format("xlsx").option("hasHeader", "true")
      .load(f.toString).collect()
    assert(back.length == all.length)
    all.zip(back).zipWithIndex.foreach { case (((s, d, b, dt), row), i) =>
      assert(row.getString(0) == expected(s), s"row $i string: ${s.toList}")
      val got = row.getDouble(1)
      assert(java.lang.Double.compare(got, d) == 0 || (got.isNaN && d.isNaN),
        s"row $i double: wrote $d got $got")
      assert(row.getBoolean(2) == b, s"row $i boolean")
      assert(row.getDate(3).toLocalDate == dt, s"row $i date: wrote $dt got ${row.getDate(3)}")
    }
  }
}
