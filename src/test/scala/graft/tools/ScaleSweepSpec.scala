package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[ScaleSweep.mergeLine]] — the pure merge of per-chunk fresh-JVM
  * ScaleBench lines into the one `scale_sweep` history line (r16 VERDICT
  * #1: the artifact a reader trusts for the full-surface sf1 trend). */
class ScaleSweepSpec extends AnyFunSuite {
  private def chunk(tag: String, anchor: Double,
      qs: Map[String, Double]): String = {
    val qjson = qs.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"metric":"scale_checkpoint","value":1.0,"unit":"sec","sf":"$tag",""" +
      s""""dir":"/d/sf1","cpus":32,"anchor_ms":$anchor,"queries":$qjson}"""
  }

  test("merge keeps face order, sums non-failed faces, carries anchors") {
    val faces = Seq("a", "b", "c", "d")
    val lines = Seq(
      chunk("t-chunk0", 70.5, Map("a" -> 1.5, "b" -> 2.25)),
      chunk("t-chunk1", 102.0, Map("c" -> -1.0, "d" -> 4.0)))
    val line = ScaleSweep.mergeLine(faces, lines, "t", "/d/sf1", "32", 2)
    assert(BenchNorm.faceMap(line, "queries") ==
      Map("a" -> 1.5, "b" -> 2.25, "c" -> -1.0, "d" -> 4.0))
    // total sums only the non-failed faces
    assert(BenchNorm.numField(line, "value").contains(7.75))
    assert(line.contains(""""chunks":2,"chunk_size":2"""))
    assert(line.contains(""""chunk_anchors_ms":[70.5,102.0]"""))
    assert(BenchNorm.stringField(line, "sf").contains("t"))
    // face ORDER is the sweep's sorted face list, not map order
    val body = line.substring(line.indexOf("\"queries\""))
    assert(body.indexOf("\"a\"") < body.indexOf("\"b\"") &&
      body.indexOf("\"b\"") < body.indexOf("\"c\"") &&
      body.indexOf("\"c\"") < body.indexOf("\"d\""))
  }

  test("a dead chunk (empty line) reports its faces as -1, not absent; " +
      "an unparsed anchor reports -1") {
    val faces = Seq("a", "b")
    val lines = Seq(chunk("t-chunk0", 70.0, Map("a" -> 2.0)), "")
    val line = ScaleSweep.mergeLine(faces, lines, "t", "/d/sf1", "8", 1)
    assert(BenchNorm.faceMap(line, "queries") ==
      Map("a" -> 2.0, "b" -> -1.0))
    assert(BenchNorm.numField(line, "value").contains(2.0))
    assert(line.contains(""""chunk_anchors_ms":[70.0,-1.0]"""))
  }

  test("3-decimal rounding on face times and anchors") {
    val faces = Seq("a")
    val lines = Seq(chunk("t-chunk0", 70.123456, Map("a" -> 1.23456789)))
    val line = ScaleSweep.mergeLine(faces, lines, "t", "/d", "8", 50)
    assert(BenchNorm.faceMap(line, "queries") == Map("a" -> 1.235))
    assert(line.contains(""""chunk_anchors_ms":[70.123]"""))
  }
}
