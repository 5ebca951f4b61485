package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.json.JsonSniffer

/** JSON shape sniffing (r15 VERDICT missing #2): layout detection,
  * the scalar type lattice, int→double widening, ragged field union,
  * nested-value classification, probe-bound truncation. The
  * cross-ENGINE leg (read_json_auto agreement) is certified by the
  * json_sniff oracle. */
class JsonSnifferSpec extends SparkSpec {

  private def tmpFile(content: String): String = {
    val p = Files.createTempFile("graft_jsniff_", ".json")
    Files.writeString(p, content)
    p.toString
  }

  test("ndjson layout: full scalar lattice, DuckDB type spellings") {
    val p = tmpFile(
      """{"id": 1, "name": "a", "score": 1.5, "flag": true}
        |{"id": 2, "name": "b", "score": 2.25, "flag": false}
        |""".stripMargin)
    val s = JsonSniffer.sniff(spark, p)
    assert(s.format == "ndjson")
    assert(s.fieldsSpec == "flag:BOOLEAN,id:BIGINT,name:VARCHAR,score:DOUBLE")
  }

  test("array layout detected; whitespace before '[' tolerated") {
    val p = tmpFile("\n  [\n {\"id\": 1},\n {\"id\": 2}\n]\n")
    val s = JsonSniffer.sniff(spark, p)
    assert(s.format == "array")
    assert(s.fieldsSpec == "id:BIGINT")
  }

  test("ragged records union their keys; BIGINT+DOUBLE widens to DOUBLE") {
    val p = tmpFile(
      """{"id": 1, "score": 2}
        |{"id": 2, "score": 2.5, "extra": "x"}
        |""".stripMargin)
    val s = JsonSniffer.sniff(spark, p)
    assert(s.fieldsSpec == "extra:VARCHAR,id:BIGINT,score:DOUBLE")
  }

  test("conflicting scalar classes fall back to VARCHAR; all-null fields " +
      "don't vote; scientific notation is DOUBLE") {
    val p = tmpFile(
      """{"v": 1, "n": null, "e": 1e3}
        |{"v": "one", "n": null, "e": 2E-2}
        |""".stripMargin)
    val s = JsonSniffer.sniff(spark, p)
    assert(s.fieldsSpec == "e:DOUBLE,v:VARCHAR")
  }

  test("nested objects/arrays classify as JSON, not descended") {
    val p = tmpFile(
      """{"id": 1, "meta": {"a": [1, 2], "b": "x"}, "tags": ["p", "q"]}
        |""".stripMargin)
    val s = JsonSniffer.sniff(spark, p)
    assert(s.fieldsSpec == "id:BIGINT,meta:JSON,tags:JSON")
  }

  test("strings with escaped quotes, braces and colons don't confuse the scan") {
    val p = tmpFile(
      """{"id": 1, "t": "a \" b } c : d { e"}
        |{"id": 2, "t": "x"}
        |""".stripMargin)
    val s = JsonSniffer.sniff(spark, p)
    assert(s.fieldsSpec == "id:BIGINT,t:VARCHAR")
  }

  test("a record cut off at the probe bound doesn't vote") {
    // second record's closing brace lands beyond the 64-byte cap
    val full = """{"id": 1, "a": "x"}""" + "\n" +
      """{"id": 2, "a": "y", "late_field": """ + "\"" + "z" * 200 + "\"}"
    val p = tmpFile(full)
    val s = JsonSniffer.sniff(spark, p, maxBytes = 64)
    assert(s.fieldsSpec == "a:VARCHAR,id:BIGINT")
  }

  test("non-records input rejects loudly") {
    val p = tmpFile("42\n43\n")
    intercept[IllegalArgumentException] { JsonSniffer.sniff(spark, p) }
  }
}
