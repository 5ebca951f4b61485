package graft.sources.csv

import graft.SparkSpec


/** Dialect sniffing (r14 VERDICT missing #1): quote-aware line splitting,
  * candidate scoring, header detection, and the bounded-probe contract.
  * Cross-engine agreement (DuckDB's sniff_csv on the same files) is
  * certified by the csv_sniff oracle face. */
class CsvSnifferSpec extends SparkSpec {

  private def writeTmp(content: String): String = {
    val p = java.nio.file.Files.createTempFile("graft_sniff_", ".csv")
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  test("splitLine: RFC 4180 quoting — embedded delimiter, doubled quote, " +
      "unquoted fields") {
    assert(CsvSniffer.splitLine("""a,"b,c",d""", ',', '"') ==
      (Vector("a", "b,c", "d"), 1))
    assert(CsvSniffer.splitLine("""a,"say ""hi"", ok",d""", ',', '"') ==
      (Vector("a", """say "hi", ok""", "d"), 1))
    assert(CsvSniffer.splitLine("x;y;z", ';', '"') ==
      (Vector("x", "y", "z"), 0))
    assert(CsvSniffer.splitLine("1\t2\t3", '\t', '"') ==
      (Vector("1", "2", "3"), 0))
    // quote only opens at field start: mid-field quotes are literal
    assert(CsvSniffer.splitLine("it's,fine", ',', '\'') ==
      (Vector("it's", "fine"), 0))
  }

  test("sniff: comma + double-quote + header") {
    val p = writeTmp(
      "id,name,notes\n1,ann,\"likes, commas\"\n2,bob,\"also, yes\"\n3,cy,plain\n")
    val d = CsvSniffer.sniff(spark, p)
    assert(d == CsvSniffer.Dialect(',', '"', hasHeader = true, nCols = 3))
  }

  test("sniff: semicolon with free commas in text; '\"' stays the default quote") {
    val p = writeTmp("id;name\n1;hello, world\n2;guten, tag\n")
    val d = CsvSniffer.sniff(spark, p)
    assert(d == CsvSniffer.Dialect(';', '"', hasHeader = true, nCols = 2))
  }

  test("sniff: single-quoted pipe fields with varying embedded pipes") {
    val p = writeTmp(
      "id|text\n1|'a|b'\n2|'a|b|c'\n3|'plain'\n")
    val d = CsvSniffer.sniff(spark, p)
    assert(d == CsvSniffer.Dialect('|', '\'', hasHeader = true, nCols = 2))
  }

  test("sniff: headerless all-numeric tab file") {
    val p = writeTmp("1\t4.5\t7\n2\t5.5\t8\n3\t6.5\t9\n")
    val d = CsvSniffer.sniff(spark, p)
    assert(d == CsvSniffer.Dialect('\t', '"', hasHeader = false, nCols = 3))
  }

  test("bounded probe: maxBytes caps the read and drops the cut-off line") {
    // 4 full lines fit in 24 bytes; the 5th is cut mid-line and must not
    // skew the counts
    val content = "a,b\n1,2\n3,4\n5,6\n7777777,888888\n"
    val p = writeTmp(content)
    val d = CsvSniffer.sniff(spark, p, maxBytes = 18)
    assert(d.delimiter == ',' && d.nCols == 2)
    // a file of EXACTLY maxBytes is complete, not truncated: its last
    // line must be kept (r15 review — the read==maxBytes heuristic
    // dropped it)
    // two lines, file length == maxBytes exactly: dropping the "cut"
    // trailing line would leave one row and flip header detection off
    val exact = "x;y\n1;2\n"
    val p2 = writeTmp(exact)
    val d2 = CsvSniffer.sniff(spark, p2, maxBytes = exact.length)
    assert(d2 == CsvSniffer.Dialect(';', '"', hasHeader = true, nCols = 2))
  }
}
