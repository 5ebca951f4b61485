package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Extended PII redaction (r15 VERDICT missing #1): each class's accept
  * AND reject boundary, the Luhn gate on card candidates, chain order,
  * and the documented replace-by-string overreach. The cross-ENGINE leg
  * (redact2Sql bit-equality) is certified by the txt_redact2 oracle. */
class Redact2Spec extends SparkSpec {
  import spark.implicits._

  private def run(texts: String*): Seq[String] =
    texts.toDF("text")
      .select(TextOps.redact2(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq

  test("Luhn-valid cards redact; invalid bare degrades to <NUM>, invalid " +
      "grouped survives verbatim") {
    assert(run("pay 4111111111111111 now") == Seq("pay <CARD> now"))
    assert(run("pay 4532015112830366 now") == Seq("pay <CARD> now"))
    // grouped separators: dash and space both redact when valid
    assert(run("c 5500-0000-0000-0004 d") == Seq("c <CARD> d"))
    assert(run("c 5500 0000 0000 0004 d") == Seq("c <CARD> d"))
    // invalid bare 16-digit: not a card, but still a long digit run
    assert(run("id 4111111111111112 x") == Seq("id <NUM> x"))
    // invalid grouped: 4-digit chunks are below the run threshold —
    // nothing validated it as PII, so it survives
    assert(run("id 5500-0000-0000-0005 x") == Seq("id 5500-0000-0000-0005 x"))
  }

  test("card candidates respect word boundaries: 17-digit runs are runs") {
    assert(run("n 41111111111111119 x") == Seq("n <NUM> x"))
  }

  test("documented overreach: a matched valid card string is replaced " +
      "everywhere it occurs as a substring (both engines fold identically)") {
    assert(run("pay 4111111111111111 ref 41111111111111110") ==
      Seq("pay <CARD> ref <CARD>0"))
  }

  test("IBAN: structural match redacts; lowercase or short stays") {
    assert(run("acct GB82WEST12345698765432 z") == Seq("acct <IBAN> z"))
    assert(run("acct DE89370400440532013000 z") == Seq("acct <IBAN> z"))
    assert(run("word gb82west12345698765432 z") ==
      Seq("word gb82west12345698765432 z"))
    // two letters + digits but body too short for an IBAN
    assert(run("code AB12XYZ z") == Seq("code AB12XYZ z"))
  }

  test("phone shapes: international, US parenthesized, bare nnn-nnn-nnnn") {
    assert(run("call +44-20-7946-0958 now") == Seq("call <PHONE> now"))
    assert(run("call +1 212 555 0173 now") == Seq("call <PHONE> now"))
    assert(run("call (212) 555-0173 now") == Seq("call <PHONE> now"))
    assert(run("call 800-555-0199 now") == Seq("call <PHONE> now"))
    // short digit pair is not a phone and not a run
    assert(run("v 12-34 x") == Seq("v 12-34 x"))
  }

  test("chain order: email first (may contain digit runs), IP before runs, " +
      "run backstop last") {
    assert(run("m bob1234567@ex.co x") == Seq("m <EMAIL> x"))
    assert(run("ip 10.0.0.1 n 12345678 x") == Seq("ip <IP> n <NUM> x"))
  }

  test("no PII passes through untouched; empty string stays empty") {
    assert(run("plain text only", "") == Seq("plain text only", ""))
  }

  test("redact2Sql mirrors the chain textually: every class marker present " +
      "exactly as the Spark side emits it") {
    val sql = TextOps.redact2Sql("text")
    Seq("<EMAIL>", "<IP>", "<IBAN>", "<CARD>", "<PHONE>", "<NUM>")
      .foreach(m => assert(sql.contains(m), m))
    // Luhn fold present and the card stage precedes the phone stage
    assert(sql.contains("list_reduce"))
    assert(sql.indexOf("<CARD>") < sql.indexOf("<PHONE>"))
  }
}
