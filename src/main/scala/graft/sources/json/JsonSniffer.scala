package graft.sources.json

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** JSON SHAPE SNIFFING — the `read_json_auto` a migrating DuckDB user
  * leans on (r15 VERDICT missing #2; the JSON twin of
  * [[graft.sources.csv.CsvSniffer]]). Spark's own schema inference
  * covers the FIELD side once the layout is known, but the user-facing
  * verb needs the layout too: is the file newline-delimited objects
  * (Spark's default JSON mode) or one top-level array of records
  * (Spark needs `multiLine=true`)? This is the XlsxSchema.fromProbe
  * posture again: a BOUNDED head-of-file probe (default 64 KiB through
  * the Hadoop FS API — at 100 TB it still reads 64 KiB of ONE file)
  * detects the layout and the field set, and the caller does the real
  * distributed read with the inferred options.
  *
  * Field typing mirrors `read_json_auto`'s reporting for the FLAT
  * scalar lattice so the two engines' answers compare bit-for-bit:
  * quoted → VARCHAR, true/false → BOOLEAN, number with [.eE] → DOUBLE
  * else BIGINT; a field seen as both BIGINT and DOUBLE widens to
  * DOUBLE, any other conflict → VARCHAR; records missing a field just
  * don't vote (the union of keys is the schema, DuckDB's null-fill
  * rule). Nested objects/arrays classify as JSON and are not
  * descended — the sniffer's contract is the top-level record shape,
  * not a recursive schema (Spark's full inference takes over on the
  * actual read). */
object JsonSniffer {

  final case class JsonShape(format: String, fields: Seq[(String, String)]) {
    def nFields: Int = fields.size
    /** "name:TYPE,..." sorted by name — the cross-engine comparison key
      * (the oracle's string_agg over DESCRIBE read_json_auto). */
    def fieldsSpec: String =
      fields.sortBy(_._1).map { case (n, t) => s"$n:$t" }.mkString(",")
  }

  /** Probe the head of `path` and infer (layout, field set). */
  def sniff(spark: SparkSession, path: String, maxBytes: Int = 65536)
      : JsonShape = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    // one byte beyond the cap distinguishes exactly-maxBytes files from
    // truncated ones (the CsvSniffer sentinel)
    val cap = maxBytes + 1
    val buf = new Array[Byte](cap)
    var read = 0
    try {
      var n = in.read(buf, read, cap - read)
      while (n > 0 && read + n < cap) { read += n; n = in.read(buf, read, cap - read) }
      if (n > 0) read += n
    } finally in.close()
    // no truncation flag needed (unlike CSV): an object cut off at the
    // probe bound never closes its brace, so it simply doesn't vote
    val used = math.min(read, maxBytes)
    val sample = new String(buf, 0, used, java.nio.charset.StandardCharsets.UTF_8)
    val body = sample.dropWhile(_.isWhitespace)
    require(body.nonEmpty, s"empty JSON sample: $path")
    val format = body.head match {
      case '[' => "array"
      case '{' => "ndjson"
      case c => throw new IllegalArgumentException(
        s"not a JSON records file (starts with '$c'): $path")
    }
    val records = extractObjects(
      if (format == "array") body.tail else body)
    require(records.nonEmpty, s"no complete JSON record in sample: $path")
    val votes = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.Set[String]]
    records.foreach(r => fieldsOf(r).foreach { case (k, t) =>
      votes.getOrElseUpdate(k, scala.collection.mutable.Set.empty) += t
    })
    val fields = votes.toSeq.map { case (k, ts) =>
      val t =
        if (ts.size == 1) ts.head
        else if (ts == Set("BIGINT", "DOUBLE")) "DOUBLE"
        else "VARCHAR"
      k -> t
    }
    JsonShape(format, fields)
  }

  /** Top-level `{...}` spans in `s`, string-aware; a record cut off by
    * the probe bound is dropped (only COMPLETE objects vote). */
  private[json] def extractObjects(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = -1
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => if (depth == 0) start = i; depth += 1
        case '}' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i + 1); start = -1 }
        case _ =>
      }
      i += 1
    }
    out.result()
  }

  /** (key, typeclass) pairs of one FLAT object; nested values classify
    * as JSON and are skipped over bracket-aware. Malformed number
    * tokens ("1.2.3") scan as DOUBLE rather than rejecting — the
    * sniffer reports shape; the face's roundtrip READ is what
    * certifies the file actually parses. */
  private[json] def fieldsOf(obj: String): Seq[(String, String)] = {
    val out = Seq.newBuilder[(String, String)]
    var i = 1 // past '{'
    def skipWs(): Unit = while (i < obj.length && obj.charAt(i).isWhitespace) i += 1
    def readString(): String = {
      // at opening quote
      val sb = new StringBuilder
      i += 1
      while (i < obj.length && obj.charAt(i) != '"') {
        if (obj.charAt(i) == '\\' && i + 1 < obj.length) {
          sb.append(obj.charAt(i + 1)); i += 2
        } else { sb.append(obj.charAt(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
    def skipNested(open: Char, close: Char): Unit = {
      var depth = 0
      var inStr = false
      while (i < obj.length) {
        val c = obj.charAt(i)
        if (inStr) {
          if (c == '\\') i += 1 else if (c == '"') inStr = false
        } else {
          if (c == '"') inStr = true
          else if (c == open) depth += 1
          else if (c == close) { depth -= 1; if (depth == 0) { i += 1; return } }
        }
        i += 1
      }
    }
    while (i < obj.length - 1) {
      skipWs()
      if (i >= obj.length || obj.charAt(i) != '"') return out.result()
      val key = readString()
      skipWs()
      if (i >= obj.length || obj.charAt(i) != ':') return out.result()
      i += 1
      skipWs()
      val t = obj.charAt(i) match {
        case '"' => readString(); "VARCHAR"
        case '{' => skipNested('{', '}'); "JSON"
        case '[' => skipNested('[', ']'); "JSON"
        case 't' | 'f' => while (i < obj.length && obj.charAt(i).isLetter) i += 1; "BOOLEAN"
        case 'n' => while (i < obj.length && obj.charAt(i).isLetter) i += 1; "NULL"
        case _ =>
          val st = i
          while (i < obj.length && "+-0123456789.eE".indexOf(obj.charAt(i)) >= 0) i += 1
          if (obj.substring(st, i).exists(c => c == '.' || c == 'e' || c == 'E'))
            "DOUBLE"
          else "BIGINT"
      }
      if (t != "NULL") out += key -> t
      skipWs()
      if (i < obj.length && obj.charAt(i) == ',') i += 1
    }
    out.result()
  }
}
