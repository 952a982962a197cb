package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL ingest with a QUARANTINE lane — the parse step at the mouth
  * of a corpus pipeline: raw crawl/API payloads arrive as JSON lines,
  * and a 100 TB ingest cannot crash on the malformed sliver nor
  * silently drop it (a dropped record is an unauditable coverage
  * hole; the DeadLetter rule applied to parsing). Every input row
  * comes out exactly once, tagged `ingest_status`:
  * `ok`, `malformed` (unparseable JSON — the parser's corrupt-record
  * channel), or `missing:<field>` for the FIRST absent/null required
  * field in declaration order (one deterministic reason per row, the
  * filter-funnel attribution rule).
  *
  * Parsed fields surface as top-level columns (null where the row is
  * quarantined — consumers gate on `ingest_status`, and a release
  * entry coalesces before hashing). Everything is a scan-stage
  * column program: `from_json` (codegen'd Jackson parse) + null
  * probes — no shuffle, no state, so the streaming twin is the SAME
  * call at ingest (governance gates belong at ingest, the q103
  * rule).
  */
object JsonlIngest {

  def parseWithQuarantine(raw: DataFrame, jsonCol: Column,
                          schema: StructType,
                          required: Seq[String]): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "parseWithQuarantine: _corrupt_record is the reserved corrupt-" +
        "record channel and cannot be a schema field")
    val unknown = required.filterNot(schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"parseWithQuarantine: required fields not in the schema: " +
        s"${unknown.mkString(", ")}")
    val full = schema.add("_corrupt_record", StringType)
    val parsed = raw.withColumn("__p", from_json(jsonCol, full,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")))
    // reversed fold so the FIRST required field in declaration order
    // is the outermost when — one deterministic reason per row
    val missing = required.reverse.foldLeft(lit("ok")) { (acc, f) =>
      when(col("__p").getField(f).isNull, lit(s"missing:$f"))
        .otherwise(acc)
    }
    parsed
      .withColumn("ingest_status",
        when(col("__p").isNull ||
            col("__p").getField("_corrupt_record").isNotNull,
          lit("malformed")).otherwise(missing))
      .select(raw.columns.map(col).toSeq ++
        schema.fieldNames.toSeq.map(f => col("__p").getField(f).as(f)) :+
        col("ingest_status"): _*)
  }
}
