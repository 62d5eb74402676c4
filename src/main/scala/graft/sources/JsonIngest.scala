package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-on-read JSON ingestion (S3 in SURVEY.md §2).
  *
  * The reference's entire input is JSON events parsed to typed records with
  * nulls dropped (`service/RabbitMqConsumerService.java:24-28`, gzip handled
  * by `component/MessageCompressionComponent.java:62-78`). Re-expressed
  * Spark-first: `from_json` in PERMISSIVE mode with an explicit
  * corrupt-record column — a malformed payload never kills the batch; it
  * parses to NULL fields plus the raw text in `_corrupt_record`, which the
  * caller routes to violations (the engine analog of the reference's
  * "filter(Objects::nonNull)" drop, made observable instead of silent).
  */
object JsonIngest {

  val CorruptCol = "_corrupt_record"

  /** Parse `jsonCol` against `schema` (PERMISSIVE): output gains one column
    * per schema field plus [[CorruptCol]] (NULL for well-formed rows).
    * from_json's PERMISSIVE corrupt-record contract requires the corrupt
    * column to be part of the parse schema itself. */
  def parseWithPolicy(df: DataFrame, jsonCol: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol), s"schema already has $CorruptCol")
    val full = schema.add(CorruptCol, StringType)
    df.withColumn("_parsed", from_json(col(jsonCol), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
      .select(col("*"), col("_parsed.*"))
      .drop("_parsed")
  }

  def isMalformed: Column = col(CorruptCol).isNotNull

  /** Malformed rows as violation rows (clip_id, rule_id, observed,
    * expected) — the ingestion counterpart of the engine's rule violations. */
  def malformedViolations(parsed: DataFrame, idCol: String, schemaName: String): DataFrame =
    parsed.filter(isMalformed)
      .select(col(idCol).cast("string").as("clip_id"),
        lit(s"json_parse:$schemaName").as("rule_id"),
        substring(col(CorruptCol), 1, 64).as("observed"),
        lit("well-formed JSON").as("expected"))
}
