package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL corpus source — the training-data counterpart of the TSDB CSV
  * source ([[CsvSource]]): crawl and annotation pipelines interchange
  * documents as one-JSON-object-per-line files, and at 100 TB a corrupt
  * line must be QUARANTINED, not crash the job and not silently vanish.
  *
  * Shape: a distributed text scan + codegen'd `from_json` under an
  * EXPLICIT schema (never inference — a schema-inference pass over 100 TB
  * is a full extra read, and drifting inferred types break downstream
  * plans). A syntactically broken line yields a NULL struct and routes to
  * the quarantine stream with its raw text; a valid object merely MISSING
  * fields parses with NULLs (absence is not corruption — standard JSON
  * semantics). This deliberately avoids the native JSON reader's
  * corrupt-record column, whose "cannot query the corrupt column alone"
  * restriction makes reject-stream handling a caller-side trap. */
object JsonlSource {

  /** The in-struct corrupt-record field: PERMISSIVE `from_json` parses a
    * malformed line as an all-NULL struct — indistinguishable from `{}` —
    * unless the schema carries a corrupt-record column, which then holds
    * the raw text exactly when parsing failed. */
  val CorruptField = "__corrupt"

  /** All reserved names: [[CorruptField]] lives inside the parsed struct;
    * `raw_line` and `__parsed` are the output columns of [[read]] — a
    * caller schema reusing either would shadow them and turn downstream
    * selects ambiguous, so reject loudly up front. */
  val ReservedColumns: Set[String] = Set(CorruptField, "raw_line", "__parsed")

  /** Parse `path` as JSONL under `schema`: one row per line with the raw
    * text and the parsed struct, whose [[CorruptField]] is non-NULL iff
    * the line failed to parse. Building block for [[readSplit]]. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val clash = schema.fieldNames.filter(ReservedColumns.contains)
    require(clash.isEmpty,
      s"schema may not contain the reserved column(s) ${clash.mkString(", ")}")
    val withCorrupt = StructType(schema.fields :+ StructField(CorruptField, StringType))
    spark.read.text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptField)).as("__parsed"))
  }

  /** `(good, quarantined)`: good rows unwrapped to the schema columns,
    * quarantined raw lines kept verbatim for inspection/receipts. A line
    * must be a JSON OBJECT to be good: `from_json` parses a valid JSON
    * scalar/array as an all-NULL struct (indistinguishable from `{}`
    * after the fact), so non-object lines are quarantined by syntax —
    * JSONL-for-documents means one object per line. */
  def readSplit(spark: SparkSession, path: String,
                schema: StructType): (DataFrame, DataFrame) = {
    val parsed = read(spark, path, schema)
    val corrupt = col("__parsed").isNull ||
      col("__parsed").getField(CorruptField).isNotNull ||
      !col("raw_line").rlike("^\\s*\\{")
    (parsed.filter(!corrupt)
        .select(schema.fieldNames.toIndexedSeq.map(f => col("__parsed").getField(f).as(f)): _*),
      parsed.filter(corrupt).select(col("raw_line")))
  }
}
