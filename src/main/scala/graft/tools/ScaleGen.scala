package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus replicator for scale receipts (SCALE.md): builds a
  * `factor`× copy of a testdata directory so the §8.1 linearity claims can
  * be MEASURED instead of argued. Copies are id-shifted and content-
  * perturbed so they do not collapse into degenerate duplicate clusters:
  *
  *  - documents: copy k of doc i gets doc_id i + k·10⁹ and every 4th word
  *    replaced by a copy-specific marker token — ~3/4 of its 3-shingles
  *    differ from the original AND from every other copy, so MinHash/LSH
  *    sees a corpus 10× the size, not 10 near-identical replicas of the
  *    same corpus (which would grow candidate PAIRS quadratically in the
  *    copy count and fake a super-linear blowup the real crawl doesn't
  *    have).
  *  - embeddings: copy k of vector v gets a small deterministic per-(k,
  *    dim) offset — preserves the overall geometry while keeping copies
  *    from being exact duplicates (identical vectors would put the whole
  *    corpus at cosine 1.0).
  *  - events: copy k shifts user_id by k·1000 — 10× the series count over
  *    the same time span, which is exactly how a metrics corpus grows.
  *
  * Usage: `runMain graft.tools.ScaleGen <srcSfDir> <outDir> [factor]`. */
object ScaleGen {

  def replicateDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val copies = docs.sparkSession.range(factor.toLong).toDF("k")
    docs.crossJoin(copies)
      // the marker must use the SHIFTED id (unique per (doc, copy));
      // compute it explicitly rather than via the select's lateral
      // column alias, which would resolve the same way but implicitly
      .withColumn("__sid", col("doc_id") + col("k") * 1000000000L)
      .select(
        col("__sid").as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            (w, i) => when(i % 4 === col("k") % 4,
                concat(lit("cpy"), col("k"), lit("x"), col("__sid")))
              .otherwise(w)))).as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  def replicateEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val copies = emb.sparkSession.range(factor.toLong).toDF("k")
    emb.crossJoin(copies)
      .select(
        (col("vec_id") + col("k") * 1000000000L).as("vec_id"),
        // copy 0 verbatim (the scaled corpus is a superset of the source);
        // later copies get a per-(k, dim) offset that is INJECTIVE in k —
        // the k-proportional term guarantees no two copies share a vector
        // even where the %7 phase repeats (k and k+7)
        when(col("k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x + col("k") * lit(0.0007f) +
              (col("k") * 31 + i) % 7 * lit(0.003f) - lit(0.009f))
              .cast("float"))).as("embedding"),
        col("label"))
  }

  def replicateEvents(ev: DataFrame, factor: Int): DataFrame = {
    val copies = ev.sparkSession.range(factor.toLong).toDF("k")
    ev.crossJoin(copies)
      // stride far above any realistic user-id range: sf0.1 uses
      // 0..1499, and colliding copies would merge series (2× density)
      // instead of multiplying the series count
      .withColumn("user_id", col("user_id") + col("k") * 1000000L)
      .drop("k")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    replicateDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
      .repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    replicateEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor)
      .repartition(8).write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    replicateEvents(spark.read.parquet(s"$src/events.parquet"), factor)
      .repartition(32).write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")
    spark.stop()
  }
}
