package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus replicator for scale receipts (SCALE.md): builds a
  * `factor`× copy of a testdata directory so the §8.1 linearity claims can
  * be MEASURED instead of argued. Copy 0 is the source verbatim (the
  * scaled corpus is a superset); later copies are id-shifted and
  * content-perturbed so they do not collapse into degenerate duplicate
  * clusters:
  *
  *  - documents: copy k of doc i gets doc_id i + k·10⁹ and every 3rd word
  *    replaced by a copy-specific marker token. Stride THREE is
  *    load-bearing: the dedup entries shingle at k=3, and a 3-word window
  *    over a stride-3 marking always contains a marker, so NO two copies
  *    (nor a copy and its original) share any shingle — each copy is a
  *    genuinely distinct document. A wider stride aliases: with stride 4,
  *    copies in the same k%4 phase share the 1/4 of shingles that dodge
  *    the marked residue (pairwise J≈0.14), and at factor 100 those
  *    same-phase pairs are a sub-threshold LSH candidate BOMB (measured:
  *    37× runtime at 100× data) that real crawl growth does not have.
  *  - embeddings: copy k ≥ 1 of vector v gets a small deterministic
  *    per-(k, dim) offset, injective in k — preserves the geometry with
  *    no two copies sharing a vector.
  *  - events: copy k shifts user_id by k·10⁶ (far above any realistic id
  *    range) — factor× the series count over the same time span, which is
  *    exactly how a metrics corpus grows.
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
            (w, i) => when(i % 3 === col("k") % 3,
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
