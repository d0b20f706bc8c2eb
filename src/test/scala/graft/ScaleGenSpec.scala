package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleGen

/** Pins the corpus-shape invariants SCALE.md's receipts rest on — the
  * replicator is measurement apparatus, and a wrong corpus shape fakes
  * (or hides) scaling behavior: stride-4 markers once inflated LSH
  * candidates 37× at factor 100 (see ScaleGen's scaladoc). */
class ScaleGenSpec extends SparkSuite {
  import spark.implicits._

  test("replicateDocuments: copy 0 verbatim, ids unique, and NO two copies of a doc share any 3-shingle") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "s0", 10L),
      (2L, "a b c d e f g", "de", "s1", 7L),
      (3L, "x y", "fr", "s2", 2L)) // < 3 words: no shingles, still copied
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = ScaleGen.replicateDocuments(docs, 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 15) // ids unique across copies
    assert(out(1L) == "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10") // copy 0 verbatim
    assert(out(2L) == "a b c d e f g")
    def shingles(t: String): Set[String] =
      t.split(" ").toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    for (base <- Seq(1L, 2L, 3L)) {
      val copies = (0 until 5).map(k => shingles(out(base + k * 1000000000L)))
      for (i <- copies.indices; j <- copies.indices if i < j)
        assert(copies(i).intersect(copies(j)).isEmpty,
          s"doc $base copies $i/$j share shingles: ${copies(i).intersect(copies(j))}")
    }
  }

  test("replicateEmbeddings: copy 0 verbatim, every vector distinct (offset injective in the copy index)") {
    val emb = Seq(
      (1L, Seq(0.1f, 0.2f, 0.3f), 0),
      (2L, Seq(-0.5f, 0.0f, 0.5f), 1)).toDF("vec_id", "embedding", "label")
    // factor 9 spans a full %7 phase repeat (k and k+7) — the aliasing
    // case the review caught
    val out = ScaleGen.replicateEmbeddings(emb, 9)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(out.size == 18)
    assert(out(1L) == Seq(0.1f, 0.2f, 0.3f)) // verbatim
    assert(out.values.toSeq.distinct.size == 18, "duplicate vectors across copies")
  }

  test("replicateEvents: distinct series (user) count multiplies exactly") {
    val ev = Seq((0L, 1704067200000000000L, "click", 1.0),
        (1L, 1704067200000000000L, "view", 2.0),
        (1499L, 1704067201000000000L, "click", 3.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = ScaleGen.replicateEvents(ev, 10)
    assert(out.count() == 30)
    assert(out.select(countDistinct("user_id")).collect().head.getLong(0) == 30)
  }
}
