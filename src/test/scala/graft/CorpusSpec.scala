package graft

import org.apache.spark.sql.functions._

import graft.ops.Corpus

class CorpusSpec extends SparkSuite {
  import spark.implicits._

  test("hexRate: boundary fractions map to the 4-hex threshold") {
    assert(Corpus.hexRate(0.0) == "0000")
    assert(Corpus.hexRate(0.5) == "8000")
    assert(Corpus.hexRate(0.25) == "4000")
    assert(Corpus.hexRate(1.0) == "g") // sorts after every hex prefix: keeps all
    intercept[IllegalArgumentException](Corpus.hexRate(1.5))
  }

  test("hashSample: deterministic, rate-proportional, id-stable across partitionings") {
    val d = spark.range(2000).select(col("id").as("doc_id"), lit("en").as("lang"))
    val kept = Corpus.hashSample(d, "doc_id", 0.25).collect().map(_.getLong(0)).toSet
    // md5 prefix is uniform: 25% ± a loose band
    assert(kept.size > 380 && kept.size < 620, s"got ${kept.size}")
    // identical selection regardless of partitioning (a doc-id property)
    val kept2 = Corpus.hashSample(d.repartition(7), "doc_id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept == kept2)
    // monotone: a bigger rate keeps a superset
    val kept50 = Corpus.hashSample(d, "doc_id", 0.5).collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(kept50))
  }

  test("mixSources: rates hit the target composition, binding source keeps all") {
    // 900 'web' / 300 'books' / 300 'code', target weights 1:1:4.
    // K = min(900/1, 300/1, 300/4) = 75 -> rates 75/900, 75/300, 1.0
    val d = spark.range(1500).select(col("id").as("doc_id"),
      element_at(array(lit("web"), lit("web"), lit("web"), lit("books"), lit("code")),
        (col("id") % 5 + 1).cast("int")).as("source"))
    val w = Map("web" -> 1.0, "books" -> 1.0, "code" -> 4.0)
    val rates = Corpus.mixRates(d, "source", w)
    assert(rates("code") == 1.0, "binding source must keep 100%")
    assert(math.abs(rates("web") - 75.0 / 900) < 1e-12)
    assert(math.abs(rates("books") - 75.0 / 300) < 1e-12)
    val out = Corpus.mixSources(d, "doc_id", "source", w)
    val bys = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bys("code") == 300)
    // hash sampling is binomial around the target 75: loose band
    assert(bys("web") > 40 && bys("web") < 115, s"web=${bys("web")}")
    assert(bys("books") > 40 && bys("books") < 115, s"books=${bys("books")}")
    // deterministic: same selection on a different partitioning
    val again = Corpus.mixSources(d.repartition(7), "doc_id", "source", w)
      .collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
  }

  test("assignSplits: exhaustive, id-stable, hash-space-consistent, validated") {
    val d = spark.range(3000).select(col("id").as("doc_id"))
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Corpus.assignSplits(d, "doc_id", "split", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every doc lands in exactly one split, proportions near the targets
    assert(out.size == 3000)
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 2250 && counts("train") < 2550, s"$counts")
    assert(counts("val") > 180 && counts("val") < 420, s"$counts")
    assert(counts("test") > 180 && counts("test") < 420, s"$counts")
    // a doc-id property: identical assignment on any partitioning
    val out2 = Corpus.assignSplits(d.repartition(7), "doc_id", "split", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == out2)
    // same hash space as hashSample: the train band IS the 0.8 sample
    val kept = Corpus.hashSample(d, "doc_id", 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(kept == out.collect { case (id, "train") => id }.toSet)
    // growing train only ADDS docs (contiguous cumulative bands)
    val wider = Corpus.assignSplits(d, "doc_id", "split",
        Seq("train" -> 0.9, "rest" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.collect { case (id, "train") => id }.toSet
      .subsetOf(wider.collect { case (id, "train") => id }.toSet))
    intercept[IllegalArgumentException](
      Corpus.assignSplits(d, "doc_id", "s", Seq("only" -> 1.0)))
    intercept[IllegalArgumentException](
      Corpus.assignSplits(d, "doc_id", "s", Seq("a" -> 0.5, "b" -> 0.6)))
    intercept[IllegalArgumentException](
      Corpus.assignSplits(d, "doc_id", "s", Seq("a" -> 1.1, "b" -> -0.1)))
  }

  test("quantileGate: per-group thresholds keep each group's top fraction") {
    // group a: scores 1..10 → p20 threshold = 2·0.2 + 3·0.8 = 2.8 →
    // keep 3..10; group b: 100x the scale, same structure — a global
    // threshold would keep ALL of b and almost none of a
    val d = ((1L to 10L).map(i => (i, "a", i * 1000000L)) ++
      (1L to 10L).map(i => (i + 100L, "b", i * 100000000L)))
      .toDF("doc_id", "src", "score")
      .unionByName(Seq((200L, "a")).toDF("doc_id", "src")
        .withColumn("score", lit(null).cast("long")))
      .unionByName(Seq(201L).toDF("doc_id")
        .withColumn("src", lit(null).cast("string"))
        .withColumn("score", lit(999L * 1000000L)))
    val kept = Corpus.quantileGate(d, col("score"), "src", dropFrac = 0.2)
      .collect().map(_.getLong(1)).sorted.toSeq
    // NULL score (200) and NULL group (201, even with a top score) fail
    assert(kept == ((3L to 10L) ++ (103L to 110L)).sorted)
    intercept[IllegalArgumentException](
      Corpus.quantileGate(d, col("score"), "src", dropFrac = 0.0))
  }

  test("interleaveByWeight: WFQ order interleaves sources at their rates; unknown source fails loudly") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b")).toDF("doc_id", "source")
    val out = Corpus.interleaveByWeight(docs, "doc_id", "source",
        Map("a" -> 2.0, "b" -> 1.0))
      .orderBy(col("vt"), col("source"), col("src_rank"))
      .collect().map(_.getString(1)).toSeq
    // a lands every 0.5 ticks, b every 1.0: vt = a:.5,1,1.5,2  b:1,2 —
    // ties (a,b) at 1 and 2 break by source name
    assert(out == Seq("a", "a", "b", "a", "a", "b"))
    val e = intercept[Exception](
      Corpus.interleaveByWeight(docs, "doc_id", "source", Map("a" -> 2.0))
        .collect())
    assert(e.getMessage.contains("source without a weight"))
  }

  test("shuffleAssign: dense per-shard ranks, partition-independent, seed-sensitive") {
    val d = spark.range(1000).select(col("id").as("doc_id"))
    val out = Corpus.shuffleAssign(d, "doc_id", seed = 42L, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1000 && out.forall(x => x._2 >= 0 && x._2 < 8))
    // positions are a dense 1..n_shard rank within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a doc-id property: identical layout on any partitioning
    val again = Corpus.shuffleAssign(d.repartition(7), "doc_id", 42L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a new seed is a full reshuffle (same shard AND pos for all 1000
    // docs would need astronomical luck)
    val reseeded = Corpus.shuffleAssign(d, "doc_id", 43L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reseeded.sortBy(_._1).toSeq != out.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](
      Corpus.shuffleAssign(d, "doc_id", 42L, 0))
  }

  test("assignSplitsLeakageSafe: cluster members share a split; others unchanged") {
    val d = spark.range(3000).select(col("id").as("doc_id"))
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    // clusters spanning ids whose OWN bands differ (any md5 spread will do)
    val clusters = Seq((5L, 5L), (100L, 5L), (2999L, 5L),
      (7L, 7L), (8L, 7L)).toDF("doc_id", "cluster_id")
    val out = Corpus.assignSplitsLeakageSafe(d, "doc_id", "split", fracs, clusters)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 3000)
    // every cluster member gets the CANONICAL's split
    val plain = Corpus.assignSplits(d, "doc_id", "split", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Seq(5L, 100L, 2999L).map(out).distinct.size == 1)
    assert(out(100L) == plain(5L) && out(2999L) == plain(5L))
    assert(out(8L) == plain(7L))
    // unclustered docs keep their id-keyed assignment
    val clustered = Set(5L, 100L, 2999L, 7L, 8L)
    assert(out.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)))
  }

  test("upsampleEpochs: floor copies + hash-band partial epoch; subsample degrades to hashSample") {
    val d = spark.range(400).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 2).cast("string")).as("source"),
      lit("x").as("text"))
    val out = Corpus.upsampleEpochs(d, "doc_id", "source",
      Map("s0" -> 2.5, "s1" -> 0.5))
    assert(out.columns.toSeq == Seq("doc_id", "source", "text", "epoch"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    // s0 docs appear 2 or 3 times with dense epochs 0..n-1
    for ((id, rs) <- byDoc if rs.head._2 == "s0") {
      assert(rs.length == 2 || rs.length == 3, s"doc $id: ${rs.length} copies")
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // s1 docs appear at most once, at epoch 0
    for ((id, rs) <- byDoc if rs.head._2 == "s1") {
      assert(rs.length == 1 && rs.head._3 == 0L, s"doc $id")
    }
    // the s1 subset IS hashSample at the same rate (one shared hash band)
    val viaSample = Corpus.hashSample(d.filter(col("source") === "s1"),
      "doc_id", 0.5).collect().map(_.getLong(0)).toSet
    assert(byDoc.collect { case (id, rs) if rs.head._2 == "s1" => id }.toSet
      == viaSample)
    // partial-epoch membership for s0 uses the SAME band: docs with 3
    // copies are exactly the 0.5-band members
    val threeCopy = byDoc.collect { case (id, rs) if rs.length == 3 => id }.toSet
    val band = Corpus.hashSample(d.filter(col("source") === "s0"),
      "doc_id", 0.5).collect().map(_.getLong(0)).toSet
    assert(threeCopy == band)
    // deterministic under repartitioning
    val again = Corpus.upsampleEpochs(d.repartition(7), "doc_id", "source",
      Map("s0" -> 2.5, "s1" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).sorted
    assert(again.toSeq == rows.sorted.toSeq)
    // sources missing from the map drop; bad epochs fail loudly
    assert(Corpus.upsampleEpochs(d, "doc_id", "source", Map("s0" -> 1.0))
      .select("source").distinct().collect().map(_.getString(0)).toSeq == Seq("s0"))
    intercept[IllegalArgumentException](
      Corpus.upsampleEpochs(d, "doc_id", "source", Map("s0" -> 0.0)))
  }

  test("snapshotDiff: added/removed/changed/unchanged; whitespace-normalized compare") {
    val oldV = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"))
      .toDF("doc_id", "text")
    val newV = Seq(
      (1L, "  Alpha   text "), // normalizes to the same fingerprint
      (2L, "beta text CHANGED"),
      (4L, "delta text")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.snapshotDiff(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"got $out")
  }

  test("doremiWeights: exponential in excess loss, normalized, monotone; doremiMix == mixSources on the raw map") {
    import spark.implicits._
    val losses = Seq(("a", 0.0), ("b", 0.5), ("c", 1.0)).toDF("source", "excess_loss")
    val w = Corpus.doremiWeights(losses, "source", "excess_loss", temperature = 0.5)
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
    assert(w("c") > w("b") && w("b") > w("a"))
    // exact exponential ratio: exp(1.0/0.5)/exp(0.5/0.5) = e
    assert(math.abs(w("c") / w("b") - math.exp(1.0)) < 1e-12)
    // high temperature → uniform (the update vanishes)
    val flat = Corpus.doremiWeights(losses, "source", "excess_loss", temperature = 1e9)
    assert(flat.values.forall(v => math.abs(v - 1.0 / 3) < 1e-9))
    intercept[IllegalArgumentException](Corpus.doremiWeights(
      losses.unionAll(losses), "source", "excess_loss", 1.0))
    intercept[IllegalArgumentException](Corpus.doremiWeights(
      losses, "source", "excess_loss", 0.0))
    // exp overflow to Infinity fails loudly instead of feeding mixSources
    // a 0·Inf = NaN rate that silently empties the mix (advisor-caught)
    val overflow = intercept[IllegalArgumentException](Corpus.doremiWeights(
      losses, "source", "excess_loss", temperature = 1e-4))
    assert(overflow.getMessage.contains("non-finite"))
    // the mirror case: every exp UNDERFLOWS to 0.0 (finite!), and
    // normalization would turn 0/0 into NaN weights — fail loudly too
    // (review-caught; only bites normalize=true, the default)
    val negLosses = Seq(("a", -500.0), ("b", -600.0)).toDF("source", "excess_loss")
    val underflow = intercept[IllegalArgumentException](Corpus.doremiWeights(
      negLosses, "source", "excess_loss", temperature = 0.5))
    assert(underflow.getMessage.contains("underflowed"))
    // the composition is exactly mixSources under the raw exp map
    val docs = (0 until 300).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val l2 = Seq(("s0", 0.0), ("s1", 0.4), ("s2", 0.8)).toDF("source", "excess_loss")
    val viaDoremi = Corpus.doremiMix(docs, "doc_id", "source", l2, "excess_loss",
      temperature = 0.4).collect().map(_.getLong(0)).toSet
    val raw = Corpus.doremiWeights(l2, "source", "excess_loss", 0.4, normalize = false)
    val viaMix = Corpus.mixSources(docs, "doc_id", "source", raw)
      .collect().map(_.getLong(0)).toSet
    assert(viaDoremi == viaMix && viaDoremi.nonEmpty)
    // the hardest domain binds (keeps 100%): its n/w is smallest here
    val kept = Corpus.doremiMix(docs, "doc_id", "source", l2, "excess_loss", 0.4)
      .filter(col("source") === "s2").count()
    assert(kept == 100L, s"binding hardest domain kept $kept of 100")
    // a corpus domain with no loss row fails loudly — mixSources would
    // silently drop it at weight 0 (review-caught)
    val partial = Seq(("s0", 0.0), ("s1", 0.4)).toDF("source", "excess_loss")
    val e = intercept[IllegalArgumentException](
      Corpus.doremiMix(docs, "doc_id", "source", partial, "excess_loss", 0.4))
    assert(e.getMessage.contains("s2"))
  }

  test("mixSources: unlisted sources drop; bad weights fail loudly") {
    val d = spark.range(100).select(col("id").as("doc_id"),
      when(col("id") < 50, "keep").otherwise("other").as("source"))
    val out = Corpus.mixSources(d, "doc_id", "source", Map("keep" -> 1.0))
    assert(out.count() == 50)
    assert(out.filter(col("source") === "other").count() == 0)
    intercept[IllegalArgumentException](
      Corpus.mixRates(d, "source", Map.empty))
    intercept[IllegalArgumentException](
      Corpus.mixRates(d, "source", Map("keep" -> 0.0)))
    intercept[IllegalArgumentException](
      Corpus.mixRates(d, "source", Map("absent" -> 1.0)))
  }

  test("stratifiedSample: per-stratum thresholds, default for unlisted strata") {
    val d = spark.range(3000).select(col("id").as("doc_id"),
      element_at(array(lit("en"), lit("de"), lit("fr")),
        (col("id") % 3 + 1).cast("int")).as("lang"))
    val kept = Corpus.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultRate = 0.25)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == 1000)           // rate 1.0 keeps everything
    assert(!kept.contains("de"))         // rate 0.0 keeps nothing
    assert(kept("fr") > 150 && kept("fr") < 350) // default 25%
  }

  test("packShards: offsets are the exclusive prefix sum in id order; straddling allowed") {
    val d = Seq((1L, "a b c"), (2L, "d e"), (5L, "f g h i"), (9L, "j"))
      .toDF("doc_id", "text")
    val out = Corpus.packShards(d, "doc_id",
        size(split(col("text"), " ")), budget = 4, numBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // stream: doc1[0,3) doc2[3,5) doc5[5,9) doc9[9,10) — budget 4
    assert(out.toSeq == Seq((1L, 3L, 0L, 0L), (2L, 2L, 3L, 0L),
      (5L, 4L, 5L, 1L), (9L, 1L, 9L, 2L)))
  }

  test("packShards: block decomposition matches the single-window answer") {
    val d = spark.range(500).select(col("id").as("doc_id"),
      (col("id") % 37 + 1).as("tok"))
    val blocked = Corpus.packShards(d, "doc_id", col("tok"), budget = 100, numBlocks = 16)
    val global = Corpus.packShards(d, "doc_id", col("tok"), budget = 100,
      numBlocks = 1) // one block == the naive global window
    assert(blocked.collect().toSeq == global.collect().toSeq)
  }

  test("chunkByTokens: sliding windows with overlap, short tail, empty docs drop") {
    val d = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"),                 // shorter than one chunk
      (3L, "   "),                 // no tokens → no chunks
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Corpus.chunkByTokens(d, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // stride 3: starts 0,3,6,9 — start 9 is suppressed because its
    // chunk ("j") is a strict subset of "g h i j", which reaches the end
    assert(out.toSeq == Seq(
      (1L, 0L, "a b c d", 4L), (1L, 1L, "d e f g", 4L),
      (1L, 2L, "g h i j", 4L),
      (2L, 0L, "x y", 2L)))
    intercept[IllegalArgumentException](
      Corpus.chunkByTokens(d, "doc_id", "text", chunkTokens = 4, overlapTokens = 4))
  }

  test("chunkByBpe: windows over real BPE tokens reconstruct the text; budgets use real counts") {
    val d = Seq(
      (1L, "the cat and the dog sat on the mat with a hat"),
      (2L, "hi"),
      (3L, "   "),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Corpus.chunkByBpe(d, "doc_id", "text", chunkTokens = 4)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // overlap 0: chunks of a doc concatenate back to the document exactly
    // (BPE tokens carry their own spacing — the partition property)
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString).toMap
    assert(byDoc(1L) == "the cat and the dog sat on the mat with a hat")
    assert(byDoc(2L) == "hi")
    // whitespace-only is ONE real token (GPT-2 pre-tokenizer: \s+ runs
    // are tokens — an LLM context window spends budget on them), unlike
    // the whitespace word tokenizer which drops it; null text chunks to
    // nothing on both paths
    assert(byDoc(3L) == "   ")
    assert(!byDoc.contains(4L))
    // n_tokens over the doc sums to the real BPE count
    graft.functions.GraftFunctions.register(spark)
    val total = ops.TextAnalysis.bpeTokenCountReal(spark, lit(
      "the cat and the dog sat on the mat with a hat"))
    val n = spark.range(1).select(total.as("n")).collect().head.getLong(0)
    assert(out.filter(_._1 == 1L).map(_._4).sum == n)
    // packShards budgets by the real count: n_tokens is the BPE count and
    // stream offsets are its exclusive running sum in doc_id order (docs
    // may straddle shard boundaries by design — offsets are the contract)
    val src = d.filter(col("text").isNotNull && trim(col("text")) =!= "")
    val packed = Corpus.packShards(src, "doc_id",
        ops.TextAnalysis.bpeTokenCountReal(spark, col("text")),
        budget = 8, numBlocks = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val counts = src.select(col("doc_id"),
        ops.TextAnalysis.bpeTokenCountReal(spark, col("text")).as("n"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(packed.map(p => (p._1, p._2)).toSeq == counts.toSeq)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _).init
    assert(packed.map(_._3).toSeq == offsets.toSeq)
    assert(packed.map(_._4).toSeq == offsets.map(_ / 8).toSeq)
  }

  test("topKPerGroup: score desc with id tiebreak, k bound per group") {
    val d = Seq(("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.7)).toDF("grp", "doc_id", "score")
    val out = Corpus.topKPerGroup(d, Seq("grp"), "score", "doc_id", 2)
      .select("grp", "doc_id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 5L, 1L)))
  }

  test("streamingCurate on a batch frame: fp-dedup + quality/lang gate") {
    val d = Seq(
      (1L, 1000L, "the cat and the dog is in the house of a good man"),
      (2L, 2000L, "The cat  and the dog is in the house of a good man"), // same fp
      (3L, 3000L, "zzz qqq"))                                            // low quality
      .toDF("doc_id", "t", "text")
      .withColumn("__et", timestamp_millis(col("t")))
    val out = Corpus.streamingCurate(d, "doc_id", "text", "__et", "10 seconds", 0.3)
      .select("doc_id", "pred_lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "en")))
  }

  test("streamingCurate batch keep is partition-order independent") {
    // 40 docs in 4 fingerprint groups; the kept id per group must be the
    // (event time, id)-minimum whatever the physical layout
    val d = spark.range(40).select(col("id").as("doc_id"),
      (lit(1000L) - col("id") * 7 % 13).as("t"),
      concat(lit("the common text body number "), (col("id") % 4).cast("string"))
        .as("text"))
      .withColumn("__et", timestamp_millis(col("t")))
    def kept(df: org.apache.spark.sql.DataFrame) =
      Corpus.streamingCurate(df, "doc_id", "text", "__et", "10 seconds", 0.0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val base = kept(d)
    assert(base.size == 4)
    assert(kept(d.repartition(13)) == base)
    assert(kept(d.orderBy(col("doc_id").desc)) == base)
  }

  test("packShards: hashed (sparse, negative) ids keep a bounded block table") {
    val d = spark.range(300).select(xxhash64(col("id")).as("doc_id"),
      (col("id") % 13 + 1).as("tok"))
    val out = Corpus.packShards(d, "doc_id", col("tok"), budget = 64, numBlocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exclusive prefix sums in hashed-id order, straddle-chunk shards
    val sorted = d.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val model = sorted.zip(sorted.map(_._2).scanLeft(0L)(_ + _))
      .map { case ((id, tok), off) => (id, tok, off) }
    assert(out.toSeq == model.toSeq)
  }

  test("packShards: NULL ids fail loudly even when idBounds skips the pre-pass") {
    val d = Seq((Some(1L), 3L), (None, 2L), (Some(5L), 4L))
      .toDF("doc_id", "tok")
    val e = intercept[Exception] {
      Corpus.packShards(d, "doc_id", col("tok"), budget = 4, numBlocks = 4,
        idBounds = Some((1L, 5L))).collect()
    }
    // the raise_error surfaces wrapped in Spark's job failure
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("packShards")),
      s"expected the packShards null-id error, got: $e")
  }

  test("packShards plan: every window carries a partition spec") {
    val d = spark.range(100).select(col("id").as("doc_id"), lit(2L).as("tok"))
    val specs = Corpus.packShards(d, "doc_id", col("tok"), budget = 10, numBlocks = 8)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
      }
    // WindowExec's "No Partition Defined … single partition" warning fires
    // on an EMPTY partition spec; the totals window avoids it with a
    // constant key (same single-partition semantics, no scary log line)
    assert(specs.nonEmpty && specs.forall(_.nonEmpty),
      s"found an unpartitioned window: $specs")
  }

  test("shuffleAssign plan: the rank window is partitioned by shard") {
    val d = spark.range(100).select(col("id").as("doc_id"))
    val specs = Corpus.shuffleAssign(d, "doc_id", 42L, 8)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w.partitionSpec
      }
    // the whole point of shard-then-rank: no corpus-wide sort, so every
    // window must carry a (shard) partition spec
    assert(specs.nonEmpty && specs.forall(_.nonEmpty),
      s"found an unpartitioned window: $specs")
  }

  test("topKPerGroup plan: rank filter lowers to WindowGroupLimit") {
    // a distributed child, not a LocalRelation — InferWindowGroupLimit
    // skips tiny local inputs where the rewrite cannot pay off
    val d = spark.range(100).select((col("id") % 5).as("grp"),
      col("id").as("doc_id"), (col("id") % 7).cast("double").as("score"))
    val plan = Corpus.topKPerGroup(d, Seq("grp"), "score", "doc_id", 2)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }
}

class CorpusStreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streamingDedup: bootstrap, cross-batch keep, index growth, survivors-only appended") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdtest").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = graft.ops.Dedup.streamingDedup(stream, "doc_id", "text",
      s"$tmp/idx", s"$tmp/kept", s"$tmp/ckpt", k = 3, threshold = 0.5)
    try {
      // batch 0: bootstrap — everything kept, index built
      mem.addData((1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different historical content here entirely"))
      q.processAllAvailable()
      assert(graft.ops.Dedup.readDedupIndexMeta(spark, s"$tmp/idx")
        .exists(_._1 == "batch-0"))
      // batch 1: 10 dups batch 0's doc 1 → dropped; 11 is novel → kept
      mem.addData((10L, "the quick brown fox jumps over the lazy dog today"),
        (11L, "novel fresh unseen writing with new words only"))
      q.processAllAvailable()
      // batch 2: 20 dups the doc APPENDED in batch 1 → dropped
      mem.addData((20L, "novel fresh unseen writing with new words only"),
        (21L, "yet another original piece of text altogether now"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$tmp/kept")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 2L, 11L, 21L), s"got $kept")
      assert(graft.ops.Dedup.readDedupIndexMeta(spark, s"$tmp/idx")
        .exists(_._1 == "batch-2"))
    } finally q.stop()
  }

  test("streamingDedup: meta-less index with tables refuses loudly; parameter drift refuses") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdguard").toString
    val hist = Seq((1L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.saveDedupIndex(hist, "doc_id", "text", s"$tmp/idx", "v0", k = 3)
    // half-applied append: tables exist, _meta gone — bootstrap must NOT
    // silently rebuild from the batch and discard history
    new java.io.File(s"$tmp/idx/_meta").delete()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.ops.Dedup.streamingDedup(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp/idx", s"$tmp/kept", s"$tmp/ckpt",
      k = 3, threshold = 0.5)
    try {
      mem.addData((10L, "anything at all here"))
      val e = intercept[Exception](q.processAllAvailable())
      assert(e.getMessage.contains("no _meta") ||
        Option(e.getCause).exists(_.getMessage.contains("no _meta")) ||
        e.toString.contains("inconsistent"), s"unexpected: $e")
    } finally q.stop()
    // drifted parameters against a healthy index refuse per-batch
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_sdguard2").toString
    graft.ops.Dedup.saveDedupIndex(hist, "doc_id", "text", s"$tmp2/idx", "v0", k = 3)
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q2 = graft.ops.Dedup.streamingDedup(mem2.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp2/idx", s"$tmp2/kept", s"$tmp2/ckpt",
      k = 5, threshold = 0.5)
    try {
      mem2.addData((10L, "anything at all here"))
      val e2 = intercept[Exception](q2.processAllAvailable())
      assert(e2.toString.contains("built with") ||
        Option(e2.getCause).exists(_.getMessage.contains("built with")), s"unexpected: $e2")
    } finally q2.stop()
  }

  test("streamingCurate: cross-batch fingerprint dedup within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val stream = mem.toDF().toDF("doc_id", "t", "text")
      .withColumn("__et", timestamp_millis(col("t")))
    val out = graft.ops.Corpus.streamingCurate(stream, "doc_id", "text", "__et",
        "10 seconds", minQuality = 0.3)
      .select("doc_id", "pred_lang", "quality_score")
    val q = out.writeStream.format("memory")
      .queryName("curate_out").outputMode("append").start()
    try {
      mem.addData((1L, 1000L, "the cat and the dog is in the house of a good man"),
        (3L, 1500L, "zzz qqq")) // fails the quality gate
      q.processAllAvailable()
      // SAME normalized text in a LATER batch, inside the watermark → dropped
      mem.addData((2L, 2000L, "The cat  and the dog is in the house of a good man"))
      q.processAllAvailable()
      val rows = spark.sql("select doc_id, pred_lang from curate_out")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "en")), s"got ${rows.toSeq}")
    } finally q.stop()
  }
}
