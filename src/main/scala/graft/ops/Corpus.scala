package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-selection operators — the final stage of a training-data
  * pipeline (north-star additions beyond the reference, SURVEY §7.3
  * step 12): after scoring ([[TextAnalysis]]) and deduplication
  * ([[Dedup]]), these pick WHICH documents ship and HOW they are laid
  * out into training shards.
  *
  * Determinism is the design constraint throughout: re-running a
  * sampling/packing job over the same corpus must produce the same
  * byte-identical selection on any cluster size (no `rand()`, no
  * partition-order dependence), both for reproducible training runs and
  * for the DuckDB oracle twins.
  */
object Corpus {

  /** Deterministic Bernoulli sampling by content-independent hash: keep a
    * row iff the first four hex chars of `md5(id)` fall below a threshold.
    * md5 of the decimal-string id is identical in every engine (the DuckDB
    * twin is `substring(md5(id::VARCHAR), 1, 4) < '...'`), and the hex
    * prefix is uniform over 0x0000-0xffff, so a threshold of `hexRate(p)`
    * keeps fraction ~p. Shuffle-free — a filter at scan speed; the sample
    * is a stable doc-id property, independent of partitioning, cluster
    * size, or row order (what `df.sample` can NOT promise across runs). */
  def hashSample(docs: DataFrame, idCol: String, rate: Double): DataFrame =
    docs.filter(hashKey(col(idCol)) < lit(hexRate(rate)))

  /** Per-stratum sampling rates — downsample overrepresented strata
    * (the classic language/source rebalancing step). `rates` maps stratum
    * value → keep fraction; strata not listed keep `defaultRate`. Same
    * hash as [[hashSample]], threshold chosen per row by stratum. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame =
    docs.filter(hashKey(col(idCol)) <
      caseOverMap(col(stratumCol), rates, lit(hexRate(defaultRate)))(r =>
        lit(hexRate(r))))

  /** Per-key literal dispatch over a Map — the ONE when-chain builder the
    * stratum/source-keyed operators share ([[stratifiedSample]],
    * [[upsampleEpochs]], [[interleaveByWeight]]): `keyCol == k →
    * value(k)`, falling through to `default`. Branch predicates are
    * disjoint, so Map iteration order never affects semantics. */
  private def caseOverMap[A](keyCol: Column, m: Map[String, A],
                             default: Column)(value: A => Column): Column =
    m.foldLeft(default) { case (acc, (k, v)) =>
      when(keyCol === k, value(v)).otherwise(acc)
    }

  private def hashKey(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 4)

  /** Deterministic train/val/test split assignment — the same
    * content-independent md5-prefix hash as [[hashSample]] carves the
    * 0x0000-0xffff space into contiguous bands, one per split, by
    * cumulative fraction. A document's split is a stable property of its
    * id: re-running over a grown corpus never moves an existing doc
    * between splits (the eval-set-contamination failure mode of
    * `randomSplit`, which reshuffles every run AND with partitioning).
    * The LAST split takes the remainder band, so hexRate rounding can
    * never orphan an id. Shuffle-free — a projection at scan speed. */
  def assignSplits(docs: DataFrame, idCol: String, splitCol: String,
                   fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.size >= 2, "assignSplits: need at least two splits")
    fractions.foreach { case (n, f) =>
      require(f > 0.0, s"assignSplits: fraction for '$n' must be positive: $f")
    }
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"assignSplits: fractions must sum to 1.0: $total")
    val key = hashKey(col(idCol))
    // cumulative upper bound of each split's band, in declaration order;
    // the last split is the otherwise-branch (remainder band)
    // clamp: the 1e-9 sum tolerance can push a cumulative bound to
    // 1.0+eps, which hexRate would reject with a misleading message
    val cums = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(math.min(_, 1.0))
    val assigned = fractions.init.zip(cums.init)
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), cum), rest) =>
          when(key < lit(hexRate(cum)), lit(name)).otherwise(rest)
      }
    docs.withColumn(splitCol, assigned)
  }

  /** Leakage-safe [[assignSplits]]: near-duplicate documents must never
    * straddle train and test (a test doc with a train near-twin inflates
    * eval — the contamination that id-keyed splitting cannot see). The
    * split key is the near-dup cluster CANONICAL id where one exists
    * (`clusters` as produced by [[graft.ops.Dedup.nearDupClusters]]:
    * `(doc_id, cluster_id)`) and the doc's own id otherwise, so every
    * member of a cluster hashes into the same band — same split — by
    * construction.
    *
    * Scale shape: one join against the near-dup member table (tiny vs the
    * corpus — AQE broadcasts it), then [[assignSplits]]'s shuffle-free
    * band projection. Band fractions hold approximately: a cluster counts
    * once per member, but near-dup mass is a small corpus fraction by the
    * time splits are assigned (dedup normally runs first — this operator
    * covers the keep-everything-but-split-safely pipeline variant). */
  def assignSplitsLeakageSafe(docs: DataFrame, idCol: String, splitCol: String,
                              fractions: Seq[(String, Double)],
                              clusters: DataFrame): DataFrame = {
    // project the clusters side to reserved names BEFORE the join: docs in
    // a dedup pipeline often already carry a cluster_id column, which
    // would otherwise make the coalesce reference ambiguous
    val canon = clusters.select(col("doc_id").as(idCol),
      col("cluster_id").as("__canon_id"))
    assignSplits(
      docs.join(canon, Seq(idCol), "left")
        .withColumn("__split_key", coalesce(col("__canon_id"), col(idCol)))
        .drop("__canon_id"),
      "__split_key", splitCol, fractions)
      .drop("__split_key")
  }

  /** Per-group calibrated quality gate — "drop each source's bottom 20%
    * by quality": keeps rows whose integer score is >= the group's
    * `dropFrac` percentile. Per-GROUP thresholds are the point: a fixed
    * global cutoff either guts low-scoring-but-wanted sources or lets
    * high-scoring sources dilute — calibrating within each source is the
    * standard curation move.
    *
    * `scoreInt` must be integer-valued and deterministic (scale a 6-dp
    * score by 1e6) — integer inputs make exact `percentile` ==
    * `quantile_cont` bit-identical cross-engine (interpolation formula
    * verified, see [[TextAnalysis.perplexityBuckets]]). Rows with a NULL
    * score, or a NULL group key no threshold row can match, fail the
    * gate (a filter has no `na` lane; unscorable rows don't pass).
    *
    * Distributed shape: one `groupBy(groupCol)` percentile aggregate
    * (#groups rows, broadcast back) then a scan-speed filter — no sort,
    * no window, same shape as [[TextAnalysis.perplexityBucketsBy]]. */
  def quantileGate(docs: DataFrame, scoreInt: Column, groupCol: String,
                   dropFrac: Double): DataFrame = {
    require(dropFrac > 0.0 && dropFrac < 1.0,
      s"quantileGate: dropFrac must be in (0, 1): $dropFrac")
    val s = docs.withColumn("__score", scoreInt)
    val th = s.filter(col("__score").isNotNull)
      .groupBy(groupCol)
      .agg(percentile(col("__score"), lit(dropFrac)).as("__t"))
    s.join(broadcast(th), Seq(groupCol), "left")
      .filter(col("__score") >= col("__t"))
      .drop("__score", "__t")
  }

  /** Deterministic training-order shuffle WITHOUT a global sort — the
    * 100 TB answer to "randomize the corpus before training": every doc
    * gets a seed-keyed md5 shuffle key, its shard is a 60-bit band of
    * that key mod `nShards`, and its position is a rank within the shard
    * only (partitioned window — each shard sorts independently, nothing
    * corpus-wide). Same seed → identical layout on any partitioning or
    * corpus growth history; a new seed is a full reshuffle. Keyed on id,
    * not content, so identical docs land independently.
    *
    * Output: `(idCol, shard, pos)` — consumers write shard files in
    * `pos` order for a reproducible epoch-0 data order. */
  def shuffleAssign(docs: DataFrame, idCol: String, seed: Long,
                    nShards: Int): DataFrame = {
    require(nShards > 0, s"shuffleAssign: nShards must be positive: $nShards")
    // 60-bit md5 prefix (the conv/UBIGINT idiom the DuckDB twins share):
    // mod-nShards bias is ~nShards/2^60 — negligible for any real count
    val key = conv(substring(md5(
        concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy("shard").orderBy(col("__key"), col(idCol))
    docs.select(col(idCol), key.as("__key"))
      .withColumn("shard", pmod(col("__key"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__key")
  }

  /** Weighted-fair INTERLEAVING — the training-order scheduler: given a
    * consumption rate per source, assign every doc the WFQ virtual
    * finishing time `vt = src_rank / weight` (stride scheduling — a
    * weight-2 source lands a doc every 0.5 virtual ticks, a weight-1
    * source every 1.0). Reading the corpus ordered by `(vt, source,
    * src_rank)` interleaves sources at their configured rates (a
    * weight-w source appears w times per virtual tick; ties at shared
    * ticks break by source name, and a source with weight ratio > 1
    * necessarily places its extra docs back-to-back within a tick) —
    * the read-time complement of [[mixSources]] (which sets
    * VOLUME composition) and the deterministic analog of a dataloader's
    * per-step source sampler. Like [[shuffleAssign]], this EMITS the
    * ordering key; nothing here globally sorts — the dataloader's
    * ordered read (or a range-partitioned write) materializes the order.
    *
    * `vt` is one IEEE division of exact integers per row — bit-identical
    * cross-engine, no summation-order concerns. Plan shape: one shuffle
    * on source for the per-source rank window (skew bounded by the
    * largest source; for billion-doc sources swap in the
    * [[shuffleAssign]] md5-banded rank). Sources missing from `weights`
    * fail loudly — silently dropping or defaulting a source would skew
    * the mix without a trace. */
  def interleaveByWeight(docs: DataFrame, idCol: String, sourceCol: String,
                         weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"interleaveByWeight: weights must be positive: $weights")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    val wExpr = caseOverMap(col(sourceCol), weights,
      lit(null).cast("double"))(wt => lit(wt))
    docs.select(col(idCol), col(sourceCol))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      // coalesce the source into the message too: concat null-propagates,
      // and a NULL source would otherwise abort with a message-less error
      .withColumn("__w", coalesce(wExpr,
        raise_error(concat(lit("interleaveByWeight: source without a weight: "),
          coalesce(col(sourceCol), lit("<NULL>"))))))
      .withColumn("vt", round(col("src_rank").cast("double") / col("__w"), 6))
      .drop("__w")
  }

  /** Weighted multi-source mixture sampling — "50% web, 30% books, 20%
    * code": downsample each source so the OUTPUT composition matches
    * `weights` (normalized over the listed sources) while keeping as much
    * data as possible. The binding source — the one that runs out first,
    * `argmin(n_s / w_s)` — keeps 100%; every other source keeps
    * `rate_s = K * w_s / n_s` with `K = min(n_s / w_s)`. Sources not in
    * `weights` are dropped (weight 0).
    *
    * Plan shape at 100 TB: one column-pruned count per source (a
    * #sources-row aggregate — the only shuffle), rates derived from that
    * page-sized table, then [[stratifiedSample]]'s deterministic
    * md5-threshold filter at scan speed. The per-source counts are
    * collected to the driver like packShards' 3-value bounds row — a
    * bounded #sources-row table, not data.
    *
    * Rate arithmetic is plain IEEE double (`K * w / n`) — the DuckDB
    * twin reproduces the identical expression, so the derived thresholds
    * are bit-identical cross-engine. */
  def mixSources(docs: DataFrame, idCol: String, sourceCol: String,
                 weights: Map[String, Double]): DataFrame = {
    val rates = mixRates(docs, sourceCol, weights)
    stratifiedSample(docs.filter(col(sourceCol).isin(weights.keys.toSeq: _*)),
      idCol, sourceCol, rates, defaultRate = 0.0)
  }

  /** DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429
    * — the one-step multiplicative-weights form): domains whose proxy
    * model shows HIGH excess loss (hard, underfit — more learning
    * headroom) get exponentially more weight,
    * `w_s ∝ exp(excess_s / temperature)` normalized over domains. The
    * full algorithm iterates this update inside proxy-model training;
    * the published per-domain weights are what production runs reuse,
    * and this computes them from a measured excess-loss table.
    *
    * `losses` is a #domains-row table `(sourceCol, lossCol)` — collected
    * driver-side like [[mixSources]]' per-source counts (bounded by the
    * domain count, never data). Duplicate domain rows fail loudly (two
    * losses for one domain is an upstream bug, and silently keeping one
    * would skew the mixture). Returns the normalized weight map for
    * reporting; [[doremiMix]] composes the RAW exp weights with
    * [[mixSources]] — normalization is mathematically scale-invariant
    * there (K = min(n/w) rescales) but NOT bit-invariant: dividing by a
    * float-summed Z perturbs the derived sampling thresholds by ulps,
    * and the raw weights are what the oracle twin can reproduce as
    * closed-form expressions. */
  def doremiWeights(losses: DataFrame, sourceCol: String, lossCol: String,
                    temperature: Double,
                    normalize: Boolean = true): Map[String, Double] = {
    require(temperature > 0, s"temperature must be > 0: $temperature")
    val rows = losses
      .select(col(sourceCol).cast("string"), col(lossCol).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    require(rows.nonEmpty, "doremiWeights: empty losses table")
    require(rows.map(_._1).distinct.length == rows.length,
      s"doremiWeights: duplicate domain rows in losses " +
        s"(${rows.map(_._1).diff(rows.map(_._1).distinct).distinct.mkString(",")})")
    val ws = rows.map { case (s, l) => s -> math.exp(l / temperature) }
    // a large excess-loss / small-temperature combination overflows
    // exp() to Infinity; downstream mixSources would then derive
    // K = min(n/w) = 0 and a 0·Inf = NaN rate — the mix silently
    // empties. Fail loudly instead (the raw weights stay bit-exact
    // for the oracle twin; log-space normalization would perturb them).
    ws.filter(w => !java.lang.Double.isFinite(w._2)) match {
      case bad if bad.nonEmpty => throw new IllegalArgumentException(
        s"doremiWeights: non-finite exp weight for domain(s) " +
          s"${bad.map(_._1).mkString(",")} — loss/temperature too large " +
          s"(temperature=$temperature); rescale losses or raise temperature")
      case _ =>
    }
    if (!normalize) return ws.toMap
    val z = ws.map(_._2).sum
    // the mirror of the Infinity guard: every exp UNDERFLOWING to 0.0
    // passes isFinite, then 0.0/0.0 normalizes to NaN for every domain
    // and the mix silently empties the same way
    if (z == 0.0) throw new IllegalArgumentException(
      "doremiWeights: every exp weight underflowed to 0 — losses too " +
        s"negative for temperature=$temperature; rescale losses or raise temperature")
    ws.map { case (s, w) => s -> w / z }.toMap
  }

  /** [[doremiWeights]] ∘ [[mixSources]]: downsample the corpus to the
    * DoReMi composition (raw exp weights — see [[doremiWeights]] on why
    * not the normalized map). Every corpus domain must have a loss row:
    * mixSources drops unlisted sources at weight 0, which here would
    * silently remove whole domains from the training mix (e.g. a crawl
    * source added after the proxy run) — that fails loudly instead
    * (one column-pruned distinct, the same bounded cost as mixSources'
    * own per-source counts). */
  def doremiMix(docs: DataFrame, idCol: String, sourceCol: String,
                losses: DataFrame, lossCol: String,
                temperature: Double): DataFrame = {
    val weights =
      doremiWeights(losses, sourceCol, lossCol, temperature, normalize = false)
    // NULL sources label as "<NULL>" (the interleaveByWeight convention)
    // so the diagnostic stays readable instead of NPE-ing in the sort
    val missing = docs.select(col(sourceCol).cast("string")).distinct()
      .collect().map(r => Option(r.getString(0)).getOrElse("<NULL>"))
      .filterNot(weights.keySet)
    require(missing.isEmpty,
      s"doremiMix: corpus domains with no loss row: ${missing.sorted.mkString(",")}")
    mixSources(docs, idCol, sourceCol, weights)
  }

  /** Epoch-based source upsampling — the OTHER half of mixture control:
    * [[mixSources]] downsamples to a composition at max volume, this
    * REPEATS high-value sources a fractional number of epochs ("books
    * 3.25 epochs, web 1, code 0.5" — the published practice for LLM data
    * recipes, where small trusted sources are worth multiple passes).
    *
    * Every doc of source s is emitted `floor(e_s)` times (epoch
    * 0..floor-1) plus once more at epoch `floor(e_s)` iff its
    * [[hashSample]]-style md5 prefix falls below `hexRate(frac(e_s))` —
    * so the partial epoch is a deterministic hash-band SUBSET of the
    * source (stable under corpus growth and re-runs, and the SAME subset
    * every partial epoch, which is what makes the draw auditable).
    * e_s < 1 degrades to plain downsampling; sources not in the map drop.
    *
    * Distributed shape: zero shuffles — the epoch count is a plan-literal
    * case-when over the source column and the repeat is a `sequence`
    * explode at scan speed; row amplification IS the requested output.
    * Downstream training order comes from [[shuffleAssign]] over
    * (id, epoch). */
  def upsampleEpochs(docs: DataFrame, idCol: String, sourceCol: String,
                     epochs: Map[String, Double]): DataFrame = {
    require(epochs.nonEmpty, "upsampleEpochs: empty epochs map")
    epochs.foreach { case (s, e) =>
      require(e > 0.0 && e <= 1000.0,
        s"upsampleEpochs: epochs for '$s' must be in (0,1000]: $e")
    }
    val full = caseOverMap(col(sourceCol), epochs, lit(0))(e =>
      lit(math.floor(e).toInt))
    val fracTh = caseOverMap(col(sourceCol), epochs, lit("0000"))(e =>
      lit(hexRate(e - math.floor(e))))
    docs.filter(col(sourceCol).isin(epochs.keys.toSeq: _*))
      .withColumn("__n",
        full + when(hashKey(col(idCol)) < fracTh, 1).otherwise(0))
      // sequence(0, -1) would emit [0, -1] (negative default step), not
      // an empty range — zero-copy docs must leave before the explode
      .filter(col("__n") > 0)
      .select(docs.columns.toIndexedSeq.map(col) :+
        explode(sequence(lit(0L), col("__n").cast("long") - 1L)).as("epoch"): _*)
  }

  /** Corpus snapshot diff — the crawl-refresh receipts: per doc id,
    * whether it was `added`, `removed`, `changed` (same id, different
    * normalized content fingerprint — [[TextAnalysis.fingerprint]]) or
    * `unchanged` between two corpus versions. The report every
    * incremental retrain decision reads ("what actually moved since the
    * last snapshot?"), and the input to targeted re-embedding /
    * re-dedup of only the changed slice.
    *
    * Distributed shape: fingerprints at scan speed on each side, ONE
    * full-outer hash join on id — no corpus-wide sort; filter
    * `status != 'unchanged'` before materializing if only the delta
    * matters (the common case — predicate sits above the join, Spark
    * pushes nothing extra). */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    // presence comes from EXPLICIT markers, never from fingerprint
    // nullness: a NULL-text doc (JsonlSource parses missing fields as
    // NULL) has a NULL fingerprint but is still PRESENT — keying on the
    // fingerprint would misreport it as added/removed; the null-safe
    // fingerprint compare makes two NULL-text versions "unchanged"
    def fp(df: DataFrame, f: String, p: String) = df.select(
      col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as(f), lit(true).as(p))
    fp(oldDocs, "__fo", "__po")
      .join(fp(newDocs, "__fn", "__pn"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__po").isNull, "added")
          .when(col("__pn").isNull, "removed")
          .when(!(col("__fo") <=> col("__fn")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The per-source keep rates [[mixSources]] applies — exposed so a
    * pipeline can log its mixture receipts (and the oracle twin can be
    * read against them). */
  def mixRates(docs: DataFrame, sourceCol: String,
               weights: Map[String, Double]): Map[String, Double] = {
    require(weights.nonEmpty, "mixSources: empty weights")
    weights.foreach { case (s, w) =>
      require(w > 0.0, s"mixSources: weight for '$s' must be positive: $w")
    }
    val counts = docs
      .filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every weighted source must exist: a zero-row source would silently
    // drop out of K = min(n/w) and the output composition would no longer
    // be the requested one (fail-loud, like packShards' NULL-id guard)
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty,
      s"mixSources: weighted sources have no rows: ${missing.toSeq.sorted.mkString(", ")} — " +
        "a mixture over them cannot hit the requested composition; drop them " +
        "from the weights or fix the corpus")
    // K = the largest total stream each source can supply its share of
    val k = counts.map { case (s, n) => n.toDouble / weights(s) }.min
    counts.map { case (s, n) =>
      s -> math.min(1.0, k * weights(s) / n.toDouble)
    }
  }

  /** 4-hex-digit threshold for a keep fraction in [0,1]: p of the 0x10000
    * hash space, lowercase to match both engines' hex output. The compare
    * is LEXICOGRAPHIC on the 4-char prefix, so rate 1.0 cannot be "10000"
    * (5 chars sort BELOW "2...") — "g" sorts after every hex digit and
    * keeps the full space. */
  def hexRate(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val t = math.round(rate * 0x10000)
    if (t >= 0x10000) "g" else f"${t.toInt}%04x"
  }

  /** Per-source corpus profiling — the receipts a mixture/curation run
    * is judged by: doc counts, token and char volume, and length
    * quantiles per source. Quantiles are EXACT (`percentile`, matching
    * DuckDB's `quantile_cont` interpolation bit-for-bit on integer
    * inputs after round(6)) — safe here because the aggregation buffer
    * holds per-DISTINCT-VALUE counts and a length column's domain is
    * bounded (thousands of distinct values, not rows), so a 50 TB
    * source costs the same buffer as a 50 MB one. For unbounded-domain
    * metrics swap in `approx_percentile`, which trades the oracle for a
    * fixed-size sketch. One shuffle on the group key, partials map-side. */
  def sourceStats(docs: DataFrame, groupCol: String, textCol: String): DataFrame =
    docs.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col(textCol)))).cast("long").as("total_tokens"),
        sum(length(col(textCol))).cast("long").as("total_chars"),
        round(percentile(length(col(textCol)), lit(0.5)), 6).as("p50_chars"),
        round(percentile(length(col(textCol)), lit(0.9)), 6).as("p90_chars"))
      .orderBy(groupCol)

  /** Token-budget shard packing — concat-and-chunk layout: documents are
    * laid out in deterministic `idCol` order (ids must be unique) into one
    * conceptual token stream, and shard `i` covers stream offsets
    * `[i*budget, (i+1)*budget)` (a document starting in shard `i` may
    * straddle into `i+1` — exactly how LLM training pipelines chunk a
    * tokenized corpus into fixed-size sequences). Output per doc: token
    * count, exclusive stream offset, and the shard its first token lands in.
    *
    * The naive plan — one global `sum() over (order by id)` window — is a
    * single-task sort at 100 TB. This is the distributed prefix-sum shape
    * instead: the id range — `idBounds` when the caller knows it (stored
    * corpus metadata, dense 0..N ids), else one eager pre-pass that scans
    * ONLY the pruned id column and also rejects NULL ids loudly (a null
    * block key would silently drop the row at the offsets join while its
    * tokens still skewed every later offset) — divides into ≤ numBlocks+2
    * equal-width contiguous blocks, the running sum runs per block in
    * parallel, and
    * block-level offsets come from a second exclusive prefix sum over the
    * numBlocks-row totals table (a triangular self-join — the table fits
    * in a page and no plan node demands a single partition) broadcast
    * back onto the blocks. Equal-width
    * blocks are balanced for dense ids AND uniformly-hashed 64-bit ids
    * (the two real layouts); pathologically clumped ids degrade only
    * balance — the totals table stays ≤ numBlocks+2 rows by construction,
    * and output offsets depend only on the global id order (block
    * decomposition is internal; the blocked==global property test pins
    * it). `doc_id DIV width` block assignment is a pure function of the
    * id — deterministic across re-computations of the plan, which a
    * `spark_partition_id()`-after-repartitionByRange scheme is NOT (its
    * sampled bounds can differ per materialization).
    *
    * Integer arithmetic end-to-end (`DIV`, not float division): offsets at
    * 100 TB exceed 2^53 and must not round-trip through a double. */
  def packShards(docs: DataFrame, idCol: String, tokenCount: Column,
                 budget: Long, numBlocks: Int = 1024,
                 idBounds: Option[(Long, Long)] = None): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(numBlocks > 0, s"numBlocks must be positive: $numBlocks")
    val (lo, hi) = idBounds.getOrElse {
      // column-pruned scan of the id alone (tokenCount is never computed
      // here); same job counts null ids, which MUST fail loudly
      val b = docs
        .agg(min(col(idCol).cast("long")), max(col(idCol).cast("long")),
          count(when(col(idCol).isNull, 1))).head()
      if (b.getLong(2) > 0)
        throw new IllegalArgumentException(
          s"packShards: ${b.getLong(2)} rows have a NULL $idCol — " +
            "packing needs a total order over unique non-null ids")
      if (b.isNullAt(0)) (0L, 0L) else (b.getLong(0), b.getLong(1))
    }
    // BigInt: hashed ids can span more than 2^63 (hi−lo overflows long);
    // truncating DIV is monotone non-decreasing, so blocks stay contiguous
    // id ranges without ever subtracting the (possibly negative) minimum
    val width =
      ((BigInt(hi) - BigInt(lo)) / numBlocks + 1).min(BigInt(Long.MaxValue)).toLong
    // the null guard lives in the row path too, not just the bounds
    // pre-pass: with caller-supplied idBounds a NULL id would otherwise
    // get a NULL __blk — its tokens land in a null-key block that sorts
    // FIRST in the totals window (skewing every real offset) while the
    // row itself vanishes at the offsets join. Fail loudly instead.
    val t = docs.select(
        when(col(idCol).isNull, raise_error(lit(
            s"packShards: NULL $idCol — packing needs a total order over " +
              "unique non-null ids")).cast("long"))
          .otherwise(col(idCol).cast("long")).as("doc_id"),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("__blk", expr(s"doc_id DIV $width"))
    val withinBlock = Window.partitionBy("__blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // block-level exclusive prefix sum via a triangular self-join on the
    // ≤ numBlocks+2-row totals table (≤ ~numBlocks²/2 joined rows — page
    // sized) instead of an unpartitioned running-sum window: same answer,
    // but nothing in the plan ever requires a single-partition
    // distribution, and WindowExec's "no partition defined" warning (a
    // real scale smell anywhere else) stays out of bench/verify logs
    val tot = t.groupBy("__blk").agg(sum("n_tokens").as("__bt"))
    val blockOffsets = tot.as("a")
      .join(tot.select(col("__blk").as("__pblk"), col("__bt").as("__pbt")),
        col("__pblk") < col("__blk"), "left")
      .groupBy("__blk").agg(coalesce(sum("__pbt"), lit(0L)).as("__off"))
    t.withColumn("__in", coalesce(sum("n_tokens").over(withinBlock), lit(0L)))
      .join(broadcast(blockOffsets), "__blk")
      .withColumn("stream_offset", col("__off") + col("__in"))
      .select(col("doc_id"), col("n_tokens"), col("stream_offset"),
        expr(s"stream_offset DIV $budget").as("shard_id"))
      .orderBy("doc_id")
  }

  /** Streaming corpus curation — the ingest-time form of the batch
    * pipeline (same operators: [[TextAnalysis.fingerprint]] exact dedup,
    * [[TextAnalysis.qualityColumnsFromCounts]] gate, [[TextAnalysis.langIdFromCounts]] over one [[TextAnalysis.stopwordCounts]] kernel pass):
    * watermark the event-time column, drop any document whose normalized
    * fingerprint was already admitted within the watermark
    * (`dropDuplicatesWithinWatermark` — state is bounded by the watermark,
    * not the corpus), then apply the stateless quality/language gate.
    *
    * Also works on a batch DataFrame: the watermark is a no-op and the
    * dedup keeps the (event time, `idCol`)-minimal row per fingerprint —
    * a DETERMINISTIC keep, where the streaming path necessarily keeps the
    * first ARRIVAL (arrival order is the stream's identity; plain
    * `dropDuplicates` in batch would keep a partition-order-dependent row,
    * violating this module's reproducibility contract).
    * Output: the input columns + `fp`, `pred_lang`, `quality_score`,
    * filtered to quality ≥ `minQuality` and a recognized language. */
  def streamingCurate(docs: DataFrame, idCol: String, textCol: String,
                      eventTimeCol: String, watermark: String,
                      minQuality: Double): DataFrame = {
    val stamped = docs.withWatermark(eventTimeCol, watermark)
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
    val deduped =
      if (stamped.isStreaming) stamped.dropDuplicatesWithinWatermark("fp")
      else {
        // explicit fp-keyed repartition (r15, the QueryEngine.resample
        // rationale): every langid/quality expression evaluates ABOVE
        // this window, and AQE's byte-based coalescing folded the tiny
        // fp shuffle to ~1 partition — serializing the whole scoring
        // stage. A user-specified count is exempt from coalescing and
        // satisfies the window's ClusteredDistribution(fp); floored at
        // the configured shuffle partitions so production sizing wins.
        val n = graft.core.SparkTuning.windowPartitions(stamped.sparkSession)
        val w = Window.partitionBy("fp").orderBy(col(eventTimeCol), col(idCol))
        stamped.repartition(n, col("fp"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    deduped
      .withColumn("__w", TextAnalysis.tokens(col(textCol)))
      .withColumn("__sc", TextAnalysis.stopwordCounts(docs.sparkSession,
        TextAnalysis.tokens(lower(col(textCol)))))
      .withColumn("pred_lang",
        TextAnalysis.langIdFromCounts(col(textCol), col("__sc")))
      .withColumn("quality_score",
        TextAnalysis.qualityColumnsFromCounts(col(textCol), col("__w"), col("__sc")).last)
      .filter(col("quality_score") >= minQuality && col("pred_lang") =!= "unknown")
      .drop("__w", "__sc")
  }

  /** Fixed-size token chunking with overlap — how documents become
    * training sequences: each doc's whitespace tokens split into windows
    * of `chunkTokens` starting every `chunkTokens - overlapTokens` tokens
    * (the standard sliding-window chunking for context-window packing and
    * retrieval indexing). Output `(doc_id, chunk_id, chunk_text,
    * n_tokens)`, unordered (order it downstream if needed — a global sort
    * over every chunk of a training corpus is never free); the final
    * chunk may be short; docs with no tokens yield no chunks. A trailing
    * start within `overlapTokens` of the doc end is suppressed: its chunk
    * would be a strict subset of the previous chunk (which already
    * reached the end), double-counting tail tokens in the packed corpus.
    *
    * Shuffle-free — tokenize + explode at scan speed. The token array is
    * projected ONCE and every consumer references the attribute (building
    * it inline would re-run the interpreted tokenizer HOF per consumer);
    * empty docs are dropped by exploding an EMPTY start list instead of a
    * row filter on `size(tokens)` — a filter would be pushed into the
    * projection and re-evaluate the tokenizer a second time per row. */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int = 0): DataFrame =
    chunkCore(docs, idCol, chunkTokens, overlapTokens,
      TextAnalysis.tokens(col(textCol)),
      w => concat_ws(" ", w))

  /** [[chunkByTokens]] over REAL BPE tokens ([[TextAnalysis
    * .bpeTokensReal]]): windows count actual merge-table tokens, so
    * chunk sizes track what an LLM context window sees instead of
    * whitespace words. BPE tokens carry their own spacing and
    * concatenate back to the exact source text, so `chunk_text` joins
    * with the empty separator and adjacent chunks (at overlap 0)
    * reconstruct the document byte-for-byte — pinned in CorpusSpec. */
  def chunkByBpe(docs: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int, overlapTokens: Int = 0): DataFrame =
    chunkCore(docs, idCol, chunkTokens, overlapTokens,
      TextAnalysis.bpeTokensReal(docs.sparkSession, col(textCol)),
      w => array_join(w, ""))

  private def chunkCore(docs: DataFrame, idCol: String,
                        chunkTokens: Int, overlapTokens: Int,
                        tokens: Column, join: Column => Column): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlap must be in [0, chunkTokens): $overlapTokens")
    val stride = chunkTokens - overlapTokens
    // keep a start when it's in range AND not a redundant tail: for s>0
    // the immediately-previous chunk ends at s+overlap, so s+overlap>=len
    // means that chunk already covers everything from s on
    val starts = filter(
      sequence(lit(0), greatest(size(col("__w")) - 1, lit(0)), lit(stride)),
      x => x < size(col("__w")) &&
        (x === 0 || x + lit(overlapTokens) < size(col("__w"))))
    docs
      .select(col(idCol).as("doc_id"), tokens.as("__w"))
      .select(col("doc_id"), col("__w"), explode(starts).as("__start"))
      .select(col("doc_id"),
        expr(s"__start DIV $stride").cast("long").as("chunk_id"),
        join(slice(col("__w"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"),
        least(size(col("__w")) - col("__start"), lit(chunkTokens))
          .cast("long").as("n_tokens"))
  }

  /** Top-k rows per group by a score column (curriculum / quality
    * selection: "keep the best k docs per source"). Deterministic: score
    * desc, then `idCol` asc on ties. The rank filter sits directly on
    * `row_number` so Catalyst rewrites it to WindowGroupLimit — each
    * group keeps k rows map-side BEFORE the window shuffle, which is what
    * makes top-k-per-group viable when groups have millions of members. */
  def topKPerGroup(docs: DataFrame, groupCols: Seq[String], scoreCol: String,
                   idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(idCol))
    docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(groupCols.map(col) :+ col("rank"): _*)
  }
}
