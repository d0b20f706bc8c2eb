package graft.functions

import java.util.regex.Pattern

/** Byte-pair-encoding tokenizer core (GPT-2-style: regex pre-tokenizer +
  * ranked greedy pair merges) behind the library's `tokens()` seam — real
  * BPE segmentation for token budgeting, replacing the regex
  * approximation ([[graft.ops.TextAnalysis.bpeTokenCount]]) whose counts
  * diverge 20-40% from a trained tokenizer's and mis-size training
  * shards.
  *
  * Two deliberate, documented deviations from GPT-2's exact scheme:
  *  - Base symbols are UNICODE CODE POINTS, not raw UTF-8 bytes: token
  *    strings are then always valid UTF-8 substrings that concatenate
  *    back to the original text exactly (chunk windows over BPE tokens
  *    reconstruct text; a byte-alphabet token can split a multi-byte
  *    character mid-sequence). On ASCII text — and any corpus the merge
  *    table targets — the two alphabets are identical; a non-ASCII char
  *    counts 1 here vs 2-4 unmerged byte tokens in GPT-2.
  *  - [[DefaultMerges]] is a small embedded demo vocabulary (~80 common
  *    English merges), not a trained 50k merge table: the ALGORITHM and
  *    the seam are production-real, the embedded ranks are demo-scale.
  *    Production loads a trained merges file via [[Bpe.vocab]]
  *    (one "left right" pair per line, rank = line order, symbols in
  *    GPT-2's public byte-level encoding — decoded to this alphabet on
  *    load, so space-boundary merges written as 'Ġx' fire correctly).
  *
  * The merge loop is the standard one: repeatedly find the
  * lowest-ranked adjacent symbol pair in the word and fuse its
  * left-to-right non-overlapping occurrences, until no ranked pair
  * remains. Deterministic — no hashing, no state, safe to evaluate
  * independently on every executor.
  */
object Bpe {

  /** The standard GPT-2 pre-tokenization pattern (public; contractions,
    * optionally-space-prefixed letter/digit/punct runs, whitespace) —
    * matches partition the input, so BPE tokens concatenate back to the
    * exact original text. Exposed as a string so the TRAINING scan can
    * run the identical segmentation inside Spark's `regexp_extract_all`
    * (same java.util.regex semantics, lookahead included). */
  val PreTokenizerPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val PreTokenizer: Pattern = Pattern.compile(PreTokenizerPattern)

  /** Embedded demo merge ranks (rank = position). WELL-ORDERED: each
    * side of a merge is a single code point or the product of an earlier
    * merge — validated at construction; the property makes the greedy
    * min-rank loop and a rank-sequential sweep provably equivalent,
    * which the spec exploits as an independent cross-check. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    // GPT-2-like early ranks: the space-prefixed starts and "he" come
    // first, so common function words compress to single tokens
    (" ", "t"), ("h", "e"), ("t", "he"), (" ", "a"), ("i", "n"), ("r", "e"),
    ("o", "n"), (" t", "he"), ("e", "r"), (" ", "s"), ("a", "t"), (" ", "w"),
    (" ", "o"), ("e", "n"), (" ", "c"), ("i", "t"), ("i", "s"), ("a", "n"),
    ("o", "r"), ("e", "s"), (" ", "b"), ("e", "d"), (" ", "f"), ("in", "g"),
    (" ", "p"), ("o", "u"), (" a", "n"), ("a", "l"), ("a", "r"), (" t", "o"),
    (" ", "m"), (" ", "h"), (" ", "d"), (" an", "d"), ("i", "c"), ("a", "s"),
    ("l", "e"), (" ", "l"), (" ", "n"), (" ", "e"), ("s", "t"), (" ", "i"),
    ("o", "m"), ("e", "l"), (" ", "g"), (" ", "r"), ("t", "h"), ("t", "i"),
    ("l", "l"), ("r", "o"), ("s", "e"), ("v", "e"), ("h", "a"), ("w", "h"),
    ("c", "h"), ("s", "h"), ("u", "s"), ("a", "y"), ("o", "w"), ("q", "u"),
    ("e", "a"), ("o", "o"), ("e", "e"), ("n", "d"),
    ("th", "e"), ("ti", "on"), ("er", "s"), ("'", "s"),
    (" i", "s"), (" o", "f"), (" i", "n"), (" c", "o"), (" b", "e"),
    (" f", "or"), (" w", "it"), (" wit", "h"), (" h", "a"), (" p", "ro"),
    (" s", "t"), (" m", "a"), ("en", "t"))

  /** A compiled merge table: rank lookup + a bounded word cache (words
    * repeat heavily in natural text — GPT-2's encoder caches the same
    * way; the cap keeps a pathological unique-word corpus from growing
    * the map without bound on long-lived executors). */
  final class Vocab private[Bpe] (merges: Seq[(String, String)]) extends Serializable {
    require(merges.nonEmpty, "empty merge table")
    locally {
      val formed = scala.collection.mutable.Set.empty[String]
      merges.zipWithIndex.foreach { case ((a, b), i) =>
        def ok(s: String) = s.codePointCount(0, s.length) == 1 || formed.contains(s)
        require(ok(a) && ok(b),
          s"merge $i ($a,$b) references a symbol no earlier merge forms " +
            "(table must be well-ordered: parts are code points or earlier products)")
        formed += (a + b)
      }
    }

    // tuple keys, not string concatenation: symbols may themselves
    // contain any character (" th" contains a space), so no separator
    // char can make a concatenated key collision-free
    private val rank: java.util.HashMap[(String, String), Integer] = {
      val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
      merges.zipWithIndex.foreach { case (p, i) =>
        m.putIfAbsent(p, Integer.valueOf(i))
      }
      m
    }

    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    private val MaxCache = 65536

    /** Merged symbol sequence of ONE pre-token. */
    def encodeWord(word: String): Array[String] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      var syms = {
        val b = Array.newBuilder[String]
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          val n = Character.charCount(cp)
          b += word.substring(i, i + n)
          i += n
        }
        b.result()
      }
      var done = syms.length < 2
      while (!done) {
        // lowest-ranked adjacent pair present in the word
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get((syms(i), syms(i + 1)))
          if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = i }
          i += 1
        }
        if (best < 0) done = true
        else {
          val a = syms(best); val b2 = syms(best + 1)
          // fuse left-to-right, non-overlapping (matters when a == b)
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b2) {
              out += (a + b2); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          done = syms.length < 2
        }
      }
      if (cache.size < MaxCache) cache.putIfAbsent(word, syms)
      syms
    }

    /** BPE tokens of full text — concatenating them reproduces `text`
      * exactly (the pre-tokenizer partitions the input). */
    def encode(text: String): Array[String] = {
      val out = Array.newBuilder[String]
      val m = PreTokenizer.matcher(text)
      while (m.find()) out ++= encodeWord(m.group())
      out.result()
    }

    /** Token count without materializing the token array. */
    def count(text: String): Long = {
      var n = 0L
      val m = PreTokenizer.matcher(text)
      while (m.find()) n += encodeWord(m.group()).length
      n
    }
  }

  /** The embedded demo vocabulary (memoized — expressions reference it
    * from generated code). */
  lazy val Default: Vocab = new Vocab(DefaultMerges)

  /** Inverse of GPT-2's public byte↔unicode table (encoder.py's
    * `bytes_to_unicode`): printable-latin bytes map to themselves, the
    * 68 others (control, space, DEL, 0x80-0xA0, 0xAD) shift to
    * U+0100+n in increasing byte order — so merges.txt writes a space
    * prefix as 'Ġ' (U+0120). */
  private val ByteOfChar: Map[Char, Char] = {
    val self = (('!'.toInt to '~'.toInt) ++ ('¡'.toInt to '¬'.toInt) ++
      ('®'.toInt to 'ÿ'.toInt)).toSet
    val direct = self.toSeq.map(b => b.toChar -> b.toChar)
    val shifted = (0 until 256).filterNot(self).zipWithIndex
      .map { case (b, n) => (256 + n).toChar -> b.toChar }
    (direct ++ shifted).toMap
  }

  /** Forward direction of the same table: engine-alphabet char → the
    * byte-level char merges.txt writes (space → 'Ġ'). */
  private val CharOfByte: Map[Char, Char] = ByteOfChar.map(_.swap)

  /** Decode one merges.txt symbol to this engine's code-point alphabet.
    * Per-CHAR (each mapped byte becomes the latin-1 char of that byte),
    * never re-parsed as UTF-8: decode(a) + decode(b) == decode(a ++ b)
    * must hold or a trained table's later merges would fail the
    * well-ordering check. Cost: a multi-byte UTF-8 sequence's byte
    * merges decode to latin-1 chars that the code-point pre-tokenizer
    * never emits, so they simply never fire — the documented non-ASCII
    * deviation. ASCII and space-boundary merges (the bulk of a trained
    * English table) decode exactly. */
  private def decodeSymbol(line: String, s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      ByteOfChar.get(c) match {
        case Some(byteChar) => b.append(byteChar)
        case None => throw new IllegalArgumentException(
          s"merges line '$line': char U+${c.toInt.toHexString} is not in " +
            "the GPT-2 byte-level alphabet — expected a standard " +
            "byte-level-encoded merges.txt (spaces appear as 'Ġ')")
      }
      i += 1
    }
    b.toString
  }

  /** Build a vocab from a standard GPT-2 `merges.txt` (one
    * "left right" pair per line, rank = line order, symbols in the
    * public byte-level encoding — space prefixes appear as 'Ġ'). The
    * "#version" header and blank lines are skipped; symbols are decoded
    * to this engine's code-point alphabet via [[decodeSymbol]]. This is
    * the production path for trained tables. */
  def vocab(mergesLines: Iterable[String]): Vocab =
    new Vocab(mergesLines.iterator
      .map(_.stripLineEnd.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#version"))
      .map { l =>
        val parts = l.split(' ')
        require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
          s"bad merges line: '$l' (expected exactly 'left right')")
        (decodeSymbol(l, parts(0)), decodeSymbol(l, parts(1)))
      }.toSeq)

  /** Serialize learned merges to standard byte-level merges.txt lines —
    * the inverse of [[vocab]] (space prefixes become 'Ġ'), so a trained
    * table round-trips through the public format and interoperates with
    * any GPT-2-style tokenizer loader. Latin-1 symbols only (the same
    * boundary as the decode side); anything else fails loudly. */
  def toMergesLines(merges: Seq[(String, String)]): Seq[String] = {
    def enc(s: String): String = s.map { c =>
      CharOfByte.getOrElse(c, throw new IllegalArgumentException(
        s"merge symbol '$s': char U+${c.toInt.toHexString} is outside the " +
          "byte-level alphabet — only latin-1 symbols serialize to merges.txt"))
    }.mkString
    merges.map { case (a, b) => s"${enc(a)} ${enc(b)}" }
  }

  /** Exact BPE merge learning over a WORD HISTOGRAM — the classic fast
    * trainer shape: the corpus is reduced to (distinct pre-token, count)
    * once (one Spark scan, [[graft.ops.TextAnalysis.bpeTrain]]), and the
    * quadratic-ish merge loop runs driver-side over the histogram —
    * vocabulary-sized work per merge, independent of corpus size, and
    * bit-identical on every rerun. Each round counts adjacent symbol
    * pairs weighted by word count (all positions, the standard
    * `get_stats`), picks the most frequent — ties break to the
    * lexicographically smallest pair, making training deterministic —
    * and fuses its left-to-right non-overlapping occurrences (exactly
    * [[Vocab.encodeWord]]'s rule, so applying the learned table
    * reproduces the training segmentation). Stops early when no pair
    * repeats. */
  def train(wordCounts: Iterable[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0: $nMerges")
    def codePoints(w: String): Array[String] = {
      val b = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        b += w.substring(i, i + n); i += n
      }
      b.result()
    }
    var words = wordCounts.iterator
      .map { case (w, c) => (codePoints(w), c) }.filter(_._1.length >= 2).toArray
    val out = Seq.newBuilder[(String, String)]
    var done = false
    var m = 0
    while (m < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        words = words.map { case (syms, c) =>
          val fused = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              fused += (best._1 + best._2); j += 2
            } else { fused += syms(j); j += 1 }
          }
          (fused.result(), c)
        }.filter(_._1.length >= 2)
        m += 1
      }
    }
    out.result()
  }
}
