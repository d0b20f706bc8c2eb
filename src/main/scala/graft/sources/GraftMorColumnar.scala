package graft.sources

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.HadoopReadOptions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.MessageType
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** COLUMNAR merged (last-write-wins) read of one MOR stripe (r15) — the
  * batch-shaped replacement for [[GraftMorReader]]'s row-at-a-time
  * k-way merge, which left MOR wide/map projections ~2.5× off native
  * parquet (SCALE.md r14: the row path pays cursor-API decode plus one
  * boxed `Array[Any]` per version per row).
  *
  * Shape: each file decodes WHOLE PAGES into flat vectors
  * ([[GraftPageCursor]] + [[GraftDecode]] — the same bulk decode the
  * non-MOR columnar path uses), visibility / pushed-filter / series-
  * range / label residues compact each decoded window into a selection
  * array, and the merge then runs over PRIMITIVE key arrays
  * (series_id, time, __seq as raw longs — no boxing, no virtual calls),
  * emitting per-row (window, ordinal) references. The output batch
  * GATHERS winners through [[GraftGatherVec]] — zero value copies; a
  * string cell is the same page-backed UTF8String the decode produced.
  *
  * LWW semantics are IDENTICAL to the row merge (the spec pins
  * hash-equality): min (series_id, time) across file heads, every
  * version of the key consumed, winner = max `__seq` with NULL (legacy)
  * losing to any stamped version and equal seqs resolved to the LATER
  * file in the stable sorted file order; tombstone winners drop. The
  * per-file sort contract (series_id, time) is enforced across window
  * and row-group boundaries exactly like the row reader — a violating
  * file fails loudly.
  *
  * Window lifetime: decoded windows are immutable, freshly-allocated
  * slabs; a merge key can straddle a window (or row-group) boundary, so
  * an output batch may reference a file's PREVIOUS window — references
  * keep it alive, nothing is pooled, and emitted batches drop their
  * window list on the next `next()` so memory stays
  * O(files × window), not O(stripe). */
private[sources] final class GraftMorColumnarReader(
    conf: Configuration,
    stripe: GraftMorStripe,
    requested: Seq[String],
    pushed: Array[Filter],
    commits: Option[(Long, Set[Long])],
    asOf: Option[Long],
    labelSeries: Option[java.util.HashSet[Long]])
  extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  private val needSeq = commits.nonEmpty || asOf.nonEmpty
  private val prepared = GraftReaders.prepare(pushed)
  private val phys = requested.map(GraftMeta.physical)
  private val physCols: Seq[String] = phys.filterNot(_ == "part_start").distinct
  // the merge itself always needs the LWW key + version + tombstone
  private val decodeAlways = Seq("series_id", "time", "__seq", "__del")
  private val filterCols: Seq[String] =
    pushed.flatMap(_.references).distinct.filterNot(_ == "part_start").toSeq
  private val unionCols: Set[String] = (physCols ++ decodeAlways ++ filterCols).toSet

  /** Stripe series bounds as classifiable filters — lets footer stats
    * skip row groups entirely outside the stripe (files are sorted by
    * series_id, so most groups are). A resolved label series SET
    * (`labelSeries`) filters rows and prunes stripes at planning but is
    * not yet folded into group classification here — the row MOR path's
    * FilterApi.in row-group skip is the shape to port if profiles ever
    * show label-selective MOR scans decoding dead groups. */
  private val rangeFilters: Array[Filter] = {
    val b = ArrayBuffer.empty[Filter]
    if (stripe.seriesLo != Long.MinValue)
      b += GreaterThanOrEqual("series_id", stripe.seriesLo)
    if (stripe.seriesHi != Long.MaxValue)
      b += LessThanOrEqual("series_id", stripe.seriesHi)
    b.toArray
  }

  /** One decoded, residue-compacted slab of one file. */
  private final class Window(
      val vecs: java.util.HashMap[String, ColumnVector],
      val sids: Array[Long], val times: Array[Long],
      val seqs: Array[Long], val seqNulls: Array[Boolean],
      val dels: Array[Boolean], val delNulls: Array[Boolean],
      val sel: Array[Int], val selLen: Int)

  private final class FileCursor(val file: String) {
    private val hPath = new org.apache.hadoop.fs.Path(file)
    private val reader = new ParquetFileReader(
      HadoopInputFile.fromPath(hPath, conf),
      HadoopReadOptions.builder(conf, hPath).useColumnIndexFilter(false).build())
    private val fileSchema: MessageType = reader.getFooter.getFileMetaData.getSchema
    locally {
      val fields = (0 until fileSchema.getFieldCount)
        .map(fileSchema.getType).filter(t => unionCols(t.getName))
      if (fields.nonEmpty)
        reader.setRequestedSchema(new MessageType(fileSchema.getName, fields: _*))
    }
    private val blocks = reader.getRowGroups
    private var blockIdx = 0
    private var groupRemaining = 0L
    private var readers: Array[GraftPageCursor] = _
    private var kinds: Array[org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName] = _
    private var readerIdx: Array[Int] = _
    private var decodeCols: Seq[String] = _
    private var groupMixed = false
    private var groupResidue: Array[Filter] = Array.empty
    private var mapKeyC: GraftPageCursor = _
    private var mapValC: GraftPageCursor = _
    private var mapKeyDef = 0
    private var mapValDef = 0
    // sort contract spans windows AND row groups
    private var lastS = Long.MinValue
    private var lastT = Long.MinValue

    var win: Window = _
    var pos: Int = 0

    refill()

    def exhausted: Boolean = win == null
    def headSid: Long = win.sids(win.sel(pos))
    def headTime: Long = win.times(win.sel(pos))
    /** LWW version of the head row; NULL (legacy) = MinValue. */
    def headSeq: Long = {
      val o = win.sel(pos)
      if (win.seqs == null || win.seqNulls(o)) Long.MinValue else win.seqs(o)
    }
    def headDel: Boolean = {
      val o = win.sel(pos)
      win.dels != null && !win.delNulls(o) && win.dels(o)
    }

    /** Consume the head row; refills (possibly across row groups) when
      * the window is spent. The old window object stays alive while any
      * pending output row references it. */
    def advanceRow(): Unit = {
      pos += 1
      if (pos >= win.selLen) refill()
    }

    private def advanceGroup(): Boolean = {
      while (blockIdx < blocks.size()) {
        val block = blocks.get(blockIdx)
        val vis = GraftFooterStats.seqVisibility(block, commits, asOf, needSeq)
        val tris = (pushed ++ rangeFilters).map(GraftFooterStats.classify(_, block))
        if (vis == GraftFooterStats.NoRows ||
            tris.contains(GraftFooterStats.NoRows)) {
          reader.skipNextRowGroup()
          blockIdx += 1
        } else {
          val pages = reader.readNextRowGroup()
          blockIdx += 1
          if (pages == null) return false
          groupMixed = vis == GraftFooterStats.SomeRows
          // only stats-undecided pushed filters need row evaluation;
          // the stripe range residue folds into the same pass (it is
          // evaluated scalar on the decoded sids, not via eval())
          groupResidue = prepared.zip(
            tris.take(pushed.length)).collect {
            case (f, GraftFooterStats.SomeRows) => f
          }
          val residueCols = groupResidue.flatMap(_.references).distinct
            .filterNot(_ == "part_start").toSeq
          decodeCols = (physCols ++ decodeAlways ++ residueCols).distinct
          val wanted = decodeCols.toSet
          val descs = fileSchema.getColumns
          val flat = (0 until descs.size()).map(descs.get)
            .filter(d => d.getPath.length == 1 && wanted(d.getPath()(0)))
          readers = new Array(flat.size)
          kinds = new Array(flat.size)
          val colOfDesc = new Array[String](flat.size)
          flat.zipWithIndex.foreach { case (d, i) =>
            readers(i) = new GraftPageCursor(d, pages.getPageReader(d))
            kinds(i) = d.getPrimitiveType.getPrimitiveTypeName
            colOfDesc(i) = d.getPath()(0)
          }
          readerIdx = decodeCols.map(c => colOfDesc.indexOf(c)).toArray
          mapKeyC = null; mapValC = null
          if (wanted("labels"))
            (0 until descs.size()).map(descs.get)
              .filter(d => d.getPath.length == 3 && d.getPath()(0) == "labels")
              .foreach { d =>
                if (d.getPath()(2) == "key") {
                  mapKeyC = new GraftPageCursor(d, pages.getPageReader(d))
                  mapKeyDef = d.getMaxDefinitionLevel
                } else {
                  mapValC = new GraftPageCursor(d, pages.getPageReader(d))
                  mapValDef = d.getMaxDefinitionLevel
                }
              }
          if (readerIdx(decodeCols.indexOf("series_id")) < 0 ||
              readerIdx(decodeCols.indexOf("time")) < 0)
            throw new IllegalStateException(
              s"$file lacks series_id/time — not a graft raw file")
          groupRemaining = pages.getRowCount
          if (groupRemaining > 0) return true
        }
      }
      false
    }

    /** Decode + compact the next window with at least one surviving
      * row; null out `win` at end of file. */
    private def refill(): Unit = {
      win = null
      pos = 0
      while (win == null) {
        if (groupRemaining <= 0 && !advanceGroup()) { close(); return }
        val n = math.min(groupRemaining, GraftColumnar.BatchRows.toLong).toInt
        groupRemaining -= n
        val byName = new java.util.HashMap[String, ColumnVector]()
        var sids: Array[Long] = null
        var times: Array[Long] = null
        var seqs: Array[Long] = null
        var seqNulls: Array[Boolean] = null
        var dels: Array[Boolean] = null
        var delNulls: Array[Boolean] = null
        decodeCols.zipWithIndex.foreach { case (c, ci) =>
          val ri = readerIdx(ci)
          if (c == "labels" && mapKeyC != null) {
            byName.put(c, GraftDecode.map(mapKeyC, mapValC, mapKeyDef, mapValDef, n))
          } else if (ri < 0) {
            byName.put(c, new GraftNullVec(
              GraftColumnar.TsdbColumnarTypes.getOrElse(c, LongType)))
          } else {
            val f = GraftDecode.flat(readers(ri), kinds(ri), n, c, file)
            c match {
              case "series_id" => sids = f.longs
              case "time" => times = f.longs
              case "__seq" => seqs = f.longs; seqNulls = f.nulls
              case "__del" => dels = f.bools; delNulls = f.nulls
              case _ => ()
            }
            byName.put(c, f.vec)
          }
        }
        // residue compaction below the merge: stripe range, visibility,
        // stats-undecided pushed filters, label series set — all
        // key-stable, so superseded versions and tombstones classify
        // exactly like the winners they shadow
        var curRow = 0
        val getter: String => Any = { c =>
          if (c == "part_start") stripe.partStart
          else {
            val v = byName.get(c)
            if (v == null || v.isNullAt(curRow)) null
            else v.dataType match {
              case LongType => java.lang.Long.valueOf(v.getLong(curRow))
              case org.apache.spark.sql.types.DoubleType =>
                java.lang.Double.valueOf(v.getDouble(curRow))
              case org.apache.spark.sql.types.BooleanType =>
                java.lang.Boolean.valueOf(v.getBoolean(curRow))
              case _ => v.getUTF8String(curRow)
            }
          }
        }
        val sel = new Array[Int](n)
        var k = 0
        var i = 0
        while (i < n) {
          val s = sids(i)
          val t = times(i)
          if (s < lastS || (s == lastS && t < lastT))
            throw new IllegalStateException(
              s"$file is not sorted by (series_id, time) — MOR merge would be wrong")
          lastS = s; lastT = t
          val seqAny: Any =
            if (seqs == null || seqNulls(i)) null else seqs(i)
          curRow = i
          val keep = s >= stripe.seriesLo && s <= stripe.seriesHi &&
            (!groupMixed || GraftReaders.visible(seqAny, commits, asOf)) &&
            labelSeries.forall(_.contains(s)) &&
            groupResidue.forall(GraftReaders.eval(_, getter, stripe.partStart))
          if (keep) { sel(k) = i; k += 1 }
          i += 1
        }
        if (k > 0)
          win = new Window(byName, sids, times, seqs, seqNulls, dels, delNulls,
            sel, k)
      }
    }

    private var closed = false
    def close(): Unit = if (!closed) { closed = true; reader.close() }
  }

  private val cursors: Array[FileCursor] = stripe.files.map(new FileCursor(_)).toArray

  private var current: ColumnarBatch = _

  // ---- run fast-path state (valid across output batches) -------------------
  // The common layout gives each file DISJOINT series (pmod-sharded
  // writes): one cursor owns long key runs while every other cursor's
  // head stays put. Caching that single owner plus the SECOND-smallest
  // head key lets the merge consume a whole run at O(1)/row instead of
  // rescanning all k cursors per key — heads only advance, so the
  // cached second-min stays a correct bound until the owner reaches it.
  private var fastCi = -1
  private var hasSecond = false
  private var s2 = 0L
  private var t2 = 0L

  override def next(): Boolean = {
    val maxOut = GraftColumnar.BatchRows
    // per-batch window registry: winIdx/ord reference into it; dropped
    // after emit so retired windows become collectable
    val wins = ArrayBuffer.empty[Window]
    // memoized registry slot of each cursor's CURRENT window
    val curSlot = new Array[Int](cursors.length)
    java.util.Arrays.fill(curSlot, -1)
    val curWin = new Array[Window](cursors.length)
    def slotOf(ci: Int): Int = {
      val w = cursors(ci).win
      if (curWin(ci) ne w) {
        curWin(ci) = w
        wins += w
        curSlot(ci) = wins.length - 1
      }
      curSlot(ci)
    }
    val winIdx = new Array[Int](maxOut)
    val ord = new Array[Int](maxOut)
    var k = 0
    while (k < maxOut) {
      var ms = 0L
      var mt = 0L
      var soleCi = -1
      if (fastCi >= 0 && !cursors(fastCi).exhausted && {
        val c = cursors(fastCi)
        val s = c.headSid
        val t = c.headTime
        // strictly below the cached second-min = sole owner of the key
        !hasSecond || s < s2 || (s == s2 && t < t2)
      }) {
        val c = cursors(fastCi)
        ms = c.headSid; mt = c.headTime
        soleCi = fastCi
      } else {
        // full rescan: min key, the (single?) cursor holding it, and
        // the second-smallest distinct key for the fast path
        var any = false
        var minCi = -1
        var multi = false
        hasSecond = false
        var ci = 0
        while (ci < cursors.length) {
          val c = cursors(ci)
          if (!c.exhausted) {
            val s = c.headSid
            val t = c.headTime
            if (!any) { ms = s; mt = t; minCi = ci; any = true }
            else if (s < ms || (s == ms && t < mt)) {
              // previous min becomes the second-min candidate
              if (!hasSecond || ms < s2 || (ms == s2 && mt < t2)) {
                s2 = ms; t2 = mt; hasSecond = true
              }
              ms = s; mt = t; minCi = ci; multi = false
            } else if (s == ms && t == mt) multi = true
            else if (!hasSecond || s < s2 || (s == s2 && t < t2)) {
              s2 = s; t2 = t; hasSecond = true
            }
          }
          ci += 1
        }
        if (!any) {
          if (k == 0) return false
          current = emit(wins, winIdx, ord, k)
          return true
        }
        if (!multi) soleCi = minCi
        fastCi = if (multi) -1 else minCi
      }
      // collect every version; winner = max __seq, ties to the LATER
      // cursor (>= like the row merge)
      var winSlot = -1
      var winOrd = -1
      var winSeq = Long.MinValue
      var winDel = false
      if (soleCi >= 0) {
        // single-cursor key: versions (if any) all live in this cursor
        val c = cursors(soleCi)
        var first = true
        while (!c.exhausted && c.headSid == ms && c.headTime == mt) {
          val sq = c.headSeq
          if (first || sq >= winSeq) {
            winSeq = sq
            winDel = c.headDel
            winSlot = slotOf(soleCi)
            winOrd = c.win.sel(c.pos)
            first = false
          }
          c.advanceRow()
        }
      } else {
        var first = true
        var ci = 0
        while (ci < cursors.length) {
          val c = cursors(ci)
          while (!c.exhausted && c.headSid == ms && c.headTime == mt) {
            val sq = c.headSeq
            if (first || sq >= winSeq) {
              winSeq = sq
              winDel = c.headDel
              winSlot = slotOf(ci)
              winOrd = c.win.sel(c.pos)
              first = false
            }
            c.advanceRow()
          }
          ci += 1
        }
      }
      if (!winDel) {
        winIdx(k) = winSlot
        ord(k) = winOrd
        k += 1
      }
    }
    current = emit(wins, winIdx, ord, k)
    true
  }

  private def emit(wins: ArrayBuffer[Window], winIdx: Array[Int],
                   ord: Array[Int], k: Int): ColumnarBatch = {
    val winArr = wins.toArray
    val cols: Array[ColumnVector] = phys.map {
      case "part_start" => new GraftConstLongVec(stripe.partStart): ColumnVector
      case c =>
        val bases = winArr.map(_.vecs.get(c))
        new GraftGatherVec(bases, winIdx, ord,
          GraftColumnar.TsdbColumnarTypes.getOrElse(c, LongType)): ColumnVector
    }.toArray
    val b = new ColumnarBatch(cols)
    b.setNumRows(k)
    b
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = cursors.foreach(_.close())
}

/** Gather indirection over per-window base vectors: row i reads
  * `bases(winIdx(i))` at `ord(i)`. O(1) wrap, zero value copies. */
private[sources] final class GraftGatherVec(
    bases: Array[ColumnVector], winIdx: Array[Int], ord: Array[Int],
    dt: DataType) extends ColumnVector(dt) {
  override def close(): Unit = ()
  override def hasNull: Boolean = true // unknown cheaply; callers use isNullAt
  override def numNulls(): Int = -1
  override def isNullAt(i: Int): Boolean = bases(winIdx(i)).isNullAt(ord(i))
  override def getBoolean(i: Int): Boolean = bases(winIdx(i)).getBoolean(ord(i))
  override def getByte(i: Int): Byte = bases(winIdx(i)).getByte(ord(i))
  override def getShort(i: Int): Short = bases(winIdx(i)).getShort(ord(i))
  override def getInt(i: Int): Int = bases(winIdx(i)).getInt(ord(i))
  override def getLong(i: Int): Long = bases(winIdx(i)).getLong(ord(i))
  override def getFloat(i: Int): Float = bases(winIdx(i)).getFloat(ord(i))
  override def getDouble(i: Int): Double = bases(winIdx(i)).getDouble(ord(i))
  override def getArray(i: Int): org.apache.spark.sql.vectorized.ColumnarArray =
    bases(winIdx(i)).getArray(ord(i))
  override def getMap(i: Int): org.apache.spark.sql.vectorized.ColumnarMap =
    bases(winIdx(i)).getMap(ord(i))
  override def getDecimal(i: Int, p: Int, s: Int): org.apache.spark.sql.types.Decimal =
    bases(winIdx(i)).getDecimal(ord(i), p, s)
  override def getUTF8String(i: Int): UTF8String =
    bases(winIdx(i)).getUTF8String(ord(i))
  override def getBinary(i: Int): Array[Byte] = bases(winIdx(i)).getBinary(ord(i))
  override def getChild(i: Int): ColumnVector =
    throw new UnsupportedOperationException("gather vector has no children")
}
