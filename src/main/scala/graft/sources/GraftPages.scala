package graft.sources

import java.nio.ByteOrder

import org.apache.parquet.bytes.BytesUtils
import org.apache.parquet.column.{ColumnDescriptor, Dictionary, Encoding, ValuesType}
import org.apache.parquet.column.page.{DataPage, DataPageV1, DataPageV2, PageReader}
import org.apache.parquet.column.values.ValuesReader
import org.apache.parquet.column.values.rle.RunLengthBitPackingHybridDecoder
import org.apache.parquet.schema.PrimitiveType
import org.apache.spark.unsafe.types.UTF8String

/** Page-level BULK decoder for one column chunk of one row group — the
  * r14 replacement for the one-value-per-virtual-call cursor API
  * (`ColumnReadStoreImpl`) that left the columnar scan's narrow/map
  * lanes at ~1.5× of Spark's vectorized reader (SCALE.md r13).
  * (Reference analog: the projected chunk scans behind S1,
  * `v3io-tsdb/pkg/pquerier/select.go:583-595` — the WHAT; the HOW here
  * is the public parquet format, decoded through parquet-column's
  * exported page/values API.)
  *
  * Everything here is the PUBLIC parquet-column surface (the format is
  * ISO-standardized; the classes are exported API):
  *  - definition/repetition levels decode WHOLE-PAGE into int arrays
  *    (`Encoding.getValuesReader` for V1's length-prefixed sections,
  *    [[RunLengthBitPackingHybridDecoder]] for V2's bare RLE) — and a
  *    page whose def levels are all-max collapses to `defs = null`, the
  *    no-null fast path;
  *  - PLAIN INT64/DOUBLE pages bulk-read straight off the page buffer
  *    (absolute little-endian gets — no per-value stream call);
  *  - dictionary pages (PLAIN_/RLE_DICTIONARY) decode their id stream
  *    whole-page, against a ONCE-PER-CHUNK materialized typed
  *    dictionary — for strings that means the dictionary's UTF8Strings
  *    are SHARED across rows (zero per-value allocation);
  *  - PLAIN BINARY pages parse length-prefixed slices in place, each
  *    UTF8String wrapping the page array (no byte copies);
  *  - any other (type, encoding) pair — legacy BIT_PACKED levels,
  *    DELTA_*, BYTE_STREAM_SPLIT, booleans — falls back to the generic
  *    [[ValuesReader]] for THAT PAGE only, so the cursor is total over
  *    the format without a slow path tax on the common shapes.
  *
  * Two consumption styles, matching the two column shapes the raw
  * schema has:
  *  - flat columns: `readLongs`/`readDoubles`/`readStrings`/
  *    `readBooleans` decode `k` rows (= k level entries) into the
  *    caller's arrays;
  *  - the labels-map leaves (maxRep > 0): `peekDef`/`peekRep`/
  *    `readStringEntry`/`skipEntry` walk entries one at a time — but
  *    off decoded ARRAYS, not through per-value virtual calls.
  */
private[sources] final class GraftPageCursor(
    desc: ColumnDescriptor, pages: PageReader) {

  private val maxDef = desc.getMaxDefinitionLevel
  private val maxRep = desc.getMaxRepetitionLevel
  private val ptype = desc.getPrimitiveType.getPrimitiveTypeName
  val totalEntries: Long = pages.getTotalValueCount

  private val dict: Dictionary = {
    val dp = pages.readDictionaryPage()
    if (dp == null) null else dp.getEncoding.initDictionary(desc, dp)
  }
  // typed dictionary, materialized once per chunk on first dict page
  private var dictLongs: Array[Long] = _
  private var dictDoubles: Array[Double] = _
  private var dictStrs: Array[UTF8String] = _
  private def ensureDict(): Boolean = {
    if (dictLongs != null || dictDoubles != null || dictStrs != null) return true
    ptype match {
      case PrimitiveType.PrimitiveTypeName.INT64 =>
        dictLongs = Array.tabulate(dict.getMaxId + 1)(dict.decodeToLong); true
      case PrimitiveType.PrimitiveTypeName.DOUBLE =>
        dictDoubles = Array.tabulate(dict.getMaxId + 1)(dict.decodeToDouble); true
      case PrimitiveType.PrimitiveTypeName.BINARY =>
        dictStrs = Array.tabulate(dict.getMaxId + 1)(i =>
          UTF8String.fromBytes(dict.decodeToBinary(i).getBytesUnsafe)); true
      case _ => false // no typed fast path — generic dict reader instead
    }
  }

  // ---- current-page state --------------------------------------------------
  private var n = 0                     // level entries in page
  private var pos = 0                   // entries consumed in page
  private var consumed = 0L             // entries consumed in chunk
  private var defs: Array[Int] = _      // null = every entry present (== maxDef)
  private var reps: Array[Int] = _      // null = maxRep == 0
  // value source (exactly one active per page)
  private var ids: Array[Int] = _       // dictionary ids, dense over non-nulls
  private var idPos = 0
  private var fixed: java.nio.ByteBuffer = _ // PLAIN fixed-width page values
  private var fixedOff = 0
  private var bin: Array[Byte] = _      // PLAIN binary page values
  private var binPos = 0
  private var vr: ValuesReader = _      // generic per-value fallback

  def hasMore: Boolean = consumed < totalEntries

  private def ensurePage(): Unit = if (pos == n) loadPage()

  private def loadPage(): Unit = {
    val page: DataPage = pages.readPage()
    if (page == null)
      throw new IllegalStateException(
        s"page reader exhausted early for ${desc.getPath.mkString(".")}")
    pos = 0
    ids = null; fixed = null; bin = null; vr = null
    page match {
      case p: DataPageV1 =>
        n = p.getValueCount
        val in = p.getBytes.toInputStream
        reps =
          if (maxRep == 0) null
          else {
            val r = p.getRlEncoding.getValuesReader(desc, ValuesType.REPETITION_LEVEL)
            r.initFromPage(n, in)
            val a = new Array[Int](n)
            var i = 0
            while (i < n) { a(i) = r.readInteger(); i += 1 }
            a
          }
        defs =
          if (maxDef == 0) null
          else {
            val d = p.getDlEncoding.getValuesReader(desc, ValuesType.DEFINITION_LEVEL)
            d.initFromPage(n, in)
            val a = new Array[Int](n)
            var allMax = true
            var i = 0
            while (i < n) {
              val v = d.readInteger(); a(i) = v
              if (v != maxDef) allMax = false
              i += 1
            }
            if (allMax) null else a
          }
        initValues(p.getValueEncoding, in)
      case p: DataPageV2 =>
        n = p.getValueCount
        reps = if (maxRep == 0) null else v2Levels(p.getRepetitionLevels, maxRep)
        defs =
          if (maxDef == 0) null
          else {
            val a = v2Levels(p.getDefinitionLevels, maxDef)
            var allMax = true
            var i = 0
            while (allMax && i < n) { allMax = a(i) == maxDef; i += 1 }
            if (allMax) null else a
          }
        initValues(p.getDataEncoding, p.getData.toInputStream)
    }
  }

  /** V2 levels: bare RLE/bit-packed runs, no length prefix. */
  private def v2Levels(bytes: org.apache.parquet.bytes.BytesInput,
                       max: Int): Array[Int] = {
    val dec = new RunLengthBitPackingHybridDecoder(
      BytesUtils.getWidthFromMaxInt(max), bytes.toInputStream)
    val a = new Array[Int](n)
    var i = 0
    while (i < n) { a(i) = dec.readInt(); i += 1 }
    a
  }

  private def nonNullsAhead(k: Int): Int =
    if (defs == null) k
    else {
      var c = 0
      var i = pos
      val end = pos + k
      while (i < end) { if (defs(i) == maxDef) c += 1; i += 1 }
      c
    }

  private def initValues(enc: Encoding,
                         in: org.apache.parquet.bytes.ByteBufferInputStream): Unit = {
    val nonNull = nonNullsAhead(n)
    if (enc.usesDictionary && dict != null && ensureDict()) {
      // data = one bit-width byte, then bare RLE/bit-packed ids
      val bw = in.read()
      val dec = new RunLengthBitPackingHybridDecoder(bw, in)
      ids = new Array[Int](nonNull)
      var i = 0
      while (i < nonNull) { ids(i) = dec.readInt(); i += 1 }
      idPos = 0
    } else if (enc == Encoding.PLAIN &&
        (ptype == PrimitiveType.PrimitiveTypeName.INT64 ||
         ptype == PrimitiveType.PrimitiveTypeName.DOUBLE)) {
      // slice() copies only if the page spans buffers (it never does for
      // a decompressed page); absolute gets below leave position alone
      fixed = in.slice(8 * nonNull).slice().order(ByteOrder.LITTLE_ENDIAN)
      fixedOff = 0
    } else if (enc == Encoding.PLAIN &&
        ptype == PrimitiveType.PrimitiveTypeName.BINARY) {
      val len = in.available()
      val bb = in.slice(len)
      if (bb.hasArray) {
        bin = bb.array()
        binPos = bb.arrayOffset() + bb.position()
      } else { // direct buffer: one copy per page, then in-place parsing
        bin = new Array[Byte](bb.remaining())
        bb.duplicate().get(bin)
        binPos = 0
      }
    } else if (enc.usesDictionary && dict != null) {
      vr = enc.getDictionaryBasedValuesReader(desc, ValuesType.VALUES, dict)
      vr.initFromPage(n, in)
    } else {
      vr = enc.getValuesReader(desc, ValuesType.VALUES)
      vr.initFromPage(n, in)
    }
  }

  // ---- flat-column bulk reads ----------------------------------------------

  def readLongs(k: Int, vals: Array[Long], nulls: Array[Boolean], off: Int): Unit = {
    var done = 0
    while (done < k) {
      ensurePage()
      val m = math.min(k - done, n - pos)
      var i = 0
      if (defs == null) {
        if (fixed != null) {
          while (i < m) { vals(off + done + i) = fixed.getLong(fixedOff); fixedOff += 8; i += 1 }
        } else if (ids != null) {
          while (i < m) { vals(off + done + i) = dictLongs(ids(idPos)); idPos += 1; i += 1 }
        } else {
          while (i < m) { vals(off + done + i) = vr.readLong(); i += 1 }
        }
      } else {
        while (i < m) {
          val o = off + done + i
          if (defs(pos + i) == maxDef) {
            if (fixed != null) { vals(o) = fixed.getLong(fixedOff); fixedOff += 8 }
            else if (ids != null) { vals(o) = dictLongs(ids(idPos)); idPos += 1 }
            else vals(o) = vr.readLong()
          } else nulls(o) = true
          i += 1
        }
      }
      pos += m; consumed += m; done += m
    }
  }

  def readDoubles(k: Int, vals: Array[Double], nulls: Array[Boolean], off: Int): Unit = {
    var done = 0
    while (done < k) {
      ensurePage()
      val m = math.min(k - done, n - pos)
      var i = 0
      if (defs == null) {
        if (fixed != null) {
          while (i < m) { vals(off + done + i) = fixed.getDouble(fixedOff); fixedOff += 8; i += 1 }
        } else if (ids != null) {
          while (i < m) { vals(off + done + i) = dictDoubles(ids(idPos)); idPos += 1; i += 1 }
        } else {
          while (i < m) { vals(off + done + i) = vr.readDouble(); i += 1 }
        }
      } else {
        while (i < m) {
          val o = off + done + i
          if (defs(pos + i) == maxDef) {
            if (fixed != null) { vals(o) = fixed.getDouble(fixedOff); fixedOff += 8 }
            else if (ids != null) { vals(o) = dictDoubles(ids(idPos)); idPos += 1 }
            else vals(o) = vr.readDouble()
          } else nulls(o) = true
          i += 1
        }
      }
      pos += m; consumed += m; done += m
    }
  }

  def readBooleans(k: Int, vals: Array[Boolean], nulls: Array[Boolean], off: Int): Unit = {
    var done = 0
    while (done < k) {
      ensurePage()
      val m = math.min(k - done, n - pos)
      var i = 0
      while (i < m) {
        val o = off + done + i
        if (defs == null || defs(pos + i) == maxDef) vals(o) = vr.readBoolean()
        else nulls(o) = true
        i += 1
      }
      pos += m; consumed += m; done += m
    }
  }

  private def nextString(): UTF8String =
    if (ids != null) { val s = dictStrs(ids(idPos)); idPos += 1; s }
    else if (bin != null) {
      val len = (bin(binPos) & 0xff) | (bin(binPos + 1) & 0xff) << 8 |
        (bin(binPos + 2) & 0xff) << 16 | (bin(binPos + 3) & 0xff) << 24
      val s = UTF8String.fromBytes(bin, binPos + 4, len)
      binPos += 4 + len
      s
    } else UTF8String.fromBytes(vr.readBytes().getBytesUnsafe)

  def readStrings(k: Int, vals: Array[UTF8String], off: Int): Unit = {
    var done = 0
    while (done < k) {
      ensurePage()
      val m = math.min(k - done, n - pos)
      var i = 0
      while (i < m) {
        if (defs == null || defs(pos + i) == maxDef)
          vals(off + done + i) = nextString()
        i += 1
      }
      pos += m; consumed += m; done += m
    }
  }

  // ---- entry-level walk (nested leaves: the labels map) ----------------------

  def peekDef(): Int = { ensurePage(); if (defs == null) maxDef else defs(pos) }
  def peekRep(): Int = { ensurePage(); if (reps == null) 0 else reps(pos) }

  /** Consume one entry that carries no value (def < maxDef). Loads the
    * next page first when the current one is exhausted — the map KEY
    * and VALUE chunks page-break independently, so the caller's peek on
    * one cursor proves nothing about the other (review-caught r14: a
    * skip exactly at a value-page boundary walked past the page end). */
  def skipEntry(): Unit = { ensurePage(); pos += 1; consumed += 1 }

  /** Consume one entry carrying a value (caller checked def == maxDef
    * on THIS cursor, which also loaded the page). */
  def readStringEntry(): UTF8String = {
    ensurePage()
    val s = nextString()
    pos += 1; consumed += 1
    s
  }
}
