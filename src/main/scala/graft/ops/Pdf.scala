package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** PDF probe + bounded text extraction (r11) — the crawl-modal document
  * format. A web crawl's single biggest non-HTML document source is
  * plain PDF, and at 100 TB the pipeline needs the same two stages the
  * media formats get: a header/xref PROBE (version, page count,
  * encrypted flag — triage before any content work) and a bounded TEXT
  * extractor for the supported subset (FlateDecode / ASCIIHex /
  * uncompressed content streams, simple fonts, Tj/TJ/BT-ET operators).
  *
  * Everything derives from the public ISO 32000-1 (PDF 1.7) spec:
  * cross-reference TABLES (§7.5.4) and STREAMS (§7.5.8, /W-column
  * entries, PNG predictors), object streams (§7.5.7), the content
  * stream text operators (§9.4), literal/hex string syntax (§7.3.4),
  * and WinAnsiEncoding (Annex D). `java.util.zip.Inflater` makes
  * FlateDecode zero-dependency.
  *
  * Out-of-scope constructs FLAG, never crash (the [[Codecs]]
  * quarantine stance): encrypted documents emit one `ok=false` row
  * (reason `encrypted`); composite (/Type0 CID) fonts skip their show
  * ops and set `flagged`; unsupported filters (DCT, JBIG2, LZW)
  * likewise. Every inflate is output-capped (`maxStreamBytes` — the
  * codec bomb-cap discipline); object resolution is depth- and
  * count-capped against reference cycles and object floods.
  *
  * Deterministic extraction rules (the fixture writer and the DuckDB
  * twins mirror these EXACTLY):
  *  - `Tj` and the string elements of `TJ` append the decoded string
  *    (TJ kerning numbers ignored);
  *  - `'` and `"` mean "next line and show": newline, then the string;
  *  - `Td`, `TD`, `T*`, `Tm` append a newline unless the page text is
  *    empty or already ends with one;
  *  - pages are separate rows — no page separator character.
  *
  * Reference cross-ref: the reference engine has no document formats
  * at all (`v3io-tsdb/pkg/formatter/` is query output formatting);
  * this family exists for the training-data pipeline mandate.
  */
object Pdf {

  // ------------------------------------------------------ object model

  sealed trait Obj
  final case class PNum(d: Double) extends Obj { def i: Int = d.toInt; def l: Long = d.toLong }
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PName(n: String) extends Obj
  final case class PBool(b: Boolean) extends Obj
  case object PNull extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj {
    def get(k: String): Option[Obj] = m.get(k)
  }
  final case class PRef(num: Int, gen: Int) extends Obj
  /** `raw` is the ENCODED stream body (filters not yet applied). */
  final case class PStream(dict: PDict, raw: Array[Byte]) extends Obj
  /** Content-stream operator (only produced in content mode). */
  private final case class POp(op: String) extends Obj

  private final class PdfError(msg: String) extends Exception(msg)
  private def fail(msg: String): Nothing = throw new PdfError(msg)

  // ------------------------------------------------------------- lexer

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
    c == '{' || c == '}' || c == '/' || c == '%'
  private def isRegular(c: Int): Boolean = !isWs(c) && !isDelim(c) && c >= 0

  /** Recursive-descent PDF object reader over a byte window. In
    * `content` mode bare keywords become [[POp]] operators (the
    * content-stream language shares the object syntax); otherwise only
    * true/false/null keywords are objects. */
  private final class Lexer(b: Array[Byte], var p: Int, end: Int,
                            content: Boolean) {
    def this(b: Array[Byte], p: Int, content: Boolean) =
      this(b, p, b.length, content)

    private var depth = 0

    def at(i: Int): Int = if (i >= 0 && i < end) b(i) & 0xFF else -1
    def cur: Int = at(p)

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (p < end && isWs(b(p) & 0xFF)) p += 1
        if (p < end && b(p) == '%') { // comment to EOL
          while (p < end && b(p) != '\n' && b(p) != '\r') p += 1
        } else go = false
      }
    }

    /** Next regular-character run (keyword / number token). */
    private def token(): String = {
      val s = p
      while (p < end && isRegular(b(p) & 0xFF)) p += 1
      if (p == s) fail(s"lexical error at $p (char ${cur})")
      new String(b, s, p - s, "ISO-8859-1")
    }

    def expectKeyword(kw: String): Unit = {
      skipWs()
      val t = token()
      if (t != kw) fail(s"expected '$kw', got '$t'")
    }

    /** Parse one object. At clean end-of-window returns null. Drains
      * the one-token pushback first: the `N G R` lookahead may have
      * consumed a second integer that turned out to be its own object
      * (`0 0 obj`, `[1 2]`, `0 -14 Td` all hit this). */
    def next(): Obj = {
      if (pushback != null) {
        val t = pushback; pushback = null
        return parseNum(t)
      }
      nextCore()
    }

    private def nextCore(): Obj = {
      skipWs()
      if (p >= end) return null
      depth += 1
      if (depth > 64) fail("nesting too deep")
      try {
        cur match {
          case '/' => parseName()
          case '(' => parseLiteralString()
          case '[' =>
            p += 1
            val items = Vector.newBuilder[Obj]
            var o = nextUntil(']')
            while (o != null) { items += o; o = nextUntil(']') }
            PArr(items.result())
          case '<' =>
            if (at(p + 1) == '<') parseDictOrStream()
            else parseHexString()
          case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
            parseNumberOrRef()
          case _ =>
            val t = token()
            t match {
              case "true" => PBool(true)
              case "false" => PBool(false)
              case "null" => PNull
              case kw if content => POp(kw)
              case kw => fail(s"unexpected keyword '$kw'")
            }
        }
      } finally depth -= 1
    }

    /** Object inside a bracketed scope; null when the closer is hit.
      * A pending pushback token is an ITEM (`[0 0 612 792]` parks the
      * final number there) — drain it before looking at raw chars, or
      * the close check would leak it into the enclosing scope. */
    private def nextUntil(closer: Char): Obj = {
      if (pushback != null) return next()
      skipWs()
      if (p >= end) fail(s"EOF inside '$closer'-scope")
      if (cur == closer) { p += 1; null } else next()
    }

    private def parseName(): PName = {
      p += 1 // '/'
      val sb = new java.lang.StringBuilder(16)
      while (p < end && isRegular(b(p) & 0xFF)) {
        val c = b(p) & 0xFF
        if (c == '#' && p + 2 < end) {
          val h = (Character.digit(b(p + 1), 16) << 4) | Character.digit(b(p + 2), 16)
          if (h >= 0) { sb.append(h.toChar); p += 3 }
          else { sb.append(c.toChar); p += 1 }
        } else { sb.append(c.toChar); p += 1 }
        if (sb.length > 4096) fail("name too long")
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      p += 1 // '('
      val out = new java.io.ByteArrayOutputStream(32)
      var open = 1
      while (open > 0) {
        if (p >= end) fail("EOF in string")
        val c = b(p) & 0xFF
        p += 1
        c match {
          case '(' => open += 1; out.write(c)
          case ')' => open -= 1; if (open > 0) out.write(c)
          case '\\' =>
            if (p >= end) fail("EOF in string escape")
            val e = b(p) & 0xFF
            p += 1
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' | ')' | '\\' => out.write(e)
              case '\r' => if (p < end && b(p) == '\n') p += 1 // line continuation
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 0
                while (k < 2 && p < end && b(p) >= '0' && b(p) <= '7') {
                  v = (v << 3) | (b(p) - '0'); p += 1; k += 1
                }
                out.write(v & 0xFF)
              case other => out.write(other) // spec: backslash dropped
            }
          case _ => out.write(c)
        }
        if (out.size > (1 << 24)) fail("string too long")
      }
      PStr(out.toByteArray)
    }

    private def parseHexString(): PStr = {
      p += 1 // '<'
      val out = new java.io.ByteArrayOutputStream(32)
      var hi = -1
      var closed = false
      while (!closed) {
        if (p >= end) fail("EOF in hex string")
        val c = b(p) & 0xFF
        p += 1
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd count: trailing 0 (§7.3.4.3)
          closed = true
        } else if (!isWs(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) fail(s"bad hex digit '$c'")
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
        }
        if (out.size > (1 << 24)) fail("hex string too long")
      }
      PStr(out.toByteArray)
    }

    private def parseDictOrStream(): Obj = {
      p += 2 // '<<'
      val m = Map.newBuilder[String, Obj]
      var done = false
      while (!done) {
        skipWs()
        if (p >= end) fail("EOF in dict")
        if (cur == '>' && at(p + 1) == '>') { p += 2; done = true }
        else {
          if (cur != '/') fail(s"dict key must be a name (at $p)")
          val k = parseName().n
          val v = next()
          if (v == null) fail("EOF in dict value")
          m += k -> v
        }
      }
      val dict = PDict(m.result())
      // `stream` keyword directly after? (object position only; content
      // mode has no streams and a bare keyword there is an operator)
      if (!content) {
        val save = p
        skipWs()
        if (p + 6 <= end && b(p) == 's' && b(p + 1) == 't' && b(p + 2) == 'r' &&
            b(p + 3) == 'e' && b(p + 4) == 'a' && b(p + 5) == 'm') {
          p += 6
          // EOL after `stream`: CRLF or LF (§7.3.8.1)
          if (p < end && b(p) == '\r') p += 1
          if (p < end && b(p) == '\n') p += 1
          val start = p
          val rawEnd = dict.get("Length") match {
            case Some(PNum(n)) if n >= 0 && start + n.toLong <= end =>
              start + n.toInt
            case _ => // Length missing/ref/lying: scan for `endstream`
              val i = indexOfKeyword(b, start, end, "endstream")
              if (i < 0) fail("unterminated stream")
              // back over the EOL that precedes endstream
              var e = i
              if (e > start && b(e - 1) == '\n') e -= 1
              if (e > start && b(e - 1) == '\r') e -= 1
              e
          }
          val raw = java.util.Arrays.copyOfRange(b, start, rawEnd)
          p = rawEnd
          expectKeyword("endstream")
          return PStream(dict, raw)
        }
        p = save
      }
      dict
    }

    /** Number, or an `N G R` indirect reference (two-token lookahead). */
    private def parseNumberOrRef(): Obj = {
      val t1 = token()
      val n1 = parseNum(t1)
      if (t1.indexOf('.') < 0 && n1.d >= 0 && n1.d == math.floor(n1.d)) {
        val save = p
        skipWs()
        if (p < end && b(p) >= '0' && b(p) <= '9') {
          val t2 = token()
          val save2 = p
          skipWs()
          if (p < end && b(p) == 'R' && !isRegular(at(p + 1))) {
            p += 1
            return PRef(n1.i, java.lang.Integer.parseInt(t2))
          }
          p = save2
          pushback = t2 // second integer was a separate object
          return n1
        }
        p = save
      }
      n1
    }

    // one-token pushback for the N-G-R lookahead (content streams put
    // bare integer runs before operators: `0 -14 Td`)
    private var pushback: String = null

    private def parseNum(t: String): PNum =
      try PNum(java.lang.Double.parseDouble(t))
      catch { case _: NumberFormatException => fail(s"bad number '$t'") }
  }

  private def indexOfKeyword(b: Array[Byte], from: Int, end: Int,
                             kw: String): Int = {
    val k = kw.getBytes("ISO-8859-1")
    var i = from
    val last = end - k.length
    while (i <= last) {
      var j = 0
      while (j < k.length && b(i + j) == k(j)) j += 1
      if (j == k.length) return i
      i += 1
    }
    -1
  }

  // ----------------------------------------------------------- filters

  /** Bounded FlateDecode: inflate `raw` capped at `max` output bytes —
    * a 1 KB bomb must not allocate past the cap (the codec discipline). */
  private[graft] def inflate(raw: Array[Byte], max: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(math.min(max, raw.length * 4 + 64))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
        catch { case e: java.util.zip.DataFormatException => fail(s"bad flate: ${e.getMessage}") }
        if (n == 0 && !inf.finished()) {
          if (inf.needsInput() || inf.needsDictionary()) fail("truncated flate stream")
        }
        out.write(buf, 0, n)
        if (out.size > max) fail(s"flate output exceeds cap $max")
      }
      out.toByteArray
    } finally inf.end()
  }

  /** LZWDecode (§7.4.4.2 — the TIFF-variant LZW older PDFs carry):
    * MSB-first codes, 9→12-bit widths growing `earlyChange` codes
    * early (the Adobe default 1), 256 = clear-table, 257 = EOD,
    * KwKwK case per the published algorithm. Output capped at `max`
    * (the bomb discipline); a code beyond the table, EOF without EOD,
    * or a full table without a clear all fail (the caller flags). */
  private[graft] def lzwDecode(raw: Array[Byte], max: Int,
                               earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(max, raw.length * 3 + 64))
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    def read(width: Int): Int = {
      while (bitCnt < width) {
        if (pos >= raw.length) fail("EOF in LZW stream (no EOD)")
        bitBuf = (bitBuf << 8) | (raw(pos) & 0xFF); pos += 1; bitCnt += 8
      }
      bitCnt -= width
      ((bitBuf >> bitCnt) & ((1L << width) - 1)).toInt
    }
    val table = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { table(i) = Array(i.toByte); i += 1 }
    var next = 258
    var width = 9
    var prev: Array[Byte] = null
    while (true) {
      val c = read(width)
      if (c == 257) return out.toByteArray
      if (c == 256) { next = 258; width = 9; prev = null }
      else {
        val seq =
          if (c < 256) table(c)
          else if (c < next && c >= 258) table(c)
          else if (c == next && prev != null) prev :+ prev(0) // KwKwK
          else fail(s"LZW code $c beyond table (next=$next)")
        out.write(seq, 0, seq.length)
        if (out.size > max) fail(s"LZW output exceeds cap $max")
        if (prev != null) {
          if (next >= 4096) fail("LZW table overflow without a clear")
          table(next) = prev :+ seq(0)
          next += 1
        }
        if (width < 12 && next == (1 << width) - earlyChange) width += 1
        prev = seq
      }
    }
    sys.error("unreachable")
  }

  /** LZW ENCODER — fixture/witness side only (the decoder never depends
    * on it): standard (prefixCode, byte) dictionary build, with the
    * code width tracked by SIMULATING the decoder's table state (the
    * decoder assigns entries one code behind the encoder — exactly the
    * off-by-one `earlyChange` exists to reconcile), so any compliant
    * decoder reads each code at the width it was written. Emits a
    * clear when the table fills. */
  private[graft] def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L
    var bitCnt = 0
    def emit(code: Int, width: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        bitCnt -= 8
        out.write(((bitBuf >> bitCnt) & 0xFF).toInt)
      }
    }
    // decoder-state simulation: width at which the NEXT code is read
    var simNext = 258
    var simWidth = 9
    var simPrev = false
    def simEmit(code: Int): Unit = {
      emit(code, simWidth)
      if (code == 256) { simNext = 258; simWidth = 9; simPrev = false }
      else if (code == 257) ()
      else {
        if (simPrev && simNext < 4096) simNext += 1
        if (simWidth < 12 && simNext == (1 << simWidth) - earlyChange)
          simWidth += 1
        simPrev = true
      }
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 258
    simEmit(256) // leading clear (the Adobe writers' convention)
    var cur = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (cur < 0) cur = b
      else {
        val key = (cur.toLong << 8) | b
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          simEmit(cur)
          if (next < 4096) { dict.put(key, next); next += 1 }
          if (next >= 4096) { // table full: clear and restart
            simEmit(256)
            dict.clear()
            next = 258
          }
          cur = b
        }
      }
      i += 1
    }
    if (cur >= 0) simEmit(cur)
    simEmit(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): 5 chars `!`..`u` per 4 bytes base-85,
    * `z` = four zero bytes (only between groups), whitespace ignored,
    * `~>` EOD; a trailing partial group of n chars yields n-1 bytes
    * (padded with `u` for the carry per the spec). */
  private[graft] def ascii85Decode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var n = 0
    def flush(chars: Int): Unit = {
      if (chars < 2) fail("ASCII85 group of one char")
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < chars) grp(i) else 84); i += 1 }
      if (v > 0xFFFFFFFFL) fail("ASCII85 group overflows 32 bits")
      var k = 0
      while (k < chars - 1) { out.write(((v >> (24 - 8 * k)) & 0xFF).toInt); k += 1 }
    }
    var i = 0
    var done = false
    while (i < raw.length && !done) {
      val c = raw(i) & 0xFF
      if (c == '~') { // EOD
        if (n > 0) flush(n)
        done = true
      } else if (c == 'z') {
        if (n != 0) fail("ASCII85 'z' inside a group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!isWs(c)) {
        if (c < '!' || c > 'u') fail(s"bad ASCII85 char $c")
        grp(n) = c - '!'
        n += 1
        if (n == 5) { flush(5); n = 0 }
      }
      i += 1
    }
    if (!done && n > 0) flush(n) // EOD-less tail tolerated
    out.toByteArray
  }

  /** RunLengthDecode (§7.4.5): length byte `l` — 0..127 copies the next
    * l+1 bytes literally, 129..255 repeats the next byte 257−l times,
    * 128 = EOD. */
  private[graft] def runLengthDecode(raw: Array[Byte], max: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length * 2 + 16)
    var i = 0
    while (i < raw.length) {
      val l = raw(i) & 0xFF
      if (l == 128) return out.toByteArray
      if (l < 128) {
        if (i + 1 + l + 1 > raw.length) fail("RunLength literal past EOF")
        out.write(raw, i + 1, l + 1)
        i += 2 + l
      } else {
        if (i + 1 >= raw.length) fail("RunLength run past EOF")
        var k = 0
        while (k < 257 - l) { out.write(raw(i + 1)); k += 1 }
        i += 2
      }
      if (out.size > max) fail(s"RunLength output exceeds cap $max")
    }
    out.toByteArray // EOD-less tail tolerated
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` EOD,
    * odd final digit padded with 0. */
  private def asciiHexDecode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 1)
    var hi = -1
    var i = 0
    var eod = false
    while (i < raw.length && !eod) {
      val c = raw(i) & 0xFF
      if (c == '>') eod = true
      else if (!isWs(c)) {
        val d = Character.digit(c, 16)
        if (d < 0) fail(s"bad ASCIIHex digit '$c'")
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** PNG predictors (RFC 2083 §6, referenced by §7.4.4.4): per-row
    * filter tag + `columns` bytes; colors/bpc are 1/8 for every xref
    * stream in practice (bpp = 1). TIFF predictor 2 and bpp > 1 are
    * out of scope → fail (flagging, not misdecoding). */
  private def unpredict(data: Array[Byte], predictor: Int, columns: Int): Array[Byte] = {
    if (predictor <= 1) return data
    if (predictor < 10) fail(s"unsupported predictor $predictor")
    if (columns <= 0 || columns > (1 << 20)) fail(s"bad predictor columns $columns")
    val rowLen = columns + 1
    if (data.length % rowLen != 0) fail("predictor data not row-aligned")
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    var r = 0
    while (r < rows) {
      val tag = data(r * rowLen) & 0xFF
      val src = r * rowLen + 1
      val dst = r * columns
      val prev = dst - columns
      var i = 0
      while (i < columns) {
        val x = data(src + i) & 0xFF
        val a = if (i > 0) out(dst + i - 1) & 0xFF else 0        // left (bpp=1)
        val b = if (r > 0) out(prev + i) & 0xFF else 0           // up
        val c = if (r > 0 && i > 0) out(prev + i - 1) & 0xFF else 0
        val v = tag match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case t => fail(s"bad PNG filter tag $t")
        }
        out(dst + i) = (v & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  // ----------------------------------------------- encryption (§7.6)

  /** Standard security handler password pad (ISO 32000-1 §7.6.3.3,
    * the 32-byte string every password-derivation algorithm appends). */
  private val PdfPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def padPassword(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ PdfPad).take(32)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 stream cipher (§7.6.2 "RC4" — the algorithm is public and
    * trivially small; both encrypt and decrypt are this one function). */
  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  /** AES-128-CBC with the PDF layout: IV = first 16 bytes, PKCS#7 pad
    * (§7.6.2 AESV2). JDK `javax.crypto` carries the primitive. */
  private def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 16 || (data.length - 16) % 16 != 0)
      fail("bad AES stream length")
    if (data.length == 16) return Array.empty[Byte]
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(data, 0, 16))
    val plain = c.doFinal(data, 16, data.length - 16)
    val pad = plain(plain.length - 1) & 0xFF
    if (pad < 1 || pad > 16 || pad > plain.length) fail("bad AES padding")
    java.util.Arrays.copyOf(plain, plain.length - pad)
  }

  private def aesCbcEncrypt(key: Array[Byte], iv: Array[Byte],
                            data: Array[Byte]): Array[Byte] = {
    val pad = 16 - (data.length % 16)
    val padded = data ++ Array.fill(pad)(pad.toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** AES-CBC with an explicit zero IV and NO padding — the V5 key-wrap
    * primitive (§7.6.4.3.3: /UE and /OE hold the 32-byte file key
    * encrypted with the intermediate key, no padding, zero IV). */
  private def aesNoPadZeroIv(key: Array[Byte], data: Array[Byte],
                             encrypt: Boolean): Array[Byte] = {
    if (data.length % 16 != 0) fail("bad AES key-wrap length")
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
           else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    c.doFinal(data)
  }

  /** The V5 password hash. /R 5 (the deprecated Adobe ExtensionLevel 3
    * scheme): a single SHA-256 over (password ‖ salt ‖ udata). /R 6
    * (ISO 32000-2 §7.6.4.3.4 Algorithm 2.B): SHA-256 seeded, then ≥64
    * rounds of AES-128-CBC(K[0..16), iv=K[16..32)) over 64 repetitions
    * of (password ‖ K ‖ udata), the digest rotating among
    * SHA-256/384/512 by E's leading 16 bytes mod 3 — computed as the
    * BYTE SUM mod 3, identical because 256 ≡ 1 (mod 3) — until past
    * round 64 the last byte of E is ≤ round − 32. `udata` is empty for
    * the user-password hashes and the 48-byte /U for the owner ones. */
  private[graft] def hashV5(pwd: Array[Byte], salt: Array[Byte],
                            udata: Array[Byte], r: Int): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    if (r == 5) return k
    // one Cipher + three digests REUSED across the ~64-250 rounds
    // (init/reset are cheap; getInstance is a provider lookup that
    // multiplied into whole seconds across a corpus — bench-caught r13)
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    val digests = Array("SHA-256", "SHA-384", "SHA-512")
      .map(java.security.MessageDigest.getInstance(_))
    var round = 0
    var lastE: Array[Byte] = null
    while (round < 64 || (lastE(lastE.length - 1) & 0xFF) > round - 32) {
      val unit = pwd ++ k ++ udata
      val k1 = new Array[Byte](unit.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(unit, 0, k1, i * unit.length, unit.length)
        i += 1
      }
      cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      val e = cipher.doFinal(k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xFF; i += 1 }
      val d = digests(sum % 3)
      d.reset()
      k = d.digest(e)
      lastE = e
      round += 1
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** Algorithm 2 (§7.6.3.3): the file encryption key from a (padded)
    * password, /O, /P, the first /ID element and, for R4 with
    * unencrypted metadata, 4×FF. */
  private def baseKey(pwd: Array[Byte], o: Array[Byte], p: Int,
                      id0: Array[Byte], r: Int, keyLen: Int,
                      encryptMetadata: Boolean): Array[Byte] = {
    val pLe = Array[Byte]((p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte)
    val extra =
      if (r >= 4 && !encryptMetadata) Array.fill(4)(0xFF.toByte)
      else Array.empty[Byte]
    var h = md5(padPassword(pwd), o, pLe, id0, extra)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(keyLen)); i += 1 }
    }
    h.take(keyLen)
  }

  /** Algorithm 3 (§7.6.3.4): the /O value from owner+user passwords. */
  private def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte],
                       r: Int, keyLen: Int): Array[Byte] = {
    var h = md5(padPassword(ownerPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(keyLen)); i += 1 }
    }
    val k = h.take(keyLen)
    var o = rc4(k, padPassword(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(k.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4/5 (§7.6.3.4): the /U value for a given file key. */
  private def computeU(key: Array[Byte], r: Int, id0: Array[Byte]): Array[Byte] =
    if (r == 2) rc4(key, PdfPad)
    else {
      var u = rc4(key, md5(PdfPad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ Array.fill(16)(0.toByte) // arbitrary 16-byte tail per spec
    }

  /** Algorithm 1 (§7.6.2): the per-object key — MD5 of the file key,
    * the low object/generation bytes, and (AESV2) the `sAlT` suffix. */
  private def objectKey(base: Array[Byte], num: Int, gen: Int,
                        aes: Boolean): Array[Byte] = {
    val ext = Array[Byte]((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
      ((num >> 16) & 0xFF).toByte, (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte)
    val salt =
      if (aes) Array(0x73, 0x41, 0x6C, 0x54).map(_.toByte)
      else Array.empty[Byte]
    md5(base, ext, salt).take(math.min(base.length + 5, 16))
  }

  /** Standard security handler (§7.6.3), /V 1–4 /R 2–4, EMPTY USER
    * PASSWORD only — the owner-restrictions-only documents every viewer
    * opens without credentials (a large share of real crawl PDFs).
    * Construction FAILS with [[PdfError]] on anything else — a
    * non-Standard handler, V5/R5–6 (AES-256), a custom crypt filter, or
    * a real (non-empty) user password — and the callers keep flagging
    * `encrypted`, preserving the quarantine stance. Only STREAMS are
    * decrypted: the text extractor consumes no document-level strings
    * (page text lives inside content streams, which decrypt whole;
    * strings inside object streams are never separately encrypted,
    * §7.5.7). */
  private final class StdDecryptor(enc: PDict, id0: Array[Byte],
                                   res: Obj => Obj) {
    private def num(k: String, dflt: Int): Int =
      res(enc.get(k).getOrElse(PNull)) match {
        case PNum(n) => n.toLong.toInt
        case PNull => dflt
        case _ => fail(s"bad /Encrypt /$k")
      }
    private def str32(k: String): Array[Byte] =
      res(enc.get(k).getOrElse(PNull)) match {
        case PStr(b) if b.length >= 32 => b.take(32)
        case _ => fail(s"bad /Encrypt /$k")
      }
    res(enc.get("Filter").getOrElse(PNull)) match {
      case PName("Standard") => ()
      case _ => fail("unsupported security handler")
    }
    private val v = num("V", 0)
    private val r = num("R", 2)
    if (!((v >= 1 && v <= 4 && r >= 2 && r <= 4) ||
          (v == 5 && (r == 5 || r == 6))))
      fail(s"unsupported encryption V=$v R=$r")
    /** (aes, identity): V4/V5 route streams through a named crypt
      * filter — /StmF Identity means "not encrypted at this layer".
      * V4 admits AESV2 (AES-128) or V2 (RC4); V5 admits AESV3
      * (AES-256) only, per ISO 32000-2 Table 27. */
    private val (aes, identity) =
      if (v < 4) (false, false)
      else {
        val stmF = res(enc.get("StmF").getOrElse(PNull)) match {
          case PName(n) => n
          case PNull => "Identity"
          case _ => fail("bad /StmF")
        }
        if (stmF == "Identity") (false, true)
        else {
          val cfm = res(enc.get("CF").getOrElse(PNull)) match {
            case cf: PDict => res(cf.get(stmF).getOrElse(PNull)) match {
              case d: PDict => res(d.get("CFM").getOrElse(PNull)) match {
                case PName(m) => m
                case _ => fail("bad /CFM")
              }
              case _ => fail(s"crypt filter /$stmF missing")
            }
            case _ => fail("bad /CF")
          }
          (cfm, v) match {
            case ("AESV2", 4) => (true, false)
            case ("V2", 4) => (false, false)
            case ("AESV3", 5) => (true, false)
            case other => fail(s"unsupported crypt filter $other")
          }
        }
      }

    /** The file encryption key. V1–4: Algorithm 2 from the padded EMPTY
      * user password, verified via Algorithm 6 against /U. V5 (/R 5–6,
      * r13): §7.6.4.3.3 — validate hash(pwd, validation salt) against
      * U[0..32), derive the intermediate key from the KEY salt, unwrap
      * the 32-byte file key from /UE (AES-256-CBC, zero IV, no pad),
      * then check the /Perms integrity seal ("adb" at bytes 9–11 under
      * AES-256-ECB) so a torn /Encrypt can't silently half-decrypt. */
    private val key: Array[Byte] =
      if (v == 5) {
        val uVal = str32("U") // hash half; salts read below from the full value
        val uFull = res(enc.get("U").getOrElse(PNull)) match {
          case PStr(b) if b.length >= 48 => b
          case _ => fail("bad /Encrypt /U for V5")
        }
        val ue = res(enc.get("UE").getOrElse(PNull)) match {
          case PStr(b) if b.length >= 32 => b.take(32)
          case _ => fail("bad /Encrypt /UE")
        }
        val vSalt = java.util.Arrays.copyOfRange(uFull, 32, 40)
        val kSalt = java.util.Arrays.copyOfRange(uFull, 40, 48)
        val empty = Array.empty[Byte]
        // empty USER password only, as for V1-4 — anything else flags
        if (!java.util.Arrays.equals(hashV5(empty, vSalt, empty, r), uVal))
          fail("user password required")
        val iKey = hashV5(empty, kSalt, empty, r)
        val fileKey = aesNoPadZeroIv(iKey, ue, encrypt = false)
        res(enc.get("Perms").getOrElse(PNull)) match {
          case PStr(perms) if perms.length >= 16 =>
            val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
            c.init(javax.crypto.Cipher.DECRYPT_MODE,
              new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
            val plain = c.doFinal(perms.take(16))
            if (plain(9) != 'a' || plain(10) != 'd' || plain(11) != 'b')
              fail("bad /Perms seal")
          case PNull => () // absent: tolerated (the key already verified via /U)
          case _ => fail("bad /Perms")
        }
        fileKey
      } else {
        val keyLen = {
          val bits = num("Length", 40)
          val n = if (r == 2) 5 else bits / 8
          if (n < 5 || n > 16) fail(s"bad key length $bits")
          n
        }
        val oVal = str32("O")
        val uVal = str32("U")
        val p = num("P", -1)
        val encryptMetadata =
          res(enc.get("EncryptMetadata").getOrElse(PNull)) match {
            case PBool(b) => b
            case _ => true
          }
        val k = baseKey(Array.empty, oVal, p, id0, r, keyLen, encryptMetadata)
        // Algorithm 6: verify the EMPTY user password — anything else is
        // a genuinely password-protected document and must keep flagging
        val uOk =
          if (r == 2) java.util.Arrays.equals(computeU(k, r, id0), uVal)
          else computeU(k, r, id0).take(16).sameElements(uVal.take(16))
        if (!uOk) fail("user password required")
        k
      }

    def decrypt(data: Array[Byte], objNum: Int, gen: Int): Array[Byte] =
      if (identity) data
      // V5: the FILE key encrypts every stream directly — no per-object
      // key derivation (§7.6.4: "the file encryption key is used")
      else if (v == 5) aesCbcDecrypt(key, data)
      else if (aes) aesCbcDecrypt(objectKey(key, objNum, gen, aes = true), data)
      else rc4(objectKey(key, objNum, gen, aes = false), data)
  }

  // --------------------------------------------------------- document

  /** One loaded document: xref map + trailer + a cycle-capped resolver.
    * Throws [[PdfError]] on structural corruption — [[probe]] /
    * [[extractText]] own the catch. */
  private final class Doc(bytes: Array[Byte], maxStreamBytes: Int) {
    /** objNum → positive: byte offset of `N G obj`;
      * negative: -(objstm objNum) — position looked up in the stream.
      * Boxed values: a primitive-Long map would unbox a missing key's
      * null to 0L and silently resolve absent objects at offset 0. */
    private val offsets = new java.util.HashMap[Int, java.lang.Long]()
    /** objNum → index within its object stream (parallel to negative
      * offsets). */
    private val objStmIndex = new java.util.HashMap[Int, Int]()
    var trailer: PDict = PDict(Map.empty)
    /** PStream → [objNum, gen] of the indirect object that carries it —
      * per-object decryption keys need the owner's identity (§7.6.2
      * Algorithm 1). Identity-keyed: streams are compared by instance. */
    private val streamIds = new java.util.IdentityHashMap[PStream, Array[Int]]()
    /** None = unencrypted. Some(Right) = standard handler, empty user
      * password, streams decrypt transparently. Some(Left) = /Encrypt
      * present but unreadable (password-protected / unsupported scheme)
      * — callers flag `encrypted`. Declared BEFORE locate() runs so
      * xref-stream decoding during the xref walk sees None: xref
      * streams are never encrypted (§7.5.8.2) and the key derivation
      * needs the fully merged trailer anyway. */
    private var decryptor: Option[Either[String, StdDecryptor]] = None

    locate()
    decryptor = trailer.get("Encrypt").map { e =>
      try {
        val encDict = resolve(e) match {
          case d: PDict => d
          case _ => fail("bad /Encrypt")
        }
        val id0 = resolve(trailer.get("ID").getOrElse(PNull)) match {
          case PArr(items) if items.nonEmpty => resolve(items.head) match {
            case PStr(b) => b
            case _ => Array.empty[Byte]
          }
          case _ => Array.empty[Byte]
        }
        Right(new StdDecryptor(encDict, id0, resolve))
      } catch {
        // flag-never-crash: ANY failure (unsupported scheme, wrong
        // password, malformed dict, crypto-layer error) degrades to the
        // pre-r12 behavior — the document stays quarantined `encrypted`
        case scala.util.control.NonFatal(_) => Left("encrypted")
      }
    }

    /** /Encrypt present but not decryptable with the empty user
      * password — the extractor's flag condition. */
    def encryptedUnreadable: Boolean = decryptor.exists(_.isLeft)

    private def locate(): Unit = {
      // startxref: last 2 KiB
      val tailFrom = math.max(0, bytes.length - 2048)
      val sx = lastIndexOfKeyword(bytes, tailFrom, bytes.length, "startxref")
      if (sx < 0) fail("no startxref")
      val lx = new Lexer(bytes, sx + 9, content = false)
      val off = lx.next() match {
        case PNum(n) if n >= 0 && n < bytes.length => n.toLong
        case _ => fail("bad startxref offset")
      }
      var next = off
      var hops = 0
      while (next >= 0) {
        hops += 1
        if (hops > 64) fail("xref /Prev chain too long")
        next = loadXrefSection(next)
      }
    }

    /** Load one xref section (table or stream); returns /Prev offset or
      * -1. Earlier-loaded (newer) entries win. */
    private def loadXrefSection(off: Long): Long = {
      val lex = new Lexer(bytes, off.toInt, content = false)
      lex.skipWs()
      if (lex.p + 4 <= bytes.length && bytes(lex.p) == 'x' &&
          bytes(lex.p + 1) == 'r' && bytes(lex.p + 2) == 'e' &&
          bytes(lex.p + 3) == 'f') {
        lex.p += 4
        // classic table: subsections of `start count` then 20-byte rows
        var done = false
        while (!done) {
          lex.skipWs()
          if (lex.cur == 't') { // trailer
            lex.expectKeyword("trailer")
            val t = lex.next() match {
              case d: PDict => d
              case _ => fail("bad trailer")
            }
            mergeTrailer(t)
            return t.get("Prev") match {
              case Some(PNum(n)) if n >= 0 => n.toLong
              case _ => -1L
            }
          }
          val start = lex.next() match {
            case PNum(n) if n >= 0 => n.toInt
            case _ => fail("bad xref subsection start")
          }
          val count = lex.next() match {
            case PNum(n) if n >= 0 && n <= 8388608 => n.toInt
            case _ => fail("bad xref subsection count")
          }
          var i = 0
          while (i < count) {
            lex.skipWs()
            val o10 = readDigits(lex)
            lex.skipWs()
            readDigits(lex) // generation (unused: newest-wins layout)
            lex.skipWs()
            val t = lex.cur
            lex.p += 1
            val num = start + i
            if (t == 'n') {
              if (!offsets.containsKey(num)) offsets.put(num, o10)
            } else if (t != 'f') fail(s"bad xref entry type '$t'")
            i += 1
          }
          done = false // loop back: next subsection or trailer
        }
        -1L
      } else {
        // xref STREAM: `N G obj << /Type /XRef ... >> stream`
        val obj = parseIndirectAt(off.toInt)
        val st = obj match {
          case s: PStream => s
          case _ => fail("xref offset is not a table or stream")
        }
        val data = decodeStream(st)
        val w = st.dict.get("W") match {
          case Some(PArr(items)) if items.length >= 3 =>
            items.take(3).map { case PNum(n) if n >= 0 && n <= 8 => n.toInt
                                case _ => fail("bad /W") }
          case _ => fail("xref stream missing /W")
        }
        val size = st.dict.get("Size") match {
          case Some(PNum(n)) if n > 0 => n.toInt
          case _ => fail("xref stream missing /Size")
        }
        val index: Seq[(Int, Int)] = st.dict.get("Index") match {
          case Some(PArr(items)) if items.length % 2 == 0 =>
            items.grouped(2).map {
              case Vector(PNum(a), PNum(b)) if a >= 0 && b >= 0 => (a.toInt, b.toInt)
              case _ => fail("bad /Index")
            }.toSeq
          case None => Seq((0, size))
          case _ => fail("bad /Index")
        }
        val rowLen = w.sum
        if (rowLen <= 0) fail("zero-width xref rows")
        var pos = 0
        index.foreach { case (start, count) =>
          var i = 0
          while (i < count) {
            if (pos + rowLen > data.length) fail("xref stream truncated")
            var f = 0
            val fields = new Array[Long](3)
            while (f < 3) {
              var v = 0L
              var k = 0
              while (k < w(f)) { v = (v << 8) | (data(pos) & 0xFF); pos += 1; k += 1 }
              fields(f) = if (w(f) == 0 && f == 0) 1L else v // default type 1
              f += 1
            }
            val num = start + i
            fields(0) match {
              case 0 => // free
              case 1 => if (!offsets.containsKey(num)) offsets.put(num, fields(1))
              case 2 =>
                if (!offsets.containsKey(num)) {
                  offsets.put(num, -fields(1))
                  objStmIndex.put(num, fields(2).toInt)
                }
              case _ => // unknown type: spec says treat as null-ref
            }
            i += 1
          }
        }
        mergeTrailer(st.dict)
        st.dict.get("Prev") match {
          case Some(PNum(n)) if n >= 0 => n.toLong
          case _ => -1L
        }
      }
    }

    private def mergeTrailer(t: PDict): Unit =
      // first (newest) section wins per key
      trailer = PDict(t.m ++ trailer.m)

    /** Digit run (spec says exactly 10/5 chars; short runs from sloppy
      * writers parse too — strictness here only loses real documents). */
    private def readDigits(lex: Lexer): Long = {
      var v = 0L
      var i = 0
      while (lex.cur >= '0' && lex.cur <= '9') {
        v = v * 10 + (lex.cur - '0')
        lex.p += 1
        i += 1
        if (i > 10) fail("xref digit run too long")
      }
      if (i == 0) fail("bad xref digits")
      v
    }

    /** Parse `N G obj <body> endobj` at a byte offset. */
    private def parseIndirectAt(off: Int): Obj = {
      if (off < 0 || off >= bytes.length) fail(s"object offset $off out of range")
      val lex = new Lexer(bytes, off, content = false)
      val n = lex.next() match { case PNum(x) => x.toInt; case _ => fail("bad obj header") }
      val g = lex.next() match { case PNum(x) => x.toInt; case _ => fail("bad obj header") }
      lex.expectKeyword("obj")
      val o = lex.next()
      if (o == null) fail("EOF in object body")
      o match {
        case st: PStream => streamIds.put(st, Array(n, g))
        case _ => ()
      }
      o
    }

    private var resolves = 0

    /** Resolve references to their objects (depth/count capped). */
    def resolve(o: Obj): Obj = resolve(o, 0)

    private def resolve(o: Obj, depth: Int): Obj = o match {
      case PRef(num, _) =>
        if (depth > 32) fail("reference chain too deep")
        resolves += 1
        if (resolves > 200000) fail("object resolution flood")
        val off = offsets.get(num)
        if (off == null) PNull
        else if (off >= 0) resolve(parseIndirectAt(off.toLong.toInt), depth + 1)
        else resolve(fromObjStm(-off.toLong.toInt, num), depth + 1)
      case other => other
    }

    /** Decoded object-stream cache: an ObjStm holding N objects must
      * inflate once, not N times. */
    private val objStmCache = new java.util.HashMap[Int, (Array[Byte], Int, Array[Int], Array[Int])]()

    /** Object `num` out of object stream `stmNum` (§7.5.7: header of
      * N (objnum, offset) pairs, bodies from /First). */
    private def fromObjStm(stmNum: Int, num: Int): Obj = {
      var entry = objStmCache.get(stmNum)
      if (entry == null) {
        val off = offsets.get(stmNum)
        if (off == null || off < 0) fail(s"object stream $stmNum unresolvable")
        val st = parseIndirectAt(off.toLong.toInt) match {
          case s: PStream => s
          case _ => fail(s"object $stmNum is not a stream")
        }
        val n = st.dict.get("N") match {
          case Some(PNum(v)) if v >= 0 && v <= 65536 => v.toInt
          case _ => fail("ObjStm missing /N")
        }
        val first = st.dict.get("First") match {
          case Some(PNum(v)) if v >= 0 => v.toInt
          case _ => fail("ObjStm missing /First")
        }
        val data = decodeStream(st)
        val nums = new Array[Int](n)
        val offs = new Array[Int](n)
        val lex = new Lexer(data, 0, math.min(first, data.length), content = false)
        var i = 0
        while (i < n) {
          lex.next() match { case PNum(v) => nums(i) = v.toInt; case _ => fail("bad ObjStm header") }
          lex.next() match { case PNum(v) => offs(i) = v.toInt; case _ => fail("bad ObjStm header") }
          i += 1
        }
        entry = (data, first, nums, offs)
        objStmCache.put(stmNum, entry)
        if (objStmCache.size > 1024) fail("object stream flood")
      }
      val (data, first, nums, offs) = entry
      var i = 0
      while (i < nums.length) {
        if (nums(i) == num) {
          val start = first + offs(i)
          if (start < 0 || start >= data.length) fail("ObjStm offset out of range")
          val lex = new Lexer(data, start, content = false)
          val o = lex.next()
          if (o == null) fail("EOF in ObjStm object")
          return o
        }
        i += 1
      }
      PNull
    }

    /** Apply the stream's filter chain. Unsupported filters throw (the
      * caller flags). */
    def decodeStream(st: PStream): Array[Byte] = {
      val filters: Seq[String] = resolve(st.dict.get("Filter").getOrElse(PNull)) match {
        case PNull => Seq.empty
        case PName(n) => Seq(n)
        case PArr(items) => items.map {
          case PName(n) => n
          case o => resolve(o) match { case PName(n) => n; case _ => fail("bad /Filter") }
        }
        case _ => fail("bad /Filter")
      }
      val parms: Seq[Option[PDict]] = resolve(st.dict.get("DecodeParms").getOrElse(PNull)) match {
        case PNull => Seq.fill(filters.length)(None)
        case d: PDict => Some(d) +: Seq.fill(math.max(0, filters.length - 1))(None)
        case PArr(items) => items.map(o => resolve(o) match {
          case d: PDict => Some(d); case _ => None
        }).padTo(filters.length, None)
        case _ => Seq.fill(filters.length)(None)
      }
      var data = st.raw
      // decrypt BEFORE the filter chain (§7.6.2: encryption applies to
      // the stream bytes as stored). Xref streams are never encrypted
      // (§7.5.8.2) — and decode during locate() anyway, before the
      // decryptor exists. Objects INSIDE an object stream are not
      // separately encrypted (§7.5.7): the ObjStm decrypts here, whole.
      decryptor match {
        case Some(Right(d))
            if !st.dict.get("Type").map(resolve).contains(PName("XRef")) =>
          val ids = streamIds.get(st)
          if (ids == null) fail("encrypted stream with unknown object id")
          data = d.decrypt(data, ids(0), ids(1))
        case _ => ()
      }
      filters.zip(parms).foreach { case (f, pm) =>
        f match {
          case "FlateDecode" | "Fl" =>
            data = inflate(data, maxStreamBytes)
            pm.foreach { d =>
              val pred = d.get("Predictor").map(resolve) match {
                case Some(PNum(n)) => n.toInt; case _ => 1
              }
              val cols = d.get("Columns").map(resolve) match {
                case Some(PNum(n)) => n.toInt; case _ => 1
              }
              data = unpredict(data, pred, cols)
            }
          case "ASCIIHexDecode" | "AHx" => data = asciiHexDecode(data)
          case "ASCII85Decode" | "A85" => data = ascii85Decode(data)
          case "RunLengthDecode" | "RL" =>
            data = runLengthDecode(data, maxStreamBytes)
          case "LZWDecode" | "LZW" =>
            val early = pm.flatMap(_.get("EarlyChange").map(resolve)) match {
              case Some(PNum(n)) => n.toInt
              case _ => 1
            }
            data = lzwDecode(data, maxStreamBytes, early)
            pm.foreach { d =>
              val pred = d.get("Predictor").map(resolve) match {
                case Some(PNum(n)) => n.toInt; case _ => 1
              }
              val cols = d.get("Columns").map(resolve) match {
                case Some(PNum(n)) => n.toInt; case _ => 1
              }
              data = unpredict(data, pred, cols)
            }
          case other => fail(s"unsupported filter $other")
        }
      }
      data
    }
  }

  private def lastIndexOfKeyword(b: Array[Byte], from: Int, end: Int,
                                 kw: String): Int = {
    val k = kw.getBytes("ISO-8859-1")
    var i = end - k.length
    while (i >= from) {
      var j = 0
      while (j < k.length && b(i + j) == k(j)) j += 1
      if (j == k.length) return i
      i -= 1
    }
    -1
  }

  // -------------------------------------------------------- page walk

  /** Page leaves in document order with inherited Resources/MediaBox
    * (§7.7.3.4 inheritable attributes). Capped at `maxPages`. */
  private def collectPages(doc: Doc, maxPages: Int): Vector[(PDict, Option[PDict], Option[PArr])] = {
    val root = doc.resolve(doc.trailer.get("Root").getOrElse(fail("no /Root"))) match {
      case d: PDict => d
      case _ => fail("bad catalog")
    }
    val pagesRoot = doc.resolve(root.get("Pages").getOrElse(fail("no /Pages"))) match {
      case d: PDict => d
      case _ => fail("bad pages root")
    }
    val out = Vector.newBuilder[(PDict, Option[PDict], Option[PArr])]
    var n = 0
    def walk(node: PDict, res: Option[PDict], box: Option[PArr], depth: Int): Unit = {
      if (depth > 64) fail("page tree too deep")
      val myRes = node.get("Resources").map(doc.resolve) match {
        case Some(d: PDict) => Some(d); case _ => res
      }
      val myBox = node.get("MediaBox").map(doc.resolve) match {
        case Some(a: PArr) => Some(a); case _ => box
      }
      // leaf test: /Type /Page, or (lenient) no /Kids at all — sloppy
      // writers omit /Type and strictness only loses real documents
      val kids = node.get("Kids").map(doc.resolve)
      val isLeaf = doc.resolve(node.get("Type").getOrElse(PNull)) match {
        case PName("Page") => true
        case PName("Pages") => false
        case _ => kids.isEmpty
      }
      if (isLeaf) {
        n += 1
        if (n > maxPages) fail(s"page count exceeds cap $maxPages")
        out += ((node, myRes, myBox))
      } else kids match {
        case Some(PArr(ks)) => ks.foreach { k =>
          doc.resolve(k) match {
            case d: PDict => walk(d, myRes, myBox, depth + 1)
            case _ => fail("bad /Kids entry")
          }
        }
        case _ => fail("pages node without /Kids")
      }
    }
    walk(pagesRoot, None, None, 0)
    out.result()
  }

  // --------------------------------------------------- text extraction

  /** WinAnsiEncoding (Annex D.2): Latin-1 except 0x80–0x9F, which carry
    * the cp1252 punctuation/symbol set. Unmapped codes drop. */
  private val winAnsiHigh: Array[Char] = {
    val a = new Array[Char](32)
    java.util.Arrays.fill(a, ' ')
    a(0x00) = '€'; a(0x02) = '‚'; a(0x03) = 'ƒ'
    a(0x04) = '„'; a(0x05) = '…'; a(0x06) = '†'
    a(0x07) = '‡'; a(0x08) = 'ˆ'; a(0x09) = '‰'
    a(0x0A) = 'Š'; a(0x0B) = '‹'; a(0x0C) = 'Œ'
    a(0x0E) = 'Ž'; a(0x11) = '‘'; a(0x12) = '’'
    a(0x13) = '“'; a(0x14) = '”'; a(0x15) = '•'
    a(0x16) = '–'; a(0x17) = '—'; a(0x18) = '˜'
    a(0x19) = '™'; a(0x1A) = 'š'; a(0x1B) = '›'
    a(0x1C) = 'œ'; a(0x1E) = 'ž'; a(0x1F) = 'Ÿ'
    a
  }

  private def appendWinAnsi(c: Int, sb: java.lang.StringBuilder): Unit = {
    if (c >= 0x20 && c <= 0x7E) sb.append(c.toChar)
    else if (c >= 0xA0) sb.append(c.toChar) // Latin-1 block
    else if (c >= 0x80 && c <= 0x9F) {
      val ch = winAnsiHigh(c - 0x80)
      if (ch != ' ') sb.append(ch)
    } else if (c == '\n' || c == '\r' || c == '\t') sb.append(c.toChar)
  }

  private def decodeWinAnsi(s: Array[Byte], sb: java.lang.StringBuilder): Unit = {
    var i = 0
    while (i < s.length) { appendWinAnsi(s(i) & 0xFF, sb); i += 1 }
  }

  /** Extraction result: one string per page; `flagged` = some content
    * was skipped (composite font, unsupported filter) so the text is a
    * supported-subset view, not a claim of completeness. */
  final case class PdfText(ok: Boolean, nPages: Int, pages: Vector[String],
                           flagged: Boolean, reason: String)

  /** Extract page texts. Never throws: failures come back as
    * `ok = false` with a reason (`not-pdf` / `encrypted` / `corrupt`). */
  def extractText(bytes: Array[Byte], maxStreamBytes: Int = 16 << 20,
                  maxPages: Int = 100000): PdfText = {
    if (bytes == null || bytes.length < 8 ||
        bytes(0) != '%' || bytes(1) != 'P' || bytes(2) != 'D' ||
        bytes(3) != 'F' || bytes(4) != '-')
      return PdfText(ok = false, 0, Vector.empty, flagged = false, "not-pdf")
    try {
      val doc = new Doc(bytes, maxStreamBytes)
      // standard-handler documents with an EMPTY user password (owner
      // restrictions only) decrypt transparently and extract below;
      // password-protected / unsupported schemes keep the quarantine flag
      if (doc.encryptedUnreadable)
        return PdfText(ok = false, 0, Vector.empty, flagged = true, "encrypted")
      val pages = collectPages(doc, maxPages)
      var flagged = false
      val texts = pages.map { case (page, res, _) =>
        // per-font decode plan for this page: /ToUnicode CMaps (the
        // modern generator's text-recovery channel, §9.10.3) decode
        // both simple fonts and Identity-H/V composite (Type0/CID)
        // fonts; a composite font WITHOUT one stays flagged
        val fonts: Map[String, FontDec] = res.flatMap(_.get("Font")).map(doc.resolve) match {
          case Some(fd: PDict) => fd.m.map { case (name, fref) =>
            val dec = doc.resolve(fref) match {
              case f: PDict =>
                val toUni: Map[Int, String] = doc.resolve(f.get("ToUnicode").getOrElse(PNull)) match {
                  case st: PStream =>
                    try parseToUnicode(doc.decodeStream(st))
                    catch { case _: PdfError => flagged = true; Map.empty }
                  case _ => Map.empty
                }
                doc.resolve(f.get("Subtype").getOrElse(PNull)) match {
                  case PName("Type0") =>
                    val identity = doc.resolve(f.get("Encoding").getOrElse(PNull)) match {
                      case PName(e) => e == "Identity-H" || e == "Identity-V"
                      case _ => false
                    }
                    if (identity && toUni.nonEmpty)
                      FontDec(supported = true, twoByte = true, toUni)
                    else FontDec(supported = false, twoByte = true, Map.empty)
                  case _ =>
                    // simple font: /Encoding name or dict with
                    // /BaseEncoding + /Differences (§9.6.5)
                    var asciiOnly = false
                    var diff = Map.empty[Int, String]
                    var unknown = Set.empty[Int]
                    def baseName(n: String): Unit =
                      // MacRoman's high range is a spec table this
                      // extractor does not fabricate — ASCII only there
                      if (n == "MacRomanEncoding") asciiOnly = true
                    doc.resolve(f.get("Encoding").getOrElse(PNull)) match {
                      case PName(n) => baseName(n)
                      case ed: PDict =>
                        doc.resolve(ed.get("BaseEncoding").getOrElse(PNull)) match {
                          case PName(n) => baseName(n)
                          case _ => ()
                        }
                        doc.resolve(ed.get("Differences").getOrElse(PNull)) match {
                          case PArr(items) =>
                            var code = 0
                            items.foreach {
                              case PNum(n) => code = n.toInt
                              case PName(g) =>
                                AglSubset.get(g) match {
                                  case Some(t) => diff += code -> t
                                  case None => unknown += code
                                }
                                code += 1
                              case _ => ()
                            }
                          case _ => ()
                        }
                      case _ => ()
                    }
                    FontDec(supported = true, twoByte = false, toUni,
                      diff, unknown, asciiOnly)
                }
              case _ => DefaultFont
            }
            name -> dec
          }
          case _ => Map.empty[String, FontDec]
        }
        val content: Array[Byte] = doc.resolve(page.get("Contents").getOrElse(PNull)) match {
          case st: PStream =>
            try doc.decodeStream(st)
            catch { case _: PdfError => flagged = true; Array.emptyByteArray }
          case PArr(items) =>
            val out = new java.io.ByteArrayOutputStream()
            items.foreach { o =>
              doc.resolve(o) match {
                case st: PStream =>
                  try { out.write(doc.decodeStream(st)); out.write('\n') }
                  catch { case _: PdfError => flagged = true }
                case _ => flagged = true
              }
              if (out.size > maxStreamBytes) fail("page content exceeds cap")
            }
            out.toByteArray
          case PNull => Array.emptyByteArray
          case _ => flagged = true; Array.emptyByteArray
        }
        val (text, pageFlagged) = extractFromContent(content, fonts)
        flagged ||= pageFlagged
        text
      }
      PdfText(ok = true, pages.length, texts, flagged, null)
    } catch {
      // recursion is depth-capped (64/32), so Exception covers every
      // corruption path without swallowing VM Errors
      case e: Exception =>
        if (sys.props.contains("graft.pdf.debug")) e.printStackTrace()
        PdfText(ok = false, 0, Vector.empty, flagged = false, "corrupt")
    }
  }

  /** Decode plan for one font: 1- or 2-byte codes; per-code priority is
    * ToUnicode, then /Differences, then the base encoding (WinAnsi, or
    * ASCII-only for a MacRoman base whose high range this extractor
    * does not fabricate). `unknownCodes` are /Differences entries whose
    * glyph name is outside the AGL subset — showing one flags.
    * Unsupported = show ops skip and flag. */
  private final case class FontDec(supported: Boolean, twoByte: Boolean,
                                   toUni: Map[Int, String],
                                   diff: Map[Int, String] = Map.empty,
                                   unknownCodes: Set[Int] = Set.empty,
                                   asciiOnlyBase: Boolean = false)
  private val DefaultFont = FontDec(supported = true, twoByte = false, Map.empty)

  /** Adobe Glyph List subset (public AGL): the standard-encoding names
    * a /Differences array uses in practice — ASCII, the common
    * typographic set, and the frequent Latin accents. Names outside
    * the subset flag rather than guess. */
  private[graft] val AglSubset: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    Seq("space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9", "colon" -> ":", "semicolon" -> ";",
      "less" -> "<", "equal" -> "=", "greater" -> ">", "question" -> "?",
      "at" -> "@", "bracketleft" -> "[", "backslash" -> "\\",
      "bracketright" -> "]", "asciicircum" -> "^", "underscore" -> "_",
      "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "ellipsis" -> "…", "fi" -> "ﬁ", "fl" -> "ﬂ",
      "copyright" -> "©", "registered" -> "®",
      "trademark" -> "™", "degree" -> "°",
      "eacute" -> "é", "egrave" -> "è",
      "ecircumflex" -> "ê", "agrave" -> "à",
      "aacute" -> "á", "ccedilla" -> "ç", "ntilde" -> "ñ",
      "adieresis" -> "ä", "odieresis" -> "ö",
      "udieresis" -> "ü", "Adieresis" -> "Ä",
      "Odieresis" -> "Ö", "Udieresis" -> "Ü",
      "germandbls" -> "ß", "oslash" -> "ø", "aring" -> "å",
      "ae" -> "æ", "oe" -> "œ", "Euro" -> "€",
      "sterling" -> "£", "yen" -> "¥", "cent" -> "¢",
      "section" -> "§", "paragraph" -> "¶",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "guillemotleft" -> "«", "guillemotright" -> "»")
      .foreach(b += _)
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    b.result()
  }

  /** ToUnicode CMap parse (§9.10.3 / the Adobe CMap text format): only
    * the `beginbfchar`/`beginbfrange` sections carry mappings — src
    * codes are hex strings (their byte length is the code width), dst
    * is UTF-16BE text; a bfrange increments the LAST UTF-16 code unit
    * across the range, or lists explicit dst strings in an array.
    * Bounded: ranges cap at 65536 codes, the whole map at 1<<20
    * entries (a crafted CMap must not allocate unboundedly). */
  private[graft] def parseToUnicode(data: Array[Byte]): Map[Int, String] = {
    val lex = new Lexer(data, 0, content = true)
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    def codeOf(b: Array[Byte]): Int = {
      if (b.length == 0 || b.length > 4) fail("bad CMap code width")
      b.foldLeft(0)((a, x) => (a << 8) | (x & 0xFF))
    }
    def strOf(b: Array[Byte]): String = new String(b, "UTF-16BE")
    def guard(): Unit = if (m.size > (1 << 20)) fail("CMap too large")
    var o = lex.next()
    while (o != null) {
      o match {
        case POp("beginbfchar") =>
          var a = lex.next()
          while (a != null && a != POp("endbfchar")) {
            (a, lex.next()) match {
              case (PStr(src), PStr(dst)) => m(codeOf(src)) = strOf(dst); guard()
              case _ => fail("bad bfchar pair")
            }
            a = lex.next()
          }
        case POp("beginbfrange") =>
          var a = lex.next()
          while (a != null && a != POp("endbfrange")) {
            (a, lex.next(), lex.next()) match {
              case (PStr(lo), PStr(hi), PStr(dst0)) =>
                val l = codeOf(lo); val h = codeOf(hi)
                if (h < l || h - l >= 65536) fail("bad bfrange extent")
                val base = strOf(dst0)
                if (base.isEmpty) fail("empty bfrange dst")
                var i = 0
                while (i <= h - l) {
                  if (i == 0) m(l) = base
                  else {
                    val cs = base.toCharArray
                    cs(cs.length - 1) = (cs(cs.length - 1) + i).toChar
                    m(l + i) = new String(cs)
                  }
                  i += 1
                }
                guard()
              case (PStr(lo), _hi: PStr, PArr(items)) =>
                val l = codeOf(lo)
                items.zipWithIndex.foreach {
                  case (PStr(d), i) => m(l + i) = strOf(d)
                  case _ => fail("bad bfrange array entry")
                }
                guard()
              case _ => fail("bad bfrange triple")
            }
            a = lex.next()
          }
        case _ => () // codespace ranges, cid ops, PostScript scaffolding
      }
      o = lex.next()
    }
    m.toMap
  }

  /** Run the documented text-op rules over one page's content bytes. */
  private def extractFromContent(content: Array[Byte],
                                 fonts: Map[String, FontDec]): (String, Boolean) = {
    val sb = new java.lang.StringBuilder(256)
    var flagged = false
    var font = DefaultFont
    def newline(): Unit =
      if (sb.length > 0 && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def show(o: Obj): Unit = o match {
      case PStr(s) =>
        if (!font.supported) flagged = true
        else if (font.twoByte) {
          if (s.length % 2 != 0) flagged = true
          var i = 0
          while (i + 1 < s.length) {
            val code = ((s(i) & 0xFF) << 8) | (s(i + 1) & 0xFF)
            font.toUni.get(code) match {
              case Some(t) => sb.append(t)
              case None => flagged = true // unmapped CID: skip, never guess
            }
            i += 2
          }
        } else {
          // 1-byte codes: ToUnicode > /Differences > base encoding
          var i = 0
          while (i < s.length) {
            val code = s(i) & 0xFF
            font.toUni.get(code) match {
              case Some(t) => sb.append(t)
              case None => font.diff.get(code) match {
                case Some(t) => sb.append(t)
                case None =>
                  if (font.unknownCodes(code)) flagged = true // AGL gap
                  else if (font.asciiOnlyBase && code > 0x7E) flagged = true
                  else appendWinAnsi(code, sb)
              }
            }
            i += 1
          }
        }
      case _ => ()
    }
    val lex = new Lexer(content, 0, content = true)
    val operands = new scala.collection.mutable.ArrayBuffer[Obj](8)
    var o: Obj = null
    try {
      o = lex.next()
      while (o != null) {
        o match {
          case POp(op) =>
            op match {
              case "Tj" => if (operands.nonEmpty) show(operands.last)
              case "TJ" => operands.lastOption.foreach {
                case PArr(items) => items.foreach {
                  case s: PStr => show(s)
                  case _ => () // kerning number
                }
                case _ => ()
              }
              case "'" => newline(); if (operands.nonEmpty) show(operands.last)
              case "\"" => newline(); if (operands.nonEmpty) show(operands.last)
              case "Td" | "TD" | "T*" | "Tm" => newline()
              case "Tf" =>
                // operands: /FontName size
                operands.headOption.foreach {
                  case PName(n) => font = fonts.getOrElse(n, DefaultFont)
                  case _ => ()
                }
              case "BT" | "ET" => ()
              case _ => () // path/graphics ops: no text effect
            }
            operands.clear()
          case other =>
            operands += other
            if (operands.length > 64) operands.remove(0) // runaway operand guard
        }
        o = lex.next()
      }
    } catch {
      // torn content stream: keep what was extracted, flag the page
      case _: PdfError => flagged = true
    }
    (sb.toString, flagged)
  }

  // ------------------------------------------------------------- probe

  /** Header/xref probe (the [[MediaProbe]] discipline): version from
    * the `%PDF-` header, page count + first-page MediaBox from the
    * xref/catalog walk, encrypted flag. `codec` carries
    * `<version>[/encrypted]`, `frames` the page count, width/height the
    * MediaBox extent in points (rounded). No content stream is ever
    * decoded (xref streams excepted — they ARE the index). */
  object Probe extends MediaProbe.Probe {
    def probe(bytes: Array[Byte]): Option[MediaProbe.MediaInfo] = {
      if (bytes == null || bytes.length < 8 ||
          bytes(0) != '%' || bytes(1) != 'P' || bytes(2) != 'D' ||
          bytes(3) != 'F' || bytes(4) != '-') return None
      // version: digits '.' digits directly after "%PDF-"
      val vEnd = {
        var i = 5
        while (i < bytes.length && i < 16 &&
          (bytes(i) == '.' || (bytes(i) >= '0' && bytes(i) <= '9'))) i += 1
        i
      }
      if (vEnd == 5) return None
      val version = new String(bytes, 5, vEnd - 5, "US-ASCII")
      try {
        val doc = new Doc(bytes, 4 << 20)
        val encrypted = doc.trailer.get("Encrypt").isDefined
        var pages = 0
        var w = 0
        var h = 0
        if (!encrypted) {
          // /Count on the pages root is authoritative and O(1); fall
          // back to the leaf walk only to find the first MediaBox
          val leaves = collectPages(doc, maxPages = 1000000)
          pages = leaves.length
          leaves.headOption.flatMap(_._3).foreach {
            case PArr(Vector(PNum(x0), PNum(y0), PNum(x1), PNum(y1))) =>
              w = math.round(math.abs(x1 - x0)).toInt
              h = math.round(math.abs(y1 - y0)).toInt
            case _ => ()
          }
        }
        Some(MediaProbe.MediaInfo("pdf",
          if (encrypted) s"$version/encrypted" else version,
          0L, 0, 0, 0, w, h, pages.toLong))
      } catch { case _: Exception => None }
    }
  }

  // --------------------------------------------------------- operators

  /** Byte ceiling for [[pdfText]]'s small-input rebalance: up to here a
    * one-off shuffle of the blobs is cheaper than serial decryption;
    * beyond it the input has enough bytes that Spark's own byte-sized
    * partitioning is the right parallelism. */
  private val PdfRebalanceMaxBytes = 4L << 30

  private val textSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ok", BooleanType),
    StructField("n_pages", IntegerType),
    StructField("page", IntegerType),
    StructField("text", StringType),
    StructField("flagged", BooleanType),
    StructField("reason", StringType)))

  /** Page-level text extraction over a binary corpus: one row per page
    * for extractable documents, one `ok=false` row (reason
    * `not-pdf`/`encrypted`/`corrupt`) otherwise. Partition-local (no
    * shuffle) — at 100 TB this is a scan-shaped map like the codec
    * operators, and page rows give the downstream text pipeline its
    * natural dedup/quality granularity. One caveat (bench-caught r13):
    * Spark sizes scan partitions by BYTES, while this map's cost is
    * per-document CPU (an AES-256 document pays ~3 ms of Algorithm 2.B
    * before parsing) — a few-MB corpus arrives as ONE partition and
    * serializes the whole decrypt. When input parallelism is below the
    * session's AND the input is genuinely small (plan-stat bytes under
    * [[PdfRebalanceMaxBytes]] — rebalancing is a full shuffle of the
    * blob bytes, which must never be paid by a large corpus that
    * happens to have fewer splits than cores; review-caught r13),
    * rebalance first. At real corpus sizes partitions ≥ cores or the
    * byte gate trips, and the operator stays scan-shaped. */
  def pdfText(blobs: DataFrame, maxStreamBytes: Int = 16 << 20): DataFrame = {
    val spark = blobs.sparkSession
    val base = blobs.select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("blob")).rdd
    // plan-stat bytes when the source reports them; an RDD-backed frame
    // reports the defaultSizeInBytes SENTINEL (review-caught r13: the
    // gate read it as "huge" and silently kept the serialization trap
    // for exactly the inputs most likely to be single-partition). For
    // stat-less inputs a SINGLE-partition frame still rebalances — one
    // task already holds all its bytes, so the shuffle costs one extra
    // pass at worst; multi-partition stat-less inputs stay untouched.
    val statBytes = blobs.queryExecution.optimizedPlan.stats.sizeInBytes
    val statKnown =
      statBytes < spark.sessionState.conf.defaultSizeInBytes
    val smallInput =
      if (statKnown) statBytes <= PdfRebalanceMaxBytes
      else base.getNumPartitions == 1
    val balanced =
      if (smallInput &&
          base.getNumPartitions < spark.sparkContext.defaultParallelism)
        base.repartition(spark.sparkContext.defaultParallelism)
      else base
    val rows = balanced
      .flatMap { r =>
        val id: java.lang.Long = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        val t = extractText(r.getAs[Array[Byte]](1), maxStreamBytes)
        if (!t.ok) Iterator.single(Row(id, false, 0, null, null, t.flagged, t.reason))
        else if (t.pages.isEmpty) // zero-page document: visible, not dropped
          Iterator.single(Row(id, true, 0, null, null, t.flagged, null))
        else t.pages.iterator.zipWithIndex.map { case (txt, i) =>
          Row(id, true, t.nPages, i + 1, txt, t.flagged, null)
        }
      }
    spark.createDataFrame(rows, textSchema)
  }

  // ------------------------------------------------------ fixture side

  /** Build a complete single-font PDF from page text lines — the
    * fixture/witness side (the parser never depends on it). Layout:
    * classic xref table, one Helvetica Type1 font, one content stream
    * per page showing each line via `Td`+`Tj` (first line positions
    * without a preceding newline — exactly the documented extraction
    * rules, so expected text is `lines.mkString("\n")` per page).
    * `compress` wraps content streams in FlateDecode; `encrypted`
    * plants a dummy /Encrypt ref (structure only — enough for the
    * probe/extractor contract); `asciiHex` stacks ASCIIHexDecode over
    * Flate on the first content stream. */
  def pdfBytes(pages: Seq[Seq[String]], compress: Boolean = true,
               encrypted: Boolean = false, asciiHex: Boolean = false,
               lzw: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n%âãÏÓ\n")
    val nPages = pages.length
    // object numbering: 1 catalog, 2 pages, 3 font, then per page
    // (4+2i page, 5+2i content), optional encrypt last
    val encNum = 4 + 2 * nPages
    def obj(body: => Unit): Unit = {
      offsets += out.size().toLong
      val num = offsets.length
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj { w(s"<< /Type /Catalog /Pages 2 0 R >>") }
    obj {
      val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    }
    obj { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    pages.zipWithIndex.foreach { case (lines, i) =>
      obj {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
      }
      val body = {
        val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
        lines.zipWithIndex.foreach { case (line, k) =>
          if (k > 0) sb.append("0 -14 Td\n")
          sb.append("(").append(escapeLiteral(line)).append(") Tj\n")
        }
        sb.append("ET")
        sb.toString.getBytes("ISO-8859-1")
      }
      val (enc, filter) =
        if (lzw) (lzwEncode(body), " /Filter /LZWDecode")
        else if (compress && asciiHex && i == 0) {
          val fl = deflate(body)
          val hex = fl.map(b => f"${b & 0xFF}%02x").mkString.getBytes("ISO-8859-1")
          (hex :+ '>'.toByte, " /Filter [/ASCIIHexDecode /FlateDecode]")
        } else if (compress) (deflate(body), " /Filter /FlateDecode")
        else (body, "")
      obj {
        w(s"<< /Length ${enc.length}$filter >>\nstream\n")
        out.write(enc)
        w("\nendstream")
      }
    }
    if (encrypted) obj { w("<< /Filter /Standard /V 1 /R 2 >>") }
    val xrefOff = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R" +
      (if (encrypted) s" /Encrypt $encNum 0 R" else "") +
      s" >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The classic-layout document of [[pdfBytes]], genuinely ENCRYPTED by
    * the standard security handler (§7.6.3) with an EMPTY user password
    * (owner restrictions only — the decryptable class): `aes=false` →
    * /V 2 /R 3 RC4-128 (50-round key derivation + Algorithm 5 /U),
    * `aes=true` → /V 4 /R 4 /AESV2 crypt filter (AES-128-CBC, PKCS#7).
    * A non-empty `userPwd` yields a genuinely password-protected
    * document the extractor must keep FLAGGING. Content streams are
    * FlateDecode-compressed then encrypted (filters apply to plaintext,
    * §7.6.2). Fully deterministic: /ID and AES IVs derive from content.
    * Round-trip witness for [[StdDecryptor]] — writer and reader share
    * only the public ISO algorithms, not code paths. */
  def pdfBytesEncrypted(pages: Seq[Seq[String]], aes: Boolean = false,
                        userPwd: String = "", rev: Int = 0): Array[Byte] = {
    require(rev == 0 || rev == 5 || rev == 6, s"rev=$rev")
    val v5 = rev == 5 || rev == 6
    val r = if (v5) rev else if (aes) 4 else 3
    val keyLen = 16
    val perms = -44
    val id0 = md5(pages.flatten.mkString("|").getBytes("UTF-8"),
      Array[Byte]((if (aes) 1 else 0).toByte, rev.toByte))
    val pwdB = userPwd.getBytes("UTF-8")
    // ---- V5 (/R 5-6) material: random-free, derived from content so the
    // fixture is deterministic; writer and reader share only the public
    // ISO algorithms (hashV5 is the spec's Algorithm 2.B both ways)
    val fileKeyV5 = sha("SHA-256", "graft-v5-filekey".getBytes("UTF-8"), id0)
    val vSaltU = sha("SHA-256", "vU".getBytes("UTF-8"), id0).take(8)
    val kSaltU = sha("SHA-256", "kU".getBytes("UTF-8"), id0).take(8)
    val vSaltO = sha("SHA-256", "vO".getBytes("UTF-8"), id0).take(8)
    val kSaltO = sha("SHA-256", "kO".getBytes("UTF-8"), id0).take(8)
    val uValV5 = hashV5(pwdB, vSaltU, Array.empty, r) ++ vSaltU ++ kSaltU
    val ueVal = aesNoPadZeroIv(hashV5(pwdB, kSaltU, Array.empty, r),
      fileKeyV5, encrypt = true)
    val ownB = "owner".getBytes("UTF-8")
    val oValV5 = hashV5(ownB, vSaltO, uValV5, r) ++ vSaltO ++ kSaltO
    val oeVal = aesNoPadZeroIv(hashV5(ownB, kSaltO, uValV5, r),
      fileKeyV5, encrypt = true)
    val permsVal = {
      val plain = Array[Byte]((perms & 0xFF).toByte, ((perms >> 8) & 0xFF).toByte,
        ((perms >> 16) & 0xFF).toByte, ((perms >> 24) & 0xFF).toByte,
        0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
        'T', 'a', 'd', 'b', 'g', 'r', 'f', 't')
      val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(fileKeyV5, "AES"))
      c.doFinal(plain)
    }
    // ---- classic (/R 2-4) material
    val oVal = computeO("owner".getBytes("UTF-8"), pwdB, r, keyLen)
    val key =
      if (v5) fileKeyV5
      else baseKey(pwdB, oVal, perms, id0, r, keyLen, encryptMetadata = true)
    val uVal = if (v5) uValV5 else computeU(key, r, id0)
    def hexStr(b: Array[Byte]): String =
      "<" + b.map(x => f"${x & 0xFF}%02X").mkString + ">"
    def encryptStream(num: Int, body: Array[Byte]): Array[Byte] =
      if (v5)
        aesCbcEncrypt(key, md5(id0, Array[Byte](num.toByte)).take(16), body)
      else if (aes)
        aesCbcEncrypt(objectKey(key, num, 0, aes = true),
          md5(id0, Array[Byte](num.toByte)).take(16), body)
      else rc4(objectKey(key, num, 0, aes = false), body)

    val out = new java.io.ByteArrayOutputStream(1024)
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.6\n%âãÏÓ\n")
    val nPages = pages.length
    val encNum = 4 + 2 * nPages
    def obj(body: => Unit): Unit = {
      offsets += out.size().toLong
      val num = offsets.length
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj { w(s"<< /Type /Catalog /Pages 2 0 R >>") }
    obj {
      val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    }
    obj { w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") }
    pages.zipWithIndex.foreach { case (lines, i) =>
      obj {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
      }
      val body = {
        val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
        lines.zipWithIndex.foreach { case (line, k) =>
          if (k > 0) sb.append("0 -14 Td\n")
          sb.append("(").append(escapeLiteral(line)).append(") Tj\n")
        }
        sb.append("ET")
        sb.toString.getBytes("ISO-8859-1")
      }
      val enc = encryptStream(5 + 2 * i, deflate(body))
      obj {
        w(s"<< /Length ${enc.length} /Filter /FlateDecode >>\nstream\n")
        out.write(enc)
        w("\nendstream")
      }
    }
    obj {
      if (v5)
        w(s"<< /Filter /Standard /V 5 /R $r /Length 256 " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexStr(oValV5)} /U ${hexStr(uValV5)} " +
          s"/OE ${hexStr(oeVal)} /UE ${hexStr(ueVal)} " +
          s"/Perms ${hexStr(permsVal)} /P $perms >>")
      else if (aes)
        w("<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
          "/StmF /StdCF /StrF /StdCF " +
          s"/O ${hexStr(oVal)} /U ${hexStr(uVal)} /P $perms >>")
      else
        w("<< /Filter /Standard /V 2 /R 3 /Length 128 " +
          s"/O ${hexStr(oVal)} /U ${hexStr(uVal)} /P $perms >>")
    }
    val xrefOff = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R " +
      s"/Encrypt $encNum 0 R /ID [${hexStr(id0)} ${hexStr(id0)}] " +
      s">>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The same document body published through a PDF 1.5 xref STREAM
    * (FlateDecode + PNG Up predictor, /W [1 4 2]) with the font and
    * page dicts packed into an object STREAM — the modern writer
    * layout, exercising §7.5.7/§7.5.8 end to end. */
  def pdfBytesXrefStream(pages: Seq[Seq[String]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n%âãÏÓ\n")
    val nPages = pages.length
    // numbering: 1 catalog, 2 pages root, 3 font, 4..3+n page dicts
    // (ALL inside ObjStm), then content streams 4+n.., ObjStm, XRef
    val contentBase = 4 + nPages
    val objStmNum = contentBase + nPages
    val xrefNum = objStmNum + 1
    val offsets = new Array[Long](xrefNum + 1) // index by objNum
    // --- content streams (top-level: streams cannot live in an ObjStm)
    val contents = pages.map { lines =>
      val sb = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, k) =>
        if (k > 0) sb.append("0 -14 Td\n")
        sb.append("(").append(escapeLiteral(line)).append(") Tj\n")
      }
      sb.append("ET")
      deflate(sb.toString.getBytes("ISO-8859-1"))
    }
    contents.zipWithIndex.foreach { case (enc, i) =>
      val num = contentBase + i
      offsets(num) = out.size().toLong
      w(s"$num 0 obj\n<< /Length ${enc.length} /Filter /FlateDecode >>\nstream\n")
      out.write(enc)
      w("\nendstream\nendobj\n")
    }
    // --- object stream with catalog, pages root, font, page dicts
    val stmObjs: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> (s"<< /Type /Pages /Kids [" +
          (0 until nPages).map(i => s"${4 + i} 0 R").mkString(" ") +
          s"] /Count $nPages >>"),
        3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>") ++
      (0 until nPages).map(i => (4 + i) ->
        (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
         s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${contentBase + i} 0 R >>"))
    val bodies = stmObjs.map(_._2.getBytes("ISO-8859-1"))
    val header = {
      val sb = new StringBuilder
      var off = 0
      stmObjs.zip(bodies).foreach { case ((num, _), b) =>
        sb.append(num).append(' ').append(off).append(' ')
        off += b.length + 1
      }
      sb.toString.getBytes("ISO-8859-1")
    }
    val stmData = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(header)
      bodies.foreach { b => o.write(b); o.write('\n') }
      o.toByteArray
    }
    val stmEnc = deflate(stmData)
    offsets(objStmNum) = out.size().toLong
    w(s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${stmObjs.length} " +
      s"/First ${header.length} /Length ${stmEnc.length} /Filter /FlateDecode >>\nstream\n")
    out.write(stmEnc)
    w("\nendstream\nendobj\n")
    // --- xref stream: /W [1 4 2], PNG Up predictor, entries 0..xrefNum
    val xrefOff = out.size().toLong
    offsets(xrefNum) = xrefOff
    val cols = 7
    val rows = new Array[Byte]((xrefNum + 1) * cols)
    def put(num: Int, t: Int, f2: Long, f3: Int): Unit = {
      val o = num * cols
      rows(o) = t.toByte
      rows(o + 1) = ((f2 >> 24) & 0xFF).toByte; rows(o + 2) = ((f2 >> 16) & 0xFF).toByte
      rows(o + 3) = ((f2 >> 8) & 0xFF).toByte; rows(o + 4) = (f2 & 0xFF).toByte
      rows(o + 5) = ((f3 >> 8) & 0xFF).toByte; rows(o + 6) = (f3 & 0xFF).toByte
    }
    put(0, 0, 0, 0xFFFF)
    stmObjs.zipWithIndex.foreach { case ((num, _), i) => put(num, 2, objStmNum.toLong, i) }
    (0 until nPages).foreach(i => put(contentBase + i, 1, offsets(contentBase + i), 0))
    put(objStmNum, 1, offsets(objStmNum), 0)
    put(xrefNum, 1, xrefOff, 0)
    // PNG Up predictor rows
    val pred = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r <= xrefNum) {
      pred.write(2) // Up
      var c = 0
      while (c < cols) {
        val above = if (r > 0) rows((r - 1) * cols + c) & 0xFF else 0
        pred.write((rows(r * cols + c) & 0xFF) - above)
        c += 1
      }
      r += 1
    }
    val xrefEnc = deflate(pred.toByteArray)
    w(s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 4 2] " +
      s"/Root 1 0 R /Filter /FlateDecode " +
      s"/DecodeParms << /Predictor 12 /Columns $cols >> " +
      s"/Length ${xrefEnc.length} >>\nstream\n")
    out.write(xrefEnc)
    w(s"\nendstream\nendobj\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** One-page PDF whose text shows through a Type0 (CID) font with an
    * Identity-H encoding and a ToUnicode CMap — the modern-generator
    * layout [[extractText]]'s composite-font path exists for. Codes
    * `1..text.length` map to the text's chars via bfchar sections
    * (chunked at 100 entries, the CMap spec's section bound); the
    * content stream shows one 2-byte-code hex string. */
  def pdfBytesCid(text: String): Array[Byte] = {
    require(text.nonEmpty && text.length < 0xFFFF, "cid text length out of range")
    val toUni = {
      val sb = new StringBuilder
      sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
      sb.append("1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n")
      text.zipWithIndex.grouped(100).foreach { grp =>
        sb.append(s"${grp.length} beginbfchar\n")
        grp.foreach { case (ch, i) =>
          sb.append(f"<${i + 1}%04X> <${ch.toInt}%04X>\n")
        }
        sb.append("endbfchar\n")
      }
      sb.append("endcmap\nend\nend")
      sb.toString.getBytes("ISO-8859-1")
    }
    val content = ("BT /F1 12 Tf 72 720 Td <" +
      (1 to text.length).map(i => f"$i%04X").mkString +
      "> Tj ET").getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream(1024)
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    def obj(body: => Unit): Unit = {
      offsets += out.size().toLong
      w(s"${offsets.length} 0 obj\n"); body; w("\nendobj\n")
    }
    obj { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj { w("<< /Type /Pages /Kids [4 0 R] /Count 1 >>") }
    obj { w("<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>") }
    obj { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>") }
    obj { w(s"<< /Length ${content.length} >>\nstream\n")
      out.write(content); w("\nendstream") }
    obj { w(s"<< /Length ${toUni.length} >>\nstream\n")
      out.write(toUni); w("\nendstream") }
    val xrefOff = out.size()
    w(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  private def escapeLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private[graft] def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }
}
