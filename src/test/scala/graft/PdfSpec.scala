package graft

import org.apache.spark.sql.functions._
import graft.ops.Pdf

/** PDF probe + bounded text extraction (r11): fixture round-trips over
  * both xref layouts, the documented text-op rules, flag-not-crash on
  * encryption / composite fonts / bombs, and the probe contract. */
class PdfSpec extends SparkSuite {

  private val pages = Seq(
    Seq("Hello, world!", "Second line (with parens) and back\\slash"),
    Seq("Page two starts here", "mid", "and ends"),
    Seq("lone"))

  test("classic-xref round-trip: compressed and plain content streams extract lines.mkString(newline)") {
    for (compress <- Seq(true, false)) {
      val t = Pdf.extractText(Pdf.pdfBytes(pages, compress = compress))
      assert(t.ok && !t.flagged && t.nPages == 3, s"compress=$compress: $t")
      assert(t.pages == pages.map(_.mkString("\n")).toVector)
    }
  }

  test("xref stream + object stream + PNG Up predictor: the modern writer layout extracts identically") {
    val t = Pdf.extractText(Pdf.pdfBytesXrefStream(pages))
    assert(t.ok && !t.flagged && t.nPages == 3, s"$t")
    assert(t.pages == pages.map(_.mkString("\n")).toVector)
  }

  test("stacked filters: ASCIIHexDecode over FlateDecode decodes through the chain") {
    val t = Pdf.extractText(Pdf.pdfBytes(pages, compress = true, asciiHex = true))
    assert(t.ok && !t.flagged && t.pages == pages.map(_.mkString("\n")).toVector)
  }

  test("ASCII85Decode and RunLengthDecode: the remaining text-stream filters") {
    // A85: the spec's own properties — z groups, partial tails, ~> EOD
    val z = Pdf.ascii85Decode("z~>".getBytes("ISO-8859-1"))
    assert(z.length == 4 && z.forall(_ == 0), "z = four ZERO bytes")
    // exhaustive-ish round property against a reference encoder
    def enc85(data: Array[Byte]): String = {
      val sb = new StringBuilder
      data.grouped(4).foreach { g =>
        var v = 0L
        g.padTo(4, 0.toByte).foreach(b => v = (v << 8) | (b & 0xFF))
        val cs = new Array[Char](5)
        var i = 4
        while (i >= 0) { cs(i) = ('!' + (v % 85)).toChar; v /= 85; i -= 1 }
        sb.appendAll(cs, 0, if (g.length == 4) 5 else g.length + 1)
      }
      sb.append("~>").toString
    }
    val rnd = new scala.util.Random(11L)
    for (len <- Seq(0, 1, 2, 3, 4, 5, 9, 1000)) {
      val data = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(java.util.Arrays.equals(
        Pdf.ascii85Decode(enc85(data).getBytes("ISO-8859-1")), data), s"len=$len")
    }
    intercept[Exception](Pdf.ascii85Decode("ÿ~>".getBytes("ISO-8859-1")))
    // RunLength: literal runs, repeats, EOD, torn input
    def rl(bytes: Int*): Array[Byte] =
      Pdf.runLengthDecode(bytes.map(_.toByte).toArray, 1 << 20)
    assert(new String(rl(2, 'a', 'b', 'c', 255, 'x', 128), "US-ASCII") == "abcxx")
    assert(new String(rl(0, 'q', 129, 'r'), "US-ASCII") == "q" + "r" * 128)
    intercept[Exception](rl(5, 'a'))
    intercept[Exception](Pdf.runLengthDecode(Array[Byte](200.toByte), 1 << 20))
  }

  test("LZWDecode: the TIFF-variant codes old PDFs carry — round-trips, KwKwK, width growth, table-full clear") {
    def rt(data: Array[Byte], early: Int = 1): Unit = {
      val dec = Pdf.lzwDecode(Pdf.lzwEncode(data, early), 64 << 20, early)
      assert(java.util.Arrays.equals(dec, data),
        s"round-trip failed at ${data.length} bytes (early=$early)")
    }
    rt(Array.emptyByteArray)
    rt("a".getBytes)
    rt(("ab" * 2000).getBytes)            // KwKwK-heavy repetition
    rt(("the quick brown fox " * 500).getBytes) // width growth past 511/1023
    val rnd = new scala.util.Random(7L)
    rt(Array.fill(40000)(rnd.nextInt(256).toByte)) // forces mid-stream clear
    rt(Array.fill(5000)(rnd.nextInt(4).toByte), early = 0) // EarlyChange=0
    rt(Array.tabulate(3000)(i => (i % 251).toByte))
    // whole-document path: an LZW content stream extracts identically
    val t = Pdf.extractText(Pdf.pdfBytes(pages, lzw = true))
    assert(t.ok && !t.flagged && t.pages == pages.map(_.mkString("\n")).toVector)
    // torn stream / bomb cap fail, never crash
    val enc = Pdf.lzwEncode("sample payload".getBytes)
    intercept[Exception](Pdf.lzwDecode(enc.dropRight(2), 1 << 20))
    intercept[Exception](Pdf.lzwDecode(
      Pdf.lzwEncode(new Array[Byte](1 << 16)), 1024))
  }

  test("standard security handler (r12): RC4-128 and AES-128 empty-user-password docs decrypt and extract; real passwords flag") {
    for (aes <- Seq(false, true)) {
      val enc = Pdf.pdfBytesEncrypted(pages, aes = aes)
      // the fixture must really be encrypted on the wire: no plaintext
      // marker survives (content is deflate(text) then cipher — a broken
      // identity cipher would leak the flate magic 0x78 at stream starts)
      val wire = new String(enc, "ISO-8859-1")
      assert(!wire.contains("Hello, world!"), s"aes=$aes: plaintext leaked")
      val t = Pdf.extractText(enc)
      assert(t.ok && !t.flagged && t.nPages == 3, s"aes=$aes: $t")
      assert(t.pages == pages.map(_.mkString("\n")).toVector, s"aes=$aes")
    }
    // genuinely password-protected: Algorithm 6 rejects the empty user
    // password and the quarantine flag stands
    for (aes <- Seq(false, true)) {
      val pw = Pdf.extractText(Pdf.pdfBytesEncrypted(pages, aes = aes,
        userPwd = "secret"))
      assert(!pw.ok && pw.flagged && pw.reason == "encrypted", s"aes=$aes: $pw")
    }
    // a doc merely CLAIMING V5 over classic 32-byte /O //U material is
    // malformed (no /UE, short /U) — flags, never throws or half-reads
    val enc = Pdf.pdfBytesEncrypted(pages)
    val v5 = new String(enc, "ISO-8859-1").replace("/V 2 /R 3", "/V 5 /R 6")
      .getBytes("ISO-8859-1")
    val t5 = Pdf.extractText(v5)
    assert(!t5.ok && t5.flagged && t5.reason == "encrypted", s"$t5")
    // probe contract unchanged: encrypted (even decryptable) docs carry
    // the /encrypted codec flag — triage stays content-free
    val p = Pdf.Probe.probe(Pdf.pdfBytesEncrypted(pages, aes = true)).get
    assert(p.codec.endsWith("/encrypted"), p.codec)
  }

  test("AES-256 (r13): /V 5 /R 6 and /R 5 empty-user-password docs decrypt and extract; real passwords flag") {
    for (rev <- Seq(5, 6)) {
      val enc = Pdf.pdfBytesEncrypted(pages, rev = rev)
      val wire = new String(enc, "ISO-8859-1")
      assert(!wire.contains("Hello, world!"), s"r$rev: plaintext leaked")
      assert(wire.contains("/AESV3") && wire.contains("/UE"), s"r$rev: shape")
      val t = Pdf.extractText(enc)
      assert(t.ok && !t.flagged && t.nPages == 3, s"r$rev: $t")
      assert(t.pages == pages.map(_.mkString("\n")).toVector, s"r$rev")
      // a genuinely password-protected V5 doc keeps flagging: the 2.B
      // validation hash of the empty password cannot match
      val pw = Pdf.extractText(Pdf.pdfBytesEncrypted(pages, rev = rev,
        userPwd = "secret"))
      assert(!pw.ok && pw.flagged && pw.reason == "encrypted", s"r$rev: $pw")
    }
    // a tampered /Perms seal flags (the key must not silently half-work)
    val good = new String(Pdf.pdfBytesEncrypted(pages, rev = 6), "ISO-8859-1")
    val permsAt = good.indexOf("/Perms <") + "/Perms <".length
    val bad = good.substring(0, permsAt) +
      (if (good.charAt(permsAt) == '0') "1" else "0") + good.substring(permsAt + 1)
    val tp = Pdf.extractText(bad.getBytes("ISO-8859-1"))
    assert(!tp.ok && tp.flagged && tp.reason == "encrypted", s"$tp")
    // Algorithm 2.B self-check: the round count really extends past 64
    // (a hash that stopped at 64 unconditionally decrypts nothing real) —
    // pin a known property: output is 32 bytes and differs across salts
    val h1 = Pdf.hashV5(Array.empty, Array.fill(8)(1.toByte), Array.empty, 6)
    val h2 = Pdf.hashV5(Array.empty, Array.fill(8)(2.toByte), Array.empty, 6)
    assert(h1.length == 32 && h2.length == 32 && !h1.sameElements(h2))
  }

  test("encrypted flags, never decrypts; non-PDF and torn files quarantine with their reasons") {
    val enc = Pdf.extractText(Pdf.pdfBytes(pages, encrypted = true))
    assert(!enc.ok && enc.reason == "encrypted" && enc.flagged)
    val not = Pdf.extractText("plain text, no header".getBytes("UTF-8"))
    assert(!not.ok && not.reason == "not-pdf")
    val whole = Pdf.pdfBytes(pages)
    for (cut <- Seq(10, whole.length / 2, whole.length - 30)) {
      val torn = Pdf.extractText(java.util.Arrays.copyOf(whole, cut))
      assert(!torn.ok && (torn.reason == "corrupt" || torn.reason == "not-pdf"),
        s"cut=$cut -> $torn")
    }
  }

  /** Hand-assembled one-page PDF whose content stream is given verbatim
    * (uncompressed) — for exercising operator/string syntax the fixture
    * writer doesn't emit. `fontSubtype` plants the font's /Subtype. */
  private def handPdf(content: String, fontSubtype: String = "Type1"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offs = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    def obj(body: String): Unit = {
      offs += out.size().toLong
      w(s"${offs.length} 0 obj\n$body\nendobj\n")
    }
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj("<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    obj(s"<< /Type /Font /Subtype /$fontSubtype /BaseFont /Helvetica >>")
    obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    obj(s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    val x = out.size()
    w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
    out.toByteArray
  }

  test("incremental update: an appended xref section with /Prev serves the NEWEST object versions") {
    // the wild's most common multi-xref shape: original document +
    // appended update that REPLACES page 1's content stream (same
    // object number, new offset, new xref section chaining back)
    val base = Pdf.pdfBytes(Seq(Seq("original line")), compress = false)
    val prevXref = {
      val s = new String(base, "ISO-8859-1")
      val i = s.lastIndexOf("startxref")
      s.substring(i + 9, s.indexOf("%%EOF", i)).trim.toLong
    }
    // object 5 is page 1's content stream in the classic layout
    val newContent = "BT /F1 12 Tf 72 720 Td (updated line) Tj ET"
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    val objOff = out.size()
    out.write((s"5 0 obj\n<< /Length ${newContent.length} >>\nstream\n" +
      newContent + "\nendstream\nendobj\n").getBytes("ISO-8859-1"))
    val xrefOff = out.size()
    out.write((f"xref\n5 1\n$objOff%010d 00000 n \n" +
      s"trailer\n<< /Size 6 /Root 1 0 R /Prev $prevXref >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n").getBytes("ISO-8859-1"))
    val t = Pdf.extractText(out.toByteArray)
    assert(t.ok && t.pages == Vector("updated line"),
      s"newest xref section must win: $t")
    // the un-updated original still reads its own version
    assert(Pdf.extractText(base).pages == Vector("original line"))
  }

  test("operator semantics: TJ kerning, hex strings, quote operators, escapes, octal") {
    // TJ: strings concatenate, numbers ignored; hex string decodes;
    // odd hex digit pads 0x_0 ('P' = 0x50 from digit '5')
    val tj = Pdf.extractText(handPdf(
      "BT /F1 12 Tf 72 50 Td [(A) -120 (B) 5 (C)] TJ <48656C6C6F> Tj ET"))
    assert(tj.ok && tj.pages == Vector("ABCHello"), s"$tj")
    val odd = Pdf.extractText(handPdf("BT 0 0 Td <5> Tj ET"))
    assert(odd.ok && odd.pages == Vector("P"), s"$odd")
    // ' and " are next-line-and-show; Td/T* newline unless empty or
    // already newline-terminated (the trailing T* adds exactly one)
    val q = Pdf.extractText(handPdf(
      "BT 72 50 Td (first) Tj (quoted) ' 2 3 (dquoted) \" T* ET"))
    assert(q.ok && q.pages == Vector("first\nquoted\ndquoted\n"), s"$q")
    // literal-string escapes: \( \) \\ \n octal \101='A', nested parens
    val esc = Pdf.extractText(handPdf(
      "BT 0 0 Td (a\\(b\\)c\\\\d\\ne\\101(nested)f) Tj ET"))
    assert(esc.ok && esc.pages == Vector("a(b)c\\d\neA(nested)f"), s"$esc")
    // WinAnsi high range via octal: \223/\224 smart quotes (cp1252
    // block), \351 e-acute (Latin-1 block)
    val win = Pdf.extractText(handPdf("BT 0 0 Td (\\223caf\\351\\224) Tj ET"))
    assert(win.ok && win.pages == Vector("\u201Ccaf\u00E9\u201D"), s"$win")
  }

  test("CID fonts WITH ToUnicode decode: bfchar/bfrange maps, Identity-H two-byte codes, unmapped codes flag") {
    // the fixture writer's bfchar path round-trips arbitrary text
    // (incl. a >100-entry CMap exercising section chunking)
    val long = ("CID text with punctuation, DIGITS 0123456789 and " +
      "enough characters to cross the hundred-entry bfchar section bound!")
    val t = Pdf.extractText(Pdf.pdfBytesCid(long))
    assert(t.ok && !t.flagged && t.pages == Vector(long), s"$t")
    // bfrange forms: contiguous increment AND explicit array, 2-char dst
    val toUni = "begincmap\n" +
      "2 beginbfchar\n<0001> <0048>\n<0002> <00E9>\nendbfchar\n" + // H, é
      "1 beginbfrange\n<0010> <0013> <0041>\nendbfrange\n" +       // A-D
      "1 beginbfrange\n<0020> <0021> [<0058> <006600660069>]\nendbfrange\n" + // X, ffi
      "endcmap"
    val content = "BT /F1 12 Tf 0 0 Td <000100020010001100120013002000210002> Tj ET"
    val hand = cidHandPdf(content, toUni)
    val t2 = Pdf.extractText(hand)
    assert(t2.ok && !t2.flagged && t2.pages == Vector("HéABCDXffié"), s"$t2")
    // an unmapped code skips and flags, never guesses
    val t3 = Pdf.extractText(cidHandPdf(
      "BT /F1 12 Tf 0 0 Td <00010099> Tj ET", toUni))
    assert(t3.ok && t3.flagged && t3.pages == Vector("H"), s"$t3")
    // a Type0 font WITHOUT ToUnicode still flags (no guessing)
    val t4 = Pdf.extractText(cidHandPdf(
      "BT /F1 12 Tf 0 0 Td <0001> Tj ET", toUnicode = null))
    assert(t4.ok && t4.flagged && t4.pages == Vector(""), s"$t4")
  }

  /** Hand-built one-page CID PDF with an arbitrary ToUnicode body
    * (null = no /ToUnicode at all). */
  private def cidHandPdf(content: String, toUnicode: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val offs = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    def obj(body: String): Unit = {
      offs += out.size().toLong
      w(s"${offs.length} 0 obj\n$body\nendobj\n")
    }
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj("<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
    obj("<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H" +
      (if (toUnicode != null) " /ToUnicode 6 0 R" else "") + " >>")
    obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] " +
      "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
    obj(s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
    if (toUnicode != null)
      obj(s"<< /Length ${toUnicode.length} >>\nstream\n$toUnicode\nendstream")
    val x = out.size()
    w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
    out.toByteArray
  }

  test("/Encoding /Differences remaps codes through the AGL subset; MacRoman base is ASCII-only") {
    def diffPdf(encoding: String, content: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val offs = scala.collection.mutable.ArrayBuffer[Long]()
      def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
      w("%PDF-1.4\n")
      def obj(body: String): Unit = {
        offs += out.size().toLong
        w(s"${offs.length} 0 obj\n$body\nendobj\n")
      }
      obj("<< /Type /Catalog /Pages 2 0 R >>")
      obj("<< /Type /Pages /Kids [4 0 R] /Count 1 >>")
      obj(s"<< /Type /Font /Subtype /Type1 /BaseFont /F /Encoding $encoding >>")
      obj("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] " +
        "/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>")
      obj(s"<< /Length ${content.length} >>\nstream\n$content\nendstream")
      val x = out.size()
      w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
      offs.foreach(o => w(f"$o%010d 00000 n \n"))
      w(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
      out.toByteArray
    }
    // codes 65/66 remapped to eacute/emdash, 67 to an AGL-unknown name,
    // consecutive names advance the code (68 -> bullet); unmapped
    // codes fall through to WinAnsi
    val enc = "<< /BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 65 /eacute /unknowable /bullet 90 /Euro ] >>"
    val t = Pdf.extractText(diffPdf(enc, "BT /F1 12 Tf 0 0 Td (ABCDEZa) Tj ET"))
    // A(65)->é, B(66)->unknown (flag+skip), C(67)->•  D(68) unmapped->D,
    // E(69) unmapped->E, Z(90)->€, a passthrough
    assert(t.ok && t.flagged && t.pages == Vector("é•DE€a"), s"$t")
    // MacRoman base: ASCII passes, high bytes flag instead of being
    // fabricated from a table this extractor does not carry
    val mac = Pdf.extractText(diffPdf("/MacRomanEncoding",
      "BT /F1 12 Tf 0 0 Td (ok\\351) Tj ET"))
    assert(mac.ok && mac.flagged && mac.pages == Vector("ok"), s"$mac")
    // plain WinAnsi name encoding unchanged
    val win = Pdf.extractText(diffPdf("/WinAnsiEncoding",
      "BT /F1 12 Tf 0 0 Td (ok\\351) Tj ET"))
    assert(win.ok && !win.flagged && win.pages == Vector("oké"), s"$win")
  }

  test("composite (Type0) fonts skip their show ops and flag; the rest of the page survives") {
    val t = Pdf.extractText(handPdf("BT /F1 12 Tf 0 0 Td (cid text) Tj ET",
      fontSubtype = "Type0"))
    assert(t.ok && t.flagged && t.pages == Vector(""), s"$t")
    // an UNKNOWN font name stays supported (default font assumption)
    val u = Pdf.extractText(handPdf("BT /F9 12 Tf 0 0 Td (kept) Tj ET"))
    assert(u.ok && u.pages == Vector("kept"))
  }

  test("bomb cap: a flate bomb trips maxStreamBytes and flags the page instead of allocating") {
    val bomb = Pdf.deflate(new Array[Byte](32 << 20)) // 32 MiB of zeros -> ~32 KiB
    val out = new java.io.ByteArrayOutputStream()
    val offs = scala.collection.mutable.ArrayBuffer[Long]()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    def obj(body: => Unit): Unit = {
      offs += out.size().toLong
      w(s"${offs.length} 0 obj\n"); body; w("\nendobj\n")
    }
    obj { w("<< /Type /Catalog /Pages 2 0 R >>") }
    obj { w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>") }
    obj { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 10 10] /Contents 4 0 R >>") }
    obj { w(s"<< /Length ${bomb.length} /Filter /FlateDecode >>\nstream\n")
          out.write(bomb); w("\nendstream") }
    val x = out.size()
    w(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offs.length + 1} /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
    val t = Pdf.extractText(out.toByteArray, maxStreamBytes = 1 << 20)
    assert(t.ok && t.flagged && t.pages == Vector(""), s"bomb must flag, not allocate: $t")
  }

  test("probe: version + page count + MediaBox + encrypted flag; joins the Default chain") {
    val p = Pdf.Probe.probe(Pdf.pdfBytes(pages)).get
    assert(p.format == "pdf" && p.codec == "1.4" && p.frames == 3 &&
      p.width == 612 && p.height == 792, s"$p")
    val ps = Pdf.Probe.probe(Pdf.pdfBytesXrefStream(pages)).get
    assert(ps.codec == "1.5" && ps.frames == 3, s"$ps")
    val enc = Pdf.Probe.probe(Pdf.pdfBytes(pages, encrypted = true)).get
    assert(enc.codec == "1.4/encrypted" && enc.frames == 0, s"$enc")
    assert(Pdf.Probe.probe("nope".getBytes("UTF-8")).isEmpty)
    // the Default chain resolves a PDF blob to the pdf lane
    val viaChain = graft.ops.MediaProbe.Default.probe(Pdf.pdfBytes(pages)).get
    assert(viaChain.format == "pdf" && viaChain.frames == 3)
  }

  test("pdfText operator: one row per page, quarantine rows for the rest, no shuffle in the plan") {
    import spark.implicits._
    val rows = Seq(
      (1L, Pdf.pdfBytes(Seq(Seq("alpha", "beta")))),
      (2L, Pdf.pdfBytes(pages, encrypted = true)),
      (3L, "not a pdf".getBytes("UTF-8")),
      (4L, Pdf.pdfBytesXrefStream(Seq(Seq("x"), Seq("y"))))
    ).toDF("doc_id", "blob")
    val out = Pdf.pdfText(rows).orderBy("doc_id", "page").collect()
    assert(out.length == 5)
    assert(out(0).getLong(0) == 1L && out(0).getBoolean(1) &&
      out(0).getInt(3) == 1 && out(0).getString(4) == "alpha\nbeta")
    assert(out(1).getLong(0) == 2L && !out(1).getBoolean(1) &&
      out(1).getString(6) == "encrypted")
    assert(out(2).getLong(0) == 3L && out(2).getString(6) == "not-pdf")
    assert(out(3).getString(4) == "x" && out(4).getString(4) == "y")
    assert(out(3).getInt(2) == 2 && out(4).getInt(3) == 2)
    // a zero-page document stays VISIBLE (one ok row, n_pages 0) —
    // a silent drop would hide it from ingest receipts (review-caught)
    val zp = {
      val o = new java.io.ByteArrayOutputStream()
      val offs = scala.collection.mutable.ArrayBuffer[Long]()
      def w(s: String): Unit = o.write(s.getBytes("ISO-8859-1"))
      w("%PDF-1.4\n")
      offs += o.size().toLong; w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
      offs += o.size().toLong; w("2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n")
      val x = o.size()
      w(s"xref\n0 3\n0000000000 65535 f \n")
      offs.foreach(v => w(f"$v%010d 00000 n \n"))
      w(s"trailer\n<< /Size 3 /Root 1 0 R >>\nstartxref\n$x\n%%EOF\n")
      o.toByteArray
    }
    val zrows = Pdf.pdfText(Seq((9L, zp)).toDF("doc_id", "blob")).collect()
    assert(zrows.length == 1 && zrows(0).getBoolean(1) &&
      zrows(0).getInt(2) == 0 && zrows(0).isNullAt(3), s"${zrows.toSeq}")
  }
}
