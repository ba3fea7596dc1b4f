package graft.sources

import java.awt.geom.{AffineTransform, GeneralPath}
import java.awt.image.BufferedImage
import java.awt.{BasicStroke, Color}

import scala.collection.mutable

/** A from-scratch PDF content-stream rasterizer — real pixels for the
  * S1 source (pdf_utils.py:47 renders pages at dpi=250; no PDF library
  * exists in this environment, so the subset a price-flyer fixture
  * needs is implemented directly from the public PDF 1.4 spec):
  *
  *  - document parsing: `N 0 obj … endobj` objects, the page tree in
  *    /Kids order, /MediaBox with /Parent inheritance, /Contents as a
  *    single ref or an array, stream payloads raw or /FlateDecode
  *    (java.util.zip.Inflater — zlib IS in the JDK);
  *  - graphics operators: q/Q (state stack), cm (full 2x3 affine
  *    concat), rg/RG/g/G (fill/stroke color), w (line width),
  *    re / m / l / h (path building), f / f* / F (fill), S / s
  *    (stroke), n (no-op path drop); unknown operators consume their
  *    operands and are ignored (the spec's forgiving-reader rule);
  *  - text showing (since r12): BT/ET, Tf/TL/Td/TD/Tm/T*, Tj/TJ/'/"
  *    with the full text-matrix algebra (Tm/Tlm split, per-glyph
  *    advance updates, TJ thousandths adjustments) over a real
  *    lexer — (…) literals with escapes/nesting, <…> hex strings,
  *    [ ] arrays, /names. Glyphs render as FIXED-ADVANCE FILLED BOXES
  *    using the public Type1 Helvetica AFM advance widths (glyph box =
  *    advance inset 10% each side, cap height 0.7 em) — a documented
  *    approximation: placement, advance, and line metrics are exact,
  *    glyph SHAPES are boxes (no font engine). That gives flyer
  *    fixtures positional text signal for crops/OCR without
  *    misrepresenting outline fidelity;
  *  - images (since r12): `/XObject` image resources drawn by `Do`
  *    (page `/Resources` inline or by ref, `/DeviceRGB`/`/DeviceGray`
  *    at 8 bits, raw or /FlateDecode samples) and inline `BI…ID…EI`
  *    images with the spec's abbreviated keys (/W /H /CS /BPC /F) —
  *    both map the sample grid onto the CTM unit square with image
  *    row 0 at the TOP (the spec's image-space flip), nearest-neighbor
  *    so placed pixels stay exact;
  *  - device mapping: dpi/72 scale with the y-axis flip (PDF origin is
  *    bottom-left), so a box at (x, y) lands at pixel row
  *    `H - y·s` — stroke pen width scales with the CTM exactly as the
  *    spec's user-space pen does.
  *
  * Out of scope (documented boundary, not silent): font programs /
  * glyph outlines (boxes above), non-8-bit or ICC/indexed color
  * images, shading, clipping — a fixture that needs them still
  * rasterizes, with those operators skipped. Inline-image scanning
  * assumes `BI`/`ID`/`EI` appear as standalone tokens outside string
  * literals (true of any writer that emits spec-legal streams). */
class ContentStreamRasterizer extends PageRasterizer {
  import ContentStreamRasterizer._

  override def rasterize(pdfBytes: Array[Byte], dpi: Int): Seq[RasterizedPage] = {
    val doc = parse(pdfBytes)
    doc.pages.zipWithIndex.map { case (page, i) =>
      val s = dpi / 72.0
      val wPx = math.round(page.mediaBox._3 * s).toInt.max(1)
      val hPx = math.round(page.mediaBox._4 * s).toInt.max(1)
      val img = new BufferedImage(wPx, hPx, BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      g2.setColor(Color.WHITE)
      g2.fillRect(0, 0, wPx, hPx)
      g2.setRenderingHint(java.awt.RenderingHints.KEY_ANTIALIASING,
        java.awt.RenderingHints.VALUE_ANTIALIAS_OFF)
      // Device transform: dpi scale, y-flip, and the MediaBox origin —
      // a box of [x0 y0 x1 y1] puts user-space (x0, y0) at the page's
      // bottom-left, so content coordinates translate by (-x0, -y0)
      // before scaling (fixtures use origin 0; real PDFs may not).
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      val base = new AffineTransform(s, 0, 0, -s, 0, hPx.toDouble)
      base.translate(-page.mediaBox._1, -page.mediaBox._2)
      page.content.foreach(stream => run(g2, base, stream, page.xobjects))
      g2.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      RasterizedPage(i + 1, wPx, hPx, out.toByteArray)
    }
  }
}

object ContentStreamRasterizer {

  /** Decoded image samples: 8-bit, row-major from the TOP row (PDF
    * image-space order), 3 bytes/px RGB or 1 byte/px gray. */
  final case class PdfImage(
      width: Int, height: Int, gray: Boolean, samples: Array[Byte])

  final case class Page(
      mediaBox: (Double, Double, Double, Double),
      content: Seq[String],
      xobjects: Map[String, PdfImage] = Map.empty)
  final case class Doc(pages: Seq[Page])

  private final case class RawObj(
      num: Int, dict: String, stream: Option[Array[Byte]])

  /** Latin-1 is byte-faithful, so structure scanning happens over the
    * string view while stream payloads slice the original bytes. */
  def parse(bytes: Array[Byte]): Doc = {
    val text = new String(bytes, "ISO-8859-1")
    val objRe = "(?s)(\\d+)\\s+0\\s+obj\\s*(.*?)endobj".r
    val objs = objRe.findAllMatchIn(text).map { m =>
      val body = m.group(2)
      val streamAt = body.indexOf("stream")
      if (streamAt >= 0) {
        val dict = body.substring(0, streamAt)
        // payload starts after "stream" + EOL, ends before "endstream"
        val absStart = {
          var p = m.start(2) + streamAt + "stream".length
          if (p < text.length && text.charAt(p) == '\r') p += 1
          if (p < text.length && text.charAt(p) == '\n') p += 1
          p
        }
        val endRel = body.indexOf("endstream", streamAt)
        val absEnd = m.start(2) + endRel
        val raw = java.util.Arrays.copyOfRange(bytes, absStart, absEnd)
        val payload =
          if (dict.contains("/FlateDecode")) inflate(raw) else raw
        RawObj(m.group(1).toInt, dict, Some(payload))
      } else RawObj(m.group(1).toInt, body, None)
    }.toSeq
    val byNum = objs.map(o => o.num -> o).toMap

    def mediaBoxOf(dict: String): Option[(Double, Double, Double, Double)] =
      "/MediaBox\\s*\\[\\s*([-\\d.]+)\\s+([-\\d.]+)\\s+([-\\d.]+)\\s+([-\\d.]+)\\s*\\]"
        .r.findFirstMatchIn(dict)
        .map(m => (m.group(1).toDouble, m.group(2).toDouble,
          m.group(3).toDouble, m.group(4).toDouble))

    val pageObjs = objs.filter(o =>
      "/Type\\s*/Page(?![s])".r.findFirstIn(o.dict).isDefined)
    // /Kids order from the page-tree node(s); fall back to object order
    val kidOrder = objs
      .filter(o => "/Type\\s*/Pages".r.findFirstIn(o.dict).isDefined)
      .flatMap(o => "/Kids\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(o.dict)
        .toSeq.flatMap(m => "(\\d+)\\s+0\\s+R".r.findAllMatchIn(m.group(1))
          .map(_.group(1).toInt)))
    val ordered =
      if (kidOrder.nonEmpty)
        kidOrder.flatMap(byNum.get).filter(pageObjs.contains)
      else pageObjs

    val pages = ordered.map { p =>
      val parentBox = "/Parent\\s+(\\d+)\\s+0\\s+R".r
        .findFirstMatchIn(p.dict)
        .flatMap(m => byNum.get(m.group(1).toInt))
        .flatMap(par => mediaBoxOf(par.dict))
      val box = mediaBoxOf(p.dict).orElse(parentBox)
        .getOrElse((0.0, 0.0, 612.0, 792.0))
      val contentRefs =
        "/Contents\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(p.dict) match {
          case Some(arr) =>
            "(\\d+)\\s+0\\s+R".r.findAllMatchIn(arr.group(1))
              .map(_.group(1).toInt).toSeq
          case None =>
            "/Contents\\s+(\\d+)\\s+0\\s+R".r.findFirstMatchIn(p.dict)
              .map(_.group(1).toInt).toSeq
        }
      val streams = contentRefs.flatMap(byNum.get).flatMap(_.stream)
        .map(new String(_, "ISO-8859-1"))
      val xobjs = xobjectRefs(p.dict, byNum).flatMap { case (nm, ref) =>
        byNum.get(ref).flatMap(imageOf).map(nm -> _)
      }
      Page((box._1, box._2, box._3 - box._1, box._4 - box._2), streams,
        xobjs)
    }
    Doc(pages)
  }

  /** The page's /XObject name->objnum map, through either an inline
    * `/Resources << … >>` dict or a `/Resources N 0 R` indirection. */
  private def xobjectRefs(
      pageDict: String, byNum: Map[Int, RawObj]): Map[String, Int] = {
    val resDict = "/Resources\\s+(\\d+)\\s+0\\s+R".r
      .findFirstMatchIn(pageDict)
      .flatMap(m => byNum.get(m.group(1).toInt)).map(_.dict)
      .orElse("/Resources(?=\\s*<<)".r.findFirstMatchIn(pageDict)
        .flatMap(m => balancedDict(pageDict, m.end)))
    resDict
      .flatMap(rd => "/XObject(?=\\s*<<)".r.findFirstMatchIn(rd)
        .flatMap(m => balancedDict(rd, m.end)))
      .map(xd => "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+0\\s+R".r
        .findAllMatchIn(xd).map(m => m.group(1) -> m.group(2).toInt).toMap)
      .getOrElse(Map.empty)
  }

  /** The balanced `<< … >>` dict starting at or after `from` (nested
    * dicts counted), or None if unterminated. */
  private def balancedDict(text: String, from: Int): Option[String] = {
    val start = text.indexOf("<<", from)
    var res: Option[String] = None
    if (start >= 0) {
      var depth = 0
      var i = start
      while (res.isEmpty && i < text.length - 1) {
        if (text.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (text.startsWith(">>", i)) {
          depth -= 1; i += 2
          if (depth == 0) res = Some(text.substring(start, i))
        } else i += 1
      }
    }
    res
  }

  /** Decode an image XObject in the supported subset: /Subtype /Image,
    * 8 bits/component, /DeviceRGB or /DeviceGray, samples raw or
    * already inflated by [[parse]]'s /FlateDecode path. Anything else
    * (or short sample data) reads as no image — the Do just skips. */
  private def imageOf(o: RawObj): Option[PdfImage] =
    if ("/Subtype\\s*/Image".r.findFirstIn(o.dict).isEmpty) None
    else for {
      w <- "/Width\\s+(\\d+)".r.findFirstMatchIn(o.dict)
        .map(_.group(1).toInt)
      h <- "/Height\\s+(\\d+)".r.findFirstMatchIn(o.dict)
        .map(_.group(1).toInt)
      data <- o.stream
      bpc = "/BitsPerComponent\\s+(\\d+)".r.findFirstMatchIn(o.dict)
        .map(_.group(1).toInt).getOrElse(8)
      if bpc == 8 && w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue
      gray = "/ColorSpace\\s*/DeviceGray".r.findFirstIn(o.dict).isDefined
      if data.length >= w * h * (if (gray) 1 else 3)
    } yield PdfImage(w, h, gray, data)

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) {
        throw new IllegalArgumentException("truncated FlateDecode stream")
      }
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private final case class GState(
      var ctm: AffineTransform,
      var fill: Color,
      var stroke: Color,
      var lineWidth: Double) {
    def copyOf: GState =
      GState(new AffineTransform(ctm), fill, stroke, lineWidth)
  }

  /** Content-stream token: a number, a string literal (already
    * decoded), or a word (operator, /name, or array bracket). */
  private[graft] sealed trait Tok
  private[graft] final case class TNum(s: String) extends Tok
  private[graft] final case class TStr(s: String) extends Tok
  private[graft] final case class TWord(s: String) extends Tok

  /** Lex a content stream per the PDF 1.4 token syntax subset the
    * operator set needs: whitespace/%-comment skipping, `(...)`
    * literals with backslash escapes, octal codes, and balanced
    * nesting, `<...>` hex strings, `[ ] { }` as standalone tokens,
    * `/name` tokens, numbers, operator words. */
  private[graft] def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') {
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val sb = new StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            val e = s.charAt(i + 1)
            if (e >= '0' && e <= '7') {
              var j = i + 1; var v = 0
              while (j < n && j < i + 4 && s.charAt(j) >= '0' &&
                  s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append(v.toChar); i = j
            } else {
              e match {
                case 'n' => sb.append('\n')
                case 'r' => sb.append('\r')
                case 't' => sb.append('\t')
                case 'b' => sb.append('\b')
                case 'f' => sb.append('\f')
                case '\n' | '\r' => () // line continuation
                case other => sb.append(other) // covers \( \) \\
              }
              i += 2
            }
          } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        out += TStr(sb.toString)
      } else if (c == '<') {
        val end0 = s.indexOf('>', i + 1)
        val end = if (end0 < 0) n else end0
        val hex = s.substring(i + 1, end).filterNot(_.isWhitespace)
        val sb = new StringBuilder
        var k = 0
        while (k < hex.length) {
          val hi = Character.digit(hex.charAt(k), 16)
          val lo = if (k + 1 < hex.length)
            Character.digit(hex.charAt(k + 1), 16) else 0 // odd: pad 0
          if (hi >= 0 && lo >= 0) sb.append(((hi << 4) | lo).toChar)
          k += 2
        }
        out += TStr(sb.toString)
        i = if (end0 < 0) n else end + 1
      } else if (c == '[' || c == ']' || c == '{' || c == '}') {
        out += TWord(c.toString); i += 1
      } else if (c == '/') {
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace &&
            "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
        out += TWord(s.substring(i, j)); i = j
      } else {
        var j = i
        while (j < n && !s.charAt(j).isWhitespace &&
            "()<>[]{}/%".indexOf(s.charAt(j)) < 0) j += 1
        val t = s.substring(i, j)
        out += (if (isNumber(t)) TNum(t) else TWord(t))
        i = j
      }
    }
    out.result()
  }

  /** Execute one content stream onto `g2` under the device transform.
    * `xobjs` are the page's named image resources; inline BI…ID…EI
    * images are lifted out of the raw stream first and join the same
    * name space under reserved `__inline<k>` keys. */
  private def run(g2: java.awt.Graphics2D, base: AffineTransform,
      stream: String, xobjs: Map[String, PdfImage]): Unit = {
    val (clean, inlineImgs) = extractInline(stream)
    val images = xobjs ++ inlineImgs
    val toks = tokenize(clean)
    val operands = mutable.ArrayBuffer.empty[Tok]
    var st = GState(new AffineTransform(base), Color.BLACK, Color.BLACK, 1.0)
    val stack = mutable.Stack.empty[GState]
    var path = new GeneralPath()
    var cx = 0.0; var cy = 0.0
    // text state (BT..ET): text matrix, line matrix, size, leading —
    // deliberately NOT part of GState (the spec keeps them separate)
    var tm: AffineTransform = null
    var tlm: AffineTransform = null
    var fontSize = 0.0
    var leading = 0.0

    def num(i: Int): Double = operands(operands.length + i) match {
      case TNum(v) => v.toDouble
      case _ => 0.0 // forgiving reader: a mistyped operand reads as 0
    }

    def paint(draw: Boolean): Unit = {
      g2.setTransform(st.ctm)
      if (draw) {
        g2.setColor(st.stroke)
        g2.setStroke(new BasicStroke(st.lineWidth.toFloat))
        g2.draw(path)
      } else {
        g2.setColor(st.fill)
        g2.fill(path)
      }
      g2.setTransform(new AffineTransform())
      path = new GeneralPath()
    }

    /** Move to the next line: Tlm = translate(tx, ty) applied in line
      * space (java `translate` concatenates on the right = PDF's
      * row-vector T(tx,ty) x Tlm), then Tm restarts at Tlm. */
    def nextLine(tx: Double, ty: Double): Unit = if (tlm != null) {
      tlm.translate(tx, ty)
      tm = new AffineTransform(tlm)
    }

    /** Show glyphs at running text-space offset `off`; returns the
      * advanced offset. Glyph = filled box of the Helvetica AFM
      * advance inset 10% each side, 0.7 em tall; spaces advance only. */
    def showGlyphs(text: String, off0: Double): Double = {
      var off = off0
      if (tm != null && fontSize > 0) {
        val dev = new AffineTransform(st.ctm)
        dev.concatenate(tm)
        g2.setTransform(dev)
        g2.setColor(st.fill)
        text.foreach { ch =>
          val w = glyphAdvance(ch) / 1000.0 * fontSize
          if (!ch.isWhitespace) {
            g2.fill(new java.awt.geom.Rectangle2D.Double(
              off + 0.1 * w, 0, 0.8 * w, 0.7 * fontSize))
          }
          off += w
        }
        g2.setTransform(new AffineTransform())
      }
      off
    }

    /** Tj: show and push the total advance into Tm (the spec's
      * per-glyph Tm update, batched). */
    def showText(text: String): Unit = if (tm != null) {
      val adv = showGlyphs(text, 0.0)
      tm.translate(adv, 0)
    }

    toks.foreach {
      case TWord("q") => stack.push(st.copyOf)
      case TWord("Q") => if (stack.nonEmpty) st = stack.pop()
      case TWord("cm") if operands.length >= 6 =>
        st.ctm.concatenate(new AffineTransform(
          num(-6), num(-5), num(-4), num(-3), num(-2), num(-1)))
        operands.clear()
      case TWord("rg") if operands.length >= 3 =>
        st.fill = rgb(num(-3), num(-2), num(-1)); operands.clear()
      case TWord("RG") if operands.length >= 3 =>
        st.stroke = rgb(num(-3), num(-2), num(-1)); operands.clear()
      case TWord("g") if operands.nonEmpty =>
        st.fill = rgb(num(-1), num(-1), num(-1)); operands.clear()
      case TWord("G") if operands.nonEmpty =>
        st.stroke = rgb(num(-1), num(-1), num(-1)); operands.clear()
      case TWord("w") if operands.nonEmpty =>
        st.lineWidth = num(-1); operands.clear()
      case TWord("re") if operands.length >= 4 =>
        path.append(new java.awt.geom.Rectangle2D.Double(
          num(-4), num(-3), num(-2), num(-1)), false)
        cx = num(-4); cy = num(-3)
        operands.clear()
      case TWord("m") if operands.length >= 2 =>
        cx = num(-2); cy = num(-1); path.moveTo(cx, cy); operands.clear()
      case TWord("l") if operands.length >= 2 =>
        cx = num(-2); cy = num(-1); path.lineTo(cx, cy); operands.clear()
      case TWord("h") => if (path.getCurrentPoint != null) path.closePath()
      case TWord("f") | TWord("F") | TWord("f*") =>
        paint(draw = false); operands.clear()
      case TWord("S") => paint(draw = true); operands.clear()
      case TWord("s") =>
        if (path.getCurrentPoint != null) path.closePath()
        paint(draw = true); operands.clear()
      case TWord("n") => path = new GeneralPath(); operands.clear()

      // ---- external objects: named (or lifted inline) images ----
      // PDF 4.8.3: the sample grid maps onto the UNIT SQUARE of the
      // current CTM, image row 0 at the top — so pixel (u, v) lands at
      // user (u/w, 1 - v/h); concatenating scale(1/w, -1/h) with
      // ty = 1 expresses exactly that. Unknown names skip silently
      // (form XObjects et al. are outside the subset).
      case TWord("Do") =>
        operands.lastOption match {
          case Some(TWord(nm)) if nm.startsWith("/") =>
            images.get(nm.substring(1)).foreach { img =>
              val t = new AffineTransform(st.ctm)
              t.concatenate(new AffineTransform(
                1.0 / img.width, 0, 0, -1.0 / img.height, 0, 1.0))
              g2.drawImage(toBufferedImage(img), t, null)
            }
          case _ => ()
        }
        operands.clear()

      // ---- text object / positioning / showing ----
      case TWord("BT") =>
        tm = new AffineTransform(); tlm = new AffineTransform()
        operands.clear()
      case TWord("ET") => tm = null; tlm = null; operands.clear()
      case TWord("Tf") if operands.nonEmpty =>
        fontSize = num(-1); operands.clear() // /name operand ignored
      case TWord("TL") if operands.nonEmpty =>
        leading = num(-1); operands.clear()
      case TWord("Td") if operands.length >= 2 =>
        nextLine(num(-2), num(-1)); operands.clear()
      case TWord("TD") if operands.length >= 2 =>
        leading = -num(-1); nextLine(num(-2), num(-1)); operands.clear()
      case TWord("Tm") if operands.length >= 6 =>
        tlm = new AffineTransform(
          num(-6), num(-5), num(-4), num(-3), num(-2), num(-1))
        tm = new AffineTransform(tlm)
        operands.clear()
      case TWord("T*") => nextLine(0, -leading); operands.clear()
      case TWord("Tj") if operands.nonEmpty =>
        operands.last match {
          case TStr(t) => showText(t)
          case _ => ()
        }
        operands.clear()
      case TWord("'") if operands.nonEmpty =>
        operands.last match {
          case TStr(t) => nextLine(0, -leading); showText(t)
          case _ => ()
        }
        operands.clear()
      case TWord("\"") if operands.nonEmpty =>
        // aw ac string " — word/char spacing unsupported (read as 0)
        operands.last match {
          case TStr(t) => nextLine(0, -leading); showText(t)
          case _ => ()
        }
        operands.clear()
      case TWord("TJ") =>
        // elements between the opening [ and the closing ]: strings
        // show, numbers back the pen up by thousandths of an em
        val open = operands.lastIndexOf(TWord("["))
        if (tm != null && open >= 0) {
          var off = 0.0
          operands.drop(open + 1).foreach {
            case TStr(t) => off = showGlyphs(t, off)
            case TNum(v) => off -= v.toDouble / 1000.0 * fontSize
            case _ => ()
          }
          tm.translate(off, 0)
        }
        operands.clear()

      case t @ (TNum(_) | TStr(_)) => operands += t
      case b @ (TWord("[") | TWord("]")) => operands += b // TJ delimiters
      case TWord(nm) if nm.startsWith("/") => operands += TWord(nm)
      case _ => operands.clear() // unknown operator: drop its operands
    }
  }

  private def isDelimOrWs(c: Char): Boolean =
    c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

  /** Index of the next standalone occurrence of token `w` (bounded by
    * whitespace/delimiters on both sides) at or after `from`; -1 if
    * none. */
  private def findToken(s: String, from: Int, w: String): Int = {
    var i = s.indexOf(w, from)
    var found = -1
    while (found < 0 && i >= 0) {
      val after = i + w.length
      if ((i == 0 || isDelimOrWs(s.charAt(i - 1))) &&
          (after >= s.length || isDelimOrWs(s.charAt(after)))) found = i
      else i = s.indexOf(w, i + 1)
    }
    found
  }

  /** Lift inline `BI <params> ID <binary> EI` images out of a content
    * stream: each becomes a `/__inline<k> Do` invocation in the
    * rewritten stream plus a decoded [[PdfImage]]. Binary data starts
    * one whitespace byte after `ID` and ends at the first
    * whitespace-delimited `EI` (the spec's own reader rule — writers
    * must not emit colliding byte runs, and /Fl payloads make one
    * vanishingly unlikely). Malformed trailers drop the remainder of
    * the stream, matching the forgiving-reader stance elsewhere. */
  private[graft] def extractInline(
      stream: String): (String, Map[String, PdfImage]) = {
    val out = new StringBuilder
    val imgs = mutable.Map.empty[String, PdfImage]
    val n = stream.length
    var i = 0
    var k = 0
    while (i < n) {
      val bi = findToken(stream, i, "BI")
      if (bi < 0) { out.append(stream.substring(i)); i = n }
      else {
        out.append(stream.substring(i, bi))
        val id = findToken(stream, bi, "ID")
        if (id < 0) { out.append(stream.substring(bi)); i = n }
        else {
          var dstart = id + 2
          if (dstart < n && stream.charAt(dstart).isWhitespace) dstart += 1
          var e = dstart
          var end = -1
          while (end < 0 && e + 2 < n) {
            if (stream.charAt(e).isWhitespace &&
                stream.charAt(e + 1) == 'E' && stream.charAt(e + 2) == 'I' &&
                (e + 3 >= n || isDelimOrWs(stream.charAt(e + 3)))) end = e
            else e += 1
          }
          if (end < 0) i = n
          else {
            parseInlineParams(stream.substring(bi + 2, id),
                stream.substring(dstart, end)).foreach { img =>
              val nm = s"__inline$k"
              imgs(nm) = img
              out.append(s" /$nm Do ")
              k += 1
            }
            i = end + 3
          }
        }
      }
    }
    (out.toString, imgs.toMap)
  }

  /** Inline-image parameter dict in the spec's abbreviated (or full)
    * keys: /W /H /CS (/G=gray, /RGB=rgb) /BPC /F (/Fl=FlateDecode).
    * Same supported subset as [[imageOf]]. */
  private def parseInlineParams(
      params: String, dataStr: String): Option[PdfImage] = {
    def intKey(keys: Seq[String]): Option[Int] = keys.iterator
      .flatMap(key => ("/" + key + "\\s+(\\d+)").r
        .findFirstMatchIn(params).map(_.group(1).toInt))
      .nextOption()
    val gray =
      "/(CS|ColorSpace)\\s*/(G|DeviceGray)\\b".r
        .findFirstIn(params).isDefined
    val flate =
      "/(F|Filter)\\s*/(Fl|FlateDecode)\\b".r.findFirstIn(params).isDefined
    val raw = dataStr.getBytes("ISO-8859-1")
    val data = if (flate) inflate(raw) else raw
    for {
      w <- intKey(Seq("Width", "W"))
      h <- intKey(Seq("Height", "H"))
      bpc = intKey(Seq("BitsPerComponent", "BPC")).getOrElse(8)
      // same long-arithmetic bound as imageOf: malformed /W /H must not
      // overflow Int in w*h*(1|3) (a negative product would pass the
      // data-length check and crash downstream — the forgiving-reader
      // contract says malformed images read as no image)
      if bpc == 8 && w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue &&
        data.length >= w * h * (if (gray) 1 else 3)
    } yield PdfImage(w, h, gray, data)
  }

  private def toBufferedImage(img: PdfImage): BufferedImage = {
    val bi = new BufferedImage(img.width, img.height,
      BufferedImage.TYPE_INT_RGB)
    var p = 0
    var i = 0
    val total = img.width * img.height
    while (p < total) {
      val rgbVal =
        if (img.gray) {
          val v = img.samples(i) & 0xff; i += 1
          (v << 16) | (v << 8) | v
        } else {
          val r = img.samples(i) & 0xff
          val g = img.samples(i + 1) & 0xff
          val b = img.samples(i + 2) & 0xff
          i += 3
          (r << 16) | (g << 8) | b
        }
      bi.setRGB(p % img.width, p / img.width, rgbVal)
      p += 1
    }
    bi
  }

  // PDF real syntax allows trailing- and leading-dot forms ("4." and
  // ".5"); rejecting them would spill a valid operand into the
  // unknown-operator branch and clear the whole pending stack.
  private def isNumber(t: String): Boolean =
    t.nonEmpty && t.matches("[-+]?([0-9]+\\.?[0-9]*|\\.[0-9]+)")

  /** Advance widths (thousandths of an em) for ASCII 32-126 from the
    * public Adobe Type1 core-font Helvetica AFM — the PDF 1.4 base-14
    * metrics every conforming reader carries. Characters outside the
    * table advance by the Helvetica lowercase default 556. */
  private val HelveticaWidths: Array[Int] = Array(
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278,
    333, 278, 278, // space ! " # $ % & ' ( ) * + , - . /
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556, // 0-9
    278, 278, 584, 584, 584, 556, 1015, // : ; < = > ? @
    667, 667, 722, 722, 667, 611, 778, 722, 278, 500, 667, 556, 833,
    722, 778, 667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611, // A-Z
    278, 278, 278, 469, 556, 333, // [ \ ] ^ _ `
    556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833,
    556, 556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500, // a-z
    334, 260, 334, 584) // { | } ~

  private[graft] def glyphAdvance(ch: Char): Int =
    if (ch >= 32 && ch <= 126) HelveticaWidths(ch - 32) else 556

  private def rgb(r: Double, g: Double, b: Double): Color =
    new Color(clamp01(r).toFloat, clamp01(g).toFloat, clamp01(b).toFloat)

  private def clamp01(x: Double): Double = math.max(0.0, math.min(1.0, x))
}
