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
  *  - device mapping: dpi/72 scale with the y-axis flip (PDF origin is
  *    bottom-left), so a box at (x, y) lands at pixel row
  *    `H - y·s` — stroke pen width scales with the CTM exactly as the
  *    spec's user-space pen does.
  *
  * Out of scope (documented boundary, not silent): font programs /
  * glyph outlines (boxes above), images, shading, clipping — a fixture
  * that needs them still rasterizes, with those operators skipped. */
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
      val base = new AffineTransform(s, 0, 0, -s, 0, hPx.toDouble)
      base.translate(-page.mediaBox._1, -page.mediaBox._2)
      page.content.foreach(stream => run(g2, base, stream))
      g2.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      RasterizedPage(i + 1, wPx, hPx, out.toByteArray)
    }
  }
}

object ContentStreamRasterizer {

  final case class Page(
      mediaBox: (Double, Double, Double, Double),
      content: Seq[String])
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
      Page((box._1, box._2, box._3 - box._1, box._4 - box._2), streams)
    }
    Doc(pages)
  }

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

  /** Execute one content stream onto `g2` under the device transform. */
  private def run(g2: java.awt.Graphics2D, base: AffineTransform,
      stream: String): Unit = {
    val toks = tokenize(stream)
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
