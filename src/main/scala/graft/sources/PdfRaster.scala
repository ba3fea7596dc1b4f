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
  *  - device mapping: dpi/72 scale with the y-axis flip (PDF origin is
  *    bottom-left), so a box at (x, y) lands at pixel row
  *    `H - y·s` — stroke pen width scales with the CTM exactly as the
  *    spec's user-space pen does.
  *
  * Out of scope (documented boundary, not silent): fonts/text
  * rendering, images, shading, clipping — a fixture that needs them
  * still rasterizes, with those operators skipped. */
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

  /** Execute one content stream onto `g2` under the device transform. */
  private def run(g2: java.awt.Graphics2D, base: AffineTransform,
      stream: String): Unit = {
    val toks = stream.split("\\s+").filter(_.nonEmpty)
    val operands = mutable.ArrayBuffer.empty[String]
    var st = GState(new AffineTransform(base), Color.BLACK, Color.BLACK, 1.0)
    val stack = mutable.Stack.empty[GState]
    var path = new GeneralPath()
    var cx = 0.0; var cy = 0.0

    def num(i: Int): Double = operands(operands.length + i).toDouble

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

    toks.foreach {
      case "q" => stack.push(st.copyOf)
      case "Q" => if (stack.nonEmpty) st = stack.pop()
      case "cm" if operands.length >= 6 =>
        st.ctm.concatenate(new AffineTransform(
          num(-6), num(-5), num(-4), num(-3), num(-2), num(-1)))
        operands.clear()
      case "rg" if operands.length >= 3 =>
        st.fill = rgb(num(-3), num(-2), num(-1)); operands.clear()
      case "RG" if operands.length >= 3 =>
        st.stroke = rgb(num(-3), num(-2), num(-1)); operands.clear()
      case "g" if operands.nonEmpty =>
        st.fill = rgb(num(-1), num(-1), num(-1)); operands.clear()
      case "G" if operands.nonEmpty =>
        st.stroke = rgb(num(-1), num(-1), num(-1)); operands.clear()
      case "w" if operands.nonEmpty =>
        st.lineWidth = num(-1); operands.clear()
      case "re" if operands.length >= 4 =>
        path.append(new java.awt.geom.Rectangle2D.Double(
          num(-4), num(-3), num(-2), num(-1)), false)
        cx = num(-4); cy = num(-3)
        operands.clear()
      case "m" if operands.length >= 2 =>
        cx = num(-2); cy = num(-1); path.moveTo(cx, cy); operands.clear()
      case "l" if operands.length >= 2 =>
        cx = num(-2); cy = num(-1); path.lineTo(cx, cy); operands.clear()
      case "h" => if (path.getCurrentPoint != null) path.closePath()
      case "f" | "F" | "f*" => paint(draw = false); operands.clear()
      case "S" => paint(draw = true); operands.clear()
      case "s" =>
        if (path.getCurrentPoint != null) path.closePath()
        paint(draw = true); operands.clear()
      case "n" => path = new GeneralPath(); operands.clear()
      case t if isNumber(t) => operands += t
      case _ => operands.clear() // unknown operator: drop its operands
    }
  }

  // PDF real syntax allows trailing- and leading-dot forms ("4." and
  // ".5"); rejecting them would spill a valid operand into the
  // unknown-operator branch and clear the whole pending stack.
  private def isNumber(t: String): Boolean =
    t.nonEmpty && t.matches("[-+]?([0-9]+\\.?[0-9]*|\\.[0-9]+)")

  private def rgb(r: Double, g: Double, b: Double): Color =
    new Color(clamp01(r).toFloat, clamp01(g).toFloat, clamp01(b).toFloat)

  private def clamp01(x: Double): Double = math.max(0.0, math.min(1.0, x))
}
