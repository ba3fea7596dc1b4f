package graft

import java.nio.file.Files

import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ContentStreamRasterizer, PdfSource}

/** The from-scratch content-stream rasterizer renders REAL pixels from
  * the fixture PDFs' own content streams: exact fill colors inside the
  * drawn boxes, white outside, the Flate path identical to raw, q/cm/Q
  * transforms honored, and full determinism. */
class PdfRasterSpec extends AnyFunSuite {

  private val Dpi = 250
  private def s = Dpi / 72.0

  private lazy val dir = PdfSource.writeFixturePdfs(
    Files.createTempDirectory("pdfraster").toString)

  private def pagesOf(name: String) =
    new ContentStreamRasterizer().rasterize(
      Files.readAllBytes(java.nio.file.Paths.get(dir, name)), Dpi)

  /** Device pixel for PDF point (x, y): y flips around the page top. */
  private def px(x: Double): Int = math.round(x * s).toInt
  private def py(y: Double, hPx: Int): Int = hPx - 1 - math.round(y * s).toInt

  private def rgbAt(png: Array[Byte], x: Int, y: Int): Int =
    ImageIO.read(new java.io.ByteArrayInputStream(png)).getRGB(x, y) & 0xffffff

  private def expectedFill(fileIdx: Int, page: Int): Int = {
    // content() in writeFixturePdfs: rg 0.8, 0.1*page, 0.2*(fileIdx+1)
    val c = new java.awt.Color(0.8f, (0.1 * page).toFloat,
      (0.2 * (fileIdx + 1)).toFloat)
    c.getRGB & 0xffffff
  }

  test("page dims derive from the MediaBox, not an assumed paper size") {
    val pages = pagesOf("a.pdf")
    assert(pages.map(_.page_no) == Seq(1, 2))
    assert(pages.forall(p =>
      p.width == math.round(595 * s).toInt &&
        p.height == math.round(842 * s).toInt))
  }

  test("filled boxes land at their PDF coordinates in their exact color") {
    for ((name, fi, n) <- Seq(("a.pdf", 0, 2), ("c.pdf", 2, 3))) {
      val pages = pagesOf(name)
      assert(pages.length == n)
      for (p <- pages) {
        val h = p.height
        // box: (50 + 10*page, 100) size 200x150 — probe its center
        val cx = px(50 + 10 * p.page_no + 100)
        val cy = py(100 + 75, h)
        assert(rgbAt(p.png, cx, cy) == expectedFill(fi, p.page_no),
          s"$name page ${p.page_no}: wrong fill at box center")
        // outside every drawn shape: white background
        assert(rgbAt(p.png, px(500), py(300, h) - h / 4) == 0xffffff ||
          rgbAt(p.png, px(520), py(400, h)) == 0xffffff)
        // the stroked diagonal from (100,700) to (400,650) in pure blue:
        // probe its midpoint
        val mx = px(250); val my = py(675, h)
        val nearLine = (for {
          dx <- -8 to 8; dy <- -8 to 8
        } yield rgbAt(p.png, mx + dx, my + dy)).exists(_ == 0x0000ff)
        assert(nearLine, s"$name page ${p.page_no}: stroked line missing")
      }
    }
  }

  test("text shows as positioned glyph boxes (Tf/TL/Td/T*/Tj/TJ)") {
    // fixture text: BT /F1 24 Tf 30 TL 60 760 Td (SALE 1) Tj T*
    //               [(Kc) -500 (99.90)] TJ ET   (a.pdf page 1)
    // Glyph boxes use the Helvetica AFM advances at 24pt: S=A=16.008pt,
    // L=13.344, E=16.008, K=16.008, c=12.0, digits 13.344; box = the
    // advance inset 10% each side, 0.7em (16.8pt) tall, text color =
    // the current fill (the page's rg from the stream head).
    val p1 = pagesOf("a.pdf").head
    val h = p1.height
    val fill = expectedFill(0, 1)
    // the S glyph box spans x [61.6, 74.4]pt, y [760, 776.8]pt
    assert(rgbAt(p1.png, px(68), py(768, h)) == fill, "S glyph missing")
    // inter-glyph inset gap at the S/A boundary stays background white
    assert(rgbAt(p1.png, px(76), py(768, h)) == 0xffffff, "S/A gap filled")
    // above cap height: white
    assert(rgbAt(p1.png, px(68), py(780, h)) == 0xffffff)
    // second line via TL 30 + T*: baseline 730 — the K of "Kc"
    assert(rgbAt(p1.png, px(68), py(738, h)) == fill, "K glyph missing")
    // the TJ -500 thousandths element opens a 12pt pen gap before the
    // price: [86.8, 101.3]pt stays white
    assert(rgbAt(p1.png, px(94), py(738, h)) == 0xffffff, "TJ gap filled")
    // the first 9 lands after the adjusted pen: box [101.3, 112.0]pt
    assert(rgbAt(p1.png, px(106.7), py(738, h)) == fill, "9 glyph missing")
  }

  test("content lexer: escapes, nesting, octal, hex strings") {
    import graft.sources.ContentStreamRasterizer._
    assert(tokenize("(a\\)b) Tj") ==
      Vector(TStr("a)b"), TWord("Tj")))
    assert(tokenize("(a (nested) b) Tj").head == TStr("a (nested) b"))
    assert(tokenize("(\\101\\102) Tj").head == TStr("AB"))
    assert(tokenize("<4B63> Tj").head == TStr("Kc"))
    assert(tokenize("[(A) -120 (B)] TJ") == Vector(TWord("["), TStr("A"),
      TNum("-120"), TStr("B"), TWord("]"), TWord("TJ")))
    assert(tokenize("/F1 24 Tf % comment\n(x) Tj") == Vector(
      TWord("/F1"), TNum("24"), TWord("Tf"), TStr("x"), TWord("Tj")))
  }

  test("FlateDecode content renders exactly like the raw twin") {
    val b = pagesOf("b.pdf")
    assert(b.length == 1)
    val h = b.head.height
    assert(rgbAt(b.head.png, px(160), py(175, h)) == expectedFill(1, 1),
      "flate-compressed stream must render its fill")
  }

  test("q/cm/Q transform: the scaled+translated box on c.pdf page 2") {
    val p = pagesOf("c.pdf")(1)
    val h = p.height
    // content: q 2 0 0 2 100 50 cm (10 20 30 40 re, 0 0 0.9 rg) f Q
    // box in user space after cm: origin (100 + 2*10, 50 + 2*20),
    // size (60, 80) — probe its center
    val cx = px(100 + 20 + 30)
    val cy = py(50 + 40 + 40, h)
    val blue = new java.awt.Color(0f, 0f, 0.9f).getRGB & 0xffffff
    assert(rgbAt(p.png, cx, cy) == blue, "transformed box missing/misplaced")
    // and the un-transformed page-2 box still renders at its own spot
    assert(rgbAt(p.png, px(70 + 100), py(175, h)) == expectedFill(2, 2))
  }

  test("image XObject: Do maps the sample grid onto the CTM unit square") {
    // a.pdf page 1: q 40 0 0 40 450 100 cm /Im1 Do Q over the shared
    // 2x2 /DeviceRGB XObject (top row red|green, bottom row blue|white)
    // — image row 0 maps to the TOP of the placed square (the spec's
    // image-space flip), so user y [120,140] shows the red|green row.
    val p1 = pagesOf("a.pdf").head
    val h = p1.height
    assert(rgbAt(p1.png, px(460), py(130, h)) == 0xff0000, "top-left red")
    assert(rgbAt(p1.png, px(480), py(130, h)) == 0x00ff00, "top-right green")
    assert(rgbAt(p1.png, px(460), py(110, h)) == 0x0000ff, "bottom-left blue")
    assert(rgbAt(p1.png, px(480), py(110, h)) == 0xffffff, "bottom-right white")
    // just outside the placed square: background white
    assert(rgbAt(p1.png, px(445), py(130, h)) == 0xffffff)
    // pages that never invoke Do keep that area untouched even though
    // the resource is attached to every page
    val p2 = pagesOf("a.pdf")(1)
    assert(rgbAt(p2.png, px(460), py(130, p2.height)) == 0xffffff)
  }

  test("inline image: BI/ID/EI with abbreviated keys and /Fl data") {
    // c.pdf page 3: q 30 0 0 30 500 300 cm BI /W 2 /H 2 /CS /G /BPC 8
    // /F /Fl ID <deflate(00 ff 80 c0)> EI Q — gray quadrants, top row
    // first: black|white over 0x80|0xc0.
    val p3 = pagesOf("c.pdf")(2)
    val h = p3.height
    assert(rgbAt(p3.png, px(507), py(322, h)) == 0x000000, "top-left black")
    assert(rgbAt(p3.png, px(522), py(322, h)) == 0xffffff, "top-right white")
    assert(rgbAt(p3.png, px(507), py(307, h)) == 0x808080, "bottom-left gray")
    assert(rgbAt(p3.png, px(522), py(307, h)) == 0xc0c0c0, "bottom-right gray")
    // the graphics state around the lifted image survives the rewrite:
    // the page's own box still renders in its exact fill color
    assert(rgbAt(p3.png, px(80 + 100), py(175, h)) == expectedFill(2, 3))
  }

  test("inline extraction rewrites the stream without touching the rest") {
    import graft.sources.ContentStreamRasterizer._
    val (clean, imgs) = extractInline(
      "1 0 0 1 5 5 cm BI /W 1 /H 1 /CS /G /BPC 8 ID " +
        0.toChar + " EI 9 8 re f")
    assert(imgs.keySet == Set("__inline0"))
    val img = imgs("__inline0")
    assert(img.width == 1 && img.height == 1 && img.gray)
    assert(img.samples.toSeq == Seq(0: Byte))
    assert(clean.replaceAll("\\s+", " ").trim ==
      "1 0 0 1 5 5 cm /__inline0 Do 9 8 re f")
    // no BI: stream passes through untouched
    val (same, none) = extractInline("10 20 re f")
    assert(same == "10 20 re f" && none.isEmpty)
  }

  test("forgiving reader: malformed image material never aborts a page") {
    import graft.sources.ContentStreamRasterizer._
    // short sample data -> the image decodes to None, Do skips
    val (_, short) = extractInline("BI /W 4 /H 4 /CS /G /BPC 8 ID " +
      0.toChar + " EI")
    assert(short.isEmpty, "undersized data must not produce an image")
    // unsupported bit depth -> skipped
    val (_, bpc1) = extractInline("BI /W 8 /H 1 /CS /G /BPC 1 ID " +
      0.toChar + " EI")
    assert(bpc1.isEmpty)
    // unterminated inline image: the remainder drops, nothing throws
    val (c3, none) = extractInline("1 1 re f BI /W 1 /H 1 ID forever")
    assert(c3.startsWith("1 1 re f") && none.isEmpty)
    // /W /H that overflow Int in w*h*3 must read as no image, not pass
    // the length check on a negative product and crash downstream (the
    // same long-arithmetic bound the XObject path carries)
    val (_, huge) = extractInline(
      "BI /W 2000000 /H 2000000 /CS /G /BPC 8 ID " + 0.toChar + " EI")
    assert(huge.isEmpty, "overflowing dimensions must not produce an image")
    // Do naming a missing resource renders the rest of the page: build
    // a one-page PDF whose stream invokes /Nope before a known box
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] " +
      "/Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 34 >> stream\n" +
      "/Nope Do 1 0 0 rg 10 10 50 50 re f\n" +
      "endstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n")
      .getBytes("ISO-8859-1")
    val pages = new ContentStreamRasterizer().rasterize(pdf, 72)
    assert(pages.length == 1)
    assert(rgbAt(pages.head.png, 30, 99 - 30) == 0xff0000,
      "content after a dangling Do must still render")
  }

  test("rasterization is deterministic byte-for-byte") {
    val a1 = pagesOf("a.pdf").map(_.png.toSeq)
    val a2 = pagesOf("a.pdf").map(_.png.toSeq)
    assert(a1 == a2)
  }
}
