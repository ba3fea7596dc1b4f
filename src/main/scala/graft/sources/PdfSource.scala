package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.PageImage

/** S1 — the PDF split source (reference: pdf_utils.py:11-64) re-expressed
  * Spark-first: `binaryFile` scan -> per-file page fan-out via typed
  * flatMap. No S3->tmp->S3 hops: bytes stay in columns end-to-end; page
  * naming follows the reference's `{base}_page_{n}.png` scheme and dpi is
  * a source option.
  *
  * Rasterizer boundary: real PDF rasterization needs a PDF renderer
  * (PDFBox et al. — not present in this environment), so it sits behind
  * [[PageRasterizer]]. [[StructuralRasterizer]] is the bundled
  * implementation: it derives the page count by scanning the PDF object
  * structure for page objects (works on uncompressed-object PDFs) and
  * emits REAL PNG bytes (JDK ImageIO) of placeholder pages at the
  * requested dpi — the Spark-side plumbing (schema, fan-out, naming,
  * bytes-in-column) is fully real; only pixel content is synthetic.
  */
final case class RasterizedPage(
    page_no: Int, width: Int, height: Int, png: Array[Byte])

trait PageRasterizer extends Serializable {
  def rasterize(pdfBytes: Array[Byte], dpi: Int): Seq[RasterizedPage]
}

class StructuralRasterizer extends PageRasterizer {
  override def rasterize(pdfBytes: Array[Byte], dpi: Int): Seq[RasterizedPage] = {
    val text = new String(pdfBytes, "ISO-8859-1")
    val pageCount =
      "/Type\\s*/Page(?![s])".r.findAllMatchIn(text).length.max(1)
    // A4 at the requested dpi, like the reference's dpi=250 default
    val w = (8.27 * dpi).toInt
    val h = (11.69 * dpi).toInt
    (1 to pageCount).map { p =>
      val img = new java.awt.image.BufferedImage(
        math.min(w, 64), math.min(h, 64),
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, p) // deterministic per-page pixel marker
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      RasterizedPage(p, w, h, out.toByteArray)
    }
  }
}

object PdfSource {

  /** Binary-file scan over a directory of PDFs. */
  def readPdfs(spark: SparkSession, path: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(path)
      .select(col("path"), col("content"))

  /** Page fan-out: one [[PageImage]] row (+ PNG bytes) per page, named
    * `pages/valid/{base}_page_{n}.png` (pdf_utils.py:50, 57). */
  def splitToPages(
      pdfs: DataFrame,
      shopOf: String => String,
      rasterizer: PageRasterizer,
      dpi: Int = 250): Dataset[PageImage] = {
    import pdfs.sparkSession.implicits._
    pdfs.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val fileName = path.substring(path.lastIndexOf('/') + 1)
        val base = fileName.stripSuffix(".pdf")
        rasterizer.rasterize(bytes, dpi).map { pg =>
          PageImage(s"pages/valid/${base}_page_${pg.page_no}.png",
            fileName, shopOf(fileName), pg.page_no, pg.width, pg.height)
        }
      }
  }

  /** Deterministic fixture: writes tiny hand-built PDFs into a
    * directory; returns the dir. Page counts: a.pdf=2, b.pdf=1,
    * c.pdf=3 — and since r11 every page carries a REAL content stream
    * (a per-page-colored filled box, a stroked diagonal, and on c.pdf
    * page 2 a q/cm/Q transformed box) so [[ContentStreamRasterizer]]
    * renders genuine pixels. b.pdf's stream is /FlateDecode-compressed
    * to exercise the inflate path. Since r12 every page references a
    * shared 2x2 /DeviceRGB image XObject (drawn by Do on a.pdf page 1)
    * and c.pdf page 3 carries an inline /Fl gray BI/ID/EI image. */
  def writeFixturePdfs(dir: String): String = {
    def deflate(data: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      out.toByteArray
    }
    /** Per-page content: fill color keyed by (file, page) so specs can
      * assert exact pixels; coordinates in PDF points, origin
      * bottom-left. */
    def content(fileIdx: Int, page: Int): String = {
      val extra =
        if (fileIdx == 2 && page == 2)
          "\nq 2 0 0 2 100 50 cm 0 0 0.9 rg 10 20 30 40 re f Q"
        else if (fileIdx == 0 && page == 1)
          // the shared /Im1 XObject placed into a 40x40pt square —
          // quadrant colors prove the unit-square mapping + top-row-
          // first image order
          "\nq 40 0 0 40 450 100 cm /Im1 Do Q"
        else if (fileIdx == 2 && page == 3) {
          // inline gray image, /Fl-compressed, abbreviated keys —
          // exercises BI/ID/EI lifting + the inline FlateDecode path
          val data = new String(
            deflate(Array[Byte](0, -1, 0x80.toByte, 0xc0.toByte)),
            "ISO-8859-1")
          s"\nq 30 0 0 30 500 300 cm BI /W 2 /H 2 /CS /G /BPC 8 /F /Fl" +
            s" ID $data EI Q"
        } else ""
      // flyer-style text: a headline line and a T*-advanced price line
      // (glyph boxes give crops/OCR fixtures positional text signal)
      s"""0.8 ${0.1 * page} ${0.2 * (fileIdx + 1)} rg
         |${50 + 10 * page} 100 200 150 re f
         |0 0 1 RG 4 w
         |100 700 m 400 650 l S$extra
         |BT /F1 24 Tf 30 TL 60 760 Td (SALE $page) Tj T*
         |[(Kc) -500 (99.90)] TJ ET""".stripMargin
    }
    def pdf(fileIdx: Int, pages: Int, flate: Boolean): Array[Byte] = {
      val kids = (0 until pages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      val imgObj = 3 + 2 * pages
      val pageObjs = (0 until pages).map { i =>
        val pObj = 3 + 2 * i
        val cObj = 4 + 2 * i
        val raw = content(fileIdx, i + 1).getBytes("ISO-8859-1")
        val payload = if (flate) deflate(raw) else raw
        val filter = if (flate) " /Filter /FlateDecode" else ""
        val head =
          (s"$pObj 0 obj << /Type /Page /Parent 2 0 R " +
            s"/MediaBox [0 0 595 842] " +
            s"/Resources << /XObject << /Im1 $imgObj 0 R >> >> " +
            s"/Contents $cObj 0 R >> endobj\n" +
            s"$cObj 0 obj << /Length ${payload.length}$filter >> stream\n")
            .getBytes("ISO-8859-1")
        head ++ payload ++ "\nendstream endobj".getBytes("ISO-8859-1")
      }
      // shared 2x2 DeviceRGB image XObject (raw samples, top row
      // first): red | green / blue | white — quadrant colors the raster
      // spec asserts pixel-exactly
      val imgSamples = Array[Byte](
        -1, 0, 0, 0, -1, 0, // row 0: red, green
        0, 0, -1, -1, -1, -1) // row 1: blue, white
      val imgBytes =
        (s"$imgObj 0 obj << /Type /XObject /Subtype /Image /Width 2 " +
          s"/Height 2 /ColorSpace /DeviceRGB /BitsPerComponent 8 " +
          s"/Length ${imgSamples.length} >> stream\n")
          .getBytes("ISO-8859-1") ++
          imgSamples ++ "\nendstream endobj".getBytes("ISO-8859-1")
      val header =
        (s"""%PDF-1.4
           |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
           |2 0 obj << /Type /Pages /Kids [$kids] /Count $pages >> endobj
           |""".stripMargin).getBytes("ISO-8859-1")
      val trailer = "\ntrailer << /Root 1 0 R >>\n%%EOF\n"
        .getBytes("ISO-8859-1")
      header ++
        (pageObjs :+ imgBytes).reduce(_ ++ "\n".getBytes("ISO-8859-1") ++ _) ++
        trailer
    }
    val d = new java.io.File(dir)
    d.mkdirs()
    Seq(("a.pdf", 0, 2, false), ("b.pdf", 1, 1, true),
        ("c.pdf", 2, 3, false)).foreach { case (n, fi, p, fl) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, n), pdf(fi, p, fl))
    }
    dir
  }
}
