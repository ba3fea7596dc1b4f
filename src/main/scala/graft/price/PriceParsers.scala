package graft.price

import java.util.regex.Pattern

/** Unified result type for all shop price parsers.
  *
  * The reference's parsers return a union of bare float / dict with varying
  * keys / magic string (see dags/utils/price_processing.py:24-334); this
  * engine unifies them into one nullable struct (SURVEY §1.2):
  *   - dict key "item_price"          -> itemPrice
  *   - dict key "initial_price"       -> initialPrice
  *   - dict key "item_member_price"   -> memberPrice (numeric)
  *   - dict key "item_initial_price"  -> initialPrice
  *   - dict key "volume"              -> volume
  *   - dict key "packaging"           -> packaging
  *   - dict key "cena bez dph"        -> priceExVat (Ratio, price ex-VAT)
  *   - magic string '75bodi'          -> memberTag (Billa loyalty points)
  *   - bare float                     -> the field matching the requested
  *                                       class_id (that is where the caller
  *                                       stores it, dags/data_pipeline.py:116-123)
  */
final case class PriceResult(
    item_price: Option[Double] = None,
    initial_price: Option[Double] = None,
    member_price: Option[Double] = None,
    volume: Option[String] = None,
    packaging: Option[String] = None,
    price_ex_vat: Option[Double] = None,
    member_tag: Option[String] = None)

/** Shop-specific price parsing — faithful re-expression of the reference's
  * 17 parsers + dispatcher (dags/utils/price_processing.py). Pure functions:
  * ideal for Catalyst constant-folding when wrapped as expressions; exposed
  * as a deterministic ScalaUDF in [[PriceFunctions]].
  */
object PriceParsers {

  private val numberToken = Pattern.compile("\\d+[.,]?\\d*")

  /** Core numeric parse (reference: price_processing.py:5-20):
    * keep only [0-9.,], comma -> dot; if no dot and more than 2 digits the
    * last two digits are cents ("1990" -> 19.90); unparseable -> None.
    */
  def parsePrice(priceStr: String): Option[Double] = {
    if (priceStr == null) return None
    val clean = priceStr
      .filter(c => (c >= '0' && c <= '9') || c == '.' || c == ',')
      .replace(',', '.')
    val candidate =
      if (clean.contains('.')) clean
      else if (clean.length > 2) clean.dropRight(2) + "." + clean.takeRight(2)
      else clean
    // Python float() semantics on [0-9.]-only strings: "", ".", "1.2.3" fail
    if (candidate.isEmpty) None
    else
      try Some(java.lang.Double.parseDouble(candidate))
      catch { case _: NumberFormatException => None }
  }

  /** `re.findall(r'\d+[.,]?\d*', s)` then parse each, keeping successes. */
  def findPrices(s: String): List[Double] = {
    val m = numberToken.matcher(s)
    val out = List.newBuilder[Double]
    while (m.find()) parsePrice(m.group()).foreach(out += _)
    out.result()
  }

  private def single(classId: String, p: Double): PriceResult = classId match {
    case "item_member_price"  => PriceResult(member_price = Some(p))
    case "item_initial_price" => PriceResult(initial_price = Some(p))
    case _                    => PriceResult(item_price = Some(p))
  }

  /** EsoMarket (price_processing.py:24-26). Preserves the reference's falsy
    * check: a parsed 0.0 yields None. */
  def esomarket(s: String, classId: String): Option[PriceResult] =
    parsePrice(s).filter(_ != 0.0).map(p => single(classId, p))

  /** Penny (price_processing.py:29-56). */
  def penny(s: String): Option[PriceResult] = {
    val ps = findPrices(s)
    ps match {
      case p0 :: p1 :: p2 :: Nil =>
        // "19 90 25.90 2"-style: integer parts joined as int.cents
        val item = s"${p0.toInt}.${p1.toInt}".toDouble
        Some(PriceResult(item_price = Some(item), initial_price = Some(p2)))
      case p0 :: p1 :: Nil =>
        if (p1 == 90.0 || p1 == 99.0)
          Some(PriceResult(item_price = Some(s"${p0.toInt}.${p1.toInt}".toDouble)))
        else Some(PriceResult(item_price = Some(p0), initial_price = Some(p1)))
      case p0 :: Nil => Some(PriceResult(item_price = Some(p0)))
      case _         => None
    }
  }

  /** Billa (price_processing.py:60-83). 'bodi'/'bodu' -> loyalty-points
    * member tag; a second integer < 5 is a volume, not an initial price. */
  def billa(s: String): Option[PriceResult] = {
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    if (lower.contains("bodi") || lower.contains("bodu"))
      return Some(PriceResult(member_tag = Some("75bodi")))
    findPrices(s) match {
      case p0 :: p1 :: Nil =>
        if (p1 < 5 && p1.isWhole)
          Some(PriceResult(item_price = Some(p0), volume = Some(p1.toInt.toString)))
        else Some(PriceResult(item_price = Some(p0), initial_price = Some(p1)))
      case p0 :: Nil => Some(PriceResult(item_price = Some(p0)))
      case _         => None
    }
  }

  /** Albert Hyper/Supermarket (price_processing.py:87-129): keeps -, :, '
    * separators; "45-"/"45:" -> 45.0; "31'90" -> 31.90; a first price < 5
    * invalidates the whole string; result keyed by requested class. */
  def albert(s: String, classId: String): Option[PriceResult] = {
    val clean =
      s.filter(c => (c >= '0' && c <= '9') || c.isWhitespace || ".,'-:".contains(c))
    val tokens = clean.split("\\s+").filter(_.nonEmpty)
    val parsed = tokens.toList.flatMap { token =>
      if (token.endsWith("-") || token.endsWith(":")) parsePrice(token.dropRight(1))
      else if (token.contains("'")) {
        val parts = token.split("'", -1)
        if (parts.length == 2 && parts(0).nonEmpty && parts(0).forall(_.isDigit) &&
            parts(1).nonEmpty && parts(1).forall(_.isDigit))
          parsePrice(parts(0) + "." + parts(1))
        else parsePrice(token)
      } else parsePrice(token)
    }
    parsed match {
      case p0 :: _ if p0 < 5 => None
      case p0 :: _           => Some(single(classId, p0))
      case Nil               => None
    }
  }

  private val tescoDate = Pattern.compile(
    "\\d{1,2}\\.\\d{1,2}\\.\\s*-\\s*\\d{1,2}\\.\\d{1,2}\\.")

  /** Tesco Super/Hypermarket (price_processing.py:133-157): strips date
    * ranges like "12.7. - 14.7."; skips '%'/"HOP" strings. */
  def tesco(s: String, classId: String): Option[PriceResult] = {
    val clean = tescoDate.matcher(s).replaceAll("")
    if (clean.contains("%") || clean.contains("HOP")) return None
    findPrices(clean) match {
      case p0 :: _ => Some(single(classId, p0))
      case Nil     => None
    }
  }

  /** Lidl / Lidl Shop / CBA * / Bene — bare parse
    * (price_processing.py:161-162, 215-236). */
  def bareParse(s: String, classId: String): Option[PriceResult] =
    parsePrice(s).map(p => single(classId, p))

  private val kauflandTwoDecimals =
    Pattern.compile("(\\d+[.,]\\d+)\\s+(\\d+[.,]\\d+)")

  /** Kaufland (price_processing.py:166-177): two decimal prices in sequence
    * -> skip; with two numbers the LAST is the sale price (reversed). */
  def kaufland(s: String): Option[PriceResult] = {
    if (kauflandTwoDecimals.matcher(s).find()) return None
    findPrices(s) match {
      case p0 :: p1 :: Nil =>
        Some(PriceResult(item_price = Some(p1), initial_price = Some(p0)))
      case p0 :: Nil => Some(PriceResult(item_price = Some(p0)))
      case _         => None
    }
  }

  /** Flop Top / Flop (price_processing.py:181-189). */
  def flop(s: String): Option[PriceResult] =
    findPrices(s) match {
      case p0 :: p1 :: Nil =>
        Some(PriceResult(item_price = Some(p0), initial_price = Some(p1)))
      case p0 :: Nil => Some(PriceResult(item_price = Some(p0)))
      case _         => None
    }

  /** Travel Free (price_processing.py:193-211): strip EUR sign; with two
    * numbers min is the sale price, max the initial. */
  def travelFree(s: String): Option[PriceResult] =
    findPrices(s.replace("€", "").trim) match {
      case p0 :: p1 :: Nil =>
        Some(PriceResult(item_price = Some(math.min(p0, p1)),
          initial_price = Some(math.max(p0, p1))))
      case p0 :: Nil => Some(PriceResult(item_price = Some(p0)))
      case _         => None
    }

  private val makroPackaging =
    Pattern.compile("^(\\d+-?\\d?\\s*(BAL|ks|A VICE|AViCE))")

  /** Makro (price_processing.py:240-270): leading packaging token
    * ("2 BAL", "10ks", ...) extracted into `packaging`. */
  def makro(s: String): Option[PriceResult] = {
    val m = makroPackaging.matcher(s)
    val (packaging, rest) =
      if (m.find()) (Some(m.group()), s.substring(m.group().length).trim)
      else (None, s)
    findPrices(rest) match {
      case p0 :: p1 :: _ =>
        Some(PriceResult(item_price = Some(p0), initial_price = Some(p1),
          packaging = packaging))
      case p0 :: Nil =>
        Some(PriceResult(item_price = Some(p0), packaging = packaging))
      case Nil => None
    }
  }

  /** Ratio (price_processing.py:274-282): exactly two numbers -> first is
    * the ex-VAT price, second the item price; anything else -> None. */
  def ratio(s: String): Option[PriceResult] =
    findPrices(s) match {
      case p0 :: p1 :: Nil =>
        Some(PriceResult(price_ex_vat = Some(p0), item_price = Some(p1)))
      case _ => None
    }

  private val globusJunk = Pattern.compile("[^\\d.,'\\s-]")
  private val globusSpaced = Pattern.compile("\\d+\\s+\\d{2}")

  /** Globus (price_processing.py:286-312): rejects '%' or junk chars;
    * "14'90" and "17 90" both mean 14.90/17.90; only item/member class ids
    * produce output, and only for exactly one number. */
  def globus(s: String, classId: String): Option[PriceResult] = {
    if (s.contains("%") || globusJunk.matcher(s).find()) return None
    var str = s.replace("'", ".")
    if (globusSpaced.matcher(str).find()) str = str.replace(" ", ".")
    val ps = findPrices(str)
    classId match {
      case "item_price" if ps.length == 1 =>
        Some(PriceResult(item_price = Some(ps.head)))
      case "item_member_price" if ps.length == 1 =>
        Some(PriceResult(member_price = Some(ps.head)))
      case _ => None
    }
  }

  /** Tamda Foods (price_processing.py:316-334): rejects '%'/'('; strips any
    * K/C/k/c characters ("1290 KC" -> 12.90 via the cents rule); only
    * item/member class ids with exactly one number produce output. */
  def tamdaFoods(s: String, classId: String): Option[PriceResult] = {
    if (s.contains("%") || s.contains("(")) return None
    val clean = s.replaceAll("[KCkc]+", "").trim
    val ps = findPrices(clean)
    classId match {
      case "item_member_price" if ps.length == 1 =>
        Some(PriceResult(member_price = Some(ps.head)))
      case "item_price" if ps.length == 1 =>
        Some(PriceResult(item_price = Some(ps.head)))
      case _ => None
    }
  }

  val PriceClassIds: Set[String] =
    Set("item_price", "item_member_price", "item_initial_price")

  /** Dispatcher (price_processing.py:338-389): class_id must be one of the
    * three price classes; shop_name selects the parser; unknown shops
    * yield None. */
  def processPriceByClassId(
      shopName: String,
      ocrText: String,
      classId: String): Option[PriceResult] = {
    if (shopName == null || ocrText == null || classId == null) return None
    if (!PriceClassIds.contains(classId)) return None
    shopName match {
      case "EsoMarket"                                 => esomarket(ocrText, classId)
      case "Penny"                                     => penny(ocrText)
      case "Billa"                                     => billa(ocrText)
      case "Albert Hypermarket" | "Albert Supermarket" => albert(ocrText, classId)
      case "Tesco Supermarket" | "Tesco Hypermarket"   => tesco(ocrText, classId)
      case "Lidl"                                      => bareParse(ocrText, classId)
      case "Kaufland"                                  => kaufland(ocrText)
      case "Flop Top" | "Flop"                         => flop(ocrText)
      case "Travel Free"                               => travelFree(ocrText)
      case "CBA Potraviny"                             => bareParse(ocrText, classId)
      case "Bene"                                      => bareParse(ocrText, classId)
      case "CBA Premium"                               => bareParse(ocrText, classId)
      case "Lidl Shop"                                 => bareParse(ocrText, classId)
      case "CBA Market"                                => bareParse(ocrText, classId)
      case "Makro"                                     => makro(ocrText)
      case "Globus"                                    => globus(ocrText, classId)
      case "Tamda Foods"                               => tamdaFoods(ocrText, classId)
      case "Ratio"                                     => ratio(ocrText)
      case _                                           => None
    }
  }
}
