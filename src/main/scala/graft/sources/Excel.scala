package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX source — SURVEY.md §2.1 S1: every reference script
  * ingests `read_excel(path, sheet = …)` workbooks
  * (`Coalplants_GEM.R:10`, `GasOilplants_GEM.R:11-15`, …). The
  * container has no Excel library (zero egress), and none is needed:
  * `.xlsx` is a zip of SpreadsheetML parts, readable with the JDK's
  * `ZipFile` + StAX alone.
  *
  * All cells come back as STRINGS — deliberately. The trackers mix
  * `"unknown"`, `">0"`, `"not found"` into numeric columns, so the
  * engine's ingest contract is the solar script's all-text strategy
  * (`solarplants_GEM.R:12-14`, SURVEY.md §1) with deliberate casts
  * downstream (`Cleaning.toNumeric`).
  *
  * Scale note: a workbook is parsed on the DRIVER and parallelized.
  * That is the right shape, not a shortcut — xlsx is a zip that must
  * be centrally inflated (no splittable row boundaries), and the
  * format tops out at ~1M rows per sheet; bulk data arrives as
  * parquet/CSV, workbooks are dim-scale inputs.
  */
object Excel {

  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Sheet (name, worksheet part path) pairs in WORKBOOK ORDER, from
    * workbook.xml + its rels. A Seq, not a Map — readxl's "first
    * sheet" default and any positional access need the order, and an
    * immutable Map would drop it above 4 entries.
    */
  def sheetTargets(path: String): Seq[(String, String)] = {
    val zip = new ZipFile(path)
    try sheetTargets(zip) finally zip.close()
  }

  private def sheetTargets(zip: ZipFile): Seq[(String, String)] = {
    {
      val rels = { // r:id → target part
        val in = zip.getInputStream(zip.getEntry("xl/_rels/workbook.xml.rels"))
        val r = xmlFactory.createXMLStreamReader(in)
        val m = mutable.Map[String, String]()
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "Relationship")
            m(r.getAttributeValue(null, "Id")) =
              r.getAttributeValue(null, "Target").stripPrefix("/xl/").stripPrefix("./")
        }
        r.close(); in.close()
        m.toMap
      }
      val in = zip.getInputStream(zip.getEntry("xl/workbook.xml"))
      val r = xmlFactory.createXMLStreamReader(in)
      val out = mutable.ArrayBuffer[(String, String)]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue).getOrElse("")
          rels.get(rid).foreach(t => out += (name -> ("xl/" + t)))
        }
      }
      r.close(); in.close()
      out.toSeq
    }
  }

  def sheetNames(path: String): Seq[String] = sheetTargets(path).map(_._1)

  /** `<si>` shared strings; rich-text runs concatenate their `<t>`s. */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val in = zip.getInputStream(entry)
    val r = xmlFactory.createXMLStreamReader(in)
    val out = mutable.ArrayBuffer[String]()
    val sb = new StringBuilder
    var inT = false
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        if (r.getLocalName == "si") sb.clear()
        else if (r.getLocalName == "t") inT = true
      case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        if (r.getLocalName == "t") inT = false
        else if (r.getLocalName == "si") out += sb.result()
      case _ => ()
    }
    r.close(); in.close()
    out.toIndexedSeq
  }

  /** Per-cellXf "is this style a date format" flags from styles.xml.
    * Builtin date numFmtIds (ECMA-376 §18.8.30) plus custom formats
    * whose code still contains a y/m/d/h/s token after literal
    * (quoted) chunks and [bracketed] modifiers are stripped — e.g. the
    * coal workbook's `d-mmm-yy` (numFmtId 164).
    */
  private def dateStyles(zip: ZipFile): IndexedSeq[Boolean] = {
    val entry = zip.getEntry("xl/styles.xml")
    if (entry == null) return IndexedSeq.empty
    val builtinDate = (14 to 22).toSet ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)
    def looksDate(code: String): Boolean = {
      val bare = code.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
      bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
    }
    val in = zip.getInputStream(entry)
    val r = xmlFactory.createXMLStreamReader(in)
    val customDate = mutable.Set[Int]()
    val xfIsDate = mutable.ArrayBuffer[Boolean]()
    var inCellXfs = false
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "numFmt" =>
          val id = Option(r.getAttributeValue(null, "numFmtId")).flatMap(_.toIntOption)
          val code = Option(r.getAttributeValue(null, "formatCode"))
          if (id.isDefined && code.exists(looksDate)) customDate += id.get
        case "cellXfs" => inCellXfs = true
        case "xf" if inCellXfs =>
          val fmt = Option(r.getAttributeValue(null, "numFmtId"))
            .flatMap(_.toIntOption).getOrElse(0)
          xfIsDate += (builtinDate(fmt) || customDate(fmt))
        case _ => ()
      }
      case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
        inCellXfs = false
      case _ => ()
    }
    r.close(); in.close()
    xfIsDate.toIndexedSeq
  }

  /** Excel serial → ISO string, 1899-12-30 epoch (readxl's base; it
    * absorbs the 1900 leap-year bug for modern dates). Integral
    * serials print as dates, fractional ones as datetimes.
    */
  private[graft] def serialToIso(raw: String): String =
    raw.toDoubleOption match {
      case None => raw // malformed numeric: fall through untouched
      case Some(serial) =>
        val epoch = java.time.LocalDate.of(1899, 12, 30)
        val days = math.floor(serial).toLong
        val frac = serial - days
        val date = epoch.plusDays(days)
        if (frac == 0.0) date.toString
        else {
          val secs = math.round(frac * 86400)
          date.atStartOfDay.plusSeconds(secs)
            .format(java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:mm:ss"))
        }
    }

  /** "BC" → 0-based column index. */
  private[graft] def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Parse one worksheet into rows of nullable cell strings. */
  private def parseSheet(zip: ZipFile, part: String, shared: IndexedSeq[String],
      styles: IndexedSeq[Boolean]): Seq[Array[String]] = {
    val in = zip.getInputStream(zip.getEntry(part))
    val r = xmlFactory.createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer[Array[String]]()
    val cells = mutable.ArrayBuffer[(Int, String)]()
    var cellType: String = null
    var cellCol = -1
    var cellStyle = 0
    var rowNum = 0 // 1-based sheet row of the OPEN <row>, from its r= attr
    var inV = false
    var inIs = false
    val v = new StringBuilder
    def flushRow(): Unit = {
      // Interior blank rows are OMITTED from the XML (writers skip the
      // <row> element entirely); readxl still returns them as all-NA
      // rows, so pad the gap to keep row alignment.
      while (rows.length < rowNum - 1) rows += Array.empty[String]
      if (cells.nonEmpty) {
        val width = cells.map(_._1).max + 1
        val arr = new Array[String](width)
        cells.foreach { case (c, s) => arr(c) = s }
        rows += arr
        cells.clear()
      } else rows += Array.empty[String]
    }
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => // r= on <c> and <row> is OPTIONAL; restart positional fill
          cellCol = -1
          rowNum = Option(r.getAttributeValue(null, "r"))
            .flatMap(_.toIntOption).getOrElse(rows.length + 1)
        case "c" =>
          cellType = r.getAttributeValue(null, "t")
          cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(cellCol + 1)
          cellStyle = Option(r.getAttributeValue(null, "s"))
            .flatMap(_.toIntOption).getOrElse(0)
          v.clear(); inIs = false
        case "v" => inV = true; v.clear()
        case "is" => inIs = true; v.clear()
        case "t" if inIs => inV = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS if inV => v.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" if inIs => inV = false
        case "c" =>
          val raw = v.result()
          val value = cellType match {
            case "s" => shared.lift(raw.trim.toInt).orNull
            case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
            case "e" => null // error cells (#N/A …) → NA, as readxl does
            // n / str / inlineStr; date-STYLED numerics (per styles.xml
            // cellXfs) are decoded from their Excel serial to an ISO
            // string, as readxl does.
            case null | "n" if styles.lift(cellStyle).contains(true) =>
              if (raw.isEmpty) null else serialToIso(raw)
            case _ => if (raw.isEmpty) null else raw
          }
          if (value != null && value.nonEmpty) cells += ((cellCol, value))
        case "row" => flushRow()
        case _ => ()
      }
      case _ => ()
    }
    r.close(); in.close()
    rows.toSeq
  }

  /** Read one sheet as an all-string DataFrame, first row = header
    * (readxl's default). Empty header cells become `_c<i>`; duplicate
    * header names get a positional suffix (`Owner`, `Owner_2`, …) the
    * way readxl repairs them — unrepaired duplicates make every
    * by-name select downstream throw an ambiguity AnalysisException.
    */
  def read(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val zip = new ZipFile(path)
    val parsed =
      try {
        val targets = sheetTargets(zip)
        val part = targets.collectFirst { case (n, t) if n == sheet => t }
          .getOrElse(throw new IllegalArgumentException(
            s"sheet '$sheet' not in workbook (has: ${targets.map(_._1).mkString(", ")})"))
        parseSheet(zip, part, sharedStrings(zip), dateStyles(zip))
      } finally zip.close()
    require(parsed.nonEmpty, s"sheet '$sheet' is empty")
    val header = parsed.head
    val width = math.max(header.length, parsed.iterator.map(_.length).max)
    val raw = (0 until width).map { i =>
      val h = if (i < header.length) header(i) else null
      if (h == null || h.isEmpty) s"_c$i" else h
    }
    val seen = mutable.Map[String, Int]()
    val names = raw.map { n =>
      val k = seen.updateWith(n)(c => Some(c.getOrElse(0) + 1)).get
      if (k == 1) n
      else Iterator.from(k).map(j => s"${n}_$j").find(!raw.contains(_)).get
    }
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val rows = parsed.tail.map { r =>
      Row((0 until width).map(i => if (i < r.length) r(i) else null): _*)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 5000)), schema)
  }
}
