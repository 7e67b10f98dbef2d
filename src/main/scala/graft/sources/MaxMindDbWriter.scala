package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Row

/** Writer for the public MaxMind-DB binary format: serializes an
  * `(ip_start, ip_end, City columns)` dimension (the
  * [[MaxMindDb.CityDimSchema]] shape) into a `.mmdb` file that
  * [[MaxMindDb]] — or any standard MaxMind reader — can load.
  *
  * Why a writer in an analytics engine: the dimension frame is the
  * system-of-record here (curated/joined/corrected in Spark), and ops
  * tooling in the wider ecosystem speaks `.mmdb`; this closes the loop in
  * the direction the reference never needed (it only consumed databases —
  * `ip2geo/DatabaseLookupService.java`). It also powers the round-trip
  * correctness query: dim → mmdb → [[MaxMindDb.cityDim]] → enrichment must
  * equal enriching with the original dim.
  *
  * Arbitrary inclusive ranges are decomposed into aligned CIDR blocks;
  * blocks of one source row share a single encoded data record (the
  * aliasing real databases rely on). Record size is 24-bit when the
  * node-count + data span fits, else 32-bit. */
object MaxMindDbWriter {

  // ----------------------------------------------------- field encoders
  /** Control byte(s): type tag, optional extended-type byte, size with the
    * 29/30/31 extension scheme. */
  private def ctrl(typ: Int, size: Int): Array[Byte] = {
    val t = if (typ < 8) typ else 0
    val ext: Array[Byte] = if (typ < 8) Array.empty else Array((typ - 7).toByte)
    val (bits, szBytes) =
      if (size < 29) (size, Array.empty[Byte])
      else if (size <= 284) (29, Array((size - 29).toByte))
      else if (size <= 65820) {
        val s = size - 285; (30, Array((s >> 8).toByte, s.toByte))
      } else {
        val s = size - 65821
        (31, Array((s >> 16).toByte, (s >> 8).toByte, s.toByte))
      }
    Array(((t << 5) | bits).toByte) ++ ext ++ szBytes
  }
  private def beMin(v: Long): Array[Byte] = {
    if (v == 0) return Array.empty
    val n = (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8
    Array.tabulate(n)(i => ((v >>> ((n - 1 - i) * 8)) & 0xFF).toByte)
  }
  def eStr(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8); ctrl(2, b.length) ++ b
  }
  def eU16(v: Long): Array[Byte] = { val b = beMin(v); ctrl(5, b.length) ++ b }
  def eU32(v: Long): Array[Byte] = { val b = beMin(v); ctrl(6, b.length) ++ b }
  def eU64(v: Long): Array[Byte] = { val b = beMin(v); ctrl(9, b.length) ++ b }
  def eDouble(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    ctrl(3, 8) ++ Array.tabulate(8)(i => ((bits >>> ((7 - i) * 8)) & 0xFF).toByte)
  }
  /** boolean payload lives in the size field. */
  def eBool(b: Boolean): Array[Byte] = ctrl(14, if (b) 1 else 0)
  def eMap(entries: Seq[(String, Array[Byte])]): Array[Byte] =
    ctrl(7, entries.size) ++ entries.toArray.flatMap { case (k, v) => eStr(k) ++ v }
  def eArr(items: Seq[Array[Byte]]): Array[Byte] =
    ctrl(11, items.size) ++ items.toArray.flatten

  // ------------------------------------------- City row -> nested record
  /** Encode one [[MaxMindDb.CityDimSchema]]-shaped row as a GeoIP2-City
    * data record; null columns are simply absent (MaxMind's own sparsity
    * model — [[MaxMindDb.cityRow]] restores them as nulls). */
  def cityData(r: Row): Array[Byte] = {
    def at(name: String): Option[Any] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.get(i))
    }
    def lng(name: String): Option[Long] = at(name).map {
      case l: Long => l; case i: Int => i.toLong
      case other => other.toString.toLong
    }
    // dim columns are `<prefix>_code/_id/_name`; `codeKey` is the mmdb key
    // ("code" for continents, "iso_code" for countries)
    def entity(prefix: String, codeKey: String): Seq[(String, Array[Byte])] = {
      val e = Seq.newBuilder[(String, Array[Byte])]
      at(s"${prefix}_code").foreach(v => e += (codeKey -> eStr(v.toString)))
      lng(s"${prefix}_id").foreach(v => e += ("geoname_id" -> eU32(v)))
      at(s"${prefix}_name").foreach(v =>
        e += ("names" -> eMap(Seq("en" -> eStr(v.toString)))))
      e.result()
    }
    val top = Seq.newBuilder[(String, Array[Byte])]
    val city = {
      val e = Seq.newBuilder[(String, Array[Byte])]
      lng("city_id").foreach(v => e += ("geoname_id" -> eU32(v)))
      at("city_name").foreach(v => e += ("names" -> eMap(Seq("en" -> eStr(v.toString)))))
      e.result()
    }
    if (city.nonEmpty) top += ("city" -> eMap(city))
    val cont = entity("continent", "code")
    if (cont.nonEmpty) top += ("continent" -> eMap(cont))
    val ctry = entity("country", "iso_code")
    if (ctry.nonEmpty) top += ("country" -> eMap(ctry))
    val loc = {
      val e = Seq.newBuilder[(String, Array[Byte])]
      at("latitude").foreach(v => e += ("latitude" -> eDouble(v.asInstanceOf[Double])))
      at("longitude").foreach(v => e += ("longitude" -> eDouble(v.asInstanceOf[Double])))
      lng("metro_code").foreach(v => e += ("metro_code" -> eU16(v)))
      at("time_zone").foreach(v => e += ("time_zone" -> eStr(v.toString)))
      e.result()
    }
    if (loc.nonEmpty) top += ("location" -> eMap(loc))
    at("postal_code").foreach(v => top += ("postal" -> eMap(Seq("code" -> eStr(v.toString)))))
    val reg = entity("registered_country", "iso_code")
    if (reg.nonEmpty) top += ("registered_country" -> eMap(reg))
    val rep = entity("represented_country", "iso_code")
    if (rep.nonEmpty) top += ("represented_country" -> eMap(rep))
    val subCodes = at("subdivision_codes")
      .map(_.asInstanceOf[scala.collection.Seq[Any]]).getOrElse(Nil)
    val subIds = at("subdivision_ids")
      .map(_.asInstanceOf[scala.collection.Seq[Any]]).getOrElse(Nil)
    val subNames = at("subdivision_names")
      .map(_.asInstanceOf[scala.collection.Seq[Any]]).getOrElse(Nil)
    if (subCodes.nonEmpty)
      top += ("subdivisions" -> eArr(subCodes.indices.map { i =>
        eMap(Seq(
          "geoname_id" -> eU32(subIds(i) match {
            case l: Long => l; case x: Int => x.toLong
            case other => other.toString.toLong
          }),
          "iso_code" -> eStr(subCodes(i).toString),
          "names" -> eMap(Seq("en" -> eStr(subNames(i).toString)))))
      }))
    val traits = {
      val e = Seq.newBuilder[(String, Array[Byte])]
      lng("asn").foreach(v => e += ("autonomous_system_number" -> eU32(v)))
      at("as_org").foreach(v => e += ("autonomous_system_organization" -> eStr(v.toString)))
      at("domain").foreach(v => e += ("domain" -> eStr(v.toString)))
      // booleans are always written: false is a value, not an absence
      e += ("is_anonymous_proxy" ->
        eBool(at("anonymous_proxy").exists(_ == true)))
      e += ("is_satellite_provider" ->
        eBool(at("satellite_provider").exists(_ == true)))
      at("isp").foreach(v => e += ("isp" -> eStr(v.toString)))
      at("organisation").foreach(v => e += ("organization" -> eStr(v.toString)))
      e.result()
    }
    top += ("traits" -> eMap(traits))
    eMap(top.result())
  }

  // ------------------------------------------------ range -> CIDR blocks
  /** Decompose an inclusive IPv4 range into aligned CIDR blocks
    * `(blockStart, prefixLen)` — the standard greedy split. */
  def cidrs(start: Long, end: Long): Seq[(Long, Int)] = {
    val out = Seq.newBuilder[(Long, Int)]
    var s = start
    while (s <= end) {
      val align = if (s == 0) 32 else math.min(java.lang.Long.numberOfTrailingZeros(s), 32)
      val span = 63 - java.lang.Long.numberOfLeadingZeros(end - s + 1) // floor log2
      val k = math.min(align, span)
      out += ((s, 32 - k))
      s += 1L << k
    }
    out.result()
  }

  // -------------------------------------------------------- search tree
  private final class Node {
    val c: Array[AnyRef] = Array(null, null) // null | Node | java.lang.Integer(dataOff)
    var idx: Int = -1
  }

  /** Serialize `rows` (non-overlapping ranges) to `path`. */
  def write(rows: Seq[Row], path: String, ipVersion: Int = 4,
      databaseType: String = "GeoIP2-City", buildEpoch: Long = 0L): Unit = {
    // data section: one record per row; CIDR blocks of a row alias it
    val data = new java.io.ByteArrayOutputStream()
    val offsets = rows.map { r => val off = data.size(); data.write(cityData(r)); off }
    // trie over every block's prefix bits
    val root = new Node
    def insert(bits: IndexedSeq[Int], off: Int): Unit = {
      var n = root
      var i = 0
      while (i < bits.length - 1) {
        val b = bits(i)
        n.c(b) match {
          case m: Node => n = m
          case null => val m = new Node; n.c(b) = m; n = m
          case _ => throw new IllegalArgumentException("overlapping ranges")
        }
        i += 1
      }
      val last = bits(bits.length - 1)
      require(n.c(last) == null, "overlapping ranges")
      n.c(last) = Integer.valueOf(off)
    }
    rows.zip(offsets).foreach { case (r, off) =>
      val s = r.getLong(r.fieldIndex("ip_start"))
      val e = r.getLong(r.fieldIndex("ip_end"))
      cidrs(s, e).flatMap { case (bs, plen) =>
        // a /0 block (the full-range row MaxMindDb.ipv4Networks itself
        // emits for a one-record tree) has no prefix bits and the root
        // node cannot carry data: split it into the two /1 halves
        if (plen == 0) Seq((0L, 1), (1L << 31, 1)) else Seq((bs, plen))
      }.foreach { case (bs, plen) =>
        insert((0 until plen).map(i => ((bs >> (31 - i)) & 1).toInt), off)
      }
    }
    // BFS index
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    val queue = scala.collection.mutable.Queue(root)
    while (queue.nonEmpty) {
      val n = queue.dequeue(); n.idx = nodes.size; nodes += n
      n.c.foreach { case m: Node => queue.enqueue(m); case _ => }
    }
    val count = nodes.size
    val recordSize =
      if (count + 16 + data.size() < (1 << 24) && count >= 0) 24 else 32
    def value(c: AnyRef): Int = c match {
      case null => count
      case m: Node => m.idx
      case off: Integer => count + 16 + off.intValue()
    }
    val tree = new java.io.ByteArrayOutputStream()
    nodes.foreach { n =>
      val l = value(n.c(0)); val r = value(n.c(1))
      if (recordSize == 24) {
        tree.write(Array((l >> 16).toByte, (l >> 8).toByte, l.toByte,
          (r >> 16).toByte, (r >> 8).toByte, r.toByte))
      } else {
        tree.write(Array((l >> 24).toByte, (l >> 16).toByte, (l >> 8).toByte, l.toByte,
          (r >> 24).toByte, (r >> 16).toByte, (r >> 8).toByte, r.toByte))
      }
    }
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes(UTF_8)
    val meta = eMap(Seq(
      "binary_format_major_version" -> eU16(2),
      "binary_format_minor_version" -> eU16(0),
      "build_epoch" -> eU64(buildEpoch),
      "database_type" -> eStr(databaseType),
      "description" -> eMap(Seq("en" -> eStr("graft-exported dimension"))),
      "ip_version" -> eU16(ipVersion),
      "languages" -> eArr(Seq(eStr("en"))),
      "node_count" -> eU32(count),
      "record_size" -> eU16(recordSize)))
    val out = new java.io.ByteArrayOutputStream()
    out.write(tree.toByteArray)
    out.write(Array.fill(16)(0.toByte))
    out.write(data.toByteArray)
    out.write(marker)
    out.write(meta)
    // atomic publish: write sibling temp, then rename over the target —
    // a concurrent reader (RefreshableDim stamp check) never sees a torn file
    val target = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp, out.toByteArray)
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
