package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GeoIp

/** The fixture databases here are assembled BYTE-BY-BYTE from the public
  * MaxMind-DB format specification (search tree records, the 16-byte data
  * separator, type-tagged data fields, pointer encoding, metadata marker) —
  * deliberately NOT via the reader's inverse, so an encoding misreading
  * cannot cancel out between a shared writer and the reader. */
object MmdbFixture {

  // ---- data-section field encoders (control byte = type<<5 | size) ----
  def str(s: String): Array[Byte] = {
    require(s.length < 29)
    ((2 << 5) | s.length).toByte +: s.getBytes(UTF_8)
  }
  private def beMin(v: Long): Array[Byte] = {
    if (v == 0) return Array.empty
    val n = (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8
    Array.tabulate(n)(i => ((v >>> ((n - 1 - i) * 8)) & 0xFF).toByte)
  }
  def u16(v: Long): Array[Byte] = { val b = beMin(v); ((5 << 5) | b.length).toByte +: b }
  def u32(v: Long): Array[Byte] = { val b = beMin(v); ((6 << 5) | b.length).toByte +: b }
  /** uint64 is an extended type (9): ctrl size + type byte (9-7=2). */
  def u64(v: Long): Array[Byte] = {
    val b = beMin(v); Array(b.length.toByte, 2.toByte) ++ b
  }
  def dbl(d: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(d)
    ((3 << 5) | 8).toByte +: Array.tabulate(8)(i => ((bits >>> ((7 - i) * 8)) & 0xFF).toByte)
  }
  /** boolean: extended type 14 (byte 7), size field carries the value. */
  def bool(b: Boolean): Array[Byte] =
    Array((if (b) 1 else 0).toByte, 7.toByte)
  def map(entries: (String, Array[Byte])*): Array[Byte] = {
    require(entries.size < 29)
    ((7 << 5) | entries.size).toByte +:
      entries.toArray.flatMap { case (k, v) => str(k) ++ v }
  }
  /** array: extended type 11 (byte 4). */
  def arr(items: Array[Byte]*): Array[Byte] = {
    require(items.size < 29)
    Array(items.size.toByte, 4.toByte) ++ items.toArray.flatten
  }
  /** 11-bit pointer (size bits 00): value relative to data-section start. */
  def ptr(off: Int): Array[Byte] = {
    require(off < 2048)
    Array(((1 << 5) | ((off >> 8) & 0x7)).toByte, (off & 0xFF).toByte)
  }

  // ---- search-tree builder: insert (bits, data offset), serialize ----
  final class Trie {
    sealed trait Child
    case object Empty extends Child
    final case class Data(off: Int) extends Child
    final class Node { var c: Array[Child] = Array(Empty, Empty); var idx = -1 }
    final case class Sub(n: Node) extends Child
    val root = new Node
    def insert(bits: Seq[Int], dataOff: Int): Unit = {
      var n = root
      bits.init.foreach { b =>
        n.c(b) match {
          case Sub(m) => n = m
          case Empty => val m = new Node; n.c(b) = Sub(m); n = m
          case Data(_) => sys.error("fixture: overlapping networks")
        }
      }
      require(n.c(bits.last) == Empty)
      n.c(bits.last) = Data(dataOff)
    }
    /** Assign BFS indices, then serialize with the given record size. */
    def serialize(recordSize: Int): (Array[Byte], Int) = {
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
      val queue = scala.collection.mutable.Queue(root)
      while (queue.nonEmpty) {
        val n = queue.dequeue(); n.idx = nodes.size; nodes += n
        n.c.foreach { case Sub(m) => queue.enqueue(m); case _ => }
      }
      val count = nodes.size
      def value(c: Child): Int = c match {
        case Empty => count
        case Sub(m) => m.idx
        case Data(off) => count + 16 + off
      }
      val bytes = recordSize match {
        case 24 => nodes.toArray.flatMap { n =>
          val l = value(n.c(0)); val r = value(n.c(1))
          Array((l >> 16).toByte, (l >> 8).toByte, l.toByte,
            (r >> 16).toByte, (r >> 8).toByte, r.toByte)
        }
        case 28 => nodes.toArray.flatMap { n =>
          val l = value(n.c(0)); val r = value(n.c(1))
          Array((l >> 16).toByte, (l >> 8).toByte, l.toByte,
            ((((l >> 24) & 0xF) << 4) | ((r >> 24) & 0xF)).toByte,
            (r >> 16).toByte, (r >> 8).toByte, r.toByte)
        }
      }
      (bytes, count)
    }
  }

  def bitsOfV4(ip: Long, prefixLen: Int): Seq[Int] =
    (0 until prefixLen).map(i => ((ip >> (31 - i)) & 1).toInt)

  /** Assemble: tree ++ 16 zero bytes ++ data ++ marker ++ metadata map. */
  def assemble(tree: Array[Byte], nodeCount: Int, recordSize: Int,
      ipVersion: Int, data: Array[Byte]): Array[Byte] = {
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes(UTF_8)
    val meta = map(
      "binary_format_major_version" -> u16(2),
      "binary_format_minor_version" -> u16(0),
      "build_epoch" -> u64(1700000000L),
      "database_type" -> str("GeoIP2-City"),
      "ip_version" -> u16(ipVersion),
      "node_count" -> u32(nodeCount),
      "record_size" -> u16(recordSize))
    tree ++ Array.fill(16)(0.toByte) ++ data ++ marker ++ meta
  }
}

class MaxMindDbSpec extends SparkSpec {
  import MmdbFixture._

  /** Fixture 1: ip_version=4, record_size=24, two networks; the second
    * record reaches its country map through an 11-bit POINTER to the
    * first record's, exercising the aliasing real databases rely on. */
  private def buildV4(amsterdamName: String = "Amsterdam"): Array[Byte] = {
    val country = map(
      "iso_code" -> str("NL"),
      "geoname_id" -> u32(2750405L),
      "names" -> map("en" -> str("Netherlands")))
    val recA = map(
      "city" -> map("geoname_id" -> u32(2759794L),
        "names" -> map("en" -> str(amsterdamName))),
      "continent" -> map("code" -> str("EU"), "geoname_id" -> u32(6255148L),
        "names" -> map("en" -> str("Europe"))),
      "country" -> country,
      "location" -> map("latitude" -> dbl(52.37), "longitude" -> dbl(4.89),
        "metro_code" -> u16(528L), "time_zone" -> str("Europe/Amsterdam")),
      "postal" -> map("code" -> str("1012")),
      "registered_country" -> map("iso_code" -> str("NL"),
        "geoname_id" -> u32(2750405L), "names" -> map("en" -> str("Netherlands"))),
      "subdivisions" -> arr(
        map("iso_code" -> str("NH"), "geoname_id" -> u32(2749879L),
          "names" -> map("en" -> str("North Holland"))),
        map("iso_code" -> str("AMS"), "geoname_id" -> u32(99L),
          "names" -> map("en" -> str("Amsterdam Sub")))),
      "traits" -> map("is_anonymous_proxy" -> bool(true)))
    // country map sits at a known offset inside recA: compute it by scanning
    val countryOff = {
      val idx = recA.indexOfSlice(country)
      require(idx >= 0); idx
    }
    val recBOff = recA.length
    val recB = map(
      "country" -> ptr(countryOff),
      "location" -> map("latitude" -> dbl(-1.5), "longitude" -> dbl(7.25)),
      "traits" -> map("is_satellite_provider" -> bool(true)))
    val trie = new Trie
    // 10.0.0.0/8 -> recA ; 192.168.1.0/24 -> recB
    trie.insert(bitsOfV4(0x0A000000L, 8), 0)
    trie.insert(bitsOfV4(0xC0A80100L, 24), recBOff)
    val (tree, n) = trie.serialize(24)
    assemble(tree, n, 24, 4, recA ++ recB)
  }

  /** Fixture 2: ip_version=6, record_size=28 — 8.8.8.0/24 lives 96 zero
    * bits below the root, testing the v4-in-v6 descent AND the 28-bit
    * nibble packing (what GeoLite2 actually ships). */
  private def buildV6(): Array[Byte] = {
    val rec = map(
      "country" -> map("iso_code" -> str("US"), "geoname_id" -> u32(6252001L),
        "names" -> map("en" -> str("United States"))))
    val trie = new Trie
    trie.insert(Seq.fill(96)(0) ++ bitsOfV4(0x08080800L, 24), 0)
    val (tree, n) = trie.serialize(28)
    assemble(tree, n, 28, 6, rec)
  }

  private def write(path: String, bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)

  test("v4/24-bit fixture: metadata, networks, and full City row decode") {
    val tmp = java.nio.file.Files.createTempDirectory("mmdb").toString
    write(s"$tmp/test.mmdb", buildV4())
    val bytes = MaxMindDb.readBytes(s"$tmp/test.mmdb")
    val md = MaxMindDb.metadata(bytes)
    assert(md.ipVersion === 4)
    assert(md.recordSize === 24)
    assert(md.databaseType === "GeoIP2-City")
    assert(md.buildEpoch === 1700000000L)

    val nets = MaxMindDb.ipv4Networks(bytes).sortBy(_._1)
    assert(nets.map(n => (n._1, n._2)) === Vector(
      (0x0A000000L, 0x0AFFFFFFL),        // 10.0.0.0/8
      (0xC0A80100L, 0xC0A801FFL)))       // 192.168.1.0/24

    val rows = nets.map { case (s, e, d) => MaxMindDb.cityRow(s, e, d) }
    val a = rows(0)
    assert(a.getLong(0) === 0x0A000000L)
    assert(a.get(2) === 2759794L)                    // city_id
    assert(a.getString(3) === "Amsterdam")
    assert(a.getString(4) === "EU")
    assert(a.getString(7) === "NL")
    assert(a.get(8) === 2750405L)                    // country_id
    assert(a.getString(9) === "Netherlands")
    assert(a.getDouble(10) === 52.37)
    assert(a.get(12) === 528L)                       // metro_code
    assert(a.getString(13) === "Europe/Amsterdam")
    assert(a.getString(14) === "AMS")                // most specific = LAST
    assert(a.getString(16) === "Amsterdam Sub")
    assert(a.getString(17) === "1012")
    assert(a.get(24) === Seq("NH", "AMS"))           // subdivision_codes
    assert(a.get(25) === Seq(2749879L, 99L))
    assert(a.getBoolean(32) === true)                // anonymous_proxy
    assert(a.getBoolean(33) === false)
    val b2 = rows(1)
    assert(b2.getString(7) === "NL")                 // via POINTER alias
    assert(b2.getString(9) === "Netherlands")
    assert(b2.getDouble(10) === -1.5)
    assert(b2.get(2) === null)                       // no city
    assert(b2.getBoolean(33) === true)               // satellite_provider
  }

  test("v6/28-bit fixture: IPv4 subtree found 96 zero bits down") {
    val tmp = java.nio.file.Files.createTempDirectory("mmdb6").toString
    write(s"$tmp/test6.mmdb", buildV6())
    val bytes = MaxMindDb.readBytes(s"$tmp/test6.mmdb")
    assert(MaxMindDb.metadata(bytes).recordSize === 28)
    val nets = MaxMindDb.ipv4Networks(bytes)
    assert(nets.map(n => (n._1, n._2)) === Vector((0x08080800L, 0x080808FFL)))
    val row = MaxMindDb.cityRow(nets.head._1, nets.head._2, nets.head._3)
    assert(row.getString(7) === "US")
  }

  test("gzip load path matches the raw file (reference's strategy 1)") {
    val tmp = java.nio.file.Files.createTempDirectory("mmdbgz").toString
    val raw = buildV4()
    write(s"$tmp/t.mmdb", raw)
    val out = new java.io.FileOutputStream(s"$tmp/t.mmdb.gz")
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(raw); gz.close()
    assert(MaxMindDb.readBytes(s"$tmp/t.mmdb.gz").toSeq ===
      MaxMindDb.readBytes(s"$tmp/t.mmdb").toSeq)
  }

  test("cityDim + GeoIp.enrich agree with a hand-built dim-table oracle") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mmdbdim").toString
    write(s"$tmp/db.mmdb", buildV4())
    val dim = MaxMindDb.cityDim(spark, s"$tmp/db.mmdb")
    assert(dim.schema === MaxMindDb.CityDimSchema)
    val events = Seq(
      (1L, "10.1.2.3"),       // inside 10/8
      (2L, "192.168.1.77"),   // inside 192.168.1/24
      (3L, "11.0.0.1"),       // no match -> all-null geo
      (4L, "192.168.2.1"))    // adjacent /24 -> no match
      .toDF("event_id", "ip")
    val got = GeoIp.enrich(events, "ip", dim)
      .select("event_id", "country_code", "city_name", "latitude",
        "anonymous_proxy")
      .as[(Long, String, String, Option[Double], Option[Boolean])]
      .collect().sortBy(_._1)
    assert(got(0) === ((1L, "NL", "Amsterdam", Some(52.37), Some(true))))
    assert(got(1) === ((2L, "NL", null, Some(-1.5), Some(false))))
    assert(got(2) === ((3L, null, null, None, None)))
    assert(got(3) === ((4L, null, null, None, None)))
    // the prefix-split hash-join path returns the identical enrichment
    val viaPrefix = GeoIp.enrichPrefix(events, "ip", dim)
      .select("event_id", "country_code", "city_name", "latitude",
        "anonymous_proxy")
      .as[(Long, String, String, Option[Double], Option[Boolean])]
      .collect().sortBy(_._1)
    assert(viaPrefix.toSeq === got.toSeq)
  }

  test("writer round trip: dim -> mmdb -> cityDim is enrichment-lossless") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mmdbw").toString
    // unaligned ranges force the CIDR split; every City field populated on
    // row 1, sparse on row 2 (nulls must survive the round trip as nulls)
    val rows = Seq(
      org.apache.spark.sql.Row(1000L, 3599L,
        77L, "Cityville", "EU", 6000L, "Europe", "NL", 7000L, "Netherlands",
        52.1, 4.5, 528L, "Europe/Amsterdam", "S2", 92L, "Sub Two", "01234",
        "RC", 7100L, "RegName", "MIL", 8000L, "Base",
        Seq("S1", "S2"), Seq(91L, 92L), Seq("Sub One", "Sub Two"),
        64512L, "AS Org", "ex.example", "ISP X", "Org X", true, false),
      org.apache.spark.sql.Row(4096L, 4223L,
        null, null, null, null, null, "US", 6252001L, "United States",
        null, null, null, null, null, null, null, null,
        null, null, null, null, null, null,
        null, null, null, null, null, null, null, null, false, true))
    val dim = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), MaxMindDb.CityDimSchema)
    val path = s"$tmp/export.mmdb"
    MaxMindDbWriter.write(dim.collect().toSeq, path) // schema-attached rows
    val back = MaxMindDb.cityDim(spark, path)
    // ranges re-emerge CIDR-split; merging contiguous same-record blocks
    // must reproduce the original bounds
    val nets = back.select("ip_start", "ip_end", "country_code")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(nets.head._1 === 1000L && nets.last._2 === 4223L)
    assert(nets.filter(_._3 == "NL").map(n => n._2 - n._1 + 1).sum === 2600L)
    assert(nets.filter(_._3 == "US").map(n => n._2 - n._1 + 1).sum === 128L)
    // enrichment through the round-tripped dim == through the original
    val probes = Seq((1L, "0.0.3.232"), (2L, "0.0.14.15"), (3L, "0.0.16.5"),
      (4L, "0.0.20.0")).toDF("event_id", "ip")
    def flat(d: org.apache.spark.sql.DataFrame) =
      GeoIp.enrich(probes, "ip", d)
        // the matched block's own bounds legitimately differ (CIDR-split);
        // every CityResponse value must be identical
        .drop("ip_start", "ip_end")
        .withColumn("subdivision_codes", concat_ws("|", col("subdivision_codes")))
        .withColumn("subdivision_ids",
          concat_ws("|", transform(col("subdivision_ids"), _.cast("string"))))
        .withColumn("subdivision_names", concat_ws("|", col("subdivision_names")))
        .orderBy("event_id").collect().toSeq
    assert(flat(back) === flat(dim))
  }

  test("refreshableCityDim hot-swaps when the mmdb file changes") {
    val tmp = java.nio.file.Files.createTempDirectory("mmdbhot").toString
    val db = s"$tmp/live.mmdb"
    val pq = s"$tmp/dim.parquet"
    write(db, buildV4("Amsterdam"))
    val v1 = MaxMindDb.refreshableCityDim(spark, db, pq)
      .filter(col("ip_start") === 0x0A000000L)
      .select("city_name").head().getString(0)
    assert(v1 === "Amsterdam")
    // republish the database with changed content (same shape)
    write(db, buildV4("Amsterdam2"))
    new java.io.File(db).setLastModified(System.currentTimeMillis() + 2000)
    val v2 = MaxMindDb.refreshableCityDim(spark, db, pq)
      .filter(col("ip_start") === 0x0A000000L)
      .select("city_name").head().getString(0)
    assert(v2 === "Amsterdam2")
    graft.functions.RefreshableDim.invalidate(spark, pq)
  }
}
