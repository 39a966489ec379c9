package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoIp, Mmdb}

/** Exercises the MaxMind-DB reader against tiny synthetic .mmdb files built
  * here byte-by-byte from the public format spec — no licensed data. */
class MmdbSpec extends AnyFunSuite {

  // ---- fixture builder -----------------------------------------------------

  private sealed trait T
  private final class I(var l: T, var r: T) extends T
  private final case class L(code: Option[String]) extends T

  /** Insert network (bits of length len) -> code into the trie. */
  private def insert(root: I, bits: Long, len: Int, code: String): Unit = {
    var n = root
    var i = 0
    while (i < len - 1) {
      val b = ((bits >> (len - 1 - i)) & 1).toInt
      val next = (if (b == 0) n.l else n.r) match {
        case in: I => in
        case L(None) =>
          val in = new I(L(None), L(None))
          if (b == 0) n.l = in else n.r = in
          in
        case L(Some(_)) => sys.error("overlapping fixture networks")
      }
      n = next
      i += 1
    }
    if ((bits & 1) == 0) n.l = L(Some(code)) else n.r = L(Some(code))
  }

  private def str(s: String): Array[Byte] =
    Array((0x40 | s.length).toByte) ++ s.getBytes("UTF-8")

  /** Minimal-length big-endian unsigned int of data type `tpe` (5=u16, 6=u32). */
  private def uint(tpe: Int, v: Long): Array[Byte] = {
    var bytes = List.empty[Byte]
    var x = v
    while (x != 0) { bytes = (x & 0xFF).toByte :: bytes; x >>>= 8 }
    Array(((tpe << 5) | bytes.length).toByte) ++ bytes
  }

  /** {"country": {"iso_code": code}} as data-section bytes. */
  private def countryEntry(code: String): Array[Byte] =
    Array(0xE1.toByte) ++ str("country") ++ Array(0xE1.toByte) ++ str("iso_code") ++ str(code)

  /** Serialize trie + data + metadata into mmdb bytes. `v6Chain` prepends
    * the 96-node all-zero descent chain an ip_version=6 database has. */
  private def buildMmdb(networks: Seq[(Long, Int, String)], v6Chain: Boolean,
                        pointerForDupes: Boolean = false): Array[Byte] = {
    val root = new I(L(None), L(None))
    networks.foreach { case (bits, len, code) => insert(root, bits, len, code) }
    // preorder numbering of internal nodes, after an optional v6 chain
    val chainLen = if (v6Chain) 96 else 0
    val index = new java.util.IdentityHashMap[I, Integer]()
    val order = collection.mutable.ArrayBuffer[I]()
    def number(t: T): Unit = t match {
      case in: I =>
        index.put(in, chainLen + order.length); order += in
        number(in.l); number(in.r)
      case _ =>
    }
    number(root)
    val nodeCount = chainLen + order.length
    // data section: one entry per distinct code (or a pointer to the first)
    val data = collection.mutable.ArrayBuffer[Byte]()
    val offsets = collection.mutable.LinkedHashMap[String, Int]()
    networks.map(_._3).distinct.foreach { code =>
      offsets(code) = data.length
      data ++= countryEntry(code)
    }
    if (pointerForDupes) {
      // re-point every code at a {"country": <pointer to first map's value>}
      // wrapper to exercise pointer decoding; pointer target = the inner
      // {"iso_code": ...} map of the existing entry
      offsets.keys.toList.foreach { code =>
        val inner = offsets(code) + 1 + 1 + "country".length // skip outer map ctrl + key
        val ptr = Array((0x20 | ((inner >> 8) & 0x7)).toByte, (inner & 0xFF).toByte)
        offsets(code + "#ptr") = data.length
        data ++= Array(0xE1.toByte) ++ str("country") ++ ptr
      }
    }
    def dataRef(code: String): Int = {
      val key = if (pointerForDupes) code + "#ptr" else code
      nodeCount + 16 + offsets(key)
    }
    // tree serialization at record_size 24
    val tree = new Array[Byte](nodeCount * 6)
    def rec(t: T): Int = t match {
      case in: I => index.get(in)
      case L(None) => nodeCount
      case L(Some(c)) => dataRef(c)
    }
    def put(node: Int, idx: Int, v: Int): Unit = {
      val off = node * 6 + idx * 3
      tree(off) = ((v >> 16) & 0xFF).toByte
      tree(off + 1) = ((v >> 8) & 0xFF).toByte
      tree(off + 2) = (v & 0xFF).toByte
    }
    for (i <- 0 until chainLen) { // all-zero descent, right side empty
      put(i, 0, i + 1)
      put(i, 1, nodeCount)
    }
    order.foreach { in =>
      val n = index.get(in)
      put(n, 0, rec(in.l))
      put(n, 1, rec(in.r))
    }
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes("US-ASCII")
    val metaPairs: Array[Byte] =
      str("node_count") ++ uint(6, nodeCount) ++
      str("record_size") ++ uint(5, 24) ++
      str("ip_version") ++ uint(5, if (v6Chain) 6 else 4) ++
      str("binary_format_major_version") ++ uint(5, 2) ++
      str("binary_format_minor_version") ++ uint(5, 0)
    val meta = Array((0xE0 | 5).toByte) ++ metaPairs
    tree ++ new Array[Byte](16) ++ data.toArray ++ marker ++ meta
  }

  private def write(bytes: Array[Byte]): String = {
    val f = Files.createTempFile("graft_test", ".mmdb")
    Files.write(f, bytes)
    f.toFile.deleteOnExit()
    f.toString
  }

  // 1.0.0.0/8 -> AU, 2.0.0.0/7 -> FR, 100.64.0.0/10 -> US
  private val networks = Seq(
    (1L, 8, "AU"),
    (1L, 7, "FR"),
    ((100L << 2) | 1L, 10, "US"))

  private def ip(s: String): Long = {
    val p = s.split("\\.").map(_.toLong)
    (p(0) << 24) | (p(1) << 16) | (p(2) << 8) | p(3)
  }

  test("readRanges flattens an ip_version=4 tree to sorted country ranges") {
    val ranges = Mmdb.readRanges(write(buildMmdb(networks, v6Chain = false)))
    assert(ranges == Seq(
      GeoIp.IpRange(ip("1.0.0.0"), ip("1.255.255.255"), "AU"),
      GeoIp.IpRange(ip("2.0.0.0"), ip("3.255.255.255"), "FR"),
      GeoIp.IpRange(ip("100.64.0.0"), ip("100.127.255.255"), "US")))
  }

  test("readRanges descends the 96-bit IPv4 embedding of an ip_version=6 tree") {
    val ranges = Mmdb.readRanges(write(buildMmdb(networks, v6Chain = true)))
    assert(ranges.map(_.code) == Seq("AU", "FR", "US"))
    assert(ranges.head.start == ip("1.0.0.0"))
  }

  test("pointer-typed values decode (shared country records)") {
    val ranges = Mmdb.readRanges(write(buildMmdb(networks, v6Chain = false, pointerForDupes = true)))
    assert(ranges.map(_.code) == Seq("AU", "FR", "US"))
  }

  test("loadMmdb drives the geoip functions end-to-end") {
    val path = write(buildMmdb(networks, v6Chain = false))
    try {
      GeoIp.loadMmdb(path)
      GeoIp.register(TestSpark.spark)
      val got = TestSpark.spark.sql(
        """SELECT geoip_country_code('1.2.3.4') AS a,
          |       geoip_country_code('3.0.0.1') AS b,
          |       geoip_country_code('100.100.0.1') AS c,
          |       geoip_country_code('9.9.9.9') AS d""".stripMargin).collect()(0)
      assert(got.getString(0) == "AU")
      assert(got.getString(1) == "FR")
      assert(got.getString(2) == "US")
      assert(got.isNullAt(3))
    } finally {
      GeoIp.reset()
      GeoIp.register(TestSpark.spark) // re-bind the demo table for later suites
    }
  }
}
