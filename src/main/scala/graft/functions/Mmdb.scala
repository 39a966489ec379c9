package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Minimal MaxMind-DB (.mmdb) binary-format reader, written against the
  * public format specification (maxmind.github.io/MaxMind-DB). This is the
  * file format behind the reference's GeoIP functions (reference: tajo-core/
  * src/main/java/org/apache/tajo/engine/function/geoip/GeoIPUtil.java wraps
  * the MaxMind reader); the data files themselves are licensed and not
  * redistributable, so nothing is bundled — this reader lets a deployment
  * point [[GeoIp.loadMmdb]] at its own .mmdb file.
  *
  * Layout per the spec: a binary search tree of `nodeCount` nodes (two
  * `recordSize`-bit records each), a 16-byte null separator, the data
  * section, then a metadata marker (0xAB 0xCD 0xEF "MaxMind.com") followed
  * by a metadata map in the same serialization as the data section.
  *
  * Rather than per-row tree walks at query time, [[readRanges]] walks the
  * tree ONCE at load time and flattens it to sorted, non-overlapping
  * [start, end] -> ISO-code ranges — the representation [[GeoIp]] already
  * broadcasts to executors for O(log n) per-row binary search. A full
  * country database flattens to a few hundred thousand ranges, a few MB.
  */
object Mmdb {

  private val Marker: Array[Byte] =
    Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++ "MaxMind.com".getBytes(StandardCharsets.US_ASCII)

  final case class Meta(nodeCount: Int, recordSize: Int, ipVersion: Int)

  /** Decode one data-section value at `off`; returns (value, nextOffset).
    * Maps decode to Map[String, Any], arrays to Vector[Any], integers to
    * Long, double/float to Double, strings to String. */
  private[functions] def decode(buf: Array[Byte], off: Int, dataStart: Int): (Any, Int) = {
    val ctrl = buf(off) & 0xFF
    var tpe = ctrl >>> 5
    var p = off + 1
    if (tpe == 0) { // extended type: next byte + 7
      tpe = (buf(p) & 0xFF) + 7
      p += 1
    }
    if (tpe == 1) { // pointer into the data section — follow, return next
      val sz = (ctrl >>> 3) & 0x3
      val base = ctrl & 0x7
      var v = 0L
      var i = 0
      val extra = sz match { case 0 => 1; case 1 => 2; case 2 => 3; case _ => 4 }
      while (i < extra) { v = (v << 8) | (buf(p + i) & 0xFF); i += 1 }
      val ptr = sz match {
        case 0 => (base.toLong << 8) | v
        case 1 => ((base.toLong << 16) | v) + 2048L
        case 2 => ((base.toLong << 24) | v) + 526336L
        case _ => v
      }
      val (value, _) = decode(buf, dataStart + ptr.toInt, dataStart)
      return (value, p + extra)
    }
    // size: low 5 bits, with 29/30/31 escape forms
    var size = ctrl & 0x1F
    if (size == 29) { size = 29 + (buf(p) & 0xFF); p += 1 }
    else if (size == 30) { size = 285 + (((buf(p) & 0xFF) << 8) | (buf(p + 1) & 0xFF)); p += 2 }
    else if (size == 31) {
      size = 65821 + (((buf(p) & 0xFF) << 16) | ((buf(p + 1) & 0xFF) << 8) | (buf(p + 2) & 0xFF))
      p += 3
    }
    tpe match {
      case 2 => // UTF-8 string
        (new String(buf, p, size, StandardCharsets.UTF_8), p + size)
      case 3 => // double (8 bytes)
        (java.lang.Double.longBitsToDouble(readLong(buf, p, 8)), p + 8)
      case 4 => // bytes
        (buf.slice(p, p + size), p + size)
      case 5 | 6 | 9 | 10 => // uint16 / uint32 / uint64 / uint128 (truncated to Long)
        (readLong(buf, p, size), p + size)
      case 8 => // int32, big-endian two's complement in `size` bytes
        var v = readLong(buf, p, size)
        if (size > 0 && (buf(p) & 0x80) != 0) v -= 1L << (8 * size)
        (v, p + size)
      case 7 => // map of `size` pairs
        var m = Map.empty[String, Any]
        var q = p
        var i = 0
        while (i < size) {
          val (k, q1) = decode(buf, q, dataStart)
          val (v, q2) = decode(buf, q1, dataStart)
          m += (k.asInstanceOf[String] -> v)
          q = q2
          i += 1
        }
        (m, q)
      case 11 => // array of `size` values
        val out = Vector.newBuilder[Any]
        var q = p
        var i = 0
        while (i < size) {
          val (v, q1) = decode(buf, q, dataStart)
          out += v
          q = q1
          i += 1
        }
        (out.result(), q)
      case 14 => // boolean: size IS the value
        (size != 0, p)
      case 15 => // float (4 bytes)
        (java.lang.Float.intBitsToFloat(readLong(buf, p, 4).toInt).toDouble, p + 4)
      case other =>
        throw new IllegalArgumentException(s"unsupported mmdb data type $other at offset $off")
    }
  }

  private def readLong(buf: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (buf(off + i) & 0xFF); i += 1 }
    v
  }

  /** Locate the metadata marker (last occurrence, per spec) and decode the
    * metadata map. */
  private[functions] def readMeta(buf: Array[Byte]): (Meta, Map[String, Any]) = {
    var i = buf.length - Marker.length
    var found = -1
    while (i >= 0 && found < 0) {
      var j = 0
      while (j < Marker.length && buf(i + j) == Marker(j)) j += 1
      if (j == Marker.length) found = i else i -= 1
    }
    require(found >= 0, "not an mmdb file: metadata marker missing")
    val metaOff = found + Marker.length
    val (m, _) = decode(buf, metaOff, metaOff)
    val meta = m.asInstanceOf[Map[String, Any]]
    def need(k: String): Long = meta.getOrElse(k,
      throw new IllegalArgumentException(s"mmdb metadata missing $k")).asInstanceOf[Long]
    (Meta(need("node_count").toInt, need("record_size").toInt, need("ip_version").toInt), meta)
  }

  /** Read record `idx` (0 = left, 1 = right) of `node`. */
  private def record(buf: Array[Byte], recordSize: Int, node: Int, idx: Int): Int = {
    recordSize match {
      case 24 =>
        val off = node * 6 + idx * 3
        (((buf(off) & 0xFF) << 16) | ((buf(off + 1) & 0xFF) << 8) | (buf(off + 2) & 0xFF))
      case 28 =>
        val off = node * 7
        if (idx == 0)
          (((buf(off + 3) & 0xF0) << 20) | ((buf(off) & 0xFF) << 16) |
            ((buf(off + 1) & 0xFF) << 8) | (buf(off + 2) & 0xFF))
        else
          (((buf(off + 3) & 0x0F) << 24) | ((buf(off + 4) & 0xFF) << 16) |
            ((buf(off + 5) & 0xFF) << 8) | (buf(off + 6) & 0xFF))
      case 32 =>
        val off = node * 8 + idx * 4
        (((buf(off) & 0xFF) << 24) | ((buf(off + 1) & 0xFF) << 16) |
          ((buf(off + 2) & 0xFF) << 8) | (buf(off + 3) & 0xFF)) // may overflow int for huge dbs; fine under 2^31 nodes
      case other => throw new IllegalArgumentException(s"unsupported record size $other")
    }
  }

  /** Country ISO code from a decoded location record: `country.iso_code`,
    * falling back to `registered_country.iso_code` (the MaxMind convention
    * for networks with only registration data). */
  private def isoCode(v: Any): Option[String] = v match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      def code(k: String): Option[String] = mm.get(k) match {
        case Some(c: Map[_, _]) =>
          c.asInstanceOf[Map[String, Any]].get("iso_code").collect { case s: String => s }
        case _ => None
      }
      code("country").orElse(code("registered_country"))
    case _ => None
  }

  /** Parse the file and flatten the IPv4 space to sorted country ranges.
    * For ip_version=6 databases the IPv4 tree is rooted under 96 leading
    * zero bits (the spec's IPv4-in-IPv6 embedding). */
  def readRanges(path: String): Seq[GeoIp.IpRange] = {
    val buf = Files.readAllBytes(Paths.get(path))
    val (meta, _) = readMeta(buf)
    val treeBytes = meta.nodeCount * meta.recordSize * 2 / 8
    val dataStart = treeBytes + 16
    // descend to the IPv4 root
    var root = 0
    if (meta.ipVersion == 6) {
      var bit = 0
      while (bit < 96 && root < meta.nodeCount) {
        root = record(buf, meta.recordSize, root, 0)
        bit += 1
      }
      if (root >= meta.nodeCount) return Seq.empty // no IPv4 data
    }
    val out = Seq.newBuilder[GeoIp.IpRange]
    def walk(node: Int, prefix: Long, depth: Int): Unit = {
      var side = 0
      while (side <= 1) {
        val p = (prefix << 1) | side
        val r = record(buf, meta.recordSize, node, side)
        if (r < meta.nodeCount) {
          require(depth < 32, s"search tree deeper than 32 bits at prefix $p")
          walk(r, p, depth + 1)
        } else if (r > meta.nodeCount) {
          val dataOff = dataStart + (r - meta.nodeCount - 16)
          val (v, _) = decode(buf, dataOff, dataStart)
          isoCode(v).foreach { code =>
            val start = p << (31 - depth)
            out += GeoIp.IpRange(start, start + (1L << (31 - depth)) - 1, code)
          }
        } // == nodeCount: empty branch
        side += 1
      }
    }
    walk(root, 0L, 0)
    out.result().sortBy(_.start)
  }
}
