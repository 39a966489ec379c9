package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** GeoIP lookup functions: `geoip_country_code(ip)` and
  * `geoip_in_country(ip, code)`.
  *
  * The reference resolves IPs against a MaxMind-style database file
  * configured at startup (reference: tajo-core/src/main/java/org/apache/
  * tajo/engine/function/geoip/GeoIPCountryInet4.java, GeoIPUtil.java).
  * That database is not redistributable, so the engine ships the same
  * function surface over a pluggable sorted range table:
  *
  *   - `GeoIp.load(ranges)` installs any [startIp, endIp] -> code table
  *     (e.g. parsed from a licensed MaxMind CSV export);
  *   - the default is a deterministic 8-block demo table (each /3-bit
  *     first-octet block maps to one code) so behavior is testable without
  *     bundled data.
  *
  * Scale: lookup is a binary search over an immutable array captured in the
  * UDF closure — shipped once per executor inside the task binary broadcast,
  * no shuffle, no join. A country-level IPv4 table is ~300k ranges ≈ a few
  * MB, well under broadcast scale; per-row cost is O(log n) with zero
  * allocation.
  */
object GeoIp {

  final case class IpRange(start: Long, end: Long, code: String)

  /** Demo table: first octet block of 32 → one of 8 codes. */
  val defaultTable: Array[IpRange] = {
    val codes = Array("US", "CA", "GB", "DE", "FR", "JP", "KR", "AU")
    codes.zipWithIndex.map { case (c, i) =>
      IpRange(i.toLong * 32 << 24, ((i.toLong + 1) * 32 << 24) - 1, c)
    }
  }

  @volatile private var table: Array[IpRange] = defaultTable

  /** Install a custom range table (sorted by start, non-overlapping). */
  def load(ranges: Seq[IpRange]): Unit = {
    val sorted = ranges.sortBy(_.start).toArray
    require(sorted.iterator.sliding(2).withPartial(false)
      .forall(w => w.head.end < w(1).start), "ranges must not overlap")
    table = sorted
  }

  /** Load ranges from a MaxMind-DB (.mmdb) file via [[Mmdb.readRanges]] —
    * the format the reference's GeoIP functions consume. The tree is
    * flattened once at load time; query-time lookup stays the broadcast
    * binary search. */
  def loadMmdb(path: String): Unit = load(Mmdb.readRanges(path))

  def reset(): Unit = table = defaultTable

  private def ipToLong(ip: String): Long = {
    val p = ip.split("\\.")
    (p(0).toLong << 24) | (p(1).toLong << 16) | (p(2).toLong << 8) | p(3).toLong
  }

  private def lookup(t: Array[IpRange], ip: Long): String = {
    var lo = 0
    var hi = t.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val r = t(mid)
      if (ip < r.start) hi = mid - 1
      else if (ip > r.end) lo = mid + 1
      else return r.code
    }
    null
  }

  // session -> identity of the table its UDFs are currently bound to; a
  // plain seen-set would refuse to re-bind after load() -> reset() -> load()
  private val registered = new ConcurrentHashMap[Integer, Integer]()

  /** Registers the UDFs against a snapshot of the current table; the
    * snapshot is captured into the closure, so it ships to executors with
    * the task binary. Calling load() then register() re-binds the names. */
  def register(spark: SparkSession): Unit = {
    val t = table // immutable snapshot captured by the closures below
    val sparkKey = Integer.valueOf(System.identityHashCode(spark))
    val tableId = Integer.valueOf(System.identityHashCode(t))
    if (tableId.equals(registered.put(sparkKey, tableId))) return
    spark.udf.register("geoip_country_code", (ip: String) =>
      if (ip == null) null else lookup(t, ipToLong(ip)))
    spark.udf.register("geoip_in_country", (ip: String, code: String) =>
      if (ip == null || code == null) null
      else java.lang.Boolean.valueOf(code == lookup(t, ipToLong(ip))))
    ()
  }
}
