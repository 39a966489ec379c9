package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

/** The stale-lease CAS takeover (VERDICT r12 #3): the old delete-then-
  * create spelling let two racers both "take over" one stale lease — B,
  * whose staleness judgment came from a read BEFORE A's takeover, deleted
  * A's fresh lease and both writers proceeded. The rename-arbitered
  * takeover makes exactly one win in every interleaving; these specs
  * drive the two racing interleavings deterministically against the real
  * primitive. */
class LeaseTakeoverSpec extends AnyFunSuite {
  import graft.TestSpark._

  private def scratch(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def leasePath(dir: String) = new Path(s"$dir/_write_lease.json")

  private def staleLeaseBytes(ageMs: Long): Array[Byte] =
    (s"""{"owner":"crashed-writer","epochMs":${System.currentTimeMillis() - ageMs},""" +
      s""""what":"simulated crashed writer"}""").getBytes("UTF-8")

  test("interleaved takeovers: the late racer renames the winner's FRESH lease, detects it, restores it, loses") {
    val dir = scratch("lease_race1")
    val f = IndexFiles.fs(spark, leasePath(dir))
    val stale = staleLeaseBytes(IndexFiles.DefaultLeaseTtlMs + 600000)
    val out0 = f.create(leasePath(dir), false)
    try out0.write(stale) finally out0.close()
    // both racers read the same stale lease; A completes its takeover and
    // writes its fresh lease
    IndexFiles.takeoverStale(f, dir, "racerA", stale)
    val fresh = (s"""{"owner":"racer-a","epochMs":${System.currentTimeMillis()},""" +
      """"what":"racer A's fresh lease"}""").getBytes("UTF-8")
    val outA = f.create(leasePath(dir), false)
    try outA.write(fresh) finally outA.close()
    // B's takeover — judged from its PRE-takeover read — must lose AND
    // leave A's fresh lease in place (the delete-then-create spelling
    // silently destroyed it here)
    val e = intercept[IllegalStateException](
      IndexFiles.takeoverStale(f, dir, "racerB", stale))
    assert(e.getMessage.contains("changed hands"))
    assert(f.exists(leasePath(dir)), "the winner's lease must survive the losing racer")
    assert(java.util.Arrays.equals(IndexFiles.slurp(f, leasePath(dir)), fresh),
      "the restored lease must be byte-identical to the winner's")
    // no tombstone litter
    assert(Option(f.globStatus(new Path(s"$dir/_stale_lease_*")))
      .getOrElse(Array.empty).isEmpty)
  }

  test("interleaved takeovers: the late racer's rename fails while the winner holds the tombstone") {
    val dir = scratch("lease_race2")
    val f = IndexFiles.fs(spark, leasePath(dir))
    val stale = staleLeaseBytes(IndexFiles.DefaultLeaseTtlMs + 600000)
    val out0 = f.create(leasePath(dir), false)
    try out0.write(stale) finally out0.close()
    // A tombstones the stale lease but has NOT yet created its fresh one —
    // B's rename finds no source and loses immediately
    IndexFiles.takeoverStale(f, dir, "racerA", stale)
    val e = intercept[IllegalStateException](
      IndexFiles.takeoverStale(f, dir, "racerB", stale))
    assert(e.getMessage.contains("claimed"))
  }
}
