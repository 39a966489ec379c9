package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TarShards

class TarShardsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = new java.io.File(System.getProperty("java.io.tmpdir"), s"graft_tar/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getAbsolutePath
  }

  test("round trip: every member byte-identical, shard = pmod(id, shards)") {
    val docs = Seq(
      (0L, "plain ascii"),
      (1L, ""),                               // empty member
      (2L, "exactly-512-padding " * 24),      // crosses block boundaries
      (7L, "unicode é世界 ok"),  // multi-byte UTF-8
      (13L, "a" * 1999)
    ).toDF("doc_id", "text")
    val out = tmp("rt")
    TarShards.write(docs, "doc_id", "text", out, shards = 3)
    val back = TarShards.read(spark, out)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back.keySet == want.keySet)
    want.foreach { case (id, text) =>
      assert(back(id)._1 == text, s"doc $id")
      assert(back(id)._2 == (id % 3).toInt, s"doc $id shard")
    }
  }

  test("randomized round trip incl. block-boundary sizes; gzip shards too") {
    val rng = new scala.util.Random(99)
    val texts = (0 until 60).map { i =>
      val n = Seq(0, 1, 511, 512, 513, 1023, 1024, 1025)(i % 8) + rng.nextInt(40)
      (i.toLong, rng.alphanumeric.take(n).mkString + (if (i % 3 == 0) "\né¥\t" else ""))
    }
    val docs = texts.toDF("doc_id", "text")
    for ((gz, name) <- Seq((false, "rand"), (true, "randgz"))) {
      val out = tmp(name)
      TarShards.write(docs, "doc_id", "text", out, shards = 4, compress = gz)
      val back = TarShards.read(spark, out)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back == texts.toMap, s"gz=$gz")
    }
    // gzip shards are byte-stable across runs too
    val g1 = tmp("gzstable1"); val g2 = tmp("gzstable2")
    TarShards.write(docs, "doc_id", "text", g1, 2, compress = true)
    TarShards.write(docs.repartition(5), "doc_id", "text", g2, 2, compress = true)
    for (s <- 0 until 2) {
      val a = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(g1, f"shard-$s%05d.tar.gz"))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(g2, f"shard-$s%05d.tar.gz"))
      assert(java.util.Arrays.equals(a, b), s"gz shard $s differs")
    }
  }

  test("archives are valid ustar for an independent reader and byte-stable across runs") {
    val docs = (0L until 20L).map(i => (i, s"document number $i body")).toDF("doc_id", "text")
    val o1 = tmp("stable1"); val o2 = tmp("stable2")
    TarShards.write(docs, "doc_id", "text", o1, shards = 2)
    TarShards.write(docs.repartition(7), "doc_id", "text", o2, shards = 2)
    for (s <- 0 until 2) {
      val f1 = java.nio.file.Paths.get(o1, f"shard-$s%05d.tar")
      val f2 = java.nio.file.Paths.get(o2, f"shard-$s%05d.tar")
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f1), java.nio.file.Files.readAllBytes(f2)),
        s"shard $s differs across runs/partitionings")
    }
    // independent reader: the system tar must list the members
    val p = new ProcessBuilder("tar", "-tf", s"$o1/shard-00000.tar").start()
    val names = scala.io.Source.fromInputStream(p.getInputStream).getLines().toList
    assert(p.waitFor() == 0, "system tar rejected the archive")
    assert(names.sorted == (0L until 20L).filter(_ % 2 == 0).map(i => s"$i.txt").sorted.toList)
  }
}
