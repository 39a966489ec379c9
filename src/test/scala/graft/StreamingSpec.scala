package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.engine.Tables

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming hourly counts equal the batch aggregation") {
    val stream = EventStreams.runToMemoryTable(
      EventStreams.hourlyCounts(EventStreams.readEvents(spark, sfDir)), "t_hourly")
    val batch = Tables.table(spark, sfDir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("hour"), col("event_type"))
      .agg(count("*").as("cnt"),
        sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"))
    val s = stream.orderBy("hour", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("hour", "event_type").collect().map(_.toSeq)
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("streaming exact dedup emits each distinct key once (batch DISTINCT)") {
    val stream = EventStreams.runToMemoryTable(
      EventStreams.dedupKeys(EventStreams.readEvents(spark, sfDir)),
      "t_dedup", mode = "append")
    val batch = Tables.table(spark, sfDir, "events")
      .select("user_id", "event_type").distinct()
    val s = stream.orderBy("user_id", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("user_id", "event_type").collect().map(_.toSeq)
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("mapGroupsWithState user activity matches the batch profile") {
    val state = EventStreams.runToMemoryTable(
      EventStreams.userActivity(EventStreams.readEvents(spark, sfDir)).toDF(),
      "t_user_activity", mode = "update")
    val batch = Tables.table(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count("*").as("n_events"), max("ts").as("last_ts"))
    // one micro-batch over the finite source → memory table holds the final
    // state row per user
    val s = state.select("user_id", "n_events", "last_ts")
      .orderBy("user_id").collect().map(_.toSeq)
    val b = batch.select("user_id", "n_events", "last_ts")
      .orderBy("user_id").collect().map(_.toSeq)
    assert(s.length == b.length)
    assert(s.sameElements(b))
  }

  test("stream-stream watermarked join equals the batch join") {
    val stream = EventStreams.runToMemoryTable(
      EventStreams.clickPurchaseAttribution(EventStreams.readEvents(spark, sfDir)),
      "t_click_purchase", mode = "append")
    val e = Tables.table(spark, sfDir, "events")
    val batch = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("cts"))
      .join(e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("pts")),
        col("user_id") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id", "user_id")
    val s = stream.orderBy("click_id", "purchase_id").collect().map(_.toSeq)
    val b = batch.orderBy("click_id", "purchase_id").collect().map(_.toSeq)
    assert(s.length == b.length && s.sameElements(b))
  }

  test("streaming session windows produce bounded sessions per user") {
    val sess = EventStreams.runToMemoryTable(
      EventStreams.sessionCounts(EventStreams.readEvents(spark, sfDir)), "t_sessions")
    val rows = sess.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.table(spark, sfDir, "events").count())
  }

  test("streaming near-dup pairs equal the batch operator and are micro-batch-split invariant") {
    import graft.streaming.StreamingDedup
    // seeded near-dups so the pair set is non-trivial, split across TWO
    // parquet files so maxFilesPerTrigger=1 forces two micro-batches —
    // cross-batch pairs must come from state, same-batch pairs from the
    // in-batch comparison; a state bug breaks one of the two runs
    val base = Tables.table(spark, sfDir, "documents").limit(200)
    val perturbed = base.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tailnoise")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("stream_neardup").toString
    try {
      // lay out two single-file directories, each holding a file named
      // documents.parquet (what readDocuments' pathGlobFilter streams)
      base.coalesce(1).write.parquet(s"$dir/part_a")
      perturbed.coalesce(1).write.parquet(s"$dir/part_b")
      new java.io.File(s"$dir/in1").mkdirs(); new java.io.File(s"$dir/in2").mkdirs()
      Seq("part_a" -> "in1", "part_b" -> "in2").foreach { case (from, to) =>
        val f = new java.io.File(s"$dir/$from").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/$to/documents.parquet"))
      }
      val union = spark.read.parquet(s"$dir/in1/documents.parquet", s"$dir/in2/documents.parquet")
      val expected = graft.operators.Dedup
        .simhashNearDupsWide(union, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected.nonEmpty, "seeded near-dups must produce pairs")
      def streamed(maxFiles: Option[Int], glob: String, name: String): Set[(Long, Long, Long)] = {
        var reader = spark.readStream.schema(StreamingDedup.docSchema)
          .option("pathGlobFilter", "documents.parquet")
        maxFiles.foreach(n => reader = reader.option("maxFilesPerTrigger", n.toString))
        val docs = reader.parquet(s"$dir/$glob")
        val pairs = StreamingDedup.nearDupPairs(docs).toDF()
        EventStreams.runToMemoryTable(pairs, name, mode = "append")
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      }
      val oneBatch = streamed(None, "in*", "t_neardup_1")
      val twoBatch = streamed(Some(1), "in*", "t_neardup_2")
      assert(oneBatch == expected, "single-batch stream must equal the batch operator")
      assert(twoBatch == expected, "two-batch stream must equal the batch operator")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("indexedNearDupStream: sequential check-then-append; trigger scope is the contract") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val docs = Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id").between(80, 99))
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val b2 = docs.filter(col("doc_id").between(80, 99) && col("doc_id") % 2 === 0)
      .select((col("doc_id") + 20000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val base = java.nio.file.Files.createTempDirectory("smi").toString
    try {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
      def stage(tag: String): String = {
        val dir = s"$base/$tag"
        Dedup.writeMinhashIndex(corpus, "doc_id", "text", s"$dir/idx")
        Seq(b1 -> "b1", b2 -> "b2").zipWithIndex.foreach { case ((df, n), i) =>
          df.coalesce(1).write.parquet(s"$dir/part_$n")
          new java.io.File(s"$dir/in").mkdirs()
          val f = new java.io.File(s"$dir/part_$n").listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dest = new java.io.File(s"$dir/in/$n.parquet")
          java.nio.file.Files.move(f.toPath, dest.toPath)
          dest.setLastModified(1700000000000L + i * 60000L)
        }
        dir
      }
      def run(dir: String, oneFilePerTrigger: Boolean): Set[Seq[Any]] = {
        var reader = spark.readStream.schema("doc_id BIGINT, text STRING")
        if (oneFilePerTrigger) reader = reader.option("maxFilesPerTrigger", "1")
        val q = StreamingDedup.indexedNearDupStream(
          reader.parquet(s"$dir/in"), s"$dir/idx", s"$dir/pairs")
        q.processAllAvailable(); q.stop()
        rows(spark.read.parquet(s"$dir/pairs").dropDuplicates("new_id", "corpus_id"))
      }
      // two triggers = the sequential composition of the batch operators
      val idx0 = Dedup.MinhashIndex(
        Dedup.minhashBands(Dedup.minhashSignature(corpus, "doc_id", "text"), "doc_id"),
        Dedup.minhashSignature(corpus, "doc_id", "text"))
      val step1 = rows(Dedup.incrementalNearDups(idx0, b1, "doc_id", "text"))
      val u = corpus.select("doc_id", "text").unionAll(b1)
      val idx1 = Dedup.MinhashIndex(
        Dedup.minhashBands(Dedup.minhashSignature(u, "doc_id", "text"), "doc_id"),
        Dedup.minhashSignature(u, "doc_id", "text"))
      val step2 = rows(Dedup.incrementalNearDups(idx1, b2, "doc_id", "text"))
      assert(step2.exists(_.head.asInstanceOf[Long] >= 20000L),
        "b2 must match appended b1 docs or the test is vacuous")
      assert(run(stage("two"), oneFilePerTrigger = true) == step1 ++ step2)
      // ONE trigger: both batches arrive together, so b2-vs-b1 pairs are
      // within-trigger — out of this operator's scope by contract (the
      // scaladoc routes them to in-batch dedup); only pairs against the
      // initial index emit
      val idxAll = Dedup.MinhashIndex(idx0.bands, idx0.sigs)
      val oneShot = rows(Dedup.incrementalNearDups(
        idxAll, b1.unionAll(b2), "doc_id", "text"))
      assert(run(stage("one"), oneFilePerTrigger = false) == oneShot)
      // at-least-once replay: re-invoking the per-batch body with an
      // ALREADY-APPLIED batch (the engine's crash-recovery path) must
      // emit only duplicate rows of the original pairs — the replay
      // guard anti-joins out the within-batch pairs the re-run would
      // otherwise mint against the batch's own appended copy
      StreamingDedup.indexedNearDupBatch(b2, s"$base/two/idx", s"$base/two/pairs")
      assert(rows(spark.read.parquet(s"$base/two/pairs")
          .dropDuplicates("new_id", "corpus_id")) == step1 ++ step2,
        "a replayed batch must not mint new pairs")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("indexedClusterStream: stored assignment equals full recompute; replay is a no-op") {
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    val docs = Tables.table(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 100)
    val b1 = docs.filter(col("doc_id").between(80, 99))
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val b2 = docs.filter(col("doc_id").between(80, 99) && col("doc_id") % 2 === 0)
      .select((col("doc_id") + 20000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val base = java.nio.file.Files.createTempDirectory("smc").toString
    try {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
      Dedup.writeMinhashIndex(corpus, "doc_id", "text", s"$base/idx")
      Dedup.writeClusterState(spark, s"$base/idx", "doc_id")
      Seq(b1 -> "b1", b2 -> "b2").zipWithIndex.foreach { case ((df, n), i) =>
        df.coalesce(1).write.parquet(s"$base/part_$n")
        new java.io.File(s"$base/in").mkdirs()
        val f = new java.io.File(s"$base/part_$n").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = new java.io.File(s"$base/in/$n.parquet")
        java.nio.file.Files.move(f.toPath, dest.toPath)
        dest.setLastModified(1700000000000L + i * 60000L)
      }
      val q = StreamingDedup.indexedClusterStream(
        spark.readStream.schema("doc_id BIGINT, text STRING")
          .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
        s"$base/idx", s"$base/pairs")
      q.processAllAvailable(); q.stop()
      // the durable state after two triggers == one-shot CC over ALL
      // verified pairs of corpus UNION b1 UNION b2
      val union = corpus.select("doc_id", "text").unionAll(b1).unionAll(b2)
      val sigs = Dedup.minhashSignature(union, "doc_id", "text")
      val selfIdx = Dedup.MinhashIndex(Dedup.minhashBands(sigs, "doc_id"), sigs)
      val expected = rows(Dedup.duplicateClusters(
        Dedup.indexSelfPairs(selfIdx, "doc_id")))
      val got = rows(Dedup.readClusterState(spark, s"$base/idx"))
      assert(got == expected)
      assert(got.nonEmpty && got.exists(_.head.asInstanceOf[Long] >= 20000L),
        "b2 docs must appear in the folded state or the test is vacuous")
      // at-least-once replay: re-applying b2 must leave the state
      // unchanged (the replay guard keeps the cross pairs identical and
      // re-folding already-folded pairs is a contraction no-op)
      StreamingDedup.indexedClusterBatch(b2, s"$base/idx", s"$base/pairs")
      assert(rows(Dedup.readClusterState(spark, s"$base/idx")) == expected,
        "a replayed batch must not change the cluster state")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("indexedAnnStream: sequential search-then-add; replay appends nothing") {
    import graft.operators.Similarity
    import graft.streaming.StreamingAnn
    val vecs = Tables.table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val corpus = vecs.filter(col("vec_id") % 4 =!= 0)
    val b1 = vecs.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val b2 = vecs.filter(col("vec_id") % 8 === 2)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val base = java.nio.file.Files.createTempDirectory("sann").toString
    try {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
      Similarity.writeIvfPqResidualIndex(corpus, "vec_id", "embedding", s"$base/idx")
      Seq(b1 -> "b1", b2 -> "b2").zipWithIndex.foreach { case ((df, n), i) =>
        df.coalesce(1).write.parquet(s"$base/part_$n")
        new java.io.File(s"$base/in").mkdirs()
        val f = new java.io.File(s"$base/part_$n").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = new java.io.File(s"$base/in/$n.parquet")
        java.nio.file.Files.move(f.toPath, dest.toPath)
        dest.setLastModified(1700000000000L + i * 60000L)
      }
      val q = StreamingAnn.indexedAnnStream(
        spark.readStream.schema(corpus.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/in"),
        s"$base/idx", s"$base/matches")
      q.processAllAvailable(); q.stop()
      val sink = rows(spark.read.parquet(s"$base/matches")
        .dropDuplicates("query_id", "neighbor_id"))
      // sequential composition of the batch operators: b1 searches the
      // corpus index; b2 searches corpus UNION b1 (fresh builds — the
      // frozen-quantizer add encodes identically to a same-train rebuild
      // only because the train side is the same corpus, so compose with
      // index-as-of-step semantics via queryIvfPqResidual on stored dirs)
      Similarity.writeIvfPqResidualIndex(corpus, "vec_id", "embedding", s"$base/ref")
      val ref0 = Similarity.IvfPqResidualIndex.read(spark, s"$base/ref")
      val step1 = rows(Similarity.queryIvfPqResidual(ref0, b1, b1,
        "vec_id", "embedding", k = 5, nProbe = 4))
      Similarity.appendIvfPqResidualIndex(b1, "vec_id", "embedding", s"$base/ref")
      val ref1 = Similarity.IvfPqResidualIndex.read(spark, s"$base/ref")
      val step2 = rows(Similarity.queryIvfPqResidual(ref1, b2, b2,
        "vec_id", "embedding", k = 5, nProbe = 4))
      assert(sink == step1 ++ step2)
      assert(step2.exists(_(1).asInstanceOf[Long] >= 100000L),
        "b2 must reach appended b1 vectors or the test is vacuous")
      // at-least-once replay: re-applying b2 appends NO code rows and
      // emits only duplicates of the original match rows
      val codesBefore = spark.read.parquet(s"$base/idx/codes").count()
      StreamingAnn.indexedAnnBatch(b2, s"$base/idx", s"$base/matches")
      assert(spark.read.parquet(s"$base/idx/codes").count() == codesBefore,
        "a replayed batch must not append code rows (duplicates would double ADC sums)")
      assert(rows(spark.read.parquet(s"$base/matches")
        .dropDuplicates("query_id", "neighbor_id")) == sink,
        "a replayed batch must emit only duplicate match rows")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("streaming minhash near-dup equals the batch composition and is split-invariant") {
    import graft.streaming.StreamingDedup
    import graft.operators.Dedup
    val base = Tables.table(spark, sfDir, "documents").limit(200)
    val perturbed = base.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tailnoise")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("stream_mh_neardup").toString
    try {
      base.coalesce(1).write.parquet(s"$dir/part_a")
      perturbed.coalesce(1).write.parquet(s"$dir/part_b")
      new java.io.File(s"$dir/in1").mkdirs(); new java.io.File(s"$dir/in2").mkdirs()
      Seq("part_a" -> "in1", "part_b" -> "in2").foreach { case (from, to) =>
        val f = new java.io.File(s"$dir/$from").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/$to/documents.parquet"))
      }
      // batch composition of the same spec: banded candidates + signature
      // agreement — exactly incrementalNearDups with the corpus as its own
      // index
      val union = spark.read.parquet(s"$dir/in1/documents.parquet", s"$dir/in2/documents.parquet")
      val sigs = Dedup.minhashSignature(union, "doc_id", "text")
      val selfIdx = Dedup.MinhashIndex(Dedup.minhashBands(sigs, "doc_id"), sigs)
      val expected = Dedup.incrementalNearDups(selfIdx, union, "doc_id", "text")
        .filter(col("new_id") < col("corpus_id")) // one orientation per pair
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected.nonEmpty, "seeded near-dups must produce pairs")
      def streamed(maxFiles: Option[Int], name: String): Set[(Long, Long, Long)] = {
        var reader = spark.readStream.schema(StreamingDedup.docSchema)
          .option("pathGlobFilter", "documents.parquet")
        maxFiles.foreach(n => reader = reader.option("maxFilesPerTrigger", n.toString))
        val docs = reader.parquet(s"$dir/in*")
        val pairs = StreamingDedup.minhashNearDupPairs(docs).toDF()
        EventStreams.runToMemoryTable(pairs, name, mode = "append")
          .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      }
      assert(streamed(None, "t_mh_neardup_1") == expected,
        "single-batch stream must equal the batch composition")
      assert(streamed(Some(1), "t_mh_neardup_2") == expected,
        "two-batch stream must equal the batch composition")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("streaming minhash near-dup member cap equals the eviction-rule replay") {
    import graft.streaming.StreamingDedup
    import graft.operators.Dedup
    val cap = 1
    val base = Tables.table(spark, sfDir, "documents").limit(200)
    val perturbed = base.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tailnoise")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("stream_mh_cap").toString
    try {
      base.unionAll(perturbed).coalesce(1).write.parquet(s"$dir/part")
      new java.io.File(s"$dir/in").mkdirs()
      val f = new java.io.File(s"$dir/part").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/in/documents.parquet"))
      val union = spark.read.parquet(s"$dir/in/documents.parquet")
      // batch composition of the same spec (the uncapped ground truth):
      // banded candidates + signature agreement, corpus as its own index
      val allSigs = Dedup.minhashSignature(union, "doc_id", "text")
      val batchPairs = Dedup.incrementalNearDups(
        Dedup.MinhashIndex(Dedup.minhashBands(allSigs, "doc_id"), allSigs),
        union, "doc_id", "text")
        .filter(col("new_id") < col("corpus_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchPairs.nonEmpty)
      // replay the shared eviction rule over the SAME banded rows, with
      // the minhash agreement predicate — proving the documented cap
      // semantics hold for this spelling too (the state machine is shared
      // with the simhash operator, whose specs pin the rest)
      graft.functions.TajoFunctions.register(spark)
      val keys = Dedup.minhashBandStructs(8, 2)
      val banded = union
        .select(col("doc_id"), expr("minhash_sig(text, 16, 3)").as("sig"))
        .select(col("doc_id"), col("sig"), explode(expr(keys)).as("__b"))
        .select(col("doc_id"), col("sig"), col("__b.band"), col("__b.band_key"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2), r.getLong(3)))
      val simulated = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      val evicted = scala.collection.mutable.Set.empty[Long]
      banded.groupBy(r => (r._3, r._4)).foreach { case (_, rows) =>
        var members = List.empty[(Long, Seq[Long])]
        rows.map(r => (r._1, r._2)).sortBy(_._1).foreach { case (id, sig) =>
          members.foreach { case (oid, osig) =>
            val m = sig.zip(osig).count { case (a, b) => a == b }.toLong
            if (oid != id && m >= 8)
              simulated += ((math.min(id, oid), math.max(id, oid), m))
          }
          members = (id, sig) :: members
          if (members.lengthCompare(cap) > 0) {
            members.drop(cap).foreach { case (eid, _) => evicted += eid }
            members = members.take(cap)
          }
        }
      }
      val docs = spark.readStream.schema(StreamingDedup.docSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(s"$dir/in")
      val capped = EventStreams.runToMemoryTable(
        StreamingDedup.minhashNearDupPairs(docs, maxMembers = cap).toDF(),
        "t_mh_neardup_cap", mode = "append")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(capped == simulated.toSet,
        "capped minhash stream must equal the eviction-rule replay")
      // VERDICT r10 #5: exercise the minhash spelling's bounds DIRECTLY —
      // the capped stream is a subset of the batch composition, every
      // suppression is localized to an evicted member, and the cap
      // genuinely bites on this fixture
      assert(capped.subsetOf(batchPairs),
        "capped minhash output must be a subset of the batch composition")
      val suppressed = batchPairs -- capped
      assert(suppressed.nonEmpty,
        s"cap=$cap must actually suppress pairs on this fixture or the test is vacuous")
      suppressed.foreach { case (d1, d2, _) =>
        assert(evicted.contains(d1) || evicted.contains(d2),
          s"suppressed pair ($d1,$d2) must involve an evicted member")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("streaming near-dup member cap: subset of batch, suppressions only via evictions") {
    import graft.streaming.StreamingDedup
    val cap = 1
    val base = Tables.table(spark, sfDir, "documents").limit(200)
    val perturbed = base.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tailnoise")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("stream_neardup_cap").toString
    try {
      base.unionAll(perturbed).coalesce(1).write.parquet(s"$dir/part")
      new java.io.File(s"$dir/in").mkdirs()
      val f = new java.io.File(s"$dir/part").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/in/documents.parquet"))
      val union = spark.read.parquet(s"$dir/in/documents.parquet")
      val batchPairs = graft.operators.Dedup
        .simhashNearDupsWide(union, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batchPairs.nonEmpty)

      // replay the operator's documented eviction rule in plain Scala over
      // the SAME banded rows (shared key builder), in the operator's
      // single-batch processing order (ascending id per bucket) — the
      // streamed capped output must match this replay exactly, which also
      // proves subset-of-batch and localizes every suppression to an
      // eviction
      graft.functions.TajoFunctions.register(spark)
      val keys = graft.operators.Dedup.simhash60PackedKeys(3, 4)
      val banded = union
        .select(col("doc_id"), expr("simhash60(SPLIT(text, ' '))").as("simhash"))
        .filter(col("doc_id").isNotNull && col("simhash").isNotNull)
        .select(col("doc_id"), col("simhash"), explode(expr(keys)).as("bkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val simulated = scala.collection.mutable.Set.empty[(Long, Long, Long)]
      val evicted = scala.collection.mutable.Set.empty[Long]
      banded.groupBy(_._3).foreach { case (_, rows) =>
        var members = List.empty[(Long, Long)]
        rows.map(r => (r._1, r._2)).sortBy(_._1).foreach { case (id, sig) =>
          members.foreach { case (oid, osig) =>
            val h = java.lang.Long.bitCount(sig ^ osig).toLong
            if (oid != id && h <= 3)
              simulated += ((math.min(id, oid), math.max(id, oid), h))
          }
          members = (id, sig) :: members
          if (members.lengthCompare(cap) > 0) {
            members.drop(cap).foreach { case (eid, _) => evicted += eid }
            members = members.take(cap)
          }
        }
      }
      val docs = spark.readStream.schema(StreamingDedup.docSchema)
        .option("pathGlobFilter", "documents.parquet").parquet(s"$dir/in")
      val capped = EventStreams.runToMemoryTable(
        StreamingDedup.nearDupPairs(docs, maxMembers = cap).toDF(),
        "t_neardup_cap", mode = "append")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(capped == simulated.toSet,
        "capped stream must equal the eviction-rule replay")
      assert(capped.subsetOf(batchPairs),
        "capped output must be a subset of the batch operator's pairs")
      val suppressed = batchPairs -- capped
      assert(suppressed.nonEmpty,
        s"cap=$cap must actually suppress pairs on this fixture or the test is vacuous")
      suppressed.foreach { case (d1, d2, _) =>
        assert(evicted.contains(d1) || evicted.contains(d2),
          s"suppressed pair ($d1,$d2) must involve an evicted member")
      }
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("streaming near-dup TTL drops idle buckets: stale cross-batch pairs are not emitted") {
    import graft.streaming.StreamingDedup
    val base = Tables.table(spark, sfDir, "documents").limit(200)
    val perturbed = base.filter(col("doc_id") % 5 === 0).select(
      (col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" tailnoise")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    // the middle batch only exists to run a trigger AFTER the TTL deadline
    // (ProcessingTimeTimeout evicts idle groups at the next executed batch)
    val decoy = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        900000L, "zq zx qv xw wz vq qz xz zw wq vx xq", "xx", "decoy", 35L)),
      StreamingDedup.docSchema)
    val dir = java.nio.file.Files.createTempDirectory("stream_neardup_ttl").toString
    try {
      Seq(base -> "b1", decoy -> "b2", perturbed -> "b3").foreach { case (df, n) =>
        df.coalesce(1).write.parquet(s"$dir/part_$n")
        new java.io.File(s"$dir/$n").mkdirs()
        val f = new java.io.File(s"$dir/part_$n").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(s"$dir/$n/documents.parquet"))
      }
      // file-source batch order follows modification time — pin it
      Seq("b1", "b2", "b3").zipWithIndex.foreach { case (n, i) =>
        new java.io.File(s"$dir/$n/documents.parquet")
          .setLastModified(1700000000000L + i * 60000L)
      }
      // precondition: the decoy must not share a band bucket with any base
      // doc, or it would keep that bucket alive across the TTL and the
      // expected set below would be wrong (deterministic data — checked once)
      graft.functions.TajoFunctions.register(spark)
      val keys = graft.operators.Dedup.simhash60PackedKeys(3, 4)
      def bkeys(df: org.apache.spark.sql.DataFrame): Set[Long] = df
        .select(expr("simhash60(SPLIT(text, ' '))").as("simhash"))
        .select(explode(expr(keys)))
        .collect().map(_.getLong(0)).toSet
      assert(bkeys(spark.read.parquet(s"$dir/b2/documents.parquet"))
        .intersect(bkeys(spark.read.parquet(s"$dir/b1/documents.parquet"))).isEmpty,
        "decoy shares a bucket with the base batch — pick a different decoy text")
      def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
        graft.operators.Dedup.simhashNearDupsWide(df, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b1 = spark.read.parquet(s"$dir/b1/documents.parquet")
      val b3 = spark.read.parquet(s"$dir/b3/documents.parquet")
      val within = pairsOf(b1) ++ pairsOf(b3)
      val cross = pairsOf(b1.unionAll(b3)) -- within
      assert(cross.nonEmpty, "fixture must have cross-batch pairs for the TTL to suppress")
      val docs = spark.readStream.schema(StreamingDedup.docSchema)
        .option("pathGlobFilter", "documents.parquet")
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*")
      // 1ms TTL << one micro-batch, so every b1 bucket is idle-expired by
      // the next trigger and removed before b3's near-dups of b1 arrive.
      // Driven by source progress, NOT processAllAvailable: with
      // ProcessingTimeTimeout the engine schedules timeout-sweep batches
      // continuously, so the stream never reports quiescence (see the
      // nearDupPairs scaladoc) — wait until all 241 source rows are
      // consumed, then stop.
      val totalRows = base.count() + 1 + perturbed.count()
      val q = StreamingDedup.nearDupPairs(docs, ttlMs = 1L).toDF()
        .writeStream.outputMode("append")
        .format("memory").queryName("t_neardup_ttl").start()
      try {
        val deadline = System.currentTimeMillis() + 180000L
        // recentProgress is a BOUNDED (~100-entry) ring buffer and
        // ProcessingTimeTimeout schedules continuous empty sweep batches,
        // so a data batch's progress entry can be evicted between polls —
        // accumulate per-batch counts across polls instead of re-summing
        // the buffer (ADVICE r10)
        val seenBatches = scala.collection.mutable.Set.empty[Long]
        var consumed = 0L
        def poll(): Long = {
          q.recentProgress.foreach { p =>
            if (seenBatches.add(p.batchId)) consumed += p.numInputRows
          }
          consumed
        }
        while (poll() < totalRows && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(consumed >= totalRows, s"stream stalled: $consumed/$totalRows rows")
        // one more sweep interval so the final batch's emits land in the sink
        Thread.sleep(500)
      } finally q.stop()
      val got = spark.table("t_neardup_ttl")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == within,
        "TTL run must emit exactly the within-batch pairs: stale cross-batch pairs dropped")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("streaming near-dup validates banding like the batch operator") {
    import graft.streaming.StreamingDedup
    val docs = Tables.table(spark, sfDir, "documents").limit(1)
    intercept[IllegalArgumentException] {
      StreamingDedup.nearDupPairs(docs, maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      StreamingDedup.nearDupPairs(docs, bands = 7)
    }
  }
}
