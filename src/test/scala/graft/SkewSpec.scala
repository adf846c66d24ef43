package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.llm.Dedup

/** Adversarial skew: every guard that must keep per-task work bounded
  * when one key/bucket/partition-value holds half the data (the 100x
  * failure mode a small-SF bench cannot see). Timing is not assertable
  * deterministically, so each test asserts the deterministic proxy:
  * rows per bucket / file / shuffle partition stay bounded. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain-join rows on a skewed key") {
    // 10k rows, 90% on one hot key
    val big = (1 to 10000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "payload")
    val dim = (0 to 7).map(i => (i, s"name$i")).toDF("k", "name")

    val plain = big.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), salts = 8)

    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the join condition includes the salt column
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("salted join spreads a 90%-hot key across shuffle partitions") {
    val big = (1 to 10000).map(i => (if (i <= 9000) 1 else i % 50, i))
      .toDF("k", "payload")
    val dim = (0 to 50).map(i => (i, s"name$i")).toDF("k", "name")

    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long = {
      val counts = df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect()
      if (counts.isEmpty) 0L else counts.max
    }
    // plain join: the hot key's 9000 rows land in ONE reducer
    val plain = big.repartition(4, col("k")).join(dim, Seq("k"))
    // salted join: (k, salt) spreads them over the salt space
    val salted = Skew.saltedJoin(big, dim, Seq("k"), salts = 8)
    val total = 10000L
    assert(maxPartRows(plain) >= (total * 0.9).toLong)
    assert(maxPartRows(salted) <= (total * 0.6).toLong,
      "hot key not spread by salting")
  }

  test("minhash LSH: a 50%-hot band bucket is capped, no quadratic pairs") {
    // 400 docs: 200 copies of IDENTICAL text (every band bucket hot),
    // plus 100 near-dup pairs that must still be found
    val hot = (1 to 200).map(i => (s"h$i", "the same hot text repeated everywhere"))
    val pairs = (1 to 100).flatMap(i => Seq(
      (s"a$i", s"unique document number $i with shared shingle content tail"),
      (s"b$i", s"unique document number $i with shared shingle content tail x")))
    val d = (hot ++ pairs).toDF("doc_id", "text")

    val found = Dedup.minhashLshPairs(d, maxBucketSize = 100)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    // guard: zero pairs from the hot clique (cap 100 < 200 members) -
    // without the cap it would emit C(200,2)=19900 pairs per band
    assert(!found.exists { case (a, b) => a.startsWith("h") && b.startsWith("h") },
      "hot-clique pairs leaked past the bucket cap")
    // the planted near-dups elsewhere still surface
    val planted = found.count { case (a, b) =>
      a.stripPrefix("a") == b.stripPrefix("b") }
    assert(planted >= 90, s"only $planted/100 planted near-dups found")
    assert(found.size <= 300, s"pair blowup: ${found.size}")
  }

  test("simhash: a hot chunk value is capped, normal near-dups survive") {
    val hot = (1 to 200).map(i => (s"h$i", "identical simhash payload"))
    // planted dups: identical per-pair text (hamming 0), unique per i -
    // their buckets have size 2 and must survive the cap
    val pairs = (1 to 50).flatMap(i => Seq(
      (s"a$i", s"simhash probe text $i alpha beta gamma delta"),
      (s"b$i", s"simhash probe text $i alpha beta gamma delta")))
    val d = (hot ++ pairs).toDF("doc_id", "text")
    val found = Dedup.simhashPairs(d, maxBucketSize = 100)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(!found.exists { case (a, b) => a.startsWith("h") && b.startsWith("h") },
      "hot-clique pairs leaked past the chunk-bucket cap")
    val planted = found.count { case (a, b) =>
      a.stripPrefix("a") == b.stripPrefix("b") }
    assert(planted >= 40, s"only $planted/50 planted near-dups found")
  }

  test("export: a 90%-hot partition value is bounded per file AND parallel") {
    val rows = (1 to 1000).map(i =>
      (i.toLong, if (i <= 900) "hot" else s"cold${i % 5}", s"doc$i"))
      .toDF("doc_id", "source", "text")
    val out = java.nio.file.Files.createTempDirectory("skew_export").toString
    graft.llm.Export.writePartitioned(rows, out,
      partitionCols = Seq("source"), targetRowsPerFile = 100L)

    val hotFiles = new java.io.File(s"$out/source=hot")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    // ceil(900/100)=9 buckets: parallel writers, not one 900-row task
    assert(hotFiles.length >= 5 && hotFiles.length <= 9,
      s"hot value wrote ${hotFiles.length} files, want 5..9")
    // and no single file (= one writer task's share) is unbounded
    val perFile = hotFiles.map(f =>
      spark.read.parquet(f.getPath).count())
    assert(perFile.max <= 300,
      s"one writer task got ${perFile.max} of 900 hot rows")
    assert(perFile.sum == 900L)
  }

  test("pack -> export chain bounds files per stratum and loses nothing " +
    "(the q_pack_export registry chain)") {
    import spark.implicits._
    val docs = (1L to 400L).map(i =>
      (i, if (i % 4 == 0) "code" else "web", 60L + (i % 7)))
      .toDF("doc_id", "source", "n_tokens")
    val chunks = graft.llm.Packing.assignChunks(docs, seqLen = 256)
      .select($"doc_id", $"source", $"chunk_id", $"begin_off", $"end_off")
    val expect = chunks.collect().map(_.toSeq).toSet
    val out = java.nio.file.Files.createTempDirectory("pack_export").toString
    graft.llm.Export.writePartitioned(chunks, out,
      partitionCols = Seq("source"), sortCol = "doc_id",
      targetRowsPerFile = 100L)
    for (src <- Seq("web", "code")) {
      val rows = chunks.filter($"source" === src).count()
      val files = new java.io.File(s"$out/source=$src")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      val buckets = math.max(1L, math.ceil(rows / 100.0).toLong)
      assert(files.nonEmpty && files.length <= buckets,
        s"$src: ${files.length} files for $rows rows (cap $buckets)")
    }
    // round trip is lossless (the property q_pack_export's oracle gates)
    val got = spark.read.parquet(out)
      .select($"doc_id", $"source", $"chunk_id", $"begin_off", $"end_off")
      .collect().map(_.toSeq).toSet
    assert(got == expect)
  }

  test("pHash window gate: a 90%-hot bucket on a 100k corpus SPILLS " +
    "(never OOMs), emits zero hot pairs, and planted dups survive") {
    import spark.implicits._
    // splitmix64: effectively-random 64-bit hashes, so non-planted
    // rows collide on a chunk only by birthday chance and are then
    // killed by the hamming verify (random pairs sit near hamming 32)
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val hotHash = 0x5A5A5A5A5A5A5A5AL
    // 400 planted rows: 200 identical-hash pairs (ids 2i-1, 2i);
    // 90_000 hot rows (ids >= 1_000_000) all on ONE hash - every one
    // of its 3 chunk buckets holds 90k members, ~90% of the corpus;
    // 9_600 unique fillers
    val rows =
      (1L to 200L).flatMap(i => Seq((2 * i - 1, mix(i)), (2 * i, mix(i)))) ++
        (0L until 90000L).map(i => (1000000L + i, hotHash)) ++
        (0L until 9600L).map(i => (2000000L + i, mix(1000000L + i)))
    val withHash = rows.toDF("asset_id", "phash")

    // the docstring claims the hot bucket rides WindowExec's SPILLING
    // partition buffer (90k rows >> the 4096-row in-memory window
    // threshold) - observe it via task metrics, not by faith
    val spilled = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null)
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // force the window buffer onto its spill path at test heap sizes
    // (in production the 4096-row in-memory threshold hands the buffer
    // to an UnsafeExternalSorter that spills under memory pressure; a
    // roomy test JVM may never feel that pressure, so pin the row
    // threshold to prove the spill path completes, not that the test
    // heap is big)
    val spillKey = "spark.sql.windowExec.buffer.spill.threshold"
    val prevSpill = spark.conf.getOption(spillKey)
    spark.conf.set(spillKey, "8192")
    val found =
      try graft.llm.Multimodal
        .phashPairsFromHashes(withHash, maxHamming = 2, maxBucketSize = 1000)
        .select($"asset_id_a", $"asset_id_b").as[(Long, Long)].collect()
      finally {
        prevSpill.fold(spark.conf.unset(spillKey))(v =>
          spark.conf.set(spillKey, v))
        // listener events are async; give the bus a bounded drain
        val deadline = System.nanoTime() + 10_000_000_000L
        while (spilled.get() == 0 && System.nanoTime() < deadline)
          Thread.sleep(100)
        spark.sparkContext.removeSparkListener(listener)
      }
    // zero pairs from the degenerate bucket (90k >> cap 1000)
    assert(!found.exists { case (a, b) => a >= 1000000L || b >= 1000000L },
      "hot-bucket pairs leaked past the window gate")
    // every planted identical-hash pair surfaces exactly
    val planted = found.filter { case (a, b) => a < 1000L && b < 1000L }.toSet
    assert(planted == (1L to 200L).map(i => (2 * i - 1, 2 * i)).toSet,
      s"planted pairs wrong: got ${planted.size}")
    // completion path was spill, not an in-memory squeeze
    info(s"observed spill: ${spilled.get()} bytes across the job's tasks")
    assert(spilled.get() > 0,
      "expected the 90k-row hot window partition to spill")
  }
}
