package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.llm.{Dedup, Features, Splitting}

/** Property-based checks: seeded scalacheck generators drive randomized
  * inputs; the expected answer is recomputed driver-side by a brute
  * force oblivious to the operators' plan shape. A fixed seed keeps
  * runs reproducible; each property runs several generated datasets
  * (one Spark action per dataset, so the suite stays fast).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var s = Seed(seed0)
    (1 to n).map { _ =>
      val v = gen.pureApply(Gen.Parameters.default, s)
      s = s.next
      v
    }
  }

  test("property: rolling features match an O(n^2) brute force") {
    val eventGen = for {
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(1L, 3L)
        t <- Gen.choose(0L, 2000L)
        v <- Gen.choose(-100, 100).map(_.toDouble)
      } yield (user, t, v))
    } yield rows.zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) }

    for (data <- samples(eventGen, 4, 42L)) {
      val df = data.toDF("event_id", "user_id", "t", "value")
      val got = Features.rollingFeatures(df, horizonsSec = Seq(600L))
        .select("event_id", "n_600s", "min_v_600s", "max_v_600s", "gap_s", "seq_n")
        .as[(Long, Long, Double, Double, Option[Long], Int)]
        .collect().map(r => r._1 -> r).toMap
      for ((id, u, t, _) <- data) {
        val frame = data.filter { case (_, u2, t2, _) =>
          u2 == u && t2 > t - 600 && t2 <= t }
        val vs = frame.map(_._4)
        val before = data.filter { case (id2, u2, t2, _) =>
          u2 == u && (t2 < t || (t2 == t && id2 < id)) }
        val expGap = if (before.isEmpty) None
          else Some(t - before.map(_._3).max)
        val r = got(id)
        assert(r._2 == frame.size, s"n_600s for $id")
        assert(r._3 == vs.min && r._4 == vs.max, s"min/max for $id")
        assert(r._5 == expGap, s"gap for $id")
        assert(r._6 == before.size + 1, s"seq for $id")
      }
    }
  }

  test("property: boilerplate removal invariants on random corpora") {
    // small vocab forces chunk collisions across documents
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = for {
      n <- Gen.choose(2, 12)
      docs <- Gen.listOfN(n, Gen.choose(0, 9).flatMap(len =>
        Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (txt, i) => (i.toLong, txt) }

    for (data <- samples(docGen, 4, 7L)) {
      val df = data.toDF("doc_id", "text")
      val got = Dedup.removeBoilerplateChunks(df, chunkWords = 2, minDocs = 2)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got.map(_._1) == data.map(_._1)) // every doc id survives
      // brute force: chunk every doc, find chunks in >=2 distinct docs
      def chunks(txt: String): Seq[String] =
        txt.split("\\s+").filter(_.nonEmpty).grouped(2)
          .map(_.mkString(" ")).toSeq
      val byChunk = data.flatMap { case (id, txt) =>
        chunks(txt).map(_ -> id) }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).distinct.size }
      val boiler = byChunk.filter(_._2 >= 2).keySet
      for (((id, txt), r) <- data.zip(got)) {
        val cs = chunks(txt)
        assert(r._3 == cs.size, s"n_chunks for $id")
        assert(r._4 == cs.count(boiler), s"n_removed for $id")
        assert(r._2 == cs.filterNot(boiler).mkString(" "), s"text for $id")
      }
    }
  }

  test("property: assignSequential keys equal the brute-force rank over " +
    "random frames, orders, and bases - and compose with zero eager jobs") {
    import graft.operators.Keys
    import org.apache.spark.sql.functions.col
    val frameGen = for {
      n <- Gen.choose(1, 120)
      startAt <- Gen.choose(0L, 5000000L)
      rows <- Gen.listOfN(n, for {
        a <- Gen.choose(-500, 500)
        b <- Gen.alphaLowerStr.map(_.take(4))
      } yield (a, b))
    } yield (startAt, rows.distinct) // unique (a, b) = unique total order

    for ((startAt, rows) <- samples(frameGen, 6, 1414L)) {
      val df = rows.toDF("a", "b")
      // composing the plan must trigger NO Spark job (the zipWithIndex
      // formulation ran its partition-size count at construction; the
      // declarative rank must stay lazy until an action)
      val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      val keyed = Keys.assignSequential(df, "key", startAt,
        Seq(col("a"), col("b")))
      assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length ==
        jobsBefore, "assignSequential must not run jobs at plan-composition time")
      val got = keyed.select("a", "b", "key")
        .as[(Int, String, Long)].collect().sortBy(r => (r._1, r._2))
      val want = rows.sorted.zipWithIndex.map { case ((a, b), i) =>
        (a, b, startAt + i + 1L) }
      assert(got.toSeq == want, s"n=${rows.size} startAt=$startAt")
    }
  }

  test("property: stratified sampling is nested across rates") {
    val docGen = for {
      n <- Gen.choose(20, 60)
      docs <- Gen.listOfN(n, Gen.alphaStr.suchThat(_.nonEmpty))
    } yield docs.distinct.zipWithIndex.map { case (txt, i) =>
      (i.toLong, if (i % 2 == 0) "web" else "books", txt) }

    for (data <- samples(docGen, 3, 11L)) {
      val df = data.toDF("doc_id", "source", "text")
      def kept(rate: Double): Set[Long] =
        Splitting.sampleStratified(df,
          Map("web" -> rate, "books" -> rate))
          .filter($"kept" === 1).select("doc_id").as[Long].collect().toSet
      val k3 = kept(0.3); val k7 = kept(0.7); val k10 = kept(1.0)
      assert(k3.subsetOf(k7), "0.3 ⊆ 0.7")
      assert(k7.subsetOf(k10), "0.7 ⊆ 1.0")
      assert(k10 == data.map(_._1).toSet, "rate 1.0 keeps everything")
    }
  }
}
