package graft

/** CLI golden end-to-end: both file-input flows (`--species rat
  * --hcop/--ncbi`, `--agrOrthologs --alliance`) run over the checked-in
  * FIXTURES.md-shaped TSVs through the REAL readers (S2/S3/F1-F3/X1-X4/
  * X7), the full pipeline, and the parquet sinks; every output state
  * table must equal the checked-in golden dump byte for byte.
  *
  * This folds the previously unit-only rows (F12 dispatch, X9 threaded
  * clock, S3/X7 comment+header skip, D4 floor) into one executable
  * comparison vs OrthologRelationLoadingManager.java:120-155 semantics.
  * Regenerate goldens with `sbt "Test/runMain graft.E2eGoldenGen"` and
  * review the diff.
  */
class E2eSpec extends SparkSpec {

  private lazy val outDirs: Map[String, String] = {
    val out = java.nio.file.Files.createTempDirectory("e2e_spec").toString
    E2eGolden.runFlows(spark, out)
  }

  for (name <- Seq("rat_orthologs", "rat_associations", "agr_orthologs",
                   "bpe_encoded")) {
    test(s"golden e2e: $name matches the checked-in dump") {
      val got = E2eGolden.canon(spark.read.parquet(outDirs(name)))
      val want = E2eGolden.readGolden(name)
      // schema line first: a type drift fails with a readable message
      assert(got.head == want.head, "schema line diverged")
      assert(got.size == want.size,
        s"row count ${got.size - 1} != golden ${want.size - 1}")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"line $i diverged:\n  got  $g\n  want $w")
      }
    }
  }

  test("D4: the default 5000-row sanity floor rejects the tiny fixture") {
    val out = java.nio.file.Files.createTempDirectory("e2e_floor").toString
    intercept[IllegalArgumentException] {
      graft.tools.Cli.run(Array(
        "--species", "rat", "--sfDir", "/root/testdata/sf0.001", "--out", out,
        "--hcop", s"${E2eGolden.fixtureDir}/hcop.tsv",
        "--ncbi", s"${E2eGolden.fixtureDir}/ncbi_gene_orthologs.tsv"), spark)
    }
  }

  test("loaded-artifact encode equals in-session train->encode, and " +
    "ids stay stable on a different corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val art = outDirs("bpe_encoded").stripSuffix("/bpe_encoded") + "/bpe_artifact"
    def canonEnc(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("n_tokens"), col("token_ids"))
        .as[(Long, Int, Seq[Int])].collect().toSeq.sortBy(_._1)
    val rules = graft.llm.BpeArtifact.loadMergeRules(spark, art)
    val vocab = graft.llm.BpeArtifact.loadVocab(spark, art)
    // round trip == plain train->encode on the training corpus
    assert(canonEnc(spark.read.parquet(outDirs("bpe_encoded"))) ==
      canonEnc(graft.llm.TextAnalysis.bpeEncode(docs, rules)))
    // ADVICE-r7: under the SHIPPED vocab, a different corpus (a slice
    // of documents) encodes shared docs with identical ids - plain
    // bpeEncode would re-induce ids from the slice's own characters
    val slice = docs.filter(col("doc_id") % 7 === 0)
    val full = canonEnc(graft.llm.TextAnalysis
      .bpeEncodeWithVocab(docs, rules, vocab))
      .map { case (id, n, t) => id -> ((n, t)) }.toMap
    val sub = canonEnc(graft.llm.TextAnalysis
      .bpeEncodeWithVocab(slice, rules, vocab))
    for ((id, n, toks) <- sub) assert((n, toks) == full(id))
  }

  test("bpe artifact flags run standalone") {
    // save+load in one invocation defeats the cross-session contract
    assert(graft.tools.Cli.run(Array(
      "--bpeSave", "/tmp/x", "--bpeLoad", "/tmp/x"), spark) == -1)
    // and ortholog-flow flags alongside them are usage errors
    assert(graft.tools.Cli.run(Array(
      "--bpeSave", "/tmp/x", "--species", "rat"), spark) == -1)
    assert(graft.tools.Cli.run(Array(
      "--bpeLoad", "/tmp/x", "--agrOrthologs"), spark) == -1)
  }

  test("--hcop without --ncbi is a usage error") {
    assert(graft.tools.Cli.run(Array(
      "--species", "rat", "--hcop", "x.tsv"), spark) == -1)
  }

  test("a source-file flag on a flow that will not read it is a usage error") {
    // --alliance feeds only the --agrOrthologs flow
    assert(graft.tools.Cli.run(Array(
      "--species", "rat", "--alliance", "x.tsv"), spark) == -1)
    // --hcop/--ncbi feed only the --species flows
    assert(graft.tools.Cli.run(Array(
      "--agrOrthologs", "--hcop", "x.tsv", "--ncbi", "y.tsv"), spark) == -1)
    assert(graft.tools.Cli.run(Array(
      "--species", "rat", "--fixXRefDataSet",
      "--hcop", "x.tsv", "--ncbi", "y.tsv"), spark) == -1)
  }
}
