package graft

import graft.tools.Cli

/** CLI dispatch (mirrors OrthologRelationLoadingManager.main): usage
  * errors (F12 guard), flow outputs on disk, and exit codes. Cli.run
  * takes the shared test session and never exits/stops it. */
class CliSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("cli_out").toString

  test("F12: missing, unknown, or human --species is a usage error") {
    assert(Cli.run(Array("--sfDir", sf), spark) == -1)
    assert(Cli.run(Array("--species", "ratt", "--sfDir", sf), spark) == -1)
    assert(Cli.run(Array("--species", "human", "--sfDir", sf), spark) == -1)
    assert(Cli.run(Array("--species"), spark) == -1) // dangling value flag
    assert(Cli.run(Array("--bogus"), spark) == -1)
  }

  test("--species rat writes ortholog + association state parquet") {
    val out = tmp()
    assert(Cli.run(Array("--species", "rat", "--sfDir", sf, "--out", out),
      spark) == 0)
    val orthos = spark.read.parquet(s"$out/rat/orthologs")
    val assocs = spark.read.parquet(s"$out/rat/associations")
    assert(orthos.count() > 0 && assocs.count() > 0)
    assert(orthos.columns.contains("xrefDataSrc"))
  }

  test("--agrOrthologs writes the AGR state") {
    val out = tmp()
    assert(Cli.run(Array("--agrOrthologs", "--sfDir", sf, "--out", out),
      spark) == 0)
    assert(spark.read.parquet(s"$out/agr_orthologs").count() > 0)
  }

  test("--fixXRefDataSet rewrites state in place") {
    val out = tmp()
    assert(Cli.run(Array("--species", "rat", "--fixXRefDataSet",
      "--sfDir", sf, "--out", out), spark) == 0)
    assert(spark.read.parquet(s"$out/orthologs").count() > 0)
  }

  test("dispatch table: --agrOrthologs short-circuits a bad --species") {
    // reference ordering (OrthologRelationLoadingManager.java:80-84):
    // the agr flow is checked FIRST, so a nonsense species value never
    // reaches the species guard
    val out = tmp()
    assert(Cli.run(Array("--species", "ratt", "--agrOrthologs",
      "--sfDir", sf, "--out", out), spark) == 0)
    assert(spark.read.parquet(s"$out/agr_orthologs").count() > 0)
  }

  test("dispatch table: --species all runs every searchable non-human " +
      "species in key order and ignores --fixXRefDataSet") {
    // reference: the all-species loop is checked BEFORE fixXrefDataSet
    // (:87-103 vs :105-106), iterating searchable keys minus human
    assert(Cli.searchableNonHuman == Seq(2, 3, 6, 8, 9, 10, 11, 12))
    val out = tmp()
    assert(Cli.run(Array("--species", "all", "--fixXRefDataSet",
      "--sfDir", sf, "--out", out), spark) == 0)
    for (name <- Seq("mouse", "rat", "dog", "zebrafish", "pig",
        "fruitfly", "roundworm", "yeast")) {
      assert(new java.io.File(s"$out/$name/orthologs").isDirectory,
        s"missing per-species output $name")
    }
    // the fix flow did NOT run (its outputs land at the root)
    assert(!new java.io.File(s"$out/orthologs").isDirectory)
  }

  test("D5 gate: a tight --maxAgeDays fails the freshness check") {
    // fixture AGR lastUpdateDate is 2026-06-01; 'now' inside the CLI is
    // 2026-08-12 -> 72 days old -> a 10-day gate must throw
    intercept[IllegalArgumentException] {
      Cli.run(Array("--species", "rat", "--sfDir", sf,
        "--out", tmp(), "--maxAgeDays", "10"), spark)
    }
  }
}
