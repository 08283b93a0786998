package graft

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

/** Driver-contract end-to-end: run the actual Verify main (query-filtered)
  * and assert the artifacts the driver consumes — <name>.parquet result
  * dirs and a parseable oracle_sql.json with an entry per checked query. */
class ContractSpec extends SparkSpec {

  test("Verify main writes contract-shaped artifacts") {
    val out = Files.createTempDirectory("contract").toString
    Verify.main(Array(sf0001, out, "q01_wordcount", "q38_ann_ivf"))

    assert(Files.isDirectory(Paths.get(out, "q01_wordcount.parquet")))
    assert(Files.isDirectory(Paths.get(out, "q38_ann_ivf.parquet")))
    val rows = spark.read.parquet(s"$out/q01_wordcount.parquet")
    assert(rows.columns.toSeq == Seq("word", "c") && rows.count() > 0)

    val json = new ObjectMapper().readTree(
      Files.readString(Paths.get(out, "oracle_sql.json")))
    // every oracle is keyed BOTH bare and by result-dir basename — the
    // driver looks up by '<name>.parquet' (round-1 CORRECTNESS evidence)
    assert(json.has("q01_wordcount"), "checked query missing from oracle dump")
    assert(json.has("q01_wordcount.parquet"),
      "oracle must also be keyed by the result-dir basename")
    assert(!json.has("q38_ann_ivf"), "unchecked query must not have an oracle")
    assert(!json.has("q38_ann_ivf.parquet"))
    assert(json.get("q01_wordcount").asText.toUpperCase.contains("SELECT"))
    assert(json.get("q01_wordcount.parquet").asText ==
      json.get("q01_wordcount").asText)
    // the dump always carries EVERY oracle (filter only limits result
    // dumps) so the driver can compare any subset
    assert(json.size() == 2 * SparkEntry.oracleSql.size)
  }
}
