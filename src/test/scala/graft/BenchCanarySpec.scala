package graft

import org.scalatest.funsuite.AnyFunSuite

/** The canary contract: `Bench.Canaries` constants MUST equal the
  * committed canonical per-query values in `BENCH_QUERIES.json`. The
  * box-factor normalization divides this run's canary times by those
  * constants — a canonical refresh that forgets to update them silently
  * skews `box_factor` and `normalized_value` for every subsequent round
  * (the failure mode BUILDER_NOTES warns about; this spec enforces it).
  */
class BenchCanarySpec extends AnyFunSuite {

  private lazy val canonical: Map[String, Double] = {
    val path = java.nio.file.Paths.get("BENCH_QUERIES.json")
    assert(java.nio.file.Files.exists(path),
      "canonical BENCH_QUERIES.json missing from the repo root")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readString(path))
    val qs = root.get("queries")
    assert(qs != null && qs.isObject, "canonical artifact has no queries map")
    val it = qs.fields()
    val b = Map.newBuilder[String, Double]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
    b.result()
  }

  test("every canary names a query present in the canonical artifact") {
    val missing = Bench.Canaries.keySet -- canonical.keySet
    assert(missing.isEmpty, s"canaries absent from canonical: ${missing.mkString(", ")}")
  }

  test("every canary constant equals its canonical per-query value") {
    val drift = Bench.Canaries.toSeq.sortBy(_._1).flatMap { case (q, v) =>
      canonical.get(q).filter(c => math.abs(c - v) > 1e-9)
        .map(c => s"$q: constant $v != canonical $c")
    }
    assert(drift.isEmpty,
      "Bench.Canaries out of sync with BENCH_QUERIES.json — refresh the " +
        "constants with the canonical:\n" + drift.mkString("\n"))
  }

  test("every canary is also a registered query") {
    val missing = Bench.Canaries.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"canaries not registered: ${missing.mkString(", ")}")
  }
}
