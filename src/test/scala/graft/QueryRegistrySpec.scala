package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Invariants of the per-family query registries (round-13 split of the
  * former SparkEntry monolith). SparkEntry folds the family maps with
  * `++`, which silently overwrites duplicate keys — so global key
  * uniqueness is load-bearing: a duplicate would shadow a query and its
  * oracle without any compile-time signal. Pinning the exact total also
  * catches an entry accidentally dropped in a refactor.
  */
class QueryRegistrySpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("Reference", QueriesReference.queries, QueriesReference.oracleSql),
      ("Dedup", QueriesDedup.queries, QueriesDedup.oracleSql),
      ("Sim", QueriesSim.queries, QueriesSim.oracleSql),
      ("Text", QueriesText.queries, QueriesText.oracleSql),
      ("Corpus", QueriesCorpus.queries, QueriesCorpus.oracleSql),
      ("Multimodal", QueriesMultimodal.queries, QueriesMultimodal.oracleSql),
      ("Olap", QueriesOlap.queries, QueriesOlap.oracleSql),
      ("Stat", QueriesStat.queries, QueriesStat.oracleSql),
    )

  test("family query key-sets are pairwise disjoint") {
    for {
      Seq((na, qa, _), (nb, qb, _)) <- families.combinations(2)
    } {
      val overlap = qa.keySet.intersect(qb.keySet.map(_.toString))
      assert(overlap.isEmpty, s"$na and $nb both register: $overlap")
    }
  }

  test("fold preserves every registration (no silent ++ overwrite)") {
    val perFamily = families.map(_._2.size).sum
    assert(SparkEntry.queries.size === perFamily)
    val perFamilyOracle = families.map(_._3.size).sum
    assert(SparkEntry.oracleSql.size === perFamilyOracle)
  }

  test("every oracle key names a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every family registers at least one oracle-checked query") {
    for ((name, _, oracle) <- families)
      assert(oracle.nonEmpty, s"family $name has no oracle entries")
  }
}
