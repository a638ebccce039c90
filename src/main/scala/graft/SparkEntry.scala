package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory demanded by SURVEY.md §2: each
  * entry is one operator (or operator family) exercised end-to-end on
  * the driver's testdata; `oracleSql` carries the DuckDB-equivalent SQL
  * for the correctness gate. Column names/aliases are kept identical on
  * both sides (the driver sorts columns by name before hashing).
  *
  * Determinism rules used throughout:
  *   - every money/double aggregate is `round(..., 2..6)` on BOTH sides
  *     so accumulation-order ulps can't flip the hash;
  *   - every result has a total ORDER BY (all key columns) in case the
  *     driver hashes row order;
  *   - raw timestamps are never emitted — always cast to date/string.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    * broadcast dims, revenue per region/year.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.starJoin(spark, "/root/testdata/sf0.001")

  /** `++` would silently SHADOW a query re-registered under the same
    * key in a later module (it would just vanish from the correctness
    * dump), so key-set disjointness is asserted at merge time.
    */
  private def disjointMerge[V](maps: Map[String, V]*): Map[String, V] = {
    val dups = maps.flatMap(_.keys)
      .groupBy(identity).collect { case (k, ks) if ks.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query keys across registries: ${dups.mkString(", ")}")
    maps.reduce(_ ++ _)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    disjointMerge(Queries.registry, QueriesRelational2.registry,
      QueriesWrite.registry, QueriesLlm.registry, QueriesCorpus.registry)

  def oracleSql: Map[String, String] =
    disjointMerge(Queries.oracles, QueriesRelational2.oracles,
      QueriesWrite.oracles, QueriesLlm.oracles, QueriesCorpus.oracles)
}
