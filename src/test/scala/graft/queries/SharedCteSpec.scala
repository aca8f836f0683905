package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared-oracle-CTE discipline (r16 VERDICT #8): the
  * machinery CTE fragments that multiple DuckDB oracles build on —
  * SimHash construction, MinHash-LSH pairs, normalized embeddings, the
  * CC reachability closure, the joint-dedup pair chain — live as ONE
  * constant each and appear VERBATIM in every oracle that uses them.
  * Twin hand-copies of a CTE are the one remaining way a future edit
  * could silently fork Spark-vs-oracle semantics between two rows that
  * claim the same construction: this spec fails if a shared fragment
  * stops being shared (drops below two verbatim users), which is what a
  * drifted copy looks like from the registry's point of view. */
class SharedCteSpec extends AnyFunSuite {

  private lazy val oracles: Map[String, String] = Registry.oracleSql

  private val shared: Seq[(String, String)] = Seq(
    "simhashCtes" -> ExtensionQueries.simhashCtes,
    "duckCcReach" -> ExtensionQueries.duckCcReach,
    "duckNorm" -> ExtensionQueries.duckNorm,
    "duckMinhashPairs" -> Round8Queries.duckMinhashPairs,
    "jointPairCtes" -> Round16Queries.jointPairCtes)

  test("every shared CTE fragment is used verbatim by at least two registered oracles") {
    shared.foreach { case (name, frag) =>
      assert(frag.trim.nonEmpty, s"$name is empty")
      val users = oracles.collect {
        case (q, sql) if sql.contains(frag) => q
      }.toSeq.sorted
      assert(users.size >= 2,
        s"shared CTE $name is used verbatim by ${users.size} oracle(s) " +
          s"(${users.mkString(", ")}) — a fragment that stopped being " +
          "shared usually means a drifted hand-copy exists somewhere")
    }
  }

  test("no oracle re-declares a shared CTE's head under a drifted body") {
    // the leading CTE name of each shared fragment (e.g. `sh AS (`,
    // `nn AS (`) must never appear in an oracle that does NOT embed the
    // shared fragment itself UNLESS that oracle declares it explicitly
    // as its own local construction — here we simply require that any
    // oracle mentioning the head either contains the fragment verbatim
    // or is on the known-local allowlist, so a new hand-copy gets
    // flagged at review time instead of drifting silently.
    // only heads DISTINCTIVE of their shared fragment qualify (`sh AS (`
    // is also the generic shingle-CTE head of a dozen legitimately-local
    // constructions, so it can't discriminate)
    val heads = Seq(
      "duckNorm" -> (ExtensionQueries.duckNorm, "nn AS ("),
      "jointPairCtes" -> (Round16Queries.jointPairCtes, "mk AS ("))
    // rows whose oracles legitimately declare a LOCAL CTE under the
    // same head (different construction, oracle-specific by design)
    val knownLocal: Set[String] = Set(
      // its `nn` norms the int8-QUANTIZED query frame (qq), not the raw
      // embeddings — a different construction by design
      "q_ann_quantized")
    heads.foreach { case (name, (frag, head)) =>
      // token-boundary match: `semk AS (` must not count as `mk AS (`
      val headRe = ("(?<![A-Za-z0-9_])" +
        java.util.regex.Pattern.quote(head.stripSuffix("("))).r
      val suspects = oracles.collect {
        case (q, sql) if headRe.findFirstIn(sql).isDefined &&
          !sql.contains(frag) && !knownLocal.contains(q) => q
      }.toSeq.sorted
      assert(suspects.isEmpty,
        s"oracles declare `$head` without embedding shared $name " +
          s"verbatim (hand-copy risk): ${suspects.mkString(", ")} — " +
          "either reuse the shared constant or add to knownLocal with " +
          "a reason")
    }
  }
}
