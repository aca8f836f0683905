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
    "jointPairCtes" -> Round16Queries.jointPairCtes,
    "pplCtes" -> Round15Queries.pplCtes,
    "duckDoremi" -> Round18Queries.duckDoremi,
    "duckGopher" -> Round18Queries.duckGopher,
    "duckCentroids" -> Round18Queries.duckCentroids)

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

  test("every oracle declaring the BM25 contrib chain embeds a duckBm25 instantiation verbatim") {
    // the PARAMETERIZED shared fragment (r17 VERDICT #2): duckBm25's
    // corpusFilter is its one variation point, so verbatim-sharing is
    // pinned per INSTANTIATION — the whole-corpus form (q_bm25,
    // q_hybrid_rrf) and the training-slice form (q_retrieval_decon).
    // Any oracle that declares `contrib AS (` without one of these
    // instantiations is a new hand-copy of the scoring chain.
    val instantiations = Seq(
      Round16Queries.duckBm25(""),
      Round16Queries.duckBm25(" WHERE doc_id % 10 <> 0"))
    instantiations.foreach(f => assert(f.trim.nonEmpty))
    val declaring = oracles.collect {
      case (q, sql) if sql.contains("contrib AS (") => q -> sql
    }
    assert(declaring.size >= 3,
      s"expected the three BM25 consumers, found ${declaring.keys.toSeq.sorted}")
    val handCopies = declaring.collect {
      case (q, sql) if !instantiations.exists(sql.contains) => q
    }.toSeq.sorted
    assert(handCopies.isEmpty,
      s"oracles declare `contrib AS (` without embedding a duckBm25 " +
        s"instantiation verbatim: ${handCopies.mkString(", ")}")
    // and the whole-corpus instantiation is genuinely SHARED (>= 2 users)
    val wholeCorpusUsers = oracles.collect {
      case (q, sql) if sql.contains(instantiations.head) => q
    }.toSeq.sorted
    assert(wholeCorpusUsers.size >= 2, wholeCorpusUsers.toString)
  }

  test("the held-out membership convention is one constant and the oracle family states it literally") {
    // r17 VERDICT #8: the `% 10 = 0` held-out convention used to be
    // restated per row; the Spark side now derives from
    // ExtensionQueries.heldOut/corpusSide. The oracles keep the literal
    // (hand-written SQL stays self-contained) — this pin ties the
    // constant and the literal together so changing one without the
    // other fails loudly.
    assert(ExtensionQueries.HeldOutMod == 10,
      "HeldOutMod changed — every decon oracle's literal `% 10` and " +
        "this pin must change with it")
    val family = oracles.collect {
      case (q, sql) if sql.contains("% 10 = 0") || sql.contains("% 10 <> 0") => q
    }.toSeq.sorted
    assert(family.size >= 5,
      s"expected the decon/leakage family to state `% 10` literally, " +
        s"found only: ${family.mkString(", ")}")
  }
}
