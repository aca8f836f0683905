package graft.extensions

import graft.SparkSpec

/** Hand-computed fixture for the corpus data card ([[DataCard]]):
  * every metric checked against arithmetic done on paper. */
class DataCardSpec extends SparkSpec {
  import spark.implicits._

  // tokens: d1=4 (1 stop 'the'), d2=4 (same text: exact dup, 1 stop),
  // d3=2 ('a a': 2 stops), d4=0 (empty) → total 10 tokens, 4 stops
  private lazy val docs = Seq(
    (1L, "the cat sat down", "en", "web", 16L),
    (2L, "the cat sat down", "en", "web", 16L),
    (3L, "a a", "de", "books", 3L),
    (4L, "", "de", "books", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("every card metric matches the hand computation") {
    val card = DataCard.build(docs)
      .as[(String, Double)].collect().toMap
    val expected = Map(
      "n_docs" -> 4.0,
      "n_sources" -> 2.0,
      "n_langs" -> 2.0,
      "total_tokens" -> 10.0,
      "total_chars" -> 35.0,
      "empty_docs" -> 1.0,
      "exact_dup_docs" -> 1.0, // d1/d2 share a text key; '' is distinct
      "distinct_tokens" -> 5.0, // the cat sat down a
      "distinct_token_est" -> 5.0, // < k ⇒ exact mode
      "mean_doc_tokens" -> 2.5,
      "stop_ratio" -> 0.4,
      "top_token_share" -> 0.2, // 'a'/'the' tie at 2 → either way 2/10
      "max_source_share" -> 0.5)
    expected.foreach { case (m, v) =>
      assert(card(m) == v, s"$m: ${card(m)} != $v")
    }
    assert(card.keySet == expected.keySet)
  }
}
