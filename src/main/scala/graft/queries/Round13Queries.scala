package graft.queries

import graft.Tables.table

/** Round-13 additions: the deterministic epoch shuffle — the one
  * trainer-facing op the packing family lacked (r12 VERDICT #8). */
object Round13Queries {

  /** [[graft.extensions.Packing.epochShuffle]] — seeded deterministic
    * global permutation: rank = row number over md5(seed ":" doc_id).
    * The oracle recomputes the same md5 rank in DuckDB (both engines
    * hash the identical string, so the permutation is engine-portable
    * — the reproducibility claim itself is what's being hashed).
    * EpochShuffleSpec pins the distribution properties (seeds
    * decorrelate, same seed reproduces, output is a permutation). */
  private val epochShuffleQ = Q("q_epoch_shuffle",
    (s, dir) => graft.extensions.Packing
      .epochShuffle(table(s, dir, "documents"), seed = 7L),
    Some("""SELECT doc_id,
                   CAST(row_number() OVER (
                     ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id)
                     - 1 AS BIGINT) AS epoch_rn
            FROM documents ORDER BY epoch_rn"""))

  val all: Seq[Q] = Seq(epochShuffleQ)
}
