package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string join via SymSpell-style deletion
  * neighborhoods — the data-cleaning join that scales.
  *
  * A bare `levenshtein(l, r) <= 1` join condition is non-equi and
  * plans as a nested loop (|L| x |R| distance evaluations). Instead:
  * every string generates its single-character-DELETION neighborhood
  * (itself + one string per dropped position); two strings within
  * edit distance 1 ALWAYS share a neighborhood key (drop the
  * inserted/substituted position), so an EQUI join on the key finds
  * every true pair — lossless blocking — and a final levenshtein
  * check kills the false candidates (key sharing only bounds the
  * distance by 2). Cost scales with |L|*avg_len + |R|*avg_len + the
  * candidate count, never |L| x |R|.
  */
object FuzzyJoin {

  /** s -> [s, s minus char 1, s minus char 2, ...] (distinct). */
  def deletionNeighborhood(s: Column): Column =
    array_distinct(concat(array(s),
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))))

  /** All (left, right) pairs with levenshtein <= 1, by equi-joining
    * exploded deletion neighborhoods and verifying the distance.
    * Inputs should be projected to the join column (plus carry-along
    * columns); duplicate strings on either side produce duplicate
    * pairs, mirroring a plain join.
    */
  def levenshtein1Join(left: DataFrame, lCol: String,
      right: DataFrame, rCol: String): DataFrame = {
    require(lCol != rCol,
      s"left and right join columns must have distinct names (got '$lCol' twice)")
    val lk = left.select(col(lCol),
      explode(deletionNeighborhood(col(lCol))).as("__k"))
    val rk = right.select(col(rCol),
      explode(deletionNeighborhood(col(rCol))).as("__k"))
    lk.join(rk, Seq("__k"))
      .drop("__k")
      .distinct() // a pair can share several deletion keys
      .filter(levenshtein(col(lCol), col(rCol)) <= 1)
  }
}
