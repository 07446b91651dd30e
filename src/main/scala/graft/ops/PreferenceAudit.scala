package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Consistency audit for pairwise preference data — the dataset-level
  * sanity check that runs BEFORE [[BradleyTerry]] fitting: if the
  * majority preferences contain many directed 3-cycles (A beats B
  * beats C beats A), no scalar reward model can fit them and the
  * aggregate scores are partly noise. The audited quantity is the
  * classic tournament-theory cyclicity rate: among vertex triples
  * whose three pairwise majority edges all exist, the fraction that
  * form a cycle instead of a transitive order (0 for perfectly
  * consistent judges; 250/1000 is the expectation for coin-flip
  * preferences — each of the 8 orientations of a triangle is equally
  * likely and 2 are cyclic).
  *
  * Majority edges are computed only over pairs with >= `minDuels`
  * comparisons (a 1-duel "majority" is a coin flip, and the threshold
  * keeps the audited graph sparse at corpus scale); exact ties carry
  * no direction and are excluded.
  *
  * Scale shape: duels collapse to the pair matrix in ONE shuffle;
  * triangle enumeration reuses [[Triangles]]' degree-oriented
  * m^1.5-bounded corner listing (hub-skew-proof — a naive id-ordered
  * 3-way self-join explodes on high-degree entities); classification
  * is three hash equi-joins of the corner list back onto the
  * entity-pair direction map on computed (lo, hi) keys; the result is
  * one partial-aggregable count. Nothing driver-side. */
object PreferenceAudit {

  /** One row: (n_edges, n_triangles, n_cyclic, cyclic_milli) over the
    * majority-preference graph of `duels` (columns `i`, `j` long ids
    * with i < j per row, `awin` boolean). `cyclic_milli` is null when
    * the graph has no triangles. */
  def transitivityAudit(duels: DataFrame, minDuels: Long): DataFrame = {
    val dir = duels
      .select(col("i").cast("long"), col("j").cast("long"),
        col("awin").cast("boolean"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(when(col("awin"), 1L).otherwise(0L)).as("wi"))
      .where(col("n") >= minDuels && col("wi") * 2 =!= col("n"))
      .select(col("i").as("lo"), col("j").as("hi"),
        (col("wi") * 2 > col("n")).as("lowins"))
      .localCheckpoint() // feeds the corner listing + 3 direction joins
    val tri = Triangles.triangleCorners(
      dir.select(col("lo").as("a"), col("hi").as("b")))
    // corners come back in DEGREE order (u, v, w) — re-key each of the
    // triangle's three edges by id order to look up its direction
    def beats(x: String, y: String, won: String) =
      when(col(x) < col(y), col(won)).otherwise(!col(won))
    val classified = tri
      .join(dir.select(col("lo").as("lo1"), col("hi").as("hi1"),
          col("lowins").as("w1")),
        least(col("u"), col("v")) === col("lo1") &&
          greatest(col("u"), col("v")) === col("hi1"))
      .join(dir.select(col("lo").as("lo2"), col("hi").as("hi2"),
          col("lowins").as("w2")),
        least(col("u"), col("w")) === col("lo2") &&
          greatest(col("u"), col("w")) === col("hi2"))
      .join(dir.select(col("lo").as("lo3"), col("hi").as("hi3"),
          col("lowins").as("w3")),
        least(col("v"), col("w")) === col("lo3") &&
          greatest(col("v"), col("w")) === col("hi3"))
      .select((beats("u", "v", "w1") && beats("v", "w", "w3") &&
        !beats("u", "w", "w2")).or(
          !beats("u", "v", "w1") && !beats("v", "w", "w3") &&
            beats("u", "w", "w2")).as("cyclic"))
    classified
      .agg(count(lit(1)).as("n_triangles"),
        // sum over an empty frame is NULL, not 0 — a triangle-free
        // graph must still report (0, 0, null)
        coalesce(sum(when(col("cyclic"), 1L).otherwise(0L)), lit(0L))
          .as("n_cyclic"))
      .crossJoin(broadcast(
        dir.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_edges"), col("n_triangles"), col("n_cyclic"),
        expr("n_cyclic * 1000L div nullif(n_triangles, 0L)")
          .as("cyclic_milli"))
  }

  /** Cross-method rank agreement: join two score tables over the same
    * entities (`a`/`b`, each `(id, <scoreCol>)`), decile-bucket each
    * by RANK (score desc, id asc tie-break — exact, no percentile
    * estimation), and return the ≤ 10×10 joint distribution. Two
    * aggregators that agree land on the diagonal; systematic
    * off-diagonal mass localizes WHERE in the quality range they
    * diverge (fit disagreement at the top matters more than at the
    * tail when the scores gate data selection).
    *
    * Scale shape: each decile pass is [[GlobalOrder.withGlobalIndexAndCount]]
    * — a range exchange, never a window over one partition — followed
    * by an entity-sized equi-join and a ≤ 100-group aggregate. */
  def rankAgreement(a: DataFrame, aCol: String,
                    b: DataFrame, bCol: String): DataFrame = {
    def deciles(df: DataFrame, c: String, out: String): DataFrame = {
      val (idx, n) = GlobalOrder.withGlobalIndexAndCount(
        df.select(col("id"), col(c)),
        Seq(col(c).desc, col("id").asc), out = "__r")
      idx.select(col("id"), expr(s"__r * 10L div ${n}L").as(out))
    }
    deciles(a, aCol, "dec_a").join(deciles(b, bCol, "dec_b"), Seq("id"))
      .groupBy("dec_a", "dec_b")
      .agg(count(lit(1)).as("n_entities"))
  }
}
