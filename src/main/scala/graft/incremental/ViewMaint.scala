package graft.incremental

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance (IVM) for inner equi-join views — the
  * join analog of the mergeable-aggregate family (operators.AggMerge):
  * keep a materialized `A ⋈ B` current under INSERT deltas without ever
  * re-joining the full snapshots. The algebra is the classic delta
  * rule:
  *
  *   Δ(A ⋈ B) = ΔA ⋈ (B ∪ ΔB)  ∪  A_old ⋈ ΔB
  *
  * (the ΔA⋈ΔB cross term rides inside the first leg). Every batch costs
  * two DELTA-SIZED joins against a snapshot — at 100 TB the snapshots
  * are bucketed on the join key so the delta probes shuffle only the
  * delta; history is never rescanned. Deletions/updates need keyed
  * retraction (the applyCdc counterpart) — out of scope here and
  * documented; insert-only covers the append-dominant fact/event case.
  */
object ViewMaint {

  /** The new view rows contributed by one batch of inserts.
    * `aOld`/`bOld` are the PRE-batch snapshots; `dA`/`dB` the inserted
    * rows. Column sets of the two sides must be disjoint apart from
    * `keys` (standard join hygiene; rename upstream). */
  def joinDelta(aOld: DataFrame, bOld: DataFrame,
                dA: DataFrame, dB: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "join keys required")
    dA.join(bOld.unionByName(dB), keys)
      .unionByName(aOld.join(dB, keys))
  }

  /** Convenience: maintain view + snapshots through one insert batch;
    * returns (newView, newA, newB). The view union is APPEND-shaped —
    * a writer materializes only the delta rows. */
  def applyBatch(view: DataFrame, aOld: DataFrame, bOld: DataFrame,
                 dA: DataFrame, dB: DataFrame,
                 keys: Seq[String]): (DataFrame, DataFrame, DataFrame) =
    (view.unionByName(joinDelta(aOld, bOld, dA, dB, keys)),
      aOld.unionByName(dA), bOld.unionByName(dB))
}
