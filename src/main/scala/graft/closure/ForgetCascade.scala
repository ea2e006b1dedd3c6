package graft.closure

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.meta.Catalog

/** The OWNERSHIP cone of a seed set — deletion propagation for
  * right-to-be-forgotten requests: starting from seed rows, follow ONLY
  * reverse-key edges (parent → its children: a customer's orders, those
  * orders' lineitems, the customer's events). Forward FK edges are
  * deliberately NOT followed — they reach SHARED referenced dimensions
  * (nation, part, supplier) that other entities still need; deleting a
  * customer must never cascade into the nation row.
  *
  * This is [[ClosureExtractor]]'s BFS restricted to the RK direction,
  * with the same scale shape: frontiers hold ONLY key columns, each
  * (edge, iteration) is one batched semi-join of the child table against
  * the frontier's distinct parent keys, accumulated keys anti-join new
  * hits so cycles/diamonds terminate, and per-table key sets checkpoint
  * as leaf plans. Returns table → DataFrame of that table's PRIMARY-KEY
  * columns to delete.
  */
object ForgetCascade {

  def cascade(spark: SparkSession, catalog: Catalog,
      load: String => DataFrame,
      seedTable: String, seed: DataFrame): Map[String, DataFrame] = {
    def keyCols(t: String) = catalog.pkOf(t)
    def pkFrame(t: String, rows: DataFrame): DataFrame =
      rows.select(keyCols(t).map(col): _*).distinct()

    var acc = Map(seedTable -> pkFrame(seedTable, seed).localCheckpoint(false))
    var frontier: Map[String, DataFrame] = acc
    while (frontier.nonEmpty) {
      val hits = scala.collection.mutable.Map.empty[String, DataFrame]
      for ((t, keys) <- frontier; e <- catalog.referenceKeysOf(t)) {
        // children whose FK column hits the frontier's referenced column.
        // The referenced column is the parent pk for every catalog edge,
        // so the frontier's pk frame carries it; assert rather than
        // silently joining on a wrong column.
        require(keyCols(t).contains(e.parentCol),
          s"RK edge ${e.name}: referenced col ${e.parentCol} not in ${t} pk ${keyCols(t)}")
        val child = load(e.childTable)
        // exact-count broadcast hint, the closure's discipline: a forget
        // request's cone is typically tiny (hint → broadcast-hash, no
        // shuffle of the child), while a bulk purge with a huge key set
        // still shuffles
        // rename the frontier key to a reserved name so the join condition
        // can't resolve ambiguously (or to the child's own column) when a
        // child table happens to carry a column named like the parent key —
        // e.g. a self-referential edge or an introspected catalog without
        // per-table column prefixes
        val keySide = keys.select(col(e.parentCol).as("__graft_fk")).distinct()
        val hinted =
          if (keySide.count() <= graft.SparkUtil.BroadcastRowLimit) broadcast(keySide)
          else keySide
        val hit = pkFrame(e.childTable,
          child.join(hinted, child(e.childCol) === hinted("__graft_fk"), "left_semi"))
        hits(e.childTable) = hits.get(e.childTable)
          .map(_.unionByName(hit).distinct()).getOrElse(hit)
      }
      // new keys only: anti-join against everything accumulated so far,
      // so diamonds/cycles converge
      val next = hits.toMap.flatMap { case (t, ks) =>
        val fresh = acc.get(t) match {
          case Some(seen) => ks.join(seen, keyCols(t), "left_anti")
          case None => ks
        }
        val chk = fresh.localCheckpoint(false)
        if (chk.isEmpty) None else Some(t -> chk)
      }
      acc = next.foldLeft(acc) { case (m, (t, ks)) =>
        m.updated(t, m.get(t).map(_.unionByName(ks).distinct()).getOrElse(ks))
      }
      frontier = next
    }
    acc
  }
}
