package graft.acid

import org.apache.hadoop.fs.Path

/** Cross-table atomic transactions: commit one [[Txn]] per
  * [[Instance]] so that EITHER every table's changes become visible or
  * none do — the multi-table analog of the reference's datastore-wide
  * transaction (a db-core txn spans every object regardless of
  * file_id, instance.rs:88-99, with the single WAL commit record at
  * 102-111 as the atomic point).
  *
  * Protocol (two-phase, coordinated by ONE decision record):
  *  1. Each table's txn commits normally — full conflict validation,
  *     optimistic version claim — but its manifest carries a
  *     `multiRef` to a decision record that does not exist yet. Such a
  *     POINTER manifest resolves to a no-op in every fold until the
  *     decision says otherwise.
  *  2. After ALL pointers published, the coordinator atomically claims
  *     the decision record "committed" (same [[ManifestClaimer]]
  *     primitive as manifests). That single claim is the commit point
  *     for every table at once.
  * Failure anywhere before the claim → the coordinator claims
  * "aborted"; a coordinator that dies without deciding is resolved by
  * the first reader past [[EngineConf.multiGraceMs]], which arbitrates
  * the decision slot to "aborted" (claim-or-read-back, so every
  * participant resolves identically — no half-visible transaction,
  * ever). Aborted pointers keep their version slots as no-op commits;
  * their staged files fall to vacuum's orphan sweep.
  *
  * Conflict detection stays EXACT and per-table: each pointer publish
  * runs the ordinary commit validation (object overlap, file overlap,
  * dv races) against its own log. Snapshot isolation spans the set:
  * before the decision claim no reader sees any participant's deltas;
  * after it, all of them. */
object MultiCommit {

  /** Commit every (instance, txn) pair atomically. Returns the claimed
    * version per table root. Throws [[ConflictException]] (or the
    * participant's own failure) with NOTHING visible if any pointer
    * publish fails or the decision is arbitrated away. */
  def commitAll(decisionDir: String,
      parts: Seq[(Instance, Txn)]): Map[String, Long] = {
    require(parts.nonEmpty, "cross-table commit needs at least one table")
    require(parts.map(_._1.root).distinct.size == parts.size,
      "one transaction per table (duplicate roots passed)")
    val coord = parts.head._1
    val dDir = new Path(decisionDir)
    val dfs = dDir.getFileSystem(coord.spark.sparkContext.hadoopConfiguration)
    dfs.mkdirs(dDir)
    val decision = dfs.makeQualified(new Path(dDir,
      s"m-${java.util.UUID.randomUUID().toString.take(12)}.json"))
    val uri = decision.toString
    // deterministic publish order (by table root): two concurrent
    // multi-commits over overlapping table sets fail fast on the first
    // shared log instead of interleaving claims
    val ordered = parts.sortBy(_._1.root)
    val versions = scala.collection.mutable.Map[String, Long]()
    var published = 0
    try {
      ordered.foreach { case (inst, txn) =>
        versions(inst.root) = inst.commit(txn, Some(uri))
        published += 1
      }
    } catch {
      case e: Throwable =>
        // decide ABORTED so the already-published pointers neuter
        // deterministically (no reader ever has to arbitrate), then
        // release the unreached txns' staged files
        if (published > 0)
          VersionedTable.claimDecision(dfs, decision, coord.conf.claimer,
            committed = false)
        // the failing txn usually aborted itself inside commit();
        // abort is idempotent, so sweep it and every unreached one
        ordered.drop(published).foreach { case (inst, txn) =>
          try inst.rollback(txn)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        throw e
    }
    if (!VersionedTable.claimDecision(dfs, decision, coord.conf.claimer,
        committed = true)) {
      // a reader arbitrated the decision between our last pointer and
      // this claim (grace elapsed — e.g. a stalled coordinator that
      // woke back up). The whole transaction is void everywhere.
      throw new ConflictException(
        s"cross-table commit $uri arbitrated aborted before its decision claim")
    }
    versions.toMap
  }
}
