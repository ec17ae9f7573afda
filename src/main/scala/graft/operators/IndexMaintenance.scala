package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call maintenance sweep over a fleet of persisted indexes — the
  * entry point a cluster scheduler runs at a fixed cadence so the
  * self-applying lifecycle knobs actually get applied: each registered
  * index is probed with its family's [[RebuildTrigger]] first (a rebuild
  * commits a fresh generation and retires streams + tombstones wholesale,
  * so a due rebuild subsumes the compaction check) and its
  * [[CompactionTrigger]] otherwise. Every probe is the family's own
  * `maybeRebuild` / `maybeCompact` — the sweep adds NO second copy of any
  * trigger arithmetic, it only sequences the existing single-index knobs
  * and reports what fired.
  *
  * Cost model (the reason a sweep is safe to run often): a probe that
  * holds off costs a handful of segment-count aggregates per index —
  * column-pruned counts, no corpus scan. The O(corpus) work (a retrain,
  * a fold) happens only when the measured trigger says it is due, which
  * is exactly the contract each knob already had alone. Rebuild corpora
  * are passed as thunks: the probe may build the DataFrame (plan
  * construction only), but its data is scanned ONLY when a retrain
  * actually fires — registering a 100 TB corpus costs nothing on a
  * quiet sweep.
  *
  * Failure isolation: one index's failed mutation (e.g. a lost
  * single-writer race on the generation file — sweeps may run
  * concurrently with ingest) is reported as `failed` on its row and the
  * sweep moves on; every index's manifest commit is atomic, so a failed
  * sweep row never leaves that index inconsistent, and the next sweep
  * retries it.
  */
object IndexMaintenance {

  /** An index registered for maintenance: its dir plus the family-shaped
    * knobs. `corpus` thunks supply the CURRENT corpus a due rebuild
    * retrains over; families without a fitted model (minhash) take none
    * and never rebuild. */
  sealed trait Registration {
    def dir: String
    def family: String
  }

  final case class MinhashIndex(
      dir: String,
      compactRatio: Double = 0.01,
      streamRatio: Double = 0.25) extends Registration {
    def family: String = "minhash"
  }

  final case class SemanticIndex(
      dir: String,
      corpus: () => DataFrame,
      k: Int = 8,
      rounds: Int = 2,
      threshold: Double = 0.4,
      quantScale: Int = 4096,
      rebuildRatio: Double = 0.5,
      compactRatio: Double = 0.01,
      streamRatio: Double = 0.25) extends Registration {
    def family: String = "semantic"
  }

  final case class IvfIndex(
      dir: String,
      corpus: () => DataFrame,
      nlist: Int = 8,
      iters: Int = 2,
      rebuildRatio: Double = 0.5,
      compactRatio: Double = 0.01,
      streamRatio: Double = 0.25) extends Registration {
    def family: String = "ivf"
  }

  final case class IvfPqIndex(
      dir: String,
      corpus: () => DataFrame,
      nlist: Int = 8,
      iters: Int = 2,
      m: Int = 8,
      dim: Int = 64,
      pqNlist: Int = 16,
      pqIters: Int = 2,
      rebuildRatio: Double = 0.5,
      compactRatio: Double = 0.01,
      streamRatio: Double = 0.25) extends Registration {
    def family: String = "ivfpq"
  }

  final case class TextIndexReg(
      dir: String,
      corpus: () => DataFrame,
      growthRatio: Double = 0.5,
      driftRatio: Double = 0.2,
      compactRatio: Double = 0.01,
      streamRatio: Double = 0.25) extends Registration {
    def family: String = "text"
  }

  /** The duplicate-cluster assignment index ([[Dedup.clusterIndexBuild]]):
    * no fitted model (never rebuilds) and no tombstones — the only knob is
    * folding the delta back into the base. */
  final case class ClusterIndex(
      dir: String,
      streamRatio: Double = 0.25) extends Registration {
    def family: String = "clusters"
  }

  /** What one sweep did to one index. `generation` is the live manifest
    * generation AFTER the sweep (0 = still legacy/unbuilt). `hidden` is
    * the deep-audit evidence ([[IndexManifest.Audit.hiddenStreamIds]])
    * measured BEFORE the sweep's mutations — a compaction in the same
    * sweep applies the hiding tombstones physically and heals the audit,
    * so the report is where the evidence survives the fold. */
  final case class Report(
      dir: String,
      family: String,
      rebuilt: Boolean,
      compacted: Boolean,
      generation: Long,
      failed: Option[String],
      hidden: Seq[Long] = Nil)

  private def layoutOf(family: String): IndexManifest.Layout = family match {
    case "minhash" => IndexManifest.Layouts.minhash
    case "semantic" => IndexManifest.Layouts.semantic
    case "ivf" => IndexManifest.Layouts.ivf
    case "ivfpq" => IndexManifest.Layouts.ivfpq
    case "text" => IndexManifest.Layouts.text
    case "clusters" => IndexManifest.Layouts.clusters
    case other => sys.error(s"unknown index family: $other")
  }

  /** Structural fsck across the fleet — [[IndexManifest.audit]] per
    * registration, NEVER mutating: is each index servable (manifest
    * resolves, live segments present and footer-readable), and how much
    * crash-recovery debt (orphan dirs, stale staging files) is waiting
    * for the next commit's GC. The read-only sibling of [[sweep]]: run
    * it first when a serving tier reports errors, run it after an
    * incident to confirm the recovery contract actually held. Cost per
    * index: dir listings + one schema resolution per segment.
    * `visibility = true` adds [[IndexManifest.audit]]'s streamed-row
    * visibility pass (the one damage class structure can't see: ids a
    * stream appended under an upsert's scoped tombstone, silently never
    * served) — one column-pruned stream-segment scan per index. */
  def fsck(
      spark: SparkSession,
      indexes: Seq[Registration],
      visibility: Boolean = false): Seq[(Registration, IndexManifest.Audit)] =
    indexes.map(reg =>
      reg -> IndexManifest.audit(spark, reg.dir, layoutOf(reg.family), visibility))

  /** Probe every registered index once, in order; apply whatever its
    * triggers say is due. Returns one [[Report]] per registration.
    *
    * Deep audit on cadence, by default: with `deepAudit = true` each
    * index runs [[IndexManifest.audit]]'s visibility pass BEFORE its
    * mutation probes, so the one damage class structure can't see
    * (stream rows silently hidden under a generation-scoped tombstone)
    * is caught by the turnkey scheduler story, not only by a hand-run
    * [[fsck]] — and the evidence lands in [[Report.hidden]] before a
    * compaction in the same sweep applies the tombstones physically and
    * heals the condition. Cost: nothing on an index with no stream
    * segment; otherwise one column-pruned stream-id scan joined to a
    * broadcast tombstone slice — the same order as the stream-row counts
    * the trigger probes already pay, and bounded by the stream segment,
    * never the corpus. Fleets with pathological stream segments can pass
    * `deepAudit = false` and schedule [[fsck]] at their own cadence.
    *
    * Lost single-writer races are retried once (`raceRetries`): a
    * concurrent ingest committing between this sweep's probe-read and
    * its commit surfaces as [[IndexManifest.commit]]'s loud
    * "single-writer" error — the index is untouched (the commit is the
    * atomic point), and the trigger arithmetic is idempotent and
    * segment-count-cheap, so one re-read + re-probe against the moved
    * state makes the scheduler story turnkey. A second loss in the same
    * sweep reports `failed` honestly (the next cadence retries anyway);
    * genuine failures (unreadable segments, bad registrations) don't
    * match the race signature and are never retried. */
  def sweep(
      spark: SparkSession,
      indexes: Seq[Registration],
      raceRetries: Int = 1,
      deepAudit: Boolean = true): Seq[Report] =
    indexes.map { reg =>
      var report = sweepOne(spark, reg, deepAudit)
      var left = raceRetries
      while (left > 0 && report.failed.exists(_.contains("single-writer"))) {
        report = sweepOne(spark, reg, deepAudit)
        left -= 1
      }
      report
    }

  private def sweepOne(
      spark: SparkSession,
      reg: Registration,
      deepAudit: Boolean = false): Report = {
      // visibility evidence is read FIRST — before the mutations below
      // can fold the stream segment and erase it (see the sweep
      // scaladoc) — and OUTSIDE the mutation try, so a failed mutation
      // still reports the evidence it was measured with (a fleet
      // alerting on Report.hidden must not lose the damage just because
      // the compaction lost a race). An audit that itself throws (e.g. a
      // stream schema without the layout's idCol) reports failed.
      val hidden: Seq[Long] =
        if (!deepAudit) Nil
        else
          try IndexManifest
            .audit(spark, reg.dir, layoutOf(reg.family), visibility = true)
            .hiddenStreamIds
          catch {
            case e: Throwable =>
              val gen = try IndexManifest.read(spark, reg.dir).map(_.generation).getOrElse(0L)
                catch { case _: Throwable => -1L }
              return Report(reg.dir, reg.family, rebuilt = false, compacted = false,
                gen, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
          }
      try {
        // a rebuild replaces the frozen model and drops its recall
        // calibration with it (stale curves are never served); remember
        // which k's were calibrated so a fired rebuild re-measures them —
        // "the curve stales exactly when the model does", automated
        val calibratedKs = reg match {
          case _: IvfIndex | _: IvfPqIndex =>
            SimilaritySearch.recallKs(
              IndexManifest.read(spark, reg.dir).map(_.props).getOrElse(Map.empty))
          case _ => Seq.empty
        }
        val rebuilt = reg match {
          case r: SemanticIndex =>
            Dedup.semanticIndexMaybeRebuild(
              r.corpus(), r.dir, r.k, r.rounds, r.threshold, r.quantScale, r.rebuildRatio)
          case r: IvfIndex =>
            SimilaritySearch.ivfIndexMaybeRebuild(
              r.corpus(), r.dir, r.nlist, r.iters, r.rebuildRatio)
          case r: IvfPqIndex =>
            SimilaritySearch.ivfPqIndexMaybeRebuild(
              r.corpus(), r.dir, r.nlist, r.iters, r.m, r.dim,
              r.pqNlist, r.pqIters, r.rebuildRatio)
          case r: TextIndexReg =>
            TextSearchIndex.maybeRebuild(r.corpus(), r.dir, r.growthRatio, r.driftRatio)
          case _: MinhashIndex | _: ClusterIndex => false
        }
        if (rebuilt) calibratedKs.foreach { k =>
          reg match {
            case _: IvfIndex => SimilaritySearch.ivfIndexCalibrate(spark, reg.dir, k)
            case _: IvfPqIndex => SimilaritySearch.ivfPqIndexCalibrate(spark, reg.dir, k)
            case _ => ()
          }
        }
        val compacted = !rebuilt && (reg match {
          case r: MinhashIndex =>
            Dedup.minhashIndexMaybeCompact(spark, r.dir, r.compactRatio, r.streamRatio)
          case r: SemanticIndex =>
            Dedup.semanticIndexMaybeCompact(spark, r.dir, r.compactRatio, r.streamRatio)
          case r: IvfIndex =>
            SimilaritySearch.ivfIndexMaybeCompact(spark, r.dir, r.compactRatio, r.streamRatio)
          case r: IvfPqIndex =>
            SimilaritySearch.ivfPqIndexMaybeCompact(spark, r.dir, r.compactRatio, r.streamRatio)
          case r: TextIndexReg =>
            TextSearchIndex.maybeCompact(spark, r.dir, r.compactRatio, r.streamRatio)
          case r: ClusterIndex =>
            Dedup.clusterIndexMaybeCompact(spark, r.dir, r.streamRatio)
        })
        val gen = IndexManifest.read(spark, reg.dir).map(_.generation).getOrElse(0L)
        Report(reg.dir, reg.family, rebuilt, compacted, gen, None, hidden)
      } catch {
        case e: Throwable =>
          val gen = try IndexManifest.read(spark, reg.dir).map(_.generation).getOrElse(0L)
            catch { case _: Throwable => -1L }
          Report(reg.dir, reg.family, rebuilt = false, compacted = false, gen,
            Some(Option(e.getMessage).getOrElse(e.getClass.getName)), hidden)
      }
  }
}
