package graft

import graft.core.Graft
import graft.sources.Layout
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized crash-kill sequences over the versioned index-publication
  * protocol (round 15, VERDICT r14 task 8) — the property form of
  * LayoutSpec's deterministic crash cases: a random interleaving of
  * publish / idempotent-append / forget / compact on a two-table index
  * family, with simulated KILLS at the protocol's barriers, must
  * always leave the manifest-resolved family mutually consistent with
  * a trivially-correct in-memory model, and probe-green (a bucketed
  * probe over the resolved table returns exactly the model's rows).
  *
  * Kill points simulated (each is "everything before the barrier
  * happened, nothing after"):
  *  - publish/forget/compact killed AFTER the next version's table is
  *    fully written but BEFORE the manifest advance (the commit
  *    point): the next physical version exists on disk, the manifest
  *    does not know → the OLD version must stay live, and the next
  *    real publish must sweep the leftover;
  *  - append killed AFTER the stage write but BEFORE any move: an
  *    orphan `__stage` table → invisible to reads, re-staged by the
  *    replay;
  *  - append killed AFTER the file moves but BEFORE the batch marker
  *    (optionally with one moved file already lost): marker-less
  *    `b<id>-*` partials → swept by the documented reader discipline
  *    (refresh) and by every rewrite; the stream's replay of the same
  *    batch must land EXACTLY once.
  *
  * The model is a plain Map[table → Set[key]] — appends use globally
  * fresh keys so multiset questions never arise (duplicate-fold
  * byte-exactness is LayoutSpec's deterministic job). Reads follow the
  * documented discipline: `Layout.refresh` (the batch-start/reader
  * sweep) then `Layout.table`.
  */
object LayoutCrashPropertySpec extends Properties("LayoutCrash") {

  // each trial runs ~6-10 tiny Spark write/read jobs; 110 trials keeps
  // the suite in minutes while satisfying the 100+-trials contract
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(110).withMaxDiscardRatio(1)

  private lazy val spark = Graft.session("graft-layout-props")

  private def fs = new org.apache.hadoop.fs.Path(
    spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def wh(sub: String) = new org.apache.hadoop.fs.Path(
    spark.conf.get("spark.sql.warehouse.dir") + "/" + sub)

  /** Abstract op descriptors; keys are materialized at execution from
    * a per-trial counter so every append is globally fresh.
    */
  private sealed trait Op
  private case class Pub(n: Int) extends Op
  private case class App(n: Int) extends Op
  private case class KillApp(n: Int, replay: Boolean, loseFile: Boolean)
      extends Op
  private case class KillPub(n: Int) extends Op
  private case class Forget(seed: Int) extends Op
  private case object Compact extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.choose(1, 3).map(Pub(_)),
    4 -> Gen.choose(1, 3).map(App(_)),
    4 -> (for {
      n <- Gen.choose(1, 3)
      r <- Gen.oneOf(true, false)
      l <- Gen.oneOf(true, false)
    } yield KillApp(n, r, l)),
    2 -> Gen.choose(1, 2).map(KillPub(_)),
    2 -> Gen.choose(0, 1 << 20).map(Forget(_)),
    2 -> Gen.const(Compact))

  private val seqGen: Gen[List[Op]] =
    Gen.choose(3, 6).flatMap(Gen.listOfN(_, opGen))

  private val trialId = new java.util.concurrent.atomic.AtomicLong(0L)

  property("random kill-interleaved histories: resolved family == model, probes green") =
    Prop.forAll(seqGen) { ops =>
      import spark.implicits._
      val id = trialId.incrementAndGet()
      val ta = s"ckp_a_$id"
      val tb = s"ckp_b_$id"
      val keyCounter = new java.util.concurrent.atomic.AtomicLong(0L)
      def fresh(n: Int): Set[Long] =
        (1 to n).map(_ => keyCounter.incrementAndGet()).toSet
      def df(keys: Set[Long]) =
        keys.toSeq.sorted.map(k => (k, s"v$k")).toDF("k", "v")
      var model = Set.empty[Long]      // table a's expected key set
      var version = 1L                 // table a's committed version
      var batch = 0L
      try {
        // family genesis: both tables published (v1 each)
        model = fresh(2)
        Layout.replaceBucketed(spark, df(model), ta, "k", buckets = 2)
        val bRows = Set(900001L)
        Layout.replaceBucketed(spark, df(bRows), tb, "k", buckets = 2)

        ops.foreach {
          case Pub(n) =>
            model = fresh(n)
            version += 1
            Layout.replaceBucketed(spark, df(model), ta, "k", buckets = 2)
          case App(n) =>
            val rows = fresh(n)
            batch += 1
            Layout.idempotentAppendBucketed(df(rows), ta, "k",
              buckets = 2, batchId = batch)
            model ++= rows
          case KillApp(n, replay, loseFile) =>
            val rows = fresh(n)
            batch += 1
            // stage-orphan kill first: a crashed attempt that never
            // moved anything (the stage table survives as garbage the
            // next attempt drops)
            Layout.idempotentAppendBucketed(df(rows), ta, "k",
              buckets = 2, batchId = batch)
            // now the post-move / pre-marker kill: marker lost,
            // optionally one moved file lost with it
            val marker = wh(s"_graft_batches/$ta/b$batch")
            assert(fs.delete(marker, false), s"marker $marker must exist")
            if (loseFile) {
              val live = wh(s"${ta}__v$version")
              fs.listStatus(live).map(_.getPath)
                .find(_.getName.startsWith(s"b$batch-"))
                .foreach(p => fs.delete(p, false))
            }
            if (replay) {
              Layout.idempotentAppendBucketed(df(rows), ta, "k",
                buckets = 2, batchId = batch)
              model ++= rows
            }
          // else: uncommitted partials — reads must sweep them
          case KillPub(n) =>
            // rewrite killed before its manifest commit: the next
            // version's table exists on disk, uncommitted
            Layout.writeBucketed(df(fresh(n)), s"${ta}__v${version + 1}",
              "k", buckets = 2)
          case Forget(seed) =>
            if (model.nonEmpty) {
              val victim = model.toSeq.sorted.apply(seed % model.size)
              version += 1
              Layout.forgetKeys(spark, ta, "k", "k",
                Seq(victim).toDF("k"), buckets = 2)
              model -= victim
            }
          case Compact =>
            version += 1
            Layout.compactBucketed(spark, ta, "k", buckets = 2)
        }

        // --- the property: resolved state == model, family-consistent
        Layout.refresh(spark, ta) // documented reader discipline
        val gotA = Layout.table(spark, ta).select("k")
          .as[Long].collect().toSet
        val p1 = Prop(gotA == model) :| s"table a: got $gotA != model $model after $ops"
        // probe-green: a bucketed key-join probe returns the model
        val probed = Layout.table(spark, ta)
          .join(df(model).select("k"), "k")
          .select("k").as[Long].collect().toSet
        val p2 = Prop(probed == model) :| s"probe: $probed != $model"
        // snapshot pins the FAMILY: a publish to a between the pin and
        // the reads must be invisible through the snapshot, for BOTH
        // tables, whatever history preceded it
        val snap = Layout.snapshot(spark)
        Layout.replaceBucketed(spark, df(fresh(1)), ta, "k", buckets = 2)
        val snapA = snap.table(ta).select("k").as[Long].collect().toSet
        val snapB = snap.table(tb).select("k").as[Long].collect().toSet
        val p3 = Prop(snapA == model && snapB == Set(900001L)) :|
          s"snapshot drifted: a=$snapA (want $model) b=$snapB"
        p1 && p2 && p3
      } finally {
        Layout.drop(spark, ta)
        Layout.drop(spark, tb)
      }
    }
}
