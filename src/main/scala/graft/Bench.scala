package graft
import graft.core.Graft
/** Per-round benchmark: every catalog query against
  * `SPARK_GRAFT_SF_DIR`, timed to a `noop`-format sink (full
  * materialization of every output row — `count()` would let Catalyst
  * prune projections/sorts and under-measure). Failures are reported,
  * not swallowed into a normal-looking duration.
  *
  * Contention defense (round 13): the default is TWO interleaved full
  * passes, reporting per-query MIN and the per-query `max - min`
  * spread. Rationale: `BENCH_r12.json` recorded 1156 s for a catalog
  * that reproduces at 521 s — an external co-tenant burned CPU during
  * the run's tail and poisoned the round's only perf artifact (q42, a
  * 600k-row sort, "measured" 35.5 s vs 1.62 s fresh; BASELINE.md
  * "r12 bench artifact"). A single serial pass cannot distinguish a
  * slow engine from a busy box; min-of-two interleaved passes can,
  * because a contended window hits each pass at a DIFFERENT point in
  * the catalog, and the spread field makes any residual contention
  * visible inside the artifact instead of looking like a regression.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-bench")
    // Untimed warm-up: JIT + codegen + filesystem caches land on a cheap
    // query instead of inflating whichever query sorts first.
    try SparkEntry.queries("q16_distinct")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(e) =>
      // warm-up failure is not a timing failure, but never silent
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }
    // Local A/B knobs:
    // SPARK_GRAFT_BENCH_ONLY=q44_x,q27_y — restrict to named queries;
    // SPARK_GRAFT_BENCH_REPEAT=N — override the pass count (default 2;
    // 1 restores the old single-serial-pass behavior, no spread field).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(2)
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Interleaved: pass 1 runs the whole catalog, then pass 2 — so a
    // contended wall-clock window lands on DIFFERENT queries each pass.
    val samples: Seq[(String, Double, Boolean)] =
      (1 to repeat).flatMap { _ =>
        catalog.map { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
            }
          (name, (System.nanoTime() - t0) / 1e9, ok)
        }
      }
    // Per query: MIN over successful passes (any-pass failure → -1).
    val byName = samples.groupBy(_._1)
    val results = catalog.map { case (name, _) =>
      val runs = byName(name)
      val okRuns = runs.filter(_._3).map(_._2)
      val allOk = okRuns.size == runs.size && runs.nonEmpty
      val best = if (allOk) okRuns.min else -1.0
      val spread = if (allOk && okRuns.size > 1) okRuns.max - okRuns.min else 0.0
      (name, best, spread, allOk)
    }
    val qs = results.map { case (k, v, _, ok) =>
      "\"" + k + "\":" + (if (ok) f"$v%.3f" else "-1")
    }.mkString("{", ",", "}")
    val spreads = results.collect { case (k, _, s, true) if repeat > 1 =>
      "\"" + k + "\":" + f"$s%.3f"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, true) => v }.sum
    val failed = results.count(!_._4)
    val spreadField = if (repeat > 1) s""","spread":$spreads""" else ""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"passes":$repeat$spreadField,"sf":"$sfDir"}""")
    // Tail summary (round 14, VERDICT r13 task 3): the full per-query
    // map above can overflow the driver's bounded tail capture
    // (BENCH_r13.json parsed as null). Print a LAST line compact
    // enough to always survive any tail truncation, so the artifact's
    // final line is parseable truth even when the map is cut off.
    val slowest = results.filter(_._4).sortBy(-_._2).take(10)
      .map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val spreadGt5 = results.count { case (_, _, s, ok) => ok && s > 5.0 }
    println(f"""{"metric":"summary","total_s":$total%.3f,"n":${results.size},"failed":$failed,"passes":$repeat,"spread_gt5":$spreadGt5,"slowest":$slowest,"sf":"$sfDir"}""")
    // Self-contained artifact (round 15, VERDICT r14 task 4): the
    // stdout capture that becomes BENCH_r{N}.json is tail-truncated by
    // the driver, so the full per-query map survives only here. One
    // overwritten file at the repo root, committed per session, lets
    // the next round diff EVERY query r{N-1}↔r{N} instead of the
    // fragment visible in the stdout window.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"passes":$repeat$spreadField,"sf":"$sfDir"}%n"""
        .getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] BENCH_DETAIL.json write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
