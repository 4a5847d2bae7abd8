package graft.tools

/** Committed-pointer refresh rule (VERDICT r15 #3): `bench_*_rN.json`
  * pointers must carry the QUIETEST of the recent same-code history
  * runs, not whichever run happened to be last — the r15 16 GiB
  * pointer carried 1.3–1.6× 5-min-load noise on second-tier queries
  * while a parity run sat one file away in `bench/history/`.
  *
  * Scans `bench/history/` for the newest `maxN` runs whose filename
  * carries `sfTag` and whose artifact is `"valid":true`, ranks them by
  * the contention evidence the artifact itself records — warning tier
  * first (a gate-warned run loses to any clean same-code run; a
  * pre-warnings-field artifact ranks between clean and warned as
  * UNKNOWN, logged — ADVICE r16), then max(calib_start_sec,
  * calib_end_sec) (the fixed pure-CPU probe: a per-machine constant on
  * a quiet box, directly inflated by contention), tiebreak the boot
  * 5-min load — and writes the winner to the pointer path WITH a
  * `pointer_source` stamp (source history filename + the rule that
  * picked it, VERDICT r16 #2: the r16 10× pointer and the PERF prose
  * silently diverged because the pointer didn't say which history run
  * it carried). Same-code discipline stays with the caller: run this
  * right after the round's bench runs, before any source change, so
  * the newest-N window holds only same-commit runs.
  *
  * Usage: runMain graft.tools.BenchPointer <pointerPath> <sfTag> [maxN]
  *   e.g.  BenchPointer bench/bench_100x_full_r16.json scale100 4
  */
object BenchPointer {

  /** `warned`: Some(false) = artifact records an empty warnings map
    * (clean); Some(true) = non-empty warnings (gate-demoted); None =
    * the artifact predates the warnings field entirely — UNKNOWN, not
    * warned (ADVICE r16: the old whitespace-stripped substring test
    * silently classified every pre-2026-08-14 artifact as warned and
    * permanently demoted it behind any newer run). */
  private[graft] final case class Run(path: java.nio.file.Path, name: String,
      valid: Boolean, calibMax: Double, load5Boot: Double, totalSec: Double,
      warned: Option[Boolean], queries: Map[String, Double])

  private def field(json: String, key: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(key) +
      "\":(\"[^\"]*\"|true|false|[-0-9.eE]+)").r.findFirstMatchIn(json)
    m.map(_.group(1).stripPrefix("\"").stripSuffix("\""))
  }

  /** The per-query medians map. The `[{,]` anchor keeps the regex off
    * `"unstaged_queries"` (whose key CONTAINS `"queries"` as a bare
    * substring but is never preceded by a JSON delimiter + quote). */
  private[graft] def queriesOf(json: String): Map[String, Double] =
    """[{,]"queries":\{([^}]*)\}""".r.findFirstMatchIn(json) match {
      case None => Map.empty
      case Some(m) =>
        """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(m.group(1))
          .flatMap(kv => kv.group(2).toDoubleOption.map(kv.group(1) -> _))
          .toMap
    }

  /** Warning classification from the FIRST `"warnings":` key (Bench
    * writes exactly one, in guardJson, before the free-text errors
    * map — first-match keeps a warning VALUE that happens to contain
    * the literal from fooling the test, the other ADVICE-r16 hole). */
  private[graft] def warnedOf(json: String): Option[Boolean] =
    """"warnings"\s*:\s*(\{\s*\})?""".r.findFirstMatchIn(json)
      .map(m => m.group(1) == null)

  private[graft] def parse(path: java.nio.file.Path, json: String): Option[Run] =
    for {
      valid <- field(json, "valid").map(_ == "true")
      cs <- field(json, "calib_start_sec").flatMap(_.toDoubleOption)
      ce <- field(json, "calib_end_sec").flatMap(_.toDoubleOption)
      total <- field(json, "value").flatMap(_.toDoubleOption)
    } yield Run(path, path.getFileName.toString, valid, math.max(cs, ce),
      field(json, "loadavg_boot").map(graft.Bench.load5)
        .getOrElse(Double.NaN), total,
      warnedOf(json), queriesOf(json))

  /** Exact-suffix tag match: history files are `bench_<ts>_<tag>.json`,
    * and a substring test lets `scale10` swallow `scale100` runs — the
    * r16 first pass pointed bench_10x at a 100× artifact that way. */
  private[graft] def matchesTag(name: String, sfTag: String): Boolean =
    name.startsWith("bench_") && name.endsWith("_" + sfTag + ".json")

  /** Rank of the warning tier: clean < unknown < warned. A run whose
    * own gate attached a contention warning must lose to any clean
    * run, whatever their calib probes say (the r16 first 10× refresh
    * picked a load5-warned 97.3 s run over a clean 82.1 s one on a
    * 0.03 calib edge); an artifact too old to SAY ranks between —
    * its silence is not evidence of contention. */
  private[graft] def warnRank(warned: Option[Boolean]): Int = warned match {
    case Some(false) => 0
    case None        => 1
    case Some(true)  => 2
  }

  /** Per-query outlier demotion (VERDICT r19 #2): the r19 100× pointer
    * carried a 19.1 s q60_containment — with a TIGHT rep spread, so
    * the in-run spread field can't flag it — while six same-day
    * same-code siblings read 2.1–2.9 s, because the rule ranked on
    * warnings/calib/load only and that run's probes were the
    * quietest. The cross-run check the field was built for: a run is
    * OUTLIER-demoted when any of its per-query medians exceeds BOTH
    * [[OutlierRatio]]× the median of its siblings' values for that
    * query AND the sibling median + [[OutlierFloorSec]] (the absolute
    * floor keeps 0.1 s-class jitter from demoting anything). Returns
    * the worst offender as (query, value, sibling median), None when
    * clean or when fewer than two siblings carry the query (one
    * sibling is an anecdote, not a distribution). */
  val OutlierRatio = 3.0
  val OutlierFloorSec = 1.0
  private def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }
  private[graft] def outlierOf(r: Run, siblings: Seq[Run]): Option[(String, Double, Double)] =
    r.queries.toSeq.flatMap { case (q, v) =>
      val sib = siblings.filter(_.name != r.name).flatMap(_.queries.get(q)).filter(_ >= 0)
      if (sib.size < 2) None
      else {
        val m = medianOf(sib)
        if (v > OutlierRatio * m && v > m + OutlierFloorSec) Some((q, v, m)) else None
      }
    }.sortBy { case (_, v, m) => -(v / math.max(m, 1e-9)) }.headOption

  /** The quietest valid run among `runs` (newest-N window already
    * applied by the caller): [[warnRank]], then outlier-free before
    * outlier-demoted ([[outlierOf]] against the window's valid
    * siblings), then lowest calibMax, tiebreak lowest boot 5-min load
    * (NaN sorts last). */
  private[graft] def pick(runs: Seq[Run]): Option[Run] = {
    val valid = runs.filter(_.valid)
    valid.sortBy(r =>
      (warnRank(r.warned), if (outlierOf(r, valid).isDefined) 1 else 0, r.calibMax,
        if (r.load5Boot.isNaN) Double.MaxValue else r.load5Boot))
      .headOption
  }

  private[graft] val rule: String =
    "quietest-valid-of-newest-N: unwarned-first (unknown between), " +
      "then no-per-query-outlier-vs-sibling-medians (>3x and >+1s), " +
      "then min max(calib_start,calib_end), then min boot load5"

  /** The pointer file's contents: the winning history artifact with a
    * leading `pointer_source` stamp, so pointer, history, and prose
    * can never silently diverge (VERDICT r16 #2). The stamp is
    * injected after the artifact's opening brace; everything else is
    * byte-identical to the history file. */
  private[graft] def pointerJson(winnerJson: String, winnerName: String,
                                 maxN: Int): String = {
    val body = winnerJson.trim
    require(body.startsWith("{"), "history artifact must be a JSON object")
    // the stamp is spliced into the JSON verbatim: constrain the
    // filename to the bench_<ts>_<tag>.json character set (no quotes
    // or backslashes possible) rather than escaping — anything else
    // in the window is not a Bench history artifact (ADVICE r17; the
    // `rule` constant is quote-free by construction)
    require(winnerName.matches("bench_[A-Za-z0-9._-]+\\.json"),
      s"history filename is not stampable as-is: $winnerName")
    val stamp = s""""pointer_source":{"source_history_file":"$winnerName",""" +
      s""""rule":"$rule","window":$maxN},"""
    "{" + stamp + body.drop(1)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchPointer <pointerPath> <sfTag> [maxN]")
    val pointer = java.nio.file.Paths.get(args(0))
    val sfTag = args(1)
    val maxN = args.lift(2).map(_.toInt).getOrElse(4)
    val histDir = java.nio.file.Paths.get("bench", "history")
    val candidates = Option(histDir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => matchesTag(f.getName, sfTag))
      .sortBy(_.getName).takeRight(maxN)
      .flatMap { f =>
        parse(f.toPath, new String(
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8))
      }.toSeq
    val validCands = candidates.filter(_.valid)
    candidates.foreach { r =>
      val w = r.warned.map(_.toString).getOrElse("UNKNOWN (no warnings field)")
      val o = outlierOf(r, validCands)
        .map { case (q, v, m) => f" OUTLIER($q $v%.2f s vs sibling median $m%.2f s)" }
        .getOrElse("")
      println(f"[pointer] candidate ${r.name} valid=${r.valid} warned=$w " +
        f"calibMax=${r.calibMax}%.3f load5Boot=${r.load5Boot}%.2f total=${r.totalSec}%.1f s$o")
    }
    pick(candidates) match {
      case None =>
        System.err.println(s"[pointer] no valid history run matches _$sfTag in the newest $maxN")
        sys.exit(1)
      case Some(win) =>
        val json = pointerJson(new String(
          java.nio.file.Files.readAllBytes(win.path),
          java.nio.charset.StandardCharsets.UTF_8), win.name, maxN)
        java.nio.file.Files.write(pointer,
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(f"[pointer] $pointer <- ${win.name} " +
          f"(calibMax=${win.calibMax}%.3f, total=${win.totalSec}%.1f s, source stamped)")
    }
  }
}
