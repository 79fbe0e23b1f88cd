package graft.tools

/** Cross-round bench comparison on the HOST-NOISE-ROBUST axis — the
  * README machine-drift rule as one command:
  *   runMain graft.tools.BenchDiff <old bench_detail.json> <new ...> [topN]
  *
  * For every query present in both files it compares the per-rep MEDIAN
  * user cpu (cpu_s − sys_s): at constant plans (check stages/jobs flags
  * below) user cpu is the code's own cycles, so the deltas here are
  * regressions/improvements even when wall totals swing 2-4× with host
  * pressure. Flags plan-shape movement (median stages or jobs changed)
  * separately, because a user-cpu delta WITH a plan change is a plan
  * story, not a kernel story. Plain-text report, biggest movers first. */
object BenchDiff {

  /** `jobs` is -1 when the file predates the jobs channel (r14 and
    * earlier) — treated as unknown, never as a plan change. `userP50` is
    * already JIT-ADJUSTED: HostStat's process CPU bills C2 compiler
    * threads too, so a cold block's "user" is mostly compile time
    * (q158's first sf0.1 block: 78 s of jit inside a 5.8 s rep);
    * median(user − jit_s) per rep is the code's own cycles. */
  final case class Q(userP50: Double, wallP50: Double, stages: Long, jobs: Long)

  def parse(path: String): Map[String, Q] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def nums(v: JValue): Seq[Double] = v match {
      case JArray(xs) => xs.collect {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case JDecimal(d) => d.toDouble
      }
      case _ => Seq.empty
    }
    def med(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else xs.sorted.apply((xs.size - 1) / 2)
    JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")) match {
      // "_"-prefixed entries are file metadata (the "_sf" scale marker),
      // not queries
      case JObject(qs) => qs.filterNot(_._1.startsWith("_")).map { case (name, e) =>
        val cpu = nums(e \ "cpu_s")
        val sys = nums(e \ "sys_s")
        val jit = nums(e \ "jit_ms").map(_ / 1000.0)
        val user = cpu.indices.map { i =>
          math.max(0.0, cpu(i) - sys.lift(i).getOrElse(0.0) -
            jit.lift(i).getOrElse(0.0))
        }
        val jobs = nums(e \ "jobs")
        name -> Q(med(user), med(nums(e \ "runs")),
          med(nums(e \ "stages")).toLong,
          if (jobs.isEmpty) -1L else med(jobs).toLong)
      }.toMap
      case _ => Map.empty
    }
  }

  /** The "_sf" scale marker a detail file carries (None for files
    * predating it — those are all sf0.1 full-catalog runs). The bench's
    * rotation/diff gates on it so a full run at a DIFFERENT sf (a local
    * sf0.001 smoke) can never promote an sf0.1 detail to "previous
    * round" and emit a nonsense cross-scale comparison. */
  def sfOf(path: String): Option[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    try JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8")) \ "_sf" \ "sf" match {
      case JString(s) => Some(s)
      case _ => None
    } catch { case _: Throwable => None }
  }

  /** The full comparison as one string — consumed by [[main]] (stdout)
    * and by the bench itself, which writes it as `benchdiff.txt` next to
    * `bench_detail.json` on every full-catalog run (VERDICT r15 item 5:
    * the cross-round story is committed measurement state). */
  def report(oldD: Map[String, Q], newD: Map[String, Q], topN: Int): String = {
    val sb = new StringBuilder
    val common = oldD.keySet.intersect(newD.keySet).toSeq
    val oldUser = common.map(oldD(_).userP50).sum
    val newUser = common.map(newD(_).userP50).sum
    val oldWall = common.map(oldD(_).wallP50).sum
    val newWall = common.map(newD(_).wallP50).sum
    sb ++= f"common queries: ${common.size}; p50 wall ${oldWall}%.1f -> ${newWall}%.1f s " +
      f"(x${newWall / math.max(oldWall, 0.001)}%.2f); " +
      f"p50 USER CPU ${oldUser}%.1f -> ${newUser}%.1f s " +
      f"(x${newUser / math.max(oldUser, 0.001)}%.2f)  <- the robust axis%n"
    val planMoved = common.filter { q =>
      val (o, n) = (oldD(q), newD(q))
      o.stages != n.stages ||
        (o.jobs >= 0 && n.jobs >= 0 && o.jobs != n.jobs)
    }
    if (planMoved.nonEmpty) {
      sb ++= f"%nplan-shape moved (${planMoved.size}) — user-cpu deltas here are a PLAN story:%n"
      planMoved.sortBy(q => -(newD(q).userP50 - oldD(q).userP50)).take(topN).foreach { q =>
        sb ++= f"  $q%-36s stages ${oldD(q).stages}->${newD(q).stages} " +
          f"jobs ${oldD(q).jobs}->${newD(q).jobs} user ${oldD(q).userP50}%.2f->${newD(q).userP50}%.2f s%n"
      }
    }
    sb ++= f"%ntop user-cpu movers at CONSTANT plan shape:%n"
    common.filterNot(planMoved.contains)
      .sortBy(q => -math.abs(newD(q).userP50 - oldD(q).userP50)).take(topN).foreach { q =>
        val (o, n) = (oldD(q).userP50, newD(q).userP50)
        sb ++= f"  $q%-36s user $o%6.2f -> $n%6.2f s (${if (n > o) "+" else ""}${n - o}%.2f)  " +
          f"wall ${oldD(q).wallP50}%5.2f -> ${newD(q).wallP50}%5.2f s%n"
      }
    val gone = oldD.keySet.diff(newD.keySet)
    val added = newD.keySet.diff(oldD.keySet)
    if (gone.nonEmpty) sb ++= f"%nremoved: ${gone.toSeq.sorted.mkString(", ")}%n"
    if (added.nonEmpty) sb ++= f"added: ${added.toSeq.sorted.mkString(", ")}%n"
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <old detail> <new detail> [topN]")
    val topN = if (args.length > 2) args(2).toInt else 15
    print(report(parse(args(0)), parse(args(1)), topN))
  }
}
