package graft.tools

/** Single-threaded per-stage microbenchmark (no Spark) to find the hot spot. */
object Micro {
  def time[A](name: String, n: Int)(f: => A): Unit = {
    // warmup
    f; f
    val t0 = System.nanoTime()
    f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$name%-22s ${n / sec}%10.0f docs/sec/core  (${sec * 1e6 / n}%8.1f us/doc)")
  }

  def main(args: Array[String]): Unit = {
    val n = 3000
    val texts = (0 until n).map(i => graft.synth.SynthPages.gen(i.toLong).text).toArray
    println(s"avg chars: ${texts.map(_.length).sum / n}")

    time("gen", n) { (0 until n).foreach(i => graft.synth.SynthPages.gen(i.toLong)) }
    time("heuristics", n) { texts.foreach(graft.stages.HeuristicsScalar.compute) }
    val w = graft.stages.LangIdModel.weights
    time("langid", n) { texts.foreach(t => graft.stages.LangIdModel.predict(t, w)) }
    val lm = graft.stages.PerplexityModel.default
    time("perplexity", n) { texts.foreach(t => lm.perplexity(t)) }

    import java.util.regex.Pattern
    val email = Pattern.compile(graft.stages.Scrub.emailRe)
    val phone = Pattern.compile(graft.stages.Scrub.phoneRe)
    val slur = Pattern.compile(graft.stages.Scrub.slurRe)
    time("regex email x2", n) { texts.foreach { t =>
      email.matcher(t).replaceAll("<EMAIL>")
      var c = 0; val m = email.matcher(t); while (m.find()) c += 1 } }
    time("regex phone x2", n) { texts.foreach { t =>
      phone.matcher(t).replaceAll("<PHONE>")
      var c = 0; val m = phone.matcher(t); while (m.find()) c += 1 } }
    time("regex slur x2", n) { texts.foreach { t =>
      slur.matcher(t).replaceAll("<SLUR>")
      var c = 0; val m = slur.matcher(t); while (m.find()) c += 1 } }
    time("cnp scrub+count", n) { texts.foreach { t =>
      graft.stages.CnpScrubber.scrub(t); graft.stages.CnpScrubber.count(t) } }
  }
}
