object TimeDoc extends App {
  import graft.spark._
  import java.util.concurrent._
  import java.util.concurrent.atomic.{AtomicLong, AtomicBoolean}
  val nThreads = args(0).toInt
  val docs = (0L until 2000L).map { i =>
    val (_, spans) = Corpus.docHtml(42L, i, 0.0)
    (f"d$i%06d", Spans.assembleHtml(spans))
  }.toArray
  docs.take(300).foreach { case (id, h) => Spans.extractFromHtml(id, h, "https://x.com/", graft.algo.Options()) }
  val pool = Executors.newFixedThreadPool(nThreads)
  val done = new AtomicLong()
  val stop = new AtomicBoolean(false)
  (0 until nThreads).foreach { t =>
    pool.submit(new Runnable { def run(): Unit = {
      var i = t
      while (!stop.get()) { val d = docs(i % docs.length); Spans.extractFromHtml(d._1, d._2, "https://x.com/", graft.algo.Options()); done.incrementAndGet(); i += 1 }
    }})
  }
  Thread.sleep(3000); val base = done.get(); Thread.sleep(8000)
  println(f"threads=$nThreads docs_per_sec=${(done.get() - base) / 8.0}%.0f")
  stop.set(true); pool.shutdownNow(); System.exit(0)
}
