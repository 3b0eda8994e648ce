package graft.tools

import graft.extract.Extractor
import graft.fixtures.Fixtures
import graft.reflow.ExtractConfig
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Dev tool: raw kernel thread-scaling without Spark. */
object KernelScale {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val docs = (0 until n).map { i =>
      val rng = new Fixtures.Rng(42L + i)
      Fixtures.compositeDoc(f"doc-$i%08d", 1 + rng.nextInt(3), rng, withMedia = i % 5 == 0)
    }.toArray
    val cfg = ExtractConfig()
    // warmup
    docs.take(4000).foreach(d => Extractor.extractRow(d, cfg))

    Seq(1, 4, 16, 32).foreach { threads =>
      val pool = Executors.newFixedThreadPool(threads)
      val idx = new AtomicInteger(0)
      val t0 = System.nanoTime()
      val tasks = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = idx.getAndIncrement()
            while (i < n) {
              Extractor.extractRow(docs(i), cfg)
              i = idx.getAndIncrement()
            }
          }
        })
      }
      tasks.foreach(_.get())
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[kernel] threads=$threads%2d wall=$wall%.2f s docs/sec=${n / wall}%.0f")
    }
  }
}
