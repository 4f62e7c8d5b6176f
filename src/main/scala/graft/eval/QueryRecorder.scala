package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Sampled-query recorder — the reference's query-sampling subsystem
 * (reference: GUC-gated recorder src/recorder/{mod,hook,worker}.rs with
 * `query_sampling_enable` / `query_sampling_rate` /
 * `query_sampling_max_records`, dump functions `vchordrq_sampled_values`
 * sql/install/vchord--1.1.1.sql:936-1013; send-side hook
 * scanners/default.rs:1245-1260).
 *
 * Index searches call [[record]]; when enabled, every `1/rate`-th query
 * vector per index is kept in a bounded ring (deterministic counter-based
 * sampling — no RNG, so test runs reproduce). [[sampledQueries]] exposes
 * the ring as a DataFrame, the analog of the reference's
 * `vchordrq_sampled_queries` view — the input you mine to pick
 * representative vectors for recall evaluation.
 */
object QueryRecorder {

  @volatile var enabled: Boolean = false          // query_sampling_enable (default off)
  @volatile var rate: Int = 1                     // keep every rate-th query
  @volatile var maxRecords: Int = 1000            // query_sampling_max_records

  private final class Ring {
    val buf = new java.util.ArrayDeque[(Long, Array[Float])]()
    var counter: Long = 0L
  }
  private val rings = new java.util.concurrent.ConcurrentHashMap[String, Ring]()

  def record(indexDir: String, q: Array[Float]): Unit = {
    if (!enabled) return
    val ring = rings.computeIfAbsent(indexDir, _ => new Ring)
    ring.synchronized {
      ring.counter += 1
      if (ring.counter % math.max(rate, 1) == 0) {
        ring.buf.addLast((ring.counter, q.clone()))
        while (ring.buf.size > maxRecords) ring.buf.removeFirst()
      }
    }
  }

  /** (index_dir, seq_no, query) for every retained sample. */
  def sampledQueries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    rings.asScala.toSeq.flatMap { case (dir, ring) =>
      ring.synchronized {
        ring.buf.iterator().asScala.toSeq.map { case (n, q) => (dir, n, q.toSeq) }
      }
    }.toDF("index_dir", "seq_no", "query")
  }

  def clear(): Unit = rings.clear()
}
