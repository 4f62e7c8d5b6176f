package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Snapshot-and-restore for session confs: sets every key, runs `body`,
 * then restores each key to its prior value — or unsets keys that were
 * absent — so scoped tuning can never clobber a session-level value, in
 * any run order and on any exception path. ONE implementation (query
 * registry, planning fixtures, and specs all route here): the
 * restore-or-unset logic had grown three hand-rolled copies, and a fix
 * to one silently missed the others.
 *
 * Only safe around bodies that fully CONSUME their results: a
 * lazily-returned DataFrame re-plans on its next action with the
 * restored confs.
 */
object Confs {
  def withConfs[T](spark: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
