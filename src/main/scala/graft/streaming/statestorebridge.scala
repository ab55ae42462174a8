package org.apache.spark.sql.execution.streaming.state

/** Deterministic state-store teardown (private[sql] API bridge).
  *
  * WHY: by default, stopped queries' loaded state-store providers are
  * closed LAZILY by the maintenance thread (default tick 60 s) — i.e.
  * concurrently with whatever the driver is running by then. Under the
  * RocksDB provider that concurrency window is where both observed JVM
  * SIGSEGVs landed (r14: `hs_err_pid1376` / `hs_err_pid12602`, both
  * `rocksdb::LoggerJniCallback::Logv` called from a background
  * flush/compaction thread ~100 s into a StreamBench battery — exactly
  * the first maintenance tick unloading the earlier shapes' providers
  * while the current shape churned the shared RocksDB env thread
  * pool). Spark's `RocksDB.close()` disposes the JNI logger right
  * after `db.close()` (`closeDB(); …; rocksDbOptions.close();
  * dbLogger.close()`), so a background job that dequeues a final log
  * line for that instance during the dispose window writes through a
  * freed `LoggerJniCallback` — an upstream rocksdbjni use-after-free
  * the application cannot patch and no `RocksDBConf` key can silence
  * (the native info-log level floor is ERROR_LEVEL and the callback's
  * own level check already reads freed memory).
  *
  * MITIGATION: close providers eagerly, on the caller's thread, at a
  * QUIESCED point (all queries stopped, no commits in flight, RocksDB
  * background queues drained since the last commit) instead of letting
  * the maintenance thread race them against live load. This does not
  * fix the upstream bug — it removes the busy-pool teardown windows
  * where it fires.
  */
object GraftStateStoreBridge {
  /** Close every loaded state-store provider now, synchronously. */
  def unloadAllStateStores(): Unit = StateStore.unloadAll()
}
