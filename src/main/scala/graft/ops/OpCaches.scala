package graft.ops

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Scoped lifecycle for operator-internal caches.
  *
  * Several operators cache an internal frame that BACKS the frame they
  * return (minhash signatures, dup-group member lists, LSH buckets, the
  * corpus-clean survivor set): the operator cannot unpersist it itself,
  * because the caller has not consumed the result yet. The baseline
  * contract is therefore session-level — callers running many queries
  * in one session clear between them (`spark.catalog.clearCache()`,
  * which Bench and Verify do) — but that call is GLOBAL: it also evicts
  * caches the caller owns, and a library consumer composing operators
  * in a long-lived session accumulates executor storage between clears.
  *
  * [[scoped]] is the scoped alternative: operators register every
  * internal cache they create with the innermost active scope on the
  * calling thread, and the scope unpersists exactly those frames when
  * the block exits — the caller's own caches (and outer scopes') are
  * untouched:
  *
  * {{{
  * val survivors: Array[Row] = OpCaches.scoped {
  *   val (cleaned, _) = CorpusPipeline.clean(docs)
  *   cleaned.collect()            // materialize INSIDE the scope
  * }
  * }}}
  *
  * The registered caches back the operators' returned frames, so
  * results must be materialized (count / collect / write) before the
  * scope exits; re-evaluating a returned frame afterwards silently
  * recomputes from source — correct, just uncached. Scopes nest (each
  * unpersists only its own registrations) and are thread-local:
  * operators invoked on other threads register with those threads'
  * scopes, or with none.
  *
  * Outside any scope, registration is a no-op and the session-level
  * contract applies unchanged. Eviction pressure is bounded either
  * way: `Dataset.cache()` is `MEMORY_AND_DISK`, so an over-budget
  * cache spills to local disk rather than evicting to recompute.
  */
object OpCaches {

  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Cache `df` (`MEMORY_AND_DISK`) and register the cached frame with
    * the innermost active scope on this thread, if any. Every
    * operator-internal cache goes through here.
    *
    * OWNERSHIP: `Dataset.cache()` dedups by canonicalized plan — if a
    * semantically-equal plan is ALREADY cached (by the caller, an outer
    * scope, or an earlier registration in this scope), this call reuses
    * that entry rather than creating one. Such a frame is NOT enrolled:
    * unpersisting it at scope exit would evict a cache someone else
    * owns (exactly the cross-eviction this class exists to prevent).
    * A scope therefore releases only entries it genuinely created.
    *
    * The detection is ORDER-SENSITIVE, in the reverse direction: a
    * caller that caches a semantically-equal plan AFTER the scope has
    * registered it dedups into the scope-owned entry, and scope exit
    * releases it — the caller's `cache()` call created no entry of its
    * own to survive. Callers sharing a plan with an operator they
    * invoke inside a scope should cache it BEFORE entering the scope
    * (then the `preCached` check above protects it), or re-`cache()`
    * after the scope exits. */
  private[graft] def registered(df: DataFrame): DataFrame = {
    scopes.get() match {
      case buf :: _ =>
        val preCached = df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
        val cached = df.cache()
        if (!preCached) buf += cached
        cached
      case Nil => df.cache()
    }
  }

  /** Run `body`, then unpersist every operator-internal cache created
    * on this thread inside it (non-blocking — the map entries clear
    * synchronously, block cleanup is async). Exception-safe: caches
    * are released even when `body` throws. */
  def scoped[A](body: => A): A = {
    val buf = new ArrayBuffer[DataFrame]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.unpersist(blocking = false))
    }
  }
}
