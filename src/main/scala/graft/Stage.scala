package graft

/** Collision-free tmpdir stage naming for cached fixtures.
  *
  * Earlier rounds keyed stage dirs by `Integer.toHexString(tuple
  * .hashCode())` — a 32-bit space, so two distinct (dir, size, mtime)
  * identities could collide and silently reuse each other's staged
  * files, surfacing as nondeterministic-looking oracle mismatches.
  * This keys by the full 128-bit md5 of the identity parts instead.
  *
  * SINGLE-PROCESS ASSUMPTION (deliberate): the key is derived from the
  * fixture identity alone — no per-process token — so a re-run of the
  * same harness reuses warm staged fixtures instead of leaking a fresh
  * tmp tree per JVM (the Derby db and the parquet index fixtures are
  * expensive to restage, and a nanoTime-keyed variant measurably leaked
  * both disk and a booted page cache per run; see SourceCatalog's
  * src_jdbc note). The corollary: two CONCURRENT processes staging the
  * same identity race overwrite-vs-read on the shared directory. The
  * driver/bench/test harnesses are strictly sequential single-process,
  * which is the supported mode; a concurrent deployment would add the
  * Spark app id to `parts` and accept the restage cost.
  */
object Stage {
  def dir(prefix: String, parts: Any*): java.io.File = {
    val key = java.security.MessageDigest
      .getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    new java.io.File(System.getProperty("java.io.tmpdir"), s"$prefix$key")
  }
}
