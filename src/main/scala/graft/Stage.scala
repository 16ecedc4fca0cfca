package graft

/** Collision-free tmpdir stage naming for cached fixtures.
  *
  * Earlier rounds keyed stage dirs by `Integer.toHexString(tuple
  * .hashCode())` — a 32-bit space, so two distinct (dir, size, mtime)
  * identities could collide and silently reuse each other's staged
  * files, surfacing as nondeterministic-looking oracle mismatches.
  * This keys by the full 128-bit md5 of the identity parts instead.
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
