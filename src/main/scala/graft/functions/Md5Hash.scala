package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Single home for the portable 32-bit md5-prefix hash: the unsigned
  * value of the first 8 hex digits of md5(s) — the derivation every
  * constant (MinHash family, LSH sign matrices, SimHash word hashes)
  * and both engines' oracles agree on. */
object Md5Hash {
  def hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  def prefix32(s: String): Long =
    java.lang.Long.parseLong(hex(s).take(8), 16)
}
