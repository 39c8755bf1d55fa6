package graft.operators

/** Shared JVM replica of the documented [[Sampling.bucket]] construction
  * (first 8 hex digits of md5("salt:key"), mod BucketCount) — the single
  * source of truth for test-side bucket expectations.
  */
object TestBuckets {
  def jvmBucket(key: String, salt: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$key".getBytes("UTF-8"))
    (java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
      % Sampling.BucketCount).toInt
  }
}
