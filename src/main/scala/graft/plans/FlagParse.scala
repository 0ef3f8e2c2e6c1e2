package graft.plans

import org.apache.spark.sql.internal.SQLConf

/** Lenient-but-loud boolean conf parsing shared by the opt-in optimizer
  * rules ([[LshPrefilter]], [[ApproxDistinctRewrite]]).
  *
  * `String.toBoolean` THROWS on "1"/"yes", and an exception inside a
  * session-injected rule fails every later query in the session, so the
  * rules must parse leniently — but a silently-disabled misspelled opt-in
  * ("1", "yes", "TRUE ") is undiscoverable (ADVICE r16). This helper keeps
  * the lenient semantics (anything but "true" disables) and WARNS once per
  * (key, value) when the value is non-empty and neither true nor false, so
  * the user who set `...=1` gets a signal instead of a no-op.
  */
private[plans] object FlagParse {
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def enabled(key: String, logWarn: String => Unit): Boolean = {
    val v = SQLConf.get.getConfString(key, "false")
    if ("true".equalsIgnoreCase(v.trim)) true
    else {
      if (v.trim.nonEmpty && !"false".equalsIgnoreCase(v.trim) &&
          warned.add(s"$key=$v"))
        logWarn(s"$key='$v' is neither 'true' nor 'false' — treating as " +
          "DISABLED; set it to 'true' to opt in")
      false
    }
  }
}
