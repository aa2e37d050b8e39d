package graft.connections

/** A named OAuth2 provider with mutable token state and lifecycle
  * callbacks (reference: OAuth2Provider + OAuth2Auth keyring,
  * ankaflow/connections/rest/server.py:58-151).
  *
  * Token state lives ON the provider, not on a connection: when two
  * stages authenticate against the same named provider, a refresh done
  * by the first is visible to the second, and the embedding application
  * observes rotations through `onTokenRefresh` (e.g. to persist the new
  * refresh_token) / `onRefreshFail` (e.g. to alert or re-prompt). The
  * callbacks are programmatic — passed by the host application when it
  * builds the keyring, exactly like the reference's Python callables.
  */
final case class OAuth2Provider(
    name: String,
    var accessToken: Option[String] = None,
    var refreshToken: Option[String] = None,
    subjectToken: Option[String] = None,
    config: Map[String, Any] = Map.empty,
    onTokenRefresh: (String, Map[String, Any]) => Unit = (_, _) => (),
    onRefreshFail: (String, Map[String, Any]) => Unit = (_, _) => ())

object OAuth2Provider {
  /** Inline provider from a YAML map (the reference accepts a provider
    * object in place of a registry name, server.py:69-72). */
  def fromMap(m: Map[String, Any]): OAuth2Provider = {
    def str(k: String): Option[String] =
      m.get(k).collect { case v if v != null => v.toString }
    OAuth2Provider(
      name = str("name").getOrElse("inline"),
      accessToken = str("access_token"),
      refreshToken = str("refresh_token"),
      subjectToken = str("subject_token"),
      config = m.get("config") match {
        case Some(c: Map[_, _]) => c.map { case (k, v) => k.toString -> v }
        case _ => Map.empty
      })
  }
}
