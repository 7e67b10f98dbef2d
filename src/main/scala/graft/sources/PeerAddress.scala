package graft.sources

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proxy-adjacent peer-address resolution, applied by every source decoder
  * BEFORE mapping/enrichment — the reference wires
  * `ProxyAdjacentPeerAddressHandler` ahead of all event handlers when
  * `use_x_forwarded_for` is on (`Server.java:135-138`), so geo enrichment
  * and the `remoteHost` producer see the client address, not the load
  * balancer's.
  *
  * Column convention: a frame carrying an `xForwardedFor` column (the raw
  * header, repeated instances comma-joined per RFC 7230) gets `remoteHost`
  * rewritten to the rightmost parseable entry
  * (`ProxyAdjacentPeerAddressHandler.java:40-54`: last header, substring
  * after the last comma, trimmed; unparseable → transport address kept).
  * An `xForwardedProto` column likewise rewrites `scheme` (first value,
  * `ProxyAdjacentPeerAddressHandler.java:56`). Frames without the columns
  * pass through untouched — the `use_x_forwarded_for = false` default.
  *
  * One narrow projection; no shuffle, stays inside whole-stage codegen.
  */
object PeerAddress {

  val XffCol = "xForwardedFor"
  val ProtoCol = "xForwardedProto"

  def rewrite(df: DataFrame,
              hostCol: String = "remoteHost",
              schemeCol: String = "scheme"): DataFrame = {
    val cols = df.columns.toSet
    val withHost =
      if (cols.contains(XffCol) && cols.contains(hostCol))
        df.withColumn(hostCol,
          GraftFunctions.resolvePeerAddress(col(XffCol), col(hostCol)))
      else df
    if (cols.contains(ProtoCol)) {
      // getFirst semantics: the first proto value wins; repeated instances
      // arrive comma-joined, so take the first element, trimmed. An absent
      // header leaves the existing scheme untouched (reference ifPresent).
      val resolved = trim(element_at(split(col(ProtoCol), ","), 1))
      withHost.withColumn(schemeCol,
        if (cols.contains(schemeCol)) coalesce(resolved, col(schemeCol))
        else resolved)
    } else withHost
  }
}
