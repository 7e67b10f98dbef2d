package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON (POST) source decoder — reference `JsonEventHandler.java:70-183`:
  * an `EventContainer` body (snake_case, ISO-8601 offset client timestamp)
  * becomes one canonical event row. No checksum exists on this path, so
  * `corrupt` is constant false (`DivolteEvent.java:182-184`); the party id
  * arrives out-of-band (query param), passed here as a column name.
  */
object JsonSource {

  /** EventContainer wire schema (`JsonEventHandler.java:104-127`). The
    * free-form `parameters` object stays a raw JSON string for downstream
    * `get_json_object` — the reference also defers parameter decoding
    * (`DivolteEvent.java:55` lazy supplier). */
  val containerSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("session_id", StringType, nullable = false),
    StructField("event_id", StringType, nullable = false),
    StructField("is_new_party", BooleanType, nullable = false),
    StructField("is_new_session", BooleanType, nullable = false),
    StructField("client_timestamp_iso", StringType, nullable = false)))

  def decode(raw: DataFrame, bodyCol: String, partyIdCol: String): DataFrame =
    raw
      .withColumn("__c", from_json(col(bodyCol), containerSchema))
      .withColumn("corrupt", lit(false))
      .withColumn("partyId", col(partyIdCol))
      .withColumn("sessionId", col("__c.session_id"))
      .withColumn("eventId", col("__c.event_id"))
      .withColumn("eventSource", lit("json"))
      .withColumn("eventType", col("__c.event_type"))
      .withColumn("newPartyId", col("__c.is_new_party"))
      .withColumn("firstInSession", col("__c.is_new_session"))
      .withColumn("clientTime",
        unix_millis(to_timestamp(col("__c.client_timestamp_iso"))))
      .withColumn("eventParameters", get_json_object(col(bodyCol), "$.parameters"))
      .drop("__c")
}
