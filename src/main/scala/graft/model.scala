package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed row models for the training-data tables — the `Dataset[T]` face
  * of [[Tables]] for callers who want compile-time column safety (typed
  * `filter`/`map`/`groupByKey`). The `DataFrame` loaders remain the hot
  * path: typed lambdas opt out of codegen'd expressions, so use these at
  * API boundaries, not inside operator internals. */
object model {

  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  implicit class TypedTables(private val t: Tables.type) {
    def documentsDs(s: SparkSession, d: String): Dataset[Doc] = {
      import s.implicits._
      Tables.documents(s, d).as[Doc]
    }
    def embeddingsDs(s: SparkSession, d: String): Dataset[Embedding] = {
      import s.implicits._
      Tables.embeddings(s, d).as[Embedding]
    }
    def eventsDs(s: SparkSession, d: String): Dataset[Ev] = {
      import s.implicits._
      Tables.events(s, d).as[Ev]
    }
  }
}
