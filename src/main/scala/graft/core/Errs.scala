package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Error-array schema shared by every validator.
  *
  * Mirrors the reference's error reporting model (`filters/base.py::FilterError`
  * + `BaseFilter.templates`, see SURVEY.md §1): each invalid value yields a
  * `{key, code, message}` record, where `key` is the dotted context path
  * (`"address.line_1"`, `"embedding.3"`). Here errors live in an
  * `array<struct<key,code,message>>` column so the whole validation stays a
  * single Catalyst expression tree (codegen, pushdown-friendly).
  */
object Errs {
  /** DDL of the `_errors` column type. */
  val typeDdl = "array<struct<key:string,code:string,message:string>>"

  /** Empty, correctly-typed error array. */
  def none: Column = array().cast(typeDdl)

  /** A single error struct. */
  def one(key: Column, code: String, message: Column): Column =
    struct(key.as("key"), lit(code).as("code"), message.as("message"))
}
