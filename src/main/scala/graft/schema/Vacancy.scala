package graft.schema

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Typed core of the vacancy model (SURVEY §1.3: "define case class
  * Vacancy + Dataset[Vacancy] for the typed core, since the schema is
  * static"). Field order mirrors [[VacancySchema.raw]]; the 53-field case
  * class is fine on Scala 2.13 (no 22-field limit for encoders). */
final case class Vacancy(
    id: Long,
    description: Option[String],
    key_skills: Option[String],
    schedule_id: Option[String],
    schedule_name: Option[String],
    accept_handicapped: Option[Boolean],
    accept_kids: Option[Boolean],
    experience_id: Option[String],
    experience_name: Option[String],
    specializations: Option[String],
    contacts: Option[String],
    billing_type_id: Option[String],
    billing_type_name: Option[String],
    allow_messages: Option[Boolean],
    premium: Option[Boolean],
    driver_license_types: Option[String],
    accept_incomplete_resumes: Option[Boolean],
    employer_id: Option[Long],
    employer_name: Option[String],
    employer_vacancies_url: Option[String],
    employer_trusted: Option[Boolean],
    employer_alternate_url: Option[String],
    employer_industries: Option[String],
    response_letter_required: Option[Boolean],
    type_id: Option[String],
    type_name: Option[String],
    has_test: Option[Boolean],
    response_url: Option[String],
    test_required: Option[Boolean],
    salary_from: Option[Long],
    salary_to: Option[Long],
    salary_gross: Option[Boolean],
    salary_currency: Option[String],
    archived: Option[Boolean],
    name: Option[String],
    insider_interview: Option[String],
    area_id: Option[Int],
    area_name: Option[String],
    area_url: Option[String],
    created_at: Option[Timestamp],
    published_at: Option[Timestamp],
    address_city: Option[String],
    address_street: Option[String],
    address_building: Option[String],
    address_description: Option[String],
    address_lat: Option[Double],
    address_lng: Option[Double],
    alternate_url: Option[String],
    apply_alternate_url: Option[String],
    code: Option[String],
    department_id: Option[String],
    department_name: Option[String],
    employment_id: Option[String],
    employment_name: Option[String])

/** Lifecycle-tracked state row ([[VacancySchema.state]] shape, projected
  * to the columns the merge and metrics actually touch). */
final case class VacancyLifecycle(
    id: Long,
    added_at: Option[Date],
    updated_at: Option[Date],
    removed_at: Option[Date])

object Vacancy {
  implicit val encoder: Encoder[Vacancy] = ExpressionEncoder[Vacancy]()

  /** Typed view over a normalized frame ([[VacancySchema.raw]] shape). */
  def dataset(normalized: DataFrame): Dataset[Vacancy] =
    normalized.as[Vacancy](encoder)
}
