package graft.schema

import graft.SparkSpec

class VacancySpec extends SparkSpec {

  test("Dataset[Vacancy] roundtrips through the 53-field encoder") {
    import spark.implicits._
    val v = Vacancy(
      id = 7L,
      description = Some("desc"), key_skills = Some("python\nsql"),
      schedule_id = None, schedule_name = None,
      accept_handicapped = Some(false), accept_kids = None,
      experience_id = None, experience_name = None,
      specializations = None, contacts = None,
      billing_type_id = None, billing_type_name = None,
      allow_messages = None, premium = Some(true),
      driver_license_types = None, accept_incomplete_resumes = None,
      employer_id = Some(99L), employer_name = Some("acme"),
      employer_vacancies_url = None, employer_trusted = None,
      employer_alternate_url = None, employer_industries = None,
      response_letter_required = None, type_id = None, type_name = None,
      has_test = None, response_url = None, test_required = None,
      salary_from = Some(100000L), salary_to = None, salary_gross = None,
      salary_currency = Some("RUR"), archived = Some(false),
      name = Some("dev"), insider_interview = None,
      area_id = Some(1), area_name = Some("Екатеринбург"), area_url = None,
      created_at = Some(java.sql.Timestamp.valueOf("2021-03-01 12:00:00")),
      published_at = None,
      address_city = None, address_street = None, address_building = None,
      address_description = None, address_lat = Some(56.83), address_lng = None,
      alternate_url = None, apply_alternate_url = None, code = None,
      department_id = None, department_name = None,
      employment_id = None, employment_name = None)

    val ds = spark.createDataset(Seq(v))(Vacancy.encoder)
    assert(ds.schema.fieldNames.toSeq == VacancySchema.raw.map(_.name))
    val back = ds.collect().head
    assert(back == v)

    // typed view over an untyped normalized frame
    val typed = Vacancy.dataset(ds.toDF())
    assert(typed.filter(_.salary_from.exists(_ > 50000L)).count() == 1)
  }
}
