"""Unit tests for the pure-Column transform library -- the reference's
quirky edge cases from SURVEY.md section 5.1 (name split, email fallback,
enum map, link regex, thread override, truncation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from groove_to_helpscout_migration_tool_spark.functions import (
    classify_thread,
    extract_link_id,
    groove_state_to_helpscout_status,
    link_kind,
    split_and_validate_emails,
    split_full_name,
    truncate_with_flag,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("r")).first()["r"]


class TestNameSplit:
    def test_simple(self, spark):
        r = _one(spark, split_full_name(F.col("n")), n="Ada Lovelace")
        assert (r["first_name"], r["last_name"]) == ("Ada", "Lovelace")

    def test_no_space_gives_null_last(self, spark):
        r = _one(spark, split_full_name(F.col("n")), n="Cher")
        assert (r["first_name"], r["last_name"]) == ("Cher", None)

    def test_first_space_only_and_trim(self, spark):
        r = _one(spark, split_full_name(F.col("n")), n="Mary  Jane Watson")
        assert r["first_name"] == "Mary"
        assert r["last_name"] == "Jane Watson"  # remainder trimmed, inner spaces kept

    def test_unicode(self, spark):
        r = _one(spark, split_full_name(F.col("n")), n="José García")
        assert (r["first_name"], r["last_name"]) == ("José", "García")

    def test_phone_number_as_name(self, spark):
        # README.md:103 in the reference: phone-number-as-name must not crash
        r = _one(spark, split_full_name(F.col("n")), n="+1 416 555 0199")
        assert r["first_name"] == "+1"
        assert r["last_name"] == "416 555 0199"


class TestTruncation:
    def test_under_cap_untouched(self, spark):
        r = _one(spark, truncate_with_flag(F.col("v"), 40), v="short")
        assert (r["value"], r["was_truncated"]) == ("short", False)

    def test_over_cap_truncated_and_flagged(self, spark):
        long = "x" * 45
        r = _one(spark, truncate_with_flag(F.col("v"), 40), v=long)
        assert r["value"] == "x" * 40
        assert r["was_truncated"] is True


class TestEmailSplit:
    def test_single_valid(self, spark):
        r = _one(spark, split_and_validate_emails(F.col("e")), e="a@b.com")
        assert r["emails"] == ["a@b.com"]
        assert r["all_valid"] is True
        assert r["primary"] == "a@b.com"

    def test_multi_separators(self, spark):
        r = _one(spark, split_and_validate_emails(F.col("e")), e="a@b.com;c@d.org e@f.net")
        assert r["emails"] == ["a@b.com", "c@d.org", "e@f.net"]
        assert r["primary"] == "a@b.com"

    def test_any_invalid_falls_back_to_original(self, spark):
        # CustomerProcessor.php:108-117 -- ANY invalid fragment keeps the
        # whole original unsplit string
        raw = "a@b.com;not-an-email"
        r = _one(spark, split_and_validate_emails(F.col("e")), e=raw)
        assert r["emails"] == [raw]
        assert r["all_valid"] is False
        assert r["primary"] == raw

    def test_blank_fragments_skipped(self, spark):
        r = _one(spark, split_and_validate_emails(F.col("e")), e="a@b.com,, c@d.org")
        assert r["emails"] == ["a@b.com", "c@d.org"]


class TestEnumMap:
    def test_known_states(self, spark):
        for state, status in [
            ("unread", "active"), ("opened", "active"), ("pending", "pending"),
            ("closed", "closed"), ("spam", "spam"),
        ]:
            assert _one(spark, groove_state_to_helpscout_status(F.col("s")), s=state) == status

    def test_unknown_state_is_null(self, spark):
        assert _one(spark, groove_state_to_helpscout_status(F.col("s")), s="weird") is None


class TestLinkExtract:
    def test_customer_href(self, spark):
        href = "https://api.groovehq.com/v1/customers/jane@ex.com"
        assert _one(spark, link_kind(F.col("h")), h=href) == "customer"
        assert _one(spark, extract_link_id(F.col("h")), h=href) == "jane@ex.com"

    def test_agent_href(self, spark):
        href = "http://api.groovehq.com/v1/agents/agent-9"
        assert _one(spark, link_kind(F.col("h")), h=href) == "agent"
        assert _one(spark, extract_link_id(F.col("h")), h=href) == "agent-9"

    def test_no_match_is_error(self, spark):
        assert _one(spark, link_kind(F.col("h")), h="https://elsewhere.com/x") == "error"


class TestThreadClassify:
    def _cls(self, spark, note, agent, author, overrides=("vip@ex.com",)):
        ov = F.array(*[F.lit(o) for o in overrides])
        return _one(
            spark,
            classify_thread(F.col("n"), F.col("a"), F.col("e"), ov),
            n=note, a=agent, e=author,
        )

    def test_note(self, spark):
        assert self._cls(spark, True, False, "agent@co.com") == "note"

    def test_note_with_customer_override_case_insensitive(self, spark):
        # TicketProcessor.php:76-83: a note authored by a known customer
        # email is a customer thread; comparison is case-insensitive (P12)
        assert self._cls(spark, True, False, "VIP@EX.COM") == "customer"

    def test_agent_response(self, spark):
        assert self._cls(spark, False, True, "agent@co.com") == "message"

    def test_default_customer(self, spark):
        assert self._cls(spark, False, False, "someone@ex.com") == "customer"


class TestIso8601Offset:
    """to_iso8601 must print the TARGET zone's offset, not the session's
    (sessions here pin spark.sql.session.timeZone=UTC)."""

    def _fmt(self, spark, ts_str, zone):
        from groove_to_helpscout_migration_tool_spark.functions import to_iso8601

        return _one(
            spark, to_iso8601(F.to_timestamp(F.col("t")), zone), t=ts_str
        )

    def test_toronto_winter_is_minus_5(self, spark):
        assert self._fmt(spark, "2016-01-15 10:00:00", "America/Toronto") == (
            "2016-01-15T05:00:00-05:00"
        )

    def test_toronto_summer_dst_is_minus_4(self, spark):
        assert self._fmt(spark, "2016-07-15 10:00:00", "America/Toronto") == (
            "2016-07-15T06:00:00-04:00"
        )

    def test_half_hour_zone(self, spark):
        assert self._fmt(spark, "2016-01-15 10:00:00", "Asia/Kolkata") == (
            "2016-01-15T15:30:00+05:30"
        )

    def test_utc_prints_plus_00(self, spark):
        # PHP format('c') parity: +00:00, never 'Z'
        assert self._fmt(spark, "2016-01-15 10:00:00", "UTC") == (
            "2016-01-15T10:00:00+00:00"
        )

    def test_none_keeps_zoneless_form(self, spark):
        assert self._fmt(spark, "2016-01-15 10:00:00", None) == (
            "2016-01-15T10:00:00"
        )
