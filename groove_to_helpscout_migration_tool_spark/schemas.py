"""Typed entity schemas (SURVEY.md section 1.1, FIXTURES.md).

The reference's input schema is implicit (whatever JSON Groove returns);
the engine declares explicit StructTypes so sources fail loudly on drift
and Catalyst can prune columns at the scan.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _href(*names: str) -> T.StructType:
    return T.StructType(
        [T.StructField(n, T.StructType([T.StructField("href", T.StringType())]), True) for n in names]
    )


GROOVE_CUSTOMER = T.StructType([
    T.StructField("email", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("about", T.StringType()),
    T.StructField("twitter_username", T.StringType()),
    T.StructField("linkedin_username", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("company_name", T.StringType()),
    T.StructField("phone_number", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("website_url", T.StringType()),
])

GROOVE_TICKET = T.StructType([
    T.StructField("number", T.IntegerType(), False),
    T.StructField("title", T.StringType()),
    T.StructField("summary", T.StringType()),
    T.StructField("state", T.StringType()),
    T.StructField("mailbox", T.StringType()),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("created_at", T.StringType()),
    T.StructField("links", _href("customer", "assignee")),
    T.StructField("page", T.IntegerType()),
])

GROOVE_MESSAGE = T.StructType([
    T.StructField("ticket_number", T.IntegerType(), False),
    T.StructField("message_id", T.StringType()),
    T.StructField("note", T.BooleanType()),
    T.StructField("agent_response", T.BooleanType()),
    T.StructField("body", T.StringType()),
    T.StructField("created_at", T.StringType()),
    T.StructField("href", T.StringType()),
    T.StructField("links", _href("author", "recipient", "attachments")),
    T.StructField("page", T.IntegerType()),
])

GROOVE_ATTACHMENT = T.StructType([
    T.StructField("message_id", T.StringType()),
    T.StructField("filename", T.StringType()),
    T.StructField("size", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("data", T.BinaryType()),
])

HELPSCOUT_MAILBOX = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("name", T.StringType()),
    T.StructField("email", T.StringType()),
])

HELPSCOUT_USER = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("firstName", T.StringType()),
    T.StructField("lastName", T.StringType()),
    T.StructField("email", T.StringType()),
])

HELPSCOUT_CUSTOMER_DIM = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("email", T.StringType()),
])

HELPSCOUT_CONVERSATION_DIM = T.StructType([
    T.StructField("number", T.IntegerType(), False),
    T.StructField("subject", T.StringType()),
    T.StructField("modifiedAt", T.StringType()),
])

# Output shapes (expected_* golden tables in FIXTURES.md)
ENTRY = T.StructType([
    T.StructField("value", T.StringType()),
    T.StructField("location", T.StringType()),
])
SOCIAL = T.StructType([
    T.StructField("value", T.StringType()),
    T.StructField("type", T.StringType()),
])

HELPSCOUT_CUSTOMER_OUT = T.StructType([
    T.StructField("firstName", T.StringType()),
    T.StructField("lastName", T.StringType()),
    T.StructField("organization", T.StringType()),
    T.StructField("jobTitle", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("background", T.StringType()),
    T.StructField("phones", T.ArrayType(ENTRY)),
    T.StructField("emails", T.ArrayType(ENTRY)),
    T.StructField("socialProfiles", T.ArrayType(SOCIAL)),
    T.StructField("websites", T.ArrayType(T.StructType([T.StructField("value", T.StringType())]))),
])
