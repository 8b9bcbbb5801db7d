"""HATEOAS link -> (id, kind) extraction (reference parity: TicketProcessor.php:210-223).

P6: identity is encoded in the href URL; recover it by regex. Customer
hrefs carry an email-or-id tail, agent hrefs an agent id. A href that
matches neither is an error row (never an exception).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GROOVE_CUSTOMER_RE = r"^https?://api\.groovehq\.com/v1/customers/(.*)$"
GROOVE_AGENT_RE = r"^https?://api\.groovehq\.com/v1/agents/(.*)$"


def extract_link_id(href: Column) -> Column:
    """-> the id/email tail of a customer or agent href ('' if no match)."""
    cust = F.regexp_extract(href, GROOVE_CUSTOMER_RE, 1)
    agent = F.regexp_extract(href, GROOVE_AGENT_RE, 1)
    return F.when(cust != "", cust).otherwise(agent)


def link_kind(href: Column) -> Column:
    """-> 'customer' | 'agent' | 'error' discriminator for a href."""
    return (
        F.when(F.regexp_extract(href, GROOVE_CUSTOMER_RE, 1) != "", F.lit("customer"))
        .when(F.regexp_extract(href, GROOVE_AGENT_RE, 1) != "", F.lit("agent"))
        .otherwise(F.lit("error"))
    )
