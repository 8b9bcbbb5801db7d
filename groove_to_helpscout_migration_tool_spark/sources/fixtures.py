"""Deterministic fixtures standing in for the Groove/HelpScout APIs.

Edge cases per FIXTURES.md: multi-email strings, invalid emails, no-space
names, over-cap names/orgs, unknown states, unmatched mailboxes/agents,
non-email customer hrefs, missing links, multi-page tickets, oversized /
unreachable attachments.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import SparkSession

from .. import schemas


def groove_fixtures(spark: SparkSession, include_invalid: bool = True) -> SimpleNamespace:
    customers = [
        # email, name, about, twitter, linkedin, title, company, phone, location, website
        ("jane@ex.com", "Jane Q Doe", "vip", "janedoe", "jane-doe",
         "CTO", "Acme", "555-0100", "Toronto", "https://jane.ex"),
        ("bob@ex.com;bob2@ex.org", "Bob", None, None, None,
         None, None, None, None, None),  # multi-email, no-space name
        ("carol@ex.com invalid-email", "Carol von Trapp", None, None, None,
         "Chief " + "X" * 60, "Org" + "Y" * 60, None, None, None),  # invalid frag + >60 caps
        ("dave@ex.com", "Dave " + "Z" * 45, None, "dave", None,
         None, None, "555-0101", None, None),  # >40-char last name
        ("+15550102@sms.ex", "+1 555 0102", None, None, None,
         None, None, None, None, None),  # phone-number-as-name (README.md:103)
    ]
    tickets = [
        # number, title, summary, state, mailbox, tags, created_at, links{customer,assignee}, page
        (1, "Login broken", "cannot log in", "opened", "Support", ["bug"],
         "2016-02-01 10:00:00", (("https://api.groovehq.com/v1/customers/jane@ex.com",),
                                 ("https://api.groovehq.com/v1/agents/agent-1",)), 1),
        (2, "Billing question", "charge twice", "pending", "Billing", [],
         "2016-02-02 11:30:00", (("https://api.groovehq.com/v1/customers/cust-77",),  # non-email id
                                 ("https://api.groovehq.com/v1/agents/agent-2",)), 1),
        (3, "Feature request", "dark mode", "closed", "Support", ["idea", "ui"],
         "2016-02-03 09:15:00", (("https://api.groovehq.com/v1/customers/bob@ex.com",),
                                 (None,)), 1),
        (4, "Spam offer", "buy now", "spam", "Nonexistent Box", None,
         "2016-02-04 23:59:59", (("https://api.groovehq.com/v1/customers/dave@ex.com",),  # not in HS -> Groove refetch (J4)
                                 ("https://api.groovehq.com/v1/agents/agent-1",)), 1),
        (5, "Weird state", "???", "bogus", "Support", None,
         "2016-02-05 08:00:00", (("https://api.groovehq.com/v1/customers/dave@ex.com",),
                                 ("https://api.groovehq.com/v1/agents/agent-9",)), 1),  # unknown agent
        (6, "No customer link", "orphan", "opened", "Support", None,
         "2016-02-06 12:00:00", ((None,), (None,)), 1),
    ]
    messages = [
        # ticket_number, message_id, note, agent_response, body, created_at, href, links{author,recipient,attachments}, page
        (1, "m1", False, False, "<p>I cannot log in</p>", "2016-02-01 10:00:00",
         "https://api.groovehq.com/v1/messages/m1",
         (("https://api.groovehq.com/v1/customers/jane@ex.com",),
          ("https://api.groovehq.com/v1/agents/agent-1",),
          ("https://api.groovehq.com/v1/attachments?message=m1",)), 1),
        (1, "m2", False, True, "Try resetting", "2016-02-01 10:05:00",
         "https://api.groovehq.com/v1/messages/m2",
         (("https://api.groovehq.com/v1/agents/agent-1",),
          ("https://api.groovehq.com/v1/customers/jane@ex.com",),
          (None,)), 1),
        (1, "m3", True, False, "internal: check auth logs", "2016-02-01 10:06:00",
         "https://api.groovehq.com/v1/messages/m3",
         (("https://api.groovehq.com/v1/agents/agent-2",), (None,), (None,)), 1),
        (2, "m4", True, False, "customer emailed us directly", "2016-02-02 11:31:00",
         "https://api.groovehq.com/v1/messages/m4",
         (("https://api.groovehq.com/v1/customers/carol@ex.com",), (None,), (None,)), 1),  # note by customer -> override
        (3, "m5", False, False, "please add dark mode", "2016-02-03 09:15:00",
         "https://api.groovehq.com/v1/messages/m5",
         (("https://api.groovehq.com/v1/customers/bob@ex.com",), (None,),
          ("https://api.groovehq.com/v1/attachments?message=m5",)), 1),
        # multi-page ticket (page 2) -- pins the reference's last-page
        # off-by-one divergence (SURVEY S5): our engine DOES process this row
        (3, "m6", False, True, "shipped in v2 (page-2 msg)", "2016-02-03 10:00:00",
         "https://api.groovehq.com/v1/messages/m6",
         (("https://api.groovehq.com/v1/agents/agent-1",), (None,), (None,)), 2),
        # note authored by the ticket's own customer -> customer thread (P8 override)
        (4, "m7", True, False, "I clicked the offer by mistake", "2016-02-05 00:01:00",
         "https://api.groovehq.com/v1/messages/m7",
         (("https://api.groovehq.com/v1/customers/DAVE@ex.com",), (None,), (None,)), 1),
    ]
    attachments = [
        # message_id, filename, size, url, data
        ("m1", "screenshot.png", 2048, "https://files.ex/shot.png",
         b"\x89PNG\r\n\x1a\nfakepng"),
        ("m5", "huge.bin", 20_000_000, "https://files.ex/huge.bin", b"\x00" * 64),  # oversize warn
        ("m5", "gone.pdf", 1024, "https://files.ex/unreachable.pdf", None),  # download fails -> P15 note
    ]
    mailboxes = [("Support",), ("Billing",)] + ([("Ghost Box",)] if include_invalid else [])
    agents = [("agent1@co.com",), ("agent2@co.com",)] + (
        [("ghost@co.com",)] if include_invalid else []
    )
    # Groove agent id -> email directory (the reference resolves authors by
    # fetching the agent href then searching HS users by email, S8 + J3)
    agent_dir = [
        ("agent-1", "agent1@co.com"),
        ("agent-2", "AGENT2@co.com"),  # case differs from HS user email
        ("agent-9", "ghost@co.com"),   # maps to no HS user -> per-record error
    ]
    return SimpleNamespace(
        customers=spark.createDataFrame(customers, schemas.GROOVE_CUSTOMER),
        tickets=spark.createDataFrame(tickets, schemas.GROOVE_TICKET),
        messages=spark.createDataFrame(messages, schemas.GROOVE_MESSAGE),
        attachments=spark.createDataFrame(attachments, schemas.GROOVE_ATTACHMENT),
        mailboxes=spark.createDataFrame(mailboxes, "name string"),
        agents=spark.createDataFrame(agents, "email string"),
        agent_dir=spark.createDataFrame(agent_dir, "agent_id string, email string"),
    )


def helpscout_fixtures(spark: SparkSession) -> SimpleNamespace:
    mailboxes = [
        (10, "Support", "support@co.com"),
        (11, "BILLING", "billing@co.com"),     # case differs from Groove's 'Billing'
        (12, "Default", "default@co.com"),     # the config default mailbox
    ]
    users = [
        (100, "Agent", "One", "agent1@co.com"),
        (101, "Agent", "Two", "AGENT2@co.com"),  # case differs
    ]
    customers = [
        (200, "jane@ex.com"),
        (201, "bob@ex.com"),
        # carol/dave missing -> Groove-refetch enrichment path (J4)
    ]
    conversations = [
        # (number, subject, modifiedAt) -- ticket 3 already migrated => J5 dedup skip
        (900, "FEATURE REQUEST", "2016-02-03 09:15:00"),
    ]
    return SimpleNamespace(
        mailboxes=spark.createDataFrame(mailboxes, schemas.HELPSCOUT_MAILBOX),
        users=spark.createDataFrame(users, schemas.HELPSCOUT_USER),
        customers=spark.createDataFrame(customers, schemas.HELPSCOUT_CUSTOMER_DIM),
        conversations=spark.createDataFrame(conversations, schemas.HELPSCOUT_CONVERSATION_DIM),
    )
