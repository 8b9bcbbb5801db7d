"""End-to-end pipelines re-expressing the reference's console commands
(SURVEY.md section 3): sync-customers, sync-tickets, view-ticket."""

from .customer_pipeline import transform_customers
from .ticket_pipeline import build_conversations, view_ticket

__all__ = ["transform_customers", "build_conversations", "view_ticket"]
