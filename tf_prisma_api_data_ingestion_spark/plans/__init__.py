"""End-to-end report pipelines (EP1/EP3 shapes from SURVEY.md §3)."""

from .report import alert_report_events  # noqa: F401
