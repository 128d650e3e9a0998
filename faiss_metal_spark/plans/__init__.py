from .report import assert_plan, explain_report  # noqa: F401
