from .audit import plan_text, assert_in_plan, audit_report  # noqa: F401
