from .audit import plan_summary, plan_string

__all__ = ["plan_summary", "plan_string"]
