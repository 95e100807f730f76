"""Physical-plan introspection and audit helpers.

The reference has no optimizer to audit (SURVEY.md §4 — postrack.go's
only "plan" is the pgoutput decode loop); here the optimizer is
Catalyst, and these helpers make its output a testable artifact: every
headline query asserts the plan it *wants* (broadcasts where a side is
small, filters pushed into the parquet scan, no Python in JVM-able hot
paths) so a regression to a bad plan fails CI, not the 100 TB run.
"""

from postrack_spark.plans.explain import (
    assert_plan,
    explain_string,
    plan_features,
)

__all__ = ["explain_string", "plan_features", "assert_plan"]
