"""faang_pydantics_validation_spark — a from-scratch PySpark-native
schema + constraint validation engine with the capabilities of
FAANG/faang-pydantics-validation (reference at /root/reference, read-only).

Design stance (SURVEY.md §7): rules are *data* (RuleSpec), compiled into
Spark Column expressions evaluated in a single wide projection; lookups are
broadcast dimension joins; summaries are single-pass hash aggregations.
No per-row Python in the hot path.
"""

__version__ = "0.1.0"
