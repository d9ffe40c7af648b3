from .partitioning import PartitionPlan, plan_table, composite_pk_predicates, page_queries
from .metrics import executed_plan_metrics

__all__ = [
    "PartitionPlan",
    "plan_table",
    "composite_pk_predicates",
    "page_queries",
    "executed_plan_metrics",
]
