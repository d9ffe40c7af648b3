from .partitioning import PartitionPlan, plan_table, composite_pk_predicates, page_queries
from .metrics import executed_plan_metrics
from .sizing import project_volume, recommend_conf, size_report

__all__ = [
    "PartitionPlan",
    "plan_table",
    "composite_pk_predicates",
    "page_queries",
    "executed_plan_metrics",
    "project_volume",
    "recommend_conf",
    "size_report",
]
