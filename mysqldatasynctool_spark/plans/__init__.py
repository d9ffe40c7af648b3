from .partitioning import PartitionPlan, plan_table, composite_pk_predicates, page_queries

__all__ = ["PartitionPlan", "plan_table", "composite_pk_predicates", "page_queries"]
