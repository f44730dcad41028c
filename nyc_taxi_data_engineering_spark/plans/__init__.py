"""Pipeline plans: the DQ rule compiler, governance gates, lineage,
orchestration, and the SQL workflow runner — the reference's "macro"
operators (SURVEY.md §2.9–§2.10) rebuilt as data-driven Spark plans.
"""
