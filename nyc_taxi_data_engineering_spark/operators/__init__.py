"""Dataflow operators — pure DataFrame -> DataFrame functions.

Each module hosts one operator family from SURVEY.md §2; composition
happens in plans/ (pipelines) and queries/ (the correctness surface).
"""
