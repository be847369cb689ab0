"""Constraint checks (SURVEY.md §2.4 A10-A12, §2.3 J5, §3.2):
column stats, uniqueness, referential integrity, distribution drift,
schema compare. Each check emits (a) violation rows and (b) a
per-partition verdict — the same contract as the reference's
CheckDiffResult (datachecker-check/.../modules/check/CheckDiffResult.java:55-130).
"""
