"""Operator inventory (SURVEY.md §2) as composable column-expression builders.

Everything here is native Spark SQL expressions (JVM-side, whole-stage
codegen) except the payload→text UDFs in extract_udfs.py, which are
Arrow-batched pandas UDFs.
"""
