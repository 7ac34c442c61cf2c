"""Relational operators (SURVEY.md §2.2-2.7), expressed as reusable
DataFrame → DataFrame functions. All pure-Column / built-in-function
implementations — JVM-side, whole-stage-codegen'd, no Python UDFs in
any hot path."""
