"""Operator layer: each module is one analysis from SURVEY.md §2,
expressed as DataFrame → DataFrame transformations."""
