"""Reusable engine operators, each designed for 100 TB partitioning behavior."""
