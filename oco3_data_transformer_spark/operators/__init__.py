"""Relational operator library (SURVEY.md §2), Spark-first.

Each module re-expresses a family of the reference's hand-written dataflow
stages as declarative DataFrame transformations so Catalyst chooses the
physical strategy (broadcast vs shuffle joins, partial aggregation, AQE skew
handling). Python loops from the reference become window functions; thread
pools become partitions.
"""
