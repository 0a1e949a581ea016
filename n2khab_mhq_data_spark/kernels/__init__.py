"""Domain compute kernels K1-K11 (SURVEY.md §2.10) as pure DataFrame plans.

Every kernel is a composition of the relational core — broadcast dimension
joins, when-ladders, windows, layered aggregations. No UDFs (the spatial
kernels live in ``n2khab_mhq_data_spark.spatial``).
"""
