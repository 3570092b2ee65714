"""Pure-Python document parsers (the reference's parser modules, SURVEY §2.2).

These run ONLY inside Arrow-batched pandas UDFs (mapInPandas) — one parser
instance reused per batch, never row-at-a-time Python UDFs on DataFrames.
"""
