"""Scale-oriented data-pipeline operators (dedup, similarity, text,
multimodal) built Spark-first: row-local Column expressions where
possible, shuffle only where semantically required, Pandas UDFs only
for genuinely non-relational work (multimodal decode).

These go beyond the reference surface (SURVEY.md §2.6) per the build
plan §7.2 step 8: the reference (bnclabs/bd) has no joins, aggregates
or dedup of any kind — this package is the "data science algorithms on
big-data" ambition (reference README.md:22) realized on Spark.
"""
