"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference batch image-tagging tool
(NaughtDZ/Cl_tagger_batch_processing, surveyed in /root/repo/SURVEY.md).

Design stance (SURVEY.md §7): this is a library of DataFrame operators plus a
pipeline composer. Catalyst is the optimizer, Tungsten the runtime. The only
Python-boundary code is the ML kernel (image decode / preprocess / score),
expressed as Arrow-batched pandas UDFs. Everything else — filters, broadcast
dimension lookups, per-category top-1, ordered string aggregation, dedup,
similarity search, text analysis — compiles to built-in Column expressions
and stays JVM-side.
"""

__version__ = "0.1.0"
