"""Media/DOM kernels: pure-Python/numpy batch functions invoked ONLY from
vectorized pandas/Arrow UDFs (mapInPandas / applyInPandas) — never per-row
Python UDFs. Each kernel is deterministic so stage retries preserve
span-sequence equality (SURVEY.md §4.2)."""
