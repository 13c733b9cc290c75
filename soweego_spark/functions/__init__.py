"""Column-function library: normalization, tokenization, URLs, dates,
similarity. Pure-Python kernels live in ``textnorm``/``urlnorm``; their Spark
bindings (pandas UDFs + native Column expressions) live in ``text``/``urls``/
``dates``/``similarity``.
"""
