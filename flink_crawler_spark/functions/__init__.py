"""Scalar function layer: URL handling + text analysis.

Native Spark column expressions where possible (JVM codegen path);
Pandas UDFs (Arrow-vectorized) for the full normalizer / validator where
java.net.URL-equivalent parsing is needed.
"""
