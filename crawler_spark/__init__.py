"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch re-imagining of the reference crawler's fetch-and-parse loop
(reference: /root/reference, CouMap/crawler) as batch DataFrame crawl rounds:

  frontier (priority queue table)
    -> anti-join URL-seen (bloom prefilter + exact backstop)
    -> robots gate (broadcast dimension join)
    -> per-host politeness budget (salted window rank)
    -> fetch/parse (Arrow-batched mapInPandas over image+caption pages)
    -> append results / new frontier rows / failures / per-partition metrics
    -> snapshot commit (resume = read latest snapshot)

Everything is DataFrame/SQL-first; Python appears only in vectorized
pandas/Arrow UDF stages (canonicalization, fetch/parse, codecs).
"""

__version__ = "0.1.0"
